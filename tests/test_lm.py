"""HF transformer conditioning tests: flax encoder parity vs torch BertModel (tiny
local config, no hub), the 512-token sliding-window remap (reference
io_cubegan.py:246-277), dense collate arrays, and the full hf GAN step with the `b`
optimizer partition active (reference cubegan.py:56,88-89,299-302)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttscube_tpu.data.collate import HF_MAX_TOKENS, hf_sliding_window
from ttscube_tpu.models.lm import LMConfig, TransformerEncoder, params_from_torch_bert

TINY_LM = LMConfig(vocab_size=60, hidden_size=32, num_layers=2, num_heads=4,
                   intermediate_size=64, max_position=HF_MAX_TOKENS, dropout=0.0)


def test_torch_bert_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    tc = transformers.BertConfig(
        vocab_size=60, hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, max_position_embeddings=64, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    tmodel = transformers.BertModel(tc).eval()

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 60, (2, 9)).astype(np.int64)
    mask = np.ones((2, 9), np.int64)
    mask[1, 6:] = 0
    ids[1, 6:] = 0
    with torch.no_grad():
        ref = tmodel(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)).last_hidden_state.numpy()

    cfg = LMConfig(vocab_size=60, hidden_size=32, num_layers=2, num_heads=4,
                   intermediate_size=64, max_position=64, dropout=0.0)
    enc = TransformerEncoder(cfg)
    params = params_from_torch_bert(tmodel.state_dict(), cfg)
    out = np.asarray(enc.apply({"params": params}, jnp.asarray(ids),
                               jnp.asarray(mask, bool)))
    valid = mask.astype(bool)
    np.testing.assert_allclose(out[valid], ref[valid], atol=3e-5)


def _ref_get_hf_ids(l_toks, c_toks, r_toks, word2tok):
    """Literal transcription of the reference's window math
    (io_cubegan.py:246-277) used as the golden fixture."""
    l_size, c_size = len(l_toks), len(c_toks)
    if l_size + c_size <= 512:
        start = 0
        offset = l_size
    else:
        start = c_size + l_size - 512
        offset = l_size - start
    e_toks = (l_toks + c_toks + r_toks)[start:]
    toks = e_toks[: min(512, len(e_toks))]
    w2t = {w: word2tok[w] + offset for w in word2tok}
    return toks, w2t


@pytest.mark.parametrize("l,c,r", [(10, 20, 5), (400, 200, 50), (512, 511, 0)])
def test_hf_sliding_window_matches_reference(l, c, r):
    rng = np.random.default_rng(l + c)
    l_toks = rng.integers(1, 1000, l).tolist()
    c_toks = rng.integers(1, 1000, c).tolist()
    r_toks = rng.integers(1, 1000, r).tolist()
    word2tok = {i: int(t) for i, t in enumerate(rng.integers(0, c, min(c, 7)))}

    got_toks, got_w2t = hf_sliding_window(l_toks, c_toks, r_toks, word2tok)
    ref_toks, ref_w2t = _ref_get_hf_ids(l_toks, c_toks, r_toks, word2tok)
    assert got_toks == ref_toks
    assert got_w2t == ref_w2t
    assert len(got_toks) <= HF_MAX_TOKENS
    # every center word's token must still be addressable inside the window
    for w, t in got_w2t.items():
        assert 0 <= t < len(got_toks)
        assert got_toks[t] == c_toks[word2tok[w]]


def _hf_meta(words, tok_per_word=2, vocab=50, left=0, right=0, seed=0):
    rng = np.random.default_rng(seed)

    def tokenize(ws):
        ids, w2t = [], {}
        for i, _ in enumerate(ws):
            ids.extend(rng.integers(1, vocab, tok_per_word).tolist())
            w2t[i] = len(ids) - tok_per_word  # word-start subtoken (utils/hf.py)
        return {"tok_ids": ids, "word2tok": w2t}

    return {
        "words_hf": tokenize(words),
        "words_left_hf": tokenize(["w"] * left),
        "words_right_hf": tokenize(["w"] * right),
    }


def test_hf_collate_dense_arrays():
    from ttscube_tpu.data.collate import CubeganCollate
    from ttscube_tpu.data.encodings import CubeganEncodings

    enc = CubeganEncodings()
    enc.phon2int = {"a": 0, "b": 1}
    enc.speaker2int = {"spk": 0}
    enc.max_pitch, enc.max_duration = 400, 100

    def example(n_words, left, seed):
        words = [f"w{i}" for i in range(n_words)]
        meta = {
            "phones": ["a", "b"] * 3,
            "phon2word": [0, 0, 1, 1, min(2, n_words - 1), min(2, n_words - 1)],
            "frame2phon": [0, 0, 1, 2, 3, 4, 5, 5],
            "speaker": "spk",
            "words": words,
        }
        meta.update(_hf_meta(words, left=left, seed=seed))
        return {"meta": meta, "mgc": np.zeros((8, 80), np.float32),
                "pitch": np.zeros((8,), np.float32), "audio": np.zeros(8 * 240)}

    collate = CubeganCollate(enc, hf_conditioning=True, min_frames=8,
                             bucket_frames=8, bucket_tokens=8)
    batch = [example(3, left=2, seed=0), example(5, left=0, seed=1)]
    X = collate(batch)
    assert X["x_tok_ids"].shape == X["x_tok_mask"].shape
    assert X["x_tok_ids"].shape[1] % 8 == 0
    assert X["x_word2tok"].shape == (2, 5)
    # row 0: left context of 2 words (4 tokens) shifts the center words by 4
    m0 = batch[0]["meta"]
    for w, t in m0["words_hf"]["word2tok"].items():
        tok_pos = X["x_word2tok"][0, w] - 1  # stored +1 (0 = missing)
        assert tok_pos == t + len(m0["words_left_hf"]["tok_ids"])
        assert X["x_tok_ids"][0, tok_pos] == m0["words_hf"]["tok_ids"][t]
    # padded word slots (row 0 has 3 words of 5) are 0 → the model's zero row
    assert X["x_word2tok"][0, 3] == 0 and X["x_word2tok"][0, 4] == 0


def _hf_cubegan():
    from ttscube_tpu.models.cubegan import Cubegan, CubeganConfig
    from ttscube_tpu.models.hifigan import HifiganConfig
    from ttscube_tpu.models.languasito import LanguasitoConfig

    cfg = CubeganConfig(
        languasito=LanguasitoConfig(num_phones=30, num_speakers=3, max_pitch=400,
                                    max_duration=100, cond_type="hf",
                                    lm_dim=TINY_LM.hidden_size),
        hifigan=HifiganConfig(upsample_initial_channel=32,
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 3),)),
        mpd_channels=(8, 16),
        msd_width=8,
    )
    return Cubegan(cfg, lm=TransformerEncoder(TINY_LM))


def _hf_batch(B=2, N=16, F=60, T=24, W=6):
    from tests.test_cubegan import toy_batch

    rng = np.random.default_rng(7)
    batch = toy_batch(B=B, N=N, F=F)
    batch["x_phon2word"] = jnp.asarray(
        np.minimum(np.arange(N)[None, :] // 3, W - 1) * np.ones((B, 1), np.int64),
        jnp.int32)
    batch["x_tok_ids"] = jnp.asarray(rng.integers(1, 60, (B, T)), jnp.int32)
    batch["x_tok_mask"] = jnp.ones((B, T), bool)
    batch["x_word2tok"] = jnp.asarray(rng.integers(1, T + 1, (B, W)), jnp.int32)
    return batch


def test_cubegan_hf_step_trains_b_partition():
    """A full GAN step with in-model HF conditioning: runs jitted, produces finite
    losses, and moves the LM encoder params (the `b` partition, Adam lr 1e-6)."""
    from ttscube_tpu.models.cubegan import create_train_state, train_step

    model = _hf_cubegan()
    batch = _hf_batch()
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    assert "hf" in state.params

    step = jax.jit(lambda s, b, r: train_step(model, s, b, r))
    s1, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    # the encoder received gradients through the conditioning path
    before = np.concatenate([np.ravel(x) for x in jax.tree.leaves(state.params["hf"])])
    after = np.concatenate([np.ravel(x) for x in jax.tree.leaves(s1.params["hf"])])
    assert not np.allclose(before, after), "hf partition did not move"
    # lr 1e-6: the move must be tiny compared to the g partition's
    assert np.abs(before - after).max() < 1e-4


def test_hf_inference_path():
    model = _hf_cubegan()
    batch = _hf_batch()
    state_params, _ = model.init(jax.random.PRNGKey(0), batch)
    Xi = {k: v for k, v in batch.items() if k.startswith("x_")}
    audio, aux = jax.jit(lambda p, x: model.infer(p, x, max_frames=32))(
        state_params, Xi)
    assert audio.shape[1] == 32 * 240
    assert np.isfinite(np.asarray(audio)).all()


def test_word2tok_zero_means_zero_embedding():
    """x_word2tok==0 must select the prepended zero row (missing/pad words get a zero
    LM embedding — reference _expand_i_hf modules.py:1055-1077)."""
    model = _hf_cubegan()
    batch = _hf_batch()
    batch["x_word2tok"] = batch["x_word2tok"].at[:, 0].set(0)
    params, _ = model.init(jax.random.PRNGKey(0), batch)
    X = model.lm_condition(params, batch)
    assert float(jnp.abs(X["x_words"][:, 0, :]).max()) == 0.0
    assert float(jnp.abs(X["x_words"][:, 1:, :]).max()) > 0.0
