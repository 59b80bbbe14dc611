"""fastText-table conditioning: .vec parsing, OOV hashing, collate integration, and
Cubegan training with LM conditioning end-to-end."""

import numpy as np

import jax
import jax.numpy as jnp

from ttscube_tpu.utils.wordvec import WordVectors, make_word_embedder


def make_vec_file(tmp_path, dim=8):
    lines = ["3 %d" % dim]
    rng = np.random.default_rng(0)
    for w in ("hello", "world", "the"):
        lines.append(w + " " + " ".join(f"{v:.4f}" for v in rng.standard_normal(dim)))
    p = tmp_path / "toy.vec"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_vec_parse_and_lookup(tmp_path):
    wv = WordVectors.load_vec(make_vec_file(tmp_path))
    assert wv.dim == 8 and len(wv.vocab) == 3
    out = wv(["hello", "world"])
    assert out.shape == (2, 8)
    np.testing.assert_array_equal(out[0], wv.table[wv.vocab["hello"]])
    # OOV: deterministic, nonzero, case-insensitive lookup first
    oov1 = wv(["zxqy"])
    oov2 = wv(["zxqy"])
    np.testing.assert_array_equal(oov1, oov2)
    assert np.abs(oov1).max() > 0
    np.testing.assert_array_equal(wv(["HELLO"])[0], wv.table[wv.vocab["hello"]])

    npz = str(tmp_path / "toy.npz")
    wv.save_npz(npz)
    wv2 = WordVectors.load_npz(npz)
    np.testing.assert_array_equal(wv2(["the"])[0], wv(["the"])[0])

    assert make_word_embedder("fasttext:" + npz) is not None
    assert make_word_embedder(None) is None
    assert make_word_embedder("hf:bert-base") is None


def test_cubegan_with_fasttext_conditioning(tmp_path):
    """LM-conditioned Cubegan: collate builds x_words from the table (with the
    left-context phon2word offset, reference io_cubegan.py:198-199) and the train step
    runs."""
    from tests.test_data import make_corpus
    from tests.test_cubegan import TINY_HIFI
    from ttscube_tpu.data.collate import CubeganCollate
    from ttscube_tpu.data.datasets import CubeganDataset
    from ttscube_tpu.data.encodings import CubeganEncodings
    from ttscube_tpu.models.cubegan import (
        Cubegan, CubeganConfig, create_train_state, train_step)
    from ttscube_tpu.models.languasito import LanguasitoConfig

    make_corpus(tmp_path / "corpus", n=2)
    ds = CubeganDataset(str(tmp_path / "corpus"))
    enc = CubeganEncodings()
    enc.compute(ds)

    # 300-d table to match the reference's fasttext dimension
    wv = WordVectors({"w1": 0, "w2": 1}, np.random.default_rng(0)
                     .standard_normal((2, 300)).astype(np.float32))
    collate = CubeganCollate(enc, word_embedder=wv, min_frames=60,
                             bucket_frames=60, bucket_phones=16)
    batch = collate([ds[0], ds[1]])
    assert "x_words" in batch and batch["x_words"].shape[2] == 300
    # left-context offset applied to phon2word
    n_left = len(ds[0]["meta"]["words_left"])
    assert batch["x_phon2word"][0, 0] == ds[0]["meta"]["phon2word"][0] + n_left

    cfg = CubeganConfig(
        languasito=LanguasitoConfig(num_phones=len(enc.phon2int),
                                    num_speakers=len(enc.speaker2int),
                                    max_pitch=enc.max_pitch,
                                    max_duration=enc.max_duration,
                                    cond_type="fasttext"),
        hifigan=TINY_HIFI, mpd_channels=(8, 16), msd_width=8)
    model = Cubegan(cfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(model, jax.random.PRNGKey(0), jb)
    state, metrics = jax.jit(lambda s, b, r: train_step(model, s, b, r))(
        state, jb, jax.random.PRNGKey(1))
    for k, v in jax.device_get(metrics).items():
        assert np.isfinite(float(v)), k
    # the LM tower params exist and moved
    assert "lm" in state.params["lang"]["tower_t"]
