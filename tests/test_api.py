"""End-to-end API tests: artifact files → TTSCube → int16 audio; export/packaging round
trip (reference cube/api.py + scripts/export_model.py + repository.py semantics)."""

import json
import os
import tarfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import yaml

from ttscube_tpu.data.encodings import CubeganEncodings, PhonemizerEncodings
from ttscube_tpu.models.cubegan import Cubegan, CubeganConfig
from ttscube_tpu.models.hifigan import HifiganConfig
from ttscube_tpu.models.languasito import LanguasitoConfig
from ttscube_tpu.models.phonemizer import Phonemizer, PhonemizerConfig
from ttscube_tpu.utils.checkpoint import save_params

TINY_HIFI_YAML = {
    "upsample_initial_channel": 32,
    "resblock_kernel_sizes": [3],
    "resblock_dilation_sizes": [[1, 3]],
}


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    """Write a complete set of synthesis artifacts (cubegan + phonemizer)."""
    base = tmp_path_factory.mktemp("artifacts")
    # --- phonemizer ---
    penc = PhonemizerEncodings()
    text = "§hello world§"
    penc.compute([{"orig_text": text, "phones": list("helo wrd_§")}])
    penc.save(str(base / "phonemizer.encodings"))
    pcfg = PhonemizerConfig(num_graphemes=len(penc.graphemes),
                            num_phonemes=len(penc.phonemes))
    pmodel = Phonemizer(pcfg)
    pparams = pmodel.init(jax.random.PRNGKey(0),
                          {"x_char": jnp.zeros((1, 8), jnp.int32),
                           "x_case": jnp.zeros((1, 8), jnp.int32)})
    save_params(str(base / "phonemizer.model"), pparams["params"])
    save_params(str(base / "phonemizer.sacc.best"), pparams["params"])

    # --- cubegan ---
    enc = CubeganEncodings()
    enc.phon2int = {p: i for i, p in enumerate("helo wrd_§")}
    enc.speaker2int = {"none": 0, "neb": 1}
    enc.max_duration = 100
    enc.max_pitch = 400
    enc.save(str(base / "cubegan.encodings"))
    yaml.dump({"sample_rate": 24000, "hop_size": 240, "conditioning": None,
               "hifigan": TINY_HIFI_YAML}, open(str(base / "cubegan.yaml"), "w"))
    cfg = CubeganConfig(
        languasito=LanguasitoConfig(num_phones=len(enc.phon2int),
                                    num_speakers=len(enc.speaker2int),
                                    max_pitch=400, max_duration=100),
        hifigan=HifiganConfig(upsample_initial_channel=32,
                              resblock_kernel_sizes=(3,),
                              resblock_dilation_sizes=((1, 3),)))
    model = Cubegan(cfg, train=False)
    lang = model.languasito.init(jax.random.PRNGKey(0), {
        "x_char": jnp.zeros((1, 8), jnp.int32),
        "x_speaker": jnp.zeros((1, 1), jnp.int32),
        "y_frame2phone": jnp.zeros((1, 16), jnp.int32),
        "y_pitch": jnp.zeros((1, 16), jnp.float32)})["params"]
    gen = model.generator.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 80)))["params"]
    save_params(str(base / "cubegan.model"), {"lang": lang, "gen": gen})
    # also a fake .last with discriminators for the export test
    save_params(str(base / "cubegan.last"),
                {"lang": lang, "gen": gen, "mpd": {"dummy": jnp.zeros((2,))},
                 "msd": {"dummy": jnp.zeros((2,))}})
    return base


def test_ttscube_synthesis(artifacts):
    from ttscube_tpu.api import TTSCube

    cube = TTSCube(str(artifacts / "cubegan"), str(artifacts / "phonemizer"))
    audio = cube("hello world", speaker="neb")
    assert audio.dtype == np.int16
    assert audio.ndim == 1
    # bucketed synthesis trims to total predicted frames x hop
    assert len(audio) % 240 == 0
    # repeated calls must reuse the cached executable for the same bucket
    n_compiled = len(cube._infer_cache)
    cube("hello hello", speaker="neb")
    assert len(cube._infer_cache) >= n_compiled


def test_unknown_phones_yield_silence_not_empty(artifacts):
    """All-unknown text → zero predicted durations must still return ≥1 frame of
    silence, not a zero-length array (found driving the full pipeline)."""
    from ttscube_tpu.api import TTSCube

    cube = TTSCube(str(artifacts / "cubegan"), str(artifacts / "phonemizer"))
    audio = cube("12345", speaker="neb")  # digits: unknown graphemes/phones
    assert audio.dtype == np.int16
    assert len(audio) >= 240  # at least one frame


def test_storycube_assembly(artifacts, monkeypatch, tmp_path):
    """StoryCube paragraph assembly + metadata + music mixdown over a stubbed cube."""
    import ttscube_tpu.story as story_mod
    from ttscube_tpu.utils.wavio import write_wav

    class FakeCube:
        def __call__(self, text, speaker="none"):
            return (np.ones(24000, np.float32) * 0.1 * 32767).astype(np.int16)

    monkeypatch.setattr(story_mod.TTSCube, "load", staticmethod(lambda name: FakeCube()))
    music = tmp_path / "music.wav"
    write_wav(str(music), 0.2 * np.sin(np.linspace(0, 800 * np.pi, 48000)).astype(np.float32), 24000)
    sc = story_mod.StoryCube("whatever", music_path=str(music))
    out = sc("Paragraph one.\n\nParagraph two.", speaker="neb")
    assert out["audio"].dtype == np.int16
    # 5s intro + 2x(1s audio + 1s pause) + 5s outro = 14s
    assert abs(len(out["audio"]) / 24000 - 14.0) < 0.1
    assert out["meta"][0]["name"] == "intro"
    assert out["meta"][1]["text"] == "Paragraph one."
    assert out["meta"][2]["start"] > out["meta"][1]["start"]


def test_storycube_local_model_paths(artifacts):
    """StoryCube must accept local cubegan:phonemizer base paths (not only .load())
    and assemble a multi-paragraph story end-to-end through the real TTSCube."""
    from ttscube_tpu.story import StoryCube

    sc = StoryCube(f"{artifacts / 'cubegan'}:{artifacts / 'phonemizer'}")
    out = sc("hello world.\n\nhello again.\n\nmore words here.", speaker="neb")
    assert out["audio"].dtype == np.int16
    assert len(out["audio"]) / 24000 > 10.0  # intro+outro alone are 10 s
    assert [m["name"] for m in out["meta"]].count("paragraph") == 3
    assert out["meta"][-1]["end"] > out["meta"][-1]["start"]


def test_export_and_reimport(artifacts, tmp_path):
    from scripts.export_model import _export

    class Args:
        input_model = str(artifacts / "cubegan")
        input_phonemizer = str(artifacts / "phonemizer")
        phonemizer_weights = "sacc.best"
        output_model = str(tmp_path / "export" / "mymodel")
        version = "1.0.0"
        language = "en"
        description = "test"

    os.makedirs(str(tmp_path / "export"), exist_ok=True)
    _export(Args)
    volumes = sorted(p for p in os.listdir(str(tmp_path / "export"))
                     if p.startswith("mymodel-"))
    assert volumes, "no volumes written"
    desc = yaml.safe_load(open(str(tmp_path / "export" / "mymodel.yaml")))
    assert desc["synthesis"] == "cubegan"

    # reassemble (repository download path, minus the network)
    target = tmp_path / "reassembled"
    os.makedirs(str(target))
    combined = str(target / "model.tar.gz")
    with open(combined, "wb") as out:
        for v in volumes:
            out.write(open(str(tmp_path / "export" / v), "rb").read())
    with tarfile.open(combined, "r:gz") as tar:
        tar.extractall(str(target))
    assert os.path.exists(str(target / "cubegan.model"))
    assert os.path.exists(str(target / "phonemizer.encodings"))

    from ttscube_tpu.api import TTSCube
    cube = TTSCube(str(target / "cubegan"), str(target / "phonemizer"))
    audio = cube("hello", speaker="neb")
    assert audio.dtype == np.int16 and len(audio) > 0


def test_warmup_precompiles_real_call_shapes(artifacts):
    """warmup() must compile the EXACT trace signature real calls use (same x_ key
    set and bucketed shapes) — real synthesis after warmup must not retrace.
    Found on the TPU: a warmup Xi missing the collate's x_phon2word key compiled a
    different signature and the first real call still paid the full jit compile."""
    from ttscube_tpu.api import CHAR_BUCKET, TTSCube

    cube = TTSCube(str(artifacts / "cubegan"), str(artifacts / "phonemizer"))
    cube.warmup(frame_buckets=(256,), char_lens=(CHAR_BUCKET,))
    fn = cube._infer_cache[256]
    assert fn._cache_size() == 1
    a1 = cube("hello", speaker="neb")
    a2 = cube("hello world again", speaker="neb")  # same 32-phone collate bucket
    assert len(a1) > 0 and len(a2) > 0
    assert fn._cache_size() == 1, "real call retraced despite warmup"


def test_export_packages_hf_tokenizer(artifacts, tmp_path):
    """HF-conditioned exports must be portable: the tokenizer files travel in the
    tar as cubegan.hf/* (weights stay in cubegan.model's "hf" subtree), and
    HFCondFrontend.from_packaged prefers the packaged copy over the (possibly
    training-box-local) path in the yaml's conditioning spec."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordPiece
    from tokenizers.pre_tokenizers import Metaspace
    from transformers import PreTrainedTokenizerFast

    from scripts.export_model import _export
    from ttscube_tpu.utils.hfcond import HFCondFrontend

    # minimal local WordPiece tokenizer directory (no hub access in tests)
    tok_dir = tmp_path / "demo_lm"
    vocab = ["[PAD]", "[UNK]", "▁hel", "##lo", "▁world", "▁."]
    tok = Tokenizer(WordPiece({w: i for i, w in enumerate(vocab)},
                              unk_token="[UNK]", max_input_chars_per_word=100))
    tok.pre_tokenizer = Metaspace()
    PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="[UNK]",
                            pad_token="[PAD]").save_pretrained(str(tok_dir))
    (tok_dir / "pytorch_model.bin").write_bytes(b"weights-not-needed")

    # hf-conditioned variant of the module fixture's cubegan artifacts
    hf_base = tmp_path / "hfmodel"
    os.makedirs(str(hf_base))
    for ext in ("encodings", "last"):
        data = open(str(artifacts / f"cubegan.{ext}"), "rb").read()
        open(str(hf_base / f"cubegan.{ext}"), "wb").write(data)
    yaml.dump({"sample_rate": 24000, "hop_size": 240,
               "conditioning": f"hf:{tok_dir}", "hifigan": TINY_HIFI_YAML},
              open(str(hf_base / "cubegan.yaml"), "w"))

    class Args:
        input_model = str(hf_base / "cubegan")
        input_phonemizer = str(artifacts / "phonemizer")
        phonemizer_weights = "sacc.best"
        output_model = str(tmp_path / "export" / "hfmodel")
        version = "1.0.0"
        language = "en"
        description = "test"

    os.makedirs(str(tmp_path / "export"), exist_ok=True)
    _export(Args)
    volumes = sorted(p for p in os.listdir(str(tmp_path / "export"))
                     if p.startswith("hfmodel-"))
    target = tmp_path / "reassembled_hf"
    os.makedirs(str(target))
    combined = str(target / "model.tar.gz")
    with open(combined, "wb") as out:
        for v in volumes:
            out.write(open(str(tmp_path / "export" / v), "rb").read())
    with tarfile.open(combined, "r:gz") as tar:
        tar.extractall(str(target))
    assert os.path.exists(str(target / "cubegan.hf" / "tokenizer.json"))
    # LM weights must NOT be duplicated into the tokenizer package
    assert not os.path.exists(str(target / "cubegan.hf" / "pytorch_model.bin"))

    # the packaged copy must win even when the original tokenizer dir is gone
    import shutil
    shutil.rmtree(str(tok_dir))
    fe = HFCondFrontend.from_packaged(str(target / "cubegan"))
    out = fe({"words": ["hello", " ", "world"]})
    assert out["words_hf"]["tok_ids"], "packaged tokenizer produced no tokens"
