"""Legacy utilities + devset synthesis + remaining blocks coverage."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttscube_tpu.data.legacy import (
    DatasetIO,
    LTSDataset,
    LegacyDataset,
    LegacyEncodings,
    PhoneInfo,
)
from ttscube_tpu.dsp.mel import MelSpec, feature_mel_config
from ttscube_tpu.models.blocks import ResNet, UpsampleNet
from ttscube_tpu.ops.pallas_conv import narrow_conv_pallas_blocked


def test_legacy_encodings_roundtrip(tmp_path):
    enc = LegacyEncodings()
    enc.update(PhoneInfo("a", ["F1", "SPEAKER:bob"], 0, 100))
    enc.update(PhoneInfo("b", ["F2"], 100, 200))
    path = str(tmp_path / "enc.txt")
    enc.store(path)
    enc2 = LegacyEncodings()
    enc2.load(path)
    assert enc2.char2int == enc.char2int
    assert enc2.speaker2int == {"SPEAKER:bob": 0}


def test_datasetio_and_lts(tmp_path):
    dio = DatasetIO()
    y = (0.4 * np.sin(2 * np.pi * 220 * np.arange(2400) / 24000)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    dio.write_wave(p, y, 24000)
    y2, sr = dio.read_wave(p)
    assert sr == 24000 and abs(len(y2) - len(y)) == 0

    (tmp_path / "a.txt").write_text("hello")
    ds = LegacyDataset(str(tmp_path))
    assert len(ds.files) == 1

    (tmp_path / "lex.txt").write_text("cat K AE1 T\ndog\tD AO1 G\n")
    lts = LTSDataset(str(tmp_path / "lex.txt"))
    assert lts.entries[0].word == "cat"
    assert lts.entries[0].transcription == ["K", "AE", "T"]  # digits stripped

    codes, cont = dio.ulaw_encode(y)
    rec = np.asarray(dio.ulaw_decode(codes))
    assert np.abs(rec - y).max() < 0.04

    phs = tmp_path / "a.phs"
    phs.write_text("0 1000000 A\n1000000 2000000 B\n")
    infos = dio.read_phs(str(phs))
    assert infos[1].char == "B" and infos[1].duration == 1000000


def test_mel_fft_ifft_roundtrip():
    ms = MelSpec(feature_mel_config())
    t = np.arange(12000) / 24000.0
    y = (0.5 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    spec = ms.fft(jnp.asarray(y), use_preemphasis=False)
    rec = np.asarray(ms.ifft(spec, out_len=len(y)))
    # overlap-add reconstruction matches (away from edges)
    np.testing.assert_allclose(rec[1000:-1000], y[1000:-1000], atol=1e-3)


def test_resnet_and_upsamplenet():
    x = jnp.ones((2, 16, 80))
    rn = ResNet(filter_size=64, n_layers=3)
    params = rn.init(jax.random.PRNGKey(0), x)
    out = rn.apply(params, x)
    assert out.shape == (2, 16, 32)  # gated: half the filter size

    up = UpsampleNet(upsample_scales=(2, 2), out_channels=80)
    params = up.init(jax.random.PRNGKey(0), x)
    out = up.apply(params, x)
    assert out.shape == (2, 64, 80)


def test_pallas_conv_blocked_exact():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 128, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7, 32, 32)).astype(np.float32) * 0.1)
    want = jax.lax.conv_general_dilated(x, w, (1,), [(3, 3)],
                                        dimension_numbers=("NWC", "WIO", "NWC"))
    got = narrow_conv_pallas_blocked(x, w, fold=4, tile=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_synthesize_devset(tmp_path):
    from tests.test_data import make_corpus
    from ttscube_tpu.data.collate import TextcoderCollate
    from ttscube_tpu.data.datasets import CubeganDataset
    from ttscube_tpu.data.encodings import TextcoderEncodings
    from ttscube_tpu.models.hifigan import Generator, HifiganConfig
    from ttscube_tpu.models.textcoder import CubenetTextcoder, TextcoderConfig
    from ttscube_tpu.train.runtime import synthesize_devset

    make_corpus(tmp_path / "corpus", n=2)
    ds = CubeganDataset(str(tmp_path / "corpus"))
    enc = TextcoderEncodings()
    enc.compute(ds)
    cfg = TextcoderConfig(num_phones=len(enc.phon2int), num_speakers=len(enc.speaker2int),
                          max_pitch=int(enc.max_pitch), max_duration=int(enc.max_duration))
    tc = CubenetTextcoder(cfg)
    collate = TextcoderCollate(enc)
    batch = {k: jnp.asarray(v) for k, v in collate([ds[0]]).items()}
    variables = tc.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch)
    gen = Generator(HifiganConfig(upsample_initial_channel=32,
                                  resblock_kernel_sizes=(3,),
                                  resblock_dilation_sizes=((1, 3),)))
    gp = gen.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 80)))["params"]

    out = str(tmp_path / "gen")
    synthesize_devset(tc, variables, gen, gp, ds, collate, out, forced_synthesis=True,
                      limit=1)
    files = os.listdir(out)
    assert any(f.endswith(".wav") for f in files)
    assert any(f.endswith(".png") for f in files)
