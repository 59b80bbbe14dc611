"""Coverage for remaining inventory components: Languasito v1, HTK legacy import helpers,
profiling utilities, Mel2Style/blocks."""

import json

import numpy as np

import jax
import jax.numpy as jnp

from ttscube_tpu.data.importers import align_htk, create_lab_file, encode_htk, highpass_filter
from ttscube_tpu.models.blocks import Mel2Style, PostNet, PreNet
from ttscube_tpu.models.languasito import Languasito, LanguasitoConfig
from ttscube_tpu.utils.profiling import PhaseTimer, device_timer


def test_languasito_v1_shapes():
    cfg = LanguasitoConfig(num_phones=20, num_speakers=2, max_pitch=300, max_duration=50)
    model = Languasito(cfg)
    rng = np.random.default_rng(0)
    X = {
        "x_char": jnp.asarray(rng.integers(1, 20, (2, 8))),
        "x_speaker": jnp.asarray(rng.integers(1, 2, (2, 1))),
        "y_frame2phone": jnp.asarray(rng.integers(0, 8, (2, 24))),
        "y_pitch": jnp.asarray(rng.uniform(0, 280, (2, 24)).astype(np.float32)),
    }
    params = model.init(jax.random.PRNGKey(0), X)
    dur_logits, pitch_logits, cond = model.apply(params, X)
    assert dur_logits.shape == (2, 8, 51)
    assert pitch_logits.shape == (2, 24, 301)  # classification pitch head (v1)
    assert cond.shape == (2, 24, 80)


def test_htk_encode_and_align():
    assert encode_htk("a") == "\\141"  # 'a' = 97 = 0o141
    # phs: 100ns units; 3 phones of 160 ms each → 10 frames of 16 ms each
    phs = ["0 1600000 <START>", "1600000 3200000 \\141", "3200000 4800000 <STOP>"]
    trans = ["<START>", "a", "<STOP>"]
    align = align_htk(phs, trans, num_frames=30)
    assert align[0] == 0
    assert align[15] == 1  # 240 ms → phone 'a'
    assert align[-1] == 2


def test_create_lab_file(tmp_path):
    txt = tmp_path / "A_001.txt"
    txt.write_text("ab\n")
    phs = tmp_path / "A_001.phs"
    phs.write_text("0 1000000 <START>\n1000000 2000000 \\141\n"
                   "2000000 3000000 \\142\n3000000 4000000 <STOP>\n")
    lab = tmp_path / "A_001.lab"
    ok = create_lab_file(str(txt), str(phs), 25, str(lab))
    assert ok
    obj = json.load(open(lab))
    assert obj["transcription"] == ["<START>", "a", "b", "<STOP>"]
    assert obj["speaker"] == "A"  # from filename prefix
    assert len(obj["aligned"]) == 25


def test_highpass_filter():
    sr = 16000
    t = np.arange(sr) / sr
    low = np.sin(2 * np.pi * 30 * t).astype(np.float32)   # below 100 Hz cutoff
    high = np.sin(2 * np.pi * 800 * t).astype(np.float32)
    f_low = highpass_filter(low, sr)
    f_high = highpass_filter(high, sr)
    assert np.abs(f_low[sr // 2 :]).max() < 0.05
    assert np.abs(f_high[sr // 2 :]).max() > 0.5


def test_phase_timer_and_device_timer():
    pt = PhaseTimer()
    x = jnp.ones((64, 64))
    with pt.phase("mul", block_on=x):
        y = x * 2
    assert "mul" in pt.report()
    dt = device_timer(lambda a: a @ a, x, reps=3, relay_floor_s=0.0)
    assert dt >= 0.0


def test_blocks_smoke():
    x = jnp.ones((2, 12, 80))
    m2s = Mel2Style()
    params = m2s.init(jax.random.PRNGKey(0), x)
    att, style = m2s.apply(params, x)
    assert att.shape == (2, 8) and style.shape == (2, 100)
    np.testing.assert_allclose(np.asarray(att).sum(axis=-1), 1.0, atol=1e-5)

    pn = PostNet()
    v = pn.init(jax.random.PRNGKey(0), x)
    out = pn.apply(v, x)
    assert out.shape == x.shape
