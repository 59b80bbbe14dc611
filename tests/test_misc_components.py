"""Coverage for remaining inventory components: Languasito v1, HTK legacy import helpers,
profiling utilities, Mel2Style/blocks."""

import json

import numpy as np
import pytest

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


def test_upsamplenet2_matches_torch():
    """UpsampleNet2 (vestigial inventory module, reference modules.py:357-375) must
    reproduce torch's weight-norm ConvTranspose2d + LeakyReLU(0.4) stack."""
    torch = pytest.importorskip("torch")

    from ttscube_tpu.models.blocks import UpsampleNet2

    scales = (2, 3)

    class TorchUp2(torch.nn.Module):
        def __init__(self):
            super().__init__()
            mods = []
            for s in scales:
                c = torch.nn.utils.weight_norm(torch.nn.ConvTranspose2d(
                    1, 1, (3, 2 * s), padding=(1, s // 2), stride=(1, s)))
                torch.nn.init.kaiming_normal_(c.weight_v)
                mods.append(c)
            self.ups = torch.nn.ModuleList(mods)

        def forward(self, c):  # (B, C, T)
            c = c.unsqueeze(1)
            for f in self.ups:
                c = torch.nn.functional.leaky_relu(f(c), 0.4)
            return c.squeeze(1)

    torch.manual_seed(0)
    tm = TorchUp2().eval()
    x = torch.randn(2, 80, 12)
    with torch.no_grad():
        want = tm(x).numpy()

    params = {}
    for i, conv in enumerate(tm.ups):
        params[f"v_{i}"] = jnp.asarray(conv.weight_v.detach().numpy()[0, 0])
        params[f"g_{i}"] = jnp.asarray(conv.weight_g.detach().numpy().reshape(1))
        params[f"bias_{i}"] = jnp.asarray(conv.bias.detach().numpy())

    model = UpsampleNet2(upsample_scales=scales)
    got = model.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 1)))
    got = np.asarray(got).transpose(0, 2, 1)  # (B, C, T·6)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)
