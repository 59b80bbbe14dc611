"""Composed model-level torch parity (BASELINE.md "mel MSE ≤1e-3 vs reference").

Builds a torch twin of Languasito2 + HiFi-GAN Generator from the same primitives the
op-level tests verify individually (torch LSTM/Conv1d/weight_norm), imports its weights
into the flax model via the existing remap helpers, and bounds the END-TO-END error of
teacher-forced synthesis: conditioning features, audio, and the log-mel of the audio.
The reference call stack being mirrored is SURVEY §3.1 (Languasito2 modules.py:916-994
→ Generator cubegan.py:83)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier; fast tier = -m 'not slow'

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ttscube_tpu.dsp.mel import MelSpec, gan_mel_config
from ttscube_tpu.models.cubegan import Cubegan, CubeganConfig
from ttscube_tpu.models.hifigan import HifiganConfig
from ttscube_tpu.models.languasito import LanguasitoConfig
from ttscube_tpu.ops.rnn import lstm_params_from_torch
from tests.test_cubegan import TINY_HIFI, toy_batch

MAX_PITCH = 400.0
MAX_DUR = 100


def t2n(t):
    return t.detach().cpu().numpy().astype(np.float32)


def dense_params(m):
    return {"kernel": t2n(m.weight).T, "bias": t2n(m.bias)}


def conv_params(m):
    return {"kernel": np.transpose(t2n(m.weight), (2, 1, 0)), "bias": t2n(m.bias)}


def wn_conv_params(m):
    return {"v": np.transpose(t2n(m.weight_v), (2, 1, 0)),
            "g": t2n(m.weight_g).ravel(), "bias": t2n(m.bias)}


def wn_convt_params(m):
    # torch ConvTranspose1d weight (in, out, k) → ours (k, out, in); g per in-channel
    return {"v": np.transpose(t2n(m.weight_v), (2, 1, 0)),
            "g": t2n(m.weight_g).ravel(), "bias": t2n(m.bias)}


# -- torch twins -----------------------------------------------------------------


class TorchTower(torch.nn.Module):
    def __init__(self, num_phones, num_speakers):
        super().__init__()
        self.phon_emb = torch.nn.Embedding(num_phones + 1, 64, padding_idx=0)
        self.speaker_emb = torch.nn.Embedding(num_speakers + 1, 128, padding_idx=0)
        self.char_cnn = torch.nn.ModuleList(
            [torch.nn.Conv1d(64 if i == 0 else 256, 256, 3, padding=1)
             for i in range(3)])
        self.char_rnn = torch.nn.LSTM(256, 256, num_layers=2, bidirectional=True,
                                      batch_first=True)

    def forward(self, x_char, x_speaker):
        h = self.phon_emb(x_char).permute(0, 2, 1)
        for conv in self.char_cnn:
            h = torch.tanh(conv(h))
        h, _ = self.char_rnn(h.permute(0, 2, 1))
        spk = self.speaker_emb(x_speaker).expand(-1, h.shape[1], -1)
        return torch.cat([h, spk], dim=-1)


class TorchLanguasito(torch.nn.Module):
    """Mirror of Languasito2's teacher-forced path (modules.py:916-994)."""

    def __init__(self, num_phones, num_speakers):
        super().__init__()
        self.tower_t = TorchTower(num_phones, num_speakers)
        self.tower_g = TorchTower(num_phones, num_speakers)
        self.dur_rnn = torch.nn.LSTM(640, 256, num_layers=2, bidirectional=True,
                                     batch_first=True)
        self.dur_output = torch.nn.Linear(512, MAX_DUR + 1)
        self.pitch_rnn = torch.nn.LSTM(640, 256, num_layers=2, bidirectional=True,
                                       batch_first=True)
        self.pitch_output = torch.nn.Linear(512, 2)
        self.cond_rnn = torch.nn.LSTM(641, 64, num_layers=2, bidirectional=True,
                                      batch_first=True)
        self.cond_output = torch.nn.Linear(128, 80)

    def forward(self, x_char, x_speaker, frame2phone, pitch):
        B = x_char.shape[0]
        rows = torch.arange(B)[:, None]
        h = self.tower_t(x_char, x_speaker)
        dur_logits = self.dur_output(self.dur_rnn(h)[0])
        hf = h[rows, frame2phone]
        po = self.pitch_output(self.pitch_rnn(hf)[0])
        p = torch.sigmoid(po[:, :, 0])
        vuv = torch.sigmoid(po[:, :, 1])
        hg = self.tower_g(x_char, x_speaker)[rows, frame2phone]
        hc = torch.cat([hg, (pitch / MAX_PITCH)[:, :, None]], dim=-1)
        cond = self.cond_output(self.cond_rnn(hc)[0])
        return dur_logits, p, vuv, cond


class TorchResBlock1(torch.nn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        wn = torch.nn.utils.weight_norm
        convs = []
        for d in dilations:
            convs.append(wn(torch.nn.Conv1d(ch, ch, k, dilation=d,
                                            padding=d * (k - 1) // 2)))
            convs.append(wn(torch.nn.Conv1d(ch, ch, k, padding=(k - 1) // 2)))
        self.convs = torch.nn.ModuleList(convs)

    def forward(self, x):
        for i in range(0, len(self.convs), 2):
            h = torch.nn.functional.leaky_relu(x, 0.1)
            h = self.convs[i](h)
            h = torch.nn.functional.leaky_relu(h, 0.1)
            h = self.convs[i + 1](h)
            x = x + h
        return x


class TorchGenerator(torch.nn.Module):
    def __init__(self, cfg: HifiganConfig):
        super().__init__()
        wn = torch.nn.utils.weight_norm
        self.cfg = cfg
        self.conv_pre = wn(torch.nn.Conv1d(cfg.num_mels,
                                           cfg.upsample_initial_channel, 7, padding=3))
        self.ups = torch.nn.ModuleList()
        self.res = torch.nn.ModuleList()
        ch = cfg.upsample_initial_channel
        for u, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
            self.ups.append(wn(torch.nn.ConvTranspose1d(ch, ch // 2, k, stride=u,
                                                        padding=(k - u) // 2)))
            ch //= 2
            blocks = torch.nn.ModuleList(
                [TorchResBlock1(ch, rk, rd)
                 for rk, rd in zip(cfg.resblock_kernel_sizes,
                                   cfg.resblock_dilation_sizes)])
            self.res.append(blocks)
        self.conv_post = wn(torch.nn.Conv1d(ch, 1, 7, padding=3))

    def forward(self, mel):  # mel (B, frames, num_mels)
        frames = mel.shape[1]
        x = self.conv_pre(mel.permute(0, 2, 1))
        for up, blocks in zip(self.ups, self.res):
            x = torch.nn.functional.leaky_relu(x, 0.1)
            x = up(x)
            acc = None
            for b in blocks:
                h = b(x)
                acc = h if acc is None else acc + h
            x = acc / len(blocks)
        x = torch.nn.functional.leaky_relu(x, 0.01)
        audio = torch.tanh(self.conv_post(x))[:, 0, :]
        return audio[:, : frames * self.cfg.total_upsample]


# -- weight import ---------------------------------------------------------------


def tower_params(tt: TorchTower):
    p = {
        "phon_emb": {"embedding": t2n(tt.phon_emb.weight)},
        "speaker_emb": {"embedding": t2n(tt.speaker_emb.weight)},
        "char_rnn": lstm_params_from_torch(tt.char_rnn.state_dict(), 2, True),
    }
    for i, conv in enumerate(tt.char_cnn):
        p[f"char_cnn_{i}"] = conv_params(conv)
    return p


def languasito_params(tl: TorchLanguasito):
    return {
        "tower_t": tower_params(tl.tower_t),
        "tower_g": tower_params(tl.tower_g),
        "dur_rnn": lstm_params_from_torch(tl.dur_rnn.state_dict(), 2, True),
        "dur_output": dense_params(tl.dur_output),
        "pitch_rnn": lstm_params_from_torch(tl.pitch_rnn.state_dict(), 2, True),
        "pitch_output": dense_params(tl.pitch_output),
        "cond_rnn": lstm_params_from_torch(tl.cond_rnn.state_dict(), 2, True),
        "cond_output": dense_params(tl.cond_output),
    }


def generator_params(tg: TorchGenerator):
    p = {"conv_pre": wn_conv_params(tg.conv_pre),
         "conv_post": wn_conv_params(tg.conv_post)}
    for i, up in enumerate(tg.ups):
        p[f"up_{i}"] = wn_convt_params(up)
        for j, block in enumerate(tg.res[i]):
            p[f"res_{i}_{j}"] = {f"WNConv1d_{k}": wn_conv_params(conv)
                                 for k, conv in enumerate(block.convs)}
    return p


# -- the test ----------------------------------------------------------------------


@pytest.fixture(scope="module")
def twins():
    torch.manual_seed(0)
    cfg = CubeganConfig(
        languasito=LanguasitoConfig(num_phones=30, num_speakers=3,
                                    max_pitch=MAX_PITCH, max_duration=MAX_DUR),
        hifigan=TINY_HIFI)
    model = Cubegan(cfg, train=False)
    tl = TorchLanguasito(30, 3).eval()
    tg = TorchGenerator(TINY_HIFI).eval()
    params = {"lang": languasito_params(tl), "gen": generator_params(tg)}
    params = jax.tree.map(jnp.asarray, params)
    return model, tl, tg, params


def test_composed_teacher_forced_synthesis_matches_torch(twins):
    model, tl, tg, params = twins
    batch = toy_batch(B=2, N=16, F=60, key=11)

    with torch.no_grad():
        t_dur, t_pitch, t_vuv, t_cond = tl(
            torch.tensor(np.asarray(batch["x_char"]), dtype=torch.long),
            torch.tensor(np.asarray(batch["x_speaker"]), dtype=torch.long),
            torch.tensor(np.asarray(batch["y_frame2phone"]), dtype=torch.long),
            torch.tensor(np.asarray(batch["y_pitch"])))
        t_audio = tg(t_cond).numpy()

    dur, pitch, vuv, cond = jax.jit(
        lambda p, b: model.languasito.apply({"params": p["lang"]}, b))(params, batch)
    np.testing.assert_allclose(np.asarray(dur), t_dur.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(pitch), t_pitch.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vuv), t_vuv.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cond), t_cond.numpy(), atol=2e-5)

    audio = np.asarray(jax.jit(lambda p, b: model.forward(p, b))(params, batch))
    assert audio.shape == t_audio.shape
    np.testing.assert_allclose(audio, t_audio, atol=5e-5)

    # BASELINE.md bound: mel-domain MSE of the composed pipeline ≤ 1e-3
    mel = MelSpec(gan_mel_config(24000, hop_length=240))
    m_jax = np.asarray(mel(jnp.asarray(audio)))
    m_torch = np.asarray(mel(jnp.asarray(t_audio)))
    assert float(np.mean((m_jax - m_torch) ** 2)) <= 1e-3


def test_composed_free_synthesis_runs_with_imported_weights(twins):
    """Free synthesis (predicted durations) with imported torch weights must produce
    finite audio through the same bucketed path the API uses."""
    model, _, _, params = twins
    batch = toy_batch(B=2, N=16, F=60, key=12)
    Xi = {k: v for k, v in batch.items() if k.startswith("x_")}
    audio, aux = jax.jit(lambda p, x: model.infer(p, x, max_frames=64))(params, Xi)
    assert np.isfinite(np.asarray(audio)).all()
    assert np.abs(np.asarray(audio)).max() <= 1.0
