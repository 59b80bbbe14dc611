"""DSP frontend goldens (SURVEY.md §4: pure-function unit tests, layer 1).

librosa is not installed in this environment, so goldens come from:
  * direct numpy FFT computation of the same STFT definition (framing + hann + rfft), and
  * an independently written torch.stft implementation of the HiFi-GAN mel convention.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ttscube_tpu.dsp import (
    MelSpec,
    feature_mel_config,
    gan_mel_config,
    mel_filterbank,
    mulaw_decode,
    mulaw_encode,
    preemphasis,
)
from ttscube_tpu.dsp.mel import hann_window


def _np_stft_mag(y, n_fft=1024, hop=240, center=True):
    """Independent numpy STFT |.| (librosa semantics: center zero-pad, periodic hann)."""
    if center:
        y = np.pad(y, (n_fft // 2, n_fft // 2))
    w = hann_window(n_fft)
    frames = 1 + (len(y) - n_fft) // hop
    out = np.empty((frames, n_fft // 2 + 1))
    for i in range(frames):
        seg = y[i * hop : i * hop + n_fft] * w
        out[i] = np.abs(np.fft.rfft(seg))
    return out


@pytest.fixture(scope="module")
def wave():
    rng = np.random.default_rng(0)
    t = np.arange(24000) / 24000.0
    y = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 1750 * t)
    return (y + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def test_stft_magnitude_matches_numpy_fft(wave):
    ms = MelSpec(feature_mel_config())
    got = np.asarray(ms.magnitude(jnp.asarray(wave)))
    want = _np_stft_mag(wave.astype(np.float64))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-4)


def test_feature_mel_matches_reference_definition(wave):
    """log10(max(1e-5, mel_basis @ |STFT|)) — reference vocoder.py:54-98."""
    ms = MelSpec(feature_mel_config())
    got = np.asarray(ms(jnp.asarray(wave)))
    mag = _np_stft_mag(wave.astype(np.float64))
    basis = mel_filterbank(24000, 1024, 80)
    want = np.log10(np.maximum(1e-5, mag @ basis.T))
    assert got.shape == (1 + len(wave) // 240, 80)
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_gan_mel_matches_torch_hifigan_convention(wave):
    torch = pytest.importorskip("torch")
    y = torch.from_numpy(wave)[None, :]
    n_fft, hop, win = 1024, 240, 1024
    pad = (n_fft - hop) // 2
    yp = torch.nn.functional.pad(y[None, :, :], (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        yp, n_fft, hop_length=hop, win_length=win,
        window=torch.hann_window(win), center=False, pad_mode="reflect",
        normalized=False, onesided=True, return_complex=True,
    )
    mag = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
    basis = torch.from_numpy(mel_filterbank(24000, 1024, 80, 0.0, 12000.0))
    want = torch.log(torch.clamp(torch.matmul(basis, mag), min=1e-5))[0].T.numpy()

    got = np.asarray(MelSpec(gan_mel_config())(jnp.asarray(wave)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_batched_call_matches_single(wave):
    ms = MelSpec(feature_mel_config())
    single = np.asarray(ms(jnp.asarray(wave)))
    batched = np.asarray(ms(jnp.stack([jnp.asarray(wave)] * 3)))
    assert batched.shape == (3,) + single.shape
    np.testing.assert_allclose(batched[1], single, atol=1e-6)


def test_mel_filterbank_properties():
    fb = mel_filterbank(24000, 1024, 80)
    assert fb.shape == (80, 513)
    assert np.all(fb >= 0)
    # every filter has support, peaks move monotonically up in frequency
    peaks = fb.argmax(axis=1)
    assert np.all(np.diff(peaks) >= 0) and fb.sum(axis=1).min() > 0
    # slaney norm: each triangle integrates (over Hz) to ~2/width * area = ~1
    widths_hz = np.diff(np.linspace(0, 12000, 513))[0]
    areas = fb.sum(axis=1) * widths_hz
    np.testing.assert_allclose(areas, 1.0, atol=0.35)


def test_preemphasis(wave):
    got = np.asarray(preemphasis(jnp.asarray(wave)))
    from scipy import signal
    want = signal.lfilter([1, -0.97], [1], wave)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mulaw_roundtrip():
    x = np.linspace(-1, 1, 2001).astype(np.float32)
    codes = np.asarray(mulaw_encode(jnp.asarray(x)))
    assert codes.min() >= 0 and codes.max() <= 255
    rec = np.asarray(mulaw_decode(jnp.asarray(codes)))
    assert np.abs(rec - x).max() < 0.04  # quantization error bound near |x|=1
    # μ-law resolves small amplitudes much better than linear would
    small = np.abs(x) < 0.05
    assert np.abs(rec[small] - x[small]).max() < 0.002


def test_mulaw_matches_torch_reference():
    torch = pytest.importorskip("torch")
    x = torch.linspace(-0.99, 0.99, 257)
    mu = torch.tensor([255.0])
    x_mu = torch.sign(x) * torch.log1p(mu * torch.abs(x)) / torch.log1p(mu)
    want = torch.clip(((x_mu + 1) / 2 * mu + 0.5).long(), 0, 255).numpy()
    got = np.asarray(mulaw_encode(jnp.asarray(x.numpy())))
    np.testing.assert_array_equal(got, want)


def test_griffinlim_reconstructs_tone():
    t = np.arange(12000) / 24000.0
    y = (0.6 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    ms = MelSpec(feature_mel_config())
    mag = ms.magnitude(jnp.asarray(y))
    rec = np.asarray(ms.griffinlim(mag, n_iter=24))
    # spectral match: dominant bin of reconstruction == 440 Hz bin
    spec = np.abs(np.fft.rfft(rec * np.hanning(len(rec))))
    freq = np.fft.rfftfreq(len(rec), 1 / 24000.0)
    assert abs(freq[spec.argmax()] - 440.0) < 10.0
