"""Mel-spectrogram frontend, TPU-first.

Replaces the reference's librosa pipeline (``cube/io_utils/vocoder.py:38-124``) and the
HiFi-GAN natural-log mel used in the GAN loss (``cube/networks/cubegan.py:137-138``).

TPU design: n_fft=1024 is tiny by MXU standards, so the STFT is expressed as two matmuls
against precomputed windowed-DFT matrices (cos/sin), followed by the (n_freq, n_mels) mel
projection — three MXU ops that XLA fuses with the magnitude/log epilogues. This beats the
generic FFT lowering for these sizes and keeps everything in one fused HLO region.

Two conventions, both handled by one parameterized `MelSpec`:
  * "feature" mel — librosa-style: center=True zero padding, |STFT|, slaney mel, log10 with
    1e-5 floor (reference ``vocoder.py:96-98``).
  * "gan" mel — HiFi-GAN style: reflect padding of (n_fft-hop)/2, center=False,
    sqrt(power + 1e-9) magnitude, slaney mel, ln with 1e-5 floor (reference hifigan
    submodule ``meldataset.mel_spectrogram``, invoked at ``cubegan.py:137``).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Mel filterbank (host-side constants; slaney scale/norm, librosa-compatible)
# ---------------------------------------------------------------------------


def hz_to_mel(frequencies, htk: bool = False):
    f = np.asanyarray(frequencies, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above.
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    if np.ndim(mels):
        log_region = f >= min_log_hz
        mels = np.where(
            log_region,
            min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
            mels,
        )
    elif f >= min_log_hz:
        mels = min_log_mel + np.log(f / min_log_hz) / logstep
    return mels


def mel_to_hz(mels, htk: bool = False):
    m = np.asanyarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    if np.ndim(freqs):
        log_region = m >= min_log_mel
        freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    elif m >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (m - min_log_mel))
    return freqs


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, 1 + n_fft//2). librosa-compatible."""
    if fmax is None:
        fmax = float(sr) / 2
    n_freq = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, float(sr) / 2, n_freq)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
        weights *= enorm[:, None]
    elif norm is not None:
        raise ValueError(f"unsupported norm: {norm}")
    return weights.astype(np.float32)


def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    denom = n if periodic else n - 1
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / denom)).astype(np.float64)


# ---------------------------------------------------------------------------
# STFT-as-matmul
# ---------------------------------------------------------------------------


def _dft_matrices(n_fft: int, win_length: int, window: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT matrices: frames(B,F,n_fft) @ cos/sin -> (B,F,n_freq)."""
    n_freq = 1 + n_fft // 2
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    # Window folded into the transform; win centered if win_length < n_fft.
    w = np.zeros(n_fft)
    off = (n_fft - win_length) // 2
    w[off : off + win_length] = window
    cos_m = (np.cos(ang) * w[:, None]).astype(np.float32)
    sin_m = (-np.sin(ang) * w[:, None]).astype(np.float32)
    return cos_m, sin_m


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(..., T) -> (..., num_frames, n_fft) by strided gather."""
    num_frames = 1 + (y.shape[-1] - n_fft) // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return jnp.take(y, jnp.asarray(idx), axis=-1)


def preemphasis(y: jnp.ndarray, coef: float = 0.97) -> jnp.ndarray:
    """y[n] - coef * y[n-1] (reference ``vocoder.py:66-67``)."""
    prev = jnp.concatenate([jnp.zeros_like(y[..., :1]), y[..., :-1]], axis=-1)
    return y - coef * prev


@dataclasses.dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 24000
    n_fft: int = 1024
    win_length: int = 1024
    hop_length: int = 240
    n_mels: int = 80
    fmin: float = 0.0
    fmax: float | None = None
    # "center": librosa center=True zero-pad n_fft//2 each side.
    # "hifigan": reflect pad (n_fft-hop)//2 each side, center=False.
    padding: str = "center"
    # "log10": log10(max(1e-5, mel));  "ln": log(max(1e-5, mel)) on sqrt(power+1e-9).
    log_scale: str = "log10"
    mag_floor_sq: float = 0.0  # added under the sqrt for the magnitude ("ln" uses 1e-9)


def feature_mel_config(sample_rate: int = 24000, n_mels: int = 80, hop_length: int = 240) -> MelConfig:
    """The canonical feature extractor config (reference ``vocoder.py:54-98``)."""
    return MelConfig(
        sample_rate=sample_rate,
        hop_length=hop_length,
        n_mels=n_mels,
        fmax=None,
        padding="center",
        log_scale="log10",
        mag_floor_sq=0.0,
    )


def gan_mel_config(sample_rate: int = 24000, n_mels: int = 80, hop_length: int = 240,
                   fmin: float = 0.0, fmax: float | None = 12000.0) -> MelConfig:
    """The HiFi-GAN mel-loss config (reference ``cubegan.py:137-138``)."""
    return MelConfig(
        sample_rate=sample_rate,
        hop_length=hop_length,
        n_mels=n_mels,
        fmin=fmin,
        fmax=fmax,
        padding="hifigan",
        log_scale="ln",
        mag_floor_sq=1e-9,
    )


class MelSpec:
    """Batched waveform → log-mel. Call with (T,) or (B, T); returns (..., frames, n_mels).

    All constants (windowed DFT matrices, mel basis) are baked as numpy arrays so a jitted
    call embeds them and XLA fuses frame-gather → matmul → magnitude → matmul → log.
    """

    def __init__(self, config: MelConfig | None = None):
        self.config = config or feature_mel_config()
        c = self.config
        window = hann_window(c.win_length, periodic=True)
        self._cos, self._sin = _dft_matrices(c.n_fft, c.win_length, window)
        self._mel = mel_filterbank(c.sample_rate, c.n_fft, c.n_mels, c.fmin, c.fmax).T  # (n_freq, n_mels)

    def _pad(self, y: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        if c.padding == "center":
            p = c.n_fft // 2
            pads = [(0, 0)] * (y.ndim - 1) + [(p, p)]
            return jnp.pad(y, pads, mode="constant")
        elif c.padding == "hifigan":
            p = (c.n_fft - c.hop_length) // 2
            pads = [(0, 0)] * (y.ndim - 1) + [(p, p)]
            return jnp.pad(y, pads, mode="reflect")
        elif c.padding == "none":
            return y
        raise ValueError(f"unknown padding mode {c.padding}")

    def magnitude(self, y: jnp.ndarray) -> jnp.ndarray:
        """Linear-magnitude spectrogram (..., frames, n_freq)."""
        c = self.config
        frames = frame_signal(self._pad(y), c.n_fft, c.hop_length)
        re = jnp.matmul(frames, self._cos, preferred_element_type=jnp.float32)
        im = jnp.matmul(frames, self._sin, preferred_element_type=jnp.float32)
        return jnp.sqrt(re * re + im * im + c.mag_floor_sq)

    def fft(self, y: jnp.ndarray, use_preemphasis: bool = True) -> jnp.ndarray:
        """Complex STFT (..., frames, n_freq) (reference ``MelVocoder.fft``
        vocoder.py:42-48, which applies preemphasis by default)."""
        c = self.config
        if use_preemphasis:
            y = preemphasis(y)
        frames = frame_signal(self._pad(y), c.n_fft, c.hop_length)
        re = jnp.matmul(frames, self._cos, preferred_element_type=jnp.float32)
        im = jnp.matmul(frames, self._sin, preferred_element_type=jnp.float32)
        return re + 1j * im

    def ifft(self, spec: jnp.ndarray, out_len: int | None = None) -> jnp.ndarray:
        """Inverse of `fft` via overlap-add (reference ``MelVocoder.ifft``
        vocoder.py:50-52). spec: (frames, n_freq) complex."""
        c = self.config
        n = out_len if out_len is not None else (spec.shape[0] - 1) * c.hop_length
        return self._istft(jnp.real(spec), jnp.imag(spec), n)

    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        mag = self.magnitude(y)
        mel = jnp.matmul(mag, jnp.asarray(self._mel), preferred_element_type=jnp.float32)
        if c.log_scale == "log10":
            return jnp.log10(jnp.maximum(1e-5, mel))
        elif c.log_scale == "ln":
            return jnp.log(jnp.maximum(1e-5, mel))
        raise ValueError(f"unknown log scale {c.log_scale}")

    # -- inverse path (Griffin-Lim; reference ``vocoder.py:100-124``) ------------------

    def _istft(self, re: jnp.ndarray, im: jnp.ndarray, out_len: int) -> jnp.ndarray:
        """(frames, n_freq) real/imag → time signal via irfft-as-matmul + overlap-add."""
        c = self.config
        n = np.arange(c.n_fft)[:, None]
        k = np.arange(1 + c.n_fft // 2)[None, :]
        ang = 2.0 * np.pi * n * k / c.n_fft
        scale = np.full((1, 1 + c.n_fft // 2), 2.0 / c.n_fft)
        scale[0, 0] = 1.0 / c.n_fft
        scale[0, -1] = 1.0 / c.n_fft
        icos = (np.cos(ang) * scale).astype(np.float32)  # (n_fft, n_freq)
        isin = (-np.sin(ang) * scale).astype(np.float32)
        window = jnp.asarray(hann_window(c.win_length).astype(np.float32))
        frames = re @ icos.T + im @ isin.T  # (F, n_fft)
        frames = frames * window[None, :]
        num_frames = frames.shape[0]
        total = (num_frames - 1) * c.hop_length + c.n_fft
        idx = np.arange(num_frames)[:, None] * c.hop_length + np.arange(c.n_fft)[None, :]
        sig = jnp.zeros((total,), jnp.float32).at[jnp.asarray(idx.reshape(-1))].add(frames.reshape(-1))
        wsq = jnp.zeros((total,), jnp.float32).at[jnp.asarray(idx.reshape(-1))].add(
            jnp.tile(window * window, (num_frames,))
        )
        sig = sig / jnp.maximum(wsq, 1e-8)
        p = c.n_fft // 2
        return sig[p : p + out_len]

    def griffinlim(self, magnitude: jnp.ndarray, n_iter: int = 32, key=None) -> jnp.ndarray:
        """Phase reconstruction from a (frames, n_freq) magnitude spectrogram."""
        c = self.config
        if key is None:
            key = jax.random.PRNGKey(0)
        num_frames = magnitude.shape[0]
        out_len = (num_frames - 1) * c.hop_length

        phase = jax.random.uniform(key, magnitude.shape, minval=0.0, maxval=2 * np.pi)
        re, im = magnitude * jnp.cos(phase), magnitude * jnp.sin(phase)

        cos_m, sin_m = jnp.asarray(self._cos), jnp.asarray(self._sin)

        def body(_, carry):
            re, im = carry
            sig = self._istft(re, im, out_len)
            p = c.n_fft // 2
            sig = jnp.pad(sig, (p, p))
            frames = frame_signal(sig, c.n_fft, c.hop_length)
            nre = frames @ cos_m
            nim = frames @ sin_m
            mag = jnp.sqrt(nre * nre + nim * nim + 1e-12)
            return magnitude * nre / mag, magnitude * nim / mag

        re, im = jax.lax.fori_loop(0, n_iter, body, (re, im))
        return self._istft(re, im, out_len)


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def _jit_mel(y, sample_rate, n_mels, hop_length, padding, log_scale):  # pragma: no cover
    cfg = MelConfig(sample_rate=sample_rate, n_mels=n_mels, hop_length=hop_length,
                    padding=padding, log_scale=log_scale)
    return MelSpec(cfg)(y)
