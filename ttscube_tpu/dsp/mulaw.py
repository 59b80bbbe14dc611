"""μ-law / linear codecs (vectorized; reference ``cube/networks/loss.py:236-307``,
``cube/io_utils/dataset.py:135-161``)."""

from __future__ import annotations

import jax.numpy as jnp


def mulaw_encode(x, quantization_channels: int = 256):
    """float waveform in [-1, 1] → int codes in [0, channels-1]."""
    mu = quantization_channels - 1
    x = jnp.asarray(x)
    x_mu = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(float(mu))
    codes = ((x_mu + 1.0) / 2.0 * mu + 0.5).astype(jnp.int32)
    return jnp.clip(codes, 0, quantization_channels - 1)


def mulaw_decode(codes, quantization_channels: int = 256):
    """int codes (or continuous μ-law in [-1,1]) → float waveform."""
    mu = float(quantization_channels - 1)
    x = codes.astype(jnp.float32) / mu * 2.0 - 1.0
    return jnp.clip(jnp.sign(x) * (jnp.exp(jnp.abs(x) * jnp.log1p(mu)) - 1.0) / mu, -1.0, 1.0)


def raw_encode(x, quantization_channels: int = 256):
    """Linear 8-bit quantization (reference ``loss.py:293-300``)."""
    n = quantization_channels - 1
    return jnp.clip(((jnp.asarray(x) + 1.0) / 2.0) * n, 0, n).astype(jnp.int32)


def raw_decode(codes, quantization_channels: int = 256):
    n = float(quantization_channels - 1)
    return (codes.astype(jnp.float32) / n - 0.5) * 2.0
