"""Pluggable vocoder output heads / distributions.

Reference: ``cube/networks/loss.py`` — MOL (10-component discretized mix of logistics,
:110-201), Gaussian (:35-66), Beta (:69-106), μ-law 256-way CE (:236-269), raw 256-way CE
(:280-307). Each head exposes ``loss(y_hat, y)``, ``sample(y_hat, rng)``, ``sample_size``
and ``stats`` (mean/stdev used by the legacy synthesis path). Selected by string like the
reference (modules.py:433-442) via ``get_output_head``.

All are pure jnp — usable inside jit/scan (the WaveRNN sample loop samples per scan step).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ttscube_tpu.dsp.mulaw import mulaw_decode, mulaw_encode, raw_decode, raw_encode


def log_sum_exp(x):
    return jax.scipy.special.logsumexp(x, axis=-1)


class MOLOutput:
    """Discretized mixture of logistics, 10 components → 30 params."""

    sample_size = 30
    stats = (6e-6, 0.15)

    def loss(self, y_hat, y, num_classes: int = 65536, log_scale_min: float = math.log(1e-14)):
        nr_mix = y_hat.shape[2] // 3
        y = y[:, :, None]
        logit_probs = y_hat[:, :, :nr_mix]
        means = y_hat[:, :, nr_mix : 2 * nr_mix]
        log_scales = jnp.maximum(y_hat[:, :, 2 * nr_mix :], log_scale_min)

        centered = y - means
        inv_stdv = jnp.exp(-log_scales)
        plus_in = inv_stdv * (centered + 1.0 / (num_classes - 1))
        min_in = inv_stdv * (centered - 1.0 / (num_classes - 1))
        cdf_plus = jax.nn.sigmoid(plus_in)
        cdf_min = jax.nn.sigmoid(min_in)
        log_cdf_plus = plus_in - jax.nn.softplus(plus_in)       # log σ(plus_in)
        log_one_minus_cdf_min = -jax.nn.softplus(min_in)        # log(1−σ(min_in))
        cdf_delta = cdf_plus - cdf_min
        mid_in = inv_stdv * centered
        log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

        inner_inner = jnp.where(
            cdf_delta > 1e-5,
            jnp.log(jnp.maximum(cdf_delta, 1e-12)),
            log_pdf_mid - math.log((num_classes - 1) / 2),
        )
        inner = jnp.where(y > 0.999, log_one_minus_cdf_min, inner_inner)
        log_probs = jnp.where(y < -0.999, log_cdf_plus, inner)
        log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
        return -jnp.mean(log_sum_exp(log_probs))

    def sample(self, y_hat, rng, log_scale_min: float = math.log(1e-14), temperature: float = 1.0):
        nr_mix = y_hat.shape[-1] // 3
        k1, k2 = jax.random.split(rng)
        logit_probs = y_hat[..., :nr_mix]
        # Gumbel-max over mixture indicator
        u = jax.random.uniform(k1, logit_probs.shape, minval=1e-5, maxval=1 - 1e-5) * temperature
        argmax = jnp.argmax(logit_probs - jnp.log(-jnp.log(u)), axis=-1)
        one_hot = jax.nn.one_hot(argmax, nr_mix)
        means = jnp.sum(y_hat[..., nr_mix : 2 * nr_mix] * one_hot, axis=-1)
        log_scales = jnp.maximum(
            jnp.sum(y_hat[..., 2 * nr_mix :] * one_hot, axis=-1), log_scale_min)
        u2 = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
        x = means + jnp.exp(log_scales) * (jnp.log(u2) - jnp.log(1.0 - u2))
        return jnp.clip(x, -1.0, 1.0)

    def encode(self, x):
        return x

    def decode(self, x):
        return x


class GaussianOutput:
    sample_size = 2
    stats = (6e-6, 0.15)

    def loss(self, y_hat, y, log_std_min: float = -14.0):
        y = y[:, :, None]
        mean = y_hat[:, :, :1]
        log_std = jnp.maximum(y_hat[:, :, 1:], log_std_min)
        nll = 0.5 * math.log(2.0 * math.pi) + log_std + \
            0.5 * (y - mean) ** 2 * jnp.exp(-2.0 * log_std)
        return jnp.mean(nll)

    def sample(self, y_hat, rng, temperature: float = 0.8):
        z = jax.random.normal(rng, y_hat[..., :1].shape) * temperature
        return (y_hat[..., :1] + z * jnp.exp(y_hat[..., 1:]))[..., 0]

    def encode(self, x):
        return x

    def decode(self, x):
        return x


class BetaOutput:
    sample_size = 2
    stats = (6e-6, 0.15)

    def loss(self, y_hat, y):
        loc = jnp.exp(y_hat)
        alpha = loc[:, :, 0]
        beta = loc[:, :, 1]
        y = jnp.clip((y + 1.0) / 2.0, 1e-5, 0.99999)
        logp = (alpha - 1) * jnp.log(y) + (beta - 1) * jnp.log1p(-y) - \
            (jax.scipy.special.gammaln(alpha) + jax.scipy.special.gammaln(beta) -
             jax.scipy.special.gammaln(alpha + beta))
        return -jnp.mean(logp)

    def sample(self, y_hat, rng):
        loc = jnp.exp(y_hat)
        s = jax.random.beta(rng, loc[..., 0], loc[..., 1])
        return (s - 0.5) * 2.0

    def encode(self, x):
        return x

    def decode(self, x):
        return x


class MULAWOutput:
    sample_size = 256
    stats = (-0.019, 0.51)

    def loss(self, y_hat, y):
        codes = mulaw_encode(y)
        logp = jax.nn.log_softmax(y_hat, axis=-1)
        nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    def sample(self, y_hat, rng):
        codes = jax.random.categorical(rng, y_hat, axis=-1)
        return mulaw_decode(codes)

    def encode(self, x):
        return mulaw_encode(x)

    def decode(self, x):
        return mulaw_decode(x)


class RAWOutput:
    sample_size = 256
    stats = (-0.019, 0.15)

    def loss(self, y_hat, y):
        codes = raw_encode(y)
        logp = jax.nn.log_softmax(y_hat, axis=-1)
        nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    def sample(self, y_hat, rng):
        codes = jax.random.categorical(rng, y_hat, axis=-1)
        return raw_decode(codes)

    def encode(self, x):
        return raw_encode(x)

    def decode(self, x):
        return raw_decode(x)


def get_output_head(name: str):
    """Head-by-string selection (reference modules.py:433-442)."""
    return {"mol": MOLOutput, "gm": GaussianOutput, "beta": BetaOutput,
            "mulaw": MULAWOutput, "raw": RAWOutput}[name]()
