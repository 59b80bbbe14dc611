"""Shared NN blocks (reference ``cube/networks/modules.py:24-389``): additive attention,
PreNet/PostNet, GST-style Mel2Style. TPU notes: attention is batched matmuls with an
optional span mask (replaces the reference's per-step host re-slicing of encoder spans,
``phonemizer.py:106-122``)."""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttscube_tpu.ops.conv import Conv1d


class Attention(nn.Module):
    """Conv-projected additive attention (reference modules.py:58-88).

    `mask` (B, S) bool: positions allowed to attend. Span-restricted attention (the M2M
    phonemizer's per-word windows) passes a mask instead of materializing the span.
    """

    att_proj_size: int = 100
    dropout_prob: float = 0.1
    kernel_size: int = 1

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, encoder_outputs: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None, deterministic: bool = True):
        B, S, E = encoder_outputs.shape
        h = jnp.broadcast_to(hidden[:, None, :], (B, S, hidden.shape[-1]))
        x = jnp.concatenate([h, encoder_outputs], axis=-1)
        energy = jnp.tanh(Conv1d(self.att_proj_size, self.kernel_size,
                                 w_init_gain="tanh", name="attn")(x))
        if not deterministic:
            energy = nn.Dropout(self.dropout_prob)(energy, deterministic=False)
        v = self.param("v", nn.initializers.uniform(1.0), (self.att_proj_size,))
        scores = jnp.einsum("bsp,p->bs", energy, v)
        if mask is not None:
            scores = jnp.where(mask, scores, -1e9)
        attention = jax.nn.softmax(scores, axis=-1)
        weighted = jnp.einsum("bs,bse->be", attention, encoder_outputs)
        return attention, weighted


class PreNet(nn.Module):
    """2×(Linear+ReLU+Dropout-always-on) (reference modules.py:148-164 — dropout stays
    active at inference, intentionally, as in Tacotron 2)."""

    sizes: tuple[int, ...] = (256, 256)

    @nn.compact
    def __call__(self, x, rng=None):
        for i, s in enumerate(self.sizes):
            x = nn.relu(nn.Dense(s, use_bias=False, name=f"fc_{i}",
                                 kernel_init=nn.initializers.xavier_uniform())(x))
            if rng is not None:
                rng, sub = jax.random.split(rng)
                keep = jax.random.bernoulli(sub, 0.5, x.shape)
                x = jnp.where(keep, x / 0.5, 0.0)
        return x


class PostNet(nn.Module):
    """5×Conv(512,k5)+BN+tanh residual refiner (reference modules.py:117-145)."""

    n_mel_channels: int = 80
    embedding_dim: int = 512
    kernel_size: int = 5
    n_convolutions: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.n_convolutions - 1):
            x = Conv1d(self.embedding_dim, self.kernel_size, w_init_gain="tanh",
                       name=f"conv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
            x = jnp.tanh(x)
        x = Conv1d(self.n_mel_channels, self.kernel_size, w_init_gain="linear",
                   name=f"conv_{self.n_convolutions - 1}")(x)
        x = nn.BatchNorm(use_running_average=not train, name=f"bn_{self.n_convolutions - 1}")(x)
        return x


class ResNet(nn.Module):
    """Gated conv stack (reference modules.py:91-114; unused in live paths but part of
    the inventory): each layer's output splits into sigmoid gate × tanh activation with
    running residual."""

    filter_size: int = 512
    n_layers: int = 8
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x):
        half = self.filter_size // 2
        res = None
        h = x
        for i in range(self.n_layers):
            out = Conv1d(self.filter_size, self.kernel_size, name=f"conv_{i}")(h)
            h = jax.nn.sigmoid(out[..., :half]) * jnp.tanh(out[..., half:])
            if res is not None:
                h = h + res
            res = h
        return h


class UpsampleNet(nn.Module):
    """Conv tower + weight-norm transposed-conv upsampler (reference modules.py:317-343;
    unused in live paths)."""

    upsample_scales: tuple[int, ...] = (2, 2, 4)
    out_channels: int = 80
    kernel_size: int = 3

    @nn.compact
    def __call__(self, c):
        from ttscube_tpu.ops.conv import WNConvTranspose1d

        for i in range(3):
            c = jnp.tanh(Conv1d(self.out_channels, self.kernel_size,
                                name=f"conv_{i}")(c))
        for i, s in enumerate(self.upsample_scales):
            c = jnp.tanh(WNConvTranspose1d(self.out_channels, 2 * s, stride=s,
                                           padding=s // 2, name=f"up_{i}")(c))
        return c


class UpsampleNet2(nn.Module):
    """2-D weight-norm transposed-conv time upsampler (reference modules.py:357-375;
    vestigial — not instantiated by the reference's live paths, kept for inventory
    parity). Treats (C, T) as a one-channel image; each stage upsamples time by `s`
    with a (3, 2s) kernel, stride (1, s), padding (1, s//2), then LeakyReLU(0.4).

    Input (B, T, C) → (B, T·prod(upsample_scales), C)."""

    upsample_scales: tuple[int, ...] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, c):
        x = jnp.swapaxes(c, 1, 2)[..., None]  # (B, C, T, 1) NHWC
        for i, s in enumerate(self.upsample_scales):
            kh, kw = 3, 2 * s
            v = self.param(f"v_{i}", nn.initializers.kaiming_normal(), (kh, kw))
            g = self.param(f"g_{i}",
                           lambda k, sh, v=v: jnp.sqrt(jnp.sum(v * v))[None], (1,))
            kernel = (v / jnp.sqrt(jnp.sum(v * v) + 1e-12) * g[0])
            # torch ConvTranspose2d == conv over the stride-dilated input with the
            # spatially-flipped kernel and padding k-1-p
            kernel = jnp.flip(kernel, (0, 1))[:, :, None, None]
            ph, pw = 1, s // 2
            x = jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 1),
                padding=[(kh - 1 - ph,) * 2, (kw - 1 - pw,) * 2],
                lhs_dilation=(1, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = x + self.param(f"bias_{i}", nn.initializers.zeros, (1,))
            x = nn.leaky_relu(x, 0.4)
        return jnp.swapaxes(x[..., 0], 1, 2)


class Mel2Style(nn.Module):
    """GST-style attention over learned style tokens (reference modules.py:167-205)."""

    num_mgc: int = 80
    gst_dim: int = 100
    num_gst: int = 8

    @nn.compact
    def __call__(self, mel):
        # mel: (B, T, num_mgc) → utterance embedding via mean → attention over tokens
        tokens = self.param("gst", nn.initializers.normal(0.5), (self.num_gst, self.gst_dim))
        h = nn.tanh(nn.Dense(self.gst_dim, name="ref")(jnp.mean(mel, axis=1)))
        scores = h @ tokens.T / jnp.sqrt(float(self.gst_dim))
        att = jax.nn.softmax(scores, axis=-1)
        return att, att @ tokens
