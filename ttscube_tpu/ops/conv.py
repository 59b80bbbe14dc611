"""1-D convolutions in NWC layout (channels on the TPU lane dimension).

Replaces the reference's torch ``ConvNorm`` (``cube/networks/modules.py:37-55``) and the
HiFi-GAN weight-normalized convs/transposed-convs (hifigan submodule, configured by
``examples/hifigan/config_v1.json``). torch-equivalent semantics (symmetric padding,
transposed-conv output length (T−1)·s − 2p + k) so parity tests can import torch weights.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, kernel, stride=1, padding=0, dilation=1, groups=1, preferred=jnp.float32):
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=preferred,
    )


def _mp_cast(x, kernel, compute_dtype):
    """Mixed-precision operand cast + matching `preferred` for a DIFFERENTIABLE conv.

    Inference paths use bf16 operands with preferred_element_type=fp32 (fp32-out,
    zero extra rounding) — but that pattern's transpose rule calls
    conv(cotangent_fp32, kernel_bf16) and lax.conv_general_dilated rejects mixed
    dtypes, so autodiff through it fails. Training modules instead let the conv
    output `compute_dtype` and cast back to fp32 right after: the astype's vjp
    rounds the cotangent to bf16, keeping every transposed conv dtype-consistent.
    The MXU accumulates bf16 products in fp32 internally either way; the cost is
    one bf16 rounding of each conv result. Returns (x, kernel, preferred)."""
    if compute_dtype is None:
        return x, kernel, jnp.float32
    return x.astype(compute_dtype), kernel.astype(compute_dtype), None


def _conv_transpose(x, kernel, stride=1, padding=0, preferred=jnp.float32):
    """kernel layout (k, out, in) — torch ConvTranspose1d semantics."""
    k = kernel.shape[0]
    kern = jnp.swapaxes(jnp.flip(kernel, axis=0), 1, 2)  # (k, in, out) for the dilated conv
    pad = k - 1 - padding
    return jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=preferred,
    )


def xavier_uniform_gain(gain: float):
    def init(key, shape, dtype=jnp.float32):
        # shape (k, in, out): fan_in = k*in, fan_out = k*out (torch Conv1d convention)
        k, fin, fout = shape
        a = gain * np.sqrt(6.0 / (k * fin + k * fout))
        return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)

    return init


class Conv1d(nn.Module):
    """Plain Conv1d, xavier-init with gain (reference ConvNorm, modules.py:37-55)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int | None = None  # None → 'same' for odd kernels ((k-1)//2 * dilation)
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    w_init_gain: str = "linear"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gain = {"linear": 1.0, "relu": np.sqrt(2.0), "leaky_relu": np.sqrt(2.0 / (1 + 0.01**2)),
                "tanh": 5.0 / 3, "sigmoid": 1.0}[self.w_init_gain]
        pad = self.padding if self.padding is not None else self.dilation * (self.kernel_size - 1) // 2
        kernel = self.param("kernel", xavier_uniform_gain(gain),
                            (self.kernel_size, x.shape[-1] // self.groups, self.features))
        y = _conv(x, kernel, self.stride, pad, self.dilation, self.groups)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


def fold_conv_kernel(w: jnp.ndarray, fold: int):
    """(k, C, C) 'same' d=1 conv kernel → (k', F·C, F·C) kernel operating on the
    time-folded view (B, T/F, F·C) of the signal.

    Why: convs with C ≪ 128 waste the MXU's lane dimension (measured ~8% utilization at
    C=32). Folding F consecutive timesteps into channels gives F·C lanes at the cost of
    a block-sparse kernel — 4.7× measured speedup for the HiFi-GAN tail resblock convs.
    Exact (output matches the unfolded conv to float tolerance).
    """
    k, C, C2 = w.shape
    c = (k - 1) // 2
    entries = []
    for r in range(fold):
        for j in range(k):
            s = r - c + j
            entries.append((s // fold, s % fold, j, r))
    mmin = min(e[0] for e in entries)
    kp = max(e[0] for e in entries) - mmin + 1
    wp = jnp.zeros((kp, fold * C, fold * C2), w.dtype)
    for m, r2, j, r in entries:
        wp = wp.at[m - mmin, r2 * C : (r2 + 1) * C, r * C2 : (r + 1) * C2].set(w[j])
    return wp, (-mmin, kp - 1 + mmin)


def polyphase_dilated_conv(x, kernel, *, dilation: int, fold: int = 1,
                           preferred=jnp.float32):
    """'same' dilation-d conv as d independent DENSE convs on phase-subsampled
    streams (y[t] for t ≡ p (mod d) only reads x at times ≡ p (mod d)), each stream
    optionally time-folded (fold_conv_kernel) to fill the MXU's 128 lanes.

    Zero FLOP inflation — unlike fold-densification of a dilated kernel, which
    zero-stuffs the kernel to span d·(k−1)+1 taps (~d× the FLOPs; see
    models/hifigan.py fold analysis). The cost here is two phase transposes
    (HBM round trips) per conv; whether that wins is a per-stage measurement
    (VERDICT r3 item 5).

    x: (B, T, C) with T % dilation == 0; kernel (k, C, C2), odd k, stride 1.
    Exact: phase-domain zero padding maps 1:1 onto the original 'same' padding.
    `preferred` follows the caller's mixed-precision mode (see _mp_cast).
    """
    B, T, C = x.shape
    d, k, C2 = dilation, kernel.shape[0], kernel.shape[2]
    assert T % d == 0 and k % 2 == 1, (T, d, k)
    Q = T // d
    # phases → batch: (B, Q, d, C) → (B, d, Q, C) → (B·d, Q, C)
    xp = x.reshape(B, Q, d, C).transpose(0, 2, 1, 3).reshape(B * d, Q, C)
    if fold > 1 and Q % fold == 0:
        wp, (lo, hi) = fold_conv_kernel(kernel, fold)
        y = jax.lax.conv_general_dilated(
            xp.reshape(B * d, Q // fold, fold * C), wp, (1,), [(lo, hi)],
            dimension_numbers=("NWC", "WIO", "NWC"),
            preferred_element_type=preferred).reshape(B * d, Q, C2)
    else:
        y = _conv(xp, kernel, padding=(k - 1) // 2, preferred=preferred)
    return y.reshape(B, d, Q, C2).transpose(0, 2, 1, 3).reshape(B, T, C2)


def _wn_kernel(v, g, axis):
    """weight-norm: kernel = g * v / ||v|| with the norm over all axes except `axis`."""
    red = tuple(i for i in range(v.ndim) if i != axis)
    norm = jnp.sqrt(jnp.sum(v * v, axis=red, keepdims=True) + 1e-12)
    shape = [1] * v.ndim
    shape[axis] = -1
    return v / norm * g.reshape(shape)


def _hifigan_v_init(key, shape, dtype=jnp.float32):
    return 0.01 * jax.random.normal(key, shape, dtype)


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d (torch weight_norm dim=0: per-out-channel norm).

    `compute_dtype=jnp.bfloat16` casts activations+kernel to bf16 for the MXU (fp32
    accumulation via preferred_element_type) — ~4× on v5e vs fp32; params stay fp32.
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int | None = None
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32
    compute_dtype: Any = None
    # time-fold factor for narrow d=1 'same' convs (see fold_conv_kernel); 1 = off
    fold_time: int = 1
    # dilated 'same' convs: polyphase decomposition into dense per-phase convs (each
    # fold_time-folded) instead of one dilated conv — see polyphase_dilated_conv
    polyphase: bool = False

    @nn.compact
    def __call__(self, x):
        pad = self.padding if self.padding is not None else self.dilation * (self.kernel_size - 1) // 2
        shape = (self.kernel_size, x.shape[-1] // self.groups, self.features)
        v = self.param("v", _hifigan_v_init, shape)
        g = self.param("g", lambda key, s: jnp.linalg.norm(
            v.reshape(-1, self.features), axis=0), (self.features,))
        kernel = _wn_kernel(v, g, axis=2)
        x, kernel, preferred = _mp_cast(x, kernel, self.compute_dtype)
        F = self.fold_time
        if self.polyphase and self.dilation > 1 and self.stride == 1 \
                and self.groups == 1 and self.kernel_size % 2 == 1 \
                and x.shape[1] % self.dilation == 0 \
                and pad == self.dilation * (self.kernel_size - 1) // 2:
            y = polyphase_dilated_conv(x, kernel, dilation=self.dilation, fold=F,
                                       preferred=preferred)
        elif F > 1 and self.dilation == 1 and self.stride == 1 and self.groups == 1 \
                and x.shape[1] % F == 0 and self.kernel_size % 2 == 1 \
                and pad == (self.kernel_size - 1) // 2:
            B, T, C = x.shape
            wp, (pl_, pr) = fold_conv_kernel(kernel, F)
            xf = x.reshape(B, T // F, F * C)
            y = jax.lax.conv_general_dilated(
                xf, wp, (1,), [(pl_, pr)], dimension_numbers=("NWC", "WIO", "NWC"),
                preferred_element_type=preferred).reshape(B, T, self.features)
        else:
            y = _conv(x, kernel, self.stride, pad, self.dilation, self.groups,
                      preferred=preferred)
        y = y.astype(jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class ConvTranspose1d(nn.Module):
    """Transposed Conv1d, torch semantics: out_len = (T−1)·stride − 2·padding + kernel."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        # param layout (k, out, in) to mirror torch's (in, out, k)
        shape = (self.kernel_size, self.features, x.shape[-1])
        scale = 1.0 / np.sqrt(x.shape[-1] * self.kernel_size)
        v = self.param("kernel", lambda k, s: jax.random.uniform(k, s, minval=-scale, maxval=scale), shape)
        y = _conv_transpose(x, v, self.stride, self.padding)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed conv (torch weight_norm dim=0 = per-*input*-channel)."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    dtype: Any = jnp.float32
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        shape = (self.kernel_size, self.features, in_ch)  # (k, out, in)
        v = self.param("v", _hifigan_v_init, shape)
        g = self.param("g", lambda key, s: jnp.sqrt(jnp.sum(v * v, axis=(0, 1))), (in_ch,))
        kernel = _wn_kernel(v, g, axis=2)  # norm per input channel (torch dim=0 on (in,out,k))
        x, kernel, preferred = _mp_cast(x, kernel, self.compute_dtype)
        y = _conv_transpose(x, kernel, self.stride, self.padding,
                            preferred=preferred).astype(jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class WNConv2d(nn.Module):
    """Weight-normalized Conv2d in NHWC (for the HiFi-GAN period discriminators)."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    compute_dtype: Any = None  # bf16 MXU path; weight-norm + bias stay fp32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        shape = (kh, kw, x.shape[-1], self.features)
        v = self.param("v", _hifigan_v_init, shape)
        g = self.param("g", lambda key, s: jnp.linalg.norm(
            v.reshape(-1, self.features), axis=0), (self.features,))
        kernel = _wn_kernel(v, g, axis=3)
        x, kernel, preferred = _mp_cast(x, kernel, self.compute_dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=self.strides,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred,
        ).astype(jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


class SNConv1d(nn.Module):
    """Spectral-normalized Conv1d (torch ``spectral_norm`` semantics: one power iteration
    per training step, u vector kept in the mutable "spectral" collection)."""

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: int | None = None
    groups: int = 1
    use_bias: bool = True
    compute_dtype: Any = None  # bf16 MXU path; the power iteration stays fp32

    @nn.compact
    def __call__(self, x, update_stats: bool = False):
        pad = self.padding if self.padding is not None else (self.kernel_size - 1) // 2
        shape = (self.kernel_size, x.shape[-1] // self.groups, self.features)
        scale = 1.0 / np.sqrt(x.shape[-1] // self.groups * self.kernel_size)
        w = self.param("kernel", lambda k, s: jax.random.uniform(k, s, minval=-scale, maxval=scale), shape)
        # torch reshapes (out, in, k) → (out, in*k); rows=out
        wmat = jnp.transpose(w, (2, 1, 0)).reshape(self.features, -1)
        u_var = self.variable("spectral", "u",
                              lambda: jax.random.normal(jax.random.PRNGKey(0), (self.features,)))
        u = u_var.value
        v = wmat.T @ u
        v = v / (jnp.linalg.norm(v) + 1e-12)
        u_new = wmat @ v
        u_new = u_new / (jnp.linalg.norm(u_new) + 1e-12)
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u_new)
        sigma = jnp.dot(jax.lax.stop_gradient(u_new), wmat @ jax.lax.stop_gradient(v))
        x, wn, preferred = _mp_cast(x, w / sigma, self.compute_dtype)
        y = _conv(x, wn, self.stride, pad, 1, self.groups,
                  preferred=preferred).astype(jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,))
        return y


# -- torch import helpers (parity tests) ----------------------------------------------


def conv1d_kernel_from_torch(w):
    """torch Conv1d weight (out, in, k) → (k, in, out)."""
    return jnp.asarray(np.transpose(w.numpy(), (2, 1, 0)))


def conv_transpose1d_kernel_from_torch(w):
    """torch ConvTranspose1d weight (in, out, k) → (k, out, in)."""
    return jnp.asarray(np.transpose(w.numpy(), (2, 1, 0)))
