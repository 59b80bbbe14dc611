"""Inference-only HiFi-GAN generator forward with fused-resblock pallas tail.

Reads the CANONICAL Generator param tree (models/hifigan.py) directly — no separate
checkpoint format — and replaces each narrow tail ResBlock1 (C ≤ 128) with ONE pallas
kernel (ops/pallas_resblock.fused_resblock1): 6 convs + activations + residuals per HBM
round trip, time-folded onto full MXU lanes. Wide/odd-shaped stages fall back to plain
XLA convs, so the function is exact for any config.

Training keeps the flax module path (autodiff); this is the serving path, reached via
``Cubegan.infer(..., fused_tail=True)`` / ``HifiganConfig.fused_tail``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ttscube_tpu.models.hifigan import HifiganConfig, LRELU_SLOPE
from ttscube_tpu.ops.conv import _conv, _conv_transpose, _wn_kernel
from ttscube_tpu.ops.pallas_resblock import fused_resblock1


def _wn(p, axis=2):
    return _wn_kernel(p["v"], p["g"], axis=axis)


def _plain_resblock1(x, kernels, biases, dilations):
    """XLA fallback, mirrors models/hifigan.py:61-81 exactly."""
    i = 0
    for d in dilations:
        h = jax.nn.leaky_relu(x, LRELU_SLOPE)
        k = kernels[i].shape[0]
        h = _conv(h, kernels[i], 1, d * (k - 1) // 2, d, 1) + biases[i]
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        h = _conv(h, kernels[i + 1], 1, (k - 1) // 2, 1, 1) + biases[i + 1]
        x = x + h
        i += 2
    return x


def generator_apply_fused(params, mel: jnp.ndarray, cfg: HifiganConfig,
                          rows_per_tile: int = 2048, interpret: bool | None = None,
                          compute_dtype=None, fuse_channels: tuple = (32,),
                          fuse_max_batch: int = 64) -> jnp.ndarray:
    """mel/cond (B, frames, num_mels) → audio (B, frames·total_upsample).

    fuse_channels: stage widths to run through the pallas kernel. Measured on v5e
    (B=8, F=512, composed end-to-end): C=32 → 1.40x over the flax Generator; C=64 is
    a wash (folded-dilation FLOP inflation cancels the lane win); C>=128 can't fold.
    fuse_max_batch: above this batch the whole function falls back to plain XLA —
    measured e2e bench (F=512): B=32 1.36x, B=64 1.12x, B=128 0.87x (XLA's conv
    efficiency grows with batch until the folded-FLOP inflation dominates).
    interpret=None auto-selects pallas interpret mode on non-TPU backends."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if mel.shape[0] > fuse_max_batch:
        fuse_channels = ()
    pp = params["conv_pre"]
    x = _conv(mel, _wn(pp), 1, 3, 1, 1) + pp["bias"]
    ch = cfg.upsample_initial_channel
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        ch //= 2
        up = params[f"up_{i}"]
        x = _conv_transpose(x, _wn(up), u, (k - u) // 2) + up["bias"]
        # fuse only stages that FOLD (C < 128): that's where XLA under-utilizes lanes.
        # At C == 128 (fold=1) the pallas kernel must densify dilation zeros into the
        # folded matmuls (~5x FLOP inflation for d=5) while XLA's dilated conv does
        # not — measured net loss, so fall back.
        fold = 128 // ch if (ch < 128 and 128 % ch == 0) else 1
        fusable = (cfg.resblock == "1" and fold >= 2 and ch * fold == 128
                   and x.shape[1] % fold == 0 and ch in fuse_channels)
        acc = None
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            pj = params[f"res_{i}_{j}"]
            n = 2 * len(rd)
            kernels = [_wn(pj[f"WNConv1d_{m}"]) for m in range(n)]
            biases = [pj[f"WNConv1d_{m}"]["bias"] for m in range(n)]
            if fusable:
                h = fused_resblock1(x, kernels, biases, kernel_size=rk,
                                    dilations=tuple(rd), fold=fold,
                                    rows_per_tile=rows_per_tile,
                                    interpret=interpret,
                                    compute_dtype=compute_dtype)
            else:
                h = _plain_resblock1(x, kernels, biases, rd)
            acc = h if acc is None else acc + h
        x = acc / len(cfg.resblock_kernel_sizes)
    x = jax.nn.leaky_relu(x, 0.01)
    pp = params["conv_post"]
    x = _conv(x, _wn(pp), 1, 3, 1, 1) + pp["bias"]
    audio = jnp.tanh(x)[..., 0]
    return audio[:, : mel.shape[1] * cfg.total_upsample]
