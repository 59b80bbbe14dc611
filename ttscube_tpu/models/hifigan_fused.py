"""Inference-only HiFi-GAN generator forward with fused-resblock pallas tail.

Reads the CANONICAL Generator param tree (models/hifigan.py) directly — no separate
checkpoint format — and replaces each narrow tail ResBlock1 (C ≤ 128) with ONE pallas
kernel (ops/pallas_resblock.fused_resblock1): 6 convs + activations + residuals per HBM
round trip, time-folded onto full MXU lanes. The FINAL stage goes further: upsample +
all MRF resblocks + conv_post + tanh run as one kernel (fused_tail_stage) — the widest
activation (frames·total_upsample × C) never touches HBM. Wide/odd-shaped stages fall
back to plain XLA convs, so the function is exact for any config.

Measured on v5e vs the flax Generator (full serving bench, F=512): 1.73x at B=32,
1.26x at B=64, 1.02x at B=128 — a win at every batch.

Training keeps the flax module path (autodiff); this is the serving path, reached via
``Cubegan.infer(..., fused_tail=True)`` / ``HifiganConfig.fused_tail``.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

from ttscube_tpu.models.hifigan import HifiganConfig, LRELU_SLOPE
from ttscube_tpu.ops.conv import _conv, _conv_transpose, _wn_kernel
from ttscube_tpu.ops.pallas_resblock import (fused_mrf1, fused_resblock1,
                                             fused_tail_stage,
                                             fused_tail_stage_grad)


def _wn(p, axis=2):
    return _wn_kernel(p["v"], p["g"], axis=axis)


_FORCE_INTERPRET = False


@contextlib.contextmanager
def force_pallas_interpret():
    """Test hook: off-TPU, run the fused tail through pallas interpret mode instead of
    the plain-XLA fallback, so composed CPU tests still exercise the kernels."""
    global _FORCE_INTERPRET
    prev = _FORCE_INTERPRET
    _FORCE_INTERPRET = True
    try:
        yield
    finally:
        _FORCE_INTERPRET = prev


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
                          fuse_max_batch: int = 1024) -> jnp.ndarray:
    """mel/cond (B, frames, num_mels) → audio (B, frames·total_upsample).

    fuse_channels: stage widths eligible for pallas fusion. With the whole-tail
    kernel, (32,) alone measured best (adding 64 was slightly slower: the C=64
    MRF kernel's folded-dilation FLOP inflation roughly cancels its lane win).
    fuse_max_batch: escape hatch to force the plain XLA path above a batch size.
    With the whole-tail kernel the fused path won at every measured batch
    (B=32 1.73x, B=64 1.26x, B=128 1.02x), so the default no longer gates.
    interpret=None: on TPU, compile the kernels; off-TPU fall back to the (exact)
    plain-XLA conv path — interpret-mode pallas is orders of magnitude slower at
    real sizes, so serving through the API on CPU must not silently use it
    (tests opt back in with `force_pallas_interpret`)."""
    if interpret is None:
        on_tpu = jax.default_backend() == "tpu"
        interpret = _FORCE_INTERPRET and not on_tpu
        if not on_tpu and not interpret:
            fuse_channels = ()
    if mel.shape[0] > fuse_max_batch:
        fuse_channels = ()
    pp = params["conv_pre"]
    x = _conv(mel, _wn(pp), 1, 3, 1, 1) + pp["bias"]
    ch = cfg.upsample_initial_channel
    n_stages = len(cfg.upsample_rates)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch //= 2
        fold_i = 128 // ch if (ch < 128 and 128 % ch == 0) else 1
        if (i == n_stages - 1 and cfg.resblock == "1" and k == u == fold_i
                and ch * fold_i == 128 and ch in fuse_channels):
            # whole final stage + conv_post + tanh as ONE kernel: the widest
            # activation (frames·total_upsample × C) never touches HBM
            up = params[f"up_{i}"]
            kernels, biases = [], []
            for j, rd in enumerate(cfg.resblock_dilation_sizes):
                pj = params[f"res_{i}_{j}"]
                for m in range(2 * len(rd)):
                    kernels.append(_wn(pj[f"WNConv1d_{m}"]))
                    biases.append(pj[f"WNConv1d_{m}"]["bias"])
            pp = params["conv_post"]
            audio = fused_tail_stage(
                x, _wn(up), up["bias"], kernels, biases,
                kernel_sizes=tuple(cfg.resblock_kernel_sizes),
                dilations=tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
                fold=fold_i, post_kernel=_wn(pp), post_bias=pp["bias"],
                with_post=True, rows_per_tile=rows_per_tile, interpret=interpret,
                compute_dtype=compute_dtype)
            return audio[:, : mel.shape[1] * cfg.total_upsample]
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        up = params[f"up_{i}"]
        x = _conv_transpose(x, _wn(up), u, (k - u) // 2) + up["bias"]
        # fuse only stages that FOLD (C < 128): that's where XLA under-utilizes lanes.
        # At C == 128 (fold=1) the pallas kernel must densify dilation zeros into the
        # folded matmuls (~5x FLOP inflation for d=5) while XLA's dilated conv does
        # not — measured net loss, so fall back.
        fold = 128 // ch if (ch < 128 and 128 % ch == 0) else 1
        fusable = (cfg.resblock == "1" and fold >= 2 and ch * fold == 128
                   and x.shape[1] % fold == 0 and ch in fuse_channels)
        if fusable:
            # whole MRF stage (all resblocks + averaging) in ONE pallas kernel:
            # the (B, T, C) activation makes one HBM round trip per stage instead
            # of one per resblock
            kernels, biases = [], []
            for j, rd in enumerate(cfg.resblock_dilation_sizes):
                pj = params[f"res_{i}_{j}"]
                for m in range(2 * len(rd)):
                    kernels.append(_wn(pj[f"WNConv1d_{m}"]))
                    biases.append(pj[f"WNConv1d_{m}"]["bias"])
            x = fused_mrf1(x, kernels, biases,
                           kernel_sizes=tuple(cfg.resblock_kernel_sizes),
                           dilations=tuple(tuple(d) for d in
                                           cfg.resblock_dilation_sizes),
                           fold=fold, rows_per_tile=rows_per_tile,
                           interpret=interpret, compute_dtype=compute_dtype)
        else:
            acc = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                pj = params[f"res_{i}_{j}"]
                n = 2 * len(rd)
                kernels = [_wn(pj[f"WNConv1d_{m}"]) for m in range(n)]
                biases = [pj[f"WNConv1d_{m}"]["bias"] for m in range(n)]
                acc_h = _plain_resblock1(x, kernels, biases, rd)
                acc = acc_h if acc is None else acc + acc_h
            x = acc / len(cfg.resblock_kernel_sizes)
    x = jax.nn.leaky_relu(x, 0.01)
    pp = params["conv_post"]
    x = _conv(x, _wn(pp), 1, 3, 1, 1) + pp["bias"]
    audio = jnp.tanh(x)[..., 0]
    return audio[:, : mel.shape[1] * cfg.total_upsample]


def generator_apply_fused_train(params, mel: jnp.ndarray, cfg: HifiganConfig,
                                rows_per_tile: int = 2048,
                                bwd_rows_per_tile: int = 512,
                                interpret: bool | None = None,
                                compute_dtype=None) -> jnp.ndarray:
    """Differentiable generator forward with the fused-tail TRAINING kernel.

    Same math as the flax ``Generator`` / ``generator_apply_fused``, but the final
    stage runs through ``fused_tail_stage_grad`` — a ``jax.custom_vjp`` whose backward
    is itself one pallas kernel per tile (recompute + adjoint of upsample + MRF +
    conv_post + tanh, VMEM-resident at full MXU lanes). Every other op is plain jnp,
    so ``jax.grad``/``jax.vjp`` through this function yields exact parameter grads
    (weight-norm v/g included — the `_wn` reparameterization is pulled back by XLA).

    Off-TPU (interpret=None) the fused kernel is skipped and the whole chain runs as
    plain XLA convs — still exact and differentiable, so CPU tests/training work;
    `force_pallas_interpret` opts the kernels back in for interpret-mode testing.
    Reference training hot path: cubegan.py:85-189."""
    fuse = True
    if interpret is None:
        on_tpu = jax.default_backend() == "tpu"
        interpret = _FORCE_INTERPRET and not on_tpu
        fuse = on_tpu or interpret
    pp = params["conv_pre"]
    x = _conv(mel, _wn(pp), 1, 3, 1, 1) + pp["bias"]
    ch = cfg.upsample_initial_channel
    n_stages = len(cfg.upsample_rates)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch //= 2
        fold_i = 128 // ch if (ch < 128 and 128 % ch == 0) else 1
        if (fuse and i == n_stages - 1 and cfg.resblock == "1" and k == u == fold_i
                and ch * fold_i == 128 and ch == 32):
            up = params[f"up_{i}"]
            kernels, biases = [], []
            for j, rd in enumerate(cfg.resblock_dilation_sizes):
                pj = params[f"res_{i}_{j}"]
                for m in range(2 * len(rd)):
                    kernels.append(_wn(pj[f"WNConv1d_{m}"]))
                    biases.append(pj[f"WNConv1d_{m}"]["bias"])
            pp = params["conv_post"]
            audio = fused_tail_stage_grad(
                x, _wn(up), up["bias"], tuple(kernels), tuple(biases),
                kernel_sizes=tuple(cfg.resblock_kernel_sizes),
                dilations=tuple(tuple(d) for d in cfg.resblock_dilation_sizes),
                fold=fold_i, post_kernel=_wn(pp), post_bias=pp["bias"],
                with_post=True, rows_per_tile=rows_per_tile,
                bwd_rows_per_tile=bwd_rows_per_tile, interpret=interpret,
                compute_dtype=compute_dtype)
            return audio[:, : mel.shape[1] * cfg.total_upsample]
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        up = params[f"up_{i}"]
        x = _conv_transpose(x, _wn(up), u, (k - u) // 2) + up["bias"]
        acc = None
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilation_sizes)):
            pj = params[f"res_{i}_{j}"]
            n = 2 * len(rd)
            kernels = [_wn(pj[f"WNConv1d_{m}"]) for m in range(n)]
            biases = [pj[f"WNConv1d_{m}"]["bias"] for m in range(n)]
            acc_h = _plain_resblock1(x, kernels, biases, rd)
            acc = acc_h if acc is None else acc + acc_h
        x = acc / len(cfg.resblock_kernel_sizes)
    x = jax.nn.leaky_relu(x, 0.01)
    pp = params["conv_post"]
    x = _conv(x, _wn(pp), 1, 3, 1, 1) + pp["bias"]
    audio = jnp.tanh(x)[..., 0]
    return audio[:, : mel.shape[1] * cfg.total_upsample]
