"""Pallas TPU kernel for narrow 1-D convolutions (HiFi-GAN tail resblocks).

Problem (measured): the generator's last stages run convs at C=32/64 channels over
~123k samples; with only 32 lanes occupied the MXU runs at ~17 TFLOP/s (8% of peak) and
these convs are 2/3 of end-to-end synthesis time.

Approach: time-fold F consecutive samples into the lane dimension (C·F = 128 lanes) and
express the conv as kp dense (TILE/F, 128)×(128, 128) matmuls against a block-structured
folded kernel (ops/conv.fold_conv_kernel) — numerically exact. Tiles+halos are
materialized by an XLA gather (overlapping reads can't be expressed as BlockSpecs, and
a manual HBM->VMEM halo DMA variant faulted the axon TPU worker — do not resurrect it
without testing on disposable hardware); the folded weights stay VMEM-resident. Doing
the matmuls in pallas avoids the XLA layout/fusion interference that made the same
transform *slower* at the XLA level (see HifiganConfig.fold_narrow notes).

MEASURED RESULT (v5e, B=8, T=122880, C=32, k=11): XLA conv 1.41 ms; this kernel 6.1 ms —
the gather materialization + pipeline overhead loses to XLA's native conv. Kept as a
documented experiment with interpret-mode correctness tests; NOT wired into the
generator. Next attempts should fuse whole resblocks (6 convs per HBM round trip) and
avoid the gather by chaining grid steps with VMEM-resident halos.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ttscube_tpu.ops.conv import fold_conv_kernel


def _conv_kernel_blocked(x_ref, wp_ref, out_ref, *, kp: int, n_out: int):
    """Variant with the halo pre-materialized by XLA: x block (1, 1, n_out+kp-1, FC)."""
    xb = x_ref[0, 0]
    acc = jnp.dot(xb[0:n_out], wp_ref[0], preferred_element_type=jnp.float32)
    for m in range(1, kp):
        acc += jnp.dot(xb[m : m + n_out], wp_ref[m],
                       preferred_element_type=jnp.float32)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("fold", "tile", "interpret"))
def narrow_conv_pallas_blocked(x: jnp.ndarray, w: jnp.ndarray, fold: int = 4,
                               tile: int = 2048, interpret: bool = False) -> jnp.ndarray:
    """Safer twin of `narrow_conv_pallas`: tiles+halos are materialized by an XLA gather
    (one extra HBM copy) so the pallas kernel uses plain non-overlapping BlockSpecs —
    no manual DMA."""
    B, T, C = x.shape
    assert T % tile == 0 and tile % fold == 0, (T, tile, fold)
    wp, (pl_blocks, pr_blocks) = fold_conv_kernel(w, fold)
    kp = wp.shape[0]
    FC = fold * C
    n_out = tile // fold
    n_tiles = T // tile

    xp = jnp.pad(x, ((0, 0), (pl_blocks * fold, pr_blocks * fold), (0, 0)))
    xf = xp.reshape(B, -1, FC)  # (B, T/fold + kp - 1, FC)
    starts = jnp.arange(n_tiles) * n_out
    idx = starts[:, None] + jnp.arange(n_out + kp - 1)[None, :]
    xt = jnp.take(xf, idx, axis=1)  # (B, n_tiles, n_out+kp-1, FC)

    out = pl.pallas_call(
        functools.partial(_conv_kernel_blocked, kp=kp, n_out=n_out),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, n_out + kp - 1, FC), lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, FC, FC), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_out, FC), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T // fold, FC), jnp.float32),
        interpret=interpret,
    )(xt, wp)
    return out.reshape(B, T, C)
