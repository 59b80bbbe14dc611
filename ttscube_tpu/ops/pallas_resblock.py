"""Fused whole-resblock pallas kernel for the HiFi-GAN generator tail.

Problem (round-1 measurement, CLAUDE.md): the generator's last stages run 1-D convs at
C=32/64 channels over ~123k samples. Two compounding losses:
  * MXU lane under-utilization — 32 of 128 lanes (~17 TFLOP/s, 8% of peak);
  * HBM traffic — each ResBlock1 is 6 convs + residual adds, each reading/writing the
    full (B, T, C) tensor (~2 GB at B=128): ~24 GB of HBM round trips per resblock
    where ~4 GB would do.

Approach (the round-1 "next idea", ops/pallas_conv.py:20-22): fuse ONE WHOLE RESBLOCK
(6 convs + leaky-relus + residuals) per HBM round trip.
  * Time-folding: F consecutive samples fold into lanes (F·C = 128), every conv becomes
    kp dense (rows,128)×(128,128) matmuls against the block-structured folded kernel
    (ops/conv.fold_conv_kernel) — numerically exact, full MXU lanes.
  * Halos: overlapping tiles are materialized ONCE per resblock by an XLA gather
    (per-conv gathers are what made the round-1 single-conv kernel 4× slower;
    amortized over 6 convs the gather is ~2% overhead at tile=1024 rows). Manual
    HBM→VMEM halo DMA is deliberately avoided — a previous variant faulted the axon
    TPU worker (see pallas_conv.py docstring).
  * Inside the kernel everything stays VMEM-resident: the valid region shrinks as the
    conv chain consumes its halo (all offsets static Python ints).

Inference-only (no custom VJP) — training keeps the flax module path, like
ops/pallas_rnn.py. Wired behind `HifiganConfig.fused_tail` via
models/hifigan_fused.generator_apply_fused.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ttscube_tpu.ops.conv import fold_conv_kernel


def _dilate(w: jnp.ndarray, d: int) -> jnp.ndarray:
    """(k, C, C) kernel → zero-stuffed (d·(k−1)+1, C, C) span (dilation as kernel)."""
    if d == 1:
        return w
    k = w.shape[0]
    return jnp.zeros((d * (k - 1) + 1,) + w.shape[1:], w.dtype).at[::d].set(w)


def _resblock_kernel(x_ref, halo_ref, *refs, pads, n_out, HL, R, compute_dtype):
    """One tile: the full ResBlock1 chain on a VMEM-resident (n_out+HL+HR, FC) slab.

    The slab is assembled in VMEM from two inputs: `x_ref` (this tile's n_out rows — an
    exact, non-overlapping partition of the signal, so its HBM→VMEM load is a pure
    block DMA) and `halo_ref` (HL left + HR right context rows, gathered host-side into
    a small side array ≈ (HL+HR)/n_out of the data). An earlier variant loaded one
    overlapping (n_out+HL+HR)-row window per tile instead; composed into the full
    generator that gather materialized/copied the whole activation tensor per resblock
    and cost ~3x end-to-end.

    After every conv the rows that fall OUTSIDE the true sequence (the utterance's own
    boundary, visible only in the first/last tiles) are re-zeroed: plain 'same' convs
    feed exact zeros to the next conv at the boundary, while a chained conv would feed
    `conv(0)+bias ≠ 0` — without the masking the fused result diverges within the
    receptive field of the utterance edges whenever biases are nonzero."""
    n_convs = len(pads)
    wrefs = refs[:n_convs]
    brefs = refs[n_convs:2 * n_convs]
    out_ref = refs[2 * n_convs]
    tile = pl.program_id(1)

    def conv(h, wref, bref, off):
        w = wref[:]
        if compute_dtype is not None:
            h = h.astype(compute_dtype)
            w = w.astype(compute_dtype)
        kp = w.shape[0]
        rout = h.shape[0] - (kp - 1)
        acc = jnp.dot(h[0:rout], w[0], preferred_element_type=jnp.float32)
        for m in range(1, kp):
            acc += jnp.dot(h[m:m + rout], w[m], preferred_element_type=jnp.float32)
        acc = acc + bref[0]
        # zero rows outside the true sequence (padded coords [HL, HL+R))
        coord = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0) + (tile * n_out + off)
        return jnp.where((coord >= HL) & (coord < HL + R), acc, 0.0)

    halo = halo_ref[0, 0]  # (HL + HR, FC)
    x_res = jnp.concatenate([halo[:HL], x_ref[0, 0], halo[HL:]], axis=0)
    off = 0
    for p in range(n_convs // 2):
        lo1, hi1 = pads[2 * p]
        lo2, hi2 = pads[2 * p + 1]
        h = jax.nn.leaky_relu(x_res, 0.1)
        h = conv(h, wrefs[2 * p], brefs[2 * p], off + lo1)
        h = jax.nn.leaky_relu(h, 0.1)
        h = conv(h, wrefs[2 * p + 1], brefs[2 * p + 1], off + lo1 + lo2)
        x_res = x_res[lo1 + lo2: x_res.shape[0] - (hi1 + hi2)] + h
        off += lo1 + lo2
    out_ref[0, 0] = x_res


@functools.partial(jax.jit, static_argnames=("kernel_size", "dilations", "fold",
                                             "rows_per_tile", "interpret",
                                             "compute_dtype"))
def fused_resblock1(x: jnp.ndarray, kernels, biases, *, kernel_size: int,
                    dilations: tuple, fold: int, rows_per_tile: int = 1024,
                    interpret: bool = False, compute_dtype=None) -> jnp.ndarray:
    """Exact ResBlock1 (models/hifigan.py:61-81) as ONE pallas kernel.

    x: (B, T, C) with T % fold == 0 and fold·C == 128 (or fold == 1 and C % 128 == 0).
    kernels: 2·len(dilations) dense (k, C, C) weight-norm-applied kernels in call
    order [conv_d, conv_1] per dilation; biases: matching (C,) biases.
    """
    B, T, C = x.shape
    FC = fold * C
    assert fold * C == 128 or (fold == 1 and C % 128 == 0), (fold, C)
    assert T % fold == 0, (T, fold)
    dseq = [item for d in dilations for item in (d, 1)]
    assert len(kernels) == len(dseq) == len(biases)

    wps, pads = [], []
    for w, d in zip(kernels, dseq):
        wd = _dilate(w, d)
        if fold > 1:
            wp, (lo, hi) = fold_conv_kernel(wd, fold)
        else:
            wp = wd
            lo = hi = (wd.shape[0] - 1) // 2
        wps.append(wp)
        pads.append((int(lo), int(hi)))
    HL = sum(lo for lo, _ in pads)
    HR = sum(hi for _, hi in pads)

    R = T // fold
    Rt = min(rows_per_tile, R)
    # pad the row count up to a tile multiple rather than shrinking the tile: real
    # generator lengths (e.g. 30736 = frames·240/fold + transpose-conv overhang) are
    # rarely nice multiples, and a collapsed tile (16 rows + 100-row halos, thousands
    # of grid steps) measured ~3x slower end-to-end. The boundary mask below already
    # zeroes rows ≥ R, so padded rows are exact.
    n_tiles = -(-R // Rt)
    R_pad = n_tiles * Rt

    xf = jnp.pad(x.reshape(B, R, FC), ((0, 0), (0, R_pad - R), (0, 0)))
    xt = xf.reshape(B, n_tiles, Rt, FC)  # layout-free: main blocks tile the signal
    # small halo side array: HL left + HR right context rows per tile (zero-padded at
    # the signal edges), ≈ (HL+HR)/Rt of the data — the only gathered input
    xp = jnp.pad(xf, ((0, 0), (HL, HR), (0, 0)))
    lo_idx = jnp.arange(n_tiles)[:, None] * Rt + jnp.arange(HL)[None, :]
    hi_idx = (jnp.arange(n_tiles)[:, None] + 1) * Rt + HL + jnp.arange(HR)[None, :]
    halo = xp[:, jnp.concatenate([lo_idx, hi_idx], axis=1)]  # (B, n_tiles, HL+HR, FC)

    w_specs = [pl.BlockSpec(wp.shape, lambda b, i: (0, 0, 0),
                            memory_space=pltpu.VMEM) for wp in wps]
    b_specs = [pl.BlockSpec((1, FC), lambda b, i: (0, 0),
                            memory_space=pltpu.VMEM)] * len(biases)
    compiler_params = None
    if not interpret:
        # tiles are fully independent → both grid dims parallel (pipelined prefetch).
        # Raise the scoped-VMEM limit from the conservative 16 MB default: the whole
        # working set (double-buffered tile + resident folded weights + chain
        # intermediates) is ~19 MB for (C=64, k=11, Rt=2048), well under the 128 MB
        # physical VMEM of v5e.
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_resblock_kernel, pads=tuple(pads), n_out=Rt,
                          HL=HL, R=R, compute_dtype=compute_dtype),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, 1, Rt, FC), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, HL + HR, FC), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM)] + w_specs + b_specs,
        out_specs=pl.BlockSpec((1, 1, Rt, FC), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, Rt, FC), jnp.float32),
        interpret=interpret,
        compiler_params=compiler_params,
    )(xt, halo, *wps, *[jnp.tile(b, fold)[None] for b in biases])
    out = out.reshape(B, R_pad, FC)[:, :R]
    return out.reshape(B, T, C)
