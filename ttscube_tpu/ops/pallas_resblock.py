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

Three kernels, in increasing fusion scope (all share the slab/halo/masking scheme):
  * `fused_resblock1` — one ResBlock1 per kernel (building block, fully tested);
  * `fused_mrf1` — a whole MRF stage (all resblocks + averaging) per kernel;
  * `fused_tail_stage` — the ENTIRE final generator stage: k==stride transpose-conv
    upsample (one dense matmul, zero FLOP inflation) + MRF + conv_post + tanh; the
    widest activation never touches HBM. This is what serving uses.

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


def _tail_tile_fn(z_slab, W_up, b_up, ws, bs, wpost, bpost, *, row0, pads_per_block,
                  post_pads, n_out, HL, R, compute_dtype):
    """The WHOLE generator tail stage on one VMEM-resident slab, as a PURE jnp
    function (shared by the forward kernel and — via ``jax.vjp`` traced *inside* the
    backward kernel — the fused backward):
    leaky → transpose-conv upsample (k == stride == fold: each input sample yields
    exactly one folded output row, so the upsample is ONE dense (rows, C_in)×(C_in,
    128) matmul — zero FLOP inflation) → every MRF ResBlock1 chain → average →
    [leaky(0.01) → folded conv_post → tanh →] output rows.

    z_slab: (n_out + HL + HR, C_in); row0: first slab row's global padded coordinate
    (tile · n_out). Returns (n_out, FC) stage activation, or (n_out, fold) audio rows
    when post_pads is given."""
    has_post = post_pads is not None
    lo_p, hi_p = post_pads if has_post else (0, 0)

    # 0/1 validity column computed ONCE per tile; each conv's mask is then a single
    # broadcast multiply instead of iota+compares+select — the masking was ~2x the
    # MXU time per tile at B=128 (VPU-bound kernel)
    S = z_slab.shape[0]
    coord = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) + row0
    colf = ((coord >= HL) & (coord < HL + R)).astype(z_slab.dtype)

    def mask(h, off):
        return h * colf[off: off + h.shape[0]]

    def conv(h, w, b, off):
        if compute_dtype is not None:
            h = h.astype(compute_dtype)
            w = w.astype(compute_dtype)
        kp = w.shape[0]
        rout = h.shape[0] - (kp - 1)
        acc = jnp.dot(h[0:rout], w[0], preferred_element_type=jnp.float32)
        for m in range(1, kp):
            acc += jnp.dot(h[m:m + rout], w[m], preferred_element_type=jnp.float32)
        return mask(acc + b[0], off)

    # upsample: slab row r = leaky(z[r]) @ W_up + b_up, masked outside the sequence
    h = jax.nn.leaky_relu(z_slab, 0.1)
    if compute_dtype is not None:
        h = h.astype(compute_dtype)
    slab = jnp.dot(h, W_up.astype(h.dtype),
                   preferred_element_type=jnp.float32) + b_up[0]
    slab = mask(slab, 0)

    inner = n_out + lo_p + hi_p  # MRF output rows the post conv will consume
    acc_out = None
    w_i = 0
    for pads in pads_per_block:
        HLb = sum(lo for lo, _ in pads)
        HRb = sum(hi for _, hi in pads)
        s0 = HL - lo_p - HLb
        x_res = slab[s0: s0 + inner + HLb + HRb]
        off = s0
        for p in range(len(pads) // 2):
            lo1, hi1 = pads[2 * p]
            lo2, hi2 = pads[2 * p + 1]
            hh = jax.nn.leaky_relu(x_res, 0.1)
            hh = conv(hh, ws[w_i], bs[w_i], off + lo1)
            hh = jax.nn.leaky_relu(hh, 0.1)
            hh = conv(hh, ws[w_i + 1], bs[w_i + 1], off + lo1 + lo2)
            x_res = x_res[lo1 + lo2: x_res.shape[0] - (hi1 + hi2)] + hh
            off += lo1 + lo2
            w_i += 2
        acc_out = x_res if acc_out is None else acc_out + x_res
    y = acc_out / len(pads_per_block)
    if not has_post:
        return y
    y = jax.nn.leaky_relu(y, 0.01)
    if compute_dtype is not None:
        y = y.astype(compute_dtype)
        wpost = wpost.astype(compute_dtype)
    kp = wpost.shape[0]
    rout = y.shape[0] - (kp - 1)
    audio = jnp.dot(y[0:rout], wpost[0], preferred_element_type=jnp.float32)
    for m in range(1, kp):
        audio += jnp.dot(y[m:m + rout], wpost[m], preferred_element_type=jnp.float32)
    return jnp.tanh(audio + bpost[0])


def _tail_kernel(z_ref, halo_ref, wup_ref, bup_ref, *refs, pads_per_block, post_pads,
                 n_out, HL, R, compute_dtype):
    """One tile of the whole tail stage (see `_tail_tile_fn`). The C=32 activation
    (4× the input, 32× the audio) never touches HBM."""
    n_w = sum(len(p) for p in pads_per_block)
    has_post = post_pads is not None
    extra = 2 if has_post else 0  # post kernel + bias refs
    out_ref = refs[2 * n_w + extra]
    tile = pl.program_id(1)

    halo = halo_ref[0, 0]
    z_slab = jnp.concatenate([halo[:HL], z_ref[0, 0], halo[HL:]], axis=0)
    out_ref[0, 0] = _tail_tile_fn(
        z_slab, wup_ref[:], bup_ref[:],
        tuple(r[:] for r in refs[:n_w]),
        tuple(r[:] for r in refs[n_w:2 * n_w]),
        refs[2 * n_w][:] if has_post else None,
        refs[2 * n_w + 1][:] if has_post else None,
        row0=tile * n_out, pads_per_block=pads_per_block, post_pads=post_pads,
        n_out=n_out, HL=HL, R=R, compute_dtype=compute_dtype)


@functools.partial(jax.jit, static_argnames=("kernel_sizes", "dilations", "fold",
                                             "rows_per_tile", "interpret",
                                             "compute_dtype", "with_post"))
def fused_tail_stage(z: jnp.ndarray, up_kernel, up_bias, kernels, biases, *,
                     kernel_sizes: tuple, dilations: tuple, fold: int,
                     post_kernel=None, post_bias=None, with_post: bool = False,
                     rows_per_tile: int = 2048, interpret: bool = False,
                     compute_dtype=None) -> jnp.ndarray:
    """Whole generator tail stage as ONE pallas kernel: leaky → ConvTranspose1d
    (torch layout (u, C_out, C_in), requires kernel_size == stride == fold, the
    HiFi-GAN v1 tail config models/hifigan.py:33-34) → MRF resblocks → average
    [→ leaky(0.01) → conv_post (k, C_out, 1) → tanh → audio] .

    z: (B, T_in, C_in). Returns (B, T_in·fold, C_out), or audio (B, T_in·fold)
    when with_post. Mapping out[u·i+j] = z[i] @ W[j].T verified vs
    ops/conv._conv_transpose (k == u ⇒ non-overlapping taps)."""
    B, T_in, C_in = z.shape
    u, C_out, _ = up_kernel.shape
    FC = fold * C_out
    # FC any multiple of 128: lanes beyond 128 are extra lane groups (the C=64
    # stage runs at fold=4 → FC=256)
    assert u == fold and FC % 128 == 0, (u, fold, C_out)

    W_up = jnp.concatenate([up_kernel[j].T for j in range(u)], axis=1)  # (C_in, 128)
    b_up = jnp.tile(up_bias, fold)[None]

    wps, pads_per_block = [], []
    w_i = 0
    for j, k in enumerate(kernel_sizes):
        dseq = [item for d in dilations[j] for item in (d, 1)]
        pads = []
        for d in dseq:
            wp, (lo, hi) = fold_conv_kernel(_dilate(kernels[w_i], d), fold)
            wps.append(wp)
            pads.append((int(lo), int(hi)))
            w_i += 1
        pads_per_block.append(tuple(pads))
    assert w_i == len(kernels) == len(biases)

    post_pads = None
    post_args = []
    if with_post:
        wp_post, (lo_p, hi_p) = fold_conv_kernel(post_kernel, fold)  # (kp, 128, fold)
        post_pads = (int(lo_p), int(hi_p))
        post_args = [wp_post, jnp.tile(jnp.atleast_1d(post_bias), fold)[None]]
    else:
        lo_p = hi_p = 0
    HL = max(sum(lo for lo, _ in p) for p in pads_per_block) + lo_p
    HR = max(sum(hi for _, hi in p) for p in pads_per_block) + hi_p

    R = T_in  # folded output rows == input samples (u == fold)
    Rt = min(rows_per_tile, R)
    n_tiles = -(-R // Rt)
    R_pad = n_tiles * Rt

    zf = jnp.pad(z, ((0, 0), (0, R_pad - R), (0, 0)))
    zt = zf.reshape(B, n_tiles, Rt, C_in)
    zp = jnp.pad(zf, ((0, 0), (HL, HR), (0, 0)))
    lo_idx = jnp.arange(n_tiles)[:, None] * Rt + jnp.arange(HL)[None, :]
    hi_idx = (jnp.arange(n_tiles)[:, None] + 1) * Rt + HL + jnp.arange(HR)[None, :]
    halo = zp[:, jnp.concatenate([lo_idx, hi_idx], axis=1)]

    w_specs = [pl.BlockSpec(wp.shape, lambda b, i: (0, 0, 0),
                            memory_space=pltpu.VMEM) for wp in wps]
    b_specs = [pl.BlockSpec((1, FC), lambda b, i: (0, 0),
                            memory_space=pltpu.VMEM)] * len(biases)
    post_specs = ([pl.BlockSpec(post_args[0].shape, lambda b, i: (0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, fold), lambda b, i: (0, 0),
                                memory_space=pltpu.VMEM)] if with_post else [])
    out_lanes = fold if with_post else FC
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_tail_kernel, pads_per_block=tuple(pads_per_block),
                          post_pads=post_pads, n_out=Rt, HL=HL, R=R,
                          compute_dtype=compute_dtype),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, 1, Rt, C_in), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, HL + HR, C_in), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(W_up.shape, lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, FC), lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM)] + w_specs + b_specs
                 + post_specs,
        out_specs=pl.BlockSpec((1, 1, Rt, out_lanes), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, Rt, out_lanes), jnp.float32),
        interpret=interpret,
        compiler_params=compiler_params,
    )(zt, halo, W_up, b_up, *wps, *[jnp.tile(b, fold)[None] for b in biases],
      *post_args)
    out = out.reshape(B, R_pad, out_lanes)[:, :R]
    if with_post:
        return out.reshape(B, R * fold)
    return out.reshape(B, R * fold, C_out)


# ---------------------------------------------------------------------------------
# Training: custom VJP for the whole-tail kernel (VERDICT r2 item 1).
#
# The backward is ONE pallas kernel per tile that re-derives the per-tile adjoint by
# tracing ``jax.vjp`` over the SAME pure slab function the forward kernel uses
# (`_tail_tile_fn`) — jnp-only, so the transposed ops (pad-for-slice, transposed
# dots, where-masks) lower through Mosaic like any kernel body. Per (b, tile) it
# emits the full slab cotangent (halo rows included) plus per-weight grad partials
# accumulated across tiles into VMEM-resident output blocks (tile grid dimension is
# sequential/"arbitrary"; batch stays parallel with per-b partials summed in XLA).
# Host side overlap-adds the slab cotangents into dz and pulls the folded-weight
# cotangents back through the (linear) fold/tile prep with an XLA vjp.
# ---------------------------------------------------------------------------------


def _fold_tail_weights(up_kernel, up_bias, kernels, biases, post_kernel, post_bias,
                       *, kernel_sizes, dilations, fold, with_post):
    """Raw dense tail weights → kernel operands. Every step is LINEAR (transpose +
    concat for the k==stride upsample, dilation zero-stuffing + fold scatter for the
    MRF convs, bias tiling), so weight cotangents pull back with a plain XLA vjp.

    Returns ((W_up, b_up, wps, bs_t, wp_post|None, bpost_t|None), pads_per_block,
    post_pads); the pad tuples are static python ints."""
    u = up_kernel.shape[0]
    W_up = jnp.concatenate([up_kernel[j].T for j in range(u)], axis=1)  # (C_in, FC)
    b_up = jnp.tile(up_bias, fold)[None]

    wps, bs_t, pads_per_block = [], [], []
    w_i = 0
    for j, _k in enumerate(kernel_sizes):
        dseq = [item for d in dilations[j] for item in (d, 1)]
        pads = []
        for d in dseq:
            wp, (lo, hi) = fold_conv_kernel(_dilate(kernels[w_i], d), fold)
            wps.append(wp)
            bs_t.append(jnp.tile(biases[w_i], fold)[None])
            pads.append((int(lo), int(hi)))
            w_i += 1
        pads_per_block.append(tuple(pads))
    assert w_i == len(kernels) == len(biases)

    if with_post:
        wp_post, (lo_p, hi_p) = fold_conv_kernel(post_kernel, fold)
        bpost_t = jnp.tile(jnp.atleast_1d(post_bias), fold)[None]
        post_pads = (int(lo_p), int(hi_p))
    else:
        wp_post = bpost_t = post_pads = None
    return ((W_up, b_up, tuple(wps), tuple(bs_t), wp_post, bpost_t),
            tuple(pads_per_block), post_pads)


def _tail_bwd_kernel(z_ref, halo_ref, dy_ref, wup_ref, bup_ref, *refs,
                     pads_per_block, post_pads, n_out, HL, R, compute_dtype):
    """Adjoint of one forward tile: recomputes the slab chain and pulls the output
    cotangent back through it via ``jax.vjp`` of `_tail_tile_fn` traced in-kernel.
    Every output block — the slab cotangent (with halo rows, for host-side
    overlap-add) and the per-weight grad partials — is written exactly once per
    (b, tile) grid point; partials are summed in XLA afterwards. (In-kernel
    accumulation into constant-index revisited blocks across a sequential tile dim
    MISCOMPILED on real TPU — dW_up rel err ~4-9 at 3 tiles while interpret mode was
    exact; per-tile partial blocks also keep both grid dims parallel.)"""
    n_w = sum(len(p) for p in pads_per_block)
    has_post = post_pads is not None
    extra = 2 if has_post else 0
    outs = refs[2 * n_w + extra:]
    tile = pl.program_id(1)

    halo = halo_ref[0, 0]
    z_slab = jnp.concatenate([halo[:HL], z_ref[0, 0], halo[HL:]], axis=0)
    ws = tuple(r[:] for r in refs[:n_w])
    bs = tuple(r[:] for r in refs[n_w:2 * n_w])

    def f(z_slab, W_up, b_up, ws, bs, wpost, bpost):
        return _tail_tile_fn(z_slab, W_up, b_up, ws, bs, wpost, bpost,
                             row0=tile * n_out, pads_per_block=pads_per_block,
                             post_pads=post_pads, n_out=n_out, HL=HL, R=R,
                             compute_dtype=compute_dtype)

    if has_post:
        _, pull = jax.vjp(f, z_slab, wup_ref[:], bup_ref[:], ws, bs,
                          refs[2 * n_w][:], refs[2 * n_w + 1][:])
        dz, dwup, dbup, dws, dbs, dwpost, dbpost = pull(dy_ref[0, 0])
        grads = [dwup, dbup, *dws, *dbs, dwpost, dbpost]
    else:
        _, pull = jax.vjp(lambda z, wu, bu, w, b: f(z, wu, bu, w, b, None, None),
                          z_slab, wup_ref[:], bup_ref[:], ws, bs)
        dz, dwup, dbup, dws, dbs = pull(dy_ref[0, 0])
        grads = [dwup, dbup, *dws, *dbs]

    outs[0][0, 0] = dz
    for r, g in zip(outs[1:], grads):
        r[0, 0] = g


def _tail_stage_fwd_impl(st, z, up_kernel, up_bias, kernels, biases,
                         post_kernel, post_bias):
    return fused_tail_stage(
        z, up_kernel, up_bias, list(kernels), list(biases),
        kernel_sizes=st.kernel_sizes, dilations=st.dilations, fold=st.fold,
        post_kernel=post_kernel, post_bias=post_bias, with_post=st.with_post,
        rows_per_tile=st.rows_per_tile, interpret=st.interpret,
        compute_dtype=st.compute_dtype)


class _TailStatic:
    """Hashable static config for the custom-vjp tail (jax caches tracing on it)."""

    __slots__ = ("kernel_sizes", "dilations", "fold", "rows_per_tile",
                 "bwd_rows_per_tile", "interpret", "compute_dtype", "with_post")

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw[k])

    def _key(self):
        return tuple(getattr(self, k) for k in self.__slots__)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _TailStatic) and self._key() == other._key()


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _tail_cvjp(st, z, up_kernel, up_bias, kernels, biases, post_kernel, post_bias):
    return _tail_stage_fwd_impl(st, z, up_kernel, up_bias, kernels, biases,
                                post_kernel, post_bias)


def _tail_cvjp_fwd(st, z, up_kernel, up_bias, kernels, biases, post_kernel, post_bias):
    out = _tail_stage_fwd_impl(st, z, up_kernel, up_bias, kernels, biases,
                               post_kernel, post_bias)
    return out, (z, up_kernel, up_bias, kernels, biases, post_kernel, post_bias)


def _tail_cvjp_bwd(st, res, dy):
    z, up_kernel, up_bias, kernels, biases, post_kernel, post_bias = res
    with_post = st.with_post
    fold = st.fold
    folded, pads_per_block, post_pads = _fold_tail_weights(
        up_kernel, up_bias, kernels, biases, post_kernel, post_bias,
        kernel_sizes=st.kernel_sizes, dilations=st.dilations, fold=fold,
        with_post=with_post)
    W_up, b_up, wps, bs_t, wp_post, bpost_t = folded

    B, T_in, C_in = z.shape
    C_out = up_kernel.shape[1]
    FC = fold * C_out
    out_lanes = fold if with_post else FC
    lo_p, hi_p = post_pads if with_post else (0, 0)
    HL = max(sum(lo for lo, _ in p) for p in pads_per_block) + lo_p
    HR = max(sum(hi for _, hi in p) for p in pads_per_block) + hi_p

    R = T_in
    Rt = min(st.bwd_rows_per_tile, R)
    n_tiles = -(-R // Rt)
    R_pad = n_tiles * Rt
    assert n_tiles == 1 or (Rt >= HL and Rt >= HR), (Rt, HL, HR)
    S = Rt + HL + HR

    # cotangent in folded-row form, tiled like the forward output
    dyr = dy.reshape(B, R, out_lanes)
    dyr = jnp.pad(dyr, ((0, 0), (0, R_pad - R), (0, 0)))
    dyt = dyr.reshape(B, n_tiles, Rt, out_lanes)

    zf = jnp.pad(z, ((0, 0), (0, R_pad - R), (0, 0)))
    zt = zf.reshape(B, n_tiles, Rt, C_in)
    zp = jnp.pad(zf, ((0, 0), (HL, HR), (0, 0)))
    lo_idx = jnp.arange(n_tiles)[:, None] * Rt + jnp.arange(HL)[None, :]
    hi_idx = (jnp.arange(n_tiles)[:, None] + 1) * Rt + HL + jnp.arange(HR)[None, :]
    halo = zp[:, jnp.concatenate([lo_idx, hi_idx], axis=1)]

    # every grad partial gets its own (b, tile) block — written exactly once, summed
    # in XLA after the call (see _tail_bwd_kernel docstring for why no in-kernel
    # accumulation)
    pb = lambda shape: pl.BlockSpec((1, 1) + shape,
                                    lambda b, i: (b, i) + (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    pshape = lambda shape: jax.ShapeDtypeStruct((B, n_tiles) + shape, jnp.float32)
    post_ops, post_specs, post_outs, post_out_specs = [], [], [], []
    if with_post:
        post_ops = [wp_post, bpost_t]
        post_specs = [pl.BlockSpec(wp_post.shape, lambda b, i: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(bpost_t.shape, lambda b, i: (0, 0),
                                   memory_space=pltpu.VMEM)]
        post_outs = [pshape(wp_post.shape), pshape(bpost_t.shape)]
        post_out_specs = [pb(wp_post.shape), pb(bpost_t.shape)]

    compiler_params = None
    if not st.interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024)

    outs = pl.pallas_call(
        functools.partial(_tail_bwd_kernel, pads_per_block=pads_per_block,
                          post_pads=post_pads, n_out=Rt, HL=HL, R=R,
                          compute_dtype=st.compute_dtype),
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, 1, Rt, C_in), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, HL + HR, C_in), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, Rt, out_lanes), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(W_up.shape, lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(b_up.shape, lambda b, i: (0, 0),
                               memory_space=pltpu.VMEM)]
                 + [pl.BlockSpec(w.shape, lambda b, i: (0, 0, 0),
                                 memory_space=pltpu.VMEM) for w in wps]
                 + [pl.BlockSpec(b.shape, lambda b, i: (0, 0),
                                 memory_space=pltpu.VMEM) for b in bs_t]
                 + post_specs,
        out_specs=[pl.BlockSpec((1, 1, S, C_in), lambda b, i: (b, i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pb(W_up.shape), pb(b_up.shape)]
                  + [pb(w.shape) for w in wps]
                  + [pb(b.shape) for b in bs_t]
                  + post_out_specs,
        out_shape=[jax.ShapeDtypeStruct((B, n_tiles, S, C_in), jnp.float32),
                   pshape(W_up.shape), pshape(b_up.shape)]
                  + [pshape(w.shape) for w in wps]
                  + [pshape(b.shape) for b in bs_t]
                  + post_outs,
        interpret=st.interpret,
        compiler_params=compiler_params,
    )(zt, halo, dyt, W_up, b_up, *wps, *bs_t, *post_ops)

    dz_slab, *dfold_b = outs
    dfold = [g.sum(axis=(0, 1)) for g in dfold_b]  # per-(b, tile) partials → totals

    # overlap-add the slab cotangents (each tile contributes to its halo rows too)
    left = dz_slab[:, :, :HL]
    core = dz_slab[:, :, HL:HL + Rt]
    right = dz_slab[:, :, HL + Rt:]
    acc = jnp.zeros((B, R_pad + HL + HR + Rt, C_in), jnp.float32)
    if HL:
        lf = jnp.pad(left, ((0, 0), (0, 0), (0, Rt - HL), (0, 0)))
        acc = acc.at[:, 0:R_pad].add(lf.reshape(B, R_pad, C_in))
    acc = acc.at[:, HL:HL + R_pad].add(core.reshape(B, R_pad, C_in))
    if HR:
        rf = jnp.pad(right, ((0, 0), (0, 0), (0, Rt - HR), (0, 0)))
        acc = acc.at[:, HL + Rt:HL + Rt + R_pad].add(rf.reshape(B, R_pad, C_in))
    dz = acc[:, HL:HL + T_in]

    # pull folded-weight cotangents back through the linear prep
    n_w = len(wps)
    dW_up, db_up = dfold[0], dfold[1]
    dws = tuple(dfold[2:2 + n_w])
    dbs = tuple(dfold[2 + n_w:2 + 2 * n_w])
    dpost = tuple(dfold[2 + 2 * n_w:])
    cot = (dW_up, db_up, dws, dbs,
           dpost[0] if with_post else None, dpost[1] if with_post else None)
    _, pull = jax.vjp(
        lambda uk, ub, ks, bs_, pk, pb: _fold_tail_weights(
            uk, ub, ks, bs_, pk, pb, kernel_sizes=st.kernel_sizes,
            dilations=st.dilations, fold=fold, with_post=with_post)[0],
        up_kernel, up_bias, kernels, biases, post_kernel, post_bias)
    d_up_kernel, d_up_bias, d_kernels, d_biases, d_post_kernel, d_post_bias = pull(cot)
    return (dz, d_up_kernel, d_up_bias, d_kernels, d_biases,
            d_post_kernel, d_post_bias)


_tail_cvjp.defvjp(_tail_cvjp_fwd, _tail_cvjp_bwd)


def fused_tail_stage_grad(z, up_kernel, up_bias, kernels, biases, *,
                          kernel_sizes: tuple, dilations: tuple, fold: int,
                          post_kernel=None, post_bias=None, with_post: bool = False,
                          rows_per_tile: int = 2048, bwd_rows_per_tile: int = 512,
                          interpret: bool = False, compute_dtype=None):
    """`fused_tail_stage` with a fused pallas backward (training path). The forward
    is bit-identical to the inference kernel; ``jax.grad`` through this function
    runs `_tail_bwd_kernel` — recompute + adjoint of the whole tail per tile, all
    VMEM-resident at full MXU lanes. bwd_rows_per_tile is smaller than the forward's
    because the backward keeps the linearization residuals of the whole chain live
    per tile (reference training hot path: cubegan.py:85-189)."""
    st = _TailStatic(kernel_sizes=tuple(kernel_sizes),
                     dilations=tuple(tuple(d) for d in dilations), fold=fold,
                     rows_per_tile=rows_per_tile,
                     bwd_rows_per_tile=bwd_rows_per_tile, interpret=interpret,
                     compute_dtype=compute_dtype, with_post=with_post)
    return _tail_cvjp(st, z, up_kernel, up_bias, tuple(kernels), tuple(biases),
                      post_kernel, post_bias)


def _mrf_kernel(x_ref, halo_ref, *refs, pads_per_block, dils_per_block, n_out, HL, R,
                compute_dtype):
    """One tile: a WHOLE MRF stage — every ResBlock1 chain on the same VMEM-resident
    slab, outputs averaged — so the (B, T, C) activation makes ONE HBM round trip per
    stage instead of one per resblock (plus the XLA (a+b+c)/3 pass).

    Same slab/halo/masking scheme as `_resblock_kernel`; the slab is padded with the
    LARGEST block's halo, and each block's chain starts `HL - HL_b` rows in.

    dils_per_block mirrors pads_per_block with each conv's TAP STRIDE: folded
    weights (fold>1) are densified so their stride is 1; at fold==1 the original
    (k, C, C) kernels are kept and dilation d becomes strided tap slices
    h[m·d : m·d+rout] — zero FLOP inflation at full lanes (C % 128 == 0)."""
    n_w = sum(len(p) for p in pads_per_block)
    wrefs = refs[:n_w]
    brefs = refs[n_w:2 * n_w]
    out_ref = refs[2 * n_w]
    tile = pl.program_id(1)

    S = HL + n_out + HR_of(pads_per_block)
    coord = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0) + tile * n_out
    colf = ((coord >= HL) & (coord < HL + R)).astype(jnp.float32)

    def conv(h, wref, bref, off, d):
        w = wref[:]
        if compute_dtype is not None:
            h = h.astype(compute_dtype)
            w = w.astype(compute_dtype)
        kp = w.shape[0]
        rout = h.shape[0] - d * (kp - 1)
        acc = jnp.dot(h[0:rout], w[0], preferred_element_type=jnp.float32)
        for m in range(1, kp):
            acc += jnp.dot(h[m * d:m * d + rout], w[m],
                           preferred_element_type=jnp.float32)
        acc = acc + bref[0]
        return acc * colf[off: off + rout]

    halo = halo_ref[0, 0]
    slab = jnp.concatenate([halo[:HL], x_ref[0, 0], halo[HL:]], axis=0)
    acc_out = None
    ref_i = 0
    for pads, ds in zip(pads_per_block, dils_per_block):
        HLb = sum(lo for lo, _ in pads)
        HRb = sum(hi for _, hi in pads)
        # this block only needs (HLb, HRb) of the slab's (HL, HR) margin
        hi_cut = (slab.shape[0] - (HL - HLb)) - (n_out + HLb + HRb)
        x_res = slab[HL - HLb: slab.shape[0] - hi_cut]
        off = HL - HLb
        for p in range(len(pads) // 2):
            lo1, hi1 = pads[2 * p]
            lo2, hi2 = pads[2 * p + 1]
            h = jax.nn.leaky_relu(x_res, 0.1)
            h = conv(h, wrefs[ref_i], brefs[ref_i], off + lo1, ds[2 * p])
            h = jax.nn.leaky_relu(h, 0.1)
            h = conv(h, wrefs[ref_i + 1], brefs[ref_i + 1], off + lo1 + lo2,
                     ds[2 * p + 1])
            x_res = x_res[lo1 + lo2: x_res.shape[0] - (hi1 + hi2)] + h
            off += lo1 + lo2
            ref_i += 2
        acc_out = x_res if acc_out is None else acc_out + x_res
    out_ref[0, 0] = acc_out / len(pads_per_block)


def HR_of(pads_per_block):
    return max(sum(hi for _, hi in p) for p in pads_per_block)


@functools.partial(jax.jit, static_argnames=("kernel_sizes", "dilations", "fold",
                                             "rows_per_tile", "interpret",
                                             "compute_dtype"))
def fused_mrf1(x: jnp.ndarray, kernels, biases, *, kernel_sizes: tuple,
               dilations: tuple, fold: int, rows_per_tile: int = 2048,
               interpret: bool = False, compute_dtype=None) -> jnp.ndarray:
    """A whole MRF stage — mean of len(kernel_sizes) ResBlock1s — as ONE pallas kernel.

    x: (B, T, C) with T % fold == 0 and fold·C == 128, or fold == 1 and C % 128 == 0
    (full-lane stages C=128/256: original kernels, dilation as strided tap slices —
    zero FLOP inflation, the fusion win is purely HBM traffic).
    kernels/biases: flat lists, block-major: for each resblock j, its
    2·len(dilations[j]) weight-norm-applied (k_j, C, C) kernels / (C,) biases in call
    order [conv_d, conv_1] per dilation (reference MRF structure hifigan models.py via
    models/hifigan.py:104-128)."""
    B, T, C = x.shape
    FC = fold * C
    assert (fold >= 2 and fold * C == 128) or (fold == 1 and C % 128 == 0), (fold, C)
    assert T % fold == 0, (T, fold)

    wps, pads_per_block, dils_per_block = [], [], []
    w_i = 0
    for j, k in enumerate(kernel_sizes):
        dseq = [item for d in dilations[j] for item in (d, 1)]
        pads, dils_b = [], []
        for d in dseq:
            if fold == 1:
                wp = kernels[w_i]
                lo = hi = d * (wp.shape[0] - 1) // 2
                dils_b.append(d)
            else:
                wp, (lo, hi) = fold_conv_kernel(_dilate(kernels[w_i], d), fold)
                dils_b.append(1)
            wps.append(wp)
            pads.append((int(lo), int(hi)))
            w_i += 1
        pads_per_block.append(tuple(pads))
        dils_per_block.append(tuple(dils_b))
    assert w_i == len(kernels) == len(biases)
    HL = max(sum(lo for lo, _ in p) for p in pads_per_block)
    HR = max(sum(hi for _, hi in p) for p in pads_per_block)

    R = T // fold
    Rt = min(rows_per_tile, R)
    n_tiles = -(-R // Rt)
    R_pad = n_tiles * Rt

    xf = jnp.pad(x.reshape(B, R, FC), ((0, 0), (0, R_pad - R), (0, 0)))
    xt = xf.reshape(B, n_tiles, Rt, FC)
    xp = jnp.pad(xf, ((0, 0), (HL, HR), (0, 0)))
    lo_idx = jnp.arange(n_tiles)[:, None] * Rt + jnp.arange(HL)[None, :]
    hi_idx = (jnp.arange(n_tiles)[:, None] + 1) * Rt + HL + jnp.arange(HR)[None, :]
    halo = xp[:, jnp.concatenate([lo_idx, hi_idx], axis=1)]

    w_specs = [pl.BlockSpec(wp.shape, lambda b, i: (0, 0, 0),
                            memory_space=pltpu.VMEM) for wp in wps]
    b_specs = [pl.BlockSpec((1, FC), lambda b, i: (0, 0),
                            memory_space=pltpu.VMEM)] * len(biases)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=96 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_mrf_kernel, pads_per_block=tuple(pads_per_block),
                          dils_per_block=tuple(dils_per_block),
                          n_out=Rt, HL=HL, R=R, compute_dtype=compute_dtype),
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
