"""HiFi-GAN v1 in JAX/flax — generator + MPD/MSD discriminators + GAN losses.

The reference consumes these from the ``hifigan`` git submodule (imported at
``cube/networks/cubegan.py:18-21``, configured by ``examples/hifigan/config_v1.json``);
here they are in-repo, NWC layout, with the architecture from Kong et al. 2020
(https://arxiv.org/abs/2010.05646).

TPU notes: the generator is a pure conv stack — XLA maps the (transposed) convs onto the
MXU and fuses the LeakyReLU epilogues; inference over a batch of utterances is one fused
program. Discriminator reshape tricks (period folding) are pure reshapes/pads.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttscube_tpu.ops.conv import SNConv1d, WNConv1d, WNConv2d, WNConvTranspose1d

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class HifiganConfig:
    """Mirror of examples/hifigan/config_v1.json (reference cubegan.py:41-42)."""

    resblock: str = "1"
    upsample_rates: tuple[int, ...] = (5, 3, 4, 4)
    upsample_kernel_sizes: tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80
    sampling_rate: int = 24000
    # "bfloat16" runs the conv stack on the MXU at bf16 with fp32 accumulation
    # (~4x on v5e); the final conv_post + tanh stay fp32.
    compute_dtype: str = "float32"
    # "bfloat16" keeps INFERENCE activations bf16-resident *between* convs. The MXU
    # already reads fp32 conv inputs at bf16 precision (DEFAULT precision), so this
    # costs no extra rounding at the matmuls — what it buys is halving the HBM traffic
    # of the inter-conv activations, and the generator is HBM-bound at every measured
    # batch: generator-only at B=128/F=512 on v5e is 214.5 -> 149.1 ms. Serving sets
    # this to bfloat16 (api.py); training paths ignore it (grads stay fp32).
    storage_dtype: str = "float32"
    # fold time into channels for the narrow (C<=32) d=1 tail convs (exact transform,
    # ops/conv.fold_conv_kernel). Wins 4.7x on isolated convs but LOSES ~1.7x composed
    # into the full generator (XLA fusion/layout interactions) — keep off by default.
    fold_narrow: bool = False
    # stage widths whose MRF convs run polyphase-decomposed + time-folded (exact,
    # zero FLOP inflation: ops/conv.polyphase_dilated_conv — the d-phase transposes
    # convert every dilated conv to dense, and dense convs fold into full-lane
    # matmuls). The VERDICT-r3-item-5 experiment for the B=128 tail stages (C=64/32
    # sit at 33.9/56.7 ms vs a ~21 ms FLOP floor). MEASURED NEGATIVE on v5e at
    # B=128/F=512 bf16-storage (profile_synthesis --polyphase 32,64): stage2/C=64
    # 33.8 -> 62.2 ms, stage3/C=32 56.5 -> 118.2 ms (~1.9x SLOWER) — splitting time
    # into d phase-streams fragments the row axis into short segments that waste MXU
    # tiling and add transpose traffic, costing more than the zero-filled FLOPs save.
    # With fold densification also losing there (fuse_channels note below), ~56 ms at
    # C=32 is the measured wall for this batch. Keep () — the op stays for narrow-
    # batch shapes where loop fragmentation, not MXU occupancy, dominates.
    polyphase_channels: tuple[int, ...] = ()
    # inference: run the generator tail through fused pallas kernels
    # (ops/pallas_resblock.py) — the final stage (upsample + MRF + conv_post + tanh)
    # is ONE kernel, so the widest activation never touches HBM. Measured e2e serving
    # speedup on v5e: 1.73x at B=32, 1.26x at B=64, 1.02x at B=128.
    fused_tail: bool = False
    # stage widths eligible for pallas fusion on the serving path: narrow stages fold
    # time into lanes (C·fold == 128); full-lane stages (C % 128 == 0) fuse the whole
    # MRF with dilation as strided tap slices (zero FLOP inflation; the win is one HBM
    # round trip per stage instead of one per conv). Measured on v5e at B=128/F=512
    # (generator-only, fp32): plain 215 ms, (32,) 209 ms, (32,128) 215 ms,
    # (32,64) 240 ms, (32,128,256) 240 ms — the wide stages are MXU-bound there, so
    # XLA's dilated convs already win; (32,) stays the default.
    fuse_channels: tuple[int, ...] = (32,)
    # training: run the generator forward through hifigan_fused.generator_apply_fused_train
    # — the final stage is the fused kernel with a fused pallas BACKWARD
    # (ops/pallas_resblock.fused_tail_stage_grad custom VJP), so the widest
    # activation/cotangent stays in VMEM in both directions of the GAN step
    # (reference training hot path: cubegan.py:85-189).
    fused_tail_train: bool = False
    # fused_tail_train auto-falls back to the flax path above this batch size.
    # r5 window measurement (quiet box, B=16/F=500, reps in one jit): fused-fp32
    # 171.3 ms vs plain-fp32 181.8 — the fused path WINS at the trainer's real
    # batch, so the r3 gate of 8 (set when a ">30 min" B=16 compile was blamed on
    # batch scaling, later debunked as one-time trace + relay contention) is now 16.
    # Compile cost at B=16: ~230 s one-time through the relay.
    # NOTE: fused_tail_train only engages at compute_dtype="float32" — the custom-VJP
    # backward rejects bf16 (mixed-dtype conv_general_dilated); bf16-plain is already
    # the fastest working B=16 config (169.4 ms).
    fused_train_max_batch: int = 16

    @property
    def jnp_compute_dtype(self):
        import jax.numpy as _jnp
        return {"float32": None, "bfloat16": _jnp.bfloat16}[self.compute_dtype]

    @property
    def jnp_storage_dtype(self):
        import jax.numpy as _jnp
        return {"float32": None, "bfloat16": _jnp.bfloat16}[self.storage_dtype]

    @property
    def total_upsample(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out


class ResBlock1(nn.Module):
    """MRF residual block, resblock='1': two convs per dilation, residual after each pair."""

    channels: int
    kernel_size: int
    dilations: Sequence[int]
    compute_dtype: Any = None
    fold_time: int = 1
    polyphase: bool = False  # dilated convs via polyphase_dilated_conv (+fold_time)

    @nn.compact
    def __call__(self, x):
        for d in self.dilations:
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = WNConv1d(self.channels, self.kernel_size, dilation=d,
                         compute_dtype=self.compute_dtype,
                         polyphase=self.polyphase,
                         fold_time=self.fold_time if (d == 1 or self.polyphase) else 1)(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            h = WNConv1d(self.channels, self.kernel_size, dilation=1,
                         compute_dtype=self.compute_dtype, fold_time=self.fold_time)(h)
            x = x + h
        return x


class ResBlock2(nn.Module):
    """resblock='2': single conv per dilation."""

    channels: int
    kernel_size: int
    dilations: Sequence[int]
    compute_dtype: Any = None
    fold_time: int = 1
    polyphase: bool = False

    @nn.compact
    def __call__(self, x):
        for d in self.dilations:
            h = nn.leaky_relu(x, LRELU_SLOPE)
            h = WNConv1d(self.channels, self.kernel_size, dilation=d,
                         compute_dtype=self.compute_dtype,
                         polyphase=self.polyphase,
                         fold_time=self.fold_time if (d == 1 or self.polyphase) else 1)(h)
            x = x + h
        return x


class Generator(nn.Module):
    """mel (B, frames, num_mels) → waveform (B, frames · prod(upsample_rates))."""

    config: HifiganConfig = HifiganConfig()

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        cd = c.jnp_compute_dtype
        res_cls = ResBlock1 if c.resblock == "1" else ResBlock2
        x = WNConv1d(c.upsample_initial_channel, 7, padding=3, name="conv_pre",
                     compute_dtype=cd)(mel)
        ch = c.upsample_initial_channel
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = ch // 2
            x = WNConvTranspose1d(ch, k, stride=u, padding=(k - u) // 2, name=f"up_{i}",
                                  compute_dtype=cd)(x)
            poly = ch in c.polyphase_channels
            fold = max(128 // ch, 1) if (poly or (c.fold_narrow and ch <= 32)) else 1
            acc = None
            for j, (rk, rd) in enumerate(zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes)):
                h = res_cls(ch, rk, rd, compute_dtype=cd, fold_time=fold,
                            polyphase=poly, name=f"res_{i}_{j}")(x)
                acc = h if acc is None else acc + h
            x = acc / len(c.resblock_kernel_sizes)
        x = nn.leaky_relu(x.astype(jnp.float32), 0.01)  # final act/conv stay fp32
        x = WNConv1d(1, 7, padding=3, name="conv_post")(x)
        audio = jnp.tanh(x)[..., 0]
        # The reference config ([5,3,4,4] with kernels [16,16,4,4]) yields a few samples
        # more than frames·240 and re-truncates with min(...) at every use
        # (cubegan.py:98-105,132-134). Trim once here → static output length.
        return audio[:, : mel.shape[1] * c.total_upsample]


def generate_chunked(apply_fn, cond, upsample: int, chunk: int = 256, halo: int = 32):
    """Memory-bounded generator inference: run `apply_fn` (mel/cond (B, F, C) → audio
    (B, F·upsample)) over fixed-size frame windows with `halo` frames of context and
    stitch the valid centers.

    Exactness: every window is a slice of the REAL signal (never zero-padded), and a
    kept frame is either ≥ `halo` frames from its window's edges (interior — its whole
    receptive cone lies inside the window) or its window edge coincides with the true
    utterance boundary, where `apply_fn`'s own per-conv zero padding matches the
    full-utterance computation exactly. `halo` must be ≥ the receptive field in frames
    (HiFi-GAN v1: ~25; default 32). Windows run sequentially under ``lax.map`` — peak
    HBM is ONE window's activations instead of the whole utterance (fixes the B=256
    OOM noted in round 1; enables long-form/streaming synthesis).
    """
    B, T, C = cond.shape
    W = chunk + 2 * halo
    if T <= W:
        return apply_fn(cond)
    n = -(-T // chunk)  # ceil
    starts, keeps = [], []
    for i in range(n):
        k0, k1 = i * chunk, min((i + 1) * chunk, T)  # kept frames tile [0, T)
        a = min(max(k0 - halo, 0), T - W)            # window ⊂ [0, T], real data only
        starts.append(a)
        keeps.append((k0, k1))
    wins = jnp.stack([jax.lax.dynamic_slice_in_dim(cond, a, W, axis=1)
                      for a in starts])
    audio_w = jax.lax.map(apply_fn, wins)  # (n, B, W·upsample)
    out = jnp.zeros((B, T * upsample), audio_w.dtype)
    for i, (a, (k0, k1)) in enumerate(zip(starts, keeps)):
        seg = audio_w[i][:, (k0 - a) * upsample: (k1 - a) * upsample]
        out = jax.lax.dynamic_update_slice_in_dim(out, seg, k0 * upsample, axis=1)
    return out


class DiscriminatorP(nn.Module):
    """Period discriminator: fold (B, T) → (B, T/p, p, 1) and run strided 2-D convs."""

    period: int
    channels: tuple[int, ...] = (32, 128, 512, 1024)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        p = self.period
        B, T = x.shape
        if T % p:
            pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="reflect")
            T = T + pad
        h = x.reshape(B, T // p, p, 1)
        fmap = []
        for i, ch in enumerate(self.channels):
            h = WNConv2d(ch, (5, 1), strides=(3, 1), padding=(2, 0),
                         compute_dtype=self.compute_dtype, name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        h = WNConv2d(self.channels[-1], (5, 1), strides=(1, 1), padding=(2, 0),
                     compute_dtype=self.compute_dtype,
                     name=f"conv_{len(self.channels)}")(h)
        h = nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
        h = WNConv2d(1, (3, 1), strides=(1, 1), padding=(1, 0),
                     compute_dtype=self.compute_dtype, name="conv_post")(h)
        fmap.append(h)
        return h.reshape(B, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator (1-D grouped convs). use_spectral_norm=True for scale 0."""

    use_spectral_norm: bool = False
    width: int = 128  # base channel width; 128 = reference size
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_stats: bool = False):
        h = x[:, :, None]  # (B, T, 1)
        fmap = []
        w = self.width
        layers = [
            dict(features=w, kernel_size=15, stride=1, padding=7, groups=1),
            dict(features=w, kernel_size=41, stride=2, padding=20, groups=4),
            dict(features=2 * w, kernel_size=41, stride=2, padding=20, groups=16),
            dict(features=4 * w, kernel_size=41, stride=4, padding=20, groups=16),
            dict(features=8 * w, kernel_size=41, stride=4, padding=20, groups=16),
            dict(features=8 * w, kernel_size=41, stride=1, padding=20, groups=16),
            dict(features=8 * w, kernel_size=5, stride=1, padding=2, groups=1),
        ]
        in_ch = 1
        for kw in layers:  # shrunk test widths: clamp groups to divide the channels
            kw["groups"] = math.gcd(kw["groups"], math.gcd(in_ch, kw["features"]))
            in_ch = kw["features"]
        for i, kw in enumerate(layers):
            if self.use_spectral_norm:
                h = SNConv1d(**kw, compute_dtype=self.compute_dtype,
                             name=f"conv_{i}")(h, update_stats=update_stats)
            else:
                h = WNConv1d(**kw, compute_dtype=self.compute_dtype,
                             name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, LRELU_SLOPE)
            fmap.append(h)
        if self.use_spectral_norm:
            h = SNConv1d(features=1, kernel_size=3, padding=1,
                         compute_dtype=self.compute_dtype,
                         name="conv_post")(h, update_stats=update_stats)
        else:
            h = WNConv1d(features=1, kernel_size=3, padding=1,
                         compute_dtype=self.compute_dtype, name="conv_post")(h)
        fmap.append(h)
        return h.reshape(h.shape[0], -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: tuple[int, ...] = (2, 3, 5, 7, 11)
    channels: tuple[int, ...] = (32, 128, 512, 1024)
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray):
        rs, gs, fmap_rs, fmap_gs = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, channels=self.channels,
                               compute_dtype=self.compute_dtype, name=f"p{p}")
            r, fr = d(y)
            g, fg = d(y_hat)
            rs.append(r); gs.append(g); fmap_rs.append(fr); fmap_gs.append(fg)
        return rs, gs, fmap_rs, fmap_gs


class MultiScaleDiscriminator(nn.Module):
    width: int = 128
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, y: jnp.ndarray, y_hat: jnp.ndarray, update_stats: bool = False):
        def avgpool42(x):
            # torch AvgPool1d(4, stride=2, padding=2) with count_include_pad=True
            xp = jnp.pad(x, ((0, 0), (2, 2)))
            n = (xp.shape[1] - 4) // 2 + 1
            idx = jnp.arange(n) * 2
            win = xp[:, idx[:, None] + jnp.arange(4)[None, :]]
            return win.mean(axis=-1)

        rs, gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(3):
            d = DiscriminatorS(use_spectral_norm=(i == 0), width=self.width,
                               compute_dtype=self.compute_dtype, name=f"s{i}")
            r, fr = d(y, update_stats=update_stats) if i == 0 else d(y)
            g, fg = d(y_hat, update_stats=False) if i == 0 else d(y_hat)
            rs.append(r); gs.append(g); fmap_rs.append(fr); fmap_gs.append(fg)
            y = avgpool42(y)
            y_hat = avgpool42(y_hat)
        return rs, gs, fmap_rs, fmap_gs


# -- GAN losses (reference hifigan submodule models.py, used at cubegan.py:143-171) ----


def feature_loss(fmap_r, fmap_g) -> jnp.ndarray:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for r, g in zip(dr, dg):
            loss += jnp.mean(jnp.abs(r - g))
    return loss * 2.0


def discriminator_loss(disc_real, disc_generated):
    loss = 0.0
    for dr, dg in zip(disc_real, disc_generated):
        loss += jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg**2)
    return loss


def generator_loss(disc_generated) -> jnp.ndarray:
    loss = 0.0
    for dg in disc_generated:
        loss += jnp.mean((1.0 - dg) ** 2)
    return loss
