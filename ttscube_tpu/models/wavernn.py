"""WaveRNN + dual-rate CubenetVocoder (the legacy AR vocoder family).

Reference: ``cube/networks/modules.py:392-589`` (WaveRNN) and
``cube/networks/vocoder.py:33-190`` (dual-rate composition: a 2.4 kHz low-res WaveRNN
conditioned on mel, and a 24 kHz high-res WaveRNN conditioned on mel + the low-res
signal; high-res inference is parallelized by chopping one utterance into chunks seeded
with 1-frame/10-sample overlaps, vocoder.py:109-131).

TPU redesign:
  * teacher-forced training is already parallel — conv/GRU full-sequence with the input
    projections hoisted into MXU matmuls (ops/rnn.py);
  * the sample loop (reference modules.py:453-503 — one GRU step *per audio sample* on
    the host) becomes `nn.scan` over time with the chunk dimension as a batch axis: the
    reference's 20-chunk trick is a native batched scan here, and chunks can be hundreds
    wide on TPU at no extra cost;
  * distribution sampling runs inside the scan under a jax PRNG stream.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ttscube_tpu.models.heads import get_output_head
from ttscube_tpu.ops.conv import Conv1d
from ttscube_tpu.ops.rnn import GRU, GRUCell


def repeat_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, T, C) → (B, T·factor, C) by repetition (reference UpsampleNetR modules.py:378-389)."""
    B, T, C = x.shape
    return jnp.broadcast_to(x[:, :, None, :], (B, T, factor, C)).reshape(B, T * factor, C)


def linear_interp_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, T) → (B, T·factor): torch F.interpolate(mode='linear', align_corners=False)
    (reference UpsampleNetI modules.py:346-354)."""
    B, T = x.shape
    n = T * factor
    pos = (jnp.arange(n) + 0.5) / factor - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    w = jnp.clip(pos - lo, 0.0, 1.0)
    return x[:, lo] * (1.0 - w) + x[:, hi] * w


@dataclasses.dataclass(frozen=True)
class WaveRNNConfig:
    num_layers: int = 2
    layer_size: int = 512
    upsample: int = 240          # samples per mel frame at this rate
    upsample_low: int = 10       # hr/lr sample-rate ratio
    use_lowres: bool = True
    output: str = "mol"


class _CondNet(nn.Module):
    """Builds the per-sample conditioning: repeated mel [+ lowres conv feats + interp]."""

    config: WaveRNNConfig

    @nn.compact
    def __call__(self, mel, x_low=None):
        c = self.config
        cond = repeat_upsample(mel, c.upsample)
        if c.use_lowres:
            interp = linear_interp_upsample(x_low, c.upsample_low)[:, :, None]
            h = x_low[:, :, None]
            for i in range(3):
                h = jnp.tanh(Conv1d(20, 7, name=f"lowres_conv_{i}")(h))
            up_x = repeat_upsample(h, c.upsample_low)
            m = min(cond.shape[1], up_x.shape[1], interp.shape[1])
            cond = jnp.concatenate([cond[:, :m], up_x[:, :m], interp[:, :m]], axis=-1)
        return cond


class WaveRNN(nn.Module):
    """forward (teacher-forced) returns head logits; `generate` runs the sample loop."""

    config: WaveRNNConfig

    @property
    def head(self):
        return get_output_head(self.config.output)

    @nn.compact
    def __call__(self, mel, x, x_low=None):
        """Teacher-forced parallel train pass (reference _train_forward modules.py:505-539).
        `x` is the *shifted* previous-sample signal at the output rate."""
        c = self.config
        cond = _CondNet(c, name="cond")(mel, x_low)
        m = min(cond.shape[1], x.shape[1])
        h = jnp.concatenate([cond[:, :m], x[:, :m, None]], axis=-1)
        for i in range(c.num_layers):
            h, _ = GRU(c.layer_size, name=f"gru_{i}")(h)
        pre = jnp.tanh(nn.Dense(256, name="preoutput",
                                kernel_init=nn.initializers.xavier_uniform())(h))
        return nn.Dense(self.head.sample_size, name="output",
                        kernel_init=nn.initializers.xavier_uniform())(pre)

class WaveRNNSampler(nn.Module):
    """AR sample loop as a scan (reference _inference modules.py:453-503).

    Separate module because the scan-lifted cells have a different param-tree layout than
    the full-sequence training GRUs — `wavernn_generate_params` remaps WaveRNN params
    into this module's tree. Needs an rng stream named "sample". Returns (B, T) audio.
    """

    config: WaveRNNConfig

    @nn.compact
    def __call__(self, mel, x_low=None, x0=None):
        c = self.config
        cond = _CondNet(c, name="cond")(mel, x_low)
        B, T, _ = cond.shape
        step_mod = nn.scan(
            _WaveRNNStep,
            variable_broadcast="params",
            split_rngs={"params": False, "sample": True},
            in_axes=0,
            out_axes=0,
        )(c, name="ar")
        states0 = tuple(jnp.zeros((B, c.layer_size)) for _ in range(c.num_layers))
        last0 = jnp.zeros((B,)) if x0 is None else x0
        _, samples = step_mod((states0, last0), jnp.swapaxes(cond, 0, 1))
        return jnp.swapaxes(samples, 0, 1)


class _WaveRNNStep(nn.Module):
    config: WaveRNNConfig

    @nn.compact
    def __call__(self, carry, cond_t):
        c = self.config
        states, last_x = carry
        h = jnp.concatenate([cond_t, last_x[:, None]], axis=-1)
        new_states = []
        for i, st in enumerate(states):
            st = GRUCell(c.layer_size, name=f"cell_{i}")(st, h)
            h = st
            new_states.append(st)
        pre = jnp.tanh(nn.Dense(256, name="preoutput",
                                kernel_init=nn.initializers.xavier_uniform())(h))
        logits = nn.Dense(get_output_head(c.output).sample_size, name="output",
                          kernel_init=nn.initializers.xavier_uniform())(pre)
        rng = self.make_rng("sample")
        sample = get_output_head(c.output).sample(logits[:, None, :], rng)[:, 0]
        return (tuple(new_states), sample), sample


def wavernn_generate_params(params):
    """Remap teacher-forcing params → the `generate` scan's param tree.

    __call__ uses full-sequence GRU modules (`gru_i`: wi/wh/bi/bh per layer l0) while
    `generate` uses per-step cells under `ar/cell_i` — same math, different tree paths.
    """
    out = dict(params)
    ar = {}
    for i in (0, 1, 2, 3):
        key = f"gru_{i}"
        if key in params:
            g = params[key]
            ar[f"cell_{i}"] = {"wi": g["wi_l0"], "wh": g["wh_l0"],
                               "bi": g["bi_l0"], "bh": g["bh_l0"]}
            del out[key]
    ar["preoutput"] = out.pop("preoutput")
    ar["output"] = out.pop("output")
    out["ar"] = ar
    return out


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    """Dual-rate vocoder (reference CubenetVocoder vocoder.py:33-62)."""

    num_layers_lr: int = 2
    layer_size_lr: int = 512
    num_layers_hr: int = 2
    layer_size_hr: int = 512
    upsample: int = 240
    upsample_low: int = 10
    output: str = "mol"
    lr: float = 1e-4
    lr_decay: float = 5e-5


class CubenetVocoder:
    """Composition + pure train/infer functions for the dual WaveRNN."""

    def __init__(self, config: VocoderConfig):
        self.config = config
        hr_cfg = WaveRNNConfig(config.num_layers_hr, config.layer_size_hr,
                               config.upsample, config.upsample_low,
                               use_lowres=True, output=config.output)
        lr_cfg = WaveRNNConfig(config.num_layers_lr, config.layer_size_lr,
                               config.upsample // config.upsample_low,
                               use_lowres=False, output=config.output)
        self.hr = WaveRNN(hr_cfg)
        self.lr_net = WaveRNN(lr_cfg)
        self.hr_sampler = WaveRNNSampler(hr_cfg)
        self.lr_sampler = WaveRNNSampler(lr_cfg)

    def init(self, rng, mel, x, x_low):
        k1, k2 = jax.random.split(rng)
        p_hr = self.hr.init(k1, mel, x, x_low)["params"]
        p_lr = self.lr_net.init(k2, mel, x_low)["params"]
        return {"hr": p_hr, "lr": p_lr}

    @staticmethod
    def shift(x):
        """Teacher-forcing input: previous sample, zero-padded (reference modules.py:553-558)."""
        return jnp.pad(x[:, :-1], ((0, 0), (1, 0)))

    def losses(self, params, batch):
        """Joint lr+hr teacher-forced losses (reference vocoder.py:71-94)."""
        x, x_low, mel = batch["x"], batch["x_low"], batch["mel"]
        out_hr = self.hr.apply({"params": params["hr"]}, mel, self.shift(x), x_low)
        out_lr = self.lr_net.apply({"params": params["lr"]}, mel, self.shift(x_low))
        head = get_output_head(self.config.output)
        m = min(out_hr.shape[1], x.shape[1])
        loss_hr = head.loss(out_hr[:, :m], x[:, :m])
        m = min(out_lr.shape[1], x_low.shape[1])
        loss_lr = head.loss(out_lr[:, :m], x_low[:, :m])
        return {"hr": loss_hr, "lr": loss_lr, "loss": (loss_hr + loss_lr) / 2}

    def infer(self, params, mel, rng, num_chunks: int = 20):
        """Chunk-parallel dual-rate synthesis (reference _inference vocoder.py:96-131)."""
        cfg = self.config
        k1, k2 = jax.random.split(rng)
        # 1) low-res pass over the whole utterance
        x_low = self.lr_sampler.apply(
            {"params": wavernn_generate_params(params["lr"])}, mel,
            rngs={"sample": k1})
        # 2) chop into chunks with overlap seeding
        T_mel = (mel.shape[1] // num_chunks) * num_chunks
        mel_c = mel[:, :T_mel].reshape(num_chunks, -1, mel.shape[2])
        low_len = (x_low.shape[1] // num_chunks) * num_chunks
        xl_c = x_low[:, :low_len].reshape(num_chunks, -1)
        # prepend seed frame (-5 mel pad) / seed samples from the previous chunk.
        # NOTE: the reference seeds x_low with `upsample_low` samples (vocoder.py:126-128),
        # which is *less* than one mel frame of low-res signal — its min() truncation then
        # silently drops ~140 samples per chunk. Here the low seed is one full frame's
        # worth (upsample/upsample_low samples) so all conditioning streams align exactly.
        lr_per_frame = cfg.upsample // cfg.upsample_low
        mel_seed = jnp.concatenate(
            [jnp.full((num_chunks, 1, mel.shape[2]), -5.0).at[1:, 0].set(mel_c[:-1, -1]),
             mel_c], axis=1)
        low_seed = jnp.concatenate(
            [jnp.zeros((num_chunks, lr_per_frame)).at[1:].set(xl_c[:-1, -lr_per_frame:]),
             xl_c], axis=1)
        # 3) high-res pass, chunks advance in lock-step as a batch
        audio_c = self.hr_sampler.apply(
            {"params": wavernn_generate_params(params["hr"])}, mel_seed, low_seed,
            rngs={"sample": k2})
        # 4) drop the seed frame per chunk and stitch (reference vocoder.py:109-111)
        audio = audio_c[:, cfg.upsample:].reshape(1, -1)
        return x_low, audio
