"""Cubegan — multi-speaker text→waveform GAN (the reference's flagship model).

Reference: ``cube/networks/cubegan.py``. Composes Languasito2 (conditioning) + HiFi-GAN
Generator + MPD/MSD discriminators with a 4-optimizer GAN step.

TPU redesign of the training step (reference ``training_step`` cubegan.py:85-189 uses
manual optimization with ``backward(retain_graph=True)`` across 4 optimizers):

One jitted step, ONE forward + ONE backward. The reference's optimizer-partition
semantics are reproduced with ``stop_gradient`` walls:
  * D-loss sees detached ŷ           → D partition gets exactly the disc loss grads
    (the reference's loss_g→D grad pollution is *discarded* there by zero_grad order);
  * G adversarial/FM terms call the discriminators with ``stop_gradient`` on D params
    → gradients flow through D activations into ŷ (and the generator) but not into D;
  * text losses only touch the `_t` tower by construction (separate towers).

Optimizers: AdamW(betas=0.8/0.99, wd=0.01) for g/d/t with per-step inverse lr decay
lr/(1+1e-5·step) (reference ``_compute_lr`` cubegan.py:321-323, applied :184-188).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ttscube_tpu.dsp.mel import MelSpec, gan_mel_config
from ttscube_tpu.models.hifigan import (
    Generator,
    HifiganConfig,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)
from ttscube_tpu.models.languasito import Languasito2, LanguasitoConfig, languasito_losses

TRAIN_FRAMES = 50   # 12000-sample GAN window  (reference cubegan.py:116-128)
VAL_FRAMES = 200    # 48000-sample val window  (reference cubegan.py:218-230)


@dataclasses.dataclass(frozen=True)
class CubeganConfig:
    languasito: LanguasitoConfig
    hifigan: HifiganConfig = HifiganConfig()
    lr: float = 2e-4
    lr_decay: float = 1e-5
    sample_rate: int = 24000
    hop_size: int = 240
    mel_weight: float = 45.0
    mpd_channels: tuple = (32, 128, 512, 1024)  # reference sizes; shrink for tests
    msd_width: int = 128


class Cubegan:
    """Stateless model bundle: module instances + pure train/val/inference functions.

    Parameters live in a dict with top-level keys ``lang``/``gen``/``mpd``/``msd`` —
    the optimizer partitions fall out of this structure (vs the reference's
    hand-enumerated param groups, cubegan.py:275-311).
    """

    def __init__(self, config: CubeganConfig, train: bool = True):
        self.config = config
        self.languasito = Languasito2(config.languasito)
        self.generator = Generator(config.hifigan)
        self.train_mode = train
        if train:
            self.mpd = MultiPeriodDiscriminator(channels=config.mpd_channels)
            self.msd = MultiScaleDiscriminator(width=config.msd_width)
        self.mel = MelSpec(gan_mel_config(config.sample_rate, hop_length=config.hop_size))

    # -- init ---------------------------------------------------------------------

    def init(self, rng, example_batch):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        params = {}
        variables = self.languasito.init(k1, example_batch)
        params["lang"] = variables["params"]
        n_frames = example_batch["y_frame2phone"].shape[1]
        mel0 = jnp.zeros((1, min(n_frames, TRAIN_FRAMES), 80))
        params["gen"] = self.generator.init(k2, mel0)["params"]
        spectral = {}
        if self.train_mode:
            a0 = jnp.zeros((1, TRAIN_FRAMES * self.config.hop_size))
            params["mpd"] = self.mpd.init(k3, a0, a0)["params"]
            v = self.msd.init(k4, a0, a0)
            params["msd"] = v["params"]
            spectral = v.get("spectral", {})
        return params, spectral

    # -- forward paths ------------------------------------------------------------

    def forward(self, params, X):
        """Teacher-forced synthesis (reference ``forward`` cubegan.py:65-72)."""
        _, _, _, cond = self.languasito.apply({"params": params["lang"]}, X)
        return self.generator.apply({"params": params["gen"]}, cond)

    def infer(self, params, X, max_frames: int):
        """Free synthesis (reference ``inference`` cubegan.py:74-83)."""
        cond, aux = self.languasito.apply(
            {"params": params["lang"]}, X, max_frames, method=Languasito2.infer)
        audio = self.generator.apply({"params": params["gen"]}, cond)
        return audio, aux

    # -- train step ---------------------------------------------------------------

    def _crop(self, cond, audio, n_frames, rng, window: int):
        """Per-item random window of `window` frames (reference cubegan.py:116-128)."""
        B = cond.shape[0]
        hop = self.config.hop_size
        max_start = jnp.maximum(n_frames - window - 1, 0)
        r = jax.random.randint(rng, (B,), 0, jnp.maximum(max_start, 1))
        r = jnp.minimum(r, max_start)

        def slice_one(c, a, start):
            cw = jax.lax.dynamic_slice_in_dim(c, start, window, axis=0)
            aw = jax.lax.dynamic_slice_in_dim(a, start * hop, window * hop, axis=0)
            return cw, aw

        return jax.vmap(slice_one)(cond, audio, r)

    def losses(self, params, spectral, batch, rng, window: int, update_spectral: bool):
        """All loss terms with the stop-gradient walls described in the module docstring."""
        cfg = self.config
        dur_logits, pitch, vuv, cond = self.languasito.apply({"params": params["lang"]}, batch)
        loss_duration, loss_pitch = languasito_losses(
            dur_logits, pitch, vuv, batch, cfg.languasito.max_pitch)

        # shorter batches use the full sequence (reference crops only when the audio
        # exceeds the window, cubegan.py:115,217)
        window = min(window, cond.shape[1])
        cond_w, y_w = self._crop(cond, batch["y_audio"], batch["n_frames"], rng, window)
        y_hat = self.generator.apply({"params": params["gen"]}, cond_w)

        y_mel = self.mel(y_w)
        y_hat_mel = self.mel(y_hat)
        loss_mel_raw = jnp.mean(jnp.abs(y_mel - y_hat_mel))

        y_hat_sg = jax.lax.stop_gradient(y_hat)
        # --- discriminator loss (live D params, detached ŷ) ---
        rs, gs, _, _ = self.mpd.apply({"params": params["mpd"]}, y_w, y_hat_sg)
        loss_disc_f = discriminator_loss(rs, gs)
        (rs, gs, _, _), new_spectral = self.msd.apply(
            {"params": params["msd"], "spectral": spectral}, y_w, y_hat_sg,
            update_stats=update_spectral, mutable=["spectral"])
        loss_disc_s = discriminator_loss(rs, gs)
        loss_d = loss_disc_f + loss_disc_s

        # --- generator loss (stopped D params, live ŷ) ---
        mpd_sg = jax.lax.stop_gradient(params["mpd"])
        msd_sg = jax.lax.stop_gradient(params["msd"])
        _, gs_f, fr_f, fg_f = self.mpd.apply({"params": mpd_sg}, y_w, y_hat)
        _, gs_s, fr_s, fg_s = self.msd.apply(
            {"params": msd_sg, "spectral": jax.lax.stop_gradient(new_spectral["spectral"])},
            y_w, y_hat)
        loss_fm = feature_loss(fr_f, fg_f) + feature_loss(fr_s, fg_s)
        loss_adv = generator_loss(gs_f) + generator_loss(gs_s)
        loss_g = cfg.mel_weight * loss_mel_raw + loss_fm + loss_adv

        loss_t = loss_duration + loss_pitch
        total = loss_d + loss_g + loss_t
        metrics = {
            "loss_g": loss_g, "loss_d": loss_d, "loss_t": loss_t,
            "loss_mel": loss_mel_raw, "loss_fm": loss_fm, "loss_adv": loss_adv,
            "loss_dur": loss_duration, "loss_pitch": loss_pitch,
        }
        return total, (metrics, new_spectral["spectral"])


def partition_labels(params):
    """Label each param subtree with its optimizer partition (g/d/t).

    Mirrors the reference's hand-built param groups (cubegan.py:275-302):
    generator + `_g` tower → g; discriminators → d; `_t` tower + dur/pitch → t.
    """
    labels = {}
    for top, sub in params.items():
        if top == "gen":
            labels[top] = jax.tree.map(lambda _: "g", sub)
        elif top in ("mpd", "msd"):
            labels[top] = jax.tree.map(lambda _: "d", sub)
        elif top == "lang":
            lab = {}
            for name, tree in sub.items():
                part = "g" if name in ("tower_g", "cond_rnn", "cond_output") else "t"
                lab[name] = jax.tree.map(lambda _, p=part: p, tree)
            labels[top] = lab
        else:
            labels[top] = jax.tree.map(lambda _: "b", sub)
    return labels


def make_optimizer(config: CubeganConfig):
    def sched(step):
        return config.lr / (1.0 + config.lr_decay * step)

    def adamw():
        return optax.adamw(learning_rate=sched, b1=0.8, b2=0.99, weight_decay=0.01)

    return optax.multi_transform(
        {"g": adamw(), "d": adamw(), "t": adamw(),
         "b": optax.adam(learning_rate=1e-6)},
        partition_labels,
    )


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    spectral: Any
    step: jnp.ndarray


def create_train_state(model: Cubegan, rng, example_batch) -> TrainState:
    """On TPU backends the whole init is one jitted program (~35 s compile, vs ~30 min
    eager: every eager op in the remote-compile environment costs a ~0.4 s round trip).
    On the CPU backend (tests) eager init is fastest."""
    tx = make_optimizer(model.config)

    def _build(rng):
        params, spectral = model.init(rng, example_batch)
        return TrainState(params=params, opt_state=tx.init(params), spectral=spectral,
                          step=jnp.zeros((), jnp.int32))

    if jax.default_backend() == "cpu":
        return _build(rng)
    return jax.jit(_build)(rng)


def train_step(model: Cubegan, state: TrainState, batch, rng):
    """One full GAN step: grads for all partitions in one backward, 4 optax updates.

    `rng` may be a fixed base key: it is folded with the step counter *inside* the
    jitted step, so callers don't need a per-step host-side split (an eager
    `jax.random.split` costs ~1 s per call through the TPU relay)."""
    tx = make_optimizer(model.config)
    rng = jax.random.fold_in(rng, state.step)

    def loss_fn(params):
        return model.losses(params, state.spectral, batch, rng,
                            window=TRAIN_FRAMES, update_spectral=True)

    (_, (metrics, new_spectral)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, new_opt = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(params=new_params, opt_state=new_opt,
                              spectral=new_spectral, step=state.step + 1)
    return new_state, metrics


def val_step(model: Cubegan, state: TrainState, batch, rng):
    """Validation losses on a 200-frame window (reference cubegan.py:191-269).
    `loss_mel` (unweighted L1) is the model-selection metric (cubegan.py:271-273)."""
    _, (metrics, _) = model.losses(state.params, state.spectral, batch, rng,
                                   window=VAL_FRAMES, update_spectral=False)
    return metrics
