"""Cubegan — multi-speaker text→waveform GAN (the reference's flagship model).

Reference: ``cube/networks/cubegan.py``. Composes Languasito2 (conditioning) + HiFi-GAN
Generator + MPD/MSD discriminators with a 4-optimizer GAN step.

TPU redesign of the training step (reference ``training_step`` cubegan.py:85-189 uses
manual optimization with ``backward(retain_graph=True)`` across 4 optimizers):

One jitted step with the reference's *sequential* (Gauss-Seidel) update semantics —
the discriminator optimizer steps FIRST, then the generator's adversarial/feature-
matching losses are evaluated against the **updated** D (reference cubegan.py:154-171:
``opt_d.step()`` at :155, then ``self._mpd(y, y_g_hat)`` at :162) — while keeping one
languasito+generator forward: the forward runs once under ``jax.vjp`` and its pullback
turns the G/T output-cotangents into parameter grads after the D update.

Optimizer-partition semantics, as in the reference's hand-built param groups:
  * D-loss sees detached ŷ           → D partition gets exactly the disc loss grads
    (the reference's loss_g→D grad pollution is *discarded* there by zero_grad order);
  * G adversarial/FM terms call the (already-updated) discriminators with
    ``stop_gradient`` on D params → gradients flow through D activations into ŷ (and
    the generator) but not into D;
  * text losses only touch the `_t` tower by construction (separate towers);
  * any extra top-level param group (e.g. the HF conditioning encoder) falls into the
    `b` partition (Adam lr 1e-6, reference cubegan.py:299-302) and receives gradients
    from every loss term flowing through it.

Optimizers: AdamW(betas=0.8/0.99, wd=0.01) for g/d/t with per-step inverse lr decay
lr/(1+1e-5·step) (reference ``_compute_lr`` cubegan.py:321-323, applied :184-188).
The optimizer state is a dict ``{"d": ..., "gtb": ...}`` — two optax multi_transforms
over the full tree so D can step mid-way through the jitted program.
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
from ttscube_tpu.ops.rnn import unroll_override

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
    # "bfloat16" runs the discriminator convs on the MXU at bf16 with fp32
    # accumulation (weight-norm/spectral-norm math stays fp32). Training-side
    # mixed precision (VERDICT r3 item 4); generator compute dtype is
    # hifigan.compute_dtype. Grad parity must be judged against the MXU
    # default-precision noise floor (CLAUDE.md pallas-VJP lesson 2).
    disc_compute_dtype: str = "float32"


class Cubegan:
    """Stateless model bundle: module instances + pure train/val/inference functions.

    Parameters live in a dict with top-level keys ``lang``/``gen``/``mpd``/``msd`` —
    the optimizer partitions fall out of this structure (vs the reference's
    hand-enumerated param groups, cubegan.py:275-311).
    """

    def __init__(self, config: CubeganConfig, train: bool = True, lm=None):
        self.config = config
        self.languasito = Languasito2(config.languasito)
        self.generator = Generator(config.hifigan)
        self.lm = lm  # optional in-model LM encoder (HF conditioning; params["hf"])
        self.train_mode = train
        if train:
            dcd = {"float32": None, "bfloat16": jnp.bfloat16}[config.disc_compute_dtype]
            self.mpd = MultiPeriodDiscriminator(channels=config.mpd_channels,
                                                compute_dtype=dcd)
            self.msd = MultiScaleDiscriminator(width=config.msd_width,
                                               compute_dtype=dcd)
        self.mel = MelSpec(gan_mel_config(config.sample_rate, hop_length=config.hop_size))

    # -- init ---------------------------------------------------------------------

    def init(self, rng, example_batch):
        k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
        params = {}
        if self.lm is not None and "x_tok_ids" in example_batch:
            params["hf"] = self.lm.init(
                k5, example_batch["x_tok_ids"], example_batch.get("x_tok_mask"))["params"]
            example_batch = self.lm_condition(params, example_batch)
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
        X = self.lm_condition(params, X)
        _, _, _, cond = self.languasito.apply({"params": params["lang"]}, X)
        return self.generator.apply({"params": params["gen"]}, cond)

    def infer(self, params, X, max_frames: int, chunk_frames: int | None = None):
        """Free synthesis (reference ``inference`` cubegan.py:74-83).

        `chunk_frames` bounds generator memory for long utterances / large batches by
        streaming fixed-size windows through the generator (hifigan.generate_chunked);
        None runs the whole utterance in one program."""
        X = self.lm_condition(params, X)
        cond, aux = self.languasito.apply(
            {"params": params["lang"]}, X, max_frames, method=Languasito2.infer)
        if self.config.hifigan.fused_tail:
            from ttscube_tpu.models.hifigan_fused import generator_apply_fused

            gen = lambda c: generator_apply_fused(
                params["gen"], c, self.config.hifigan,
                compute_dtype=self.config.hifigan.jnp_compute_dtype,
                storage_dtype=self.config.hifigan.jnp_storage_dtype,
                fuse_channels=self.config.hifigan.fuse_channels,
                polyphase_channels=self.config.hifigan.polyphase_channels)
        else:
            gen = lambda c: self.generator.apply({"params": params["gen"]}, c)
        if chunk_frames is not None:
            from ttscube_tpu.models.hifigan import generate_chunked

            audio = generate_chunked(gen, cond, self.config.hifigan.total_upsample,
                                     chunk=chunk_frames)
        else:
            audio = gen(cond)
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

    def gan_forward(self, pg, batch, rng, window: int):
        """One languasito+generator forward: the differentiable primal of the GAN step.

        `pg` holds the non-discriminator param groups ({"lang","gen"[,"hf"]}). Returns
        ``(dur_logits, pitch, vuv, y_hat), y_w`` — outputs that the loss terms consume,
        plus the cropped real audio window (param-independent, returned as vjp aux)."""
        X = self.lm_condition(pg, batch)
        dur_logits, pitch, vuv, cond = self.languasito.apply({"params": pg["lang"]}, X)
        # shorter batches use the full sequence (reference crops only when the audio
        # exceeds the window, cubegan.py:115,217)
        window = min(window, cond.shape[1])
        cond_w, y_w = self._crop(cond, batch["y_audio"], batch["n_frames"], rng, window)
        use_fused = (self.config.hifigan.fused_tail_train
                     and self.config.hifigan.compute_dtype == "float32"
                     and cond_w.shape[0] <= self.config.hifigan.fused_train_max_batch)
        if self.config.hifigan.fused_tail_train and not use_fused:
            import warnings

            if self.config.hifigan.compute_dtype != "float32":
                warnings.warn(
                    "fused_tail_train: compute_dtype="
                    f"{self.config.hifigan.compute_dtype} is not supported by the "
                    "fused custom-VJP backward (bf16 cotangents meet fp32 operands "
                    "in conv_general_dilated — r5 window measurement); falling back "
                    "to the flax generator path. bf16-plain is already the fastest "
                    "working B=16 config (169.4 ms vs fused-fp32 171.3).",
                    stacklevel=2)
            else:
                warnings.warn(
                    f"fused_tail_train: batch {cond_w.shape[0]} exceeds "
                    f"fused_train_max_batch="
                    f"{self.config.hifigan.fused_train_max_batch}; "
                    "falling back to the flax generator path (measure with "
                    "scripts/profile_train.py --fused-tail-train before raising "
                    "the cap)",
                    stacklevel=2)
        if use_fused:
            # fused pallas tail with a fused pallas BACKWARD (custom VJP): the widest
            # activation and its cotangent stay in VMEM through the GAN step
            from ttscube_tpu.models.hifigan_fused import generator_apply_fused_train

            y_hat = generator_apply_fused_train(
                pg["gen"], cond_w, self.config.hifigan,
                compute_dtype=self.config.hifigan.jnp_compute_dtype)
        else:
            y_hat = self.generator.apply({"params": pg["gen"]}, cond_w)
        return (dur_logits, pitch, vuv, y_hat), y_w

    def lm_condition(self, pg, X):
        """Resolve LM conditioning into `x_words` (identity without an LM encoder).

        With ``cond_type="hf"`` and an in-model transformer encoder, runs the encoder
        over `x_tok_ids` and gathers per-word embeddings via `x_word2tok` (reference
        cubegan.py:88-89 HF forward + modules.py:1055-1077 `_expand_i_hf`)."""
        if getattr(self, "lm", None) is None or "x_tok_ids" not in X:
            return X
        hidden = self.lm.apply({"params": pg["hf"]}, X["x_tok_ids"],
                               X.get("x_tok_mask"))
        # prepend a zero row; word2tok stores token_pos+1 with 0 = missing/pad word
        zero = jnp.zeros((hidden.shape[0], 1, hidden.shape[2]), hidden.dtype)
        hidden = jnp.concatenate([zero, hidden], axis=1)
        x_words = jnp.take_along_axis(hidden, X["x_word2tok"][:, :, None], axis=1)
        X = dict(X)
        X["x_words"] = x_words
        return X

    def d_loss(self, pd, spectral, y_w, y_hat_sg, update_spectral: bool):
        """Discriminator loss on detached ŷ (reference cubegan.py:143-154)."""
        rs, gs, _, _ = self.mpd.apply({"params": pd["mpd"]}, y_w, y_hat_sg)
        loss_disc_f = discriminator_loss(rs, gs)
        (rs, gs, _, _), new_spectral = self.msd.apply(
            {"params": pd["msd"], "spectral": spectral}, y_w, y_hat_sg,
            update_stats=update_spectral, mutable=["spectral"])
        loss_disc_s = discriminator_loss(rs, gs)
        return loss_disc_f + loss_disc_s, new_spectral["spectral"]

    def gt_losses(self, pd, spectral, batch, outs, y_w):
        """Generator + text losses given forward outputs, against the D params in `pd`
        (stop-gradient walled — D activations carry grads into ŷ, not into D)."""
        cfg = self.config
        dur_logits, pitch, vuv, y_hat = outs
        loss_duration, loss_pitch = languasito_losses(
            dur_logits, pitch, vuv, batch, cfg.languasito.max_pitch)

        y_mel = self.mel(y_w)
        y_hat_mel = self.mel(y_hat)
        loss_mel_raw = jnp.mean(jnp.abs(y_mel - y_hat_mel))

        mpd_sg = jax.lax.stop_gradient(pd["mpd"])
        msd_sg = jax.lax.stop_gradient(pd["msd"])
        _, gs_f, fr_f, fg_f = self.mpd.apply({"params": mpd_sg}, y_w, y_hat)
        _, gs_s, fr_s, fg_s = self.msd.apply(
            {"params": msd_sg, "spectral": jax.lax.stop_gradient(spectral)}, y_w, y_hat)
        loss_fm = feature_loss(fr_f, fg_f) + feature_loss(fr_s, fg_s)
        loss_adv = generator_loss(gs_f) + generator_loss(gs_s)
        loss_g = cfg.mel_weight * loss_mel_raw + loss_fm + loss_adv
        loss_t = loss_duration + loss_pitch
        metrics = {
            "loss_g": loss_g, "loss_t": loss_t,
            "loss_mel": loss_mel_raw, "loss_fm": loss_fm, "loss_adv": loss_adv,
            "loss_dur": loss_duration, "loss_pitch": loss_pitch,
        }
        return loss_g + loss_t, metrics

    def losses(self, params, spectral, batch, rng, window: int, update_spectral: bool):
        """All loss terms in one pass against the CURRENT params (validation path; the
        training step sequences D before G — see ``train_step``)."""
        pg = {k: v for k, v in params.items() if k not in ("mpd", "msd")}
        pd = {"mpd": params["mpd"], "msd": params["msd"]}
        outs, y_w = self.gan_forward(pg, batch, rng, window)
        y_hat_sg = jax.lax.stop_gradient(outs[3])
        loss_d, new_spectral = self.d_loss(pd, spectral, y_w, y_hat_sg, update_spectral)
        loss_gt, metrics = self.gt_losses(pd, new_spectral, batch, outs, y_w)
        total = loss_d + loss_gt
        metrics = dict(metrics, loss_d=loss_d)
        return total, (metrics, new_spectral)


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
    """Two optax multi_transforms over the full param tree: `d` (discriminators only)
    and `gtb` (generator/text/bert partitions only; D leaves get set_to_zero). Keeping
    them separate lets the jitted step apply the D update *before* computing G's
    adversarial losses (reference cubegan.py:154-171 sequencing)."""

    def sched(step):
        return config.lr / (1.0 + config.lr_decay * step)

    def adamw():
        return optax.adamw(learning_rate=sched, b1=0.8, b2=0.99, weight_decay=0.01)

    zero = optax.set_to_zero
    tx_d = optax.multi_transform(
        {"d": adamw(), "g": zero(), "t": zero(), "b": zero()}, partition_labels)
    tx_gtb = optax.multi_transform(
        {"g": adamw(), "t": adamw(), "b": optax.adam(learning_rate=1e-6),
         "d": zero()}, partition_labels)
    return {"d": tx_d, "gtb": tx_gtb}


class TrainState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    spectral: Any
    step: jnp.ndarray


def create_train_state(model: Cubegan, rng, example_batch) -> TrainState:
    """On TPU backends the whole init is one jitted program (~35 s compile, vs ~30 min
    eager: every eager op in the remote-compile environment costs a ~0.4 s round trip).
    On the CPU backend (tests) eager init is fastest."""
    txs = make_optimizer(model.config)

    def _build(rng):
        params, spectral = model.init(rng, example_batch)
        opt_state = {k: tx.init(params) for k, tx in txs.items()}
        return TrainState(params=params, opt_state=opt_state, spectral=spectral,
                          step=jnp.zeros((), jnp.int32))

    if jax.default_backend() == "cpu":
        return _build(rng)
    return jax.jit(_build)(rng)


def train_step(model: Cubegan, state: TrainState, batch, rng):
    """One full GAN step with the reference's D-then-G sequencing (cubegan.py:154-171):

      1. one languasito+generator forward under ``jax.vjp`` (pullback kept);
      2. D grads on detached ŷ → D optimizer step (Gauss-Seidel: G will see this);
      3. G/T losses against the **updated** D → output cotangents → pullback to
         parameter grads → g/t/b optimizer step.

    Still one forward + one backward through the conditioning net and generator, and
    zero host syncs. `rng` may be a fixed base key: it is folded with the step counter
    *inside* the jitted step, so callers don't need a per-step host-side split (an
    eager `jax.random.split` costs ~1 s per call through the TPU relay).

    Traced under ``unroll_override(1)``: autodiff transposes every scan, and the
    inference-tuned 8x unroll (ops/rnn.py SCAN_UNROLL) blows the trainer's remote
    compile past 25 min for <1% of step FLOPs — training keeps unroll=1."""
    with unroll_override(1):
        return _train_step_body(model, state, batch, rng)


def _train_step_body(model: Cubegan, state: TrainState, batch, rng):
    txs = make_optimizer(model.config)
    rng = jax.random.fold_in(rng, state.step)
    params = state.params

    pg = {k: v for k, v in params.items() if k not in ("mpd", "msd")}
    outs, pullback, y_w = jax.vjp(
        lambda pg_: model.gan_forward(pg_, batch, rng, TRAIN_FRAMES), pg, has_aux=True)
    y_hat_sg = jax.lax.stop_gradient(outs[3])

    # --- phase 1: D update against detached ŷ (reference opt_d.step, cubegan.py:155) ---
    def d_loss_fn(pd):
        return model.d_loss(pd, state.spectral, y_w, y_hat_sg, update_spectral=True)

    pd = {"mpd": params["mpd"], "msd": params["msd"]}
    (loss_d, new_spectral), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(pd)
    zeros = jax.tree.map(jnp.zeros_like, params)
    d_full = dict(zeros, **d_grads)
    d_updates, new_opt_d = txs["d"].update(d_full, state.opt_state["d"], params)
    params_after_d = optax.apply_updates(params, d_updates)

    # --- phase 2: G/T losses against the UPDATED D (reference cubegan.py:156-176) ---
    pd_new = {"mpd": params_after_d["mpd"], "msd": params_after_d["msd"]}

    def out_loss(outs):
        return model.gt_losses(pd_new, new_spectral, batch, outs, y_w)

    (_, metrics), out_grads = jax.value_and_grad(out_loss, has_aux=True)(outs)
    (pg_grads,) = pullback(out_grads)
    g_full = dict(zeros, **pg_grads)
    g_updates, new_opt_g = txs["gtb"].update(g_full, state.opt_state["gtb"],
                                             params_after_d)
    new_params = optax.apply_updates(params_after_d, g_updates)

    metrics = dict(metrics, loss_d=loss_d)
    new_state = state.replace(params=new_params,
                              opt_state={"d": new_opt_d, "gtb": new_opt_g},
                              spectral=new_spectral, step=state.step + 1)
    return new_state, metrics


def val_step(model: Cubegan, state: TrainState, batch, rng):
    """Validation losses on a 200-frame window (reference cubegan.py:191-269).
    `loss_mel` (unweighted L1) is the model-selection metric (cubegan.py:271-273).
    unroll_override(1): keep the val executable's compile small too (no autodiff
    here, but the epoch-end val trace otherwise duplicates every scan body 8x)."""
    with unroll_override(1):
        _, (metrics, _) = model.losses(state.params, state.spectral, batch, rng,
                                       window=VAL_FRAMES, update_spectral=False)
    return metrics
