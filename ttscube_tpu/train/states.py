"""Train states + jitted steps for the non-GAN models (phonemizer, G2P, textcoder,
vocoder). The Cubegan step lives in models/cubegan.py (4-partition GAN step)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ttscube_tpu.models.phonemizer import (
    Phonemizer, PhonemizerM2M, m2m_loss, phonemizer_accuracy, phonemizer_loss)
from ttscube_tpu.models.textcoder import CubenetTextcoder, textcoder_losses
from ttscube_tpu.models.wavernn import CubenetVocoder


class SimpleState(flax.struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    extra: Any = None  # batch_stats etc.


def _adamw(lr):
    return optax.adamw(learning_rate=lr, weight_decay=0.01)


def _inverse_decay(lr0: float, delta: float):
    return lambda step: lr0 / (1.0 + delta * step)


# -- phonemizer (aligned + M2M; reference train_phonemizer.py, AdamW lr 2e-4) ----------


def create_phonemizer_state(model: Phonemizer | PhonemizerM2M, rng, example_batch,
                            lr: float = 2e-4) -> SimpleState:
    tx = _adamw(lr)

    def build(rng):
        params = model.init(rng, example_batch)["params"]
        return SimpleState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))

    return build(rng) if jax.default_backend() == "cpu" else jax.jit(build)(rng)


def phonemizer_train_step(model, state: SimpleState, batch, rng=None, lr: float = 2e-4):
    tx = _adamw(lr)
    m2m = isinstance(model, PhonemizerM2M)

    def loss_fn(params):
        if m2m:
            pl_, nw, _ = model.apply({"params": params}, batch)
            return m2m_loss(pl_, nw, batch["y_phon"], batch["y_new_word"])
        logits = model.apply({"params": params}, batch)
        return phonemizer_loss(logits, batch["y_phon"])

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, opt_state=opt_state, step=state.step + 1), \
        {"loss": loss}


def phonemizer_val_step(model, state: SimpleState, batch, rng=None):
    """Returns loss + PACC/SACC counters (reference phonemizer.py:69-92, 248-274).

    For the M2M class, PACC/SACC are scored from a FREE-RUNNING decode — the reference
    deletes ``y_phon`` before the validation forward (phonemizer.py:221-246), so the
    decoder consumes its own predictions; teacher-forced logits would inflate accuracy
    (model selection via .pacc.best/.sacc.best relies on this)."""
    m2m = isinstance(model, PhonemizerM2M)
    if m2m:
        pl_, nw, _ = model.apply({"params": state.params}, batch)
        loss = m2m_loss(pl_, nw, batch["y_phon"], batch["y_new_word"])
        X_free = {k: v for k, v in batch.items() if k not in ("y_phon", "y_new_word")}
        logits, _, _ = model.apply({"params": state.params}, X_free,
                                   max_steps=batch["y_phon"].shape[1])
    else:
        logits = model.apply({"params": state.params}, batch)
        loss = phonemizer_loss(logits, batch["y_phon"])
    acc = phonemizer_accuracy(logits, batch["y_phon"])
    pacc = 1.0 - acc["perr"] / jnp.maximum(acc["phones"], 1)
    sacc = 1.0 - acc["serr"] / jnp.maximum(acc["seqs"], 1)
    return {"loss": loss, "pacc": pacc, "sacc": sacc,
            "neg_pacc": -pacc, "neg_sacc": -sacc}


# -- textcoder (reference train_textcoder.py; manual opt, inverse decay) ---------------


def create_textcoder_state(model: CubenetTextcoder, rng, example_batch,
                           lr: float = 2e-4) -> SimpleState:
    tx = optax.adamw(_inverse_decay(lr, 1e-5), weight_decay=0.01)

    def build(rng):
        variables = model.init({"params": rng, "dropout": jax.random.fold_in(rng, 7)},
                               example_batch)
        return SimpleState(params=variables["params"],
                           opt_state=tx.init(variables["params"]),
                           step=jnp.zeros((), jnp.int32),
                           extra=variables.get("batch_stats", {}))

    return build(rng) if jax.default_backend() == "cpu" else jax.jit(build)(rng)


def textcoder_train_step(model: CubenetTextcoder, state: SimpleState, batch, rng,
                         lr: float = 2e-4):
    tx = optax.adamw(_inverse_decay(lr, 1e-5), weight_decay=0.01)

    def loss_fn(params):
        outputs, mutated = model.apply(
            {"params": params, "batch_stats": state.extra}, batch, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng})
        losses = textcoder_losses(outputs, batch, model.config)
        return losses["loss"], (losses, mutated["batch_stats"])

    (_, (losses, bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, opt_state=opt_state, step=state.step + 1,
                         extra=bs), losses


def textcoder_val_step(model: CubenetTextcoder, state: SimpleState, batch, rng):
    outputs = model.apply({"params": state.params, "batch_stats": state.extra}, batch,
                          train=False, rngs={"dropout": rng})
    return textcoder_losses(outputs, batch, model.config)


# -- vocoder (reference train_vocoder.py: AdamW 1e-4, clip 5, inverse decay 5e-5) ------


def _vocoder_tx(cfg):
    return optax.chain(
        optax.clip_by_global_norm(5.0),
        optax.adamw(_inverse_decay(cfg.lr, cfg.lr_decay), weight_decay=0.01),
    )


def create_vocoder_state(voc: CubenetVocoder, rng, example_batch) -> SimpleState:
    tx = _vocoder_tx(voc.config)

    def build(rng):
        params = voc.init(rng, example_batch["mel"], example_batch["x"],
                          example_batch["x_low"])
        return SimpleState(params=params, opt_state=tx.init(params),
                           step=jnp.zeros((), jnp.int32))

    return build(rng) if jax.default_backend() == "cpu" else jax.jit(build)(rng)


def vocoder_train_step(voc: CubenetVocoder, state: SimpleState, batch, rng=None):
    tx = _vocoder_tx(voc.config)

    def loss_fn(params):
        losses = voc.losses(params, batch)
        return losses["loss"], losses

    (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(params=params, opt_state=opt_state, step=state.step + 1), losses


def vocoder_val_step(voc: CubenetVocoder, state: SimpleState, batch, rng=None):
    return voc.losses(state.params, batch)
