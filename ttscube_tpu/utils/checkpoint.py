"""Checkpoint store — the reference's file-per-artifact contract, flax-serialized.

Reference convention (SURVEY §5): ``{base}.yaml`` (config) + ``{base}.encodings`` (vocab
JSON) + ``{base}.{best,last,opt.last}`` weight files written every validation epoch
(train_cubegan.py:38-76); load with strict=False (cubegan.py:319). Here the weight files
are flax msgpack pytrees; `.opt.last` stores {opt_state, spectral, step} so resume
restores optimizer state + global step (fixing the reference's silent resume bug where
`_loaded_optimizer_state` vs `_loaded_optimizer_states` dropped it, SURVEY §5).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import yaml
from flax import serialization


def save_params(path: str, params: Any):
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_params(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_train_state(path: str, state):
    """Full TrainState (params + opt + spectral + step) → one msgpack file."""
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))


def load_train_state(path: str, template):
    with open(path, "rb") as f:
        data = f.read()
    if not data:
        # a kill mid-save (e.g. a deadline-stopped drive) leaves a 0-byte .opt.last;
        # raise the ValueError the trainer's resume path catches → weights-only
        # fallback from `.last` instead of a crash or a silent from-scratch restart
        raise ValueError(
            f"'{path}' is empty (truncated by an interrupted save). Resume weights "
            "only from '.last' — the optimizer restarts from step 0.")
    try:
        return serialization.from_bytes(template, data)
    except Exception as e:
        # round-1 `.opt.last` files stored a SINGLE multi_transform state; round-2+
        # uses a {"d","gtb"} dict of two states (models/cubegan.py:make_optimizer).
        # Detect the legacy layout and fail with a actionable message instead of a
        # raw pytree-structure mismatch.
        try:
            raw = serialization.msgpack_restore(data)
        except Exception:
            raise e
        opt = raw.get("opt_state") if isinstance(raw, dict) else None
        if isinstance(opt, dict) and not {"d", "gtb"} <= set(opt.keys()):
            raise ValueError(
                f"'{path}' is a legacy (round-1) optimizer checkpoint with a single "
                "multi_transform state; the current format keeps two states "
                "{'d','gtb'}. Resume weights only (the trainer does this when "
                ".opt.last fails to load: load_params on '.last') — the optimizer "
                "restarts from step 0.") from e
        raise


def save_config(base: str, config: dict):
    os.makedirs(os.path.dirname(os.path.abspath(base)), exist_ok=True)
    yaml.dump(config, open(base + ".yaml", "w"))


def load_config(base: str) -> dict:
    return yaml.safe_load(open(base + ".yaml"))


class BestKeeper:
    """Tracks a minimized metric and writes `{base}.best` / `{base}.last` /
    `{base}.opt.last` (reference PrintAndSaveCallback, train_cubegan.py:31-77)."""

    def __init__(self, base: str, metric_name: str = "loss"):
        self.base = base
        self.metric_name = metric_name
        self.best = float("inf")
        self._pending = None  # device-side params of an unpersisted best epoch
        os.makedirs(os.path.dirname(os.path.abspath(base)), exist_ok=True)

    def update(self, value: float, state, save_opt: bool = True,
               save_last: bool = True, defer_best: bool = False) -> bool:
        """`save_last=False` skips the `.last` write on non-improving epochs — each
        save fetches the full param tree through the TPU relay (~20 s for the 392 MB
        Cubegan tree), which dominates short epochs.

        `defer_best=True` extends that to improvement epochs: instead of fetching,
        keep a device-side *reference* to the improving params (jax arrays are
        immutable, so this is free — it just pins one extra param tree in HBM) and
        persist it on the next cadence/terminal save. Without it the r4 quality
        drive measured ~46 s/epoch vs ~11 s compute: early training improves nearly
        every 41-step epoch, so per-improvement relay fetches dominated wall time."""
        improved = value < self.best
        if improved:
            self.best = value
            # this epoch's params are now the best — any older pending ref is stale
            self._pending = state.params if defer_best else None
        persist_now = save_last or save_opt or (improved and not defer_best)
        if not persist_now:
            return improved
        host_params = jax.device_get(state.params)
        if improved and not defer_best:
            save_params(self.base + ".best", host_params)
        if self._pending is not None:
            # the pending best may be this very epoch's params — reuse the fetch
            best_host = (host_params if self._pending is state.params
                         else jax.device_get(self._pending))
            save_params(self.base + ".best", best_host)
            self._pending = None
        if save_last or improved:
            save_params(self.base + ".last", host_params)
        if save_opt:
            save_train_state(self.base + ".opt.last", state)
        return improved
