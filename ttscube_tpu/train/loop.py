"""Generic training loop — the TPU replacement for the reference's pytorch_lightning
wiring (``pl.Trainer.fit`` + PrintAndSaveCallback, train_cubegan.py:31-77,138-145).

One jitted train step, one jitted val step; epochs over host-side batch iterators;
best/last/opt.last checkpoints each epoch; periodic devset synthesis hook; resume from
`{base}.opt.last` (full state incl. optimizer + global step). Metrics are fetched once
per log interval with a single device_get (per-scalar fetches are slow on the relay).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Callable, Optional

import jax
import numpy as np

from ttscube_tpu.data.datasets import batch_iterator
from ttscube_tpu.utils.checkpoint import BestKeeper, load_train_state


def train(
    *,
    state,
    train_step,                  # (state, batch, rng) -> (state, metrics)
    val_step,                    # (state, batch, rng) -> metrics
    trainset,
    devset,
    collate,
    batch_size: int,
    output_base: str,
    selection_metric: str,
    max_epochs: int = -1,
    max_steps: int = -1,
    log_every: int = 50,
    seed: int = 0,
    resume: bool = False,
    on_epoch_end: Optional[Callable] = None,   # (epoch, state) -> None
    epoch_generation: int = 10,
    opt_save_every: int = 1,   # epochs between full-state (.opt.last) saves — fetching
    # ~GB of optimizer state through the TPU relay costs ~1 min; raise on tiny epochs
    defer_best_saves: bool = False,   # keep improving params device-side and persist
    # `.best` only on the opt_save_every cadence — on relay-attached TPUs the
    # per-improvement param fetch otherwise dominates short epochs (see BestKeeper)
    cache_batches_budget: int = 4 << 30,   # fall back to streaming when the collated
    # train set exceeds this many bytes — the cache lives in device HBM (16 GB on
    # v5e, shared with params/optimizer/activations), so a real-scale corpus
    # (e.g. 13k utterances ≈ 18 GB) must not be force-cached
    cache_batches: bool = False,   # materialize every collated train/val batch on the
    # device ONCE and iterate a per-epoch permutation of the cache. Batch COMPOSITION
    # is frozen (who is grouped with whom, from the seed-epoch-0 shuffle); order still
    # reshuffles every epoch and per-step randomness (crops, noise) comes from
    # fold_in(state.step) inside the jitted step, so training stays stochastic where
    # it matters. Two wins on relay-attached TPUs: (a) the axon client leaks host
    # memory on every host->device transfer (~22 MB/step at batch 16 — a 30k-step
    # run OOM-killed a 128 GB box at step ~5.8k, r5), and a fixed batch set makes the
    # per-step transfer zero; (b) fixed shapes mean no late-epoch bucket recompiles.
):
    import jax.numpy as jnp

    if resume and os.path.exists(output_base + ".opt.last"):
        sys.stdout.write(f"Resuming from {output_base}.opt.last\n")
        try:
            state = load_train_state(output_base + ".opt.last", state)
        except ValueError as e:
            # legacy/incompatible optimizer checkpoint: resume weights only
            if not os.path.exists(output_base + ".last"):
                raise
            sys.stdout.write(f"{e}\nFalling back to weights-only resume from "
                             f"{output_base}.last (optimizer restarts at step 0)\n")
            from ttscube_tpu.utils.checkpoint import load_params

            state = state.replace(
                params=load_params(output_base + ".last", state.params))

    keeper = BestKeeper(output_base, selection_metric)
    # one fixed base key: per-step variation comes from fold_in(state.step) inside the
    # jitted step — an eager split per batch costs ~1 s each through the TPU relay
    base_rng = jax.random.PRNGKey(seed)
    val_rng = jax.random.PRNGKey(seed + 1)
    epoch = 0
    global_step = int(jax.device_get(state.step))

    train_cache = val_cache = None
    if cache_batches:
        host = list(batch_iterator(trainset, batch_size, collate,
                                   shuffle=True, seed=seed))
        total = sum(np.asarray(v).nbytes for b in host for v in b.values())
        if total > cache_batches_budget:
            sys.stdout.write(
                f"cache_batches: collated train set is {total/2**30:.1f} GiB > "
                f"budget {cache_batches_budget/2**30:.1f} GiB — streaming batches "
                f"instead (device cache must fit HBM)\n")
        else:
            train_cache = [{k: jnp.asarray(v) for k, v in b.items()} for b in host]
            val_cache = [{k: jnp.asarray(v) for k, v in b.items()}
                         for b in batch_iterator(devset, batch_size, collate,
                                                 shuffle=False)]
        del host

    def _train_batches(epoch):
        if train_cache is not None:
            order = np.random.default_rng(seed + epoch).permutation(len(train_cache))
            for i in order:
                yield train_cache[i]
        else:
            for b in batch_iterator(trainset, batch_size, collate, shuffle=True,
                                    seed=seed + epoch):
                yield {k: jnp.asarray(v) for k, v in b.items()}

    def _val_batches():
        if val_cache is not None:
            yield from val_cache
        else:
            for b in batch_iterator(devset, batch_size, collate, shuffle=False):
                yield {k: jnp.asarray(v) for k, v in b.items()}

    while max_epochs == -1 or epoch < max_epochs:
        t0 = time.time()
        window = []
        for batch in _train_batches(epoch):
            state, metrics = train_step(state, batch, base_rng)
            window.append(metrics)
            global_step += 1
            if global_step % log_every == 0:
                fetched = jax.device_get(window[-1])
                msg = " ".join(f"{k}={float(v):.4f}" for k, v in sorted(fetched.items()))
                sys.stdout.write(f"step {global_step}: {msg}\n")
                sys.stdout.flush()
                window = []
            if max_steps != -1 and global_step >= max_steps:
                break

        # validation
        val_metrics = []
        for batch in _val_batches():
            val_metrics.append(val_step(state, batch, val_rng))
        if val_metrics:
            fetched = [jax.device_get(m) for m in val_metrics]
            avg = {k: float(np.mean([m[k] for m in fetched])) for k in fetched[0]}
        else:
            avg = {selection_metric: float("inf")}
        sys.stdout.write(f"\n\tepoch {epoch} ({time.time()-t0:.1f}s) val: " +
                         " ".join(f"{k}={v:.4f}" for k, v in sorted(avg.items())) + "\n")
        # .last saves follow the .opt.last cadence (each fetches ~100s of MB through
        # the TPU relay); improvement epochs and the terminal epoch always save
        # terminal epoch for EITHER termination mode — max_steps or max_epochs —
        # must persist everything (incl. a deferred pending best)
        done = ((max_steps != -1 and global_step >= max_steps)
                or (max_epochs != -1 and epoch >= max_epochs - 1))
        cadence = epoch % max(opt_save_every, 1) == 0
        improved = keeper.update(avg[selection_metric], state,
                                 save_opt=cadence or done,
                                 save_last=cadence or done,
                                 defer_best=defer_best_saves and not done)
        saved_now = cadence or done or (improved and not defer_best_saves)
        sys.stdout.write(f"\tStored {output_base}.last" +
                         (f" + .best ({selection_metric}={avg[selection_metric]:.4f})\n"
                          if improved else "\n")
                         if saved_now else
                         ("\t(best deferred to next cadence save)\n" if improved
                          else "\t(no save this epoch)\n"))
        sys.stdout.flush()

        if on_epoch_end is not None and epoch % epoch_generation == 0:
            on_epoch_end(epoch, state)
        epoch += 1
        if max_steps != -1 and global_step >= max_steps:
            break
    return state
