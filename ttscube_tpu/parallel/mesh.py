"""Device mesh + sharding: the TPU-native replacement for the reference's delegation to
pytorch_lightning DDP/NCCL (``scripts/train_cubegan.py:138-145``; SURVEY §2.5).

Design (scaling-book style): pick a mesh with axes ``('data', 'model')``; annotate
shardings on the batch (data axis) and on large weight matrices (model axis); let XLA
insert the collectives over ICI. Data parallelism = batch sharded over 'data' with
replicated-but-for-'model' params; tensor parallelism = weight matrices sharded over
'model' (XLA all-gathers activations where needed). Gradients are averaged by XLA's
partitioner automatically since the loss is a mean over the sharded batch.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int | None = None, model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if data is None:
        data = len(devices) // model
    arr = mesh_utils.create_device_mesh((data, model), devices=devices[: data * model])
    return Mesh(arr, ("data", "model"))


def partition_params(params, mesh: Mesh, min_size: int = 2**14):
    """NamedSharding per param: shard the largest axis divisible by the model-axis size
    on 'model' for big tensors; replicate the rest. Returns a pytree of shardings."""
    model_size = mesh.shape["model"]

    def rule(p):
        if model_size > 1 and p.size >= min_size:
            # prefer the last axis (output features — lane dim), then the largest
            order = sorted(range(p.ndim), key=lambda a: (a != p.ndim - 1, -p.shape[a]))
            for axis in order:
                if p.shape[axis] % model_size == 0 and p.shape[axis] >= model_size:
                    spec = [None] * p.ndim
                    spec[axis] = "model"
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_batch(batch, mesh: Mesh):
    """Shardings placing the leading (batch) axis on 'data'."""
    def rule(x):
        spec = [None] * np.ndim(x)
        if np.ndim(x) >= 1:
            spec[0] = "data"
        return NamedSharding(mesh, P(*spec))

    return jax.tree.map(rule, batch)


def replicated(tree, mesh: Mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def partition_opt_state(opt_state, params, mesh: Mesh, param_sh=None):
    """Sharding tree for the optimizer state: each moment leaf (Adam mu/nu, …) inherits
    its param's sharding; counts/scalars replicate.

    With model>1 this is what makes tensor parallelism a memory win — replicated Adam
    moments for sharded params would force per-step all-gathers and keep full-size
    copies on every chip. Moments are matched to params by key-path suffix + shape
    (optax states embed the param tree under mu/nu, so a moment leaf's path ends with
    its param's path); the longest matching param path wins.
    """
    if param_sh is None:
        param_sh = partition_params(params, mesh)
    pflat = jax.tree_util.tree_flatten_with_path(params)[0]
    shflat = jax.tree_util.tree_flatten_with_path(param_sh)[0]
    by_key = {
        jax.tree_util.keystr(path): (np.shape(leaf), sh)
        for (path, leaf), (_, sh) in zip(pflat, shflat)
    }
    rep = NamedSharding(mesh, P())

    def rule(path, leaf):
        ks = jax.tree_util.keystr(path)
        best = None
        for pks, (shape, sh) in by_key.items():
            if ks.endswith(pks) and np.shape(leaf) == shape:
                if best is None or len(pks) > len(best[0]):
                    best = (pks, sh)
        return best[1] if best is not None else rep

    return jax.tree_util.tree_map_with_path(rule, opt_state)


def make_parallel_synthesis(model, mesh: Mesh, max_frames: int):
    """Batched multi-utterance synthesis across the mesh (SURVEY §7: serve-side
    scaling). Utterances shard over 'data'; params replicate (or shard over 'model'
    via partition_params). Returns fn(params, X) → audio (B, max_frames·hop).

    The jitted function is built once on the first call and cached, so repeated
    synthesis calls hit XLA's executable cache instead of re-tracing."""

    def infer(params, X):
        audio, _ = model.infer(params, X, max_frames=max_frames)
        return audio

    cache = {}

    def run(params, X):
        if "fn" not in cache:
            cache["param_sh"] = partition_params(params, mesh)
            cache["fn"] = jax.jit(
                infer,
                in_shardings=(cache["param_sh"], shard_batch(X, mesh)),
                out_shardings=NamedSharding(mesh, P("data")))
        # commit inputs to their target shardings — a no-op when already placed;
        # otherwise the first (uncommitted) call and later (committed) calls would
        # occupy two executable-cache entries
        params = jax.device_put(params, cache["param_sh"])
        with mesh:
            return cache["fn"](params, X)

    run.jitted = lambda: cache.get("fn")
    return run


def make_parallel_train_step(model, mesh: Mesh, train_step_fn):
    """jit a (state, batch, rng) → (state, metrics) step over the mesh.

    State shardings are derived from the params partition (optimizer moments follow
    their params via ``partition_opt_state``); the batch is sharded over 'data'. XLA
    emits the psum/all-gather collectives. The jit wrapper is constructed once (first
    call) and cached — a multi-step training run compiles exactly once."""

    def wrapped(state, batch, rng):
        return train_step_fn(model, state, batch, rng)

    cache = {}

    def run(state, batch, rng):
        if "fn" not in cache:
            param_sh = partition_params(state.params, mesh)
            state_sh = type(state)(
                params=param_sh,
                opt_state=partition_opt_state(state.opt_state, state.params, mesh,
                                              param_sh),
                spectral=replicated(state.spectral, mesh),
                step=NamedSharding(mesh, P()),
            )
            rep = NamedSharding(mesh, P())
            cache["state_sh"] = state_sh
            cache["fn"] = jax.jit(
                wrapped,
                in_shardings=(state_sh, shard_batch(batch, mesh), rep),
                out_shardings=(state_sh, rep))
        # commit the state to its target shardings — a no-op for the sharded outputs
        # of a previous step; shards the initial (uncommitted) state once. Without
        # this the uncommitted first call and committed later calls occupy two
        # executable-cache entries (a hidden recompile on step 2).
        state = jax.device_put(state, cache["state_sh"])
        with mesh:
            return cache["fn"](state, batch, rng)

    run.jitted = lambda: cache.get("fn")
    return run
