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
    copies on every chip. Moments are matched STRUCTURALLY: optax moment trees mirror
    the param tree (multi_transform masks leave `MaskedNode` gaps), so the state is
    walked top-down and any subtree whose key-paths + leaf shapes align with the param
    tree is mapped leaf-for-leaf onto the param shardings; everything else (counts,
    scalars) replicates. This avoids the key-suffix matching pitfall where a param
    name colliding with an optimizer field (e.g. a param literally named ``mu``) could
    inherit the wrong sharding.
    """
    import optax

    if param_sh is None:
        param_sh = partition_params(params, mesh)
    del optax  # imported only to document the MaskedNode contract below
    rep = NamedSharding(mesh, P())
    by_path = {}
    pflat = jax.tree_util.tree_flatten_with_path(params)[0]
    shflat = jax.tree_util.tree_flatten_with_path(param_sh)[0]
    for (path, leaf), (_, sh) in zip(pflat, shflat):
        by_path[jax.tree_util.keystr(path)] = (np.shape(leaf), sh)

    def try_align(sub):
        """If `sub` mirrors the param tree (same key paths, same leaf shapes), return
        its sharding tree; else None. Masked gaps need no special handling:
        `optax.MaskedNode` (and None) are ZERO-leaf pytree containers, so plain
        flattening skips them and plain tree_map preserves them structurally — the
        returned sharding tree keeps the exact treedef of `sub` (a rep leaf in a gap
        position would corrupt the treedef and break jit in_shardings)."""
        try:
            leaves = jax.tree_util.tree_flatten_with_path(sub)[0]
        except Exception:
            return None
        if not leaves:
            return None
        for path, leaf in leaves:
            hit = by_path.get(jax.tree_util.keystr(path))
            if hit is None or hit[0] != np.shape(leaf):
                return None

        def pick(path, leaf):
            return by_path[jax.tree_util.keystr(path)][1]

        return jax.tree_util.tree_map_with_path(pick, sub)

    def walk(node):
        aligned = try_align(node)
        if aligned is not None:
            return aligned
        children, treedef = jax.tree_util.tree_flatten(
            node, is_leaf=lambda x: x is not node)
        if len(children) == 1 and children[0] is node:
            return rep  # plain leaf (count scalar, u vector, …)
        return jax.tree_util.tree_unflatten(treedef, [walk(c) for c in children])

    return walk(opt_state)


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
