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


def make_parallel_synthesis(model, mesh: Mesh, max_frames: int):
    """Batched multi-utterance synthesis across the mesh (SURVEY §7: serve-side
    scaling). Utterances shard over 'data'; params replicate (or shard over 'model'
    via partition_params). Returns fn(params, X) → audio (B, max_frames·hop)."""

    def infer(params, X):
        audio, _ = model.infer(params, X, max_frames=max_frames)
        return audio

    def run(params, X):
        param_sh = partition_params(params, mesh)
        fn = jax.jit(infer,
                     in_shardings=(param_sh, shard_batch(X, mesh)),
                     out_shardings=NamedSharding(mesh, P("data")))
        with mesh:
            return fn(params, X)

    return run


def make_parallel_train_step(model, mesh: Mesh, train_step_fn):
    """jit a (state, batch, rng) → (state, metrics) step over the mesh.

    State shardings are derived from the params partition (optimizer state follows its
    param); the batch is sharded over 'data'. XLA emits the psum/all-gather collectives.
    """

    def wrapped(state, batch, rng):
        return train_step_fn(model, state, batch, rng)

    def place(state, batch):
        param_sh = partition_params(state.params, mesh)

        def opt_rule(x):
            # optimizer moments share their param's sharding when shapes line up;
            # everything else (counts, scalars) is replicated.
            return NamedSharding(mesh, P())

        state_sh = type(state)(
            params=param_sh,
            opt_state=jax.tree.map(opt_rule, state.opt_state),
            spectral=replicated(state.spectral, mesh),
            step=NamedSharding(mesh, P()),
        )
        batch_sh = shard_batch(batch, mesh)
        return state_sh, batch_sh

    def run(state, batch, rng):
        state_sh, batch_sh = place(state, batch)
        fn = jax.jit(wrapped,
                     in_shardings=(state_sh, batch_sh, NamedSharding(mesh, P())),
                     out_shardings=(state_sh, NamedSharding(mesh, P())))
        with mesh:
            return fn(state, batch, rng)

    return run
