"""Multi-device mesh tests on 8 virtual CPU devices (SURVEY.md §4 layer 5):
data×model sharded Cubegan train step must compile and run."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier; fast tier = -m 'not slow'

import jax

from ttscube_tpu.models.cubegan import create_train_state, train_step
from ttscube_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_train_step,
    partition_params,
    shard_batch,
)
from tests.test_cubegan import tiny_model, toy_batch


def test_mesh_creation():
    assert len(jax.devices()) == 8
    mesh = make_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}


def test_partition_rules():
    mesh = make_mesh(model=2)
    model = tiny_model()
    batch = toy_batch(B=8)
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    shardings = partition_params(state.params, mesh, min_size=2**12)
    leaves = jax.tree.leaves(shardings)
    sharded = [s for s in leaves if any(x is not None for x in s.spec)]
    assert len(sharded) > 0, "no params picked up model-axis sharding"
    # all big LSTM weight matrices are sharded
    sh = shardings["lang"]["tower_t"]["char_rnn"]["wi_l0"]
    assert "model" in tuple(sh.spec)


def test_parallel_train_step_runs():
    mesh = make_mesh(model=2)
    model = tiny_model()
    batch = toy_batch(B=8)  # 8 items over 4-way data axis
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    step = make_parallel_train_step(model, mesh, train_step)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1


def test_parallel_synthesis_across_mesh():
    """Batched synthesis sharded over the data axis must match single-device output."""
    from ttscube_tpu.parallel.mesh import make_parallel_synthesis

    model = tiny_model()
    batch = toy_batch(B=8)
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    params = {"lang": state.params["lang"], "gen": state.params["gen"]}
    Xi = {k: v for k, v in batch.items() if k.startswith("x_")}

    single, _ = jax.jit(lambda p, x: model.infer(p, x, max_frames=64))(params, Xi)

    mesh = make_mesh(data=4, model=1)
    run = make_parallel_synthesis(model, mesh, max_frames=64)
    sharded = run(params, Xi)
    assert sharded.shape == (8, 64 * 240)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), atol=2e-4)


def test_opt_moments_shard_with_params():
    """Adam moments of model-sharded params must carry the param's sharding (no
    replicated full-size moment copies when model>1)."""
    from ttscube_tpu.parallel.mesh import partition_opt_state

    mesh = make_mesh(model=2)
    model = tiny_model()
    batch = toy_batch(B=8)
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    param_sh = partition_params(state.params, mesh, min_size=2**12)
    opt_sh = partition_opt_state(state.opt_state, state.params, mesh, param_sh)

    flat_p = {jax.tree_util.keystr(k): s
              for k, s in jax.tree_util.tree_flatten_with_path(param_sh)[0]}
    n_matched = 0
    for path, sh in jax.tree_util.tree_flatten_with_path(opt_sh)[0]:
        ks = jax.tree_util.keystr(path)
        for pks, psh in flat_p.items():
            if ks.endswith(pks) and ks != pks:
                assert sh == psh, f"{ks} sharding != its param's"
                if any(x is not None for x in psh.spec):
                    n_matched += 1
                break
    assert n_matched > 0, "no sharded moments found (tp memory win lost)"


def test_mesh_train_multi_step_single_compile():
    """10 mesh steps must reuse one executable (no per-call retrace/recompile)."""
    mesh = make_mesh(model=2)
    model = tiny_model()
    batch = toy_batch(B=8)
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    step = make_parallel_train_step(model, mesh, train_step)
    for i in range(10):
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(state.step) == 10
    assert np.isfinite(float(metrics["loss_g"]))
    assert step.jitted()._cache_size() == 1, "mesh train step retraced across calls"


def test_data_parallel_matches_single_device():
    """DP over the mesh must give the same losses as single-device (same batch, key)."""
    model = tiny_model()
    batch = toy_batch(B=4)
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    _, m_single = jax.jit(lambda s, b, r: train_step(model, s, b, r))(
        state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(data=4, model=1)
    step = make_parallel_train_step(model, mesh, train_step)
    _, m_mesh = step(state, batch, jax.random.PRNGKey(1))
    for k in ("loss_g", "loss_d", "loss_t"):
        np.testing.assert_allclose(float(m_single[k]), float(m_mesh[k]), rtol=2e-4)


def test_mesh_through_trainer_loop_with_resume(tmp_path):
    """The full trainer path on a mesh (VERDICT r3 item 7): dataset -> collate ->
    make_parallel_train_step(dp x tp) -> train/loop.py epochs -> checkpoint ->
    resume — exactly what `scripts/train_cubegan.py --mesh-data 4 --mesh-model 2`
    wires (train_cubegan.py:126-132), on the 8 virtual CPU devices.
    Match: reference train_cubegan.py:138-145 (devices=N is its distribution story)."""
    import os

    import jax.numpy as jnp

    from tests.test_data import make_corpus
    from ttscube_tpu.data.collate import CubeganCollate
    from ttscube_tpu.data.datasets import CubeganDataset
    from ttscube_tpu.data.encodings import CubeganEncodings
    from ttscube_tpu.models.cubegan import val_step
    from ttscube_tpu.train.loop import train

    make_corpus(tmp_path / "corpus", n=4)
    ds = CubeganDataset(str(tmp_path / "corpus"))
    enc = CubeganEncodings()
    enc.compute(ds)
    model = tiny_model()
    collate = CubeganCollate(enc, min_frames=60, bucket_frames=60, bucket_phones=16)

    example = {k: jnp.asarray(v) for k, v in collate([ds[i] for i in range(4)]).items()}
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    mesh = make_mesh(data=4, model=2)
    step = make_parallel_train_step(model, mesh, train_step)
    vstep = jax.jit(lambda s, b, r: val_step(model, s, b, r))

    base = str(tmp_path / "model" / "cubegan")
    final = train(state=state, train_step=step, val_step=vstep,
                  trainset=ds, devset=ds, collate=collate, batch_size=4,
                  output_base=base, selection_metric="loss_mel",
                  max_epochs=2, log_every=1)
    assert int(jax.device_get(final.step)) == 2  # 2 epochs x 1 batch of 4
    assert os.path.exists(base + ".opt.last")
    assert step.jitted() is not None  # the mesh step actually ran (and compiled once)

    # resume through the same mesh step: global step continues, params update
    resumed = train(state=state, train_step=step, val_step=vstep,
                    trainset=ds, devset=ds, collate=collate, batch_size=4,
                    output_base=base, selection_metric="loss_mel",
                    max_epochs=3, log_every=1, resume=True)
    assert int(jax.device_get(resumed.step)) == 5  # 2 resumed + 3 more epochs
