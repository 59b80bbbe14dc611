"""Cubegan GAN-step tests: shapes, jit, and — critically — optimizer-partition gradient
isolation reproducing the reference's 4-optimizer semantics (cubegan.py:85-189,275-311)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full tier; fast tier = -m 'not slow'

import jax
import jax.numpy as jnp

from ttscube_tpu.models.cubegan import (
    Cubegan,
    CubeganConfig,
    TrainState,
    create_train_state,
    train_step,
    val_step,
)
from ttscube_tpu.models.hifigan import HifiganConfig
from ttscube_tpu.models.languasito import LanguasitoConfig
from ttscube_tpu.ops.length_regulator import durations_to_frame2phone_np

TINY_HIFI = HifiganConfig(
    upsample_rates=(5, 3, 4, 4),
    upsample_kernel_sizes=(16, 16, 4, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


def tiny_model():
    cfg = CubeganConfig(
        languasito=LanguasitoConfig(num_phones=30, num_speakers=3, max_pitch=400,
                                    max_duration=100),
        hifigan=TINY_HIFI,
        mpd_channels=(8, 16),
        msd_width=8,
    )
    return Cubegan(cfg)


def toy_batch(B=2, N=16, F=60, key=0):
    rng = np.random.default_rng(key)
    x_char = np.zeros((B, N), np.int32)
    durs = np.zeros((B, N), np.int32)
    n_valid = np.array([N - (5 if b % 2 else 0) for b in range(B)])
    for b in range(B):
        x_char[b, : n_valid[b]] = rng.integers(1, 30, n_valid[b])
        durs[b, : n_valid[b]] = rng.integers(2, 6, n_valid[b])
    f2p, fmask = durations_to_frame2phone_np(durs, n_valid, F)
    pitch = (rng.uniform(80, 300, (B, F)) * np.asarray(fmask)).astype(np.float32)
    audio = (0.2 * rng.standard_normal((B, F * 240))).astype(np.float32)
    return {
        "x_char": jnp.asarray(x_char),
        "x_speaker": jnp.asarray(rng.integers(1, 3, (B, 1))),
        "y_frame2phone": f2p,
        "y_frame_mask": fmask,
        "y_pitch": jnp.asarray(pitch),
        "y_dur": jnp.asarray(durs),
        "y_audio": jnp.asarray(audio),
        "n_frames": jnp.asarray(fmask.sum(axis=1), jnp.int32),
    }


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    batch = toy_batch()
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    return model, batch, state


def test_train_step_runs_and_updates(setup):
    model, batch, state = setup
    step = jax.jit(lambda s, b, r: train_step(model, s, b, r))
    s1, m1 = step(state, batch, jax.random.PRNGKey(1))
    s2, m2 = step(s1, batch, jax.random.PRNGKey(2))
    for k, v in m2.items():
        assert np.isfinite(float(v)), k
    assert int(s2.step) == 2
    # all partitions moved
    for part in ("gen", "mpd", "msd", "lang"):
        before = jax.tree.leaves(state.params[part])[0]
        after = jax.tree.leaves(s2.params[part])[0]
        assert not np.allclose(np.asarray(before), np.asarray(after)), part


def test_gradient_partition_isolation(setup):
    """The stop-gradient walls must reproduce the reference's optimizer partitioning:
    D params receive ONLY disc-loss grads; `_t` tower receives ONLY text-loss grads;
    generator receives no grads from the disc loss."""
    model, batch, state = setup
    rng = jax.random.PRNGKey(3)

    def term(params, name):
        _, (m, _) = model.losses(params, state.spectral, batch, rng, 50, False)
        return m[name]

    def total(params):
        t, (m, _) = model.losses(params, state.spectral, batch, rng, 50, False)
        return t

    g_total = jax.grad(total)(state.params)
    g_d = jax.grad(lambda p: term(p, "loss_d"))(state.params)
    g_t = jax.grad(lambda p: term(p, "loss_t"))(state.params)

    # D partition of the total grad == pure disc-loss grad (no adversarial pollution)
    for a, b in zip(jax.tree.leaves(g_total["mpd"]), jax.tree.leaves(g_d["mpd"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # disc loss sends nothing into the generator (detached ŷ)
    assert all(float(jnp.abs(x).max()) == 0 for x in jax.tree.leaves(g_d["gen"]))
    # text tower of the total grad == pure text-loss grad
    for a, b in zip(jax.tree.leaves(g_total["lang"]["tower_t"]),
                    jax.tree.leaves(g_t["lang"]["tower_t"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # text loss doesn't touch the GAN tower
    assert all(float(jnp.abs(x).max()) == 0 for x in jax.tree.leaves(g_t["lang"]["tower_g"]))
    # but the generator DOES get adversarial+mel grads (total ≠ 0 there)
    assert any(float(jnp.abs(x).max()) > 0 for x in jax.tree.leaves(g_total["gen"]))


def test_d_then_g_sequencing(setup):
    """train_step must match a manual Gauss-Seidel composition — D optimizer steps
    first, G's adversarial/FM losses evaluated against the POST-update D (reference
    cubegan.py:154-171: opt_d.step() at :155, then self._mpd(y, y_g_hat) at :162) —
    and must differ from the Jacobi variant (G vs pre-update D)."""
    import optax

    from ttscube_tpu.models.cubegan import TRAIN_FRAMES, make_optimizer

    model, batch, state = setup
    rng0 = jax.random.PRNGKey(5)
    new_state, _ = jax.jit(lambda s, b, r: train_step(model, s, b, r))(
        state, batch, rng0)

    txs = make_optimizer(model.config)
    rng = jax.random.fold_in(rng0, state.step)
    params = state.params
    pg = {k: v for k, v in params.items() if k not in ("mpd", "msd")}
    zeros = jax.tree.map(jnp.zeros_like, params)

    outs, y_w = model.gan_forward(pg, batch, rng, TRAIN_FRAMES)
    y_hat_sg = jax.lax.stop_gradient(outs[3])
    pd = {"mpd": params["mpd"], "msd": params["msd"]}
    (_, new_spec), d_grads = jax.value_and_grad(
        lambda p: model.d_loss(p, state.spectral, y_w, y_hat_sg, True),
        has_aux=True)(pd)
    d_updates, _ = txs["d"].update(dict(zeros, **d_grads), state.opt_state["d"], params)
    params_after_d = optax.apply_updates(params, d_updates)

    def g_total(pg_, pd_):
        outs_, y_w_ = model.gan_forward(pg_, batch, rng, TRAIN_FRAMES)
        loss, _ = model.gt_losses(pd_, new_spec, batch, outs_, y_w_)
        return loss

    pd_new = {"mpd": params_after_d["mpd"], "msd": params_after_d["msd"]}
    g_grads = jax.grad(g_total)(pg, pd_new)
    g_updates, _ = txs["gtb"].update(dict(zeros, **g_grads), state.opt_state["gtb"],
                                     params_after_d)
    expected = optax.apply_updates(params_after_d, g_updates)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5),
        new_state.params, expected)

    # the Jacobi variant (pre-update D) must move the generator differently —
    # otherwise the equality above would not distinguish the two sequencings
    g_grads_old = jax.grad(g_total)(pg, pd)
    g_updates_old, _ = txs["gtb"].update(dict(zeros, **g_grads_old),
                                         state.opt_state["gtb"], params_after_d)
    jacobi = optax.apply_updates(params_after_d, g_updates_old)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(expected["gen"]),
                             jax.tree.leaves(jacobi["gen"]))]
    assert max(diffs) > 0, "G grads insensitive to the D update — test is vacuous"


def test_val_step_and_selection_metric(setup):
    model, batch, state = setup
    F = batch["y_frame2phone"].shape[1]
    # val window is 200 frames; pad the toy batch to 210 frames
    batch = dict(batch)
    pad_f = 210 - F
    batch["y_frame2phone"] = jnp.pad(batch["y_frame2phone"], ((0, 0), (0, pad_f)), mode="edge")
    batch["y_frame_mask"] = jnp.pad(batch["y_frame_mask"], ((0, 0), (0, pad_f)))
    batch["y_pitch"] = jnp.pad(batch["y_pitch"], ((0, 0), (0, pad_f)))
    batch["y_audio"] = jnp.pad(batch["y_audio"], ((0, 0), (0, pad_f * 240)))
    m = val_step(model, state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss_mel"]))


def test_inference_path(setup):
    model, batch, state = setup
    Xi = {k: v for k, v in batch.items() if k.startswith("x_")}
    infer = jax.jit(lambda p, x: model.infer(p, x, max_frames=64))
    audio, aux = infer(state.params, Xi)
    assert audio.shape == (2, 64 * 240)
    assert np.abs(np.asarray(audio)).max() <= 1.0


def test_inference_fused_tail_matches_flax():
    """Cubegan.infer with hifigan.fused_tail=True (pallas C=32 tail resblocks,
    interpret mode on CPU) must match the flax generator path."""
    import dataclasses

    hifi = HifiganConfig(
        upsample_rates=(5, 3, 4, 4),
        upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=64,  # stage 0 runs at ch=32 -> fused
        resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    cfg = CubeganConfig(
        languasito=LanguasitoConfig(num_phones=30, num_speakers=3, max_pitch=400,
                                    max_duration=100),
        hifigan=hifi, mpd_channels=(8, 16), msd_width=8)
    model = Cubegan(cfg)
    batch = toy_batch()
    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    Xi = {k: v for k, v in batch.items() if k.startswith("x_")}

    model_fused = Cubegan(dataclasses.replace(cfg, hifigan=dataclasses.replace(
        hifi, fused_tail=True)), train=False)
    want, _ = jax.jit(lambda p, x: model.infer(p, x, max_frames=48))(state.params, Xi)
    from ttscube_tpu.models.hifigan_fused import force_pallas_interpret

    with force_pallas_interpret():  # off-TPU default is the plain-XLA fallback
        got, _ = jax.jit(lambda p, x: model_fused.infer(p, x, max_frames=48))(state.params, Xi)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fused_train_batch_gate_falls_back_with_warning():
    """fused_tail_train above fused_train_max_batch must warn and produce the exact
    flax-path forward (the custom-VJP program's remote compile grows with batch —
    VERDICT r3 item 3 auto-gate)."""
    import dataclasses
    import warnings

    base = tiny_model()
    gated_cfg = dataclasses.replace(
        base.config,
        hifigan=dataclasses.replace(TINY_HIFI, fused_tail_train=True,
                                    fused_train_max_batch=1))
    gated = Cubegan(gated_cfg)
    batch = toy_batch(B=2)
    state = create_train_state(base, jax.random.PRNGKey(0), batch)
    pg = {k: v for k, v in state.params.items() if k not in ("mpd", "msd")}
    rng = jax.random.PRNGKey(3)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        outs_gated, y_w = gated.gan_forward(pg, batch, rng, 50)
    assert any("fused_train_max_batch" in str(w.message) for w in rec)
    outs_plain, y_w2 = base.gan_forward(pg, batch, rng, 50)
    np.testing.assert_allclose(np.asarray(outs_gated[3]), np.asarray(outs_plain[3]),
                               atol=0)
    np.testing.assert_allclose(np.asarray(y_w), np.asarray(y_w2), atol=0)


def test_bf16_compute_train_step_matches_fp32_within_noise():
    """--compute-dtype bfloat16 training path (VERDICT r3 item 4): the GAN step runs
    with bf16 conv compute in generator AND discriminators, params/optimizer stay
    fp32, and the step's losses land within bf16 matmul noise of the fp32 step.
    (Parity tolerance is the bf16-noise methodology of CLAUDE.md pallas-VJP
    lesson 2, not exactness — the MXU computes fp32 convs at bf16 precision by
    default anyway, so on TPU these two configs differ even less.)"""
    import dataclasses

    base = tiny_model()
    cfg16 = dataclasses.replace(
        base.config,
        hifigan=dataclasses.replace(TINY_HIFI, compute_dtype="bfloat16"),
        disc_compute_dtype="bfloat16")
    m16 = Cubegan(cfg16)
    batch = toy_batch(B=2)
    state = create_train_state(base, jax.random.PRNGKey(0), batch)
    rng = jax.random.PRNGKey(5)
    s32, met32 = jax.jit(lambda s, b, r: train_step(base, s, b, r))(state, batch, rng)
    s16, met16 = jax.jit(lambda s, b, r: train_step(m16, s, b, r))(state, batch, rng)
    f32 = {k: float(v) for k, v in jax.device_get(met32).items()}
    f16 = {k: float(v) for k, v in jax.device_get(met16).items()}
    for k in f32:
        assert np.isfinite(f16[k]), k
        # loss scales range ~0.3..60 here; bf16 conv noise moves them by well under 5%
        assert abs(f16[k] - f32[k]) <= 0.05 * max(abs(f32[k]), 1.0), (k, f32[k], f16[k])
    # params remain fp32 after the bf16 step
    assert all(l.dtype == np.float32 for l in jax.tree.leaves(jax.device_get(s16.params))
               if hasattr(l, "dtype"))


def test_fused_tail_train_bf16_falls_back_with_warning():
    """fused_tail_train + compute_dtype=bfloat16 must NOT reach the fused custom-VJP
    (its backward mixes bf16 cotangents with fp32 operands in conv_general_dilated —
    r5 TPU window measurement); the gate falls back to the flax path with a warning
    and the forward matches the plain bf16 config exactly."""
    import dataclasses
    import warnings

    base = tiny_model()
    cfg_fused16 = dataclasses.replace(
        base.config,
        hifigan=dataclasses.replace(TINY_HIFI, fused_tail_train=True,
                                    fused_train_max_batch=16,
                                    compute_dtype="bfloat16"),
        disc_compute_dtype="bfloat16")
    cfg_plain16 = dataclasses.replace(
        base.config,
        hifigan=dataclasses.replace(TINY_HIFI, compute_dtype="bfloat16"),
        disc_compute_dtype="bfloat16")
    m_fused = Cubegan(cfg_fused16)
    m_plain = Cubegan(cfg_plain16)
    batch = toy_batch(B=2)
    state = create_train_state(base, jax.random.PRNGKey(0), batch)
    pg = {k: v for k, v in state.params.items() if k not in ("mpd", "msd")}
    rng = jax.random.PRNGKey(3)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        outs_fused, y_f = m_fused.gan_forward(pg, batch, rng, 50)
    assert any("not supported by the fused custom-VJP" in str(x.message) for x in w)
    outs_plain, y_p = m_plain.gan_forward(pg, batch, rng, 50)
    np.testing.assert_allclose(np.asarray(outs_fused[3]), np.asarray(outs_plain[3]),
                               atol=0)
