"""HiFi-GAN shape/compile/loss tests (SURVEY.md §4, layer 2: model-shape + jit tests)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttscube_tpu.models.hifigan import (
    Generator,
    HifiganConfig,
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_loss,
    generator_loss,
)


@pytest.fixture(scope="module")
def gen_and_params():
    g = Generator(HifiganConfig())
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 10, 80)))
    return g, params


def test_generator_upsamples_240x(gen_and_params):
    g, params = gen_and_params
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 50, 80))
    audio = g.apply(params, mel)
    assert audio.shape == (2, 50 * 240)
    assert np.abs(np.asarray(audio)).max() <= 1.0  # tanh output


def test_generator_jit_compiles(gen_and_params):
    g, params = gen_and_params
    f = jax.jit(g.apply)
    out = f(params, jnp.zeros((1, 20, 80)))
    assert out.shape == (1, 4800)


def test_generator_param_count_matches_hifigan_v1(gen_and_params):
    # HiFi-GAN v1 generator is ~13.9M params (published); config here uses k=[16,16,4,4]
    _, params = gen_and_params
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 13_000_000 < n < 15_000_000, n


def test_mpd_shapes():
    mpd = MultiPeriodDiscriminator()
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 12000))
    params = mpd.init(jax.random.PRNGKey(0), y, y)
    rs, gs, fr, fg = mpd.apply(params, y, y * 0.5)
    assert len(rs) == len(gs) == 5
    assert len(fr[0]) == 6  # 5 convs + post
    # identical inputs → identical outputs per branch
    rs2, gs2, _, _ = mpd.apply(params, y, y)
    np.testing.assert_allclose(np.asarray(rs2[0]), np.asarray(gs2[0]), atol=1e-6)


def test_msd_shapes_and_spectral_update():
    msd = MultiScaleDiscriminator()
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 12000))
    variables = msd.init(jax.random.PRNGKey(0), y, y)
    assert "spectral" in variables
    (rs, gs, fr, fg), new_state = msd.apply(
        variables, y, y * 0.3, update_stats=True, mutable=["spectral"]
    )
    assert len(rs) == 3 and len(fr[0]) == 8
    # power-iteration vector must move
    u0 = jax.tree.leaves(variables["spectral"])[0]
    u1 = jax.tree.leaves(new_state["spectral"])[0]
    assert not np.allclose(np.asarray(u0), np.asarray(u1))


def test_gan_losses_semantics():
    # perfect discriminator on real (1) and fake (0) → zero d-loss
    real = [jnp.ones((2, 10))]
    fake = [jnp.zeros((2, 10))]
    assert float(discriminator_loss(real, fake)) == 0.0
    assert float(generator_loss([jnp.ones((2, 10))])) == 0.0
    assert float(generator_loss([jnp.zeros((2, 10))])) == 1.0
    fa = [[jnp.ones((2, 4))], [jnp.zeros((2, 4))]]
    fb = [[jnp.zeros((2, 4))], [jnp.zeros((2, 4))]]
    assert float(feature_loss(fa, fb)) == 2.0  # 2 * (1 + 0)


def test_generator_grads_flow(gen_and_params):
    g, params = gen_and_params
    mel = jax.random.normal(jax.random.PRNGKey(4), (1, 12, 80))

    def loss(p):
        return jnp.mean(g.apply(p, mel) ** 2)

    grads = jax.grad(loss)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    assert any(float(jnp.abs(x).max()) > 0 for x in flat)


def test_chunked_generator_matches_full():
    """generate_chunked must reproduce the full-utterance generator exactly (window
    halo ≥ receptive field; zero halos coincide with the conv stack's own zero
    padding at the true boundaries) — the memory-bounded long-form path."""
    from ttscube_tpu.models.hifigan import generate_chunked

    cfg = HifiganConfig(upsample_initial_channel=32, resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3),))
    g = Generator(cfg)
    cond = jax.random.normal(jax.random.PRNGKey(3), (2, 60, 80))
    params = g.init(jax.random.PRNGKey(0), cond)
    # nonzero biases: flax inits them to zero, which would mask boundary-semantics
    # bugs (conv(0)+bias ≠ 0 leaking through chained windows)
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.05 * np.sin(np.arange(x.size)).reshape(x.shape).astype(x.dtype)
        if "bias" in jax.tree_util.keystr(p) else x, params)
    full = np.asarray(g.apply(params, cond))

    apply_fn = lambda c: g.apply(params, c)
    chunked = np.asarray(jax.jit(
        lambda c: generate_chunked(apply_fn, c, cfg.total_upsample,
                                   chunk=24, halo=16))(cond))
    assert chunked.shape == full.shape
    np.testing.assert_allclose(chunked, full, atol=2e-6)

    # short inputs bypass chunking entirely
    short = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 80))
    out = generate_chunked(apply_fn, short, cfg.total_upsample, chunk=24, halo=16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(g.apply(params, short)),
                               atol=1e-6)


def test_bf16_storage_serving_close_to_fp32():
    """The serving default keeps inter-conv activations bf16-resident
    (HifiganConfig.storage_dtype, api.py default). Guard the quality cost: vs the
    fp32 flax Generator the bf16-storage output must stay within a small fraction
    of the signal's RMS (SNR >= ~30 dB on a random-init model — rounding noise,
    not a path divergence). Runs the plain-XLA fallback (fuse_channels=() off-TPU),
    which is exactly what serving uses above fuse_max_batch."""
    from ttscube_tpu.models.hifigan_fused import generator_apply_fused

    cfg = HifiganConfig(upsample_initial_channel=64)
    g = Generator(cfg)
    cond = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (2, 40, 80))
    params = g.init(jax.random.PRNGKey(1), cond)["params"]
    ref = np.asarray(g.apply({"params": params}, cond)).astype(np.float64)
    out = np.asarray(jax.jit(lambda c: generator_apply_fused(
        params, c, cfg, storage_dtype=jnp.bfloat16))(cond)).astype(np.float64)
    assert out.shape == ref.shape
    err = np.sqrt(np.mean((out - ref) ** 2))
    rms = np.sqrt(np.mean(ref ** 2))
    snr_db = 20 * np.log10(rms / max(err, 1e-12))
    assert snr_db >= 30.0, f"bf16-storage SNR {snr_db:.1f} dB < 30 dB"
