"""Channel-folding conv transform: exactness vs the plain conv (ops/conv.fold_conv_kernel)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttscube_tpu.models.hifigan import Generator, HifiganConfig
from ttscube_tpu.ops.conv import fold_conv_kernel


@pytest.mark.parametrize("k,F,C", [(3, 4, 8), (7, 4, 8), (11, 4, 8), (11, 2, 16)])
def test_folded_conv_matches_plain(k, F, C):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32) * 0.1)
    p = (k - 1) // 2
    want = jax.lax.conv_general_dilated(x, w, (1,), [(p, p)],
                                        dimension_numbers=("NWC", "WIO", "NWC"))
    wp, (pl_, pr) = fold_conv_kernel(w, F)
    xf = x.reshape(2, 64 // F, F * C)
    got = jax.lax.conv_general_dilated(xf, wp, (1,), [(pl_, pr)],
                                       dimension_numbers=("NWC", "WIO", "NWC"))
    got = got.reshape(2, 64, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_generator_fold_narrow_is_exact():
    """fold_narrow=True must produce the same audio as fold_narrow=False."""
    cfg_off = HifiganConfig(upsample_initial_channel=128, fold_narrow=False)
    cfg_on = HifiganConfig(upsample_initial_channel=128, fold_narrow=True)
    g_off, g_on = Generator(cfg_off), Generator(cfg_on)
    params = g_off.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 80))
    a_off = g_off.apply(params, mel)
    a_on = g_on.apply(params, mel)
    np.testing.assert_allclose(np.asarray(a_on), np.asarray(a_off), atol=1e-5)


@pytest.mark.parametrize("d,k,F,C", [(3, 3, 4, 8), (5, 11, 4, 8), (3, 7, 1, 8),
                                     (5, 3, 2, 16)])
def test_polyphase_dilated_conv_matches_plain(d, k, F, C):
    from ttscube_tpu.ops.conv import polyphase_dilated_conv

    rng = np.random.default_rng(1)
    T = 120  # divisible by 3, 5 and by d*F for every case above
    x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32) * 0.1)
    p = d * (k - 1) // 2
    want = jax.lax.conv_general_dilated(x, w, (1,), [(p, p)], rhs_dilation=(d,),
                                        dimension_numbers=("NWC", "WIO", "NWC"))
    got = polyphase_dilated_conv(x, w, dilation=d, fold=F)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_generator_polyphase_is_exact():
    """polyphase_channels must produce the same audio as the plain dilated convs."""
    cfg_off = HifiganConfig(upsample_initial_channel=128)
    cfg_on = HifiganConfig(upsample_initial_channel=128,
                           polyphase_channels=(16, 32, 64))
    g_off, g_on = Generator(cfg_off), Generator(cfg_on)
    params = g_off.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 80))
    a_off = g_off.apply(params, mel)
    a_on = g_on.apply(params, mel)
    np.testing.assert_allclose(np.asarray(a_on), np.asarray(a_off), atol=1e-5)


def test_generator_apply_fused_polyphase_is_exact():
    """The functional serving generator with polyphase_channels must match its own
    plain path (mel frames chosen so every stage length divides 3 and 5)."""
    from ttscube_tpu.models.hifigan_fused import generator_apply_fused

    cfg = HifiganConfig(upsample_initial_channel=128)
    g = Generator(cfg)
    params = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 80)))["params"]
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 12, 80))
    want = generator_apply_fused(params, mel, cfg)
    got = generator_apply_fused(params, mel, cfg, polyphase_channels=(16, 32, 64))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
