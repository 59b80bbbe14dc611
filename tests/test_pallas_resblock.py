"""Correctness tests for the fused-resblock pallas kernel (interpret mode on CPU) and
the fused generator forward vs the canonical flax Generator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttscube_tpu.models.hifigan import Generator, HifiganConfig
from ttscube_tpu.models.hifigan_fused import _plain_resblock1, generator_apply_fused
from ttscube_tpu.ops.pallas_resblock import fused_resblock1


def _rand_block(key, C, k, dilations):
    ks = jax.random.split(key, 4 * len(dilations))
    kernels, biases = [], []
    for i in range(2 * len(dilations)):
        kernels.append(0.3 * jax.random.normal(ks[2 * i], (k, C, C)) / np.sqrt(k * C))
        biases.append(0.1 * jax.random.normal(ks[2 * i + 1], (C,)))
    return kernels, biases


@pytest.mark.parametrize("C,fold,k,dils,T", [
    (32, 4, 11, (1, 3, 5), 2048),   # the hot tail shape (v1 kernels, multi-tap folds)
    (32, 4, 3, (1, 3, 5), 8192),    # multiple tiles
    (64, 2, 7, (1, 3, 5), 1920),    # stage-3 shape, non-pow2 T
    (128, 1, 11, (1, 3), 1024),     # unfolded path (C == lanes)
    (32, 4, 11, (1, 3, 5), 7696),   # rows not a tile multiple (row padding + mask)
])
def test_fused_resblock_matches_plain(C, fold, k, dils, T):
    key = jax.random.PRNGKey(C + k)
    kernels, biases = _rand_block(key, C, k, dils)
    x = jax.random.normal(jax.random.fold_in(key, 9), (2, T, C))

    want = _plain_resblock1(x, kernels, biases, dils)
    got = fused_resblock1(x, kernels, biases, kernel_size=k, dilations=dils,
                          fold=fold, rows_per_tile=256, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_generator_matches_flax_generator():
    """End-to-end: generator_apply_fused on the canonical param tree must equal
    Generator.apply (stages fuse where C·fold == 128, fall back elsewhere)."""
    cfg = HifiganConfig(upsample_initial_channel=256,
                        resblock_kernel_sizes=(3, 7),
                        resblock_dilation_sizes=((1, 3), (1, 3)))
    g = Generator(cfg)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 80))
    variables = g.init(jax.random.PRNGKey(0), mel)
    want = np.asarray(g.apply(variables, mel))
    got = np.asarray(generator_apply_fused(variables["params"], mel, cfg,
                                           rows_per_tile=256, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5)
