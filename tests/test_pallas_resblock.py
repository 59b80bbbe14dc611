"""Correctness tests for the fused-resblock pallas kernel (interpret mode on CPU) and
the fused generator forward vs the canonical flax Generator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

# every test here jit-compiles interpret-mode pallas programs (minutes of XLA:CPU
# compile each on a small box) — slow tier; the kernels they guard only change with
# ops/pallas_resblock.py / models/hifigan_fused.py edits (VERDICT r3 weak-2)
pytestmark = pytest.mark.slow

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


def test_fused_mrf_stage_matches_plain():
    """Whole-MRF kernel (3 resblocks, different k, averaged) vs the plain chain."""
    from ttscube_tpu.ops.pallas_resblock import fused_mrf1

    C, fold, T = 32, 4, 2000  # rows (500) not a tile multiple of 256 either
    ks = (3, 7, 11)
    dils = ((1, 3, 5),) * 3
    key = jax.random.PRNGKey(0)
    kernels, biases = [], []
    for j, k in enumerate(ks):
        ka, ba = _rand_block(jax.random.fold_in(key, j), C, k, dils[j])
        kernels += ka
        biases += ba
    x = jax.random.normal(jax.random.fold_in(key, 9), (2, T, C))

    acc = None
    i = 0
    for j, k in enumerate(ks):
        h = _plain_resblock1(x, kernels[i:i + 6], biases[i:i + 6], dils[j])
        acc = h if acc is None else acc + h
        i += 6
    want = acc / len(ks)
    got = fused_mrf1(x, kernels, biases, kernel_sizes=ks, dilations=dils,
                     fold=fold, rows_per_tile=256, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_tail_stage_matches_plain_ops():
    """Whole-tail kernel (leaky -> transpose-conv upsample -> MRF -> leaky ->
    conv_post -> tanh) vs the plain XLA op chain, incl. sequence boundaries."""
    import jax.nn
    from ttscube_tpu.ops.conv import _conv, _conv_transpose
    from ttscube_tpu.ops.pallas_resblock import fused_tail_stage

    C_in, C_out, fold, T_in = 64, 32, 4, 700  # rows not a tile multiple of 256
    ks = (3, 7)
    dils = ((1, 3), (1, 3, 5))
    key = jax.random.PRNGKey(5)
    up_kernel = 0.2 * jax.random.normal(key, (fold, C_out, C_in)) / np.sqrt(C_in)
    up_bias = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (C_out,))
    kernels, biases = [], []
    for j, k in enumerate(ks):
        ka, ba = _rand_block(jax.random.fold_in(key, 2 + j), C_out, k, dils[j])
        kernels += ka
        biases += ba
    post_kernel = 0.3 * jax.random.normal(jax.random.fold_in(key, 9), (7, C_out, 1))
    post_bias = jnp.asarray([0.05])
    z = jax.random.normal(jax.random.fold_in(key, 10), (2, T_in, C_in))

    x = _conv_transpose(jax.nn.leaky_relu(z, 0.1), up_kernel, fold, 0) + up_bias
    acc = None
    i = 0
    for j, k in enumerate(ks):
        h = _plain_resblock1(x, kernels[i:i + 2 * len(dils[j])],
                             biases[i:i + 2 * len(dils[j])], dils[j])
        acc = h if acc is None else acc + h
        i += 2 * len(dils[j])
    y = jax.nn.leaky_relu(acc / len(ks), 0.01)
    want_audio = np.asarray(jnp.tanh(_conv(y, post_kernel, 1, 3, 1, 1) + post_bias))[..., 0]

    got = fused_tail_stage(z, up_kernel, up_bias, kernels, biases,
                           kernel_sizes=ks, dilations=dils, fold=fold,
                           post_kernel=post_kernel, post_bias=post_bias,
                           with_post=True, rows_per_tile=256, interpret=True)
    assert got.shape == want_audio.shape
    np.testing.assert_allclose(np.asarray(got), want_audio, atol=3e-5)

    # without post: returns the stage activation
    want_x = np.asarray(acc / len(ks))
    got_x = fused_tail_stage(z, up_kernel, up_bias, kernels, biases,
                             kernel_sizes=ks, dilations=dils, fold=fold,
                             rows_per_tile=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got_x), want_x, atol=3e-5)


def test_fused_tail_stage_grad_matches_xla():
    """Custom-VJP tail: grads through the fused pallas backward (interpret mode) must
    match XLA autodiff of the plain op chain for EVERY input — z, upsample, all MRF
    kernels/biases, conv_post — across multiple tiles (halo cotangent overlap-add)."""
    import jax.nn
    from ttscube_tpu.ops.conv import _conv, _conv_transpose
    from ttscube_tpu.ops.pallas_resblock import fused_tail_stage_grad

    C_in, C_out, fold, T_in = 64, 32, 4, 300  # 3 tiles at 128 rows
    ks = (3, 7)
    dils = ((1, 3), (1, 3, 5))
    key = jax.random.PRNGKey(5)
    up_kernel = 0.2 * jax.random.normal(key, (fold, C_out, C_in)) / np.sqrt(C_in)
    up_bias = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (C_out,))
    kernels, biases = [], []
    for j, k in enumerate(ks):
        ka, ba = _rand_block(jax.random.fold_in(key, 2 + j), C_out, k, dils[j])
        kernels += ka
        biases += ba
    post_kernel = 0.3 * jax.random.normal(jax.random.fold_in(key, 9), (7, C_out, 1))
    post_bias = jnp.asarray([0.05])
    z = jax.random.normal(jax.random.fold_in(key, 10), (2, T_in, C_in))
    cot = jax.random.normal(jax.random.fold_in(key, 11), (2, T_in * fold))

    def ref_loss(z, up_kernel, up_bias, kernels, biases, post_kernel, post_bias):
        x = _conv_transpose(jax.nn.leaky_relu(z, 0.1), up_kernel, fold, 0) + up_bias
        acc = None
        i = 0
        for j, k in enumerate(ks):
            h = _plain_resblock1(x, kernels[i:i + 2 * len(dils[j])],
                                 biases[i:i + 2 * len(dils[j])], dils[j])
            acc = h if acc is None else acc + h
            i += 2 * len(dils[j])
        y = jax.nn.leaky_relu(acc / len(ks), 0.01)
        audio = jnp.tanh(_conv(y, post_kernel, 1, 3, 1, 1) + post_bias)[..., 0]
        return jnp.sum(audio * cot)

    def fused_loss(z, up_kernel, up_bias, kernels, biases, post_kernel, post_bias):
        audio = fused_tail_stage_grad(
            z, up_kernel, up_bias, kernels, biases, kernel_sizes=ks, dilations=dils,
            fold=fold, post_kernel=post_kernel, post_bias=post_bias, with_post=True,
            rows_per_tile=128, bwd_rows_per_tile=128, interpret=True)
        return jnp.sum(audio * cot)

    args = (z, up_kernel, up_bias, kernels, biases, post_kernel, post_bias)
    argnums = tuple(range(7))
    want = jax.grad(ref_loss, argnums)(*args)
    got = jax.grad(fused_loss, argnums)(*args)
    flat_w, _ = jax.tree_util.tree_flatten(want)
    flat_g, _ = jax.tree_util.tree_flatten(got)
    assert len(flat_w) == len(flat_g)
    for i, (a, b) in enumerate(zip(flat_g, flat_w)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=f"grad leaf {i}")


def test_fused_tail_stage_grad_no_post():
    """with_post=False branch of the custom VJP (stage activation output)."""
    from ttscube_tpu.ops.conv import _conv_transpose
    from ttscube_tpu.ops.pallas_resblock import fused_tail_stage_grad

    C_in, C_out, fold, T_in = 32, 32, 4, 200
    ks = (3,)
    dils = ((1, 2),)
    key = jax.random.PRNGKey(7)
    up_kernel = 0.2 * jax.random.normal(key, (fold, C_out, C_in)) / np.sqrt(C_in)
    up_bias = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (C_out,))
    kernels, biases = _rand_block(jax.random.fold_in(key, 2), C_out, 3, dils[0])
    z = jax.random.normal(jax.random.fold_in(key, 3), (1, T_in, C_in))
    cot = jax.random.normal(jax.random.fold_in(key, 4), (1, T_in * fold, C_out))

    def ref_loss(z, up_kernel, up_bias, kernels, biases):
        import jax.nn
        x = _conv_transpose(jax.nn.leaky_relu(z, 0.1), up_kernel, fold, 0) + up_bias
        h = _plain_resblock1(x, kernels, biases, dils[0])
        return jnp.sum(h * cot)

    def fused_loss(z, up_kernel, up_bias, kernels, biases):
        out = fused_tail_stage_grad(
            z, up_kernel, up_bias, kernels, biases, kernel_sizes=ks, dilations=dils,
            fold=fold, rows_per_tile=128, bwd_rows_per_tile=64, interpret=True)
        return jnp.sum(out * cot)

    args = (z, up_kernel, up_bias, kernels, biases)
    want = jax.grad(ref_loss, tuple(range(5)))(*args)
    got = jax.grad(fused_loss, tuple(range(5)))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(got), jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


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


def test_fused_generator_full_config_tail_branch():
    """Real HiFi-GAN v1 geometry (initial 512 -> last stage ch=32, k=u=fold=4):
    exercises the whole-tail kernel (upsample+MRF+conv_post+tanh) branch."""
    cfg = HifiganConfig(resblock_kernel_sizes=(3, 11),
                        resblock_dilation_sizes=((1, 3), (1, 3, 5)))
    g = Generator(cfg)
    mel = jax.random.normal(jax.random.PRNGKey(2), (1, 6, 80))
    variables = g.init(jax.random.PRNGKey(0), mel)
    # nonzero biases to exercise boundary masking
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.03 if "bias" in jax.tree_util.keystr(p) else x,
        variables["params"])
    want = np.asarray(g.apply({"params": params}, mel))
    got = np.asarray(generator_apply_fused(params, mel, cfg,
                                           rows_per_tile=256, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_fused_train_generator_grad_matches_flax():
    """generator_apply_fused_train (the GAN-training path, HifiganConfig.fused_tail_train)
    must match Generator.apply in value AND in gradients w.r.t. the full canonical
    param tree — weight-norm v/g included — on the real v1 tail geometry."""
    from ttscube_tpu.models.hifigan_fused import generator_apply_fused_train

    cfg = HifiganConfig(resblock_kernel_sizes=(3, 11),
                        resblock_dilation_sizes=((1, 3), (1, 3, 5)))
    g = Generator(cfg)
    mel = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 80))
    variables = g.init(jax.random.PRNGKey(0), mel)
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.03 if "bias" in jax.tree_util.keystr(p) else x,
        variables["params"])
    cot = jax.random.normal(jax.random.PRNGKey(3), (2, 6 * cfg.total_upsample))

    def loss_flax(p, mel):
        return jnp.sum(g.apply({"params": p}, mel) * cot)

    def loss_fused(p, mel):
        out = generator_apply_fused_train(p, mel, cfg, rows_per_tile=256,
                                          bwd_rows_per_tile=256, interpret=True)
        return jnp.sum(out * cot)

    (want_l, want_g) = jax.value_and_grad(loss_flax, argnums=(0, 1))(params, mel)
    (got_l, got_g) = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, mel)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    flat_w = jax.tree_util.tree_flatten_with_path(want_g)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(got_g)[0]
    assert len(flat_w) == len(flat_t)
    for (pw, a), (_, b) in zip(flat_w, flat_t):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4,
            err_msg=jax.tree_util.keystr(pw))


def test_chunked_generator_with_fused_path():
    """generate_chunked (the B=256 / long-form serving path) composed with the fused
    generator must match full-utterance flax output — windows are real-signal slices,
    so the fused kernels' boundary masking must line up with the window edges."""
    from ttscube_tpu.models.hifigan import generate_chunked

    cfg = HifiganConfig(resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3),))
    g = Generator(cfg)
    mel = jax.random.normal(jax.random.PRNGKey(4), (2, 40, 80))
    variables = g.init(jax.random.PRNGKey(0), mel)
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.03 if "bias" in jax.tree_util.keystr(p) else x,
        variables["params"])
    want = np.asarray(g.apply({"params": params}, mel))

    fused_fn = lambda c: generator_apply_fused(params, c, cfg, rows_per_tile=256,
                                               interpret=True)
    got = np.asarray(generate_chunked(fused_fn, mel, cfg.total_upsample,
                                      chunk=12, halo=28))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5)


def test_fused_mrf_full_lane_strided_taps():
    """fold==1 full-lane path (C % 128 == 0): original kernels with dilation as
    strided tap slices (zero FLOP inflation) must match the plain dilated chain."""
    from ttscube_tpu.ops.pallas_resblock import fused_mrf1

    C, T = 128, 600  # rows (600) not a tile multiple of 256
    ks = (3, 11)
    dils = ((1, 3, 5), (1, 3, 5))
    key = jax.random.PRNGKey(3)
    kernels, biases = [], []
    for j, k in enumerate(ks):
        ka, ba = _rand_block(jax.random.fold_in(key, j), C, k, dils[j])
        kernels += ka
        biases += ba
    x = jax.random.normal(jax.random.fold_in(key, 9), (2, T, C))

    acc = None
    i = 0
    for j, k in enumerate(ks):
        h = _plain_resblock1(x, kernels[i:i + 6], biases[i:i + 6], dils[j])
        acc = h if acc is None else acc + h
        i += 6
    want = acc / len(ks)
    got = fused_mrf1(x, kernels, biases, kernel_sizes=ks, dilations=dils,
                     fold=1, rows_per_tile=256, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_fused_tail_stage_fc256_mid_stage():
    """FC == 256 (C_out=64, fold=4): the whole-stage kernel at multiple lane groups,
    without conv_post (a mid-generator stage)."""
    from ttscube_tpu.ops.conv import _conv_transpose
    from ttscube_tpu.ops.pallas_resblock import fused_tail_stage

    C_in, C_out, fold, T_in = 128, 64, 4, 500
    ks = (3, 11)
    dils = ((1, 3), (1, 3, 5))
    key = jax.random.PRNGKey(6)
    up_kernel = 0.2 * jax.random.normal(key, (fold, C_out, C_in)) / np.sqrt(C_in)
    up_bias = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (C_out,))
    kernels, biases = [], []
    for j, k in enumerate(ks):
        ka, ba = _rand_block(jax.random.fold_in(key, 2 + j), C_out, k, dils[j])
        kernels += ka
        biases += ba
    z = jax.random.normal(jax.random.fold_in(key, 10), (2, T_in, C_in))

    x = _conv_transpose(jax.nn.leaky_relu(z, 0.1), up_kernel, fold, 0) + up_bias
    acc = None
    i = 0
    for j, k in enumerate(ks):
        h = _plain_resblock1(x, kernels[i:i + 2 * len(dils[j])],
                             biases[i:i + 2 * len(dils[j])], dils[j])
        acc = h if acc is None else acc + h
        i += 2 * len(dils[j])
    want = np.asarray(acc / len(ks))

    got = fused_tail_stage(z, up_kernel, up_bias, kernels, biases,
                           kernel_sizes=ks, dilations=dils, fold=fold,
                           rows_per_tile=256, interpret=True)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_fused_generator_wide_fuse_channels():
    """Full v1 geometry with EVERY stage fused (fuse_channels=(32,64,128,256)):
    whole-stage kernels at ch=64 (FC=256, last=False) and ch=32 (final), full-lane
    strided-tap MRF kernels at ch=128/256 — must still equal Generator.apply."""
    cfg = HifiganConfig(resblock_kernel_sizes=(3, 11),
                        resblock_dilation_sizes=((1, 3), (1, 3, 5)))
    g = Generator(cfg)
    mel = jax.random.normal(jax.random.PRNGKey(8), (1, 6, 80))
    variables = g.init(jax.random.PRNGKey(0), mel)
    params = jax.tree_util.tree_map_with_path(
        lambda p, x: x + 0.03 if "bias" in jax.tree_util.keystr(p) else x,
        variables["params"])
    want = np.asarray(g.apply({"params": params}, mel))
    got = np.asarray(generator_apply_fused(params, mel, cfg, rows_per_tile=256,
                                           interpret=True,
                                           fuse_channels=(32, 64, 128, 256)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5)
