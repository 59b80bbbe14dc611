"""Parity tests for ops: scan-RNNs and convs vs torch goldens; length regulator vs the
reference's loop semantics (SURVEY.md §4, layers 2/4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ttscube_tpu.ops.rnn import (
    GRU,
    LSTM,
    gru_params_from_torch,
    lstm_params_from_torch,
)
from ttscube_tpu.ops.conv import (
    Conv1d,
    ConvTranspose1d,
    conv1d_kernel_from_torch,
    conv_transpose1d_kernel_from_torch,
)
from ttscube_tpu.ops.length_regulator import durations_to_frame2phone, regulate_length

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("bidirectional,num_layers", [(False, 1), (True, 1), (True, 2)])
def test_lstm_matches_torch(bidirectional, num_layers):
    torch.manual_seed(0)
    B, T, D, H = 2, 17, 12, 24
    ref = torch.nn.LSTM(D, H, num_layers=num_layers, bidirectional=bidirectional,
                        batch_first=True)
    x = torch.randn(B, T, D)
    with torch.no_grad():
        want, _ = ref(x)

    model = LSTM(features=H, num_layers=num_layers, bidirectional=bidirectional)
    params = lstm_params_from_torch(ref.state_dict(), num_layers, bidirectional)
    got, _ = model.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_gru_matches_torch():
    torch.manual_seed(1)
    B, T, D, H = 3, 11, 8, 16
    ref = torch.nn.GRU(D, H, num_layers=2, batch_first=True)
    x = torch.randn(B, T, D)
    with torch.no_grad():
        want, _ = ref(x)
    model = GRU(features=H, num_layers=2)
    params = gru_params_from_torch(ref.state_dict(), 2)
    got, _ = model.apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


@pytest.mark.parametrize("k,s,p,d", [(3, 1, 1, 1), (5, 1, 2, 1), (7, 2, 3, 1), (3, 1, 3, 3)])
def test_conv1d_matches_torch(k, s, p, d):
    torch.manual_seed(2)
    B, T, Cin, Cout = 2, 20, 6, 10
    ref = torch.nn.Conv1d(Cin, Cout, k, stride=s, padding=p, dilation=d)
    x = torch.randn(B, Cin, T)
    with torch.no_grad():
        want = ref(x).permute(0, 2, 1).numpy()
    model = Conv1d(features=Cout, kernel_size=k, stride=s, padding=p, dilation=d)
    params = {"kernel": conv1d_kernel_from_torch(ref.weight.detach()),
              "bias": jnp.asarray(ref.bias.detach().numpy())}
    got = model.apply({"params": params}, jnp.asarray(x.permute(0, 2, 1).numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


@pytest.mark.parametrize("k,s,p", [(16, 5, 5), (16, 8, 4), (4, 4, 0), (4, 2, 1)])
def test_conv_transpose1d_matches_torch(k, s, p):
    torch.manual_seed(3)
    B, T, Cin, Cout = 2, 9, 4, 6
    ref = torch.nn.ConvTranspose1d(Cin, Cout, k, stride=s, padding=p)
    x = torch.randn(B, Cin, T)
    with torch.no_grad():
        want = ref(x).permute(0, 2, 1).numpy()
    model = ConvTranspose1d(features=Cout, kernel_size=k, stride=s, padding=p)
    params = {"kernel": conv_transpose1d_kernel_from_torch(ref.weight.detach()),
              "bias": jnp.asarray(ref.bias.detach().numpy())}
    got = model.apply({"params": params}, jnp.asarray(x.permute(0, 2, 1).numpy()))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_length_regulator_matches_reference_loop():
    """Reference semantics (modules.py:946-953, 1043-1053): repeat phone i duration[i]
    times; pad frames repeat the last aligned phone."""
    durations = np.array([[2, 0, 3, 1, 0], [1, 1, 0, 0, 0]])  # (B=2, N=5)
    n_valid = np.array([4, 2])
    max_frames = 8

    f2p, mask = durations_to_frame2phone(jnp.asarray(durations), jnp.asarray(n_valid), max_frames)
    f2p, mask = np.asarray(f2p), np.asarray(mask)

    for b in range(2):
        ref_f2p = []
        for phone, dur in enumerate(durations[b]):
            ref_f2p.extend([phone] * dur)
        total = len(ref_f2p)
        ref_f2p += [ref_f2p[-1]] * (max_frames - total)  # pad with last aligned phone
        np.testing.assert_array_equal(f2p[b], ref_f2p)
        np.testing.assert_array_equal(mask[b], [i < total for i in range(max_frames)])

    x = np.arange(2 * 5 * 3, dtype=np.float32).reshape(2, 5, 3)
    out = np.asarray(regulate_length(jnp.asarray(x), jnp.asarray(f2p)))
    assert out.shape == (2, 8, 3)
    np.testing.assert_array_equal(out[0, 0], x[0, 0])
    np.testing.assert_array_equal(out[0, 2], x[0, 2])  # phone 1 has dur 0 → skipped


def test_length_regulator_is_jittable_static_shape():
    f = jax.jit(lambda d, n: durations_to_frame2phone(d, n, 16))
    f2p, mask = f(jnp.array([[4, 4, 4]]), jnp.array([3]))
    assert f2p.shape == (1, 16) and int(mask.sum()) == 12
