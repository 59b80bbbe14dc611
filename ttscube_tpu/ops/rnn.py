"""Scan-based LSTM/GRU for TPU.

Replaces the reference's cuDNN `nn.LSTM`/`nn.GRU` (used throughout
``cube/networks/modules.py``, e.g. :636-668, :873-905, :427-430).

TPU design: the input projection ``x @ W_ih`` for the whole sequence is hoisted out of the
recurrence into one large MXU matmul; the `lax.scan` body only computes the ``h @ W_hh``
recurrence (a (B,H)×(H,4H) matmul per step). Gate order matches torch (LSTM: i,f,g,o;
GRU: r,z,n) so parity tests can import torch weights directly.

Like the reference, full-sequence layers run over the *padded* batch without masking
(torch ``nn.LSTM`` on padded batches does the same); losses mask elsewhere.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)

    return init


# lax.scan unroll for the recurrences: the per-step matmul is tiny (sub-μs of MXU),
# so loop overhead dominates — measured on v5e at B=128 (languasito.infer, F=512):
# unroll 1/2/4/8/16 = 31.0/20.2/17.2/16.0/15.5 ms. 8 takes ~all of the win without
# 16's compile-size cost. Exact: unrolling duplicates the step body, no math change.
SCAN_UNROLL = 8

# Training traces override to 1: autodiff transposes every scan, so an 8x-unrolled
# body through the GAN step's ~20 recurrences blows the remote compile up from
# minutes to >25 min (observed on the axon relay, round-3 quality drive) for a
# recurrence that is <1% of the step's FLOPs. The override is read at TRACE time —
# setting it inside a jitted function body (train_step does this) bakes unroll=1
# into that executable only; inference traces keep SCAN_UNROLL. ContextVar (not a
# plain global): a trace on another thread (async compile, background serving warmup)
# must not observe a training trace's override, or vice versa.
_UNROLL_OVERRIDE: contextvars.ContextVar[int | None] = contextvars.ContextVar(
    "ttscube_unroll_override", default=None)


@contextlib.contextmanager
def unroll_override(n: int | None):
    """Trace-time scan-unroll override (use `with unroll_override(1):` around the
    body of a training step to keep its compile small)."""
    token = _UNROLL_OVERRIDE.set(n)
    try:
        yield
    finally:
        _UNROLL_OVERRIDE.reset(token)


def _unroll() -> int:
    n = _UNROLL_OVERRIDE.get()
    return SCAN_UNROLL if n is None else n


def _lstm_scan(xw: jnp.ndarray, wh: jnp.ndarray, h0: jnp.ndarray, c0: jnp.ndarray,
               reverse: bool = False):
    """xw: (B,T,4H) precomputed input projection (+bias). Returns (B,T,H), (h,c)."""
    H = wh.shape[0]

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.matmul(h, wh, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H : 2 * H])
        g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H :])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    xs = jnp.swapaxes(xw, 0, 1)  # (T,B,4H)
    (h, c), ys = jax.lax.scan(step, (h0, c0), xs, reverse=reverse,
                              unroll=_unroll())
    return jnp.swapaxes(ys, 0, 1), (h, c)


def _gru_scan(xw: jnp.ndarray, wh: jnp.ndarray, bh: jnp.ndarray, h0: jnp.ndarray,
              reverse: bool = False):
    """xw: (B,T,3H) = x@W_ih + b_ih. torch GRU semantics: r,z,n with reset on (h@W_hn + b_hn)."""
    H = wh.shape[0]

    def step(h, xt):
        hproj = jnp.matmul(h, wh, preferred_element_type=jnp.float32) + bh
        r = jax.nn.sigmoid(xt[..., :H] + hproj[..., :H])
        z = jax.nn.sigmoid(xt[..., H : 2 * H] + hproj[..., H : 2 * H])
        n = jnp.tanh(xt[..., 2 * H :] + r * hproj[..., 2 * H :])
        h = (1.0 - z) * n + z * h
        return h, h

    xs = jnp.swapaxes(xw, 0, 1)
    h, ys = jax.lax.scan(step, h0, xs, reverse=reverse, unroll=_unroll())
    return jnp.swapaxes(ys, 0, 1), h


class LSTM(nn.Module):
    """Multi-layer, optionally bidirectional LSTM over (B, T, D) → (B, T, H·dirs).

    Pure lax.scan recurrence with the input projection hoisted onto the MXU. A pallas
    recurrence kernel (ops/pallas_rnn.py, rounds 1-2) only ever *tied* this path on TPU
    (~0.3 μs/step both ways) and was retired in round 3 — a flag-gated duplicate
    inference path with zero measured win is maintenance debt (VERDICT r2 item 7).
    """

    features: int
    num_layers: int = 1
    bidirectional: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, initial_state=None):
        H = self.features
        scale = 1.0 / np.sqrt(H)
        dirs = 2 if self.bidirectional else 1
        B = x.shape[0]
        finals = []
        for layer in range(self.num_layers):
            outs = []
            for d in range(dirs):
                sfx = f"_l{layer}" + ("_rev" if d else "")
                wi = self.param(f"wi{sfx}", _uniform_init(scale), (x.shape[-1], 4 * H))
                wh = self.param(f"wh{sfx}", _uniform_init(scale), (H, 4 * H))
                b = self.param(f"b{sfx}", _uniform_init(scale), (4 * H,))
                xw = jnp.matmul(x, wi, preferred_element_type=jnp.float32) + b
                if initial_state is not None:
                    h0, c0 = initial_state[layer][d]
                else:
                    h0 = jnp.zeros((B, H), self.dtype)
                    c0 = jnp.zeros((B, H), self.dtype)
                ys, hc = _lstm_scan(xw, wh, h0, c0, reverse=bool(d))
                outs.append(ys)
                finals.append(hc)
            x = jnp.concatenate(outs, axis=-1) if dirs == 2 else outs[0]
        return x, finals


class GRU(nn.Module):
    """Multi-layer unidirectional GRU over (B, T, D) → (B, T, H)."""

    features: int
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, initial_state=None):
        H = self.features
        scale = 1.0 / np.sqrt(H)
        B = x.shape[0]
        finals = []
        for layer in range(self.num_layers):
            wi = self.param(f"wi_l{layer}", _uniform_init(scale), (x.shape[-1], 3 * H))
            wh = self.param(f"wh_l{layer}", _uniform_init(scale), (H, 3 * H))
            bi = self.param(f"bi_l{layer}", _uniform_init(scale), (3 * H,))
            bh = self.param(f"bh_l{layer}", _uniform_init(scale), (3 * H,))
            xw = jnp.matmul(x, wi, preferred_element_type=jnp.float32) + bi
            h0 = initial_state[layer] if initial_state is not None else jnp.zeros((B, H), self.dtype)
            ys, h = _gru_scan(xw, wh, bh, h0)
            finals.append(h)
            x = ys
        return x, finals


class LSTMCell(nn.Module):
    """Single-step LSTM cell for AR decoders (used inside model-level scans)."""

    features: int

    @nn.compact
    def __call__(self, carry, x):
        H = self.features
        scale = 1.0 / np.sqrt(H)
        wi = self.param("wi", _uniform_init(scale), (x.shape[-1], 4 * H))
        wh = self.param("wh", _uniform_init(scale), (H, 4 * H))
        b = self.param("b", _uniform_init(scale), (4 * H,))
        h, c = carry
        gates = jnp.matmul(x, wi, preferred_element_type=jnp.float32) + b + \
            jnp.matmul(h, wh, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H : 2 * H])
        g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H :])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    @staticmethod
    def initial_state(batch: int, features: int, dtype=jnp.float32):
        return (jnp.zeros((batch, features), dtype), jnp.zeros((batch, features), dtype))


class GRUCell(nn.Module):
    """Single-step GRU cell (torch semantics) for the WaveRNN sample loop."""

    features: int

    @nn.compact
    def __call__(self, h, x):
        H = self.features
        scale = 1.0 / np.sqrt(H)
        wi = self.param("wi", _uniform_init(scale), (x.shape[-1], 3 * H))
        wh = self.param("wh", _uniform_init(scale), (H, 3 * H))
        bi = self.param("bi", _uniform_init(scale), (3 * H,))
        bh = self.param("bh", _uniform_init(scale), (3 * H,))
        xt = jnp.matmul(x, wi, preferred_element_type=jnp.float32) + bi
        hproj = jnp.matmul(h, wh, preferred_element_type=jnp.float32) + bh
        r = jax.nn.sigmoid(xt[..., :H] + hproj[..., :H])
        z = jax.nn.sigmoid(xt[..., H : 2 * H] + hproj[..., H : 2 * H])
        n = jnp.tanh(xt[..., 2 * H :] + r * hproj[..., 2 * H :])
        return (1.0 - z) * n + z * h


# -- torch weight import (for golden parity tests) ------------------------------------


def lstm_params_from_torch(state_dict, num_layers: int, bidirectional: bool):
    """Map torch nn.LSTM state_dict → this module's param dict."""
    params = {}
    dirs = ("", "_reverse") if bidirectional else ("",)
    ours = ("", "_rev")
    for layer in range(num_layers):
        for d, (tsfx, osfx) in enumerate(zip(dirs, ours[: len(dirs)])):
            wi = state_dict[f"weight_ih_l{layer}{tsfx}"].numpy().T
            wh = state_dict[f"weight_hh_l{layer}{tsfx}"].numpy().T
            b = (state_dict[f"bias_ih_l{layer}{tsfx}"] + state_dict[f"bias_hh_l{layer}{tsfx}"]).numpy()
            params[f"wi_l{layer}{osfx}"] = jnp.asarray(wi)
            params[f"wh_l{layer}{osfx}"] = jnp.asarray(wh)
            params[f"b_l{layer}{osfx}"] = jnp.asarray(b)
    return params


def gru_params_from_torch(state_dict, num_layers: int):
    params = {}
    for layer in range(num_layers):
        params[f"wi_l{layer}"] = jnp.asarray(state_dict[f"weight_ih_l{layer}"].numpy().T)
        params[f"wh_l{layer}"] = jnp.asarray(state_dict[f"weight_hh_l{layer}"].numpy().T)
        params[f"bi_l{layer}"] = jnp.asarray(state_dict[f"bias_ih_l{layer}"].numpy())
        params[f"bh_l{layer}"] = jnp.asarray(state_dict[f"bias_hh_l{layer}"].numpy())
    return params
