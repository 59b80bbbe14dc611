"""Pallas TPU LSTM kernel — the recurrence as a single on-chip program.

Motivation (measured): Cubegan inference runs ~5k sequential LSTM steps through
`lax.scan` (char/dur/pitch/cond BiLSTMs); per-step while-loop dispatch dominates wall
time (~60 ms of a 64 ms synthesis). This kernel runs the whole time loop inside one
pallas program: the hidden/cell state lives in VMEM scratch across grid steps (TPU grid
iterations execute sequentially on a core), W_hh stays resident in VMEM, and each step
reads one (B, 4H) slice of the precomputed input projection.

The input projection x@W_ih (+b) for the full sequence remains a single large MXU matmul
outside the kernel (ops/rnn.py), which is already optimal.

The bidirectional variant processes forward and backward directions in the same grid
step (independent states, fwd reads block t, bwd reads block T-1-t), so a BiLSTM costs
the same number of sequential steps as a unidirectional one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(xw_ref, wh_ref, out_ref, h_ref, c_ref):
    """Grid (T,); block t supplies xw[t] (B,4H); carry in VMEM scratch."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    H = h_ref.shape[1]
    gates = xw_ref[0] + jnp.dot(h_ref[:], wh_ref[:], preferred_element_type=jnp.float32)
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c = f * c_ref[:] + i * g
    h = o * jnp.tanh(c)
    c_ref[:] = c
    h_ref[:] = h
    out_ref[0] = h


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def lstm_pallas(xw: jnp.ndarray, wh: jnp.ndarray, reverse: bool = False,
                interpret: bool = False) -> jnp.ndarray:
    """xw: (B, T, 4H) input projection (+bias); wh: (H, 4H). Zero initial state.
    Returns hidden states (B, T, H)."""
    B, T, H4 = xw.shape
    H = H4 // 4
    xw_t = jnp.swapaxes(xw, 0, 1)  # (T, B, 4H) — time-major for per-step blocks
    if reverse:
        xw_t = jnp.flip(xw_t, axis=0)
    out = pl.pallas_call(
        _lstm_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw_t, wh)
    if reverse:
        out = jnp.flip(out, axis=0)
    return jnp.swapaxes(out, 0, 1)


def _bilstm_kernel(xw_f_ref, xw_b_ref, wh_f_ref, wh_b_ref, out_f_ref, out_b_ref,
                   hf_ref, cf_ref, hb_ref, cb_ref):
    """Both directions per grid step: fwd consumes block t, bwd block T-1-t."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        hf_ref[:] = jnp.zeros_like(hf_ref)
        cf_ref[:] = jnp.zeros_like(cf_ref)
        hb_ref[:] = jnp.zeros_like(hb_ref)
        cb_ref[:] = jnp.zeros_like(cb_ref)

    H = hf_ref.shape[1]

    def cell(x, wh_ref, h_ref, c_ref):
        gates = x + jnp.dot(h_ref[:], wh_ref[:], preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H : 2 * H])
        g = jnp.tanh(gates[:, 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H :])
        c = f * c_ref[:] + i * g
        h = o * jnp.tanh(c)
        c_ref[:] = c
        h_ref[:] = h
        return h

    out_f_ref[0] = cell(xw_f_ref[0], wh_f_ref, hf_ref, cf_ref)
    out_b_ref[0] = cell(xw_b_ref[0], wh_b_ref, hb_ref, cb_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bilstm_pallas(xw_f: jnp.ndarray, xw_b: jnp.ndarray, wh_f: jnp.ndarray,
                  wh_b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Bidirectional LSTM in one kernel. xw_f/xw_b: (B, T, 4H) projections for the
    forward/backward weights. Returns (B, T, 2H) concat(fwd, bwd)."""
    B, T, H4 = xw_f.shape
    H = H4 // 4
    xf = jnp.swapaxes(xw_f, 0, 1)
    xb = jnp.flip(jnp.swapaxes(xw_b, 0, 1), axis=0)
    out_f, out_b = pl.pallas_call(
        _bilstm_kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, B, H4), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H4), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B, H), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
            jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, H), jnp.float32) for _ in range(4)],
        interpret=interpret,
    )(xf, xb, wh_f, wh_b)
    out_b = jnp.flip(out_b, axis=0)
    return jnp.concatenate([jnp.swapaxes(out_f, 0, 1), jnp.swapaxes(out_b, 0, 1)],
                           axis=-1)
