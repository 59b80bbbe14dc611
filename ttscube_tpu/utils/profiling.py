"""Tracing/profiling harness (aux subsystem — the reference has none, SURVEY §5:
only tqdm bars and one wall-clock print at vocoder.py:251-258).

* `trace(dir)` — context manager around jax.profiler for device traces (view in
  tensorboard/xprof).
* `PhaseTimer` — named wall-clock phases with a report; understands the async-dispatch
  trap (calls block via jax.block_until_ready on the passed value).
* `device_timer` — robust kernel timing on relay-backed TPUs: runs the op REPS times
  inside one jitted fori_loop and fetches a scalar (a bare block_until_ready is not a
  reliable barrier through the relay, and each round trip costs ~28 ms).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/ttscube_trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            lines.append(f"{name}: {self.totals[name]*1e3:.1f} ms "
                         f"({self.counts[name]} calls)")
        return "\n".join(lines)


def device_timer(fn, *args, reps: int = 10, relay_floor_s: float = 0.028,
                 return_compile_time: bool = False):
    """Median-free single-shot amortized timing: runs `fn(*args)` `reps` times inside
    one jitted loop (chained through a scalar) and returns seconds per call (or a
    ``(seconds_per_call, compile_seconds)`` pair with `return_compile_time` — compile
    wall time matters on the relay, where big programs can take minutes)."""

    @jax.jit
    def loop(*a):
        def body(i, acc):
            out = fn(*jax.tree.map(
                lambda x: x + (acc * 0).astype(x.dtype) if hasattr(x, "dtype") else x,
                a))
            leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "mean")]
            return acc + sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    tc = time.perf_counter()
    float(loop(*args))  # compile (+1 run)
    compile_s = time.perf_counter() - tc
    t0 = time.perf_counter()
    float(loop(*args))
    per_call = max(time.perf_counter() - t0 - relay_floor_s, 0.0) / reps
    if return_compile_time:
        return per_call, compile_s
    return per_call
