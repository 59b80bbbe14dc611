"""Test harness config: force CPU with 8 virtual devices so mesh/sharding tests run
without TPU hardware (SURVEY.md §4 test strategy, layer 5)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# The session presets JAX_PLATFORMS=axon (real TPU); tests run on CPU with a virtual
# 8-device mesh, so override unconditionally. bench.py / __graft_entry__.py keep the TPU.
# (env var alone is not enough — the axon plugin wins unless jax_platforms is set too)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled-executable caches after every test module.

    One pytest process accumulates hundreds of XLA:CPU executables across the suite
    (8 virtual devices multiply the footprint); with everything live, a fresh compile
    deep into the run segfaulted inside `backend_compile_and_load` on a 1-core box
    (reproduced twice on the round-3 tree at tests/test_pallas_resblock.py:362 —
    the test passes alone). Modules don't share jitted functions, so per-module cache
    clearing costs nothing and bounds the live-executable count. Belt-and-braces with
    scripts/run_tests.sh (per-file process isolation)."""
    yield
    jax.clear_caches()
