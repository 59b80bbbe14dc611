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
