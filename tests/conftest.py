"""Test configuration: force an 8-device virtual CPU mesh.

XLA flags must be set before jax initializes its backends (the standard
JAX fake-mesh trick for testing sharded programs without real chips).
The environment's axon/TPU plugin overrides JAX_PLATFORMS at import, so
we also pin the platform through jax.config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache for the CPU test programs (same dir the
# TPU paths use; entries are keyed by HLO + platform so they never
# collide).  The suite is compile-dominated on this 1-CPU host — a
# warm cache cuts repeat `pytest tests/ -q` runs far below the
# documented 10-minute contract; code changes re-key automatically.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()
