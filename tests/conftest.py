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

assert jax.default_backend() == "cpu"
assert len(jax.devices()) == 8, jax.devices()
