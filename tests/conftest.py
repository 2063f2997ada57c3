"""Test configuration: CPU backend with 8 virtual devices (multi-chip
sharding tests run on a fake mesh, the capability the reference's MPI
test-suite lacks) and float64 for physics fidelity."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin ignores the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
