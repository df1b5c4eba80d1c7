"""Test harness config: CPU backend with 8 virtual devices (multi-chip sharding
tests), float64 enabled (parity vs libmujoco's double precision)."""

import os

# NOTE: the axon TPU plugin ignores the JAX_PLATFORMS env var; the config-based
# override below is what actually pins the test backend to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
