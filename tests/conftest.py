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
try:
    # some images strip XLA_FLAGS (the axon sitecustomize does); the config
    # knob is what reliably yields the 8 virtual CPU devices
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass
jax.config.update("jax_enable_x64", True)

# The XLA CPU backend compiles float64 programs ~25x slower than float32
# (measured: 46s vs 1.8s for one contact step). The parity suite is f64 by
# design, so cache compiled executables persistently: a warm suite run skips
# nearly all XLA work.
_CACHE = os.path.expanduser("~/.cache/mujoco_ros_pkgs_tpu/jax")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
