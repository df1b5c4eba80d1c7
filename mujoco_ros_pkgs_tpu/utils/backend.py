"""JAX backend helpers: keep a host CPU backend alive next to the accelerator.

Model compilation and small host-side control-plane math run on CPU (eager ops
against a remote accelerator tunnel pay one RPC each). Some TPU plugin
environments set ``JAX_PLATFORMS=<accel>`` which — if applied verbatim via
``jax.config.update`` — deregisters the CPU backend and crashes every
``jax.local_devices(backend="cpu")`` call (the round-2 bench failure). These
helpers make "accelerator by default, CPU still present" the one configuration
every entry point uses.
"""

from __future__ import annotations

import contextlib
import os


def enable_compile_cache() -> int:
    """Persistent XLA compilation cache shared by every entry point (server
    CLI, bench, tests): a previously-compiled step graph deserializes in
    seconds instead of recompiling for minutes (measured over the axon
    tunnel: 38s cold vs 11s hit for the PILE step). Returns the number of
    pre-existing cache entries, or -1 when disabled. Override the directory
    with MRP_COMPILE_CACHE, disable with MRP_COMPILE_CACHE=0."""
    import jax

    cache = os.environ.get(
        "MRP_COMPILE_CACHE",
        os.path.expanduser("~/.cache/mujoco_ros_pkgs_tpu/jax_tpu"))
    if cache == "0":
        return -1
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return len(os.listdir(cache))
    except (OSError, AttributeError):
        return -1


def ensure_cpu_backend() -> None:
    """If JAX_PLATFORMS pins an accelerator, append ',cpu' so the host backend
    stays registered. Call before the first backend-initializing jax call."""
    import jax

    plats = os.environ.get("JAX_PLATFORMS", "")
    names = [p.strip() for p in plats.split(",") if p.strip()]
    if names and "cpu" not in names:
        jax.config.update("jax_platforms", ",".join(names + ["cpu"]))


def cpu_device():
    """The first host CPU device, or None if no CPU backend is registered."""
    import jax

    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def cpu_default_device():
    """Context manager placing computation on CPU when a CPU backend exists,
    else a no-op (the default backend handles everything)."""
    import jax

    dev = cpu_device()
    if dev is None:
        return contextlib.nullcontext()
    return jax.default_device(dev)
