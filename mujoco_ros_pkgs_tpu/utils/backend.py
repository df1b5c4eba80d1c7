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
