"""Mesh sharding: scale the env batch over a TPU slice (ICI) and hosts (DCN).

The reference has NO multi-chip/multi-node capability: one mjModel/mjData per
process, a single physics thread, a deprecated num_instances arg
(mujoco_ros/include/mujoco_ros/mujoco_env.h:298-300,
launch/launch_server.launch:21), with ROS topics as the only "backend"
(SURVEY.md §2.6). Here scaling is first-class and TPU-native:

- envs are a leading batch axis sharded over a `Mesh` ('env' axis, optionally
  a 2D ('host', 'env') layout so cross-host traffic rides DCN only when
  needed);
- the Model is replicated; Data/plugin-state leaves are sharded on dim 0;
- XLA inserts the collectives: consumers aggregate observations with
  psum/all_gather over the mesh axes (BASELINE config 5: contact-rich scene
  sharded over hosts feeding a sharded consumer).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mujoco_ros_pkgs_tpu.core.types import Data, Model


def make_mesh(n_devices: Optional[int] = None, axis: str = "env") -> Mesh:
    """1D device mesh over the env axis (ICI within a slice, DCN across)."""
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devs), (axis,))


def replicate_model(m: Model, mesh: Mesh) -> Model:
    """Model constants replicated to every device."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, m)


def shard_batch(tree, mesh: Mesh, axis: str = "env"):
    """Shard every array leaf on dim 0 over `axis` (the env batch axis)."""
    def put(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        return jax.device_put(x, NamedSharding(mesh, P(axis)))
    return jax.tree_util.tree_map(put, tree)


def sharded_step_fn(m: Model, mesh: Mesh, axis: str = "env",
                    with_consumer: bool = True):
    """jit-compiled batched step with env-axis sharding.

    Returns fn(d_batched) -> (d_batched, consumed) where `consumed` is a small
    replicated array produced by cross-device collectives (mean qpos / contact
    penetration summary) — the sharded-consumer pattern of BASELINE config 5.
    XLA lowers the mean to psum over ICI/DCN; no NCCL/MPI anywhere.
    """
    from mujoco_ros_pkgs_tpu.ops import forward as fwd

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))

    def step_batch(d):
        d = jax.vmap(lambda dd: fwd.step(m, dd))(d)
        if with_consumer:
            # cross-env aggregate: global mean qpos + sim time (collective)
            consumed = jnp.concatenate([
                jnp.mean(d.qpos, axis=0),
                jnp.mean(d.time)[None],
            ])
        else:
            consumed = jnp.zeros(1, dtype=d.qpos.dtype)
        return d, consumed

    # input shardings propagate from the sharded operands; pin the consumer
    # output replicated so every host can read it without a gather
    return jax.jit(step_batch, out_shardings=(None, repl))


def scan_steps_fn(m: Model, mesh: Mesh, nsub: int, axis: str = "env"):
    """jit(scan(vmap(step))) over nsub steps with the env axis sharded —
    the throughput shape used by bench.py."""
    from mujoco_ros_pkgs_tpu.ops import forward as fwd

    def run(d):
        def body(d, _):
            d = jax.vmap(lambda dd: fwd.step(m, dd))(d)
            return d, None
        d, _ = jax.lax.scan(body, d, None, length=nsub)
        return d

    return jax.jit(run)
