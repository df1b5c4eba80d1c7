"""Mocap plugin: pose injection for mocap bodies — mujoco_ros_mocap_plugin reborn.

Reference (mujoco_ros_mocap_plugin/src/mocap_plugin.cpp): subscribes
`mocap_poses` + serves `set_mocap_state`; validates that names are mocap
bodies in the world frame (:50-70); every step, controlCallback writes
d->mocap_pos / d->mocap_quat (normalized) from the last received state
(:80-105). Typical use: drive a weld constraint to pull a dynamic body toward
a target (mujoco_ros_mocap_plugin/README.md:7).

Here the "last received state" is the plugin state (target_pos/target_quat
arrays); set_mocap_state is a host-side setter. The control hook copies the
targets into Data each step, so host writes land at step-batch boundaries.
"""

from __future__ import annotations

from typing import Any, Tuple

import numpy as np
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import Data, Model
from mujoco_ros_pkgs_tpu.msgs import MocapState, ServiceResult
from mujoco_ros_pkgs_tpu.ops import math as mmath
from mujoco_ros_pkgs_tpu.plugins.base import MujocoPlugin


class MocapPlugin(MujocoPlugin):

    def load(self, m: Model, d: Data) -> bool:
        self._m = m
        return True

    def init_state(self, m: Model, batch: int) -> Any:
        return dict(pos=jnp.asarray(np.array(d_pos0(m))),
                    quat=jnp.asarray(np.array(d_quat0(m))))

    def validate(self, state: MocapState) -> ServiceResult:
        """Mirror the reference's name/frame validation (:50-70)."""
        for name in state.name:
            try:
                b = self._m.body(name)
            except ValueError:
                return ServiceResult(False, f"body '{name}' does not exist")
            if self._m.body_mocapid[b] < 0:
                return ServiceResult(False, f"body '{name}' is not a mocap body")
        return ServiceResult(True, "")

    def set_state(self, ps: Any, state: MocapState) -> Tuple[Any, ServiceResult]:
        res = self.validate(state)
        if not res.success:
            return ps, res
        pos = np.array(ps["pos"])     # copy: jax array buffers are read-only
        quat = np.array(ps["quat"])
        for name, pose in zip(state.name, state.pose):
            mid = self._m.body_mocapid[self._m.body(name)]
            q = np.asarray(pose.orientation, dtype=np.float64)
            q = q / max(np.linalg.norm(q), 1e-15)   # normalize (:96-99)
            if pos.ndim == 3:   # batched (nenv, nmocap, 3)
                if state.env_id is None:
                    pos[:, mid] = pose.position
                    quat[:, mid] = q
                else:
                    pos[state.env_id, mid] = pose.position
                    quat[state.env_id, mid] = q
            else:
                pos[mid] = pose.position
                quat[mid] = q
        return dict(pos=jnp.asarray(pos), quat=jnp.asarray(quat)), res

    def control(self, m: Model, d: Data, ps: Any) -> Tuple[Data, Any]:
        if m.nmocap == 0:
            return d, ps
        return d.replace(mocap_pos=ps["pos"].astype(d.qpos.dtype),
                         mocap_quat=ps["quat"].astype(d.qpos.dtype)), ps


def d_pos0(m: Model):
    pos = np.zeros((m.nmocap, 3))
    for b in range(m.nbody):
        if m.body_mocapid[b] >= 0:
            pos[m.body_mocapid[b]] = np.asarray(m.body_pos[b])
    return pos


def d_quat0(m: Model):
    quat = np.tile(np.array([1.0, 0, 0, 0]), (m.nmocap, 1))
    for b in range(m.nbody):
        if m.body_mocapid[b] >= 0:
            quat[m.body_mocapid[b]] = np.asarray(m.body_quat[b])
    return quat
