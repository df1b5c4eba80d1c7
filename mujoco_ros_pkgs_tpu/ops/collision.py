"""Collision driver: static pair table -> masked fixed-capacity contact set.

(Full narrowphase lands in this module; stub passes through when no pairs.)
"""

from __future__ import annotations

from mujoco_ros_pkgs_tpu.core.types import Data, DisableBit, Model


def collide(m: Model, d: Data) -> Data:
    if m.ncon_max == 0 or (m.opt.disableflags & DisableBit.CONTACT):
        return d
    from mujoco_ros_pkgs_tpu.ops import narrowphase
    return narrowphase.collide(m, d)
