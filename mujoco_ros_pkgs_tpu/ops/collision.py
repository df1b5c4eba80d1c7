"""Collision driver: static pair table -> masked fixed-capacity contact set.

Thin dispatch over the full narrowphase (ops/narrowphase.py, all 8 geom
types incl. convex mesh hulls) and broadphase compaction (ops/broadphase.py);
this module owns the disableflags / empty-pair-table gating.
"""

from __future__ import annotations

from mujoco_ros_pkgs_tpu.core.types import Data, DisableBit, Model


def collide(m: Model, d: Data) -> Data:
    if m.ncon_max == 0 or (m.opt.disableflags & DisableBit.CONTACT):
        return d
    from mujoco_ros_pkgs_tpu.ops import narrowphase
    return narrowphase.collide(m, d)
