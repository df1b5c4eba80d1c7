"""Constraint assembly + solve (mj_fwdConstraint analogue).

Thin dispatch: detects whether the model has any constraint source
(equality/friction/limit/contact) and routes to the masked fixed-shape efc
assembly + Newton solve (ops/efc.py, ops/solver.py), or the free smooth-only
path when there is none.
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import Data, DisableBit, Model


def _has_constraints(m: Model) -> bool:
    if m.opt.disableflags & DisableBit.CONSTRAINT:
        return False
    if m.ncon_max and not (m.opt.disableflags & DisableBit.CONTACT):
        return True
    if m.neq and not (m.opt.disableflags & DisableBit.EQUALITY):
        return True
    if any(m.jnt_limited) or any(m.tendon_limited):
        if not (m.opt.disableflags & DisableBit.LIMIT):
            return True
    if ((m.dof_floss_adr or m.tendon_floss_adr)
            and not (m.opt.disableflags & DisableBit.FRICTIONLOSS)):
        return True
    return False


def fwd_constraint(m: Model, d: Data) -> Data:
    if not _has_constraints(m):
        return d.replace(qacc=d.qacc_smooth,
                         qfrc_constraint=jnp.zeros_like(d.qacc_smooth))
    from mujoco_ros_pkgs_tpu.ops import efc
    return efc.fwd_constraint(m, d)
