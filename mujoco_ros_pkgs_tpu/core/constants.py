"""Derived model constants requiring dynamics at qpos0 (mj_setConst analogue).

Computes dof_invweight0, body_invweight0, tendon_invweight0/length0 by running
our own smooth dynamics at qpos0 — the same quantities libmujoco derives at
compile time and which the reference's body-state service relies on when masses
change (mujoco_ros/src/callbacks.cpp:244-258 re-runs mj_setConst).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import Model


def set_constants(m: Model) -> Model:
    from mujoco_ros_pkgs_tpu.ops import forward, smooth

    if m.nv == 0:
        return m

    d = forward.make_data(m)
    d = smooth.fwd_position_smooth(m, d)

    Minv = jnp.linalg.inv(d.qM)
    dof_invweight0 = jnp.diag(Minv)
    # libmujoco averages invweight0 within ball / free-joint dof groups
    from mujoco_ros_pkgs_tpu.core.types import JointType
    for j in range(m.njnt):
        adr = m.jnt_dofadr[j]
        if m.jnt_type[j] == int(JointType.BALL):
            mean = jnp.mean(dof_invweight0[adr:adr + 3])
            dof_invweight0 = dof_invweight0.at[adr:adr + 3].set(mean)
        elif m.jnt_type[j] == int(JointType.FREE):
            mean_t = jnp.mean(dof_invweight0[adr:adr + 3])
            mean_r = jnp.mean(dof_invweight0[adr + 3:adr + 6])
            dof_invweight0 = dof_invweight0.at[adr:adr + 3].set(mean_t)
            dof_invweight0 = dof_invweight0.at[adr + 3:adr + 6].set(mean_r)

    # body_invweight0: mean diagonal of J M^-1 J^T for the body-com jacobian
    bmask = smooth.body_dof_mask(m)  # (nv, nbody)
    rootid = np.array(m.body_rootid, dtype=np.int32)
    ref = d.subtree_com[rootid]
    inv_tr, inv_rot = [], []
    for b in range(m.nbody):
        mask = jnp.asarray(bmask[:, b], dtype=d.qpos.dtype)[:, None]
        offset = d.xipos[b] - ref[b]
        jacp = (d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], offset[None, :])) * mask
        jacr = d.cdof[:, :3] * mask
        A_t = jacp.T @ Minv @ jacp
        A_r = jacr.T @ Minv @ jacr
        inv_tr.append(jnp.trace(A_t) / 3.0)
        inv_rot.append(jnp.trace(A_r) / 3.0)
    body_invweight0 = jnp.stack([jnp.stack(inv_tr), jnp.stack(inv_rot)], axis=1)

    updates = dict(dof_invweight0=dof_invweight0,
                   body_invweight0=body_invweight0)

    if m.ntendon:
        ten_invweight0 = jnp.einsum("ti,ij,tj->t", d.ten_J, Minv, d.ten_J)
        updates.update(tendon_length0=d.ten_length,
                       tendon_invweight0=ten_invweight0)

    if m.nu:
        # actuator_acc0 = |M^-1 moment_i| at qpos0 (mj_setConst): the peak
        # muscle force scale F0 = scale/acc0 when gainprm force < 0
        updates.update(actuator_acc0=jnp.linalg.norm(
            d.actuator_moment @ Minv, axis=1))

    return m.replace(**updates)
