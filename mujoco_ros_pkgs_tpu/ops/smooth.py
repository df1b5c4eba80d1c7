"""Smooth (unconstrained) dynamics: the mj_fwdPosition/Velocity/Actuation path.

Pure functions over (Model, Data) for ONE env; batch via vmap. Model topology
(static tuples) unrolls loops at trace time: the compiled XLA program is
straight-line code specialized to the model — no gathers over topology, and the
mass-matrix build is a single (nv,6)x(6,nv)-style dense contraction that maps
onto the MXU under vmap.

Mirrors libmujoco 2.3.7 engine_core_smooth.c semantics (the engine the
reference server steps via mj_step, mujoco_ros/src/mujoco_env.cpp:498).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import (
    Data, DisableBit, DynType, GainType, BiasType, JointType, Model, TrnType,
)
from mujoco_ros_pkgs_tpu.ops import math as mmath


# ---------------------------------------------------------------------------
# static topology helpers (host-side, trace-time)
# ---------------------------------------------------------------------------

import functools


@functools.lru_cache(maxsize=128)
def _dof_ancestor_mask(dof_parentid, nv) -> np.ndarray:
    mask = np.zeros((nv, nv), dtype=bool)
    for i in range(nv):
        j = i
        while j >= 0:
            mask[i, j] = True
            j = dof_parentid[j]
    return mask


def dof_ancestor_mask(m: Model) -> np.ndarray:
    """mask[i, j] = 1 if dof j is on the ancestor chain of dof i (inclusive).
    Memoized on the static topology tuples (called per trace, not per model)."""
    return _dof_ancestor_mask(m.dof_parentid, m.nv)


@functools.lru_cache(maxsize=128)
def _body_dof_mask(body_parentid, body_dofnum, body_dofadr, nv) -> np.ndarray:
    nbody = len(body_parentid)
    mask = np.zeros((nv, nbody), dtype=bool)
    for b in range(nbody):
        bid = b
        while bid != 0:
            if body_dofnum[bid]:
                adr = body_dofadr[bid]
                for k in range(body_dofnum[bid]):
                    mask[adr + k, b] = True
            bid = body_parentid[bid]
    return mask


def body_dof_mask(m: Model) -> np.ndarray:
    """mask[j, b] = 1 if dof j affects body b (dof's body is ancestor of b).
    Memoized on the static topology tuples."""
    return _body_dof_mask(m.body_parentid, m.body_dofnum, m.body_dofadr, m.nv)


# ---------------------------------------------------------------------------
# mj_kinematics + mj_comPos
# ---------------------------------------------------------------------------

def kinematics(m: Model, d: Data) -> Data:
    """Forward kinematics; also renormalizes quaternions in qpos (as MuJoCo does)."""
    qpos = d.qpos

    xpos = [jnp.zeros(3, dtype=qpos.dtype)]
    xquat = [jnp.array([1.0, 0, 0, 0], dtype=qpos.dtype)]
    xanchor = [None] * m.njnt
    xaxis = [None] * m.njnt
    qpos_out = qpos

    for b in range(1, m.nbody):
        p = m.body_parentid[b]
        pq, pp = xquat[p], xpos[p]
        if m.body_mocapid[b] >= 0:
            # mocap bodies are driven directly from mocap_pos/quat (the
            # reference's mocap plugin writes these every step,
            # mujoco_ros_mocap_plugin/src/mocap_plugin.cpp:80-105)
            mid = m.body_mocapid[b]
            xpos.append(d.mocap_pos[mid])
            xquat.append(mmath.normalize(d.mocap_quat[mid]))
            continue
        quat = mmath.quat_mul(pq, m.body_quat[b])
        pos = pp + mmath.rot_vec_quat(m.body_pos[b], pq)

        for k in range(m.body_jntnum[b]):
            j = m.body_jntadr[b] + k
            jt = m.jnt_type[j]
            qadr = m.jnt_qposadr[j]
            if jt == int(JointType.FREE):
                pos = qpos[qadr:qadr + 3]
                quat = mmath.normalize(qpos[qadr + 3:qadr + 7])
                qpos_out = qpos_out.at[qadr + 3:qadr + 7].set(quat)
                xanchor[j] = pos
                xaxis[j] = m.jnt_axis[j]  # free joint axis stays global +z
                continue
            anchor = pos + mmath.rot_vec_quat(m.jnt_pos[j], quat)
            axis = mmath.rot_vec_quat(m.jnt_axis[j], quat)
            xanchor[j] = anchor
            xaxis[j] = axis
            if jt == int(JointType.SLIDE):
                pos = pos + axis * (qpos[qadr] - m.qpos0[qadr])
                xanchor[j] = pos + mmath.rot_vec_quat(m.jnt_pos[j], quat)
            elif jt == int(JointType.BALL):
                qloc = mmath.normalize(qpos[qadr:qadr + 4])
                qpos_out = qpos_out.at[qadr:qadr + 4].set(qloc)
                quat = mmath.quat_mul(quat, qloc)
                pos = anchor - mmath.rot_vec_quat(m.jnt_pos[j], quat)
            elif jt == int(JointType.HINGE):
                angle = qpos[qadr] - m.qpos0[qadr]
                qloc = mmath.axis_angle_to_quat(m.jnt_axis[j], angle)
                quat = mmath.quat_mul(quat, qloc)
                pos = anchor - mmath.rot_vec_quat(m.jnt_pos[j], quat)
        xpos.append(pos)
        xquat.append(mmath.normalize(quat))

    xpos = jnp.stack(xpos)
    xquat = jnp.stack(xquat)
    xmat = jax.vmap(mmath.quat_to_mat)(xquat)

    xipos = xpos + jax.vmap(mmath.rot_vec_quat)(m.body_ipos, xquat)
    ximat = xmat @ jax.vmap(mmath.quat_to_mat)(m.body_iquat)

    if m.njnt:
        xanchor = jnp.stack(xanchor)
        xaxis = jnp.stack(xaxis)
    else:
        xanchor = jnp.zeros((0, 3), dtype=qpos.dtype)
        xaxis = jnp.zeros((0, 3), dtype=qpos.dtype)

    gb = np.array(m.geom_bodyid, dtype=np.int32) if m.ngeom else np.zeros(0, np.int32)
    geom_xpos = xpos[gb] + jnp.einsum("bij,bj->bi", xmat[gb], m.geom_pos)
    geom_xmat = xmat[gb] @ jax.vmap(mmath.quat_to_mat)(m.geom_quat)
    sb = np.array(m.site_bodyid, dtype=np.int32) if m.nsite else np.zeros(0, np.int32)
    site_xpos = xpos[sb] + jnp.einsum("bij,bj->bi", xmat[sb], m.site_pos)
    site_xmat = xmat[sb] @ jax.vmap(mmath.quat_to_mat)(m.site_quat)

    return d.replace(qpos=qpos_out, xpos=xpos, xquat=xquat, xmat=xmat,
                     xipos=xipos, ximat=ximat, xanchor=xanchor, xaxis=xaxis,
                     geom_xpos=geom_xpos, geom_xmat=geom_xmat,
                     site_xpos=site_xpos, site_xmat=site_xmat)


def com_pos(m: Model, d: Data) -> Data:
    """mj_comPos: subtree com, com-based inertia (cinert) and dof axes (cdof)."""
    dtype = d.qpos.dtype
    # subtree com: backward accumulation of mass*xipos
    mass = m.body_mass
    wsum = mass[:, None] * d.xipos
    subtree = list(wsum)
    for b in range(m.nbody - 1, 0, -1):
        subtree[m.body_parentid[b]] = subtree[m.body_parentid[b]] + subtree[b]
    subtree_com = jnp.stack(subtree) / jnp.maximum(
        m.body_subtreemass, mmath.MINVAL)[:, None]
    subtree_com = subtree_com.at[0].set(
        jnp.where(m.body_subtreemass[0] > mmath.MINVAL, subtree_com[0],
                  jnp.zeros(3, dtype=dtype)))

    # cinert: body inertia about subtree_com[rootid], world orientation
    rootid = np.array(m.body_rootid, dtype=np.int32)
    ref = subtree_com[rootid]  # (nbody, 3)

    def one_cinert(ximat, inertia, massb, xipos, refb):
        I_world = ximat @ jnp.diag(inertia) @ ximat.T
        return mmath.inert_from_mass_com_fullinertia(massb, I_world, xipos - refb)

    cinert = jax.vmap(one_cinert)(d.ximat, m.body_inertia, mass, d.xipos, ref)

    # cdof
    cdofs = []
    for j in range(m.njnt):
        jt = m.jnt_type[j]
        b = m.jnt_bodyid[j]
        refb = ref[b]
        if jt == int(JointType.FREE):
            for ax in range(3):
                e = jnp.zeros(6, dtype=dtype).at[3 + ax].set(1.0)
                cdofs.append(e)
            # rotation dofs: body-frame axes (local angular velocity convention)
            offset = refb - d.xanchor[j]
            for ax in range(3):
                axis = d.xmat[b][:, ax]
                cdofs.append(jnp.concatenate([axis, jnp.cross(axis, offset)]))
        elif jt == int(JointType.BALL):
            offset = refb - d.xanchor[j]
            for ax in range(3):
                axis = d.xmat[b][:, ax]
                cdofs.append(jnp.concatenate([axis, jnp.cross(axis, offset)]))
        elif jt == int(JointType.SLIDE):
            cdofs.append(jnp.concatenate(
                [jnp.zeros(3, dtype=dtype), d.xaxis[j]]))
        elif jt == int(JointType.HINGE):
            offset = refb - d.xanchor[j]
            axis = d.xaxis[j]
            cdofs.append(jnp.concatenate([axis, jnp.cross(axis, offset)]))
    cdof = (jnp.stack(cdofs) if cdofs
            else jnp.zeros((0, 6), dtype=dtype))
    return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


# ---------------------------------------------------------------------------
# mj_comVel
# ---------------------------------------------------------------------------

def com_vel(m: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    cvel = [jnp.zeros(6, dtype=dtype)]
    cdof_dot = [None] * m.nv
    for b in range(1, m.nbody):
        v = cvel[m.body_parentid[b]]
        for k in range(m.body_jntnum[b]):
            j = m.body_jntadr[b] + k
            jt = m.jnt_type[j]
            adr = m.jnt_dofadr[j]
            if jt == int(JointType.FREE):
                for i in range(3):
                    cdof_dot[adr + i] = jnp.zeros(6, dtype=dtype)
                v = v + d.cdof[adr:adr + 3].T @ d.qvel[adr:adr + 3]
                for i in range(3, 6):
                    cdof_dot[adr + i] = mmath.motion_cross(v, d.cdof[adr + i])
                v = v + d.cdof[adr + 3:adr + 6].T @ d.qvel[adr + 3:adr + 6]
            elif jt == int(JointType.BALL):
                for i in range(3):
                    cdof_dot[adr + i] = mmath.motion_cross(v, d.cdof[adr + i])
                v = v + d.cdof[adr:adr + 3].T @ d.qvel[adr:adr + 3]
            else:
                cdof_dot[adr] = mmath.motion_cross(v, d.cdof[adr])
                v = v + d.cdof[adr] * d.qvel[adr]
        cvel.append(v)
    cdof_dot = (jnp.stack(cdof_dot) if m.nv
                else jnp.zeros((0, 6), dtype=dtype))
    return d.replace(cvel=jnp.stack(cvel), cdof_dot=cdof_dot)


# ---------------------------------------------------------------------------
# mj_crb + dense factorization
# ---------------------------------------------------------------------------

def crb(m: Model, d: Data) -> Data:
    """Composite rigid body: dense qM = J^T I J specialized by topology masks."""
    crb_inert = list(d.cinert)
    for b in range(m.nbody - 1, 0, -1):
        crb_inert[m.body_parentid[b]] = crb_inert[m.body_parentid[b]] + crb_inert[b]
    crb_inert = jnp.stack(crb_inert)

    if m.nv == 0:
        return d

    dof_bodyid = np.array(m.dof_bodyid, dtype=np.int32)
    # F[i] = crb[body(i)] * cdof[i]
    F = jax.vmap(mmath.inert_vec_mul)(crb_inert[dof_bodyid], d.cdof)
    # G[i, j] = F[i] . cdof[j]  — one dense (nv,6)@(6,nv) matmul
    G = F @ d.cdof.T
    amask = dof_ancestor_mask(m)             # j ancestor-or-equal of i
    lower = jnp.asarray(amask)               # includes diagonal
    strict = jnp.asarray(amask & ~np.eye(m.nv, dtype=bool))
    qM = G * lower + (G * strict).T
    qM = qM + jnp.diag(m.dof_armature)
    qLD = jax.scipy.linalg.cholesky(qM, lower=True)
    return d.replace(qM=qM, qLD=qLD)


def solve_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
    """M^{-1} x via the cached Cholesky factor (mj_solveM)."""
    y = jax.scipy.linalg.solve_triangular(d.qLD, x, lower=True)
    return jax.scipy.linalg.solve_triangular(d.qLD.T, y, lower=False)


def mul_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
    return d.qM @ x


# ---------------------------------------------------------------------------
# mj_rne (flg_acc=0): qfrc_bias
# ---------------------------------------------------------------------------

def rne(m: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    gravity = jnp.where(
        bool(m.opt.disableflags & DisableBit.GRAVITY), 0.0, 1.0) * m.opt.gravity
    cacc0 = jnp.concatenate([jnp.zeros(3, dtype=dtype), -gravity.astype(dtype)])

    cacc = [cacc0]
    for b in range(1, m.nbody):
        a = cacc[m.body_parentid[b]]
        adr, n = m.body_dofadr[b], m.body_dofnum[b]
        if n:
            a = a + d.cdof_dot[adr:adr + n].T @ d.qvel[adr:adr + n]
        cacc.append(a)

    cfrc = []
    for b in range(m.nbody):
        fb = (mmath.inert_vec_mul(d.cinert[b], cacc[b])
              + mmath.force_cross(d.cvel[b],
                                  mmath.inert_vec_mul(d.cinert[b], d.cvel[b])))
        cfrc.append(fb)
    # backward accumulate
    for b in range(m.nbody - 1, 0, -1):
        cfrc[m.body_parentid[b]] = cfrc[m.body_parentid[b]] + cfrc[b]

    if m.nv:
        dof_bodyid = np.array(m.dof_bodyid, dtype=np.int32)
        cfrc = jnp.stack(cfrc)
        qfrc_bias = jnp.einsum("ij,ij->i", d.cdof, cfrc[dof_bodyid])
    else:
        qfrc_bias = jnp.zeros(0, dtype=dtype)
    return d.replace(qfrc_bias=qfrc_bias)


# ---------------------------------------------------------------------------
# tendons (fixed), transmission, passive, actuation
# ---------------------------------------------------------------------------

def tendon(m: Model, d: Data) -> Data:
    if m.ntendon == 0:
        return d
    dtype = d.qpos.dtype
    lengths, jrows = [], []
    for t in range(m.ntendon):
        L = jnp.zeros((), dtype=dtype)
        row = jnp.zeros(m.nv, dtype=dtype)
        for w in range(m.tendon_adr[t], m.tendon_adr[t] + m.tendon_num[t]):
            j = m.wrap_objid[w]
            coef = m.wrap_prm[w]
            L = L + coef * d.qpos[m.jnt_qposadr[j]]
            row = row.at[m.jnt_dofadr[j]].add(coef)
        lengths.append(L)
        jrows.append(row)
    ten_J = jnp.stack(jrows)
    return d.replace(ten_length=jnp.stack(lengths), ten_J=ten_J,
                     ten_velocity=ten_J @ d.qvel)


def jac(m: Model, d: Data, point: jax.Array, body: int):
    """mj_jac: translational/rotational jacobians (nv,3) at a world point."""
    mask = body_dof_mask(m)[:, body]
    maskj = jnp.asarray(mask, dtype=d.qpos.dtype)[:, None]
    offset = point - d.subtree_com[m.body_rootid[body]]
    jacp = (d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3],
                                      jnp.broadcast_to(offset, (m.nv, 3)))) * maskj
    jacr = d.cdof[:, :3] * maskj
    return jacp, jacr


def transmission(m: Model, d: Data) -> Data:
    if m.nu == 0:
        return d
    dtype = d.qpos.dtype
    lengths, moments = [], []
    for i in range(m.nu):
        trn = m.actuator_trntype[i]
        gear = m.actuator_gear[i]
        row = jnp.zeros(m.nv, dtype=dtype)
        if trn in (int(TrnType.JOINT), int(TrnType.JOINTINPARENT)):
            j = m.actuator_trnid[i][0]
            jt = m.jnt_type[j]
            qadr, vadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
            if jt in (int(JointType.SLIDE), int(JointType.HINGE)):
                L = d.qpos[qadr] * gear[0]
                row = row.at[vadr].set(gear[0])
            elif jt == int(JointType.BALL):
                # torque actuation with 3D gear; length undefined → 0
                L = jnp.zeros((), dtype=dtype)
                row = row.at[vadr:vadr + 3].set(gear[:3])
            else:  # FREE: wrench gear (6,)
                L = jnp.zeros((), dtype=dtype)
                row = row.at[vadr:vadr + 6].set(gear[:6])
        elif trn == int(TrnType.TENDON):
            t = m.actuator_trnid[i][0]
            L = d.ten_length[t] * gear[0]
            row = d.ten_J[t] * gear[0]
        elif trn == int(TrnType.SITE):
            # wrench gear in the SITE frame applied at the site
            s = m.actuator_trnid[i][0]
            jacp, jacr = jac(m, d, d.site_xpos[s], m.site_bodyid[s])
            wf = d.site_xmat[s] @ gear[:3]
            wt = d.site_xmat[s] @ gear[3:]
            row = jacp @ wf + jacr @ wt
            L = jnp.zeros((), dtype=dtype)
        else:
            raise NotImplementedError(f"transmission type {trn}")
        lengths.append(L)
        moments.append(row)
    moment = jnp.stack(moments)
    return d.replace(actuator_length=jnp.stack(lengths),
                     actuator_moment=moment,
                     actuator_velocity=moment @ d.qvel)


def passive(m: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    if m.nv == 0:
        return d
    if m.opt.disableflags & DisableBit.PASSIVE:
        return d.replace(qfrc_passive=jnp.zeros(m.nv, dtype=dtype))
    qfrc = -m.dof_damping * d.qvel
    for j in range(m.njnt):
        stiff = m.jnt_stiffness[j]
        qadr, vadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
        jt = m.jnt_type[j]
        if jt in (int(JointType.SLIDE), int(JointType.HINGE)):
            qfrc = qfrc.at[vadr].add(
                -stiff * (d.qpos[qadr] - m.qpos_spring[qadr]))
        elif jt == int(JointType.BALL):
            dif = mmath.quat_sub(d.qpos[qadr:qadr + 4],
                                 m.qpos_spring[qadr:qadr + 4])
            qfrc = qfrc.at[vadr:vadr + 3].add(-stiff * dif)
        else:  # FREE
            qfrc = qfrc.at[vadr:vadr + 3].add(
                -stiff * (d.qpos[qadr:qadr + 3] - m.qpos_spring[qadr:qadr + 3]))
            dif = mmath.quat_sub(d.qpos[qadr + 3:qadr + 7],
                                 m.qpos_spring[qadr + 3:qadr + 7])
            qfrc = qfrc.at[vadr + 3:vadr + 6].add(-stiff * dif)
    # tendon springs/dampers
    for t in range(m.ntendon):
        # spring with optional deadband [lengthspring0, lengthspring1]
        low, high = m.tendon_lengthspring[t][0], m.tendon_lengthspring[t][1]
        low = jnp.where(low < 0, m.tendon_length0[t], low)
        high = jnp.where(high < 0, m.tendon_length0[t], high)
        L = d.ten_length[t]
        displ = jnp.where(L > high, high - L, jnp.where(L < low, low - L, 0.0))
        frc = m.tendon_stiffness[t] * displ - m.tendon_damping[t] * d.ten_velocity[t]
        qfrc = qfrc + d.ten_J[t] * frc
    return d.replace(qfrc_passive=qfrc)


def actuation(m: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    if m.nu == 0 or (m.opt.disableflags & DisableBit.ACTUATION):
        return d.replace(qfrc_actuator=jnp.zeros(m.nv, dtype=dtype),
                         actuator_force=jnp.zeros(m.nu, dtype=dtype),
                         act_dot=jnp.zeros(m.na, dtype=dtype))
    ctrl = d.ctrl
    if not (m.opt.disableflags & DisableBit.CLAMPCTRL):
        limited = jnp.asarray(np.array(m.actuator_ctrllimited, dtype=bool))
        ctrl = jnp.where(limited,
                         jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                                  m.actuator_ctrlrange[:, 1]), ctrl)
    # activation dynamics
    act_dot = jnp.zeros(m.na, dtype=dtype)
    inputs = []
    for i in range(m.nu):
        dyn = m.actuator_dyntype[i]
        if dyn == int(DynType.NONE):
            inputs.append(ctrl[i])
        else:
            a = d.act[m.actuator_actadr[i]]
            inputs.append(a)
            if dyn == int(DynType.INTEGRATOR):
                ad = ctrl[i]
            else:  # FILTER / FILTEREXACT
                ad = (ctrl[i] - a) / jnp.maximum(m.actuator_dynprm[i, 0],
                                                 mmath.MINVAL)
            act_dot = act_dot.at[m.actuator_actadr[i]].set(ad)
    inp = jnp.stack(inputs)

    gaintype = np.array(m.actuator_gaintype)
    biastype = np.array(m.actuator_biastype)
    L, V = d.actuator_length, d.actuator_velocity
    gp, bp = m.actuator_gainprm, m.actuator_biasprm
    gain = jnp.where(jnp.asarray(gaintype == int(GainType.FIXED)), gp[:, 0],
                     gp[:, 0] + gp[:, 1] * L + gp[:, 2] * V)
    bias = jnp.where(jnp.asarray(biastype == int(BiasType.NONE)), 0.0,
                     bp[:, 0] + bp[:, 1] * L + bp[:, 2] * V)
    force = gain * inp + bias
    flimited = jnp.asarray(np.array(m.actuator_forcelimited, dtype=bool))
    force = jnp.where(flimited,
                      jnp.clip(force, m.actuator_forcerange[:, 0],
                               m.actuator_forcerange[:, 1]), force)
    qfrc = d.actuator_moment.T @ force

    # clamp total actuator force at joints (jnt_actfrclimited)
    for j in range(m.njnt):
        if m.jnt_actfrclimited[j]:
            vadr = m.jnt_dofadr[j]
            qfrc = qfrc.at[vadr].set(jnp.clip(
                qfrc[vadr], m.jnt_actfrcrange[j, 0], m.jnt_actfrcrange[j, 1]))
    return d.replace(actuator_force=force, qfrc_actuator=qfrc, act_dot=act_dot)


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
    """Map xfrc_applied ([force(3), torque(3)] at body com, world) to qfrc."""
    dtype = d.qpos.dtype
    if m.nv == 0:
        return jnp.zeros(0, dtype=dtype)
    rootid = np.array(m.body_rootid, dtype=np.int32)
    ref = d.subtree_com[rootid]

    def to_spatial(xf, xipos, refb):
        force, torque = xf[:3], xf[3:]
        vec = jnp.concatenate([torque, force])
        return mmath.transform_force(vec, refb, xipos)

    fs = jax.vmap(to_spatial)(d.xfrc_applied, d.xipos, ref)  # (nbody, 6)
    mask = jnp.asarray(body_dof_mask(m), dtype=dtype)        # (nv, nbody)
    contrib = d.cdof @ fs.T                                  # (nv, nbody)
    return jnp.sum(contrib * mask, axis=1)


# ---------------------------------------------------------------------------
# pipeline assembly
# ---------------------------------------------------------------------------

def fwd_position_smooth(m: Model, d: Data) -> Data:
    d = kinematics(m, d)
    d = com_pos(m, d)
    d = crb(m, d)
    d = tendon(m, d)
    d = transmission(m, d)
    return d


def fwd_velocity_smooth(m: Model, d: Data) -> Data:
    d = com_vel(m, d)
    d = passive(m, d)
    d = rne(m, d)
    return d


def fwd_acceleration_smooth(m: Model, d: Data) -> Data:
    qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
                   + d.qfrc_applied + xfrc_accumulate(m, d))
    qacc_smooth = solve_m(m, d, qfrc_smooth)
    return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
