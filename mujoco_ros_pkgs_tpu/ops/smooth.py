"""Smooth (unconstrained) dynamics: the mj_fwdPosition/Velocity/Actuation path.

Pure functions over (Model, Data) for ONE env; batch via vmap.

Vectorization strategy (round 3): the XLA graph no longer scales with body
count. Tree recursions (kinematics, com velocity, CRB/RNE accumulations) are
level-order sweeps — bodies grouped by tree depth (static), each level
processed as one vectorized gather/compute/scatter over all bodies at that
depth. Per-dof quantities (cdof), tendons (segment-sum), transmission /
passive / actuation (static type groups) are fully vectorized. Graph size is
O(tree_depth x max_joints_per_body) for the sweeps and O(#type groups) for
the rest — a 50-free-body pile traces the same program as one box.

Mirrors libmujoco 2.3.7 engine_core_smooth.c semantics (the engine the
reference server steps via mj_step, mujoco_ros/src/mujoco_env.cpp:498).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import (
    Data, DisableBit, DynType, GainType, BiasType, GeomType, JointType,
    Model, TrnType,
)
from mujoco_ros_pkgs_tpu.ops import math as mmath


# ---------------------------------------------------------------------------
# static topology helpers (host-side, trace-time; memoized on static tuples)
# ---------------------------------------------------------------------------

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
    """mask[i, j] = 1 if dof j is on the ancestor chain of dof i (inclusive)."""
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
    """mask[j, b] = 1 if dof j affects body b (dof's body is ancestor of b)."""
    return _body_dof_mask(m.body_parentid, m.body_dofnum, m.body_dofadr, m.nv)


@functools.lru_cache(maxsize=128)
def _tree_levels(body_parentid):
    """Bodies grouped by tree depth: tuple of int32 arrays, shallowest first
    (world body 0 excluded). All of a body's ancestors live in earlier groups,
    so each group is data-parallel given its parents' results."""
    nbody = len(body_parentid)
    depth = np.zeros(nbody, dtype=np.int32)
    for b in range(1, nbody):
        depth[b] = depth[body_parentid[b]] + 1
    levels = []
    for dep in range(1, int(depth.max()) + 1 if nbody > 1 else 1):
        ids = np.nonzero(depth == dep)[0].astype(np.int32)
        if ids.size:
            levels.append(ids)
    return tuple(levels)


class _KinMeta:
    """Per-level static index tables for the kinematics/velocity sweeps."""

    def __init__(self, m: Model):
        self.levels = _tree_levels(m.body_parentid)
        par = np.asarray(m.body_parentid, dtype=np.int32)
        jadr = np.asarray(m.body_jntadr, dtype=np.int32)
        jnum = np.asarray(m.body_jntnum, dtype=np.int32)
        mocap = np.asarray(m.body_mocapid, dtype=np.int32)
        jtype = np.asarray(m.jnt_type, dtype=np.int32) if m.njnt else np.zeros(0, np.int32)
        self.per_level = []
        for ids in self.levels:
            maxj = int(jnum[ids].max()) if ids.size else 0
            joints = []
            for k in range(maxj):
                jmask = jnum[ids] > k
                jid = np.where(jmask, jadr[ids] + k, 0).astype(np.int32)
                joints.append((jid, jmask, jtype[jid]))
            self.per_level.append(dict(
                ids=ids, par=par[ids], joints=joints,
                mocap=mocap[ids], has_mocap=bool((mocap[ids] >= 0).any())))


@functools.lru_cache(maxsize=128)
def _kin_meta_cached(body_parentid, body_jntadr, body_jntnum, body_mocapid,
                     jnt_type):
    class _M:  # minimal shim so _KinMeta can read the tuples
        pass
    m = _M()
    m.body_parentid = body_parentid
    m.body_jntadr = body_jntadr
    m.body_jntnum = body_jntnum
    m.body_mocapid = body_mocapid
    m.jnt_type = jnt_type
    m.njnt = len(jnt_type)
    return _KinMeta(m)


def _kin_meta(m: Model) -> _KinMeta:
    return _kin_meta_cached(m.body_parentid, m.body_jntadr, m.body_jntnum,
                            m.body_mocapid, m.jnt_type)


# vectorized math (vmap of the single-element helpers)
_v_quat_mul = jax.vmap(mmath.quat_mul)
_v_rot = jax.vmap(mmath.rot_vec_quat)
_v_norm = jax.vmap(mmath.normalize)
_v_axang = jax.vmap(mmath.axis_angle_to_quat)
_v_quat_to_mat = jax.vmap(mmath.quat_to_mat)
_v_quat_sub = jax.vmap(mmath.quat_sub)


# ---------------------------------------------------------------------------
# mj_kinematics + mj_comPos
# ---------------------------------------------------------------------------

def kinematics(m: Model, d: Data) -> Data:
    """Forward kinematics; also renormalizes quaternions in qpos (as MuJoCo
    does). Level-order sweep: one vectorized gather/compute/scatter per tree
    depth (graph size O(depth), not O(nbody))."""
    qpos = d.qpos
    dtype = qpos.dtype
    meta = _kin_meta(m)
    qpos0 = m.qpos0
    jnt_pos, jnt_axis = m.jnt_pos, m.jnt_axis
    qposadr = (np.asarray(m.jnt_qposadr, dtype=np.int32)
               if m.njnt else np.zeros(0, np.int32))

    xpos = jnp.zeros((m.nbody, 3), dtype=dtype)
    xquat = jnp.zeros((m.nbody, 4), dtype=dtype).at[0, 0].set(1.0)
    xanchor = jnp.zeros((max(m.njnt, 1), 3), dtype=dtype)
    xaxis = jnp.zeros((max(m.njnt, 1), 3), dtype=dtype)
    qpos_out = qpos

    FREE, BALL = int(JointType.FREE), int(JointType.BALL)
    SLIDE, HINGE = int(JointType.SLIDE), int(JointType.HINGE)

    for lv in meta.per_level:
        ids, par = lv["ids"], lv["par"]
        W = ids.size
        pq, pp = xquat[par], xpos[par]
        quat = _v_quat_mul(pq, m.body_quat[ids])
        pos = pp + _v_rot(m.body_pos[ids], pq)

        for jid, jmask_np, jt in lv["joints"]:
            qa = qposadr[jid]                       # (W,) static
            # contiguous 7-wide qpos window per joint (clipped gather)
            qi = np.minimum(qa[:, None] + np.arange(7), max(m.nq - 1, 0))
            qblk = qpos[qi]                          # (W, 7)
            jp, ja = jnt_pos[jid], jnt_axis[jid]
            q0_1 = qpos0[np.minimum(qa, max(m.nq - 1, 0))]

            anchor_c = pos + _v_rot(jp, quat)
            axis_c = _v_rot(ja, quat)

            is_free = (jt == FREE)[:, None]
            is_ball = (jt == BALL)[:, None]
            is_slide = (jt == SLIDE)[:, None]
            is_hinge = (jt == HINGE)[:, None]

            # HINGE
            qloc_h = _v_axang(ja, qblk[:, 0] - q0_1)
            quat_h = _v_quat_mul(quat, qloc_h)
            pos_h = anchor_c - _v_rot(jp, quat_h)
            # SLIDE
            pos_s = pos + axis_c * (qblk[:, 0] - q0_1)[:, None]
            anchor_s = pos_s + _v_rot(jp, quat)
            # BALL
            qloc_b = _v_norm(qblk[:, :4])
            quat_b = _v_quat_mul(quat, qloc_b)
            pos_b = anchor_c - _v_rot(jp, quat_b)
            # FREE
            pos_f = qblk[:, :3]
            quat_f = _v_norm(qblk[:, 3:7])

            new_quat = jnp.where(is_free, quat_f,
                                 jnp.where(is_ball, quat_b,
                                           jnp.where(is_hinge, quat_h, quat)))
            new_pos = jnp.where(is_free, pos_f,
                                jnp.where(is_ball, pos_b,
                                          jnp.where(is_hinge, pos_h,
                                                    jnp.where(is_slide, pos_s,
                                                              pos))))
            anch = jnp.where(is_free, new_pos,
                             jnp.where(is_slide, anchor_s, anchor_c))
            axv = jnp.where(is_free, ja, axis_c)

            jmask = jnp.asarray(jmask_np)
            quat = jnp.where(jmask[:, None], new_quat, quat)
            pos = jnp.where(jmask[:, None], new_pos, pos)
            # scatter joint frames (masked lanes -> OOB index, dropped)
            jsc = np.where(jmask_np, jid, m.njnt)
            xanchor = xanchor.at[jsc].set(anch, mode="drop")
            xaxis = xaxis.at[jsc].set(axv, mode="drop")
            # qpos renormalization writes: FREE quat at qadr+3, BALL at qadr
            qn_mask = (jt == FREE) | (jt == BALL)
            off = np.where(jt == FREE, 3, 0)
            qidx = np.where((qn_mask & jmask_np)[:, None],
                            qa[:, None] + off[:, None] + np.arange(4), m.nq)
            qvals = jnp.where(is_free, quat_f, qloc_b)
            qpos_out = qpos_out.at[qidx].set(qvals, mode="drop")

        if lv["has_mocap"]:
            mocap = lv["mocap"]
            mc = np.maximum(mocap, 0)
            is_mocap = jnp.asarray(mocap >= 0)[:, None]
            pos = jnp.where(is_mocap, d.mocap_pos[mc], pos)
            quat = jnp.where(is_mocap, _v_norm(d.mocap_quat[mc]), quat)

        xquat = xquat.at[ids].set(_v_norm(quat))
        xpos = xpos.at[ids].set(pos)

    xmat = _v_quat_to_mat(xquat)
    xipos = xpos + _v_rot(m.body_ipos, xquat)
    ximat = xmat @ _v_quat_to_mat(m.body_iquat)

    if not m.njnt:
        xanchor = jnp.zeros((0, 3), dtype=dtype)
        xaxis = jnp.zeros((0, 3), dtype=dtype)

    gb = np.array(m.geom_bodyid, dtype=np.int32) if m.ngeom else np.zeros(0, np.int32)
    geom_xpos = xpos[gb] + jnp.einsum("bij,bj->bi", xmat[gb], m.geom_pos)
    geom_xmat = xmat[gb] @ _v_quat_to_mat(m.geom_quat)
    sb = np.array(m.site_bodyid, dtype=np.int32) if m.nsite else np.zeros(0, np.int32)
    site_xpos = xpos[sb] + jnp.einsum("bij,bj->bi", xmat[sb], m.site_pos)
    site_xmat = xmat[sb] @ _v_quat_to_mat(m.site_quat)

    return d.replace(qpos=qpos_out, xpos=xpos, xquat=xquat, xmat=xmat,
                     xipos=xipos, ximat=ximat, xanchor=xanchor, xaxis=xaxis,
                     geom_xpos=geom_xpos, geom_xmat=geom_xmat,
                     site_xpos=site_xpos, site_xmat=site_xmat)


@functools.lru_cache(maxsize=128)
def _dof_meta(jnt_type, jnt_dofadr, dof_jntid):
    """Per-dof static classification for the vectorized cdof build.

    kind: 0 = free translation, 1 = rotation about body-frame axis (free rot /
    ball), 2 = slide, 3 = hinge. axno: axis index for kinds 0/1."""
    nv = len(dof_jntid)
    kind = np.zeros(nv, dtype=np.int32)
    axno = np.zeros(nv, dtype=np.int32)
    for v in range(nv):
        j = dof_jntid[v]
        t = jnt_type[j]
        off = v - jnt_dofadr[j]
        if t == int(JointType.FREE):
            if off < 3:
                kind[v], axno[v] = 0, off
            else:
                kind[v], axno[v] = 1, off - 3
        elif t == int(JointType.BALL):
            kind[v], axno[v] = 1, off
        elif t == int(JointType.SLIDE):
            kind[v] = 2
        else:
            kind[v] = 3
    onehot = np.eye(3, dtype=np.float64)[axno]  # (nv, 3)
    return kind, onehot


def com_pos(m: Model, d: Data) -> Data:
    """mj_comPos: subtree com, com-based inertia (cinert) and dof axes (cdof)."""
    dtype = d.qpos.dtype
    meta = _kin_meta(m)
    # subtree com: reverse level-order scatter-add of mass*xipos
    wsum = m.body_mass[:, None] * d.xipos
    for lv in reversed(meta.per_level):
        wsum = wsum.at[lv["par"]].add(wsum[lv["ids"]])
    subtree_com = wsum / jnp.maximum(m.body_subtreemass, mmath.MINVAL)[:, None]
    subtree_com = subtree_com.at[0].set(
        jnp.where(m.body_subtreemass[0] > mmath.MINVAL, subtree_com[0],
                  jnp.zeros(3, dtype=dtype)))

    # cinert: body inertia about subtree_com[rootid], world orientation
    rootid = np.array(m.body_rootid, dtype=np.int32)
    ref = subtree_com[rootid]  # (nbody, 3)

    def one_cinert(ximat, inertia, massb, xipos, refb):
        I_world = ximat @ jnp.diag(inertia) @ ximat.T
        return mmath.inert_from_mass_com_fullinertia(massb, I_world, xipos - refb)

    cinert = jax.vmap(one_cinert)(d.ximat, m.body_inertia, m.body_mass,
                                  d.xipos, ref)

    # cdof: fully vectorized over nv via static per-dof kind/axis tables
    if m.nv:
        kind, onehot = _dof_meta(m.jnt_type, m.jnt_dofadr, m.dof_jntid)
        db = np.asarray(m.dof_bodyid, dtype=np.int32)
        dj = np.asarray(m.dof_jntid, dtype=np.int32)
        oh = jnp.asarray(onehot, dtype=dtype)
        offset = ref[db] - d.xanchor[dj]            # (nv, 3)
        rot_axis = jnp.einsum("vij,vj->vi", d.xmat[db], oh)
        jaxis = d.xaxis[dj]
        k = kind[:, None]
        ang = jnp.where(k == 1, rot_axis, jnp.where(k == 3, jaxis, 0.0))
        lin = jnp.where(k == 0, oh,
                        jnp.where(k == 2, jaxis, jnp.cross(ang, offset)))
        cdof = jnp.concatenate([ang, lin], axis=1)
    else:
        cdof = jnp.zeros((0, 6), dtype=dtype)
    return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


# ---------------------------------------------------------------------------
# mj_comVel
# ---------------------------------------------------------------------------

def com_vel(m: Model, d: Data) -> Data:
    """cvel + cdof_dot via a level-order sweep. Per level each body's joints
    are folded in joint-major order; all four joint types are computed
    vectorized and mask-selected (matching the sequential per-joint semantics
    of engine_core_smooth.c mj_comVel)."""
    dtype = d.qpos.dtype
    meta = _kin_meta(m)
    cvel = jnp.zeros((m.nbody, 6), dtype=dtype)
    cdof_dot = jnp.zeros((max(m.nv, 1), 6), dtype=dtype)
    dofadr = (np.asarray(m.jnt_dofadr, dtype=np.int32)
              if m.njnt else np.zeros(0, np.int32))
    FREE, BALL = int(JointType.FREE), int(JointType.BALL)

    for lv in meta.per_level:
        ids, par = lv["ids"], lv["par"]
        v = cvel[par]                                 # (W, 6)
        for jid, jmask_np, jt in lv["joints"]:
            adr = dofadr[jid]
            didx = np.minimum(adr[:, None] + np.arange(6), max(m.nv - 1, 0))
            blk = d.cdof[didx]                        # (W, 6, 6)
            qv = d.qvel[didx]                         # (W, 6)
            jnv = np.select([jt == FREE, jt == BALL], [6, 3], 1)
            # free: translation dofs first, then rotation; others: all dofs
            trans_mask = ((jt == FREE)[:, None]
                          & (np.arange(6)[None, :] < 3))        # (W, 6)
            rot_mask = (np.arange(6)[None, :] < jnv[:, None]) & ~trans_mask
            tm = jnp.asarray(trans_mask, dtype=dtype)
            rm = jnp.asarray(rot_mask, dtype=dtype)
            vmid = v + jnp.einsum("wi,wij->wj", qv * tm, blk)
            # cdof_dot rows: motion_cross(velocity-so-far, cdof row); for free
            # joints the rotation rows see the translation contribution (vmid)
            dots = jax.vmap(lambda vb, rows: jax.vmap(
                lambda r: mmath.motion_cross(vb, r))(rows))(vmid, blk)
            dot_mask = rot_mask & jmask_np[:, None]
            dsc = np.where(dot_mask,
                           np.minimum(adr[:, None] + np.arange(6), 2**30),
                           max(m.nv, 1))
            cdof_dot = cdof_dot.at[dsc].set(
                jnp.where(jnp.asarray(dot_mask)[:, :, None], dots, 0.0),
                mode="drop")
            vout = vmid + jnp.einsum("wi,wij->wj", qv * rm, blk)
            v = jnp.where(jnp.asarray(jmask_np)[:, None], vout, v)
        cvel = cvel.at[ids].set(v)

    if not m.nv:
        cdof_dot = jnp.zeros((0, 6), dtype=dtype)
    return d.replace(cvel=cvel, cdof_dot=cdof_dot)


# ---------------------------------------------------------------------------
# mj_crb + dense factorization
# ---------------------------------------------------------------------------

def crb(m: Model, d: Data) -> Data:
    """Composite rigid body: dense qM = J^T I J specialized by topology masks."""
    meta = _kin_meta(m)
    crb_inert = d.cinert
    for lv in reversed(meta.per_level):
        crb_inert = crb_inert.at[lv["par"]].add(crb_inert[lv["ids"]])

    if m.nv == 0:
        return d

    dof_bodyid = np.array(m.dof_bodyid, dtype=np.int32)
    # F[i] = crb[body(i)] * cdof[i]
    F = jax.vmap(mmath.inert_vec_mul)(crb_inert[dof_bodyid], d.cdof)
    # G[i, j] = F[i] . cdof[j]  — one dense (nv,6)@(6,nv) matmul.
    # HIGHEST precision: XLA-TPU's default lowers f32 matmuls to single-pass
    # bf16; the mass matrix must stay accurately positive definite (its
    # smallest eigenvalues bound the Newton Hessian's) — measured: bf16
    # assembly made the humanoid impact Hessian indefinite -> Cholesky NaN
    G = jnp.matmul(F, d.cdof.T, precision=jax.lax.Precision.HIGHEST)
    amask = dof_ancestor_mask(m)             # j ancestor-or-equal of i
    lower = jnp.asarray(amask)               # includes diagonal
    strict = jnp.asarray(amask & ~np.eye(m.nv, dtype=bool))
    qM = G * lower + (G * strict).T
    qM = qM + jnp.diag(m.dof_armature)
    return d.replace(qM=qM)


def solve_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
    """M^{-1} x (mj_solveM) — fused batched Cholesky solve on TPU."""
    from mujoco_ros_pkgs_tpu.ops import linalg_tpu
    return linalg_tpu.psd_solve(d.qM, x)


def mul_m(m: Model, d: Data, x: jax.Array) -> jax.Array:
    return d.qM @ x


# ---------------------------------------------------------------------------
# mj_rne (flg_acc=0): qfrc_bias
# ---------------------------------------------------------------------------

def rne(m: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    meta = _kin_meta(m)
    gravity = jnp.where(
        bool(m.opt.disableflags & DisableBit.GRAVITY), 0.0, 1.0) * m.opt.gravity
    cacc0 = jnp.concatenate([jnp.zeros(3, dtype=dtype), -gravity.astype(dtype)])

    maxdof = max([n for n in m.body_dofnum] + [1])
    dofadr = np.asarray(m.body_dofadr, dtype=np.int32)
    dofnum = np.asarray(m.body_dofnum, dtype=np.int32)

    cacc = jnp.zeros((m.nbody, 6), dtype=dtype).at[0].set(cacc0)
    for lv in meta.per_level:
        ids, par = lv["ids"], lv["par"]
        a = cacc[par]
        didx = np.minimum(dofadr[ids][:, None] + np.arange(maxdof),
                          max(m.nv - 1, 0))
        mask = jnp.asarray(np.arange(maxdof)[None, :] < dofnum[ids][:, None],
                           dtype=dtype)
        a = a + jnp.einsum("wi,wij->wj", d.qvel[didx] * mask, d.cdof_dot[didx])
        cacc = cacc.at[ids].set(a)

    def one_cfrc(ci, ca, cv):
        return (mmath.inert_vec_mul(ci, ca)
                + mmath.force_cross(cv, mmath.inert_vec_mul(ci, cv)))

    cfrc = jax.vmap(one_cfrc)(d.cinert, cacc, d.cvel)
    for lv in reversed(meta.per_level):
        cfrc = cfrc.at[lv["par"]].add(cfrc[lv["ids"]])

    if m.nv:
        dof_bodyid = np.array(m.dof_bodyid, dtype=np.int32)
        qfrc_bias = jnp.einsum("ij,ij->i", d.cdof, cfrc[dof_bodyid])
    else:
        qfrc_bias = jnp.zeros(0, dtype=dtype)
    return d.replace(qfrc_bias=qfrc_bias)


# ---------------------------------------------------------------------------
# tendons (fixed), transmission, passive, actuation
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=128)
def _tendon_meta(tendon_adr, tendon_num, wrap_type, wrap_objid,
                 wrap_sidesite, wrap_divisor, jnt_qposadr, jnt_dofadr):
    """Static tendon structure.

    Fixed tendons (JOINT wraps) become segment-sum tables; spatial tendons
    (SITE/SPHERE/CYLINDER/PULLEY wraps, mj_tendon's path walk) become a
    per-tendon list of path ops the traced builder unrolls."""
    from mujoco_ros_pkgs_tpu.core.types import WrapType

    fixed_wraps = []   # (wrap index, tendon, qposadr, dofadr)
    spatial = {}       # tendon id -> list of ('site', sid) | ('geom', gid,
    #                     sidesite) | ('pulley', divisor)
    for t, (a, n) in enumerate(zip(tendon_adr, tendon_num)):
        kinds = [wrap_type[w] for w in range(a, a + n)]
        if all(k == int(WrapType.JOINT) for k in kinds):
            for w in range(a, a + n):
                fixed_wraps.append((w, t, jnt_qposadr[wrap_objid[w]],
                                    jnt_dofadr[wrap_objid[w]]))
            continue
        path = []
        for w in range(a, a + n):
            k = wrap_type[w]
            if k == int(WrapType.SITE):
                path.append(("site", wrap_objid[w]))
            elif k in (int(WrapType.SPHERE), int(WrapType.CYLINDER)):
                path.append(("geom", wrap_objid[w], wrap_sidesite[w],
                             k == int(WrapType.SPHERE)))
            elif k == int(WrapType.PULLEY):
                path.append(("pulley", wrap_divisor[w]))
            else:
                raise ValueError(
                    f"tendon {t}: cannot mix joint wraps with a spatial path")
        # structural validation (mirrors the MJCF compiler's rules)
        if not path or path[0][0] != "site" or path[-1][0] != "site":
            raise ValueError(f"spatial tendon {t} must start and end at sites")
        for i, op in enumerate(path):
            if op[0] == "geom":
                if (path[i - 1][0] != "site" or i + 1 >= len(path)
                        or path[i + 1][0] != "site"):
                    raise ValueError(
                        f"spatial tendon {t}: wrap geoms must be bracketed "
                        f"by sites")
        spatial[t] = path
    if fixed_wraps:
        widx, seg, qadr, dadr = (np.asarray(x, dtype=np.int32)
                                 for x in zip(*fixed_wraps))
    else:
        widx = seg = qadr = dadr = np.zeros(0, dtype=np.int32)
    return widx, seg, qadr, dadr, spatial


def _spatial_tendon(m: Model, d: Data, path):
    """One spatial tendon's (length, J row): walk the static path, summing
    straight segments / wrap geodesics (ops/wrap.py), dividing each branch by
    its pulley divisor; J row via point-jacobian differences u·(Jb - Ja)
    (mj_tendon's formulation — arc segments ride the wrap body and contribute
    nothing between their own tangent points)."""
    from mujoco_ros_pkgs_tpu.ops import wrap as wrap_mod

    dtype = d.qpos.dtype
    L = jnp.zeros((), dtype=dtype)
    row = jnp.zeros(m.nv, dtype=dtype)
    divisor = 1.0

    # resolve points lazily: (world position, static body id)
    def site_point(sid):
        return d.site_xpos[sid], m.site_bodyid[sid]

    def add_segment(pa, ba, pb, bb, div):
        nonlocal L, row
        diff = pb - pa
        seg = jnp.sqrt(jnp.maximum(diff @ diff, mmath.MINVAL ** 2))
        u = diff / seg
        L = L + seg / div
        ja, _ = jac(m, d, pa, ba)
        jb, _ = jac(m, d, pb, bb)
        row = row + ((jb - ja) @ u) / div

    i = 0
    prev = None   # (point, body) pending connection
    while i < len(path):
        op = path[i]
        if op[0] == "pulley":
            divisor = op[1]
            prev = None          # pulley breaks the chain into branches
            i += 1
            continue
        if op[0] == "site":
            pt = site_point(op[1])
            if prev is not None:
                add_segment(prev[0], prev[1], pt[0], pt[1], divisor)
            prev = pt
            i += 1
            continue
        # geom wrap between prev site and the next site
        _, gid, ssid, is_sphere = op
        nxt = site_point(path[i + 1][1])
        gpos, gmat = d.geom_xpos[gid], d.geom_xmat[gid]
        r = m.geom_size[gid][0]
        side = (d.site_xpos[ssid] if ssid >= 0
                else jnp.zeros(3, dtype=dtype))
        t0, t1, arc, _ = wrap_mod.wrap_geom(prev[0], nxt[0], gpos, gmat, r,
                                            is_sphere, side, ssid >= 0)
        gb = m.geom_bodyid[gid]
        add_segment(prev[0], prev[1], t0, gb, divisor)
        L = L + arc / divisor     # arc endpoints ride the wrap body: no J term
        add_segment(t1, gb, nxt[0], nxt[1], divisor)
        prev = nxt
        i += 2
    return L, row


def tendon(m: Model, d: Data) -> Data:
    if m.ntendon == 0:
        return d
    widx, seg, qadr, dadr, spatial = _tendon_meta(
        m.tendon_adr, m.tendon_num, m.wrap_type, m.wrap_objid,
        m.wrap_sidesite, m.wrap_divisor, m.jnt_qposadr, m.jnt_dofadr)
    lengths = jnp.zeros(m.ntendon, dtype=d.qpos.dtype)
    ten_J = jnp.zeros((m.ntendon, m.nv), dtype=d.qpos.dtype)
    if widx.size:
        coef = m.wrap_prm[widx]
        lengths = lengths + jax.ops.segment_sum(
            coef * d.qpos[qadr], seg, num_segments=m.ntendon)
        ten_J = ten_J.at[seg, dadr].add(coef)
    for t, path in spatial.items():
        L, row = _spatial_tendon(m, d, path)
        lengths = lengths.at[t].set(L)
        ten_J = ten_J.at[t].set(row)
    return d.replace(ten_length=lengths, ten_J=ten_J,
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


@functools.lru_cache(maxsize=128)
def _trn_meta(actuator_trntype, actuator_trnid, jnt_type, jnt_qposadr,
              jnt_dofadr):
    """Static actuator groups for the vectorized transmission build."""
    groups = {"jnt1": [], "jntb": [], "jntf": [], "ten": [], "site": []}
    for i, trn in enumerate(actuator_trntype):
        tid = actuator_trnid[i][0]
        if trn in (int(TrnType.JOINT), int(TrnType.JOINTINPARENT)):
            jt = jnt_type[tid]
            if jt in (int(JointType.SLIDE), int(JointType.HINGE)):
                groups["jnt1"].append((i, jnt_qposadr[tid], jnt_dofadr[tid]))
            elif jt == int(JointType.BALL):
                groups["jntb"].append((i, jnt_dofadr[tid]))
            else:
                groups["jntf"].append((i, jnt_dofadr[tid]))
        elif trn == int(TrnType.TENDON):
            groups["ten"].append((i, tid))
        elif trn == int(TrnType.SITE):
            groups["site"].append((i, tid))
        else:
            raise NotImplementedError(f"transmission type {trn}")
    return {k: (np.asarray(v, dtype=np.int32) if v
                else np.zeros((0, 2), dtype=np.int32))
            for k, v in groups.items()}


def transmission(m: Model, d: Data) -> Data:
    if m.nu == 0:
        return d
    dtype = d.qpos.dtype
    g = _trn_meta(m.actuator_trntype, m.actuator_trnid, m.jnt_type,
                  m.jnt_qposadr, m.jnt_dofadr)
    gear = m.actuator_gear
    length = jnp.zeros(m.nu, dtype=dtype)
    moment = jnp.zeros((m.nu, m.nv), dtype=dtype)

    if len(g["jnt1"]):
        i, qa, va = g["jnt1"].T
        length = length.at[i].set(d.qpos[qa] * gear[i, 0])
        moment = moment.at[i, va].set(gear[i, 0])
    if len(g["jntb"]):
        i, va = g["jntb"].T
        moment = moment.at[i[:, None], va[:, None] + np.arange(3)].set(
            gear[i, :3])
    if len(g["jntf"]):
        i, va = g["jntf"].T
        moment = moment.at[i[:, None], va[:, None] + np.arange(6)].set(
            gear[i, :6])
    if len(g["ten"]):
        i, t = g["ten"].T
        length = length.at[i].set(d.ten_length[t] * gear[i, 0])
        moment = moment.at[i].set(d.ten_J[t] * gear[i, 0][:, None])
    if len(g["site"]):
        i, s = g["site"].T
        sb = np.asarray(m.site_bodyid, dtype=np.int32)[s]
        maskj = jnp.asarray(body_dof_mask(m)[:, sb].T, dtype=dtype)  # (W, nv)
        offset = d.site_xpos[s] - d.subtree_com[
            np.asarray(m.body_rootid, dtype=np.int32)[sb]]
        jacp = (d.cdof[None, :, 3:]
                + jnp.cross(d.cdof[None, :, :3],
                            offset[:, None, :])) * maskj[:, :, None]
        jacr = d.cdof[None, :, :3] * maskj[:, :, None]
        wf = jnp.einsum("wij,wj->wi", d.site_xmat[s], gear[i, :3])
        wt = jnp.einsum("wij,wj->wi", d.site_xmat[s], gear[i, 3:])
        rows = (jnp.einsum("wvi,wi->wv", jacp, wf)
                + jnp.einsum("wvi,wi->wv", jacr, wt))
        moment = moment.at[i].set(rows)

    return d.replace(actuator_length=length, actuator_moment=moment,
                     actuator_velocity=moment @ d.qvel)


@functools.lru_cache(maxsize=128)
def _spring_meta(jnt_type, jnt_qposadr, jnt_dofadr):
    """Static joint groups for the vectorized passive-spring build."""
    g1, gb, gf = [], [], []
    for j, t in enumerate(jnt_type):
        row = (j, jnt_qposadr[j], jnt_dofadr[j])
        if t in (int(JointType.SLIDE), int(JointType.HINGE)):
            g1.append(row)
        elif t == int(JointType.BALL):
            gb.append(row)
        else:
            gf.append(row)
    return tuple(np.asarray(x, dtype=np.int32) if x
                 else np.zeros((0, 3), dtype=np.int32)
                 for x in (g1, gb, gf))


def passive(m: Model, d: Data) -> Data:
    dtype = d.qpos.dtype
    if m.nv == 0:
        return d
    if m.opt.disableflags & DisableBit.PASSIVE:
        return d.replace(qfrc_passive=jnp.zeros(m.nv, dtype=dtype))
    qfrc = -m.dof_damping * d.qvel
    if m.njnt:
        g1, gb, gf = _spring_meta(m.jnt_type, m.jnt_qposadr, m.jnt_dofadr)
        if len(g1):
            j, qa, va = g1.T
            qfrc = qfrc.at[va].add(
                -m.jnt_stiffness[j] * (d.qpos[qa] - m.qpos_spring[qa]))
        if len(gb):
            j, qa, va = gb.T
            dif = _v_quat_sub(d.qpos[qa[:, None] + np.arange(4)],
                              m.qpos_spring[qa[:, None] + np.arange(4)])
            qfrc = qfrc.at[va[:, None] + np.arange(3)].add(
                -m.jnt_stiffness[j][:, None] * dif)
        if len(gf):
            j, qa, va = gf.T
            stiff = m.jnt_stiffness[j][:, None]
            qfrc = qfrc.at[va[:, None] + np.arange(3)].add(
                -stiff * (d.qpos[qa[:, None] + np.arange(3)]
                          - m.qpos_spring[qa[:, None] + np.arange(3)]))
            dif = _v_quat_sub(d.qpos[qa[:, None] + 3 + np.arange(4)],
                              m.qpos_spring[qa[:, None] + 3 + np.arange(4)])
            qfrc = qfrc.at[va[:, None] + 3 + np.arange(3)].add(-stiff * dif)
    if m.ntendon:
        # spring with optional deadband [lengthspring0, lengthspring1]
        low = jnp.where(m.tendon_lengthspring[:, 0] < 0, m.tendon_length0,
                        m.tendon_lengthspring[:, 0])
        high = jnp.where(m.tendon_lengthspring[:, 1] < 0, m.tendon_length0,
                         m.tendon_lengthspring[:, 1])
        L = d.ten_length
        displ = jnp.where(L > high, high - L,
                          jnp.where(L < low, low - L, 0.0))
        frc = m.tendon_stiffness * displ - m.tendon_damping * d.ten_velocity
        qfrc = qfrc + d.ten_J.T @ frc
    if m.has_fluid:
        qfrc = qfrc + _fluid_qfrc(m, d)
    return d.replace(qfrc_passive=qfrc)


def _fluid_qfrc(m: Model, d: Data) -> jax.Array:
    """Fluid forces from opt.density / opt.viscosity / opt.wind
    (engine_passive.c mj_inertiaBoxFluidModel + mj_ellipsoidFluidModel):
    bodies whose geoms opt into fluidshape="ellipsoid" get the per-geom
    equivalent-ellipsoid model (added mass, Kutta/Magnus lift, anisotropic
    drag); all other bodies get the legacy inertia-box model. Fully
    vectorized; gated by the static m.has_fluid flag."""
    dtype = d.qpos.dtype
    # static split: a body with >=1 fluid-active geom uses the ellipsoid
    # model for ALL its geoms and is excluded from the inertia-box path
    ell_body = np.zeros(m.nbody, dtype=bool)
    for g, a in enumerate(m.geom_fluid_active):
        if a:
            ell_body[m.geom_bodyid[g]] = True
    mass = jnp.maximum(m.body_mass, mmath.MINVAL).astype(dtype)
    I = m.body_inertia.astype(dtype)                       # (nbody, 3)
    # equivalent inertia-box half-sizes: Ij + Ik - Ii = (2/3) m box_i^2
    Isum = jnp.sum(I, axis=1, keepdims=True)
    box = jnp.sqrt(jnp.maximum(Isum - 2 * I, mmath.MINVAL)
                   / mass[:, None] * 6.0) / 2.0            # (nbody, 3)

    # body com 6D velocity in the inertia (ximat) frame, wind-relative
    rootid = np.array(m.body_rootid, dtype=np.int32)
    ref = d.subtree_com[rootid]
    ang_w = d.cvel[:, :3]
    lin_w = d.cvel[:, 3:] + jnp.cross(ang_w, d.xipos - ref)
    # rotate world -> local (ximat columns are local axes): v_l = R^T v_w
    ang = jnp.einsum("bij,bi->bj", d.ximat, ang_w)
    lin = jnp.einsum("bij,bi->bj", d.ximat,
                     lin_w - m.opt.wind.astype(dtype)[None, :])

    lfrc_ang = jnp.zeros_like(ang)
    lfrc_lin = jnp.zeros_like(lin)
    viscosity = m.opt.viscosity.astype(dtype)
    density = m.opt.density.astype(dtype)
    # viscous resistance: equivalent sphere of the mean box diameter
    diam = jnp.mean(box, axis=1) * 2.0                     # (nbody,)
    pi = jnp.asarray(np.pi, dtype=dtype)
    lfrc_ang = lfrc_ang - pi * diam[:, None] ** 3 * viscosity * ang
    lfrc_lin = lfrc_lin - 3.0 * pi * diam[:, None] * viscosity * lin
    # quadratic drag: projected face areas / plate integrals of the box
    b0, b1, b2 = box[:, 0], box[:, 1], box[:, 2]
    area = jnp.stack([b1 * b2, b0 * b2, b0 * b1], axis=1)  # faces seen by v_i
    lfrc_lin = lfrc_lin - 2.0 * density * area * jnp.abs(lin) * lin
    plate = jnp.stack([b0 * (b1 ** 4 + b2 ** 4),
                       b1 * (b0 ** 4 + b2 ** 4),
                       b2 * (b0 ** 4 + b1 ** 4)], axis=1)
    lfrc_ang = lfrc_ang - 0.5 * density * plate * jnp.abs(ang) * ang

    # rotate back to world, apply at body com; world body and ellipsoid-
    # model bodies excluded (mj_passive skips massless bodies too)
    frc_w = jnp.einsum("bij,bj->bi", d.ximat, lfrc_lin)
    trq_w = jnp.einsum("bij,bj->bi", d.ximat, lfrc_ang)
    live = jnp.asarray((np.arange(m.nbody) > 0) & ~ell_body,
                       dtype=dtype)[:, None]
    xfrc = jnp.concatenate([frc_w, trq_w], axis=1) * live  # (nbody, 6)
    if ell_body.any():
        xfrc = xfrc + _fluid_ellipsoid_xfrc(m, d)
    return body_frc_accumulate(m, d, xfrc)


def _fluid_ellipsoid_xfrc(m: Model, d: Data) -> jax.Array:
    """Per-geom equivalent-ellipsoid fluid forces (engine_passive.c
    mj_ellipsoidFluidModel / mj_addedMassForces / mj_viscousForces),
    vectorized over the statically-known fluid-active geoms and returned as
    per-body [force(3), torque(3)] at the body com (world frame), the
    layout body_frc_accumulate consumes. The 12 packed coefficients come
    from load time (core/mjcf.py _fluid_ellipsoid_coefs)."""
    dtype = d.qpos.dtype
    act = np.array([g for g, a in enumerate(m.geom_fluid_active) if a],
                   dtype=np.int32)
    bidx = np.array([m.geom_bodyid[g] for g in act], dtype=np.int32)
    rootid = np.array(m.body_rootid, dtype=np.int32)[bidx]

    # equivalent-ellipsoid semiaxes (runtime readGeomSemiAxes convention)
    sem = []
    for g in act:
        s = m.geom_size[int(g)].astype(dtype)
        t = m.geom_type[int(g)]
        if t == int(GeomType.SPHERE):
            sem.append(jnp.stack([s[0], s[0], s[0]]))
        elif t == int(GeomType.CAPSULE):
            sem.append(jnp.stack([s[0], s[0], s[1] + s[0]]))
        elif t == int(GeomType.CYLINDER):
            sem.append(jnp.stack([s[0], s[0], s[1]]))
        else:
            sem.append(s)
    semi = jnp.stack(sem)                                  # (na, 3)
    gf = m.geom_fluid[act].astype(dtype)                   # (na, 12)
    blunt, slender, angd = gf[:, 1], gf[:, 2], gf[:, 3]
    kutta, magnus = gf[:, 4], gf[:, 5]
    vmass, vinertia = gf[:, 6:9], gf[:, 9:12]

    # geom-frame 6D velocity of the geom origin, wind-relative
    ref = d.subtree_com[rootid]
    R = d.geom_xmat[act]                                   # (na, 3, 3)
    p = d.geom_xpos[act]
    ang_w = d.cvel[bidx, :3]
    lin_w = d.cvel[bidx, 3:] + jnp.cross(ang_w, p - ref)
    ang = jnp.einsum("gij,gi->gj", R, ang_w)
    lin = jnp.einsum("gij,gi->gj", R,
                     lin_w - m.opt.wind.astype(dtype)[None, :])

    density = m.opt.density.astype(dtype)
    viscosity = m.opt.viscosity.astype(dtype)
    pi = jnp.asarray(np.pi, dtype=dtype)

    # added-mass forces: gyroscopic coupling of the virtual momenta
    plin = density * vmass * lin
    pang = density * vinertia * ang
    f_l = jnp.cross(plin, ang)
    t_l = jnp.cross(plin, lin) + jnp.cross(pang, ang)

    # viscous + lift forces
    vol = 4.0 / 3.0 * pi * jnp.prod(semi, axis=1)
    d_max = jnp.max(semi, axis=1)
    d_min = jnp.min(semi, axis=1)
    d_mid = jnp.sum(semi, axis=1) - d_max - d_min
    a_max = pi * d_max * d_mid
    magnus_f = jnp.cross(ang, lin) * (magnus * density * vol)[:, None]
    s12 = semi[:, 1] * semi[:, 2]
    s20 = semi[:, 2] * semi[:, 0]
    s01 = semi[:, 0] * semi[:, 1]
    faces = jnp.stack([s12, s20, s01], axis=1)             # (na, 3)
    proj_denom = jnp.sum(faces ** 4 * lin ** 2, axis=1)
    proj_num = jnp.sum(faces ** 2 * lin ** 2, axis=1)
    # grad-safe sqrt: ratio is 0 only at lin == 0, where the force is 0
    ratio = proj_denom / jnp.maximum(proj_num, mmath.MINVAL)
    a_proj = pi * jnp.sqrt(jnp.maximum(ratio, mmath.MINVAL ** 2))
    norm_v = faces ** 2 * lin                              # unnormalized
    lin_norm = mmath.norm_safe(lin, axis=1)
    cos_alpha = proj_num / jnp.maximum(lin_norm * proj_denom, mmath.MINVAL)
    kutta_circ = jnp.cross(norm_v, lin) \
        * (kutta * density * cos_alpha * a_proj)[:, None]
    kutta_f = jnp.cross(kutta_circ, lin)
    # Stokes-flow (linear) drag of the equivalent sphere
    eq_d = 2.0 / 3.0 * jnp.sum(semi, axis=1)
    i_max = 8.0 / 15.0 * pi * d_mid * d_max ** 4
    ii = 8.0 / 15.0 * pi * semi * jnp.stack(
        [jnp.maximum(semi[:, 1], semi[:, 2]),
         jnp.maximum(semi[:, 2], semi[:, 0]),
         jnp.maximum(semi[:, 0], semi[:, 1])], axis=1) ** 4
    mom_visc = ang * (angd[:, None] * ii
                      + slender[:, None] * (i_max[:, None] - ii))
    drag_lin = viscosity * 3.0 * pi * eq_d \
        + density * lin_norm * (a_proj * blunt
                                + slender * (a_max - a_proj))
    drag_ang = viscosity * pi * eq_d ** 3 \
        + density * mmath.norm_safe(mom_visc, axis=1)
    t_l = t_l - drag_ang[:, None] * ang
    f_l = f_l + magnus_f + kutta_f - drag_lin[:, None] * lin

    # rotate to world, move the application point from the geom origin to
    # the body com, accumulate per body (mj_applyFT at geom_xpos)
    f_w = jnp.einsum("gij,gj->gi", R, f_l)
    t_w = jnp.einsum("gij,gj->gi", R, t_l) \
        + jnp.cross(p - d.xipos[bidx], f_w)
    xfrc = jnp.zeros((m.nbody, 6), dtype=dtype)
    xfrc = xfrc.at[bidx, :3].add(f_w)
    xfrc = xfrc.at[bidx, 3:].add(t_w)
    return xfrc


@functools.lru_cache(maxsize=128)
def _act_clamp_meta(jnt_actfrclimited, jnt_dofadr, nv):
    """Per-dof total-actuator-force clamp mask (first dof of limited joints,
    matching mj_fwdActuation's per-joint clamp)."""
    mask = np.zeros(nv, dtype=bool)
    jid = np.zeros(nv, dtype=np.int32)
    for j, lim in enumerate(jnt_actfrclimited):
        if lim:
            mask[jnt_dofadr[j]] = True
            jid[jnt_dofadr[j]] = j
    return mask, jid


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
    # activation dynamics, vectorized over actuators via static type masks
    dyn = np.asarray(m.actuator_dyntype, dtype=np.int32)
    actadr = np.asarray(m.actuator_actadr, dtype=np.int32)
    has_act = dyn != int(DynType.NONE)
    if m.na:
        a_g = d.act[np.where(has_act, actadr, 0).clip(0, m.na - 1)]
        inp = jnp.where(jnp.asarray(has_act), a_g, ctrl)
        ad = jnp.where(jnp.asarray(dyn == int(DynType.INTEGRATOR)), ctrl,
                       (ctrl - a_g) / jnp.maximum(m.actuator_dynprm[:, 0],
                                                  mmath.MINVAL))
        if (dyn == int(DynType.MUSCLE)).any():
            from mujoco_ros_pkgs_tpu.ops import muscle as muscle_mod
            ad = jnp.where(jnp.asarray(dyn == int(DynType.MUSCLE)),
                           muscle_mod.dynamics(ctrl, a_g, m.actuator_dynprm),
                           ad)
        act_dot = jnp.zeros(m.na + 1, dtype=dtype)
        act_dot = act_dot.at[np.where(has_act, actadr, m.na)].set(
            ad.astype(dtype), mode="drop")[:m.na]
    else:
        inp = ctrl
        act_dot = jnp.zeros(0, dtype=dtype)

    gaintype = np.array(m.actuator_gaintype)
    biastype = np.array(m.actuator_biastype)
    L, V = d.actuator_length, d.actuator_velocity
    gp, bp = m.actuator_gainprm, m.actuator_biasprm
    gain = jnp.where(jnp.asarray(gaintype == int(GainType.FIXED)), gp[:, 0],
                     gp[:, 0] + gp[:, 1] * L + gp[:, 2] * V)
    bias = jnp.where(jnp.asarray(biastype == int(BiasType.NONE)), 0.0,
                     bp[:, 0] + bp[:, 1] * L + bp[:, 2] * V)
    if (gaintype == int(GainType.MUSCLE)).any() \
            or (biastype == int(BiasType.MUSCLE)).any():
        from mujoco_ros_pkgs_tpu.ops import muscle as muscle_mod
        gain = jnp.where(jnp.asarray(gaintype == int(GainType.MUSCLE)),
                         muscle_mod.gain(L, V, m.actuator_lengthrange,
                                         m.actuator_acc0, gp),
                         gain)
        bias = jnp.where(jnp.asarray(biastype == int(BiasType.MUSCLE)),
                         muscle_mod.bias(L, m.actuator_lengthrange,
                                         m.actuator_acc0, bp),
                         bias)
    force = gain * inp + bias
    flimited = jnp.asarray(np.array(m.actuator_forcelimited, dtype=bool))
    force = jnp.where(flimited,
                      jnp.clip(force, m.actuator_forcerange[:, 0],
                               m.actuator_forcerange[:, 1]), force)
    qfrc = d.actuator_moment.T @ force

    # clamp total actuator force at joints (jnt_actfrclimited)
    cmask, cjid = _act_clamp_meta(m.jnt_actfrclimited, m.jnt_dofadr, m.nv)
    if cmask.any():
        lo = m.jnt_actfrcrange[cjid, 0]
        hi = m.jnt_actfrcrange[cjid, 1]
        qfrc = jnp.where(jnp.asarray(cmask), jnp.clip(qfrc, lo, hi), qfrc)
    return d.replace(actuator_force=force, qfrc_actuator=qfrc, act_dot=act_dot)


def body_frc_accumulate(m: Model, d: Data, xfrc: jax.Array) -> jax.Array:
    """Map per-body [force(3), torque(3)] at body com (world frame) to qfrc
    (mj_applyFT at xipos for every body, as one J^T contraction)."""
    dtype = d.qpos.dtype
    if m.nv == 0:
        return jnp.zeros(0, dtype=dtype)
    rootid = np.array(m.body_rootid, dtype=np.int32)
    ref = d.subtree_com[rootid]

    def to_spatial(xf, xipos, refb):
        force, torque = xf[:3], xf[3:]
        vec = jnp.concatenate([torque, force])
        return mmath.transform_force(vec, refb, xipos)

    fs = jax.vmap(to_spatial)(xfrc, d.xipos, ref)            # (nbody, 6)
    mask = jnp.asarray(body_dof_mask(m), dtype=dtype)        # (nv, nbody)
    contrib = d.cdof @ fs.T                                  # (nv, nbody)
    return jnp.sum(contrib * mask, axis=1)


def xfrc_accumulate(m: Model, d: Data) -> jax.Array:
    """Map xfrc_applied ([force(3), torque(3)] at body com, world) to qfrc."""
    return body_frc_accumulate(m, d, d.xfrc_applied)


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
