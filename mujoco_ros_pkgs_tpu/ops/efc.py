"""Constraint assembly: efc rows (equality, friction, limits, contacts) with
fixed shapes + masks, and the solref/solimp impedance model.

Mirrors mj_makeConstraint / mj_instantiateEquality / mj_diagApprox semantics,
validated row-by-row against the oracle (tests/test_constraint_parity.py).
Row order: equality, dof friction, tendon friction, joint limits, tendon
limits, contacts — libmujoco's order, so efc arrays are comparable 1:1.

All shapes are static: every potential row exists; inactive rows are masked
(equality via d.eq_active, limits/contacts via distance tests). The Newton
solver (ops/solver.py) consumes this via per-class static row index tuples.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from mujoco_ros_pkgs_tpu.core.types import (
    Data, DisableBit, EqType, JointType, Model,
)
from mujoco_ros_pkgs_tpu.ops import math as mmath
from mujoco_ros_pkgs_tpu.ops import smooth

# impedance clamps (mjMINIMP/mjMAXIMP)
MINIMP, MAXIMP = 0.0001, 0.9999


class RowMeta(NamedTuple):
    """Static per-row classification (hashable, trace-time)."""
    kind: str          # 'eq' | 'fri' | 'lim' | 'con'
    # for 'con': contact slot index and position within the contact
    con_id: int = -1
    con_row: int = -1


@struct.dataclass
class Efc:
    J: jax.Array          # (nefc, nv)
    pos: jax.Array        # (nefc,) constraint violation (mujoco efc_pos)
    margin: jax.Array     # (nefc,)
    D: jax.Array          # (nefc,)
    R: jax.Array          # (nefc,)
    aref: jax.Array       # (nefc,)
    frictionloss: jax.Array  # (nefc,)
    active: jax.Array     # (nefc,) row gate (eq_active / limit dist / contact)
    # elliptic contact grouping (static): list of (base_row, dim) per contact
    con_base: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    con_dim: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    kinds: Tuple[str, ...] = struct.field(pytree_node=False, default=())
    con_mu: jax.Array = None      # (ncon_slots, 5) friction of each contact
    con_active: jax.Array = None  # (ncon_slots,)

    # ---- UNPERMUTED block view (the large-model solver path) ----
    # The flat canonical arrays above exist for row-for-row oracle parity,
    # sensors, and the small-model fused kernel. The Newton/CG solvers for
    # contact-rich scenes consume ONLY this block view; XLA then dead-code-
    # eliminates the flat concat+permute (materializing a (nefc, nv)
    # Jacobian several times per step was a profiled bandwidth sink).
    # simple_*: diagonal rows (eq, friction, limits, pyramidal facets,
    # frictionless contacts) stacked in assembly order; cb_*: one entry per
    # elliptic condim>1 group, arrays shaped (C, dim, ...).
    simple_J: jax.Array = None          # (n_simple, nv)
    simple_D: jax.Array = None
    simple_R: jax.Array = None
    simple_aref: jax.Array = None
    simple_floss: jax.Array = None
    simple_active: jax.Array = None
    simple_kinds: Tuple[str, ...] = struct.field(pytree_node=False,
                                                 default=())
    simple_dest: Tuple[int, ...] = struct.field(pytree_node=False,
                                                default=())
    cb_J: Tuple[jax.Array, ...] = ()        # each (C, dim, nv)
    cb_aref: Tuple[jax.Array, ...] = ()     # each (C, dim)
    cb_D: Tuple[jax.Array, ...] = ()
    cb_R: Tuple[jax.Array, ...] = ()
    cb_sigma: Tuple[jax.Array, ...] = ()    # each (C, dim-1)
    cb_act: Tuple[jax.Array, ...] = ()      # each (C,)
    cb_pen: Tuple[jax.Array, ...] = ()      # each (C,) includemargin - dist
    cb_dim: Tuple[int, ...] = struct.field(pytree_node=False, default=())
    # canonical-row destinations per group: static tuples normally; None for
    # con_topk-compacted groups, whose (traced) rows live in cb_dest_dyn
    cb_dest: Tuple[Tuple[int, ...], ...] = struct.field(pytree_node=False,
                                                        default=())
    cb_dest_dyn: Tuple[jax.Array, ...] = ()


# ---------------------------------------------------------------------------
# impedance / reference acceleration (mj_makeImpedance)
# ---------------------------------------------------------------------------

def _impedance(solimp, pos, margin):
    # `[..., k]` indexing keeps this polymorphic: scalar rows (solimp (5,))
    # and vectorized contact blocks (solimp (C,5), pos (C,)) share the code
    d0, dmax, width, mid, power = (solimp[..., 0], solimp[..., 1],
                                   solimp[..., 2], solimp[..., 3],
                                   solimp[..., 4])
    x = jnp.abs(pos - margin) / jnp.maximum(width, mmath.MINVAL)
    x = jnp.clip(x, 0.0, 1.0)
    mid = jnp.clip(mid, MINIMP, MAXIMP)
    power = jnp.maximum(power, 1.0)
    # two-sided power spline through (mid, mid)
    a = 1.0 / jnp.power(mid, power - 1.0)
    b = 1.0 / jnp.power(1.0 - mid, power - 1.0)
    y_lo = a * jnp.power(x, power)
    y_hi = 1.0 - b * jnp.power(1.0 - x, power)
    y = jnp.where(x < mid, y_lo, y_hi)
    imp = d0 + y * (dmax - d0)
    return jnp.clip(imp, MINIMP, MAXIMP)


def _kbi(m: Model, solref, solimp, pos, margin):
    """Stiffness/damping/impedance from solref/solimp (mj_makeImpedance).
    Polymorphic over a leading batch axis (see _impedance)."""
    imp = _impedance(solimp, pos, margin)
    dmax = jnp.clip(solimp[..., 1], MINIMP, MAXIMP)
    timeconst, dampratio = solref[..., 0], solref[..., 1]
    if not (m.opt.disableflags & DisableBit.REFSAFE):
        timeconst = jnp.maximum(timeconst, 2.0 * m.opt.timestep)
    k_std = 1.0 / jnp.maximum(dmax * dmax * timeconst * timeconst
                              * dampratio * dampratio, mmath.MINVAL)
    b_std = 2.0 / jnp.maximum(dmax * timeconst, mmath.MINVAL)
    # direct (negative) solref: k = -solref[0], b = -solref[1]
    direct = (solref[..., 0] <= 0) | (solref[..., 1] <= 0)
    k = jnp.where(direct, -solref[..., 0] / (dmax * dmax), k_std)
    b = jnp.where(direct, -solref[..., 1], b_std)
    return k, b, imp


def _row(m, J, pos, margin, invweight, solref, solimp, frictionloss, vel):
    k, b, imp = _kbi(m, solref, solimp, pos, margin)
    aref = -b * vel - k * imp * (pos - margin)
    R = jnp.maximum((1.0 - imp) / imp * invweight, mmath.MINVAL)
    return dict(J=J, pos=pos, margin=margin, D=1.0 / R, R=R, aref=aref,
                frictionloss=frictionloss)


def _row_group(m, J, pos, norm_pos, invweight, solref, solimp, vel, bias):
    """Row with impedance shared across a constraint group (connect: 3D-norm
    of residual; weld: 6D-norm — libmujoco semantics), and a J̇·qvel bias
    subtracted from aref (equality constraints only)."""
    k, b, imp = _kbi(m, solref, solimp, norm_pos, 0.0)
    aref = -b * vel - k * imp * pos - bias
    R = jnp.maximum((1.0 - imp) / imp * invweight, mmath.MINVAL)
    return dict(J=J, pos=pos, margin=jnp.zeros_like(pos), D=1.0 / R, R=R,
                aref=aref, frictionloss=jnp.zeros_like(pos))


def _body_bias_acc(m: Model, d: Data):
    """Spatial bias acceleration per body (qacc = 0, no gravity): the forward
    pass of mj_rne without gravity — needed for equality-constraint aref."""
    dtype = d.qpos.dtype
    cacc = [jnp.zeros(6, dtype=dtype)]
    for b in range(1, m.nbody):
        a = cacc[m.body_parentid[b]]
        adr, n = m.body_dofadr[b], m.body_dofnum[b]
        if n:
            a = a + d.cdof_dot[adr:adr + n].T @ d.qvel[adr:adr + n]
        cacc.append(a)
    return cacc


def _point_vel_acc(m, d, cacc_bias, body, point):
    """Classical velocity and bias acceleration of a body-fixed point."""
    ref = d.subtree_com[m.body_rootid[body]]
    cv = d.cvel[body]
    w = cv[:3]
    v_p = cv[3:] + jnp.cross(w, point - ref)
    ca = cacc_bias[body]
    a_p = ca[3:] + jnp.cross(ca[:3], point - ref) + jnp.cross(w, v_p)
    return w, v_p, ca[:3], a_p


# ---------------------------------------------------------------------------
# jacobian helpers
# ---------------------------------------------------------------------------

def _jac(m: Model, d: Data, point: jax.Array, body: int):
    """mj_jac: translational & rotational jacobians at world point for body.

    Returns (jacp (nv,3), jacr (nv,3)) laid out dof-major."""
    mask = smooth.body_dof_mask(m)[:, body]            # static (nv,)
    maskj = jnp.asarray(mask, dtype=d.qpos.dtype)[:, None]
    offset = point - d.subtree_com[m.body_rootid[body]]
    jacp = (d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3],
                                      jnp.broadcast_to(offset, (m.nv, 3)))) * maskj
    jacr = d.cdof[:, :3] * maskj
    return jacp, jacr


def _quat_lmat(q):
    """Matrix L(q) with L(q) @ r = quat_mul(q, r) (r as 4-vector)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([[w, -x, -y, -z],
                      [x, w, -z, y],
                      [y, z, w, -x],
                      [z, -y, x, w]])


def _quat_rmat(q):
    """Matrix R(q) with R(q) @ l = quat_mul(l, q)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([[w, -x, -y, -z],
                      [x, w, z, -y],
                      [y, -z, w, x],
                      [z, y, -x, w]])


# ---------------------------------------------------------------------------
# row assembly
# ---------------------------------------------------------------------------

def make_efc(m: Model, d: Data) -> Efc:
    dtype = d.qpos.dtype
    nv = m.nv
    rows: List[dict] = []
    actives: List[jax.Array] = []
    metas: List[RowMeta] = []

    one = jnp.ones((), dtype=dtype)
    zero = jnp.zeros((), dtype=dtype)

    qvel = d.qvel

    # ---- equality ----
    if not (m.opt.disableflags & (DisableBit.CONSTRAINT | DisableBit.EQUALITY)):
        cacc_bias = _body_bias_acc(m, d) if m.neq else None
        for e in range(m.neq):
            et = m.eq_type[e]
            solref, solimp = m.eq_solref[e], m.eq_solimp[e]
            act = d.eq_active[e]
            if et == int(EqType.CONNECT):
                b1, b2 = m.eq_obj1id[e], m.eq_obj2id[e]
                a1, a2 = m.eq_data[e, 0:3], m.eq_data[e, 3:6]
                p1 = d.xpos[b1] + d.xmat[b1] @ a1.astype(dtype)
                p2 = d.xpos[b2] + d.xmat[b2] @ a2.astype(dtype)
                jacp1, _ = _jac(m, d, p1, b1)
                jacp2, _ = _jac(m, d, p2, b2)
                Jb = (jacp1 - jacp2).T           # (3, nv)
                pos3 = p1 - p2
                invw = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
                # J̇ qvel bias: classical point-acceleration difference
                _, _, _, ap1 = _point_vel_acc(m, d, cacc_bias, b1, p1)
                _, _, _, ap2 = _point_vel_acc(m, d, cacc_bias, b2, p2)
                bias3 = ap1 - ap2
                npos = mmath.norm_safe(pos3)
                for k in range(3):
                    rows.append(_row_group(m, Jb[k], pos3[k], npos, invw,
                                           solref, solimp, Jb[k] @ qvel,
                                           bias3[k]))
                    actives.append(act)
                    metas.append(RowMeta('eq'))
            elif et == int(EqType.WELD):
                b1, b2 = m.eq_obj1id[e], m.eq_obj2id[e]
                anchor = m.eq_data[e, 0:3].astype(dtype)
                relp = m.eq_data[e, 3:6].astype(dtype)
                relq = mmath.normalize(m.eq_data[e, 6:10].astype(dtype))
                ts = m.eq_data[e, 10].astype(dtype)
                # translational: body1's prediction of body2 (via relpose = pose
                # of body2 in body1's frame) vs body2's anchor point
                p1 = d.xpos[b1] + d.xmat[b1] @ relp
                p2 = d.xpos[b2] + d.xmat[b2] @ anchor
                jacp1, jacr1 = _jac(m, d, p1, b1)
                jacp2, jacr2 = _jac(m, d, p2, b2)
                Jt = (jacp1 - jacp2).T
                post = p1 - p2
                invwt = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
                w1, _, dw1, ap1 = _point_vel_acc(m, d, cacc_bias, b1, p1)
                w2, _, dw2, ap2 = _point_vel_acc(m, d, cacc_bias, b2, p2)
                bias_t = ap1 - ap2
                # rotational residual = ts * vec(q2^-1 * q1 * relq)
                q1, q2 = d.xquat[b1], d.xquat[b2]
                q2c = mmath.quat_conj(q2)
                Q = mmath.quat_mul(q1, relq)
                qerr = mmath.quat_mul(q2c, Q)
                posr = ts * qerr[1:4]
                npos = jnp.sqrt(jnp.maximum(
                    jnp.sum(post * post) + jnp.sum(posr * posr),
                    mmath.MINVAL * mmath.MINVAL))
                for k in range(3):
                    rows.append(_row_group(m, Jt[k], post[k], npos, invwt,
                                           solref, solimp, Jt[k] @ qvel,
                                           bias_t[k]))
                    actives.append(act)
                    metas.append(RowMeta('eq'))
                # d residual / d omega(world): ±0.5*ts*vec(q2c*(0,e)*Q)
                A = _quat_lmat(q2c) @ _quat_rmat(Q)   # maps (0,e) 4-vec
                G = 0.5 * A[1:4, 1:4]                 # rows: vec, cols: e
                Jr = ts * (G @ (jacr1 - jacr2).T)     # (3, nv)
                invwr = m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1]
                # rotational J̇ qvel bias via product rule on
                # rdot = 0.5*ts*vec(q2c*(0,dw)*Q), dw = w1 - w2 (world):
                dw = w1 - w2
                dwq = jnp.concatenate([jnp.zeros(1, dtype=dtype), dw])
                w1q = jnp.concatenate([jnp.zeros(1, dtype=dtype), w1])
                w2q = jnp.concatenate([jnp.zeros(1, dtype=dtype), w2])
                dwdot = dw1 - dw2
                dwdotq = jnp.concatenate([jnp.zeros(1, dtype=dtype), dwdot])
                term1 = -0.5 * mmath.quat_mul(
                    q2c, mmath.quat_mul(w2q, mmath.quat_mul(dwq, Q)))
                term2 = mmath.quat_mul(q2c, mmath.quat_mul(dwdotq, Q))
                term3 = 0.5 * mmath.quat_mul(
                    q2c, mmath.quat_mul(dwq, mmath.quat_mul(w1q, Q)))
                bias_r = 0.5 * ts * (term1 + term2 + term3)[1:4]
                for k in range(3):
                    rows.append(_row_group(m, Jr[k], posr[k], npos, invwr,
                                           solref, solimp, Jr[k] @ qvel,
                                           bias_r[k]))
                    actives.append(act)
                    metas.append(RowMeta('eq'))
            elif et == int(EqType.JOINT):
                j1, j2 = m.eq_obj1id[e], m.eq_obj2id[e]
                c = m.eq_data[e, 0:5].astype(dtype)
                q1adr, v1 = m.jnt_qposadr[j1], m.jnt_dofadr[j1]
                dif1 = d.qpos[q1adr] - m.qpos0[q1adr]
                J = jnp.zeros(nv, dtype=dtype).at[v1].set(1.0)
                invw = m.dof_invweight0[v1]
                if j2 >= 0:
                    q2adr, v2 = m.jnt_qposadr[j2], m.jnt_dofadr[j2]
                    x = d.qpos[q2adr] - m.qpos0[q2adr]
                    poly = c[0] + x * (c[1] + x * (c[2] + x * (c[3] + x * c[4])))
                    dpoly = c[1] + x * (2 * c[2] + x * (3 * c[3] + x * 4 * c[4]))
                    pos = dif1 - poly
                    J = J.at[v2].set(-dpoly)
                    invw = invw + m.dof_invweight0[v2]
                else:
                    pos = dif1 - c[0]
                rows.append(_row(m, J, pos, zero, invw, solref, solimp, zero,
                                 J @ qvel))
                actives.append(act)
                metas.append(RowMeta('eq'))
            elif et == int(EqType.TENDON):
                t1, t2 = m.eq_obj1id[e], m.eq_obj2id[e]
                c = m.eq_data[e, 0:5].astype(dtype)
                dif1 = d.ten_length[t1] - m.tendon_length0[t1]
                J = d.ten_J[t1]
                invw = m.tendon_invweight0[t1]
                if t2 >= 0:
                    x = d.ten_length[t2] - m.tendon_length0[t2]
                    poly = c[0] + x * (c[1] + x * (c[2] + x * (c[3] + x * c[4])))
                    dpoly = c[1] + x * (2 * c[2] + x * (3 * c[3] + x * 4 * c[4]))
                    pos = dif1 - poly
                    J = J - dpoly * d.ten_J[t2]
                    invw = invw + m.tendon_invweight0[t2]
                else:
                    pos = dif1 - c[0]
                rows.append(_row(m, J, pos, zero, invw, solref, solimp, zero,
                                 J @ qvel))
                actives.append(act)
                metas.append(RowMeta('eq'))

    # ---- dof / tendon friction (frictionloss) ----
    if not (m.opt.disableflags
            & (DisableBit.CONSTRAINT | DisableBit.FRICTIONLOSS)):
        for v in m.dof_floss_adr:
            J = jnp.zeros(nv, dtype=dtype).at[v].set(1.0)
            rows.append(_row(m, J, zero, zero, m.dof_invweight0[v],
                             m.dof_solref[v], m.dof_solimp[v],
                             m.dof_frictionloss[v], qvel[v]))
            actives.append(jnp.ones((), dtype=bool))
            metas.append(RowMeta('fri'))
        for t in m.tendon_floss_adr:
            J = d.ten_J[t]
            rows.append(_row(m, J, zero, zero, m.tendon_invweight0[t],
                             m.tendon_solref_lim[t], m.tendon_solimp_lim[t],
                             m.tendon_frictionloss[t], J @ qvel))
            actives.append(jnp.ones((), dtype=bool))
            metas.append(RowMeta('fri'))

    # ---- joint / tendon limits ----
    if not (m.opt.disableflags & (DisableBit.CONSTRAINT | DisableBit.LIMIT)):
        for j in range(m.njnt):
            if not m.jnt_limited[j]:
                continue
            jt = m.jnt_type[j]
            qadr, vadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
            margin = m.jnt_margin[j]
            solref, solimp = m.jnt_solref[j], m.jnt_solimp[j]
            if jt in (int(JointType.HINGE), int(JointType.SLIDE)):
                invw = m.dof_invweight0[vadr]
                dist_lo = d.qpos[qadr] - m.jnt_range[j, 0]
                dist_hi = m.jnt_range[j, 1] - d.qpos[qadr]
                # one row, nearer side (libmujoco semantics)
                lo_closer = dist_lo < dist_hi
                dist = jnp.where(lo_closer, dist_lo, dist_hi)
                sgn = jnp.where(lo_closer, one, -one)
                J = jnp.zeros(nv, dtype=dtype).at[vadr].set(sgn)
                rows.append(_row(m, J, dist, margin, invw, solref, solimp,
                                 zero, J @ qvel))
                actives.append(dist < margin)
                metas.append(RowMeta('lim'))
            elif jt == int(JointType.BALL):
                invw = m.dof_invweight0[vadr]
                axis_angle = mmath.quat_to_vel(d.qpos[qadr:qadr + 4])
                angle, axis = mmath.norm_safe(axis_angle), mmath.normalize(axis_angle)
                rng = jnp.maximum(m.jnt_range[j, 0], m.jnt_range[j, 1])
                dist = rng - angle
                J = jnp.zeros(nv, dtype=dtype).at[vadr:vadr + 3].set(-axis)
                rows.append(_row(m, J, dist, margin, invw, solref, solimp,
                                 zero, J @ qvel))
                actives.append(dist < margin)
                metas.append(RowMeta('lim'))
        for t in range(m.ntendon):
            if not m.tendon_limited[t]:
                continue
            margin = m.tendon_margin[t]
            solref, solimp = m.tendon_solref_lim[t], m.tendon_solimp_lim[t]
            invw = m.tendon_invweight0[t]
            L = d.ten_length[t]
            dist_lo = L - m.tendon_range[t, 0]
            dist_hi = m.tendon_range[t, 1] - L
            lo_closer = dist_lo < dist_hi
            dist = jnp.where(lo_closer, dist_lo, dist_hi)
            sgn = jnp.where(lo_closer, one, -one)
            J = sgn * d.ten_J[t]
            rows.append(_row(m, J, dist, margin, invw, solref, solimp, zero,
                             J @ qvel))
            actives.append(dist < margin)
            metas.append(RowMeta('lim'))

    # ---- contacts (VECTORIZED over slots, grouped by condim) ----
    # the traced graph scales with the number of distinct condims, not with
    # the number of contact slots: a 500-slot pile scene assembles its rows
    # in a handful of gather/einsum programs (compile-time fix, VERDICT r1 #2)
    con_base: List[int] = []
    con_dim: List[int] = []
    con_mu = jnp.zeros((0, 5), dtype=dtype)
    con_act = jnp.zeros((0,), dtype=bool)
    pyramidal = m.opt.cone == 0
    n_pre = len(rows)
    con_blocks = []      # (dest_rows np, field dict) per condim group
    simple_extra = []    # diagonal-row contact blocks (pyramidal / dim-1)
    ell_meta = []        # (dest, dim, J, aref, D, R, sigma, act) per group
    if (m.ncon_max and not (m.opt.disableflags
                            & (DisableBit.CONSTRAINT | DisableBit.CONTACT))):
        c = d.contact
        # -1 = empty-model sentinel; -2 = broadphase-compacted slot whose
        # (traced) pair lives in c.dyn_pair[rank]
        slots = [i for i in range(len(c.geom1)) if c.geom1[i] != -1]
        dyn_rank = {}
        for i in range(len(c.geom1)):
            if c.geom1[i] == -2:
                dyn_rank[i] = len(dyn_rank)
        # canonical row base per slot (row order identical to the unrolled
        # assembly: slots in contact order, rows contiguous per slot)
        bases, rb = [], n_pre
        for i in slots:
            dim = c.dim[i]
            nr = 2 * (dim - 1) if (pyramidal and dim > 1) else dim
            bases.append(rb)
            rb += nr
        # elliptic slot bookkeeping in canonical slot order
        ell = [k for k, i in enumerate(slots)
               if not (pyramidal and c.dim[i] > 1)]
        if ell:
            sel = np.array([slots[k] for k in ell])
            con_base = [bases[k] for k in ell]
            con_dim = [c.dim[slots[k]] for k in ell]
            con_mu = c.friction[sel]
            con_act = c.dist[sel] < c.includemargin[sel]

        bdmask = smooth.body_dof_mask(m)               # (nv, nbody) static
        rootid = np.array(m.body_rootid, dtype=np.int32)
        gb = np.array(m.geom_bodyid, dtype=np.int32)

        by_dim: dict = {}
        for k, i in enumerate(slots):
            by_dim.setdefault((int(c.dim[i]), c.geom1[i] == -2),
                              []).append((k, i))
        ktop = int(getattr(m, "con_topk", 0) or 0)
        for (dim, is_dyn), items in sorted(by_dim.items()):
            ks = np.array([k for k, _ in items])
            idx = np.array([i for _, i in items])      # contact slot ids
            C = len(idx)
            if is_dyn:
                ranks = np.array([dyn_rank[i] for i in idx])
                gbj = jnp.asarray(gb)
                b1 = gbj[c.dyn_pair[ranks, 0]]         # traced body ids
                b2 = gbj[c.dyn_pair[ranks, 1]]
            else:
                b1 = gb[np.array([c.geom1[i] for i in idx])]
                b2 = gb[np.array([c.geom2[i] for i in idx])]
            pos = c.pos[idx]                           # (C,3)
            frame = c.frame[idx]                       # (C,3,3) rows n,t1,t2
            dist = c.dist[idx]
            incm = c.includemargin[idx]
            solref = c.solref[idx]
            solimp = c.solimp[idx]
            fric = c.friction[idx]                     # (C,5)
            act = dist < incm                          # (C,)

            def group_fields(b1, b2, pos, frame, dist, incm, solref, solimp,
                             fric, act, nc):
                """Jacobian + row fields for `nc` contact slots of this group.

                Called with the full slot set (canonical flat rows) and —
                under active-contact compaction — again with the top-k
                gathered subset, so the block view the solver consumes is
                built at the compacted size directly and the full-size
                einsums get dead-code-eliminated when nothing reads the
                flat rows."""
                # traced body ids: every per-body lookup runs as a ONE-HOT
                # MXU matmul instead of a gather — TPU gathers with dynamic
                # indices lower to serialized per-row programs (profiled
                # ~3.6 ms/substep of the pile step in the gather form),
                # while (nc, nbody) one-hot products are sub-microsecond.
                # Exact: one-hot rows select a single element, and HIGHEST
                # precision reconstructs f32 values bit-exactly.
                PH = jax.lax.Precision.HIGHEST
                if isinstance(b1, np.ndarray):
                    B1h = B2h = None
                    invw = (m.body_invweight0[b1, 0]
                            + m.body_invweight0[b2, 0]).astype(dtype)
                else:
                    bodyids = jnp.arange(m.nbody)
                    B1h = (b1[:, None] == bodyids).astype(dtype)
                    B2h = (b2[:, None] == bodyids).astype(dtype)
                    iw0 = jnp.asarray(m.body_invweight0[:, 0], dtype=dtype)
                    invw = (jnp.matmul(B1h, iw0, precision=PH)
                            + jnp.matmul(B2h, iw0, precision=PH))

                # contact Jacobian rows WITHOUT the (C, nv, 3) point-jacobian
                # intermediates: a translational row along axis `a` at point
                # p is   a . jacp_i = a . cdof_lin + cdof_ang . (off_i x a)
                # i.e. a dot of the (nv, 6) cdof table with a per-contact
                # spatial 6-vector [off x a, a] — one (nc*T, 6)@(6, nv)
                # matmul per side + a body-chain mask, instead of building/
                # masking/differencing two (nc, nv, 3) jacobians (profiled
                # ~1.5 ms of HBM traffic per pile substep). Static body ids
                # constant-fold the mask/root gathers, traced ids
                # (broadphase/contact compaction) become runtime gathers.
                def _side_meta(bs, Bh):
                    if Bh is None:
                        mask = jnp.asarray(bdmask[:, bs].T, dtype=dtype)
                        ref = d.subtree_com[rootid[bs]]
                    else:
                        # 0/1 matrices: exact at any matmul precision
                        mask = jnp.matmul(
                            Bh, jnp.asarray(bdmask.T, dtype=dtype))
                        ref = jnp.matmul(
                            Bh, d.subtree_com[jnp.asarray(rootid)],
                            precision=PH)
                    return mask, pos - ref

                mask1, off1 = _side_meta(b1, B1h)
                mask2, off2 = _side_meta(b2, B2h)
                axes_t = frame[:, :1] if dim == 1 else frame[:, :3]

                def _trans_rows(off, mask):
                    A = jnp.concatenate(
                        [jnp.cross(off[:, None, :], axes_t), axes_t], axis=-1)
                    P = jnp.einsum('ctk,vk->ctv', A, d.cdof)     # (nc,T,nv)
                    return P * mask[:, None, :]

                Jt_all = _trans_rows(off2, mask2) - _trans_rows(off1, mask1)
                Jn = Jt_all[:, 0]                                # (nc, nv)

                # friction jacobians in row order k=1..dim-1
                Jf_list = []
                if dim > 1:
                    Jf_list.append(Jt_all[:, 1:3])
                if dim > 3:
                    nrot = dim - 3
                    Pr = jnp.einsum('crk,vk->crv', frame[:, :nrot],
                                    d.cdof[:, :3])
                    Jf_list.append(Pr * (mask2 - mask1)[:, None, :])
                Jf = (jnp.concatenate(Jf_list, axis=1) if Jf_list
                      else jnp.zeros((nc, 0, nv), dtype=dtype))  # (nc,d-1,nv)

                k_, b_, imp_ = _kbi(m, solref, solimp, dist, incm)
                if pyramidal and dim > 1:
                    # facet rows Jn ± mu_k*Jt_k, one-sided quadratic ('lim');
                    # invweight 2*mu0^2*(1+mu0^2)*invw (oracle-verified)
                    nr = 2 * (dim - 1)
                    mu = fric[:, :dim - 1]                      # (nc,dim-1)
                    sgns = jnp.asarray([1.0, -1.0], dtype=dtype)
                    Jpm = (Jn[:, None, None, :]
                           + sgns[None, None, :, None]
                           * (mu[:, :, None, None] * Jf[:, :, None, :]))
                    Jblk = Jpm.reshape(nc, nr, nv)
                    mu0 = fric[:, 0]
                    invw_p = 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0) * invw
                    aref1 = (-b_[:, None]
                             * jnp.einsum('crv,v->cr', Jblk, qvel)
                             - (k_ * imp_ * (dist - incm))[:, None])
                    R1 = jnp.repeat(jnp.maximum(
                        (1.0 - imp_) / imp_ * invw_p,
                        mmath.MINVAL)[:, None], nr, axis=1)
                    blk = dict(
                        J=Jblk.reshape(nc * nr, nv),
                        pos=jnp.repeat(dist, nr),
                        margin=jnp.repeat(incm, nr),
                        R=R1.reshape(nc * nr), D=(1.0 / R1).reshape(nc * nr),
                        aref=aref1.reshape(nc * nr),
                        frictionloss=jnp.zeros(nc * nr, dtype=dtype),
                        active=jnp.repeat(act, nr),
                        kinds=['lim'] * (nc * nr))
                    return blk, None

                # elliptic (or frictionless): normal row + cone friction rows
                Rn = jnp.maximum((1.0 - imp_) / imp_ * invw, mmath.MINVAL)
                aref_n = (-b_ * jnp.einsum('cv,v->c', Jn, qvel)
                          - k_ * imp_ * (dist - incm))
                if dim > 1:
                    imprat = jnp.asarray(m.opt.impratio, dtype=dtype)
                    # friction-row D: normal D * impratio; ROTATIONAL rows
                    # additionally scale by mu_k^2 (oracle-verified,
                    # tests/test_physics_extra condim probes)
                    scale = jnp.broadcast_to(imprat, (nc, dim - 1))
                    if dim > 3:
                        scale = scale.at[:, 2:].mul(fric[:, 2:dim - 1] ** 2)
                    Rf = jnp.maximum(
                        ((1.0 - imp_) / imp_ * invw)[:, None] / scale,
                        mmath.MINVAL)
                    aref_f = -b_[:, None] * jnp.einsum('crv,v->cr', Jf, qvel)
                    Jblk = jnp.concatenate([Jn[:, None, :], Jf], axis=1)
                    Rblk = jnp.concatenate([Rn[:, None], Rf], axis=1)
                    arefblk = jnp.concatenate([aref_n[:, None], aref_f], 1)
                    posblk = jnp.concatenate(
                        [dist[:, None],
                         jnp.zeros((nc, dim - 1), dtype=dtype)], 1)
                    mrgblk = jnp.concatenate(
                        [incm[:, None],
                         jnp.zeros((nc, dim - 1), dtype=dtype)], 1)
                else:
                    Jblk = Jn[:, None, :]
                    Rblk = Rn[:, None]
                    arefblk = aref_n[:, None]
                    posblk = dist[:, None]
                    mrgblk = incm[:, None]
                blk = dict(
                    J=Jblk.reshape(nc * dim, nv),
                    pos=posblk.reshape(nc * dim),
                    margin=mrgblk.reshape(nc * dim),
                    R=Rblk.reshape(nc * dim),
                    D=(1.0 / Rblk).reshape(nc * dim),
                    aref=arefblk.reshape(nc * dim),
                    frictionloss=jnp.zeros(nc * dim, dtype=dtype),
                    active=jnp.repeat(act, dim),
                    kinds=['con'] * (nc * dim))
                if dim > 1:
                    mu0b = jnp.maximum(fric[:, 0], mmath.MINVAL)
                    sigs_b = [jnp.broadcast_to(mu0b[:, None],
                                               (nc, min(2, dim - 1)))]
                    if dim > 3:
                        sigs_b.append(jnp.maximum(fric[:, 2:dim - 1],
                                                  mmath.MINVAL))
                    ell = (dim, Jblk, arefblk, 1.0 / Rblk, Rblk,
                           jnp.concatenate(sigs_b, axis=1), act, incm - dist)
                    return blk, ell
                return blk, None

            dest = np.concatenate([
                np.arange(bases[k], bases[k]
                          + (2 * (dim - 1) if (pyramidal and dim > 1)
                             else dim)) for k in ks])

            blk, ell = group_fields(b1, b2, pos, frame, dist, incm, solref,
                                    solimp, fric, act, C)
            con_blocks.append((dest, blk))
            if pyramidal and dim > 1:
                simple_extra.append((dest, blk))
                continue
            if ell is None:
                simple_extra.append((dest, blk))
                continue
            if ktop and C > ktop:
                # active-contact compaction (m.con_topk): rebuild the solver
                # block at the top-K most-penetrating slots — the TPU twin
                # of mj_makeConstraint instantiating only ACTIVE contacts,
                # with a static capacity. Exact while the per-env active
                # count <= K (inactive slots carry exactly-zero forces);
                # deepest-K-win beyond. Sorted indices preserve canonical
                # slot (reduction) order. The full-size Jacobian above is
                # then dead code unless a consumer reads the flat rows.
                pen = incm - dist
                sel = jnp.sort(jax.lax.top_k(pen, ktop)[1])
                # one-hot MXU selection instead of 10 dynamic gathers (see
                # the gather note in group_fields — exact at HIGHEST)
                PH = jax.lax.Precision.HIGHEST
                Sh = (sel[:, None] == jnp.arange(C)[None, :]).astype(dtype)

                def gsel(x):
                    flat = x.reshape(C, -1).astype(dtype)
                    out = jax.lax.dot_general(
                        Sh, flat, (((1,), (0,)), ((), ())), precision=PH)
                    return out.reshape((ktop,) + x.shape[1:])

                def gsel_int(x):
                    return jnp.round(
                        gsel(x.astype(dtype)[:, None])[:, 0]).astype(jnp.int32)

                b1j = jnp.asarray(b1) if isinstance(b1, np.ndarray) else b1
                b2j = jnp.asarray(b2) if isinstance(b2, np.ndarray) else b2
                _, ell_c = group_fields(
                    gsel_int(b1j), gsel_int(b2j), gsel(pos), gsel(frame),
                    gsel(dist[:, None])[:, 0], gsel(incm[:, None])[:, 0],
                    gsel(solref), gsel(solimp), gsel(fric),
                    gsel(act.astype(dtype)[:, None])[:, 0] > 0.5, ktop)
                dmat = jnp.asarray(dest.reshape(C, dim), dtype=dtype)
                dest_c = jnp.round(jnp.matmul(
                    Sh, dmat, precision=PH)).astype(jnp.int32).reshape(-1)
                ell_meta.append((dest_c,) + ell_c)
            else:
                ell_meta.append((dest,) + ell)

    if not rows and not con_blocks:
        return None

    # assemble: stacked pre-rows + contact blocks, restored to canonical row
    # order with one static permutation gather
    def field(name, pre_list):
        parts = []
        if pre_list:
            parts.append(jnp.stack(pre_list))
        parts += [blk[name] for _, blk in con_blocks]
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    dest_all = (np.concatenate([np.arange(n_pre)]
                               + [dst for dst, _ in con_blocks])
                if con_blocks else np.arange(n_pre))
    perm = np.argsort(dest_all)

    kinds_all = [mt.kind for mt in metas]
    for _, blk in con_blocks:
        kinds_all += blk["kinds"]
    kinds_final = tuple(np.array(kinds_all, dtype=object)[perm])

    # ---- unpermuted block view (see Efc docstring) ----
    def sfield(name, pre_list):
        parts = []
        if pre_list:
            parts.append(jnp.stack(pre_list))
        parts += [blk[name] for _, blk in simple_extra]
        if not parts:
            shp = (0, nv) if name == "J" else (0,)
            return jnp.zeros(shp, dtype=bool if name == "active" else dtype)
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    simple_kinds = [mt.kind for mt in metas]
    for _, blk in simple_extra:
        # dim-1 contacts are one-sided quadratics == limit rows
        simple_kinds += ["lim" if k == "con" else k for k in blk["kinds"]]
    simple_dest = (list(range(n_pre))
                   + [int(r) for dst, _ in simple_extra for r in dst])

    efc = Efc(
        simple_J=sfield("J", [r["J"] for r in rows]),
        simple_D=sfield("D", [r["D"] for r in rows]),
        simple_R=sfield("R", [r["R"] for r in rows]),
        simple_aref=sfield("aref", [r["aref"] for r in rows]),
        simple_floss=sfield("frictionloss",
                            [r["frictionloss"] for r in rows]),
        simple_active=sfield("active", actives),
        simple_kinds=tuple(simple_kinds),
        simple_dest=tuple(simple_dest),
        cb_J=tuple(e[2] for e in ell_meta),
        cb_aref=tuple(e[3] for e in ell_meta),
        cb_D=tuple(e[4] for e in ell_meta),
        cb_R=tuple(e[5] for e in ell_meta),
        cb_sigma=tuple(e[6] for e in ell_meta),
        cb_act=tuple(e[7] for e in ell_meta),
        cb_pen=tuple(e[8] for e in ell_meta),
        cb_dim=tuple(int(e[1]) for e in ell_meta),
        cb_dest=tuple(None if not isinstance(e[0], np.ndarray)
                      else tuple(int(r) for r in e[0]) for e in ell_meta),
        cb_dest_dyn=tuple(e[0] if not isinstance(e[0], np.ndarray)
                          else jnp.zeros((0,), jnp.int32) for e in ell_meta),
        J=field("J", [r["J"] for r in rows])[perm],
        pos=field("pos", [r["pos"] for r in rows])[perm],
        margin=field("margin", [r["margin"] for r in rows])[perm],
        D=field("D", [r["D"] for r in rows])[perm],
        R=field("R", [r["R"] for r in rows])[perm],
        aref=field("aref", [r["aref"] for r in rows])[perm],
        frictionloss=field("frictionloss",
                           [r["frictionloss"] for r in rows])[perm],
        active=field("active", actives)[perm],
        con_base=tuple(int(x) for x in con_base),
        con_dim=tuple(int(x) for x in con_dim),
        kinds=kinds_final,
        con_mu=con_mu,
        con_active=con_act,
    )
    return efc


def row_layout(m: Model):
    """Static efc row layout (no Data needed): base row of each constraint
    source, in assembly order. Used by sensors (touch / limit-force) to read
    d.efc_force_contact."""
    nrow = 0
    eq_bases, fri_bases, lim_jnt, lim_ten, con_bases = [], [], {}, {}, []
    con_nrows: List[int] = []
    if not (m.opt.disableflags & (DisableBit.CONSTRAINT | DisableBit.EQUALITY)):
        for e in range(m.neq):
            eq_bases.append(nrow)
            nrow += {int(EqType.CONNECT): 3, int(EqType.WELD): 6,
                     int(EqType.JOINT): 1, int(EqType.TENDON): 1}[m.eq_type[e]]
    if not (m.opt.disableflags
            & (DisableBit.CONSTRAINT | DisableBit.FRICTIONLOSS)):
        for _ in m.dof_floss_adr:
            fri_bases.append(nrow)
            nrow += 1
        for _ in m.tendon_floss_adr:
            fri_bases.append(nrow)
            nrow += 1
    if not (m.opt.disableflags & (DisableBit.CONSTRAINT | DisableBit.LIMIT)):
        for j in range(m.njnt):
            if m.jnt_limited[j]:
                lim_jnt[j] = nrow
                nrow += 1
        for t in range(m.ntendon):
            if m.tendon_limited[t]:
                lim_ten[t] = nrow
                nrow += 1
    if (m.ncon_max and not (m.opt.disableflags
                            & (DisableBit.CONSTRAINT | DisableBit.CONTACT))):
        from mujoco_ros_pkgs_tpu.ops.narrowphase import slot_meta
        pyramidal = m.opt.cone == 0
        # slot_meta is the single source for the slot layout (it accounts for
        # broadphase top-k compaction, ops/broadphase.py)
        _, _, dims = slot_meta(m)
        for dim in dims:
            nrows_per = (2 * (dim - 1) if (pyramidal and dim > 1) else dim)
            con_bases.append(nrow)
            con_nrows.append(nrows_per)
            nrow += nrows_per
    return dict(eq=eq_bases, fri=fri_bases, lim_jnt=lim_jnt, lim_ten=lim_ten,
                con=con_bases, con_nrows=con_nrows,
                pyramidal=(m.opt.cone == 0), nrow=nrow)


def fwd_constraint(m: Model, d: Data) -> Data:
    from mujoco_ros_pkgs_tpu.ops import solver
    efc = make_efc(m, d)
    if efc is None:
        return d.replace(qacc=d.qacc_smooth,
                         qfrc_constraint=jnp.zeros_like(d.qacc_smooth))
    return solver.solve(m, d, efc)
