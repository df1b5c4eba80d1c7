"""Whole-step fused Pallas TPU kernel for single-free-body models.

Why: on BOXES-class models (one free body over static world geoms — the
driver's headline config 2) the general step lowers to ~600 small XLA ops
whose (env, 2, 3, 3)-shaped intermediates tile the TRAILING dims onto the
(8, 128) vregs — the same ~95% lane waste the narrowphase had before
ops/narrowphase_soa. Per-env state is < 1 KB, so the step is pure HBM
traffic on intermediates. This kernel runs the ENTIRE mj_step —
kinematics, narrowphase, constraint assembly, the Newton solve
(solver_tpu.newton_tiles), and Euler integration — on (8, 128) env tiles in
VMEM: HBM sees one read of (qpos, qvel, warmstart) and one write of
(qpos', qvel', qacc) per substep.

Scope (supports()): world + ONE free-joint body; analytic SoA narrowphase
pairs (static-geom vs body-geom), elliptic cone, condim 1/3/4/6, Euler
integrator, Newton solver, no actuators/tendons/sensors/equality/limits/
frictionloss; diagonal joint damping and armature supported. Everything
else keeps the general path. This replaces, for this model class, the
engine step the reference reaches through mj_step
(mujoco_ros/src/mujoco_env.cpp:498).

Dispatch mirrors ops/solver_tpu: a custom_vmap intercepts the server/bench
`vmap(step)` batching point; env-invariant traced model quantities
(sizes, friction, solref/solimp, inertia, ...) ride in one packed SMEM
params vector so runtime model edits (set_geom_properties etc.) stay live
without recompiling. Equivalence with the general path is swept by
tests/test_step_fusion.py (interpret mode, CPU).
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import (
    DisableBit, GeomType, IntegratorType, JointType, Model,
)
from mujoco_ros_pkgs_tpu.ops import math as mmath
from mujoco_ros_pkgs_tpu.ops import narrowphase as nphase
from mujoco_ros_pkgs_tpu.ops import narrowphase_soa as soa
from mujoco_ros_pkgs_tpu.ops import solver_tpu

_ENV_BLOCK = 1024
MINIMP, MAXIMP = 0.0001, 0.9999


def available() -> bool:
    env = os.environ.get("MRP_STEP_FUSION", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def supports(m: Model) -> bool:
    """Static qualification of the model for the fused whole-step kernel."""
    try:
        if not (m.nbody == 2 and m.njnt == 1
                and m.jnt_type[0] == int(JointType.FREE)):
            return False
        if m.nu or m.na or m.ntendon or m.neq or m.nsensor or m.nsensordata:
            return False
        if any(mc >= 0 for mc in m.body_mocapid):
            return False
        if any(m.jnt_limited) or len(m.dof_floss_adr):
            return False
        if m.opt.integrator != int(IntegratorType.EULER):
            return False
        if m.has_fluid:    # inertia-box fluid forces run the general path
            return False
        if int(m.opt.cone) == 0:   # pyramidal keeps the general path
            return False
        if int(m.opt.solver) != 2:   # Newton only
            return False
        if m.pair_topk:
            return False
        if m.opt.disableflags & (DisableBit.CONSTRAINT | DisableBit.CONTACT):
            return False
        # every collision pair: one side on the static world, the other on
        # the free body, with an SoA analytic narrowphase routine
        gb = list(m.geom_bodyid)
        nrows = 0
        for grp in nphase.pair_groups(m):
            if grp["key"][0] != "g" or grp["topk"]:
                return False
            t1, t2 = grp["key"][1], grp["key"][2]
            fn, cap = nphase._DISPATCH[(t1, t2)]
            if (fn.__module__ != nphase.__name__
                    or fn.__name__ not in soa.SOA_FNS):
                return False
            for (g1, g2) in grp["pairs"]:
                if {gb[g1], gb[g2]} != {0, 1}:
                    return False
        g1s, g2s, dims = nphase.slot_meta(m)
        if not g1s:
            return False
        nrows = sum(d for d in dims)
        if not (1 <= nrows <= 64):
            return False
        if any(d not in (1, 3, 4, 6) for d in dims):
            return False
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# SoA helpers on env tiles (vec3 = component tuples; svec6 = (ang, lin))
# ---------------------------------------------------------------------------


def _quat_to_mat(q):
    w, x, y, z = q
    return ((1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)),
            (2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)),
            (2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)))


def _quat_mul(u, v):
    return (u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
            u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
            u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
            u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0])


def _quat_normalize(q):
    n = jnp.sqrt(jnp.maximum(sum(c * c for c in q),
                             mmath.MINVAL * mmath.MINVAL))
    return tuple(c / n for c in q)


def _mat_mul(A, B):
    return tuple(tuple(sum(A[i][k] * B[k][j] for k in range(3))
                       for j in range(3)) for i in range(3))


def _inert_vec_mul(cin, v):
    """(10,) spatial inertia components x svec6 -> force svec6
    (mju_mulInertVec; cin = (Ixx,Iyy,Izz,Ixy,Ixz,Iyz,hx,hy,hz,m))."""
    Ixx, Iyy, Izz, Ixy, Ixz, Iyz, hx, hy, hz, mass = cin
    w, l = v
    Iw = (Ixx * w[0] + Ixy * w[1] + Ixz * w[2],
          Ixy * w[0] + Iyy * w[1] + Iyz * w[2],
          Ixz * w[0] + Iyz * w[1] + Izz * w[2])
    h = (hx, hy, hz)
    ang = soa.v_add(Iw, soa.v_cross(h, l))
    lin = soa.v_sub(soa.v_scale(l, mass), soa.v_cross(h, w))
    return ang, lin


def _force_cross(u, f):
    """motion u x_f force f (mju_crossForce)."""
    uw, ul = u
    fw, fl = f
    ang = soa.v_add(soa.v_cross(uw, fw), soa.v_cross(ul, fl))
    lin = soa.v_cross(uw, fl)
    return ang, lin


def _motion_cross(u, v):
    uw, ul = u
    vw, vl = v
    ang = soa.v_cross(uw, vw)
    lin = soa.v_add(soa.v_cross(uw, vl), soa.v_cross(ul, vw))
    return ang, lin


def _sv_dot(a, b):
    return soa.v_dot(a[0], b[0]) + soa.v_dot(a[1], b[1])


def _pow(x, p):
    """x**p for x >= 0 via exp/log (Mosaic cannot legalize math.powf with a
    runtime exponent); exact 0 at x == 0 (p >= 1 here)."""
    return jnp.where(x <= 0.0, jnp.zeros_like(x + p),
                     jnp.exp(p * jnp.log(jnp.maximum(x, 1e-30))))


def _kbi(solref, solimp, pos, margin, timestep, refsafe):
    """Tile twin of efc._kbi for one row class (scalar params, tile pos)."""
    d0, dmax, width, mid, power = solimp
    x = jnp.abs(pos - margin) / jnp.maximum(width, mmath.MINVAL)
    x = jnp.clip(x, 0.0, 1.0)
    mid = jnp.clip(mid, MINIMP, MAXIMP)
    power = jnp.maximum(power, 1.0)
    a = 1.0 / _pow(mid, power - 1.0)
    b = 1.0 / _pow(1.0 - mid, power - 1.0)
    y = jnp.where(x < mid, a * _pow(x, power),
                  1.0 - b * _pow(1.0 - x, power))
    imp = jnp.clip(d0 + y * (dmax - d0), MINIMP, MAXIMP)
    dmax_c = jnp.clip(dmax, MINIMP, MAXIMP)
    timeconst, dampratio = solref
    if refsafe:
        timeconst = jnp.maximum(timeconst, 2.0 * timestep)
    k_std = 1.0 / jnp.maximum(dmax_c * dmax_c * timeconst * timeconst
                              * dampratio * dampratio, mmath.MINVAL)
    b_std = 2.0 / jnp.maximum(dmax_c * timeconst, mmath.MINVAL)
    direct = (solref[0] <= 0) | (solref[1] <= 0)
    k = jnp.where(direct, -solref[0] / (dmax_c * dmax_c), k_std)
    b = jnp.where(direct, -solref[1], b_std)
    return k, b, imp


# ---------------------------------------------------------------------------
# trace-time model metadata
# ---------------------------------------------------------------------------


def _slot_table(m: Model):
    """Canonical contact-slot table: per slot (pair index, contact index
    within pair, sign, dim); per pair (fn_name, static geom id, body geom id,
    body_is_g2)."""
    pairs = []
    slots = [None] * len(nphase.slot_meta(m)[0])
    gb = list(m.geom_bodyid)
    for grp in nphase.pair_groups(m):
        t1, t2 = grp["key"][1], grp["key"][2]
        fn, cap = nphase._DISPATCH[(t1, t2)]
        for (g1, g2), base in zip(grp["pairs"], grp["bases"]):
            pi = len(pairs)
            body_is_g2 = gb[g2] == 1
            dim = nphase._pair_condim(m, g1, g2)
            pairs.append(dict(fn=fn.__name__, g1=g1, g2=g2,
                              body_is_g2=body_is_g2, cap=cap, dim=dim))
            for k in range(cap):
                slots[base + k] = (pi, k, 1.0 if body_is_g2 else -1.0, dim)
    return pairs, slots


def _pack_params(m: Model):
    """Pack every env-invariant traced scalar the kernel needs into one f32
    vector; returns (params (NP,), index map dict)."""
    dtype = jnp.float32
    vals = []
    idx = {}
    off = [0]

    def put(name, arr):
        arr = jnp.ravel(jnp.asarray(arr, dtype=dtype))
        idx[name] = (off[0], arr.shape[0])
        off[0] += arr.shape[0]
        vals.append(arr)

    put("dt", m.opt.timestep)
    grav = jnp.where(bool(m.opt.disableflags & DisableBit.GRAVITY),
                     0.0, 1.0) * jnp.asarray(m.opt.gravity)
    put("gravity", grav)
    put("tol", m.opt.tolerance)
    put("impratio", m.opt.impratio)
    put("mass", m.body_mass[1])
    put("inertia", m.body_inertia[1])
    put("ipos", m.body_ipos[1])
    put("iquat", m.body_iquat[1])
    put("invw0", m.body_invweight0[0, 0])
    put("invw1", m.body_invweight0[1, 0])
    put("damping", m.dof_damping)
    put("armature", m.dof_armature)
    for g in range(m.ngeom):
        put(f"gsize{g}", m.geom_size[g])
        put(f"gpos{g}", m.geom_pos[g])
        put(f"gquat{g}", m.geom_quat[g])
    pairs, _ = _slot_table(m)
    g1s = np.array([p["g1"] for p in pairs])
    g2s = np.array([p["g2"] for p in pairs])
    fric5, solref, solimp, margin, gap = nphase._contact_params_vec(
        m, g1s, g2s, dtype)
    put("fric5", fric5)
    put("solref", solref)
    put("solimp", solimp)
    put("incm", margin - gap)
    return jnp.concatenate(vals), idx


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _make_step_kernel(m: Model):
    pairs, slots = _slot_table(m)
    _, pidx = _pack_params(m)   # layout only (values ride in at runtime)
    refsafe = not (m.opt.disableflags & DisableBit.REFSAFE)
    warmstart = not (m.opt.disableflags & DisableBit.WARMSTART)
    niter = min(int(m.opt.iterations), 32)
    nls = max(2, min(int(m.opt.ls_iterations), 24) // 3)
    has_damping = bool(m.has_damping)
    nv = 6
    nrows = sum(s[3] for s in slots)
    kinds = tuple("con" for _ in range(nrows))
    con_base = []
    base = 0
    for s in slots:
        con_base.append((base, s[3]))
        base += s[3]
    con_base = tuple(con_base)

    def kernel(params_ref, qpos_ref, qvel_ref, ws_ref,
               qpos_out, qvel_out, x_out):
        def P(name, k=0):
            return params_ref[0, pidx[name][0] + k]

        def Pv(name):
            return tuple(P(name, k) for k in range(pidx[name][1]))

        pos = tuple(qpos_ref[k] for k in range(3))
        quat = _quat_normalize(tuple(qpos_ref[3 + k] for k in range(4)))
        qvel = [qvel_ref[k] for k in range(6)]
        ws = [ws_ref[k] for k in range(6)]
        dt = P("dt")
        R = _quat_to_mat(quat)

        # ---- com quantities (free body: ref = com = xipos) ----
        ipos_l = Pv("ipos")
        ipos_w = soa.m_matvec(R, ipos_l)           # R @ body_ipos
        iR = _mat_mul(R, _quat_to_mat(Pv("iquat")))
        Ib = Pv("inertia")
        # I_world = iR diag(Ib) iR^T
        def Iw(a, b):
            return sum(iR[a][k] * Ib[k] * iR[b][k] for k in range(3))
        mass = P("mass")
        zero = jnp.zeros_like(pos[0])
        cin = (Iw(0, 0), Iw(1, 1), Iw(2, 2), Iw(0, 1), Iw(0, 2), Iw(1, 2),
               zero, zero, zero, mass)

        # cdof rows (svec6): trans e_v then body-axis rotations
        cdof = []
        for v in range(3):
            e = tuple(1.0 if k == v else 0.0 for k in range(3))
            cdof.append(((zero, zero, zero),
                         tuple(zero + c for c in e)))
        for k in range(3):
            ang = soa.m_col(R, k)
            lin = soa.v_cross(ang, ipos_w)         # ref - anchor = R@ipos
            cdof.append((ang, lin))

        # ---- qM (crb on one body) ----
        F = [_inert_vec_mul(cin, cdof[i]) for i in range(nv)]
        arma = Pv("armature")
        M = {}
        for i in range(nv):
            for j in range(i + 1):
                g = _sv_dot(F[i], cdof[j])
                if i == j:
                    g = g + arma[i]
                M[(i, j)] = g

        # ---- rne bias ----
        grav = Pv("gravity")
        vlin = (qvel[0], qvel[1], qvel[2])
        cvel = ((zero, zero, zero), vlin)
        vmid = cvel
        cacc = ((zero, zero, zero),
                (-grav[0] + zero, -grav[1] + zero, -grav[2] + zero))
        for k in range(3):
            dot = _motion_cross(vmid, cdof[3 + k])
            cacc = (soa.v_add(cacc[0], soa.v_scale(dot[0], qvel[3 + k])),
                    soa.v_add(cacc[1], soa.v_scale(dot[1], qvel[3 + k])))
            cvel = (soa.v_add(cvel[0], soa.v_scale(cdof[3 + k][0],
                                                   qvel[3 + k])),
                    soa.v_add(cvel[1], soa.v_scale(cdof[3 + k][1],
                                                   qvel[3 + k])))
        cfrc_a = _inert_vec_mul(cin, cacc)
        cfrc_b = _force_cross(cvel, _inert_vec_mul(cin, cvel))
        cfrc = (soa.v_add(cfrc_a[0], cfrc_b[0]),
                soa.v_add(cfrc_a[1], cfrc_b[1]))
        qfrc_bias = [_sv_dot(cdof[v], cfrc) for v in range(nv)]

        damping = Pv("damping")
        qfrc_smooth = [-damping[v] * qvel[v] - qfrc_bias[v]
                       for v in range(nv)]
        a_s = solver_tpu._chol_solve(M, qfrc_smooth, nv)

        # ---- narrowphase (SoA primitives on tiles) ----
        def geom_frame(g):
            gp = Pv(f"gpos{g}")
            gR = _quat_to_mat(Pv(f"gquat{g}"))
            if m.geom_bodyid[g] == 0:
                wp = tuple(zero + c for c in gp)
                wR = tuple(tuple(zero + gR[i][j] for j in range(3))
                           for i in range(3))
                return wp, wR
            wp = soa.v_add(pos, soa.m_matvec(R, gp))
            wR = _mat_mul(R, gR)
            return wp, wR

        pair_out = []
        for p in pairs:
            P1, M1 = geom_frame(p["g1"])
            P2, M2 = geom_frame(p["g2"])
            S1 = Pv(f"gsize{p['g1']}")
            S2 = Pv(f"gsize{p['g2']}")
            fn = soa.SOA_FNS[p["fn"]]
            dists, poss, frames = fn(P1, M1, S1, P2, M2, S2)
            pair_out.append((dists, poss, frames))

        # ---- efc rows per slot ----
        timestep = dt
        impratio = P("impratio")
        invw = P("invw0") + P("invw1")
        J, aref, D, floss, act, mu = [], [], [], [], [], []
        for si, (pi, k, sgn, dim) in enumerate(slots):
            dists, poss, frames = pair_out[pi]
            dist = dists[k]
            cpos = poss[k]
            frame = frames[k]                       # rows (n, t1, t2)
            incm = P("incm", pi)
            solref = (P("solref", pi * 2), P("solref", pi * 2 + 1))
            solimp = tuple(P("solimp", pi * 5 + j) for j in range(5))
            fr5 = tuple(P("fric5", pi * 5 + j) for j in range(5))
            a_act = dist < incm
            k_, b_, imp_ = _kbi(solref, solimp, dist, incm, timestep, refsafe)
            off = soa.v_sub(cpos, soa.v_add(pos, ipos_w))   # cpos - ref

            def trans_row(axis):
                offxa = soa.v_cross(off, axis)
                row = [sgn * axis[v] for v in range(3)]
                for kk in range(3):
                    row.append(sgn * (soa.v_dot(axis, cdof[3 + kk][1])
                                      + soa.v_dot(offxa, cdof[3 + kk][0])))
                return row

            def rot_row(axis):
                row = [zero, zero, zero]
                for kk in range(3):
                    row.append(sgn * soa.v_dot(axis, cdof[3 + kk][0]))
                return row

            rows = [trans_row(soa.m_row(frame, 0))]
            if dim > 1:
                rows.append(trans_row(soa.m_row(frame, 1)))
                rows.append(trans_row(soa.m_row(frame, 2)))
            if dim > 3:
                for rr in range(dim - 3):
                    rows.append(rot_row(soa.m_row(frame, rr)))

            Rn = jnp.maximum((1.0 - imp_) / imp_ * invw, mmath.MINVAL)
            jv = [sum(rows[0][v] * qvel[v] for v in range(nv))]
            aref_n = -b_ * jv[0] - k_ * imp_ * (dist - incm)
            J.append(rows[0])
            aref.append(aref_n)
            D.append(1.0 / Rn)
            floss.append(zero)
            act.append(a_act)
            for rr in range(1, dim):
                scale = impratio
                if rr >= 3:
                    mu_rr = fr5[rr - 1]
                    scale = scale * mu_rr * mu_rr
                Rf = jnp.maximum(((1.0 - imp_) / imp_ * invw) / scale,
                                 mmath.MINVAL)
                jvr = sum(rows[rr][v] * qvel[v] for v in range(nv))
                J.append(rows[rr])
                aref.append(-b_ * jvr)
                D.append(1.0 / Rf)
                floss.append(zero)
                act.append(a_act)
            mu_slot = tuple(zero + f for f in fr5)
            mu.append(mu_slot)

        # ---- Newton solve (shared tile solver) ----
        tol = P("tol")
        x, f = solver_tpu.newton_tiles(
            nv, kinds, con_base, niter, nls, warmstart, tol,
            J, aref, D, floss, act, mu, M, a_s, ws)

        # ---- Euler integrate ----
        qacc = x
        if has_damping:
            qfrc_con = []
            for v in range(nv):
                s = None
                for r in range(nrows):
                    t = J[r][v] * f[r]
                    s = t if s is None else s + t
                qfrc_con.append(s)
            MhB = dict(M)
            for v in range(nv):
                MhB[(v, v)] = MhB[(v, v)] + dt * damping[v]
            qacc = solver_tpu._chol_solve(
                MhB, [qfrc_smooth[v] + qfrc_con[v] for v in range(nv)], nv)
        qvel_new = [qvel[v] + dt * qacc[v] for v in range(nv)]
        pos_new = tuple(pos[k] + dt * qvel_new[k] for k in range(3))
        wvel = (qvel_new[3], qvel_new[4], qvel_new[5])
        angle = jnp.sqrt(jnp.maximum(soa.v_dot(wvel, wvel),
                                     mmath.MINVAL * mmath.MINVAL)) * dt
        axis = soa.v_scale(wvel, 1.0 / jnp.sqrt(jnp.maximum(
            soa.v_dot(wvel, wvel), mmath.MINVAL * mmath.MINVAL)))
        half = 0.5 * angle
        dq = (jnp.cos(half),) + tuple(c * jnp.sin(half) for c in axis)
        quat_new = _quat_mul(quat, dq)

        for k in range(3):
            qpos_out[k] = pos_new[k]
        for k in range(4):
            qpos_out[3 + k] = quat_new[k]
        for v in range(nv):
            qvel_out[v] = qvel_new[v]
            x_out[v] = x[v]

    return kernel


def step_batched(m: Model, qpos, qvel, ws, params):
    """(B, 7/6/6) + params -> (qpos', qvel', x_solver). f32 tiles kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B0 = qpos.shape[0]
    dtype = jnp.float32
    B = max(_ENV_BLOCK, ((B0 + _ENV_BLOCK - 1) // _ENV_BLOCK) * _ENV_BLOCK)
    pad = B - B0

    def prep(x, feat):
        x = x.astype(dtype).reshape(B0, feat)
        if pad:
            x = jnp.concatenate(
                [x, jnp.broadcast_to(x[:1], (pad, feat))])
        return solver_tpu._to_tiles(x, B)

    qpos_t = prep(qpos, 7)
    qvel_t = prep(qvel, 6)
    ws_t = prep(ws, 6)
    params = params.astype(dtype).reshape(1, -1)

    kernel = _make_step_kernel(m)
    nblk = B // _ENV_BLOCK
    try:
        vma = frozenset(jax.typeof(qpos_t).vma)
    except Exception:
        vma = frozenset()
    shp_kw = dict(vma=vma) if vma else {}

    def spec(feat):
        return pl.BlockSpec((feat, 8, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    qpos_o, qvel_o, x_o = pl.pallas_call(
        kernel,
        grid=(nblk,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[pl.BlockSpec((1, params.shape[1]), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  spec(7), spec(6), spec(6)],
        out_specs=[spec(7), spec(6), spec(6)],
        out_shape=[jax.ShapeDtypeStruct((7, B // 128, 128), dtype, **shp_kw),
                   jax.ShapeDtypeStruct((6, B // 128, 128), dtype, **shp_kw),
                   jax.ShapeDtypeStruct((6, B // 128, 128), dtype, **shp_kw)],
    )(params, qpos_t, qvel_t, ws_t)

    def untile(x, feat):
        return x.reshape(feat, B).T[:B0]

    return untile(qpos_o, 7), untile(qvel_o, 6), untile(x_o, 6)


def step(m: Model, d):
    """Fused whole-step for a qualifying model; returns the updated Data.

    Only the integrated state (qpos, qvel, qacc, qacc_warmstart, time) is
    updated; derived fields (xpos, contacts, ...) are left as-is — the same
    staleness contract mj_step leaves in mjData, refreshed by the server's
    mj_forward-when-paused machinery when read."""
    params, _ = _pack_params(m)

    @jax.custom_batching.custom_vmap
    def _f(qpos, qvel, ws, params):
        qp, qv, x = step_batched(m, qpos[None], qvel[None], ws[None], params)
        return qp[0], qv[0], x[0]

    @_f.def_vmap
    def _rule(axis_size, in_batched, qpos, qvel, ws, params):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
        bq, bv, bw, bp = in_batched
        p0 = params[0] if bp else params
        qp, qv, x = step_batched(m, bcast(qpos, bq), bcast(qvel, bv),
                                 bcast(ws, bw), p0)
        return (qp, qv, x), (True, True, True)

    qp, qv, x = _f(d.qpos, d.qvel, d.qacc_warmstart, params)
    h = m.opt.timestep.astype(d.qpos.dtype)
    return d.replace(qpos=qp, qvel=qv, qacc=x, qacc_warmstart=x,
                     time=d.time + h)
