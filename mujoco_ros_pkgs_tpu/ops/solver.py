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


def _cone_project(w_n, w_t, alpha):
    """Project (w_n, w_t) onto the circular cone ||w_t|| <= alpha * w_n.

    Returns (g_n, g_t, zone) with zone 0=inside, 1=middle, 2=polar."""
    s = mmath.norm_safe(w_t)
    inside = s <= alpha * w_n
    polar = alpha * s <= -w_n
    beta = (w_n + alpha * s) / (1.0 + alpha * alpha)
    scale = jnp.where(s > mmath.MINVAL, alpha * beta / jnp.maximum(s, mmath.MINVAL), 0.0)
    g_n = jnp.where(inside, w_n, jnp.where(polar, 0.0, beta))
    g_t = jnp.where(inside, w_t, jnp.where(polar, jnp.zeros_like(w_t),
                                           scale * w_t))
    return g_n, g_t, inside, polar


def _row_masks(efc: Efc):
    kinds = np.array(efc.kinds)
    return (jnp.asarray(kinds == 'eq'), jnp.asarray(kinds == 'fri'),
            jnp.asarray(kinds == 'lim'))


def _forces_and_weights(m: Model, efc: Efc, jar: jax.Array):
    """Per-row constraint force f(jar), diagonal weights for simple rows, and
    the total constraint cost. Elliptic contact blocks handled per contact."""
    dtype = jar.dtype
    eq_m, fri_m, lim_m = _row_masks(efc)
    D, act = efc.D, efc.active

    f = jnp.zeros_like(jar)
    w_diag = jnp.zeros_like(jar)
    cost = jnp.zeros((), dtype=dtype)

    # equality: always-on quadratic
    gate = eq_m & act
    f = jnp.where(gate, -D * jar, f)
    w_diag = jnp.where(gate, D, w_diag)
    cost += jnp.sum(jnp.where(gate, 0.5 * D * jar * jar, 0.0))

    # friction rows: Huber
    floss = efc.frictionloss
    f_unc = -D * jar
    clipped = jnp.clip(f_unc, -floss, floss)
    lin = jnp.abs(f_unc) > floss
    gate = fri_m & act
    f = jnp.where(gate, clipped, f)
    w_diag = jnp.where(gate & ~lin, D, w_diag)
    cost_fri = jnp.where(lin,
                         floss * jnp.abs(jar) - 0.5 * floss * floss / jnp.maximum(D, mmath.MINVAL),
                         0.5 * D * jar * jar)
    cost += jnp.sum(jnp.where(gate, cost_fri, 0.0))

    # limit rows: one-sided quadratic
    gate = lim_m & act & (jar < 0)
    f = jnp.where(gate, -D * jar, f)
    w_diag = jnp.where(gate, D, w_diag)
    cost += jnp.sum(jnp.where(gate, 0.5 * D * jar * jar, 0.0))

    # contacts
    con_blocks = []  # (base, dim, W_block) for Hessian assembly
    gamma = m.opt.impratio
    sqrtg = jnp.sqrt(gamma)
    for ci, (base, dim) in enumerate(zip(efc.con_base, efc.con_dim)):
        cact = efc.con_active[ci]
        if dim == 1:
            jn = jar[base]
            gate = cact & (jn < 0)
            f = f.at[base].set(jnp.where(gate, -D[base] * jn, f[base]))
            w_diag = w_diag.at[base].set(jnp.where(gate, D[base], w_diag[base]))
            cost += jnp.where(gate, 0.5 * D[base] * jn * jn, 0.0)
            continue
        u = jax.lax.dynamic_slice(jar, (base,), (dim,))
        Dn = D[base]
        mu = efc.con_mu[ci]
        mu0 = jnp.maximum(mu[0], mmath.MINVAL)
        mu_k = mu[: dim - 1]
        mu_t = mu0 / jnp.sqrt(gamma)  # circular cone coefficient
        # scaled unconstrained force
        p_n = -Dn * u[0]
        c_k = sqrtg * mu0 / jnp.maximum(mu_k, mmath.MINVAL)
        w_t = -Dn * c_k * u[1:]
        g_n, g_t, inside, polar = _cone_project(p_n, w_t, mu_t)
        b_k = sqrtg * mu_k / mu0
        f_c = jnp.concatenate([g_n[None], b_k * g_t])
        f_c = jnp.where(cact, f_c, jnp.zeros_like(f_c))
        f = jax.lax.dynamic_update_slice(f, f_c, (base,))
        # cost: 0.5 uᵀDu - 0.5 ||p - f||²_R   (R metric, p = -D∘u)
        Dvec = jax.lax.dynamic_slice(D, (base,), (dim,))
        Rvec = jax.lax.dynamic_slice(efc.R, (base,), (dim,))
        p_full = -Dvec * u
        c_cost = (0.5 * jnp.sum(Dvec * u * u)
                  - 0.5 * jnp.sum(Rvec * (p_full - f_c) ** 2))
        cost += jnp.where(cact, c_cost, 0.0)
        # Hessian block W = -df/du (symmetrized)
        s = mmath.norm_safe(w_t)
        dirv = w_t / jnp.maximum(s, mmath.MINVAL)
        a2 = mu_t * mu_t
        beta = (p_n + mu_t * s) / (1.0 + a2)
        eye = jnp.eye(dim - 1, dtype=dtype)
        P00 = 1.0 / (1.0 + a2)
        P0t = (mu_t / (1.0 + a2)) * dirv
        Ptt = (mu_t * beta / jnp.maximum(s, mmath.MINVAL)) * (eye - jnp.outer(dirv, dirv)) \
            + (a2 / (1.0 + a2)) * jnp.outer(dirv, dirv)
        Pi = jnp.block([[P00[None, None], P0t[None, :]],
                        [P0t[:, None], Ptt]])
        Pi = jnp.where(inside, jnp.eye(dim, dtype=dtype), Pi)
        Pi = jnp.where(polar, jnp.zeros((dim, dim), dtype=dtype), Pi)
        B = jnp.concatenate([jnp.ones(1, dtype=dtype), b_k])
        C = jnp.concatenate([jnp.ones(1, dtype=dtype), c_k])
        W = Dn * (B[:, None] * Pi * C[None, :])
        W = 0.5 * (W + W.T)
        W = jnp.where(cact, W, jnp.zeros_like(W))
        con_blocks.append((base, dim, W))

    return f, w_diag, cost, con_blocks


def _total_cost(m, efc, Mx_a, x_a, jar):
    """Full objective at a point (gradient-free evaluation for line search)."""
    _, _, ccost, _ = _forces_and_weights(m, efc, jar)
    return 0.5 * jnp.dot(x_a, Mx_a) + ccost


def solve(m: Model, d: Data, efc: Efc) -> Data:
    dtype = d.qpos.dtype
    a_s = d.qacc_smooth
    M = d.qM
    J = efc.J

    def cost_at(x):
        return _total_cost(m, efc, M @ (x - a_s), x - a_s, J @ x - efc.aref)

    # warmstart: start from the better of (previous qacc, qacc_smooth)
    if m.opt.disableflags & DisableBit.WARMSTART:
        x0 = a_s
    else:
        ws = d.qacc_warmstart
        x0 = jnp.where(cost_at(ws) < cost_at(a_s), ws, a_s)

    # Newton converges quadratically; caps keep the traced program small
    niter = min(m.opt.iterations, 20)
    nls = min(m.opt.ls_iterations, 12)
    tol = m.opt.tolerance

    def newton_step(carry, _):
        x, done = carry
        jar = J @ x - efc.aref
        f, w_diag, _, blocks = _forces_and_weights(m, efc, jar)
        grad = M @ (x - a_s) - J.T @ f
        H = M + (J.T * w_diag) @ J
        for (base, dim, W) in blocks:
            Jc = jax.lax.dynamic_slice(J, (base, 0), (dim, m.nv))
            H = H + Jc.T @ W @ Jc
        H = H + 1e-12 * jnp.eye(m.nv, dtype=dtype)
        L = jax.scipy.linalg.cholesky(H, lower=True)
        dx = -jax.scipy.linalg.cho_solve((L, True), grad)

        # exact-ish line search: safeguarded Newton/bisection on phi'(alpha)
        v = J @ dx
        Mdx = M @ dx
        gMd = jnp.dot(Mdx, x - a_s)
        dMd = jnp.dot(Mdx, dx)

        def dphi(alpha):
            jj = jar + alpha * v
            fa, wa, _, blks = _forces_and_weights(m, efc, jj)
            d1 = gMd + alpha * dMd - jnp.dot(fa, v)
            d2 = dMd + jnp.dot(v * wa, v)
            for (base, dim, W) in blks:
                vc = jax.lax.dynamic_slice(v, (base,), (dim,))
                d2 = d2 + vc @ W @ vc
            return d1, d2

        # bracket [0, hi]: expand hi until phi'(hi) >= 0
        hi = jnp.ones((), dtype=dtype)
        for _ in range(6):
            d1, _ = dphi(hi)
            hi = jnp.where(d1 < 0, hi * 2.0, hi)
        lo = jnp.zeros((), dtype=dtype)
        alpha = jnp.ones((), dtype=dtype)
        for _ in range(nls):
            d1, d2 = dphi(alpha)
            lo = jnp.where(d1 < 0, alpha, lo)
            hi = jnp.where(d1 >= 0, alpha, hi)
            newton = alpha - d1 / jnp.maximum(d2, mmath.MINVAL)
            inb = (newton > lo) & (newton < hi)
            alpha = jnp.where(inb, newton, 0.5 * (lo + hi))

        x_new = x + alpha * dx
        improved = cost_at(x) - cost_at(x_new)
        # scaled convergence criterion (mujoco: improvement < tolerance)
        scale = jnp.maximum(jnp.sum(jnp.abs(M @ a_s)), mmath.MINVAL)
        new_done = done | (improved < tol * scale) | (jnp.dot(grad, grad) < tol * tol)
        x_out = jnp.where(done, x, x_new)
        return (x_out, new_done), None

    (x, _), _ = jax.lax.scan(newton_step, (x0, jnp.zeros((), dtype=bool)),
                             None, length=niter)

    jar = J @ x - efc.aref
    f, _, _, _ = _forces_and_weights(m, efc, jar)
    qfrc = J.T @ f
    return d.replace(qacc=x, qfrc_constraint=qfrc, efc_force_contact=f,
                     qacc_warmstart=x)
