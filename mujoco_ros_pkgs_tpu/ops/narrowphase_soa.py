"""Env-on-lanes (structure-of-arrays) narrowphase for the batched TPU path.

Why this exists: the per-pair analytic routines in ops/narrowphase.py are
written per-env and vmapped twice (pairs inside, envs outside), which traces
to arrays shaped (env, pairs, 3) / (env, pairs, 4, 3). XLA-TPU tiles the two
TRAILING dims onto the (8, 128) vector registers, so a (512, 30, 3) op uses
30x3 = 90 of 1024 register slots — ~97% of the lanes are wasted, and the
narrowphase becomes a ~5 ms bandwidth-bound tail on the contact-rich PILE
scene (see ROADMAP.md §1). This module re-expresses the same primitives over
scalar COMPONENT arrays of shape (pairs, env): env rides the 128-lane minor
axis (the layout proven by ops/linalg_tpu.py), pairs ride the sublanes, and
every op runs at full lane occupancy.

Dispatch follows the psd_solve pattern (ops/linalg_tpu.py): the public
`collide_pair` is a jax.custom_batching.custom_vmap whose batched rule
transposes the env batch onto the minor axis. The math mirrors the AoS
routines op-for-op (same guards, same tie-breaking, same contact ordering) so
the two paths agree to roundoff; tests/test_narrowphase_soa.py sweeps them
against each other.

This replaces the collision work the reference server gets from libmujoco's
mjCOLLISIONFUNC table when it steps the engine (mujoco_ros/src/
mujoco_env.cpp:498); routing/override semantics stay in ops/narrowphase.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.ops import math as mmath

MINVAL = mmath.MINVAL

# ---------------------------------------------------------------------------
# component-array vector/matrix helpers
# vec3 = (x, y, z) tuple of arrays; mat3 = 3x3 nested tuple, M[i][j] row i col j
# ---------------------------------------------------------------------------


def v_add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def v_sub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def v_neg(a):
    return tuple(-x for x in a)


def v_scale(a, s):
    return tuple(x * s for x in a)


def v_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v_cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def v_norm_safe(a):
    return jnp.sqrt(jnp.maximum(v_dot(a, a), MINVAL * MINVAL))


def v_normalize(a):
    return v_scale(a, 1.0 / v_norm_safe(a))


def v_where(c, a, b):
    return tuple(jnp.where(c, x, y) for x, y in zip(a, b))


def m_col(M, j):
    return (M[0][j], M[1][j], M[2][j])


def m_row(M, i):
    return M[i]


def m_matvec(M, v):
    """world = R @ local."""
    return tuple(M[i][0] * v[0] + M[i][1] * v[1] + M[i][2] * v[2]
                 for i in range(3))


def m_tmatvec(M, v):
    """local = R^T @ world."""
    return tuple(M[0][j] * v[0] + M[1][j] * v[1] + M[2][j] * v[2]
                 for j in range(3))


def _sel3(flags, vals):
    """Select among 3 scalar arrays by exclusive boolean flags (is0, is1)."""
    is0, is1, _ = flags
    return jnp.where(is0, vals[0], jnp.where(is1, vals[1], vals[2]))


def _sel3v(flags, vecs):
    is0, is1, _ = flags
    return v_where(is0, vecs[0], v_where(is1, vecs[1], vecs[2]))


def _argmin3_flags(a0, a1, a2):
    """First-occurrence argmin over three arrays, as exclusive flags
    (jnp.argmin tie semantics: lowest index wins)."""
    is0 = (a0 <= a1) & (a0 <= a2)
    is1 = (~is0) & (a1 <= a2)
    is2 = (~is0) & (~is1)
    return is0, is1, is2


def _argmax3_flags(a0, a1, a2):
    is0 = (a0 >= a1) & (a0 >= a2)
    is1 = (~is0) & (a1 >= a2)
    is2 = (~is0) & (~is1)
    return is0, is1, is2


def make_frame(n):
    """SoA mju_makeFrame (rows n, t1, t2) — mirrors narrowphase._make_frame:
    helper axis = coordinate axis with smallest |n| (first on ties)."""
    n = v_normalize(n)
    ax, ay, az = jnp.abs(n[0]), jnp.abs(n[1]), jnp.abs(n[2])
    flags = _argmin3_flags(ax, ay, az)
    one = jnp.ones_like(n[0])
    zero = jnp.zeros_like(n[0])
    a = (jnp.where(flags[0], one, zero),
         jnp.where(flags[1], one, zero),
         jnp.where(flags[2], one, zero))
    t1 = v_normalize(v_cross(n, a))
    t2 = v_cross(n, t1)
    return (n, t1, t2)


def _seg_seg_closest(p1, d1, h1, p2, d2, h2):
    """SoA twin of narrowphase._seg_seg_closest."""
    r = v_sub(p1, p2)
    a = v_dot(d1, d1)
    e = v_dot(d2, d2)
    b = v_dot(d1, d2)
    c = v_dot(d1, r)
    f = v_dot(d2, r)
    denom = a * e - b * b
    ok = jnp.abs(denom) > 1e-12
    s = jnp.where(ok, (b * f - c * e) / jnp.where(ok, denom, 1.0), 0.0)
    s = jnp.clip(s, -h1, h1)
    t = (b * s + f) / jnp.maximum(e, MINVAL)
    t = jnp.clip(t, -h2, h2)
    s2 = jnp.clip((b * t - c) / jnp.maximum(a, MINVAL), -h1, h1)
    return v_add(p1, v_scale(d1, s2)), v_add(p2, v_scale(d2, t))


# ---------------------------------------------------------------------------
# primitives: each takes (P1, M1, S1, P2, M2, S2) component structures and
# returns (dists: [cap] arrays, poss: [cap] vec3, frames: [cap] mat3-rows)
# ---------------------------------------------------------------------------


def _plane_sphere(P1, M1, S1, P2, M2, S2):
    n, p0 = m_col(M1, 2), P1
    c, r = P2, S2[0]
    cdist = v_dot(n, v_sub(c, p0))
    dist = cdist - r
    pos = v_sub(c, v_scale(n, r + 0.5 * dist))
    return [dist], [pos], [make_frame(n)]


def _plane_capsule(P1, M1, S1, P2, M2, S2):
    n, p0 = m_col(M1, 2), P1
    c, axis = P2, m_col(M2, 2)
    r, hl = S2[0], S2[1]
    frame = make_frame(n)
    dists, poss = [], []
    for sgn in (1.0, -1.0):
        e = v_add(c, v_scale(axis, sgn * hl))
        dist = v_dot(n, v_sub(e, p0)) - r
        dists.append(dist)
        poss.append(v_sub(e, v_scale(n, r + 0.5 * dist)))
    return dists, poss, [frame, frame]


def _plane_box(P1, M1, S1, P2, M2, S2):
    n, p0 = m_col(M1, 2), P1
    c, R, size = P2, M2, S2
    frame = make_frame(n)
    np0 = v_dot(n, p0)
    corners, cdists = [], []
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
                local = (size[0] * sx, size[1] * sy, size[2] * sz)
                corner = v_add(c, m_matvec(R, local))
                corners.append(corner)
                cdists.append(v_dot(corner, n) - np0)
    # 4 most-penetrating corners; mirrors lax.top_k(-dists, 4) incl. its
    # lower-index-first tie order (strict < scan keeps the first min)
    big = jnp.full_like(cdists[0], jnp.inf)
    taken = [jnp.zeros_like(cdists[0], dtype=bool) for _ in range(8)]
    dists, poss = [], []
    for _ in range(4):
        bestd = jnp.where(taken[0], big, cdists[0])
        bestpos = corners[0]
        bestidx = jnp.zeros_like(cdists[0], dtype=jnp.int32)
        for i in range(1, 8):
            di = jnp.where(taken[i], big, cdists[i])
            upd = di < bestd
            bestd = jnp.where(upd, di, bestd)
            bestpos = v_where(upd, corners[i], bestpos)
            bestidx = jnp.where(upd, i, bestidx)
        taken = [t | (bestidx == i) for i, t in enumerate(taken)]
        dists.append(bestd)
        poss.append(v_sub(bestpos, v_scale(n, 0.5 * bestd)))
    return dists, poss, [frame] * 4


def _sphere_sphere(P1, M1, S1, P2, M2, S2):
    c1, r1 = P1, S1[0]
    c2, r2 = P2, S2[0]
    dvec = v_sub(c2, c1)
    n = v_normalize(dvec)
    dist = v_norm_safe(dvec) - r1 - r2
    pos = v_add(c1, v_scale(n, r1 + 0.5 * dist))
    return [dist], [pos], [make_frame(n)]


def _sphere_capsule(P1, M1, S1, P2, M2, S2):
    c1, r1 = P1, S1[0]
    c2, axis = P2, m_col(M2, 2)
    r2, hl = S2[0], S2[1]
    t = jnp.clip(v_dot(v_sub(c1, c2), axis), -hl, hl)
    p = v_add(c2, v_scale(axis, t))
    dvec = v_sub(p, c1)
    n = v_normalize(dvec)
    dist = v_norm_safe(dvec) - r1 - r2
    pos = v_add(c1, v_scale(n, r1 + 0.5 * dist))
    return [dist], [pos], [make_frame(n)]


def _capsule_capsule(P1, M1, S1, P2, M2, S2):
    c1, a1 = P1, m_col(M1, 2)
    r1, h1 = S1[0], S1[1]
    c2, a2 = P2, m_col(M2, 2)
    r2, h2 = S2[0], S2[1]
    p1, p2 = _seg_seg_closest(c1, a1, h1, c2, a2, h2)
    dvec = v_sub(p2, p1)
    n = v_normalize(dvec)
    dist = v_norm_safe(dvec) - r1 - r2
    pos = v_add(p1, v_scale(n, r1 + 0.5 * dist))
    return [dist], [pos], [make_frame(n)]


def _sphere_box_probe(c, r, bc, R, size):
    """Shared sphere-vs-box closest-point core (also the capsule-box probe)."""
    local = m_tmatvec(R, v_sub(c, bc))
    clamped = tuple(jnp.clip(local[k], -size[k], size[k]) for k in range(3))
    absl = tuple(jnp.abs(local[k]) for k in range(3))
    inside = (absl[0] < size[0]) & (absl[1] < size[1]) & (absl[2] < size[2])
    depth = tuple(size[k] - absl[k] for k in range(3))
    flags = _argmin3_flags(*depth)
    sgn = _sel3(flags, tuple(jnp.sign(local[k]) for k in range(3)))
    surf = tuple(jnp.where(flags[k], sgn * size[k], clamped[k])
                 for k in range(3))
    closest_local = v_where(inside, surf, clamped)
    closest = v_add(bc, m_matvec(R, closest_local))
    dvec = v_sub(closest, c)
    nrm = v_norm_safe(dvec)
    nn = v_normalize(dvec)
    n_out = v_where(inside, v_neg(nn), nn)
    dist = jnp.where(inside, -(nrm + r), nrm - r)
    pos = v_sub(closest, v_scale(n_out, 0.5 * dist))
    return dist, pos, n_out


def _sphere_box(P1, M1, S1, P2, M2, S2):
    dist, pos, n_out = _sphere_box_probe(P1, S1[0], P2, M2, S2)
    return [dist], [pos], [make_frame(n_out)]


def _capsule_box(P1, M1, S1, P2, M2, S2):
    c, axis = P1, m_col(M1, 2)
    r, hl = S1[0], S1[1]
    dists, poss, frames = [], [], []
    for sgn in (1.0, -1.0):
        e = v_add(c, v_scale(axis, sgn * hl))
        dist, pos, n_out = _sphere_box_probe(e, r, P2, M2, S2)
        dists.append(dist)
        poss.append(pos)
        frames.append(make_frame(n_out))
    return dists, poss, frames


def _plane_ellipsoid(P1, M1, S1, P2, M2, S2):
    n, p0 = m_col(M1, 2), P1
    c, R, s = P2, M2, S2
    nl = m_tmatvec(R, n)
    sn = (s[0] * nl[0], s[1] * nl[1], s[2] * nl[2])
    denom = v_norm_safe(sn)
    support_local = v_scale((s[0] * sn[0], s[1] * sn[1], s[2] * sn[2]),
                            -1.0 / denom)
    p = v_add(c, m_matvec(R, support_local))
    dist = v_dot(n, v_sub(p, p0))
    pos = v_sub(p, v_scale(n, 0.5 * dist))
    return [dist], [pos], [make_frame(n)]


def _plane_cylinder(P1, M1, S1, P2, M2, S2):
    n, p0 = m_col(M1, 2), P1
    c, a = P2, m_col(M2, 2)
    r, hl = S2[0], S2[1]
    an = v_dot(a, n)
    perp = v_neg(v_sub(n, v_scale(a, an)))
    pnorm = v_norm_safe(perp)
    degenerate = pnorm < 1e-8
    rim = v_where(degenerate, m_col(M2, 0), v_scale(perp, 1.0 / pnorm))
    lower = jnp.where(an > 0, -1.0, 1.0)
    frame = make_frame(n)

    def cap_pts(sgn_cap):
        center = v_add(c, v_scale(a, sgn_cap * hl))
        return [v_add(center, v_scale(rim, r)), v_sub(center, v_scale(rim, r))]

    tilt = cap_pts(lower) + cap_pts(-lower)
    t1 = m_col(M2, 0)
    t2 = m_col(M2, 1)
    center = v_add(c, v_scale(a, lower * hl))
    h32 = 0.8660254037844386
    tri = [v_add(center, v_scale(t1, r)),
           v_add(center, v_add(v_scale(t1, -0.5 * r), v_scale(t2, h32 * r))),
           v_add(center, v_add(v_scale(t1, -0.5 * r), v_scale(t2, -h32 * r))),
           center]
    np0 = v_dot(n, p0)
    dists, poss = [], []
    for k in range(4):
        pt = v_where(degenerate, tri[k], tilt[k])
        dist = v_dot(pt, n) - np0
        if k == 3:
            dist = jnp.where(degenerate, jnp.full_like(dist, 1e10), dist)
        dists.append(dist)
        poss.append(v_sub(pt, v_scale(n, 0.5 * dist)))
    return dists, poss, [frame] * 4


def _sphere_cylinder(P1, M1, S1, P2, M2, S2):
    cs, rs = P1, S1[0]
    cc, Rc = P2, M2
    r, hl = S2[0], S2[1]
    local = m_tmatvec(Rc, v_sub(cs, cc))
    rad = jnp.sqrt(jnp.maximum(local[0] ** 2 + local[1] ** 2,
                               MINVAL * MINVAL))
    raddir = (local[0] / rad, local[1] / rad, jnp.zeros_like(rad))
    clamped_z = jnp.clip(local[2], -hl, hl)
    clamped_r = jnp.minimum(rad, r)
    absz = jnp.abs(local[2])
    inside = (rad < r) & (absz < hl)
    side = (raddir[0] * r, raddir[1] * r, clamped_z)
    cap = (raddir[0] * clamped_r, raddir[1] * clamped_r,
           jnp.sign(local[2]) * hl)
    use_side = rad > r
    closest_local = v_where(
        inside,
        v_where(r - rad < hl - absz, side, cap),
        v_where(use_side & (absz < hl), side,
                v_where(absz >= hl, cap, side)))
    closest = v_add(cc, m_matvec(Rc, closest_local))
    dvec = v_sub(closest, cs)
    nrm = v_norm_safe(dvec)
    nn = v_normalize(dvec)
    n_out = v_where(inside, v_neg(nn), nn)
    dist = jnp.where(inside, -(nrm + rs), nrm - rs)
    pos = v_sub(closest, v_scale(n_out, 0.5 * dist))
    return [dist], [pos], [make_frame(n_out)]


def _box_box(P1, M1, S1, P2, M2, S2):
    """SoA twin of narrowphase._box_box (SAT, face clamp, edge fallback)."""
    p1, R1, s1 = P1, M1, S1
    p2, R2, s2 = P2, M2, S2
    t = v_sub(p2, p1)
    dt = t[0].dtype

    axes = [(m_col(R1, i), False) for i in range(3)]
    axes += [(m_col(R2, i), False) for i in range(3)]
    for i in range(3):
        for j in range(3):
            axes.append((v_cross(m_col(R1, i), m_col(R2, j)), True))

    neg_inf = jnp.full_like(t[0], -jnp.inf)
    zero3 = (jnp.zeros_like(t[0]),) * 3
    best_face_sep, best_face_axis = neg_inf, zero3
    best_edge_sep, best_edge_axis = neg_inf, zero3

    for (ax, is_edge) in axes:
        ln = v_norm_safe(ax)
        ok = ln > 1e-9
        a = v_scale(ax, 1.0 / jnp.maximum(ln, MINVAL))
        sgn = jnp.where(v_dot(a, t) < 0, -1.0, 1.0)
        a = v_scale(a, sgn)
        ra = sum(jnp.abs(v_dot(a, m_col(R1, k))) * s1[k] for k in range(3))
        rb = sum(jnp.abs(v_dot(a, m_col(R2, k))) * s2[k] for k in range(3))
        sep = jnp.abs(v_dot(v_scale(ax, 1.0 / jnp.maximum(ln, MINVAL)), t)) \
            - (ra + rb)
        sep = jnp.where(ok, sep, neg_inf)
        if is_edge:
            upd = sep > best_edge_sep
            best_edge_sep = jnp.where(upd, sep, best_edge_sep)
            best_edge_axis = v_where(upd, a, best_edge_axis)
        else:
            upd = sep > best_face_sep
            best_face_sep = jnp.where(upd, sep, best_face_sep)
            best_face_axis = v_where(upd, a, best_face_axis)

    n = best_face_axis

    a1 = jnp.maximum(jnp.maximum(jnp.abs(v_dot(n, m_col(R1, 0))),
                                 jnp.abs(v_dot(n, m_col(R1, 1)))),
                     jnp.abs(v_dot(n, m_col(R1, 2))))
    a2 = jnp.maximum(jnp.maximum(jnp.abs(v_dot(n, m_col(R2, 0))),
                                 jnp.abs(v_dot(n, m_col(R2, 1)))),
                     jnp.abs(v_dot(n, m_col(R2, 2))))
    ref_is_1 = a1 >= a2

    def face_contacts(pr, Rr, sr, pi, Ri, si, nrm):
        dots = tuple(v_dot(nrm, m_col(Ri, k)) for k in range(3))
        iflags = _argmax3_flags(*(jnp.abs(dk) for dk in dots))
        isgn = -jnp.sign(_sel3(iflags, dots))
        nl = tuple(v_dot(nrm, m_col(Rr, k)) for k in range(3))
        rflags = _argmax3_flags(*(jnp.abs(nk) for nk in nl))
        rsgn = jnp.sign(_sel3(rflags, nl))
        sr_r = _sel3(rflags, sr)
        dists, poss = [], []
        for u in (-1.0, 1.0):
            for v in (-1.0, 1.0):
                # incident-face corner in incident-local coords, by iax case
                cand0 = (isgn * si[0], u * si[1], v * si[2])
                cand1 = (v * si[0], isgn * si[1], u * si[2])
                cand2 = (u * si[0], v * si[1], isgn * si[2])
                local = _sel3v(iflags, (cand0, cand1, cand2))
                corner = v_add(pi, m_matvec(Ri, local))
                loc = m_tmatvec(Rr, v_sub(corner, pr))
                clamped = tuple(jnp.clip(loc[k], -sr[k], sr[k])
                                for k in range(3))
                loc_r = _sel3(rflags, loc)
                dist = rsgn * loc_r - sr_r
                fix = loc_r - 0.5 * dist * rsgn
                pos_loc = tuple(jnp.where(rflags[k], fix, clamped[k])
                                for k in range(3))
                poss.append(v_add(pr, m_matvec(Rr, pos_loc)))
                dists.append(dist)
        return dists, poss

    d_f1, p_f1 = face_contacts(p1, R1, s1, p2, R2, s2, n)
    d_f2, p_f2 = face_contacts(p2, R2, s2, p1, R1, s1, v_neg(n))
    dist_face = [jnp.where(ref_is_1, d_f1[k], d_f2[k]) for k in range(4)]
    pos_face = [v_where(ref_is_1, p_f1[k], p_f2[k]) for k in range(4)]

    ne = best_edge_axis

    def support_edge(p, R, s, direction):
        dk = tuple(v_dot(direction, m_col(R, k)) for k in range(3))
        sgns = tuple(jnp.where(jnp.sign(d) == 0, 1.0, jnp.sign(d))
                     for d in dk)
        corner = v_add(p, m_matvec(R, (sgns[0] * s[0], sgns[1] * s[1],
                                       sgns[2] * s[2])))
        eflags = _argmin3_flags(*(jnp.abs(d) for d in dk))
        edir = _sel3v(eflags, (m_col(R, 0), m_col(R, 1), m_col(R, 2)))
        half = _sel3(eflags, s)
        sg = _sel3(eflags, sgns)
        center = v_sub(corner, v_scale(edir, sg * half))
        return center, edir, half

    c1, e1, h1 = support_edge(p1, R1, s1, ne)
    c2, e2, h2 = support_edge(p2, R2, s2, v_neg(ne))
    q1, q2 = _seg_seg_closest(c1, e1, h1, c2, e2, h2)
    dvec = v_sub(q2, q1)
    nn = v_normalize(dvec)
    edge_n = v_where(v_dot(dvec, ne) < 0, v_neg(nn), nn)
    edge_n = v_where(v_norm_safe(dvec) > 1e-9, edge_n, ne)
    dist_edge = best_edge_sep
    pos_edge = v_scale(v_add(q1, q2), 0.5)

    use_edge = best_edge_sep > best_face_sep + 1e-9
    big = jnp.full_like(t[0], 1e10).astype(dt)
    zero = jnp.zeros_like(t[0])
    dists = [jnp.where(use_edge, dist_edge, dist_face[0])]
    poss = [v_where(use_edge, pos_edge, pos_face[0])]
    for k in range(1, 4):
        dists.append(jnp.where(use_edge, big, dist_face[k]))
        poss.append(v_where(use_edge, (zero, zero, zero), pos_face[k]))
    nrm = v_where(use_edge, edge_n, n)
    frame = make_frame(nrm)
    return dists, poss, [frame] * 4


# keyed by the AoS function NAME in ops/narrowphase._DISPATCH so that custom
# plugin registrations (register_collision_function) never get shadowed
SOA_FNS = {
    "_plane_sphere": _plane_sphere,
    "_plane_capsule": _plane_capsule,
    "_plane_ellipsoid": _plane_ellipsoid,
    "_plane_cylinder": _plane_cylinder,
    "_plane_box": _plane_box,
    "_sphere_sphere": _sphere_sphere,
    "_sphere_capsule": _sphere_capsule,
    "_sphere_cylinder": _sphere_cylinder,
    "_sphere_box": _sphere_box,
    "_capsule_capsule": _capsule_capsule,
    "_capsule_box": _capsule_box,
    "_box_box": _box_box,
}


def enabled() -> bool:
    """SoA layout on by default on TPU lowerings; MRP_SOA_NARROWPHASE=0/1
    forces it off/on everywhere (tests force 1 on CPU)."""
    env = os.environ.get("MRP_SOA_NARROWPHASE", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _unpack_vec(arr, batched):
    """(E,P,3)|(P,3) -> vec3 of (P,E)|(P,1)."""
    if batched:
        return tuple(jnp.moveaxis(arr[..., k], 0, -1) for k in range(3))
    return tuple(arr[:, k][:, None] for k in range(3))


def _unpack_mat(arr, batched):
    if batched:
        return tuple(tuple(jnp.moveaxis(arr[..., i, j], 0, -1)
                           for j in range(3)) for i in range(3))
    return tuple(tuple(arr[:, i, j][:, None] for j in range(3))
                 for i in range(3))


def _pack_out(dists, poss, frames, batched):
    """[cap] of (P,E) components -> per-env (P,cap,...) | batched (E,P,cap,...)."""
    di = jnp.stack([d for d in dists])                              # (cap,P,E)
    po = jnp.stack([jnp.stack(p) for p in poss])                    # (cap,3,P,E)
    fr = jnp.stack([jnp.stack([jnp.stack(row) for row in f])
                    for f in frames])                               # (cap,3,3,P,E)
    if batched:
        return (jnp.transpose(di, (2, 1, 0)),
                jnp.transpose(po, (3, 2, 0, 1)),
                jnp.transpose(fr, (4, 3, 0, 1, 2)))
    return (di[..., 0].T,
            jnp.transpose(po[..., 0], (2, 0, 1)),
            jnp.transpose(fr[..., 0], (3, 0, 1, 2)))


def collide_pair(fn_name: str, xpos1, xmat1, size1, xpos2, xmat2, size2):
    """Run one narrowphase group in env-on-lanes layout.

    Per-env shapes in: (P,3), (P,3,3), (P,3) per side; out: dist (P,cap),
    pos (P,cap,3), frame (P,cap,3,3). Under vmap (the server/bench batching
    point) the env axis is transposed onto the trailing (lane) axis for the
    whole group computation."""
    soa_fn = SOA_FNS[fn_name]

    def _run(args, flags):
        xp1, xm1, s1, xp2, xm2, s2 = (
            f(a, b) for f, a, b in zip(
                (_unpack_vec, _unpack_mat, _unpack_vec,
                 _unpack_vec, _unpack_mat, _unpack_vec),
                args, flags))
        return soa_fn(xp1, xm1, s1, xp2, xm2, s2)

    @jax.custom_batching.custom_vmap
    def _f(xpos1, xmat1, size1, xpos2, xmat2, size2):
        args = (xpos1, xmat1, size1, xpos2, xmat2, size2)
        di, po, fr = _run(args, (False,) * 6)
        return _pack_out(di, po, fr, batched=False)

    @_f.def_vmap
    def _rule(axis_size, in_batched, *args):
        di, po, fr = _run(args, tuple(in_batched))
        out = _pack_out(di, po, fr, batched=True)
        return out, (True, True, True)

    return _f(xpos1, xmat1, size1, xpos2, xmat2, size2)
