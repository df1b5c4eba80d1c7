"""Analytic narrowphase collision functions -> masked fixed-capacity contacts.

The pair list is enumerated at compile time (core/assemble.py, mirroring
mj_collision's body-filter + contype/conaffinity rules); each geom-type pair
has a fixed contact capacity, so the total contact set has a static shape —
inactive slots are masked by dist > includemargin. This is the TPU answer to
MuJoCo's dynamic mjData.contact array.

Parameter mixing mirrors mj_contactParam (priority, solmix, solref/solimp
blending, elementwise-max friction). Runtime-mutable geom properties (the
reference's set_geom_properties service, mujoco_ros/src/callbacks.cpp:508-592)
work because params are computed from traced geom arrays, not baked in.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import Contact, Data, GeomType, Model
from mujoco_ros_pkgs_tpu.ops import math as mmath
from mujoco_ros_pkgs_tpu.ops import narrowphase_soa as soa


# ---------------------------------------------------------------------------
# per-pair parameter mixing (mj_contactParam)
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------

def _make_frame(normal: jax.Array) -> jax.Array:
    """Right-handed frame rows (normal, tan1, tan2), mju_makeFrame convention:
    helper axis = coordinate axis with the smallest |n| component (first on
    ties), t1 = normalize(n x a), t2 = n x t1."""
    n = mmath.normalize(normal)
    idx = jnp.argmin(jnp.abs(n))
    a = jnp.zeros(3, dtype=n.dtype).at[idx].set(1.0)
    t1 = mmath.normalize(jnp.cross(n, a))
    t2 = jnp.cross(n, t1)
    return jnp.stack([n, t1, t2])


def _seg_seg_closest(p1, d1, h1, p2, d2, h2):
    """Closest points between segments p±h*d (centers p, unit dirs d, half-len h)."""
    r = p1 - p2
    a = jnp.dot(d1, d1)
    e = jnp.dot(d2, d2)
    b = jnp.dot(d1, d2)
    c = jnp.dot(d1, r)
    f = jnp.dot(d2, r)
    denom = a * e - b * b
    s = jnp.where(jnp.abs(denom) > 1e-12, (b * f - c * e) / jnp.where(
        jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
    s = jnp.clip(s, -h1, h1)
    t = (b * s + f) / jnp.maximum(e, mmath.MINVAL)
    t = jnp.clip(t, -h2, h2)
    s2 = jnp.clip((b * t - c) / jnp.maximum(a, mmath.MINVAL), -h1, h1)
    return p1 + s2 * d1, p2 + t * d2


# ---------------------------------------------------------------------------
# narrowphase primitives: each returns (dist[k], pos[k,3], frame[k,3,3])
# normal points from geom1 into geom2 (MuJoCo convention)
# ---------------------------------------------------------------------------

def _plane_sphere(m, d, g1, g2):
    return _plane_sphere_core(d.geom_xmat[g1][:, 2], d.geom_xpos[g1],
                              m, d, g2)


def _plane_sphere_core(n, p0, m, d, g2):
    c = d.geom_xpos[g2]
    r = m.geom_size[g2, 0]
    cdist = jnp.dot(n, c - p0)
    dist = cdist - r
    pos = c - n * (r + 0.5 * dist)
    return dist[None], pos[None], _make_frame(n)[None]


def _plane_capsule(m, d, g1, g2):
    return _plane_capsule_core(d.geom_xmat[g1][:, 2], d.geom_xpos[g1],
                               m, d, g2)


def _plane_capsule_core(n, p0, m, d, g2):
    c = d.geom_xpos[g2]
    axis = d.geom_xmat[g2][:, 2]
    r, hl = m.geom_size[g2, 0], m.geom_size[g2, 1]
    frame = _make_frame(n)
    dists, poss = [], []
    for sgn in (1.0, -1.0):
        e = c + sgn * hl * axis
        cdist = jnp.dot(n, e - p0)
        dist = cdist - r
        dists.append(dist)
        poss.append(e - n * (r + 0.5 * dist))
    return jnp.stack(dists), jnp.stack(poss), jnp.stack([frame, frame])


def _plane_box(m, d, g1, g2):
    return _plane_box_core(d.geom_xmat[g1][:, 2], d.geom_xpos[g1], m, d, g2)


def _plane_box_core(n, p0, m, d, g2):
    c = d.geom_xpos[g2]
    R = d.geom_xmat[g2]
    size = m.geom_size[g2]
    frame = _make_frame(n)
    # 8 corners
    corners = []
    for sx in (-1, 1):
        for sy in (-1, 1):
            for sz in (-1, 1):
                off = R @ (size * jnp.array([sx, sy, sz], dtype=size.dtype))
                corners.append(c + off)
    corners = jnp.stack(corners)                      # (8,3)
    dists = corners @ n - jnp.dot(n, p0)              # (8,)
    # take the 4 most-penetrating corners (deterministic fixed shape)
    neg_d, idx = jax.lax.top_k(-dists, 4)
    sel = corners[idx]
    dsel = -neg_d
    pos = sel - 0.5 * dsel[:, None] * n
    return dsel, pos, jnp.tile(frame[None], (4, 1, 1))


def _sphere_sphere(m, d, g1, g2):
    c1, c2 = d.geom_xpos[g1], d.geom_xpos[g2]
    r1, r2 = m.geom_size[g1, 0], m.geom_size[g2, 0]
    dvec = c2 - c1
    n = mmath.normalize(dvec)
    dist = mmath.norm_safe(dvec) - r1 - r2
    pos = c1 + n * (r1 + 0.5 * dist)
    return dist[None], pos[None], _make_frame(n)[None]


def _sphere_capsule(m, d, g1, g2):
    c1 = d.geom_xpos[g1]
    r1 = m.geom_size[g1, 0]
    c2 = d.geom_xpos[g2]
    axis = d.geom_xmat[g2][:, 2]
    r2, hl = m.geom_size[g2, 0], m.geom_size[g2, 1]
    t = jnp.clip(jnp.dot(c1 - c2, axis), -hl, hl)
    p = c2 + t * axis
    dvec = p - c1
    n = mmath.normalize(dvec)
    dist = mmath.norm_safe(dvec) - r1 - r2
    pos = c1 + n * (r1 + 0.5 * dist)
    return dist[None], pos[None], _make_frame(n)[None]


def _capsule_capsule(m, d, g1, g2):
    c1, c2 = d.geom_xpos[g1], d.geom_xpos[g2]
    a1, a2 = d.geom_xmat[g1][:, 2], d.geom_xmat[g2][:, 2]
    r1, h1 = m.geom_size[g1, 0], m.geom_size[g1, 1]
    r2, h2 = m.geom_size[g2, 0], m.geom_size[g2, 1]
    p1, p2 = _seg_seg_closest(c1, a1, h1, c2, a2, h2)
    dvec = p2 - p1
    n = mmath.normalize(dvec)
    dist = mmath.norm_safe(dvec) - r1 - r2
    pos = p1 + n * (r1 + 0.5 * dist)
    return dist[None], pos[None], _make_frame(n)[None]


def _sphere_box(m, d, g1, g2):
    c = d.geom_xpos[g1]
    r = m.geom_size[g1, 0]
    bc, R = d.geom_xpos[g2], d.geom_xmat[g2]
    size = m.geom_size[g2]
    local = R.T @ (c - bc)
    clamped = jnp.clip(local, -size, size)
    inside = jnp.all(jnp.abs(local) < size)
    # if inside, push out along the axis of least penetration
    depth = size - jnp.abs(local)
    ax = jnp.argmin(depth)
    sgn = jnp.sign(local[ax])
    surf = clamped.at[ax].set(sgn * size[ax])
    closest_local = jnp.where(inside, surf, clamped)
    closest = bc + R @ closest_local
    dvec = closest - c
    nrm = mmath.norm_safe(dvec)
    n_out = jnp.where(inside, -mmath.normalize(dvec), mmath.normalize(dvec))
    dist = jnp.where(inside, -(nrm + r), nrm - r)
    pos = closest - 0.5 * dist * n_out
    return dist[None], pos[None], _make_frame(n_out)[None]


def _capsule_box(m, d, g1, g2):
    """Two sphere-box style probes along the capsule axis (approximate)."""
    c = d.geom_xpos[g1]
    axis = d.geom_xmat[g1][:, 2]
    r, hl = m.geom_size[g1, 0], m.geom_size[g1, 1]
    bc, R = d.geom_xpos[g2], d.geom_xmat[g2]
    size = m.geom_size[g2]
    dists, poss, frames = [], [], []
    for sgn in (1.0, -1.0):
        e = c + sgn * hl * axis
        local = R.T @ (e - bc)
        clamped = jnp.clip(local, -size, size)
        inside = jnp.all(jnp.abs(local) < size)
        depth = size - jnp.abs(local)
        ax = jnp.argmin(depth)
        s = jnp.sign(local[ax])
        surf = clamped.at[ax].set(s * size[ax])
        closest_local = jnp.where(inside, surf, clamped)
        closest = bc + R @ closest_local
        dvec = closest - e
        nrm = mmath.norm_safe(dvec)
        n_out = jnp.where(inside, -mmath.normalize(dvec), mmath.normalize(dvec))
        dist = jnp.where(inside, -(nrm + r), nrm - r)
        dists.append(dist)
        poss.append(closest - 0.5 * dist * n_out)
        frames.append(_make_frame(n_out))
    return jnp.stack(dists), jnp.stack(poss), jnp.stack(frames)


def _plane_cylinder(m, d, g1, g2):
    return _plane_cylinder_core(d.geom_xmat[g1][:, 2], d.geom_xpos[g1],
                                m, d, g2)


def _plane_cylinder_core(n, p0, m, d, g2):
    """Up to 4 contacts: tilted → deepest rim point + antipode on both caps;
    upright → 120-degree tripod on the contacting cap (stable support)."""
    dtype = d.qpos.dtype
    c = d.geom_xpos[g2]
    a = d.geom_xmat[g2][:, 2]
    r, hl = m.geom_size[g2, 0], m.geom_size[g2, 1]

    an = jnp.dot(a, n)
    # rim descent direction: component of -n orthogonal to axis
    perp = -(n - an * a)
    pnorm = mmath.norm_safe(perp)
    degenerate = pnorm < 1e-8
    rim = jnp.where(degenerate, d.geom_xmat[g2][:, 0], perp / pnorm)
    # choose the lower cap (toward the plane)
    lower = jnp.where(an > 0, -1.0, 1.0)
    frame = _make_frame(n)

    def cap_pts(sgn_cap):
        center = c + sgn_cap * hl * a
        return [center + r * rim, center - r * rim]

    tilt_pts = jnp.stack(cap_pts(lower) + cap_pts(-lower))   # (4,3)
    # tripod on the lower cap (degenerate / upright case)
    t1 = d.geom_xmat[g2][:, 0]
    t2 = d.geom_xmat[g2][:, 1]
    center = c + lower * hl * a
    tri = jnp.stack([
        center + r * t1,
        center + r * (-0.5 * t1 + 0.8660254037844386 * t2),
        center + r * (-0.5 * t1 - 0.8660254037844386 * t2),
        center,  # masked below
    ])
    pts = jnp.where(degenerate, tri, tilt_pts)
    dists = pts @ n - jnp.dot(n, p0)
    big = jnp.full((), 1e10, dtype=dtype)
    dists = dists.at[3].set(jnp.where(degenerate, big, dists[3]))
    pos = pts - 0.5 * dists[:, None] * n
    return dists, pos, jnp.tile(frame[None], (4, 1, 1))


def _plane_ellipsoid(m, d, g1, g2):
    return _plane_ellipsoid_core(d.geom_xmat[g1][:, 2], d.geom_xpos[g1],
                                 m, d, g2)


def _plane_ellipsoid_core(n, p0, m, d, g2):
    """Support point of the ellipsoid along -n (single contact)."""
    c = d.geom_xpos[g2]
    R = d.geom_xmat[g2]
    s = m.geom_size[g2]
    nl = R.T @ n
    sn = s * nl
    denom = mmath.norm_safe(sn)
    support_local = -(s * sn) / denom
    p = c + R @ support_local
    dist = jnp.dot(n, p - p0)
    pos = p - 0.5 * dist * n
    return dist[None], pos[None], _make_frame(n)[None]


def _sphere_cylinder(m, d, g1, g2):
    """Sphere vs cylinder: closest point on the (solid) cylinder surface."""
    dtype = d.qpos.dtype
    cs = d.geom_xpos[g1]
    rs = m.geom_size[g1, 0]
    cc = d.geom_xpos[g2]
    Rc = d.geom_xmat[g2]
    r, hl = m.geom_size[g2, 0], m.geom_size[g2, 1]
    local = Rc.T @ (cs - cc)
    rad = jnp.sqrt(jnp.maximum(local[0] ** 2 + local[1] ** 2,
                               mmath.MINVAL ** 2))
    raddir = jnp.stack([local[0] / rad, local[1] / rad,
                        jnp.zeros((), dtype=dtype)])
    clamped_z = jnp.clip(local[2], -hl, hl)
    clamped_r = jnp.minimum(rad, r)
    inside = (rad < r) & (jnp.abs(local[2]) < hl)
    # outside: closest surface point by clamping
    side = raddir * r + jnp.array([0.0, 0, 1], dtype=dtype) * clamped_z
    cap = raddir * clamped_r + jnp.array([0.0, 0, 1], dtype=dtype) \
        * jnp.sign(local[2]) * hl
    use_side = rad > r
    closest_local = jnp.where(inside,
                              jnp.where(r - rad < hl - jnp.abs(local[2]),
                                        side, cap),
                              jnp.where(use_side & (jnp.abs(local[2]) < hl),
                                        side,
                                        jnp.where(jnp.abs(local[2]) >= hl,
                                                  cap, side)))
    closest = cc + Rc @ closest_local
    dvec = closest - cs
    nrm = mmath.norm_safe(dvec)
    n_out = jnp.where(inside, -mmath.normalize(dvec), mmath.normalize(dvec))
    dist = jnp.where(inside, -(nrm + rs), nrm - rs)
    pos = closest - 0.5 * dist * n_out
    return dist[None], pos[None], _make_frame(n_out)[None]


def _box_box(m, d, g1, g2):
    """Box-box via SAT (6 face + 9 edge axes) with incident-face vertex clamp.

    Emits up to 4 face contacts or 1 edge-edge contact (rest masked). Not
    bit-identical to libmujoco's clipping but correct for stacking/resting;
    parity tests gate qacc, not individual box-box contact point layouts."""
    dtype = d.qpos.dtype
    p1, R1, s1 = d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1]
    p2, R2, s2 = d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2]
    t = p2 - p1

    axes = []       # (axis(3,), is_edge, ia, ib)
    for i in range(3):
        axes.append((R1[:, i], False))
    for i in range(3):
        axes.append((R2[:, i], False))
    for i in range(3):
        for j in range(3):
            axes.append((jnp.cross(R1[:, i], R2[:, j]), True))

    best_face_sep = jnp.full((), -jnp.inf, dtype=dtype)
    best_face_axis = jnp.zeros(3, dtype=dtype)
    best_edge_sep = jnp.full((), -jnp.inf, dtype=dtype)
    best_edge_axis = jnp.zeros(3, dtype=dtype)

    for (ax, is_edge) in axes:
        ln = mmath.norm_safe(ax)
        ok = ln > 1e-9
        a = ax / jnp.maximum(ln, mmath.MINVAL)
        # orient from box1 toward box2
        sgn = jnp.where(jnp.dot(a, t) < 0, -1.0, 1.0)
        a = a * sgn
        ra = jnp.sum(jnp.abs(a @ R1) * s1)
        rb = jnp.sum(jnp.abs(a @ R2) * s2)
        sep = jnp.abs(jnp.dot(ax / jnp.maximum(ln, mmath.MINVAL), t)) - (ra + rb)
        sep = jnp.where(ok, sep, -jnp.inf)
        if is_edge:
            upd = sep > best_edge_sep
            best_edge_sep = jnp.where(upd, sep, best_edge_sep)
            best_edge_axis = jnp.where(upd, a, best_edge_axis)
        else:
            upd = sep > best_face_sep
            best_face_sep = jnp.where(upd, sep, best_face_sep)
            best_face_axis = jnp.where(upd, a, best_face_axis)

    n = best_face_axis  # normal from box1 into box2 (face case)

    # reference box: the one whose face normal matches n best
    a1 = jnp.max(jnp.abs(n @ R1))
    a2 = jnp.max(jnp.abs(n @ R2))
    ref_is_1 = a1 >= a2

    def face_contacts(pr, Rr, sr, pi, Ri, si, nrm):
        # nrm points from ref into incident box
        # incident face: most anti-parallel to nrm
        dots = nrm @ Ri                      # (3,)
        iax = jnp.argmin(jnp.abs(jnp.abs(dots) - 1.0) - jnp.abs(dots))  # max |dot|
        iax = jnp.argmax(jnp.abs(dots))
        isgn = -jnp.sign(dots[iax])
        # 4 corners of incident face
        corners = []
        for u in (-1.0, 1.0):
            for v in (-1.0, 1.0):
                e = jnp.zeros(3, dtype=dtype).at[iax].set(isgn)
                o1 = jnp.zeros(3, dtype=dtype).at[(iax + 1) % 3].set(u)
                o2 = jnp.zeros(3, dtype=dtype).at[(iax + 2) % 3].set(v)
                local = (e + o1 + o2) * si
                corners.append(pi + Ri @ local)
        pts = jnp.stack(corners)             # (4,3) world
        # clamp into reference face rectangle (ref frame)
        loc = (pts - pr) @ Rr                # (4,3) in ref frame
        nl = nrm @ Rr
        rax = jnp.argmax(jnp.abs(nl))
        rsgn = jnp.sign(nl[jnp.asarray(rax)])
        clamped = jnp.clip(loc, -sr, sr)
        # penetration: distance of incident vert beyond ref face plane
        dist = rsgn * loc[:, rax] - sr[rax]
        # tangential clamp (keep normal coordinate from vert)
        pos_loc = clamped.at[:, rax].set(loc[:, rax] - 0.5 * dist * rsgn)
        pos = pr + pos_loc @ Rr.T
        return dist, pos

    d_f1, p_f1 = face_contacts(p1, R1, s1, p2, R2, s2, n)
    d_f2, p_f2 = face_contacts(p2, R2, s2, p1, R1, s1, -n)
    dist_face = jnp.where(ref_is_1, d_f1, d_f2)
    pos_face = jnp.where(ref_is_1, p_f1, p_f2)

    # edge-edge candidate: closest points between best edges — approximate via
    # support points along the separating axis
    ne = best_edge_axis
    # support edge on box1: corner most along +ne with the edge direction from
    # the cross-product structure; use segment-segment on the support edges
    def support_edge(p, R, s, direction):
        sgns = jnp.sign(direction @ R)
        sgns = jnp.where(sgns == 0, 1.0, sgns)
        corner = p + R @ (sgns * s)
        # edge direction: box axis least aligned with direction
        align = jnp.abs(direction @ R)
        eax = jnp.argmin(align)
        edir = R[:, eax]
        half = s[eax]
        center = corner - edir * sgns[eax] * half
        return center, edir, half

    c1, e1, h1 = support_edge(p1, R1, s1, ne)
    c2, e2, h2 = support_edge(p2, R2, s2, -ne)
    q1, q2 = _seg_seg_closest(c1, e1, h1, c2, e2, h2)
    dvec = q2 - q1
    edge_n = jnp.where(jnp.dot(dvec, ne) < 0, -mmath.normalize(dvec),
                       mmath.normalize(dvec))
    edge_n = jnp.where(mmath.norm_safe(dvec) > 1e-9, edge_n, ne)
    dist_edge = best_edge_sep
    pos_edge = 0.5 * (q1 + q2)

    use_edge = best_edge_sep > best_face_sep + 1e-9
    big = jnp.full((), 1e10, dtype=dtype)
    dists = jnp.where(use_edge,
                      jnp.concatenate([dist_edge[None], jnp.full(3, big)]),
                      dist_face)
    poss = jnp.where(use_edge,
                     jnp.concatenate([pos_edge[None], jnp.zeros((3, 3), dtype=dtype)]),
                     pos_face)
    nrm = jnp.where(use_edge, edge_n, n)
    frame = _make_frame(nrm)
    return dists, poss, jnp.tile(frame[None], (4, 1, 1))


_DISPATCH = {
    (GeomType.PLANE, GeomType.SPHERE): (_plane_sphere, 1),
    (GeomType.PLANE, GeomType.CAPSULE): (_plane_capsule, 2),
    (GeomType.PLANE, GeomType.ELLIPSOID): (_plane_ellipsoid, 1),
    (GeomType.PLANE, GeomType.CYLINDER): (_plane_cylinder, 4),
    (GeomType.PLANE, GeomType.BOX): (_plane_box, 4),
    (GeomType.SPHERE, GeomType.SPHERE): (_sphere_sphere, 1),
    (GeomType.SPHERE, GeomType.CAPSULE): (_sphere_capsule, 1),
    (GeomType.SPHERE, GeomType.CYLINDER): (_sphere_cylinder, 1),
    (GeomType.SPHERE, GeomType.BOX): (_sphere_box, 1),
    (GeomType.CAPSULE, GeomType.CAPSULE): (_capsule_capsule, 1),
    (GeomType.CAPSULE, GeomType.BOX): (_capsule_box, 2),
    (GeomType.BOX, GeomType.BOX): (_box_box, 4),
}

# all builtin analytic routines index m/d arrays with the geom ids only →
# safe to vmap over (g1, g2) arrays (grouped dispatch in collide())
for _fn, _ in _DISPATCH.values():
    _fn.vmap_safe = True


def _register_generic_pairs():
    """Convex pairs without dedicated analytic routines go through MPR
    (ops/gjk.py) with ONE contact per pair — exactly how MuJoCo 2.3.7 routes
    them through libccd `mjc_Convex` (engine_collision_driver.c collision
    table). Analytic routines above take precedence."""
    from mujoco_ros_pkgs_tpu.ops import gjk
    convex = (GeomType.SPHERE, GeomType.CAPSULE, GeomType.ELLIPSOID,
              GeomType.CYLINDER, GeomType.BOX, GeomType.MESH)
    for i, t1 in enumerate(convex):
        for t2 in convex[i:]:
            _DISPATCH.setdefault((t1, t2), (gjk.convex_pair, 4))
    _DISPATCH.setdefault((GeomType.PLANE, GeomType.MESH),
                         (gjk.plane_convex, 4))
    # hfield vs everything: bilinear tangent-plane delegation (ops/hfield.py)
    from mujoco_ros_pkgs_tpu.ops import hfield as hf
    for t2, cap in hf.HFIELD_NCON.items():
        _DISPATCH.setdefault((GeomType.HFIELD, t2), (hf.hfield_pair, cap))


_register_generic_pairs()


_DEFAULTS_STACK: dict = {}


def register_collision_function(t1: GeomType, t2: GeomType, fn, ncon: int,
                                allow_override: bool = True) -> None:
    """Install a custom narrowphase function for a geom-type pair.

    Mirrors MujocoEnv::registerCollisionFunction
    (mujoco_ros/src/mujoco_env.cpp:163-176): plugins may override the collision
    function for a (type1, type2) pair; the previous function is remembered so
    it can be restored (see unregister_collision_function — the reference
    restores defaults on plugin unload via defaultCollisionFunctions).

    `fn(m, d, g1, g2) -> (dist[ncon], pos[ncon,3], frame[ncon,3,3])` must be
    traceable JAX with static output shapes. Takes effect for models compiled
    (or reloaded) AFTER registration: contact capacities are baked into the
    static slot table at compile time, so running servers must reload().
    """
    t1, t2 = GeomType(t1), GeomType(t2)
    if t1 > t2:
        t1, t2 = t2, t1
    key = (t1, t2)
    if key in _DISPATCH and not allow_override:
        raise ValueError(f"collision function for {key} already registered")
    _DEFAULTS_STACK.setdefault(key, []).append(_DISPATCH.get(key))
    _DISPATCH[key] = (fn, int(ncon))
    PAIR_NCON[key] = int(ncon)


def unregister_collision_function(t1: GeomType, t2: GeomType) -> None:
    """Restore the previously-registered function for the pair (the reference
    re-installs mjCOLLISIONFUNC defaults when plugins unload)."""
    t1, t2 = GeomType(t1), GeomType(t2)
    if t1 > t2:
        t1, t2 = t2, t1
    key = (t1, t2)
    stack = _DEFAULTS_STACK.get(key)
    if not stack:
        raise ValueError(f"no registration to undo for {key}")
    prev = stack.pop()
    if prev is None:
        _DISPATCH.pop(key, None)
        PAIR_NCON.pop(key, None)
    else:
        _DISPATCH[key] = prev
        PAIR_NCON[key] = prev[1]


# capacity table consumed by the compiler (core/assemble.py) — single source
PAIR_NCON = {k: cap for k, (fn, cap) in _DISPATCH.items()}


def _pair_condim(m: Model, g1: int, g2: int) -> int:
    p1, p2 = m.geom_priority[g1], m.geom_priority[g2]
    if p1 != p2:
        return int(m.geom_condim[g1 if p1 > p2 else g2])
    return int(max(m.geom_condim[g1], m.geom_condim[g2]))


def pair_groups(m: Model):
    """Narrowphase groups + the static slot layout, shared by slot_meta /
    collide / broadphase so they agree exactly.

    Each group dict: key, g1s/g2s (np int arrays, all pairs of the group),
    cap (contacts per pair), condim (uniform, only meaningful when
    compacted), topk (0 = every pair runs narrowphase into per-pair static
    slots; K > 0 = top-k compaction into K*cap DYNAMIC slots), bases
    (per-pair static slot base, uncompacted) or dyn_base/dyn_rank
    (compacted). Groups with m.pair_topk > 0 additionally key on condim so
    compacted slots have one static dim."""
    from mujoco_ros_pkgs_tpu.ops import broadphase as bp

    mesh_like = (GeomType.MESH, GeomType.HFIELD)
    topk = int(m.pair_topk)
    groups: dict = {}
    order = []
    for (g1, g2) in m.collision_pairs:
        t1, t2 = GeomType(m.geom_type[g1]), GeomType(m.geom_type[g2])
        fn, cap = _DISPATCH[(t1, t2)]
        did1 = m.geom_dataid[g1] if t1 in mesh_like else -1
        did2 = m.geom_dataid[g2] if t2 in mesh_like else -1
        if getattr(fn, "vmap_safe", False):
            key = ("g", t1, t2, did1, did2,
                   _pair_condim(m, g1, g2) if topk else -1)
        else:
            key = ("u", g1, g2)
        if key not in groups:
            groups[key] = dict(key=key, pairs=[], cap=cap)
            order.append(key)
        groups[key]["pairs"].append((g1, g2))

    out = []
    pair_grp: dict = {}
    for key in order:
        grp = groups[key]
        pairs = grp["pairs"]
        compact = (topk and key[0] == "g" and len(pairs) > topk
                   and bp.compactable(key[1], key[2]))
        grp["topk"] = topk if compact else 0
        grp["g1s"] = np.array([p[0] for p in pairs])
        grp["g2s"] = np.array([p[1] for p in pairs])
        grp["condim"] = key[5] if key[0] == "g" else _pair_condim(m, *pairs[0])
        for p in pairs:
            pair_grp[p] = grp
        out.append(grp)
    # uncompacted slots first, in collision_pairs order (identical layout to
    # the pre-broadphase framework when pair_topk == 0); dynamic blocks after
    base = 0
    pair_base: dict = {}
    for (g1, g2) in m.collision_pairs:
        grp = pair_grp[(g1, g2)]
        if grp["topk"]:
            continue
        pair_base[(g1, g2)] = base
        base += grp["cap"]
    dyn_rank = 0
    for grp in out:
        if grp["topk"]:
            grp["dyn_base"] = base
            grp["dyn_rank"] = dyn_rank
            base += grp["topk"] * grp["cap"]
            dyn_rank += grp["topk"] * grp["cap"]
        else:
            grp["bases"] = np.array([pair_base[p] for p in grp["pairs"]])
    return out


def slot_meta(m: Model):
    """Static (geom1, geom2, condim) tuples for every contact slot, in the
    exact order collide() emits them. Dynamic (broadphase-compacted) slots
    carry the -2 sentinel: their geom pair is Contact.dyn_pair[rank].
    Shared by make_data so that the empty contact set has identical pytree
    structure to a computed one (scan/carry structure stability)."""
    slots: dict = {}
    for grp in pair_groups(m):
        cap = grp["cap"]
        if grp["topk"]:
            for j in range(grp["topk"] * cap):
                slots[grp["dyn_base"] + j] = (-2, -2, grp["condim"])
            continue
        for (g1, g2), b in zip(grp["pairs"], grp["bases"]):
            condim = _pair_condim(m, g1, g2)
            for j in range(cap):
                slots[b + j] = (g1, g2, condim)
    geom1 = tuple(slots[i][0] for i in range(len(slots)))
    geom2 = tuple(slots[i][1] for i in range(len(slots)))
    dims = tuple(slots[i][2] for i in range(len(slots)))
    return geom1, geom2, dims


def n_dyn_slots(m: Model) -> int:
    return sum(g["topk"] * g["cap"] for g in pair_groups(m) if g["topk"])


def empty_contact(m: Model, dtype) -> Contact:
    g1, g2, dims = slot_meta(m)
    n = max(len(g1), 1)
    if not g1:
        g1, g2, dims = (-1,) * n, (-1,) * n, (3,) * n
    return Contact(
        dist=jnp.full((n,), 1e10, dtype=dtype),
        pos=jnp.zeros((n, 3), dtype=dtype),
        frame=jnp.tile(jnp.eye(3, dtype=dtype), (n, 1, 1)),
        includemargin=jnp.zeros((n,), dtype=dtype),
        friction=jnp.zeros((n, 5), dtype=dtype),
        solref=jnp.zeros((n, 2), dtype=dtype),
        solimp=jnp.zeros((n, 5), dtype=dtype),
        geom1=g1, geom2=g2, dim=dims,
        dyn_pair=jnp.zeros((n_dyn_slots(m), 2), dtype=jnp.int32))


def _contact_params_vec(m: Model, g1s, g2s, dtype):
    """Vectorized mj_contactParam over pair arrays (one gather program instead
    of one traced sub-graph per pair). With static (numpy) pair indices the
    priority selection constant-folds; broadphase-compacted groups pass
    TRACED indices and everything becomes gathers. solmix/friction mixing
    stays traced either way so set_geom_properties edits take effect without
    recompiling."""
    pr = np.array(m.geom_priority)
    if isinstance(g1s, np.ndarray):
        p1, p2 = pr[g1s], pr[g2s]
        hi = np.where(p1 > p2, g1s, g2s)
        neq = jnp.asarray(p1 != p2)
    else:
        prj = jnp.asarray(pr)
        p1, p2 = prj[g1s], prj[g2s]
        hi = jnp.where(p1 > p2, g1s, g2s)
        neq = p1 != p2

    fr1, fr2 = m.geom_friction[g1s], m.geom_friction[g2s]
    fri_eq = jnp.maximum(fr1, fr2)
    s1, s2 = m.geom_solmix[g1s], m.geom_solmix[g2s]
    both_small = (s1 < mmath.MINVAL) & (s2 < mmath.MINVAL)
    mix = jnp.where(both_small, 0.5,
                    jnp.where(s1 < mmath.MINVAL, 0.0,
                              jnp.where(s2 < mmath.MINVAL, 1.0,
                                        s1 / jnp.maximum(s1 + s2,
                                                         mmath.MINVAL))))
    r1, r2 = m.geom_solref[g1s], m.geom_solref[g2s]
    standard = (r1[:, 0] > 0) & (r2[:, 0] > 0)
    solref_eq = jnp.where(standard[:, None],
                          mix[:, None] * r1 + (1 - mix[:, None]) * r2,
                          jnp.minimum(r1, r2))
    solimp_eq = (mix[:, None] * m.geom_solimp[g1s]
                 + (1 - mix[:, None]) * m.geom_solimp[g2s])

    fri = jnp.where(neq[:, None], m.geom_friction[hi], fri_eq)
    solref = jnp.where(neq[:, None], m.geom_solref[hi], solref_eq)
    solimp = jnp.where(neq[:, None], m.geom_solimp[hi], solimp_eq)
    margin = jnp.maximum(m.geom_margin[g1s], m.geom_margin[g2s])
    gap = jnp.maximum(m.geom_gap[g1s], m.geom_gap[g2s])
    friction5 = jnp.stack([fri[:, 0], fri[:, 0], fri[:, 1],
                           fri[:, 2], fri[:, 2]], axis=1)
    return (friction5.astype(dtype), solref.astype(dtype),
            solimp.astype(dtype), margin.astype(dtype), gap.astype(dtype))


def collide(m: Model, d: Data) -> Data:
    """Run the static pair table through the narrowphase; fixed-shape output.

    Pairs are GROUPED by (type1, type2, mesh/hfield dataids) and each group
    runs its narrowphase function ONCE under vmap over the pair axis — the
    traced graph scales with the number of distinct geom-type pairs, not with
    the number of pairs (a contact-rich scene with hundreds of pairs compiles
    like one with ten). Slot order stays canonical (slot_meta) via a static
    permutation gather. Non-vmappable functions (user registrations without
    fn.vmap_safe) fall back to per-pair calls.

    When m.pair_topk > 0, oversized groups are broadphase-compacted: a
    bounding-volume separation score over all pairs + lax.top_k pick the K
    most-overlapping pairs, and only those run narrowphase, into dynamic
    slots carrying traced geom ids (ops/broadphase.py)."""
    from mujoco_ros_pkgs_tpu.ops import broadphase as bp

    dtype = d.qpos.dtype

    dists, poss, frames, incms, fris, srefs, simps = ([] for _ in range(7))
    dest: List[np.ndarray] = []
    dyn_pairs: List[jax.Array] = []
    for grp in pair_groups(m):
        key, cap, P = grp["key"], grp["cap"], len(grp["pairs"])
        if grp["topk"]:
            K = grp["topk"]
            sep = bp.pair_scores(m, d, grp["g1s"], grp["g2s"], key[1])
            _, sel = jax.lax.top_k(-sep, K)               # K most-overlapping
            g1s = jnp.asarray(grp["g1s"], dtype=jnp.int32)[sel]
            g2s = jnp.asarray(grp["g2s"], dtype=jnp.int32)[sel]
            dyn_pairs.append(jnp.stack(
                [jnp.repeat(g1s, cap), jnp.repeat(g2s, cap)], axis=1))
            dest.append(np.arange(grp["dyn_base"], grp["dyn_base"] + K * cap))
            P = K
        else:
            g1s, g2s = grp["g1s"], grp["g2s"]
            dest.append(np.concatenate(
                [np.arange(b, b + cap) for b in grp["bases"]]))
        friction5, solref, solimp, margin, gap = _contact_params_vec(
            m, g1s, g2s, dtype)

        if key[0] == "g":
            t1, t2, did1, did2 = key[1], key[2], key[3], key[4]
            fn, _ = _DISPATCH[(t1, t2)]
            use_soa = (soa.enabled() and fn.__module__ == __name__
                       and fn.__name__ in soa.SOA_FNS)
            if use_soa:
                # env-on-lanes layout (narrowphase_soa): the whole group runs
                # as (pairs, env) component arrays with env on the TPU lanes
                g1j, g2j = jnp.asarray(g1s), jnp.asarray(g2s)
                di, po, fr = soa.collide_pair(
                    fn.__name__,
                    d.geom_xpos[g1j], d.geom_xmat[g1j], m.geom_size[g1j],
                    d.geom_xpos[g2j], d.geom_xmat[g2j], m.geom_size[g2j])
            else:
                kw = ({"st": (t1, t2, did1, did2)}
                      if getattr(fn, "needs_static", False) else {})
                di, po, fr = jax.vmap(
                    lambda a, b: fn(m, d, a, b, **kw))(
                        jnp.asarray(g1s), jnp.asarray(g2s))   # (P, cap, ...)
        else:
            g1, g2 = key[1], key[2]
            fn, _ = _DISPATCH[(GeomType(m.geom_type[g1]),
                               GeomType(m.geom_type[g2]))]
            di, po, fr = fn(m, d, g1, g2)
            di, po, fr = di[None], po[None], fr[None]

        dists.append(di.astype(dtype).reshape(P * cap))
        poss.append(po.astype(dtype).reshape(P * cap, 3))
        frames.append(fr.astype(dtype).reshape(P * cap, 3, 3))
        incms.append(jnp.repeat(margin - gap, cap))
        fris.append(jnp.repeat(friction5, cap, axis=0))
        srefs.append(jnp.repeat(solref, cap, axis=0))
        simps.append(jnp.repeat(solimp, cap, axis=0))

    # restore canonical slot order (slot_meta order) with one static gather
    perm = np.argsort(np.concatenate(dest))
    geom1, geom2, dims = slot_meta(m)
    # dynamic blocks are already emitted in dyn_rank order (pair_groups order)
    dyn_pair = (jnp.concatenate(dyn_pairs) if dyn_pairs
                else jnp.zeros((0, 2), dtype=jnp.int32))
    contact = Contact(
        dist=jnp.concatenate(dists)[perm],
        pos=jnp.concatenate(poss)[perm],
        frame=jnp.concatenate(frames)[perm],
        includemargin=jnp.concatenate(incms)[perm],
        friction=jnp.concatenate(fris)[perm],
        solref=jnp.concatenate(srefs)[perm],
        solimp=jnp.concatenate(simps)[perm],
        geom1=geom1, geom2=geom2, dim=dims, dyn_pair=dyn_pair)
    return d.replace(contact=contact)
