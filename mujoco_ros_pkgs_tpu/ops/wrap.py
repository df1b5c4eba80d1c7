"""Tendon wrap geometry — mju_wrap analogue (sphere/cylinder geodesic wrap).

Used by the spatial-tendon path in ops/smooth.py. The reference server
inherits this from libmujoco's mj_tendon/mju_wrap (the engine it steps via
mj_step, mujoco_ros/src/mujoco_env.cpp:498); here it is branchless jnp so a
wrap that activates/deactivates with configuration stays a fixed-shape traced
program: every solution branch is computed and selected with `where`, and
inactive wraps collapse the two tangent points onto the straight segment's
midpoint (which makes their Jacobian contribution vanish identically — the
midpoint rides the chord).

Semantics were pinned empirically against the oracle (dense sweeps in
tests/test_spatial_tendon.py; see also ADVICE r3 finding #1):

- no sidesite: the cable wraps iff the straight segment intersects the
  circle; of the two tangent-pair solutions the shorter total path wins.
- sidesite OUTSIDE the geom: both tangent-pair candidates are formed; the
  one whose tangent-point midpoint lies nearest the (raw, world-projected)
  sidesite is selected. The selected candidate produces a wrap iff it is
  geometrically consistent: always when the segment intersects the circle,
  and otherwise only when its rotation sense matches the side of the chord
  the circle center lies on (forcing the cable the "long way" around is
  valid — observed arcs beyond 270 degrees — while selecting the side the
  chord already clears degenerates to the straight segment).
- sidesite INSIDE the geom: the cable is constrained to pass through the
  disk (libmujoco's wrap_inside). If the segment already intersects, it
  stays straight; otherwise it bends at the single circle point minimizing
  total path length (the reflection/Fermat point — found here by bisection
  on the arc between the endpoint directions; by the envelope theorem the
  bend point can be treated as riding the wrap body, so the generic
  segment-Jacobian assembly in ops/smooth.py stays exact). The bend point
  does not depend on where inside the geom the sidesite sits (verified
  against the oracle), only on its insideness.

All functions are single-env; vmap batches them.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9
_FERMAT_ITERS = 26


def _seg_intersects(p0, p1, r):
    """Clamped segment-to-origin distance test against radius r."""
    chord = p1 - p0
    tproj = jnp.clip(-(p0 @ chord) / jnp.maximum(chord @ chord, _EPS),
                     0.0, 1.0)
    closest = p0 + tproj * chord
    return jnp.linalg.norm(closest) < r


def _fermat_point(p0, p1, r):
    """Circle point minimizing |p0-c| + |c-p1|, on the shorter arc between
    the endpoint directions (bisection on the path-length derivative)."""
    a0 = jnp.arctan2(p0[1], p0[0])
    a1 = jnp.arctan2(p1[1], p1[0])
    da = jnp.mod(a1 - a0 + jnp.pi, 2.0 * jnp.pi) - jnp.pi

    def dlen(t):
        phi = a0 + t * da
        c = r * jnp.stack([jnp.cos(phi), jnp.sin(phi)])
        cp = r * da * jnp.stack([-jnp.sin(phi), jnp.cos(phi)])
        g0 = ((c - p0) @ cp) / jnp.maximum(jnp.linalg.norm(c - p0), _EPS)
        g1 = ((c - p1) @ cp) / jnp.maximum(jnp.linalg.norm(c - p1), _EPS)
        return g0 + g1

    lo = jnp.zeros(())
    hi = jnp.ones(())
    for _ in range(_FERMAT_ITERS):
        mid = 0.5 * (lo + hi)
        neg = dlen(mid) < 0
        lo = jnp.where(neg, mid, lo)
        hi = jnp.where(neg, hi, mid)
    phi = a0 + 0.5 * (lo + hi) * da
    return r * jnp.stack([jnp.cos(phi), jnp.sin(phi)])


def wrap_circle(p0, p1, r, side, has_side, side_inside=False):
    """2D circle wrap at the origin.

    p0, p1: (2,) endpoints (outside the circle for a valid wrap);
    side: (2,) sidesite projection (used when has_side, a static bool);
    side_inside: traced bool — sidesite inside the geom (wrap_inside mode).

    Returns (t0, t1, arclen, active): tangent points (2,), arc length,
    and whether the cable actually bends. Inactive -> t0 = t1 = midpoint,
    arclen = 0."""
    d0 = jnp.sqrt(jnp.maximum(p0 @ p0, _EPS))
    d1 = jnp.sqrt(jnp.maximum(p1 @ p1, _EPS))
    a0 = jnp.arctan2(p0[1], p0[0])
    a1 = jnp.arctan2(p1[1], p1[0])
    # clamp for endpoints at/inside the circle (wrap disabled below anyway)
    b0 = jnp.arccos(jnp.clip(r / d0, -1.0, 1.0))
    b1 = jnp.arccos(jnp.clip(r / d1, -1.0, 1.0))

    def candidate(s):
        ph0 = a0 - s * b0
        ph1 = a1 + s * b1
        t0 = r * jnp.stack([jnp.cos(ph0), jnp.sin(ph0)])
        t1 = r * jnp.stack([jnp.cos(ph1), jnp.sin(ph1)])
        # arc from ph0 to ph1 traversed in rotation sense s
        dphi = jnp.mod(s * (ph0 - ph1), 2.0 * jnp.pi)
        total = (jnp.linalg.norm(p0 - t0) + r * dphi
                 + jnp.linalg.norm(p1 - t1))
        return t0, t1, r * dphi, total, 0.5 * (t0 + t1)

    t0p, t1p, arcp, totp, midp = candidate(1.0)    # clockwise
    t0m, t1m, arcm, totm, midm = candidate(-1.0)   # counterclockwise

    intersects = _seg_intersects(p0, p1, r)
    # rotation sense that can touch when the chord clears the circle:
    # center on the +cross side of the chord -> only the CW candidate bends
    chord = p1 - p0
    cross_center = chord[0] * (-p0[1]) - chord[1] * (-p0[0])
    cw_ok = intersects | (cross_center > 0)
    ccw_ok = intersects | (cross_center <= 0)

    # selection: sidesite -> tangent-midpoint nearest the raw sidesite;
    # else shorter total path (only reachable when intersecting)
    closer_cw = (jnp.linalg.norm(midp - side)
                 <= jnp.linalg.norm(midm - side))
    pick_cw = jnp.where(has_side, closer_cw, totp <= totm)
    t0 = jnp.where(pick_cw, t0p, t0m)
    t1 = jnp.where(pick_cw, t1p, t1m)
    arc = jnp.where(pick_cw, arcp, arcm)
    act_out = jnp.where(has_side,
                        jnp.where(pick_cw, cw_ok, ccw_ok),
                        intersects)

    # wrap_inside: single bend point, straight when already intersecting
    if has_side:
        c = _fermat_point(p0, p1, r)
        act_in = ~intersects
        use_in = jnp.asarray(side_inside)
        t0 = jnp.where(use_in, c, t0)
        t1 = jnp.where(use_in, c, t1)
        arc = jnp.where(use_in, 0.0, arc)
        active = jnp.where(use_in, act_in, act_out)
    else:
        active = act_out
    active = active & (d0 > r) & (d1 > r)

    mid = 0.5 * (p0 + p1)
    t0 = jnp.where(active, t0, mid)
    t1 = jnp.where(active, t1, mid)
    arc = jnp.where(active, arc, 0.0)
    return t0, t1, arc, active


def wrap_sphere(p0, p1, r, side, has_side, side_inside=False):
    """Sphere wrap at the origin (3D): geodesic lies in the plane spanned by
    the two endpoints. Returns (t0 (3,), t1 (3,), arclen, active)."""
    # plane basis
    e1 = p0 / jnp.maximum(jnp.linalg.norm(p0), _EPS)
    p1perp = p1 - (p1 @ e1) * e1
    nrm = jnp.linalg.norm(p1perp)
    # degenerate (p0, p1 colinear with the center): no unique plane from the
    # endpoints alone. With a sidesite the plane is spanned by the sidesite
    # instead (the oracle wraps a center-crossing chord toward the sidesite);
    # without one there is no deterministic plane -> no wrap.
    ok_endpoints = nrm > _EPS
    sperp = side - (side @ e1) * e1
    snrm = jnp.linalg.norm(sperp)
    if has_side:
        ok_plane = ok_endpoints | (snrm > _EPS)
        e2 = jnp.where(ok_endpoints, p1perp / jnp.maximum(nrm, _EPS),
                       jnp.where(snrm > _EPS,
                                 sperp / jnp.maximum(snrm, _EPS),
                                 _any_perp(e1)))
    else:
        ok_plane = ok_endpoints
        e2 = jnp.where(ok_plane, p1perp / jnp.maximum(nrm, _EPS),
                       _any_perp(e1))
    q0 = jnp.stack([p0 @ e1, p0 @ e2])
    q1 = jnp.stack([p1 @ e1, p1 @ e2])
    qs = jnp.stack([side @ e1, side @ e2])
    t0q, t1q, arc, active = wrap_circle(q0, q1, r, qs, has_side, side_inside)
    active = active & ok_plane
    mid = 0.5 * (p0 + p1)
    t0 = jnp.where(active, t0q[0] * e1 + t0q[1] * e2, mid)
    t1 = jnp.where(active, t1q[0] * e1 + t1q[1] * e2, mid)
    arc = jnp.where(active, arc, 0.0)
    return t0, t1, arc, active


def _any_perp(v):
    """Any unit vector perpendicular to unit v."""
    alt = jnp.where(jnp.abs(v[0]) < 0.9,
                    jnp.array([1.0, 0.0, 0.0], dtype=v.dtype),
                    jnp.array([0.0, 1.0, 0.0], dtype=v.dtype))
    w = jnp.cross(v, alt)
    return w / jnp.maximum(jnp.linalg.norm(w), _EPS)


def wrap_cylinder(p0, p1, r, side, has_side, side_inside=False):
    """Cylinder wrap (axis = local z): 2D wrap in the xy-plane with the z
    coordinate interpolated along the 2D path (libmujoco's convention: the
    wrapped cable is a helix whose z advances proportionally to 2D arc
    length). Returns (t0 (3,), t1 (3,), arclen3d, active)."""
    q0, q1 = p0[:2], p1[:2]
    t0q, t1q, arc2d, active = wrap_circle(q0, q1, r, side[:2], has_side,
                                          side_inside)
    l0 = jnp.linalg.norm(q0 - t0q)
    l1 = jnp.linalg.norm(q1 - t1q)
    L2d = jnp.maximum(l0 + arc2d + l1, _EPS)
    dz = p1[2] - p0[2]
    z0 = p0[2] + dz * l0 / L2d
    z1 = p0[2] + dz * (l0 + arc2d) / L2d
    arc3d = jnp.sqrt(arc2d * arc2d + (z1 - z0) ** 2)
    mid = 0.5 * (p0 + p1)
    t0 = jnp.where(active, jnp.concatenate([t0q, z0[None]]), mid)
    t1 = jnp.where(active, jnp.concatenate([t1q, z1[None]]), mid)
    arc3d = jnp.where(active, arc3d, 0.0)
    return t0, t1, arc3d, active


def wrap_geom(pos0, pos1, gpos, gmat, r, is_sphere: bool,
              side_pos, has_side: bool):
    """World-frame wrap around a sphere/cylinder geom.

    pos0/pos1: world endpoints; gpos/gmat: geom frame; side_pos: world
    sidesite position (ignored unless has_side). Returns world-frame
    (t0, t1, arclen, active)."""
    p0 = gmat.T @ (pos0 - gpos)
    p1 = gmat.T @ (pos1 - gpos)
    sd = gmat.T @ (side_pos - gpos)
    if is_sphere:
        inside = jnp.linalg.norm(sd) < r
        t0, t1, arc, act = wrap_sphere(p0, p1, r, sd, has_side, inside)
    else:
        inside = jnp.linalg.norm(sd[:2]) < r
        t0, t1, arc, act = wrap_cylinder(p0, p1, r, sd, has_side, inside)
    return gpos + gmat @ t0, gpos + gmat @ t1, arc, act
