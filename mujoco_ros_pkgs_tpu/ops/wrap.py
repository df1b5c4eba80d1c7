"""Tendon wrap geometry — mju_wrap analogue (sphere/cylinder geodesic wrap).

Used by the spatial-tendon path in ops/smooth.py. The reference server
inherits this from libmujoco's mj_tendon/mju_wrap (the engine it steps via
mj_step, mujoco_ros/src/mujoco_env.cpp:498); here it is branchless jnp so a
wrap that activates/deactivates with configuration stays a fixed-shape traced
program: both the wrapped and straight solutions are computed and selected
with `where`, and inactive wraps collapse the two tangent points onto the
straight segment's midpoint (which makes their Jacobian contribution vanish
identically — the midpoint rides the chord).

All functions are single-env; vmap batches them.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-9


def wrap_circle(p0, p1, r, side, has_side):
    """2D circle wrap at the origin.

    p0, p1: (2,) endpoints (outside the circle for a valid wrap);
    side: (2,) preferred-side point (sidesite projection), used when
    has_side; otherwise the shorter of the two candidate wraps is taken.

    Returns (t0, t1, arclen, active): tangent points (2,), arc length,
    and whether the cable actually wraps. Inactive -> t0 = t1 = midpoint,
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
        # arc from ph0 to ph1 traversed on side s: s*(ph0-ph1) mod 2pi
        dphi = jnp.mod(s * (ph0 - ph1), 2.0 * jnp.pi)
        total = (jnp.linalg.norm(p0 - t0) + r * dphi
                 + jnp.linalg.norm(p1 - t1))
        phm = ph0 - s * 0.5 * dphi            # arc midpoint angle
        midpt = r * jnp.stack([jnp.cos(phm), jnp.sin(phm)])
        return t0, t1, r * dphi, total, midpt

    t0p, t1p, arcp, totp, midp = candidate(1.0)
    t0m, t1m, arcm, totm, midm = candidate(-1.0)

    # side selection: the candidate whose arc midpoint lies nearest the
    # sidesite (mju_wrap's side semantics, orientation-free); else shorter
    closer_plus = (jnp.linalg.norm(midp - side)
                   <= jnp.linalg.norm(midm - side))
    pick_plus = jnp.where(has_side, closer_plus, totp <= totm)
    t0 = jnp.where(pick_plus, t0p, t0m)
    t1 = jnp.where(pick_plus, t1p, t1m)
    arc = jnp.where(pick_plus, arcp, arcm)

    # activity (pinned against mj_tendon behavior, tests/test_spatial_tendon):
    # - no sidesite: wrap iff the straight chord passes through the circle;
    # - sidesite:    additionally FORCED whenever the circle center and the
    #   side point lie on the same side of the chord (a winch keeps its
    #   cable on the drum even when the chord clears it); degenerate only
    #   when the chord already runs on the side point's side.
    # Endpoints inside the circle never wrap (mju_wrap returns -1).
    chord = p1 - p0
    tproj = jnp.clip(-(p0 @ chord) / jnp.maximum(chord @ chord, _EPS), 0.0, 1.0)
    closest = p0 + tproj * chord
    seg_dist = jnp.linalg.norm(closest)
    intersects = seg_dist < r
    cross_center = chord[0] * (-p0[1]) - chord[1] * (-p0[0])
    cross_side = (chord[0] * (side[1] - p0[1])
                  - chord[1] * (side[0] - p0[0]))
    same_side = cross_center * cross_side > 0
    active = jnp.where(has_side, intersects | same_side, intersects)
    active = active & (d0 > r) & (d1 > r)

    mid = 0.5 * (p0 + p1)
    t0 = jnp.where(active, t0, mid)
    t1 = jnp.where(active, t1, mid)
    arc = jnp.where(active, arc, 0.0)
    return t0, t1, arc, active


def wrap_sphere(p0, p1, r, side, has_side):
    """Sphere wrap at the origin (3D): geodesic lies in the plane spanned by
    the two endpoints. Returns (t0 (3,), t1 (3,), arclen, active)."""
    # plane basis
    e1 = p0 / jnp.maximum(jnp.linalg.norm(p0), _EPS)
    p1perp = p1 - (p1 @ e1) * e1
    nrm = jnp.linalg.norm(p1perp)
    # degenerate (colinear with center): no unique plane -> no wrap
    ok_plane = nrm > _EPS
    e2 = jnp.where(ok_plane, p1perp / jnp.maximum(nrm, _EPS),
                   _any_perp(e1))
    q0 = jnp.stack([p0 @ e1, p0 @ e2])
    q1 = jnp.stack([p1 @ e1, p1 @ e2])
    qs = jnp.stack([side @ e1, side @ e2])
    t0q, t1q, arc, active = wrap_circle(q0, q1, r, qs, has_side)
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


def wrap_cylinder(p0, p1, r, side, has_side):
    """Cylinder wrap (axis = local z): 2D wrap in the xy-plane with the z
    coordinate interpolated along the 2D path (libmujoco's convention: the
    wrapped cable is a helix whose z advances proportionally to 2D arc
    length). Returns (t0 (3,), t1 (3,), arclen3d, active)."""
    q0, q1 = p0[:2], p1[:2]
    t0q, t1q, arc2d, active = wrap_circle(q0, q1, r, side[:2], has_side)
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
        t0, t1, arc, act = wrap_sphere(p0, p1, r, sd, has_side)
    else:
        t0, t1, arc, act = wrap_cylinder(p0, p1, r, sd, has_side)
    return gpos + gmat @ t0, gpos + gmat @ t1, arc, act
