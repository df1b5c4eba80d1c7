"""Height-field collisions: bilinear tangent-plane approximation.

MuJoCo collides geoms against height fields by instancing triangular prisms
under the other geom's AABB and running convex collision per prism
(mjc_ConvexHField, engine_collision_convex.c) — a data-dependent, branch-heavy
loop. The TPU-native formulation: sample the bilinear terrain surface at the
other geom's footprint, build the LOCAL TANGENT PLANE (height + gradient),
and delegate to the analytic plane-vs-geom routines (ops/narrowphase.py) in
that plane's frame. Fixed shapes, no data-dependent control flow; exact for
flat cells, first-order accurate on slopes. Sharp cliffs shorter than the
other geom's footprint are smoothed — same failure mode as coarse prism
sampling. Contact capacities match the corresponding plane pairs.

Heights are stored normalized to [0, 1] (mjCHField semantics); world height
is data * size[2] above the hfield frame's z=0 base plane.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import GeomType, Model


def sample_height(m: Model, hid: int, x, y):
    """Bilinear height + gradient of hfield `hid` at local coords (x, y).

    Returns (z, dz/dx, dz/dy); coordinates outside the extent clamp to the
    border (the caller masks those contacts out)."""
    size = m.hfield_size[hid]           # (rx, ry, top_z, bottom_z)
    nrow = m.hfield_nrow[hid]
    ncol = m.hfield_ncol[hid]
    data = m.hfield_data[hid, :nrow, :ncol] * size[2]   # (nrow, ncol) heights
    # grid coords: x ∈ [-rx, rx] → j ∈ [0, ncol-1]; y → i ∈ [0, nrow-1]
    fx = (x / size[0] + 1.0) * 0.5 * (ncol - 1)
    fy = (y / size[1] + 1.0) * 0.5 * (nrow - 1)
    fx = jnp.clip(fx, 0.0, ncol - 1.000001)
    fy = jnp.clip(fy, 0.0, nrow - 1.000001)
    j0 = jnp.floor(fx).astype(jnp.int32)
    i0 = jnp.floor(fy).astype(jnp.int32)
    tx = fx - j0
    ty = fy - i0
    z00 = data[i0, j0]
    z01 = data[i0, j0 + 1]
    z10 = data[i0 + 1, j0]
    z11 = data[i0 + 1, j0 + 1]
    z = ((1 - ty) * ((1 - tx) * z00 + tx * z01)
         + ty * ((1 - tx) * z10 + tx * z11))
    # cell metric: dx per column, dy per row
    dxc = 2.0 * size[0] / (ncol - 1)
    dyc = 2.0 * size[1] / (nrow - 1)
    dzdx = ((1 - ty) * (z01 - z00) + ty * (z11 - z10)) / dxc
    dzdy = ((1 - tx) * (z10 - z00) + tx * (z11 - z01)) / dyc
    return z, dzdx, dzdy


def _tangent_plane(m: Model, d, g1: int, g2: int, hid=None):
    """Local tangent plane of hfield g1 under geom g2's center.

    Returns (n_world, p_world, inside) — the plane normal/point in world
    coordinates and whether g2's footprint is over the field extent."""
    if hid is None:
        hid = m.geom_dataid[g1]
    R = d.geom_xmat[g1]
    p0 = d.geom_xpos[g1]
    c_local = R.T @ (d.geom_xpos[g2] - p0)
    size = m.hfield_size[hid]
    margin = m.geom_rbound[g2]
    inside = ((jnp.abs(c_local[0]) <= size[0] + margin)
              & (jnp.abs(c_local[1]) <= size[1] + margin))
    z, dzdx, dzdy = sample_height(m, hid, c_local[0], c_local[1])
    n_local = jnp.stack([-dzdx, -dzdy, jnp.ones_like(z)])
    n_local = n_local / jnp.linalg.norm(n_local)
    s_local = jnp.stack([c_local[0], c_local[1], z])
    return R @ n_local, p0 + R @ s_local, inside


def hfield_pair(m: Model, d, g1: int, g2: int, st=None):
    """Narrowphase entry for (HFIELD, other); registered per other-type with
    the matching plane capacity. Signature matches narrowphase fns; `st`
    carries the static (t1, t2, dataid1, dataid2) tuple when g1/g2 are traced
    (grouped-vmap dispatch in narrowphase.collide)."""
    from mujoco_ros_pkgs_tpu.ops import narrowphase as nphase
    from mujoco_ros_pkgs_tpu.ops import gjk

    if st is None:
        st = (GeomType.HFIELD, GeomType(m.geom_type[g2]),
              m.geom_dataid[g1], m.geom_dataid[g2])
    t2, hid, did2 = GeomType(st[1]), st[2], st[3]
    n, p, inside = _tangent_plane(m, d, g1, g2, hid=hid)

    if t2 == GeomType.SPHERE:
        dist, pos, frame = nphase._plane_sphere_core(n, p, m, d, g2)
    elif t2 == GeomType.CAPSULE:
        dist, pos, frame = nphase._plane_capsule_core(n, p, m, d, g2)
    elif t2 == GeomType.ELLIPSOID:
        dist, pos, frame = nphase._plane_ellipsoid_core(n, p, m, d, g2)
    elif t2 == GeomType.CYLINDER:
        dist, pos, frame = nphase._plane_cylinder_core(n, p, m, d, g2)
    elif t2 == GeomType.BOX:
        dist, pos, frame = nphase._plane_box_core(n, p, m, d, g2)
    elif t2 == GeomType.MESH:
        dist, pos, frame = gjk.plane_convex_core(n, p, m, d, g2, did2=did2)
    else:
        raise NotImplementedError(f"hfield vs {t2}")

    big = jnp.asarray(1e10, dtype=dist.dtype)
    dist = jnp.where(inside, dist, big)
    return dist, pos, frame


hfield_pair.vmap_safe = True
hfield_pair.needs_static = True


# contact capacity per other-geom type (mirrors the plane pair table)
HFIELD_NCON = {
    GeomType.SPHERE: 1,
    GeomType.CAPSULE: 2,
    GeomType.ELLIPSOID: 1,
    GeomType.CYLINDER: 4,
    GeomType.BOX: 4,
    GeomType.MESH: 4,
}
