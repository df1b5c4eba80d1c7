"""Sensor evaluation: mj_sensorPos / mj_sensorVel / mj_sensorAcc analogues.

Covers the sensor types the reference sensors plugin string-maps
(mujoco_ros_sensors/src/mujoco_sensor_handler_plugin.cpp:70-105): touch,
accelerometer, velocimeter, gyro, force, torque, magnetometer, rangefinder,
joint*, tendon*, actuator*, ball*, framepos/quat/axes/vel/acc, subtree*, clock.
Frame resolution (site frame, parent-body, optional ref frame) mirrors
initSensors (mujoco_sensor_handler_plugin.cpp:439-599).

Raw (ground-truth) values go into d.sensordata; Gaussian noise + cutoff
scaling are plugin-level concerns (plugins/sensors.py), matching the
reference's noisy-topic vs _GT-topic split.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import (
    Data, GeomType, JointType, Model, ObjType, SensorType,
)
from mujoco_ros_pkgs_tpu.ops import math as mmath

_TEN = 100   # objtype codes used by the compiler for tendon/actuator refs
_ACT = 200


def _obj_pos_mat(m: Model, d: Data, objtype: int, objid: int):
    if objtype == int(ObjType.BODY):
        return d.xipos[objid], d.ximat[objid]
    if objtype == int(ObjType.XBODY):
        return d.xpos[objid], d.xmat[objid]
    if objtype == int(ObjType.SITE):
        return d.site_xpos[objid], d.site_xmat[objid]
    if objtype == int(ObjType.GEOM):
        return d.geom_xpos[objid], d.geom_xmat[objid]
    raise ValueError(f"unsupported sensor objtype {objtype}")


def _obj_bodyid(m: Model, objtype: int, objid: int) -> int:
    if objtype in (int(ObjType.BODY), int(ObjType.XBODY)):
        return objid
    if objtype == int(ObjType.SITE):
        return m.site_bodyid[objid]
    if objtype == int(ObjType.GEOM):
        return m.geom_bodyid[objid]
    raise ValueError(f"unsupported sensor objtype {objtype}")


def _obj_vel6(m: Model, d: Data, objtype: int, objid: int, local_mat=None):
    """mj_objectVelocity: [ang, lin] at object origin, world orientation
    (or rotated into local_mat's frame if given)."""
    body = _obj_bodyid(m, objtype, objid)
    pos, _ = _obj_pos_mat(m, d, objtype, objid)
    ref = d.subtree_com[m.body_rootid[body]]
    cv = d.cvel[body]
    ang = cv[:3]
    lin = cv[3:] + jnp.cross(ang, pos - ref)
    if local_mat is not None:
        ang = local_mat.T @ ang
        lin = local_mat.T @ lin
    return ang, lin


def _rne_post(m: Model, d: Data):
    """mj_rnePostConstraint subset: per-body classical-ish spatial acceleration
    cacc (with qacc, gravity) and interaction forces for force/torque sensors."""
    dtype = d.qpos.dtype
    gravity = m.opt.gravity.astype(dtype)
    cacc = [jnp.concatenate([jnp.zeros(3, dtype=dtype), -gravity])]
    for b in range(1, m.nbody):
        a = cacc[m.body_parentid[b]]
        adr, n = m.body_dofadr[b], m.body_dofnum[b]
        if n:
            a = (a + d.cdof_dot[adr:adr + n].T @ d.qvel[adr:adr + n]
                 + d.cdof[adr:adr + n].T @ d.qacc[adr:adr + n])
        cacc.append(a)
    # cfrc_int: force each body receives from its parent (about subtree com ref)
    cfrc = []
    for b in range(m.nbody):
        fb = (mmath.inert_vec_mul(d.cinert[b], cacc[b])
              + mmath.force_cross(d.cvel[b],
                                  mmath.inert_vec_mul(d.cinert[b], d.cvel[b])))
        cfrc.append(fb)
    # subtract external/constraint forces? mj_rnePostConstraint folds
    # contact/constraint forces into cfrc_ext; for the force/torque sensor we
    # accumulate child interaction forces up the tree:
    cfrc_int = list(cfrc)
    for b in range(m.nbody - 1, 0, -1):
        cfrc_int[m.body_parentid[b]] = cfrc_int[m.body_parentid[b]] + cfrc_int[b]
    return cacc, cfrc_int


def _site_acc(m: Model, d: Data, cacc, site: int):
    """Classical linear acceleration at a site (incl. gravity via cacc[0])."""
    body = m.site_bodyid[site]
    ref = d.subtree_com[m.body_rootid[body]]
    pos = d.site_xpos[site]
    cv, ca = d.cvel[body], cacc[body]
    w = cv[:3]
    v_p = cv[3:] + jnp.cross(w, pos - ref)
    a_p = ca[3:] + jnp.cross(ca[:3], pos - ref) + jnp.cross(w, v_p)
    return a_p, ca[:3]   # linear (classical), angular


# ---------------------------------------------------------------------------
# ray casting (rangefinder)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=64)
def _hull_faces_cached(vert_bytes: bytes, nvert: int) -> np.ndarray:
    verts = np.frombuffer(vert_bytes, dtype=np.float64).reshape(nvert, 3)
    from scipy.spatial import ConvexHull
    return np.ascontiguousarray(ConvexHull(verts).simplices.astype(np.int32))


def _hull_faces(m: Model, did: int) -> np.ndarray:
    """Triangulated hull faces (F,3 vertex indices) of mesh `did`, computed
    host-side once per mesh (the renderer/rangefinder needs faces; collision
    uses only the support function over vertices)."""
    nv = m.mesh_vertnum[did]
    verts = np.asarray(m.mesh_vert[did, :nv], dtype=np.float64)
    return _hull_faces_cached(verts.tobytes(), nv)


def _ray_geom(m: Model, d: Data, g: int, origin, direction):
    """Distance along ray to geom g, or +inf. Covers ALL 8 geom types
    (reference delegates to mj_ray which likewise handles every type):
    plane/sphere/capsule/box analytic, cylinder side+caps, ellipsoid via
    scaled quadratic, mesh via Möller-Trumbore over hull triangles, hfield
    via fixed-step march + bisection refinement on the bilinear surface."""
    dtype = origin.dtype
    inf = jnp.asarray(jnp.inf, dtype=dtype)
    t = d.geom_xmat[g].T @ (origin - d.geom_xpos[g])
    v = d.geom_xmat[g].T @ direction
    gt = m.geom_type[g]
    size = m.geom_size[g]
    if gt == int(GeomType.MESH):
        did = m.geom_dataid[g]
        faces = _hull_faces(m, did)                       # (F,3) static
        verts = m.mesh_vert[did, : m.mesh_vertnum[did]].astype(dtype)
        tri = verts[faces]                                # (F,3,3)
        return _ray_triangles(t, v, tri, inf)
    if gt == int(GeomType.HFIELD):
        return _ray_hfield(m, g, t, v, inf)
    return ray_local(gt, size, t, v)


def ray_local(gt: int, size, t, v):
    """Ray vs analytic primitive in the geom's LOCAL frame: t = R^T(o - p),
    v = R^T dir. Shared by geom rays and injected render markers."""
    dtype = t.dtype
    inf = jnp.asarray(jnp.inf, dtype=dtype)
    if gt == int(GeomType.PLANE):
        denom = v[2]
        dist = -t[2] / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
        ok = (jnp.abs(denom) > 1e-12) & (dist >= 0)
        # finite plane extent check (size 0 = infinite)
        p = t + dist * v
        in_x = (size[0] <= 0) | (jnp.abs(p[0]) <= size[0])
        in_y = (size[1] <= 0) | (jnp.abs(p[1]) <= size[1])
        return jnp.where(ok & in_x & in_y, dist, inf)
    if gt == int(GeomType.SPHERE):
        return _ray_sphere(t, v, size[0], inf)
    if gt == int(GeomType.CAPSULE):
        d_cyl = _ray_cylinder_side(t, v, size[0], size[1], inf)
        d_c1 = _ray_sphere(t - jnp.array([0, 0, 1], dtype=dtype) * size[1], v,
                           size[0], inf)
        d_c2 = _ray_sphere(t + jnp.array([0, 0, 1], dtype=dtype) * size[1], v,
                           size[0], inf)
        return jnp.minimum(d_cyl, jnp.minimum(d_c1, d_c2))
    if gt == int(GeomType.BOX):
        # slab method
        tmin, tmax = jnp.asarray(0.0, dtype=dtype), inf
        for ax in range(3):
            va = jnp.where(jnp.abs(v[ax]) > 1e-12, v[ax], 1e-12)
            t1 = (-size[ax] - t[ax]) / va
            t2 = (size[ax] - t[ax]) / va
            lo, hi = jnp.minimum(t1, t2), jnp.maximum(t1, t2)
            tmin, tmax = jnp.maximum(tmin, lo), jnp.minimum(tmax, hi)
        return jnp.where(tmax >= tmin, tmin, inf)
    if gt == int(GeomType.CYLINDER):
        d_side = _ray_cylinder_side(t, v, size[0], size[1], inf)
        # cap disks at z = ±h
        vz = jnp.where(jnp.abs(v[2]) > 1e-12, v[2], 1e-12)
        d_caps = inf
        for sgn in (1.0, -1.0):
            dc = (sgn * size[1] - t[2]) / vz
            p = t + dc * v
            ok = ((jnp.abs(v[2]) > 1e-12) & (dc >= 0)
                  & (p[0] ** 2 + p[1] ** 2 <= size[0] ** 2))
            d_caps = jnp.minimum(d_caps, jnp.where(ok, dc, inf))
        return jnp.minimum(d_side, d_caps)
    if gt == int(GeomType.ELLIPSOID):
        # quadratic of the scaled-space unit sphere
        ts, vs = t / size, v / size
        a = jnp.dot(vs, vs)
        b = jnp.dot(ts, vs)
        c = jnp.dot(ts, ts) - 1.0
        disc = b * b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        a_safe = jnp.maximum(a, 1e-12)
        d1 = (-b - sq) / a_safe
        d2 = (-b + sq) / a_safe
        dist = jnp.where(d1 >= 0, d1, d2)
        return jnp.where((disc >= 0) & (dist >= 0), dist, inf)
    return inf


def _ray_triangles(t, v, tri, inf):
    """Möller-Trumbore over a triangle batch (F,3,3); min positive hit."""
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    e1 = v1 - v0
    e2 = v2 - v0
    h = jnp.cross(jnp.broadcast_to(v, e2.shape), e2)
    a = jnp.einsum('fk,fk->f', e1, h)
    a_safe = jnp.where(jnp.abs(a) > 1e-12, a, 1e-12)
    s = t[None, :] - v0
    u = jnp.einsum('fk,fk->f', s, h) / a_safe
    q = jnp.cross(s, e1)
    w = jnp.einsum('k,fk->f', v, q) / a_safe
    dist = jnp.einsum('fk,fk->f', e2, q) / a_safe
    ok = ((jnp.abs(a) > 1e-12) & (u >= 0) & (w >= 0) & (u + w <= 1)
          & (dist >= 0))
    return jnp.min(jnp.where(ok, dist, inf))


_HF_MARCH_STEPS = 64
_HF_REFINE_STEPS = 10


def _ray_hfield(m: Model, g: int, t, v, inf):
    """Ray vs bilinear height field: clip the ray to the field's AABB, march
    fixed steps to bracket the first surface crossing, bisect to refine.
    Fixed trip counts — vmap/TPU friendly (the exact prism-walk of mj_ray is
    data-dependent)."""
    from mujoco_ros_pkgs_tpu.ops import hfield as hf
    dtype = t.dtype
    hid = m.geom_dataid[g]
    size = m.hfield_size[hid].astype(dtype)   # rx, ry, top, bottom

    # AABB of the field volume: x ±rx, y ±ry, z in [-bottom, top]
    lo = jnp.stack([-size[0], -size[1], -size[3]])
    hi = jnp.stack([size[0], size[1], size[2]])
    tmin, tmax = jnp.asarray(0.0, dtype), jnp.asarray(1e9, dtype)
    for ax in range(3):
        va = jnp.where(jnp.abs(v[ax]) > 1e-12, v[ax], 1e-12)
        t1 = (lo[ax] - t[ax]) / va
        t2 = (hi[ax] - t[ax]) / va
        tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
        tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
    miss_box = tmax < tmin

    def above(s):     # ray point at param s is above the surface?
        p = t + s * v
        z, _, _ = hf.sample_height(m, hid, p[0], p[1])
        return p[2] >= z

    ss = tmin + (tmax - tmin) * jnp.linspace(0.0, 1.0, _HF_MARCH_STEPS
                                             ).astype(dtype)
    below = ~jax.vmap(above)(ss)
    first = jnp.argmax(below)                 # first sample below surface
    hit_march = jnp.any(below) & ~above(ss[0])  # started below: hit at entry
    any_cross = jnp.any(below)
    s_lo = jnp.where(first > 0, ss[jnp.maximum(first - 1, 0)], ss[0])
    s_hi = ss[first]
    for _ in range(_HF_REFINE_STEPS):
        mid = 0.5 * (s_lo + s_hi)
        ab = above(mid)
        s_lo = jnp.where(ab, mid, s_lo)
        s_hi = jnp.where(ab, s_hi, mid)
    dist = jnp.where(hit_march, ss[0], 0.5 * (s_lo + s_hi))
    ok = any_cross & ~miss_box
    return jnp.where(ok, dist, inf)


def _ray_sphere(t, v, r, inf):
    b = jnp.dot(t, v)
    c = jnp.dot(t, t) - r * r
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    d1 = -b - sq
    d2 = -b + sq
    dist = jnp.where(d1 >= 0, d1, d2)
    return jnp.where((disc >= 0) & (dist >= 0), dist, inf)


def _ray_cylinder_side(t, v, r, h, inf):
    a = v[0] * v[0] + v[1] * v[1]
    b = t[0] * v[0] + t[1] * v[1]
    c = t[0] * t[0] + t[1] * t[1] - r * r
    disc = b * b - a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a > 1e-12, a, 1e-12)
    d1 = (-b - sq) / a_safe
    d2 = (-b + sq) / a_safe
    ok1 = (d1 >= 0) & (jnp.abs(t[2] + d1 * v[2]) <= h)
    ok2 = (d2 >= 0) & (jnp.abs(t[2] + d2 * v[2]) <= h)
    dist = jnp.where(ok1, d1, jnp.where(ok2, d2, inf))
    return jnp.where((disc >= 0) & (a > 1e-12), dist, inf)


def _rangefinder(m: Model, d: Data, site: int):
    origin = d.site_xpos[site]
    direction = d.site_xmat[site][:, 2]
    body = m.site_bodyid[site]
    dtype = origin.dtype
    best = jnp.asarray(jnp.inf, dtype=dtype)
    for g in range(m.ngeom):
        if m.geom_bodyid[g] == body:
            continue  # exclude own body (mujoco excludes the site's body)
        best = jnp.minimum(best, _ray_geom(m, d, g, origin, direction))
    return jnp.where(jnp.isinf(best), jnp.asarray(-1.0, dtype=dtype), best)


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def sensor_pos(m: Model, d: Data) -> Data:
    sd = d.sensordata
    for i in range(m.nsensor):
        st, ot, oid = m.sensor_type[i], m.sensor_objtype[i], m.sensor_objid[i]
        rt, rid = m.sensor_reftype[i], m.sensor_refid[i]
        adr = m.sensor_adr[i]
        if st == int(SensorType.FRAMEPOS):
            pos, _ = _obj_pos_mat(m, d, ot, oid)
            if rid >= 0:
                rpos, rmat = _obj_pos_mat(m, d, rt, rid)
                pos = rmat.T @ (pos - rpos)
            sd = sd.at[adr:adr + 3].set(pos)
        elif st == int(SensorType.FRAMEQUAT):
            _, mat = _obj_pos_mat(m, d, ot, oid)
            q = mmath.mat_to_quat(mat)
            if rid >= 0:
                _, rmat = _obj_pos_mat(m, d, rt, rid)
                q = mmath.quat_mul(mmath.quat_conj(mmath.mat_to_quat(rmat)), q)
            sd = sd.at[adr:adr + 4].set(q)
        elif st in (int(SensorType.FRAMEXAXIS), int(SensorType.FRAMEYAXIS),
                    int(SensorType.FRAMEZAXIS)):
            _, mat = _obj_pos_mat(m, d, ot, oid)
            ax = mat[:, st - int(SensorType.FRAMEXAXIS)]
            if rid >= 0:
                _, rmat = _obj_pos_mat(m, d, rt, rid)
                ax = rmat.T @ ax
            sd = sd.at[adr:adr + 3].set(ax)
        elif st == int(SensorType.JOINTPOS):
            sd = sd.at[adr].set(d.qpos[m.jnt_qposadr[oid]])
        elif st == int(SensorType.BALLQUAT):
            q = mmath.normalize(d.qpos[m.jnt_qposadr[oid]:m.jnt_qposadr[oid] + 4])
            sd = sd.at[adr:adr + 4].set(q)
        elif st == int(SensorType.TENDONPOS):
            sd = sd.at[adr].set(d.ten_length[oid])
        elif st == int(SensorType.ACTUATORPOS):
            sd = sd.at[adr].set(d.actuator_length[oid])
        elif st == int(SensorType.JOINTLIMITPOS):
            j = oid
            dist_lo = d.qpos[m.jnt_qposadr[j]] - m.jnt_range[j, 0]
            dist_hi = m.jnt_range[j, 1] - d.qpos[m.jnt_qposadr[j]]
            dist = jnp.minimum(dist_lo, dist_hi) - m.jnt_margin[j]
            sd = sd.at[adr].set(jnp.minimum(dist, 0.0))
        elif st == int(SensorType.TENDONLIMITPOS):
            t = oid
            dist_lo = d.ten_length[t] - m.tendon_range[t, 0]
            dist_hi = m.tendon_range[t, 1] - d.ten_length[t]
            dist = jnp.minimum(dist_lo, dist_hi) - m.tendon_margin[t]
            sd = sd.at[adr].set(jnp.minimum(dist, 0.0))
        elif st == int(SensorType.SUBTREECOM):
            sd = sd.at[adr:adr + 3].set(d.subtree_com[oid])
        elif st == int(SensorType.MAGNETOMETER):
            mag = d.site_xmat[oid].T @ m.opt.magnetic.astype(d.qpos.dtype)
            sd = sd.at[adr:adr + 3].set(mag)
        elif st == int(SensorType.RANGEFINDER):
            sd = sd.at[adr].set(_rangefinder(m, d, oid))
        elif st == int(SensorType.CLOCK):
            sd = sd.at[adr].set(d.time)
    return d.replace(sensordata=sd)


def sensor_vel(m: Model, d: Data) -> Data:
    sd = d.sensordata
    for i in range(m.nsensor):
        st, ot, oid = m.sensor_type[i], m.sensor_objtype[i], m.sensor_objid[i]
        rt, rid = m.sensor_reftype[i], m.sensor_refid[i]
        adr = m.sensor_adr[i]
        if st == int(SensorType.VELOCIMETER):
            _, lin = _obj_vel6(m, d, int(ObjType.SITE), oid,
                               local_mat=d.site_xmat[oid])
            sd = sd.at[adr:adr + 3].set(lin)
        elif st == int(SensorType.GYRO):
            ang, _ = _obj_vel6(m, d, int(ObjType.SITE), oid,
                               local_mat=d.site_xmat[oid])
            sd = sd.at[adr:adr + 3].set(ang)
        elif st == int(SensorType.JOINTVEL):
            sd = sd.at[adr].set(d.qvel[m.jnt_dofadr[oid]])
        elif st == int(SensorType.BALLANGVEL):
            v = d.qvel[m.jnt_dofadr[oid]:m.jnt_dofadr[oid] + 3]
            sd = sd.at[adr:adr + 3].set(v)
        elif st == int(SensorType.TENDONVEL):
            sd = sd.at[adr].set(d.ten_velocity[oid])
        elif st == int(SensorType.ACTUATORVEL):
            sd = sd.at[adr].set(d.actuator_velocity[oid])
        elif st in (int(SensorType.FRAMELINVEL), int(SensorType.FRAMEANGVEL)):
            ang, lin = _obj_vel6(m, d, ot, oid)
            val = lin if st == int(SensorType.FRAMELINVEL) else ang
            if rid >= 0:
                # relative velocity in ref frame (mujoco semantics)
                rang, rlin = _obj_vel6(m, d, rt, rid)
                _, rmat = _obj_pos_mat(m, d, rt, rid)
                pos, _ = _obj_pos_mat(m, d, ot, oid)
                rpos, _ = _obj_pos_mat(m, d, rt, rid)
                if st == int(SensorType.FRAMELINVEL):
                    rel = lin - rlin - jnp.cross(rang, pos - rpos)
                else:
                    rel = ang - rang
                val = rmat.T @ rel
            sd = sd.at[adr:adr + 3].set(val)
        elif st == int(SensorType.SUBTREELINVEL):
            # momentum / mass of subtree
            mom = jnp.zeros(3, dtype=d.qpos.dtype)
            for b in range(oid, m.nbody):
                if not _in_subtree(m, b, oid):
                    continue
                cv = d.cvel[b]
                ref = d.subtree_com[m.body_rootid[b]]
                v_com = cv[3:] + jnp.cross(cv[:3], d.xipos[b] - ref)
                mom = mom + m.body_mass[b] * v_com
            sd = sd.at[adr:adr + 3].set(mom / jnp.maximum(
                m.body_subtreemass[oid], mmath.MINVAL))
        elif st == int(SensorType.SUBTREEANGMOM):
            com = d.subtree_com[oid]
            am = jnp.zeros(3, dtype=d.qpos.dtype)
            for b in range(oid, m.nbody):
                if not _in_subtree(m, b, oid):
                    continue
                cv = d.cvel[b]
                ref = d.subtree_com[m.body_rootid[b]]
                w = cv[:3]
                v_com = cv[3:] + jnp.cross(w, d.xipos[b] - ref)
                I_w = d.ximat[b] @ jnp.diag(m.body_inertia[b]) @ d.ximat[b].T
                am = am + I_w @ w + m.body_mass[b] * jnp.cross(
                    d.xipos[b] - com, v_com)
            sd = sd.at[adr:adr + 3].set(am)
        elif st in (int(SensorType.JOINTLIMITVEL), int(SensorType.TENDONLIMITVEL)):
            sd = sd.at[adr].set(_limit_row_value(m, d, st, oid, 'vel'))
    return d.replace(sensordata=sd)


def _in_subtree(m: Model, body: int, root: int) -> bool:
    b = body
    while b > 0:
        if b == root:
            return True
        b = m.body_parentid[b]
    return root == 0


def _limit_row_value(m, d, st, oid, what):
    """Joint/tendon limit velocity/force sensors via the efc rows."""
    from mujoco_ros_pkgs_tpu.ops import efc as efcmod
    # cheap recompute of the limit row J for this joint/tendon
    dtype = d.qpos.dtype
    if st in (int(SensorType.JOINTLIMITVEL), int(SensorType.JOINTLIMITFRC)):
        vadr = m.jnt_dofadr[oid]
        qadr = m.jnt_qposadr[oid]
        dist_lo = d.qpos[qadr] - m.jnt_range[oid, 0]
        dist_hi = m.jnt_range[oid, 1] - d.qpos[qadr]
        sgn = jnp.where(dist_lo < dist_hi, 1.0, -1.0)
        active = jnp.minimum(dist_lo, dist_hi) < m.jnt_margin[oid]
        vel = sgn * d.qvel[vadr]
        return jnp.where(active, vel, 0.0)
    else:
        t = oid
        L = d.ten_length[t]
        dist_lo = L - m.tendon_range[t, 0]
        dist_hi = m.tendon_range[t, 1] - L
        sgn = jnp.where(dist_lo < dist_hi, 1.0, -1.0)
        active = jnp.minimum(dist_lo, dist_hi) < m.tendon_margin[t]
        vel = sgn * (d.ten_J[t] @ d.qvel)
        return jnp.where(active, vel, 0.0)


def sensor_acc(m: Model, d: Data) -> Data:
    needs_rnepost = any(
        t in (int(SensorType.ACCELEROMETER), int(SensorType.FORCE),
              int(SensorType.TORQUE), int(SensorType.FRAMELINACC),
              int(SensorType.FRAMEANGACC))
        for t in m.sensor_type)
    cacc = cfrc_int = None
    if needs_rnepost:
        cacc, cfrc_int = _rne_post(m, d)

    sd = d.sensordata
    for i in range(m.nsensor):
        st, ot, oid = m.sensor_type[i], m.sensor_objtype[i], m.sensor_objid[i]
        adr = m.sensor_adr[i]
        if st == int(SensorType.ACCELEROMETER):
            a_lin, _ = _site_acc(m, d, cacc, oid)
            sd = sd.at[adr:adr + 3].set(d.site_xmat[oid].T @ a_lin)
        elif st == int(SensorType.FORCE):
            body = m.site_bodyid[oid]
            ref = d.subtree_com[m.body_rootid[body]]
            f = mmath.transform_force(cfrc_int[body], d.site_xpos[oid], ref)
            sd = sd.at[adr:adr + 3].set(d.site_xmat[oid].T @ f[3:])
        elif st == int(SensorType.TORQUE):
            body = m.site_bodyid[oid]
            ref = d.subtree_com[m.body_rootid[body]]
            f = mmath.transform_force(cfrc_int[body], d.site_xpos[oid], ref)
            sd = sd.at[adr:adr + 3].set(d.site_xmat[oid].T @ f[:3])
        elif st == int(SensorType.ACTUATORFRC):
            sd = sd.at[adr].set(d.actuator_force[oid])
        elif st in (int(SensorType.FRAMELINACC), int(SensorType.FRAMEANGACC)):
            body = _obj_bodyid(m, ot, oid)
            pos, _ = _obj_pos_mat(m, d, ot, oid)
            ref = d.subtree_com[m.body_rootid[body]]
            cv, ca = d.cvel[body], cacc[body]
            w = cv[:3]
            v_p = cv[3:] + jnp.cross(w, pos - ref)
            a_p = ca[3:] + jnp.cross(ca[:3], pos - ref) + jnp.cross(w, v_p)
            val = a_p if st == int(SensorType.FRAMELINACC) else ca[:3]
            sd = sd.at[adr:adr + 3].set(val)
        elif st == int(SensorType.TOUCH):
            # sum of normal contact forces on the site's body
            body = m.site_bodyid[oid]
            total = jnp.zeros((), dtype=d.qpos.dtype)
            c = d.contact
            rank = 0
            gb = jnp.asarray(np.array(m.geom_bodyid))
            for ci in range(len(c.geom1)):
                if c.geom1[ci] == -2:
                    # broadphase-compacted slot: traced membership test
                    db1 = gb[c.dyn_pair[rank, 0]]
                    db2 = gb[c.dyn_pair[rank, 1]]
                    rank += 1
                    hit = (db1 == body) | (db2 == body)
                    total = total + jnp.where(
                        hit, _contact_normal_force(m, d, ci), 0.0)
                    continue
                if c.geom1[ci] < 0:
                    continue
                b1 = m.geom_bodyid[c.geom1[ci]]
                b2 = m.geom_bodyid[c.geom2[ci]]
                if body not in (b1, b2):
                    continue
                total = total + _contact_normal_force(m, d, ci)
            sd = sd.at[adr].set(total)
        elif st in (int(SensorType.JOINTLIMITFRC),
                    int(SensorType.TENDONLIMITFRC)):
            from mujoco_ros_pkgs_tpu.ops import efc as efcmod
            layout = efcmod.row_layout(m)
            key = ('lim_jnt' if st == int(SensorType.JOINTLIMITFRC)
                   else 'lim_ten')
            row = layout[key].get(oid)
            if row is not None and d.efc_force_contact.shape[0] >= layout['nrow']:
                sd = sd.at[adr].set(d.efc_force_contact[row])
            else:
                sd = sd.at[adr].set(jnp.zeros((), dtype=d.qpos.dtype))
    return d.replace(sensordata=sd)


def _contact_normal_force(m: Model, d: Data, ci: int):
    """Normal force of contact slot ci from the stored efc force vector.
    Elliptic: the normal row's force. Pyramidal: sum of facet forces (each
    facet jacobian carries the normal with unit coefficient)."""
    from mujoco_ros_pkgs_tpu.ops import efc as efcmod
    layout = efcmod.row_layout(m)           # static, trace-time
    if ci >= len(layout['con']) or d.efc_force_contact.shape[0] < layout['nrow']:
        return jnp.zeros((), dtype=d.qpos.dtype)
    base = layout['con'][ci]
    if layout['pyramidal'] and layout['con_nrows'][ci] > 1:
        frc = jnp.sum(jax.lax.dynamic_slice(
            d.efc_force_contact, (base,), (layout['con_nrows'][ci],)))
    else:
        frc = d.efc_force_contact[base]
    active = d.contact.dist[ci] < d.contact.includemargin[ci]
    return jnp.where(active, frc, 0.0)
