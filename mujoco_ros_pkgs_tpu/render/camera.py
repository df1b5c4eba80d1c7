"""Batched ray-cast offscreen cameras: RGB / depth / segmentation on TPU.

The reference renders offscreen with OpenGL + GLFW on a dedicated thread
(mujoco_ros/src/offscreen_camera.cpp, offscreen_rendering.cpp). A TPU has no
rasterizer — but it has monstrous FLOPs: we ray-cast the analytic geoms
directly (same primitives as the rangefinder sensor), fully vectorized over
pixels AND envs. Output semantics mirror OffscreenCamera:

- RGB (flat-shaded Lambert w/ headlight), DEPTH (metric, planar — the
  reference converts OpenGL depth to metric at offscreen_camera.cpp:239-249),
  SEGMENTED (geom id map, use_segid semantics);
- camera intrinsics from fovy (offscreen_camera.cpp:129-155).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from flax import struct

from mujoco_ros_pkgs_tpu.core.types import Data, Model
from mujoco_ros_pkgs_tpu.ops import math as mmath
from mujoco_ros_pkgs_tpu.ops.sensor_impl import _ray_geom, ray_local


@struct.dataclass
class RenderMarker:
    """Visual-only geom injected into a render (the reference's renderCallback
    lets plugins add mjvGeoms to the scene, plugin_utils.h:97-135). Analytic
    primitive types only (PLANE/SPHERE/CAPSULE/CYLINDER/ELLIPSOID/BOX)."""
    pos: jax.Array                                   # (3,)
    size: jax.Array                                  # (3,)
    rgba: jax.Array                                  # (4,)
    mat: jax.Array = None                            # (3,3); None = identity
    gtype: int = struct.field(pytree_node=False, default=2)  # GeomType.SPHERE


def cam_pose(m: Model, d: Data, cam_id: int):
    """World pose of a fixed camera (body-attached)."""
    b = m.cam_bodyid[cam_id]
    pos = d.xpos[b] + d.xmat[b] @ m.cam_pos[cam_id].astype(d.qpos.dtype)
    R = d.xmat[b] @ mmath.quat_to_mat(m.cam_quat[cam_id].astype(d.qpos.dtype))
    return pos, R


def camera_intrinsics(m: Model, cam_id: int, width: int, height: int):
    """fx=fy from fovy; principal point at center (camera_info equivalent)."""
    fovy = float(np.asarray(m.cam_fovy[cam_id])) * np.pi / 180.0
    f = (height / 2.0) / np.tan(fovy / 2.0)
    return dict(fx=f, fy=f, cx=width / 2.0, cy=height / 2.0,
                width=width, height=height)


def pixel_ray(m: Model, d: Data, cam_id: int, x, y, width: int, height: int):
    """World-frame ray through render pixel (x, y) — x right, y down, same
    convention as render()'s pixel grid. Returns (origin (3,), dir (3,))."""
    dtype = d.qpos.dtype
    pos, R = cam_pose(m, d, cam_id)
    fovy = m.cam_fovy[cam_id].astype(dtype) * (jnp.pi / 180.0)
    f = (height / 2.0) / jnp.tan(fovy / 2.0)
    px = (jnp.asarray(x, dtype) - width / 2.0 + 0.5) / f
    py = (height / 2.0 - jnp.asarray(y, dtype) - 0.5) / f
    dir_cam = jnp.stack([px, py, -jnp.ones((), dtype)])
    dir_cam = dir_cam / jnp.linalg.norm(dir_cam)
    return pos, R @ dir_cam


def pick(m: Model, d: Data, cam_id: int, x, y, width: int, height: int):
    """Screen-ray body selection — the watch-UI analogue of the viewer's
    mouse select (mjv_select; used by the perturbation drag at
    mujoco_ros/src/viewer.cpp:1451-1480). Returns (dist, geom_id, point):
    distance along the ray, hit geom id (-1 = background) and the world hit
    point. Pure jnp; callers jit + cache per model."""
    pos, direction = pixel_ray(m, d, cam_id, x, y, width, height)
    dtype = d.qpos.dtype
    best_t = jnp.asarray(jnp.inf, dtype=dtype)
    best_g = jnp.asarray(-1, dtype=jnp.int32)
    for g in range(m.ngeom):
        t = _ray_geom(m, d, g, pos, direction)
        hit = t < best_t
        best_t = jnp.where(hit, t, best_t)
        best_g = jnp.where(hit, jnp.asarray(g, dtype=jnp.int32), best_g)
    point = pos + jnp.where(jnp.isinf(best_t), 0.0, best_t) * direction
    return best_t, best_g, point


def render(m: Model, d: Data, cam_id: int, width: int = 720,
           height: int = 480, markers: Tuple[RenderMarker, ...] = ()):
    """Render one env's camera: returns (rgb (H,W,3) f32 0..1,
    depth (H,W) metric, seg (H,W) int32 geom id, -1 = background).

    Pure jnp — see render_batched for the vmapped multi-env path. Shading is
    Lambert with a headlight at the camera: the surface normal is recovered
    type-independently from the screen-space derivatives of the hit-point
    field (cross of dP/dx, dP/dy), so every geom type the ray caster covers
    (all 8) is shaded without per-type normal code."""
    dtype = d.qpos.dtype
    pos, R = cam_pose(m, d, cam_id)
    fovy = m.cam_fovy[cam_id].astype(dtype) * (jnp.pi / 180.0)
    f = (height / 2.0) / jnp.tan(fovy / 2.0)

    ii = jnp.arange(height, dtype=dtype)
    jj = jnp.arange(width, dtype=dtype)
    # pixel rays in camera frame: x right, y up, looking along -z (mujoco)
    px = (jj[None, :] - width / 2.0 + 0.5) / f      # (1, W)
    py = (height / 2.0 - ii[:, None] - 0.5) / f     # (H, 1)
    dirs_cam = jnp.stack([
        jnp.broadcast_to(px, (height, width)),
        jnp.broadcast_to(py, (height, width)),
        -jnp.ones((height, width), dtype=dtype)], axis=-1)
    norms = jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)
    dirs_cam = dirs_cam / norms
    dirs = dirs_cam.reshape(-1, 3) @ R.T            # (HW, 3) world

    def trace_one(direction):
        best_t = jnp.asarray(jnp.inf, dtype=dtype)
        best_g = jnp.asarray(-1, dtype=jnp.int32)
        for g in range(m.ngeom):
            t = _ray_geom(m, d, g, pos, direction)
            hit = t < best_t
            best_t = jnp.where(hit, t, best_t)
            best_g = jnp.where(hit, jnp.asarray(g, dtype=jnp.int32), best_g)
        for k, mk in enumerate(markers):    # injected visual-only geoms
            mat = (jnp.eye(3, dtype=dtype) if mk.mat is None
                   else mk.mat.astype(dtype))
            tl = mat.T @ (pos - mk.pos.astype(dtype))
            vl = mat.T @ direction
            t = ray_local(mk.gtype, mk.size.astype(dtype), tl, vl)
            hit = t < best_t
            best_t = jnp.where(hit, t, best_t)
            best_g = jnp.where(hit, jnp.asarray(m.ngeom + k, jnp.int32),
                               best_g)
        return best_t, best_g

    t, seg = jax.vmap(trace_one)(dirs)
    # planar (view-axis) metric depth, like the reference's conversion
    zcomp = -dirs_cam.reshape(-1, 3)[:, 2]
    depth = jnp.where(jnp.isinf(t), 0.0, t * norms.reshape(-1) * zcomp)

    # surface normals from screen-space hit-point derivatives
    t_img = jnp.where(jnp.isinf(t), 0.0, t).reshape(height, width)
    P = pos[None, None, :] + t_img[:, :, None] * dirs.reshape(height, width, 3)
    dPdx = jnp.diff(P, axis=1, append=P[:, -1:, :])
    dPdy = jnp.diff(P, axis=0, append=P[-1:, :, :])
    nrm = jnp.cross(dPdx, dPdy)
    nlen = jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    nrm = nrm / jnp.maximum(nlen, 1e-12)

    # Lambert with headlight: light direction = view direction
    view = dirs.reshape(height, width, 3)
    lambert = jnp.abs(jnp.einsum('hwk,hwk->hw', nrm, view))
    shade = 0.35 + 0.65 * lambert                      # ambient + diffuse

    parts = [m.geom_rgba[:, :3].astype(dtype)]
    parts += [mk.rgba[:3].astype(dtype)[None] for mk in markers]
    parts.append(jnp.array([[0.2, 0.3, 0.4]], dtype=dtype))  # background
    albedo = jnp.concatenate(parts)
    bg = m.ngeom + len(markers)
    seg_img = seg.reshape(height, width)
    base = albedo[jnp.where(seg_img < 0, bg, seg_img)]
    shade = jnp.where(seg_img < 0, 1.0, shade)
    rgb = jnp.clip(base * shade[:, :, None], 0.0, 1.0)

    return rgb, depth.reshape(height, width), seg_img


def render_batched(m: Model, d_batched: Data, cam_id: int, width: int = 720,
                   height: int = 480, markers: Tuple[RenderMarker, ...] = ()):
    """vmap(render) over the env batch axis: (N,H,W,3), (N,H,W), (N,H,W)."""
    return jax.vmap(lambda dd: render(m, dd, cam_id, width, height,
                                      markers))(d_batched)
