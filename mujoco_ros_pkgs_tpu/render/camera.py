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

from mujoco_ros_pkgs_tpu.core.types import Data, Model
from mujoco_ros_pkgs_tpu.ops import math as mmath
from mujoco_ros_pkgs_tpu.ops.sensor_impl import _ray_geom


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


def render(m: Model, d: Data, cam_id: int, width: int = 64, height: int = 64):
    """Render one env's camera: returns (rgb (H,W,3) f32 0..1,
    depth (H,W) metric, seg (H,W) int32 geom id, -1 = background).

    Pure jnp — jit/vmap over envs for batched streams."""
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
        return best_t, best_g

    t, seg = jax.vmap(trace_one)(dirs)
    # planar (view-axis) metric depth, like the reference's conversion
    zcomp = -dirs_cam.reshape(-1, 3)[:, 2]
    depth = jnp.where(jnp.isinf(t), 0.0, t * norms.reshape(-1) * zcomp)

    # flat shading: albedo from geom rgba, headlight along the view direction
    albedo = jnp.concatenate([m.geom_rgba[:, :3].astype(dtype),
                              jnp.array([[0.2, 0.3, 0.4]], dtype=dtype)])
    base = albedo[jnp.where(seg < 0, m.ngeom, seg)]
    shade = jnp.where(seg < 0, 1.0, 1.0)
    # cheap diffuse cue: darken with depth
    atten = jnp.where(seg < 0, 1.0, 1.0 / (1.0 + 0.04 * depth))
    rgb = base * (shade * atten)[:, None]

    return (rgb.reshape(height, width, 3),
            depth.reshape(height, width),
            seg.reshape(height, width))
