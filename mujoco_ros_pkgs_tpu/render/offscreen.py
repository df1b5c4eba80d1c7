"""Offscreen camera streams: Hz throttling + lazy (subscriber-gated) rendering.

Mirrors the reference stream semantics (mujoco_ros/src/offscreen_camera.cpp):
per-camera topics cameras/<name>/{rgb,depth,segmented} + camera_info, config
cam_config/<name>/{stream_type,frequency,use_segid,width,height} with defaults
RGB / 15 Hz / 720x480 (offscreen_rendering.cpp:95-99), per-camera shouldRender
throttling (:159-163) and skip-when-no-subscribers laziness (:168-174).

Batched-first: each stream renders a configurable tuple of env ids in ONE
vmapped ray-cast program (the reference renders its single sim). PNG dumps
(`png_dir`) replace the viewer's lodepng screenshot path (viewer.cpp:2231-2245).
"""

from __future__ import annotations

import enum
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax

from mujoco_ros_pkgs_tpu.core.types import Data, Model
from mujoco_ros_pkgs_tpu.render import camera as rcam


class StreamType(enum.IntFlag):
    """common_types.h:50-60 stream bitmask."""
    RGB = 1
    DEPTH = 2
    SEGMENTED = 4


class OffscreenCameraStream:
    """One camera's stream state (the reference's OffscreenCamera)."""

    def __init__(self, m: Model, name: str, stream_type: int = StreamType.RGB,
                 frequency: float = 15.0, width: int = 720, height: int = 480,
                 use_segid: bool = True, env_ids: Sequence[int] = (0,),
                 png_dir: Optional[str] = None):
        self.cam_id = m.cam_names.index(name)
        self.name = name
        self.stream_type = StreamType(stream_type)
        self.frequency = frequency
        self.width = width
        self.height = height
        self.use_segid = use_segid
        self.env_ids: Tuple[int, ...] = tuple(env_ids)
        self.png_dir = png_dir
        self.last_pub_time = -1.0
        self.frame_count = 0
        self.subscribers: List[Callable] = []
        self._render_jit = None

    def should_render(self, t: float) -> bool:
        """offscreen_camera.cpp:159-163."""
        return t - self.last_pub_time >= (1.0 / self.frequency) - 1e-9

    def camera_info(self, m: Model) -> dict:
        return rcam.camera_intrinsics(m, self.cam_id, self.width, self.height)

    def render_now(self, m: Model, d_batched: Data, markers=()):
        """Render the configured envs (one vmapped program); returns
        (rgb (N,H,W,3), depth (N,H,W), seg (N,H,W)) jax arrays. `markers`
        are plugin-injected visual geoms (render/camera.RenderMarker)."""
        if self._render_jit is None:
            w, h, cid = self.width, self.height, self.cam_id
            self._render_jit = jax.jit(
                lambda dd, mk: rcam.render_batched(m, dd, cid, w, h, mk))
        idx = np.asarray(self.env_ids)
        d_sel = jax.tree_util.tree_map(lambda x: x[idx], d_batched)
        return self._render_jit(d_sel, tuple(markers))

    def render_and_publish(self, m: Model, d_batched: Data,
                           sim_time: float, markers=()) -> Optional[dict]:
        """Render + deliver to subscribers; lazy when none are attached and
        no png_dir is set (offscreen_camera.cpp:168-174)."""
        if not self.subscribers and not self.png_dir:
            return None
        if not self.should_render(sim_time):
            return None
        rgb, depth, seg = self.render_now(m, d_batched, markers)
        msg = {"time": sim_time, "camera": self.name,
               "env_ids": self.env_ids}
        if self.stream_type & StreamType.RGB:
            msg["rgb"] = np.asarray(rgb)
        if self.stream_type & StreamType.DEPTH:
            msg["depth"] = np.asarray(depth)
        if self.stream_type & StreamType.SEGMENTED:
            seg_arr = np.asarray(seg)
            if not self.use_segid:
                # rgba-coded segmentation variant
                seg_arr = seg_arr.astype(np.float32)
            msg["segmented"] = seg_arr
        self.last_pub_time = sim_time
        self.frame_count += 1
        if self.png_dir:
            self._dump_pngs(msg)
        for cb in self.subscribers:
            cb(msg)
        return msg

    def _dump_pngs(self, msg: dict) -> None:
        from mujoco_ros_pkgs_tpu.utils import png
        os.makedirs(self.png_dir, exist_ok=True)
        stem = os.path.join(self.png_dir,
                            f"{self.name}_{self.frame_count:06d}")
        for i, env in enumerate(self.env_ids):
            if "rgb" in msg:
                png.write(f"{stem}_env{env}_rgb.png", msg["rgb"][i])
            if "depth" in msg:
                png.write(f"{stem}_env{env}_depth.png", msg["depth"][i])
            if "segmented" in msg:
                # 16-bit grayscale: ids wrap at 255 in uint8 for models with
                # >=255 geoms (+ marker ids beyond ngeom); uint16 holds every
                # realistic id (-1 background maps to 0)
                seg16 = (msg["segmented"][i].astype(np.int32) + 1
                         ).astype(np.uint16)
                png.write(f"{stem}_env{env}_seg.png", seg16)


class OffscreenRenderManager:
    """All camera streams of a server (the offscreen render loop's role,
    minus the thread — rendering happens between step batches)."""

    def __init__(self, m: Model, cam_config: Optional[Dict[str, dict]] = None):
        self.streams: Dict[str, OffscreenCameraStream] = {}
        cam_config = cam_config or {}
        defaults = cam_config.get("*", {})   # applied to every camera
        for name in m.cam_names:
            cfg = {**defaults, **cam_config.get(name, {})}
            self.streams[name] = OffscreenCameraStream(
                m, name,
                stream_type=cfg.get("stream_type", StreamType.RGB),
                frequency=cfg.get("frequency", 15.0),
                width=cfg.get("width", 720),
                height=cfg.get("height", 480),
                use_segid=cfg.get("use_segid", True),
                env_ids=cfg.get("env_ids", (0,)),
                png_dir=cfg.get("png_dir"))

    def subscribe(self, name: str, cb: Callable):
        self.streams[name].subscribers.append(cb)

    def render_all(self, m: Model, d_batched: Data, sim_time: float,
                   markers=()):
        for s in self.streams.values():
            s.render_and_publish(m, d_batched, sim_time, markers)
