"""Offscreen camera streams: Hz throttling + lazy (subscriber-gated) rendering.

Mirrors the reference stream semantics (mujoco_ros/src/offscreen_camera.cpp):
per-camera topics cameras/<name>/{rgb,depth,segmented} + camera_info, config
cam_config/<name>/{stream_type,frequency,use_segid,width,height} with defaults
RGB / 15 Hz / 720x480 (offscreen_rendering.cpp:82-99), per-camera shouldRender
throttling (:159-163) and skip-when-no-subscribers laziness (:168-174).
"""

from __future__ import annotations

import enum
from typing import Callable, Dict, List, Optional

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
                 frequency: float = 15.0, width: int = 72, height: int = 48,
                 use_segid: bool = True):
        self.cam_id = m.cam_names.index(name)
        self.name = name
        self.stream_type = StreamType(stream_type)
        self.frequency = frequency
        self.width = width
        self.height = height
        self.use_segid = use_segid
        self.last_pub_time = -1.0
        self.subscribers: List[Callable] = []
        self._render_jit = None

    def should_render(self, t: float) -> bool:
        """offscreen_camera.cpp:159-163."""
        return t - self.last_pub_time >= (1.0 / self.frequency) - 1e-9

    def camera_info(self, m: Model) -> dict:
        return rcam.camera_intrinsics(m, self.cam_id, self.width, self.height)

    def render_and_publish(self, m: Model, d_batched: Data, env_id: int,
                           sim_time: float) -> Optional[dict]:
        """Render + deliver to subscribers; lazy when none are attached
        (offscreen_camera.cpp:168-174)."""
        if not self.subscribers:
            return None
        if not self.should_render(sim_time):
            return None
        if self._render_jit is None:
            w, h, cid = self.width, self.height, self.cam_id
            self._render_jit = jax.jit(
                lambda dd: rcam.render(m, dd, cid, w, h))
        d1 = jax.tree_util.tree_map(lambda x: x[env_id], d_batched)
        rgb, depth, seg = self._render_jit(d1)
        msg = {"time": sim_time, "camera": self.name}
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
        for cb in self.subscribers:
            cb(msg)
        return msg


class OffscreenRenderManager:
    """All camera streams of a server (the offscreen render loop's role,
    minus the thread — rendering happens between step batches)."""

    def __init__(self, m: Model, cam_config: Optional[Dict[str, dict]] = None):
        self.streams: Dict[str, OffscreenCameraStream] = {}
        cam_config = cam_config or {}
        for name in m.cam_names:
            cfg = cam_config.get(name, {})
            self.streams[name] = OffscreenCameraStream(
                m, name,
                stream_type=cfg.get("stream_type", StreamType.RGB),
                frequency=cfg.get("frequency", 15.0),
                width=cfg.get("width", 72),
                height=cfg.get("height", 48),
                use_segid=cfg.get("use_segid", True))

    def subscribe(self, name: str, cb: Callable):
        self.streams[name].subscribers.append(cb)

    def render_all(self, m: Model, d_batched: Data, sim_time: float,
                   env_id: int = 0):
        for s in self.streams.values():
            s.render_and_publish(m, d_batched, env_id, sim_time)
