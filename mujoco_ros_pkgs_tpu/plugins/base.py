"""Plugin system: the reference's MujocoPlugin reborn as pure step hooks.

Reference API (mujoco_ros/include/mujoco_ros/plugin_utils.h:45-161): plugins
are dynamically loaded classes with callbacks controlCallback / passiveCallback
/ renderCallback / lastStageCallback / onGeomChanged plus load/reset, invoked
from inside mj_step via mjcb_control/mjcb_passive and after each step
(mujoco_ros/src/callbacks.cpp:131-157). Failed plugins are quarantined but
kept (plugin_utils.h:69-78).

Here a plugin contributes PURE functions fused into the single jit-compiled
batched step. Mutable plugin internals (PID integrators, noise RNG, mocap
targets) live in an explicit state pytree threaded through the step — the
functional replacement for the reference's mutable member variables.

Hook order inside one step (matches §3.2 of SURVEY.md):
    control(m, d, ps)   — mjcb_control: before actuation, inside dynamics
    passive(m, d, ps)   — mjcb_passive: after mj_passive
    last_stage(m, d, ps)— after integration, once per step (sensors publish)
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax

from mujoco_ros_pkgs_tpu.core.types import Data, Model


class MujocoPlugin:
    """Base plugin. Subclasses override any subset of the hooks.

    Config is an arbitrary dict (the XmlRpc struct of the reference,
    plugin_utils.h:51-57). `init_state` returns the plugin's state pytree.
    """

    def __init__(self, config: Optional[dict] = None):
        self.config = config or {}
        self.loaded = False          # cb-ready gate (quarantine semantics)
        self.load_error = ""

    # -- lifecycle (host-side) --
    def load(self, m: Model, d: Data) -> bool:
        """Called once after model load. Return False to quarantine."""
        return True

    def reset(self, m: Model, d: Data) -> None:
        """Called on simulation reset."""

    def init_state(self, m: Model, batch: int) -> Any:
        """Per-env plugin state pytree (already batched where needed)."""
        return ()

    # -- in-graph hooks (pure; operate on a SINGLE env, vmapped by server) --
    def control(self, m: Model, d: Data, ps: Any) -> Tuple[Data, Any]:
        return d, ps

    def passive(self, m: Model, d: Data, ps: Any) -> Tuple[Data, Any]:
        return d, ps

    def last_stage(self, m: Model, d: Data, ps: Any) -> Tuple[Data, Any]:
        return d, ps

    # -- host-side notifications --
    def on_geom_changed(self, m: Model, geom_id: int) -> None:
        """Reference: onGeomChanged (plugin_utils.h:135)."""

    # -- render hook (renderCallback, plugin_utils.h:97-135): called before
    # offscreen streams render. Return a list of RenderMarker to inject
    # visual-only geoms into the rendered scene (the reference's plugins add
    # mjvGeoms to the scene the same way); return None/[] for none. --
    def render_callback(self, m: Model, d_batched: Data,
                        sim_time: float) -> Optional[list]:
        return None


class PluginRegistry:
    """Ordered plugin set with quarantine semantics (plugin_utils.cpp:83-112).

    A plugin whose load() fails stays registered but is excluded from the
    callback-ready set — mirroring `plugins_` vs `cb_ready_plugins_`."""

    def __init__(self):
        self.plugins: List[MujocoPlugin] = []

    def register(self, plugin: MujocoPlugin, m: Model, d: Data) -> bool:
        self.plugins.append(plugin)
        try:
            ok = plugin.load(m, d)
        except Exception as exc:  # quarantine, don't kill the server
            plugin.load_error = str(exc)
            ok = False
        plugin.loaded = bool(ok)
        return plugin.loaded

    @property
    def cb_ready(self) -> List[MujocoPlugin]:
        return [p for p in self.plugins if p.loaded]

    def init_states(self, m: Model, batch: int) -> Tuple[Any, ...]:
        return tuple(p.init_state(m, batch) for p in self.cb_ready)

    def reset_all(self, m: Model, d: Data) -> None:
        # failed plugins are skipped on reset (mujoco_env.cpp:428-432)
        for p in self.cb_ready:
            p.reset(m, d)

    # fused hook builders — these close over the ready set at trace time
    def control_hook(self):
        ready = self.cb_ready
        if not ready:
            return None

        def hook(m, d, states):
            out = []
            for p, ps in zip(ready, states):
                d, nps = p.control(m, d, ps)
                out.append(nps)
            return d, tuple(out)
        return hook

    def passive_hook(self):
        ready = self.cb_ready
        if not ready:
            return None

        def hook(m, d, states):
            out = []
            for p, ps in zip(ready, states):
                d, nps = p.passive(m, d, ps)
                out.append(nps)
            return d, tuple(out)
        return hook

    def last_stage_hook(self):
        ready = self.cb_ready
        if not ready:
            return None

        def hook(m, d, states):
            out = []
            for p, ps in zip(ready, states):
                d, nps = p.last_stage(m, d, ps)
                out.append(nps)
            return d, tuple(out)
        return hook

    def run_render_callbacks(self, m: Model, d_batched: Data,
                             sim_time: float) -> list:
        """runRenderCbs fan-out (callbacks.cpp:145-150): collect visual
        markers contributed by plugins for the next offscreen render."""
        markers = []
        for p in self.cb_ready:
            out = p.render_callback(m, d_batched, sim_time)
            if out:
                markers.extend(out)
        return markers
