"""Sensors plugin: noisy + ground-truth sensor readout with runtime-registered
Gaussian noise models — mujoco_ros_sensors reborn.

Reference behavior (mujoco_ros_sensors/src/mujoco_sensor_handler_plugin.cpp):
- publishes, once per server step (lastStageCallback), for every sensor a noisy
  value topic `<name>` and a ground-truth topic `<name>_GT`; GT is suppressed
  in eval mode (:64-68,230,262);
- reading = sensordata[adr] / cutoff when cutoff > 0 (:175-437);
- noise: val + N(0,1)*std + mean per dim, enabled by set_flag bits 0x01/02/04
  (:233-269); quaternion sensors get an RPY Euler perturbation quaternion
  composed onto the reading (:393-425);
- noise models registered at runtime via service `sensors/register_noise_models`
  (admin-hash gated in eval mode, :123-173).

Here the noisy/GT values are computed IN-GRAPH per env (vmapped); the server's
control plane exposes register_noise_models and reads the outputs as arrays.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import Data, Model, SensorType
from mujoco_ros_pkgs_tpu.msgs import SensorNoiseModel
from mujoco_ros_pkgs_tpu.ops import math as mmath
from mujoco_ros_pkgs_tpu.plugins.base import MujocoPlugin

_QUAT_TYPES = (int(SensorType.FRAMEQUAT), int(SensorType.BALLQUAT))


class SensorsPlugin(MujocoPlugin):
    """State pytree: dict(mean=(nsensordata,), std=(nsensordata,),
    enabled=(nsensordata,) float mask, noisy=(nsensordata,), gt=(nsensordata,)).

    Noise params are per-DATA-dim (expanded from per-sensor models)."""

    def __init__(self, config=None):
        super().__init__(config)
        self.eval_mode = bool((config or {}).get("eval_mode", False))
        self._models: Dict[str, SensorNoiseModel] = {}

    def load(self, m: Model, d: Data) -> bool:
        self._m = m
        return True

    def init_state(self, m: Model, batch: int) -> Any:
        # registered noise models persist across reset (the reference keeps
        # them as plugin members; reset does not clear them) — rebuild the
        # per-dim arrays from the registry instead of zeroing
        mean, std, enabled = self.noise_arrays(m)
        z = jnp.zeros(m.nsensordata)
        return dict(mean=mean, std=std, enabled=enabled, noisy=z, gt=z)

    # -- control plane --
    def register_noise_models(self, models) -> int:
        """Returns number of rejected models (unknown sensors)."""
        rejected = 0
        for nm in models:
            try:
                self._m.sensor(nm.sensor_name)
            except ValueError:
                rejected += 1
                continue
            self._models[nm.sensor_name] = nm
        return rejected

    def noise_arrays(self, m: Model):
        """Expand registered per-sensor models to per-dim arrays."""
        mean = np.zeros(m.nsensordata)
        std = np.zeros(m.nsensordata)
        enabled = np.zeros(m.nsensordata)
        for name, nm in self._models.items():
            s = m.sensor(name)
            adr, dim = m.sensor_adr[s], m.sensor_dim[s]
            ndim = 3 if m.sensor_type[s] in _QUAT_TYPES else dim
            for k in range(ndim):
                if nm.set_flag & (1 << k):
                    if k < len(nm.mean):
                        mean[adr + k] = nm.mean[k]
                    if k < len(nm.std):
                        std[adr + k] = nm.std[k]
                    enabled[adr + k] = 1.0
        return jnp.asarray(mean), jnp.asarray(std), jnp.asarray(enabled)

    # -- in-graph --
    def last_stage(self, m: Model, d: Data, ps: Any) -> Tuple[Data, Any]:
        dtype = d.qpos.dtype
        rng, sub = jax.random.split(d.rng)
        gt = d.sensordata
        # cutoff scaling (reference divides by cutoff when > 0)
        scale = jnp.ones(m.nsensordata, dtype=dtype)
        for i in range(m.nsensor):
            c = m.sensor_cutoff[i]
            adr, dim = m.sensor_adr[i], m.sensor_dim[i]
            s = jnp.where(c > 0, 1.0 / jnp.maximum(c, mmath.MINVAL), 1.0)
            scale = scale.at[adr:adr + dim].set(s)
        gt = gt * scale

        normal = jax.random.normal(sub, (m.nsensordata,), dtype=dtype)
        mean, std, enabled = ps["mean"].astype(dtype), ps["std"].astype(dtype), \
            ps["enabled"].astype(dtype)
        additive = gt + enabled * (normal * std + mean)

        noisy = additive
        # quaternion sensors: compose RPY perturbation instead of adding
        for i in range(m.nsensor):
            if m.sensor_type[i] not in _QUAT_TYPES:
                continue
            adr = m.sensor_adr[i]
            eul = enabled[adr:adr + 3] * (normal[adr:adr + 3]
                                          * std[adr:adr + 3]
                                          + mean[adr:adr + 3])
            dq = mmath.euler_to_quat(eul, "XYZ")
            q = mmath.quat_mul(dq, gt[adr:adr + 4])
            noisy = noisy.at[adr:adr + 4].set(q)

        nps = dict(ps, noisy=noisy, gt=gt)
        return d.replace(rng=rng), nps
