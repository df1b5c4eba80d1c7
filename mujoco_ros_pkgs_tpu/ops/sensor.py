"""Sensor evaluation stages (mj_sensorPos / mj_sensorVel / mj_sensorAcc).

Thin dispatch into the full 36-type implementation (ops/sensor_impl.py),
mirroring the reference sensors plugin table
(mujoco_ros_sensors/src/mujoco_sensor_handler_plugin.cpp:70-105); this module
owns the stage split (pos/vel/acc) and the sensor-disable gating.
"""

from __future__ import annotations

from mujoco_ros_pkgs_tpu.core.types import Data, DisableBit, Model


def sensor_pos(m: Model, d: Data) -> Data:
    if m.nsensor == 0 or (m.opt.disableflags & DisableBit.SENSOR):
        return d
    from mujoco_ros_pkgs_tpu.ops import sensor_impl
    return sensor_impl.sensor_pos(m, d)


def sensor_vel(m: Model, d: Data) -> Data:
    if m.nsensor == 0 or (m.opt.disableflags & DisableBit.SENSOR):
        return d
    from mujoco_ros_pkgs_tpu.ops import sensor_impl
    return sensor_impl.sensor_vel(m, d)


def sensor_acc(m: Model, d: Data) -> Data:
    if m.nsensor == 0 or (m.opt.disableflags & DisableBit.SENSOR):
        return d
    from mujoco_ros_pkgs_tpu.ops import sensor_impl
    return sensor_impl.sensor_acc(m, d)
