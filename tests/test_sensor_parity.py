"""Sensor evaluation parity vs libmujoco on the reference sensors world
(mujoco_ros_sensors/test/sensors_world.xml: framepos/framequat/velocimeter/
jointvel) and our richer sensor-suite world (IMU + force/torque + rangefinder
+ joint sensors — BASELINE config 3)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_ros_pkgs_tpu as mrt
from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.ops import forward
from tests import oracle

SENS_REF = oracle.SENSOR_WORLDS + "/sensors_world.xml"


def _compare_sensordata(xml_or_path, seed=0, steps=50, atol=1e-8,
                        skip_types=()):
    if xml_or_path.endswith(".xml"):
        m = mrt.load_model(xml_or_path)
        mm = oracle.load_oracle(xml_or_path)
    else:
        m = mrt.load_model_from_string(xml_or_path)
        mm = oracle.load_oracle_string(xml_or_path)

    dd = mujoco.MjData(mm)
    rng = np.random.default_rng(seed)
    dd.qvel[:] = rng.uniform(-0.2, 0.2, mm.nv)
    for _ in range(steps):
        mujoco.mj_step(mm, dd)
    mujoco.mj_forward(mm, dd)

    d = forward.make_data(m).replace(qpos=jnp.asarray(dd.qpos),
                                     qvel=jnp.asarray(dd.qvel),
                                     time=jnp.asarray(dd.time))
    d = jax.jit(lambda d: forward.forward(m, d))(d)

    for i in range(m.nsensor):
        name = m.sensor_names[i] or f"sensor{i}"
        if m.sensor_type[i] in skip_types:
            continue
        adr, dim = m.sensor_adr[i], m.sensor_dim[i]
        ours = np.asarray(d.sensordata[adr:adr + dim])
        theirs = dd.sensordata[adr:adr + dim]
        if m.sensor_type[i] in (15, 24):  # quats: sign-insensitive
            err = min(np.abs(ours - theirs).max(), np.abs(ours + theirs).max())
            assert err < atol, (name, ours, theirs)
        else:
            np.testing.assert_allclose(ours, theirs, atol=atol, err_msg=name)


def test_reference_sensors_world():
    _compare_sensordata(SENS_REF, steps=100)


def test_sensor_suite_world():
    # rangefinder excluded from strict tol (ray vs mujoco convention checked
    # separately below)
    from mujoco_ros_pkgs_tpu.core.types import SensorType
    _compare_sensordata(worlds.SENSORS, steps=20, atol=1e-6)


def test_rangefinder_value():
    m = mrt.load_model_from_string(worlds.SENSORS)
    mm = oracle.load_oracle_string(worlds.SENSORS)
    dd = mujoco.MjData(mm)
    mujoco.mj_forward(mm, dd)
    d = forward.make_data(m)
    d = jax.jit(lambda d: forward.forward(m, d))(d)
    si = m.sensor("range")
    adr = m.sensor_adr[si]
    ours = float(np.asarray(d.sensordata[adr]))
    theirs = float(dd.sensordata[adr])
    assert abs(ours - theirs) < 1e-6, (ours, theirs)
