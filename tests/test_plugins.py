"""Plugin system + sensors/mocap/ros_control plugin tests — mirrors
mujoco_ros/test/mujoco_ros_plugin_test.cpp (callbacks fire, config delivery,
load-failure quarantine, reset-skip) and the statistical sensor-noise suite
mujoco_ros_sensors/test/mujoco_sensors_test.cpp:281-394 (Welford mean/var
tolerances over 1000 steps)."""

import numpy as np
import pytest

import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.msgs import MocapState, Pose, SensorNoiseModel
from mujoco_ros_pkgs_tpu.plugins.base import MujocoPlugin
from mujoco_ros_pkgs_tpu.plugins.mocap import MocapPlugin
from mujoco_ros_pkgs_tpu.plugins.ros_control import RosControlPlugin
from mujoco_ros_pkgs_tpu.plugins.sensors import SensorsPlugin
from mujoco_ros_pkgs_tpu.server import MujocoServer


class ProbePlugin(MujocoPlugin):
    """The reference TestPlugin (test/test_plugin/test_plugin.h:46-74):
    records which callbacks ran; can be configured to fail load."""

    def __init__(self, config=None):
        super().__init__(config)
        self.ran_load = False
        self.ran_reset = False

    def load(self, m, d):
        self.ran_load = True
        if self.config.get("should_fail"):
            raise RuntimeError("configured to fail")
        return True

    def reset(self, m, d):
        self.ran_reset = True

    def init_state(self, m, batch):
        return dict(control_calls=jnp.zeros(()), last_calls=jnp.zeros(()),
                    passive_calls=jnp.zeros(()))

    def control(self, m, d, ps):
        return d, dict(ps, control_calls=ps["control_calls"] + 1)

    def passive(self, m, d, ps):
        return d, dict(ps, passive_calls=ps["passive_calls"] + 1)

    def last_stage(self, m, d, ps):
        return d, dict(ps, last_calls=ps["last_calls"] + 1)


def test_plugin_callbacks_fire():
    p = ProbePlugin({"some": {"nested": [1, 2, {"deep": True}]}})
    s = MujocoServer(worlds.BOXES, nenv=2, unpause=False, plugins=[p])
    assert p.ran_load
    assert p.config["some"]["nested"][2]["deep"]   # config delivery
    s.step(5)
    ps = s.pstates[0]
    assert np.all(np.asarray(ps["control_calls"]) == 5)
    assert np.all(np.asarray(ps["passive_calls"]) == 5)
    assert np.all(np.asarray(ps["last_calls"]) == 5)


def test_plugin_load_failure_quarantine():
    # failed plugin stays registered, excluded from callbacks, reset skipped
    # (plugin_utils.h:69-78, mujoco_env.cpp:428-432)
    bad = ProbePlugin({"should_fail": True})
    good = ProbePlugin()
    s = MujocoServer(worlds.BOXES, nenv=1, unpause=False, plugins=[bad, good])
    assert bad.ran_load and not bad.loaded
    assert "configured to fail" in bad.load_error
    assert len(s.registry.plugins) == 2
    assert len(s.registry.cb_ready) == 1
    s.step(3)
    assert np.all(np.asarray(s.pstates[0]["control_calls"]) == 3)
    s.reset()
    assert good.ran_reset and not bad.ran_reset
    # recovery on reload: plugin loads cleanly next time
    bad.config["should_fail"] = False
    res = s.reload()
    assert res.success
    assert bad.loaded


def test_mocap_plugin():
    s = MujocoServer(worlds.ARM7, nenv=2, unpause=False,
                     plugins=[MocapPlugin()])
    st = MocapState(name=["mocap_target"],
                    pose=[Pose(np.array([0.1, 0.2, 0.9]),
                               np.array([2.0, 0, 0, 0]))])  # unnormalized
    assert s.set_mocap_state(st).success
    s.step(2)
    b = s.m.body("mocap_target")
    np.testing.assert_allclose(np.asarray(s.d.xpos)[:, b],
                               [[0.1, 0.2, 0.9]] * 2, atol=1e-12)
    q = np.asarray(s.d.xquat)[0, b]
    np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-12)  # normalized
    # invalid names rejected (mocap_plugin.cpp:50-70)
    assert not s.set_mocap_state(MocapState(name=["link0"], pose=[Pose()])).success
    assert not s.set_mocap_state(MocapState(name=["ghost"], pose=[Pose()])).success


def _rc_server(cfg, nenv=1):
    p = RosControlPlugin(cfg)
    s = MujocoServer(worlds.ARM7, nenv=nenv, unpause=False, plugins=[p])
    i, _ = s._plugin_of(RosControlPlugin)
    return s, i


def _set_cmd(s, i, value):
    states = list(s.pstates)
    states[i] = dict(states[i], command=jnp.full((s.nenv, 1), value))
    s.pstates = tuple(states)


def test_ros_control_position_direct():
    # POSITION: direct qpos write, zeroing qvel (default_robot_hw_sim.cpp:
    # 248-326 POSITION branch)
    s, i = _rc_server({"joints": {"j4": {"method": "POSITION"}}})
    _set_cmd(s, i, 0.7)
    s.step(20)
    j4 = s.m.joint("j4")
    q = float(np.asarray(s.d.qpos)[0, s.m.jnt_qposadr[j4]])
    assert abs(q - 0.7) < 1e-3, q


def test_ros_control_velocity_direct():
    s, i = _rc_server({"joints": {"j4": {"method": "VELOCITY"}}})
    _set_cmd(s, i, 0.4)
    s.step(50)
    j4 = s.m.joint("j4")
    v = float(np.asarray(s.d.qvel)[0, s.m.jnt_dofadr[j4]])
    q = float(np.asarray(s.d.qpos)[0, s.m.jnt_qposadr[j4]])
    assert abs(v - 0.4) < 0.05, v
    assert q > 0.02, q    # joint actually moved


def test_ros_control_position_pid():
    # j5 (shoulder-like inertia); gentle PI-D gains; integral kills the
    # gravity bias — mirrors the POSITION_PID branch with rosparam gains
    cfg = {"joints": {"j5": {"method": "POSITION_PID",
                             "pid": [3.0, 1.5, 0.3, 5.0],
                             "effort_limit": 10.0}}}
    s, i = _rc_server(cfg)
    _set_cmd(s, i, 0.3)
    s.step(1500)
    j5 = s.m.joint("j5")
    q = float(np.asarray(s.d.qpos)[0, s.m.jnt_qposadr[j5]])
    assert abs(q - 0.3) < 0.12, q


def test_ros_control_estop():
    cfg = {"joints": {"j0": {"method": "EFFORT"}}}
    p = RosControlPlugin(cfg)
    s = MujocoServer(worlds.ARM7, nenv=1, unpause=False, plugins=[p])
    i, _ = s._plugin_of(RosControlPlugin)
    states = list(s.pstates)
    states[i] = dict(states[i], command=jnp.full((1, 1), 5.0),
                     estop=jnp.ones((1,), dtype=bool))
    s.pstates = tuple(states)
    s.step(5)
    j0 = s.m.joint("j0")
    # e-stop zeroes effort (default_robot_hw_sim.cpp:251-260)
    assert abs(float(np.asarray(s.d.qfrc_applied)[0, s.m.jnt_dofadr[j0]])) == 0.0


def test_sensor_noise_statistics():
    """Welford-style noise validation (mujoco_sensors_test.cpp:281-394):
    register a noise model, step 1000x, check mean/std of (noisy - GT)."""
    sp = SensorsPlugin()
    s = MujocoServer(worlds.SENSORS, nenv=1, unpause=False, plugins=[sp])
    models = [SensorNoiseModel(sensor_name="ajp", mean=np.array([0.05]),
                               std=np.array([0.01]), set_flag=0x01)]
    assert s.register_noise_models(models).success

    m = s.m
    si = m.sensor("ajp")
    adr = m.sensor_adr[si]
    diffs = []
    for _ in range(1000):
        s.step(1)
        noisy, gt = s.sensor_outputs()
        diffs.append(noisy[adr] - gt[adr])
    diffs = np.array(diffs)
    assert abs(diffs.mean() - 0.05) < 0.02        # reference mean tol 0.02
    assert abs(diffs.var() - 0.01 ** 2) < 1e-4    # reference var tol 1e-4


def test_sensor_gt_suppressed_in_eval_mode():
    sp = SensorsPlugin({"eval_mode": True})
    s = MujocoServer(worlds.SENSORS, nenv=1, unpause=False, eval_mode=True,
                     admin_hash="h", plugins=[sp])
    s.step(1)
    noisy, gt = s.sensor_outputs()
    assert noisy is not None
    assert gt is None     # no _GT topic in eval mode (plugin.cpp:64-68)


def test_sensor_values_track_state():
    s = MujocoServer(worlds.SENSORS, nenv=1, unpause=False,
                     plugins=[SensorsPlugin()])
    s.step(10)
    noisy, gt = s.sensor_outputs()
    m = s.m
    # framepos sensor equals body xpos
    si = m.sensor("probe_pos")
    adr = m.sensor_adr[si]
    b = m.body("probe")
    np.testing.assert_allclose(gt[adr:adr + 3],
                               np.asarray(s.d.xpos)[0, b], atol=1e-10)
