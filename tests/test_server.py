"""Server control-plane semantics — mirrors the reference's gtest suites
mujoco_ros/test/mujoco_env_test.cpp and ros_interface_test.cpp (SURVEY.md §4):
eval-mode hash enforcement, pause gating, step edge cases, clock advance,
num_steps termination, reset/reload semantics (incl. rollback), body-state /
geom-property / equality services, initial joint states."""

import numpy as np
import pytest

import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.msgs import (
    BodyState, EqualityConstraintParameters, GeomProperties, Pose, Twist,
)
from mujoco_ros_pkgs_tpu.server import AdminHashError, MujocoServer


@pytest.fixture(scope="module")
def srv():
    return MujocoServer(worlds.BOXES, nenv=4, unpause=False)


def test_eval_mode_requires_hash():
    # mujoco_env.cpp:92-105: ctor throws in eval mode without a hash
    with pytest.raises(AdminHashError):
        MujocoServer(worlds.BOXES, nenv=1, eval_mode=True)


def test_eval_mode_hash_gating():
    s = MujocoServer(worlds.BOXES, nenv=1, eval_mode=True,
                     admin_hash="secret", unpause=False)
    assert not s.set_pause(False, admin_hash="wrong").success
    assert s.set_pause(False, admin_hash="secret").success
    assert not s.reset(admin_hash="bad").success
    assert s.reset(admin_hash="secret").success


def test_step_edge_cases(srv):
    # negative / zero step counts rejected (mujoco_env_test.cpp:155-275)
    assert not srv.step(0).success
    assert not srv.step(-5).success
    assert srv.step(1).success


def test_clock_advances_exactly(srv):
    # /clock advances exactly timestep*steps (ros_interface_test.cpp:78-98)
    srv.reset()
    ticks = []
    srv.subscribe_clock(ticks.append)
    t0 = srv.sim_time
    assert srv.step(100).success
    dt = float(np.asarray(srv.m.opt.timestep))
    assert np.isclose(srv.sim_time - t0, 100 * dt, atol=1e-12)
    assert ticks and np.isclose(ticks[-1], srv.sim_time)
    srv._clock_subs.clear()


def test_num_steps_termination():
    s = MujocoServer(worlds.BOXES, nenv=1, unpause=True, num_steps=10)
    s.start_physics_loop()
    import time
    deadline = time.time() + 180   # two scan-graph compiles on CPU are slow
    while s.num_steps_until_exit > 0 and time.time() < deadline:
        time.sleep(0.05)
    s.stop_physics_loop()
    assert s.num_steps_until_exit == 0
    dt = float(np.asarray(s.m.opt.timestep))
    assert np.isclose(s.sim_time, 10 * dt, atol=1e-12)


def test_reset_restores_state(srv):
    srv.reset()
    q0 = np.asarray(srv.d.qpos).copy()
    srv.step(50)
    assert not np.allclose(np.asarray(srv.d.qpos), q0)
    srv.reset()
    np.testing.assert_allclose(np.asarray(srv.d.qpos), q0)
    assert srv.sim_time == 0.0


def test_reload_rollback_on_bad_model(srv):
    # initModelFromQueue rollback (mujoco_env.cpp:851-869)
    old_nq = srv.m.nq
    res = srv.reload("<mujoco><worldbody><geom type=\"banana\"/></worldbody></mujoco>")
    assert not res.success
    assert srv.m.nq == old_nq                 # old model intact
    assert srv.get_loading_request_state().value == 0
    assert srv.step(1).success                # still steppable


def test_reload_new_model(srv):
    res = srv.reload(worlds.PENDULUM)
    assert res.success
    assert srv.m.name == "pendulum_bench"
    srv.reload(worlds.BOXES)
    assert srv.m.name == "boxes_bench"


def test_body_state_services(srv):
    srv.reset()
    st = srv.get_body_state("box")
    assert st.mass > 0
    new = BodyState(name="box",
                    pose=Pose(np.array([0.3, 0.2, 1.0]),
                              np.array([1.0, 0, 0, 0])),
                    twist=Twist(np.array([0.1, 0, 0]), np.zeros(3)))
    assert srv.set_body_state(new).success
    rd = srv.get_body_state("box")
    np.testing.assert_allclose(rd.pose.position, [0.3, 0.2, 1.0])
    np.testing.assert_allclose(rd.twist.linear, [0.1, 0, 0], atol=1e-12)
    # mass change re-derives constants (callbacks.cpp:244-258)
    inv0 = np.asarray(srv.m.dof_invweight0).copy()
    new.mass = 2.0
    assert srv.set_body_state(new, set_pose=False, set_twist=False,
                              set_mass=True).success
    assert srv.get_body_state("box").mass == 2.0
    assert not np.allclose(np.asarray(srv.m.dof_invweight0), inv0)
    # error branch: unknown body
    assert not srv.set_body_state(BodyState(name="nope")).success


def test_set_body_state_frame_resolution(srv):
    """PoseStamped-style frame_id resolution (callbacks.cpp:298-302): a pose
    expressed in a registered static frame is transformed to world before
    being applied, including chained frames; unknown frames error."""
    srv.reset()
    # table: translated + yawed 90deg about z
    s2 = np.sqrt(0.5)
    srv.register_static_transform("world", "table",
                                  pos=(1.0, 0.5, 0.25),
                                  quat=(s2, 0, 0, s2))
    new = BodyState(name="box",
                    pose=Pose(np.array([0.2, 0.0, 0.1]),
                              np.array([1.0, 0, 0, 0]),
                              frame_id="table"))
    assert srv.set_body_state(new, set_twist=False).success
    rd = srv.get_body_state("box")
    # 90deg yaw maps +x to +y
    np.testing.assert_allclose(rd.pose.position, [1.0, 0.7, 0.35], atol=1e-6)
    np.testing.assert_allclose(
        np.abs(np.asarray(rd.pose.orientation)), [s2, 0, 0, s2], atol=1e-6)
    # chained: shelf hangs off the table
    srv.register_static_transform("table", "shelf", pos=(0.0, 0.0, 0.5))
    new.pose = Pose(np.zeros(3), np.array([1.0, 0, 0, 0]), frame_id="shelf")
    assert srv.set_body_state(new, set_twist=False).success
    rd = srv.get_body_state("box")
    np.testing.assert_allclose(rd.pose.position, [1.0, 0.5, 0.75], atol=1e-6)
    # unknown frame rejected with a message naming the frame
    new.pose = Pose(np.zeros(3), np.array([1.0, 0, 0, 0]), frame_id="mars")
    res = srv.set_body_state(new, set_twist=False)
    assert not res.success and "mars" in res.status_message


def test_geom_properties_services(srv):
    props = srv.get_geom_properties("box")
    assert props.size_0 > 0
    props.friction_slide = 0.7
    assert srv.set_geom_properties(props, set_friction=True).success
    assert np.isclose(srv.get_geom_properties("box").friction_slide, 0.7)
    props.size_0 = 0.2
    assert srv.set_geom_properties(props, set_size=True).success
    g = srv.m.geom("box")
    assert np.isclose(float(np.asarray(srv.m.geom_size[g, 0])), 0.2)
    assert not srv.set_geom_properties(
        GeomProperties(name="missing"), set_friction=True).success


def test_gravity_services(srv):
    np.testing.assert_allclose(srv.get_gravity(), [0, 0, -9.81])
    assert srv.set_gravity([0, 0, -1.62]).success
    np.testing.assert_allclose(srv.get_gravity(), [0, 0, -1.62])
    srv.set_gravity([0, 0, -9.81])


def test_initial_joint_states():
    s = MujocoServer(worlds.PENDULUM, nenv=2, unpause=False,
                     initial_joint_states={"joint1": [0.4]},
                     initial_joint_velocities={"joint2": [-0.2]})
    j1 = s.m.joint("joint1")
    j2 = s.m.joint("joint2")
    assert np.allclose(np.asarray(s.d.qpos)[:, s.m.jnt_qposadr[j1]], 0.4)
    assert np.allclose(np.asarray(s.d.qvel)[:, s.m.jnt_dofadr[j2]], -0.2)
    # reapplied on reset (ros_interface_test.cpp:263-425)
    s.step(20)
    s.reset()
    assert np.allclose(np.asarray(s.d.qpos)[:, s.m.jnt_qposadr[j1]], 0.4)
    assert np.allclose(np.asarray(s.d.qvel)[:, s.m.jnt_dofadr[j2]], -0.2)


def test_equality_services():
    s = MujocoServer(worlds.ARM7, nenv=2, unpause=False)
    p = s.get_eq_constraint_parameters("ee_target")
    assert not p.active
    assert p.element1 == "mocap_target"
    p.active = True
    p.torquescale = 0.5
    p.solverParameters.timeconst = 0.05
    assert s.set_eq_constraint_parameters(p).success
    rd = s.get_eq_constraint_parameters("ee_target")
    assert rd.active
    assert np.isclose(rd.torquescale, 0.5)
    assert np.isclose(rd.solverParameters.timeconst, 0.05)
    assert not s.set_eq_constraint_parameters(
        EqualityConstraintParameters(name="ghost")).success


def test_batched_envs_diverge_with_different_state():
    s = MujocoServer(worlds.BOXES, nenv=3, unpause=False)
    qpos = np.array(s.d.qpos)
    qpos[1, 2] += 0.5   # raise env 1's box
    s.d = s.d.replace(qpos=jnp.asarray(qpos))
    s.step(25)
    z = np.asarray(s.d.qpos)[:, 2]
    assert not np.isclose(z[0], z[1])
    assert np.isclose(z[0], z[2])   # identical envs stay lockstep


def test_reset_reinitializes_plugin_state():
    """reset() must re-init plugin state pytrees (PID integrators, counters) —
    the reference resets plugins on reset via safe_reset
    (mujoco_env.cpp:246-264)."""
    from mujoco_ros_pkgs_tpu.plugins.base import MujocoPlugin

    class Counter(MujocoPlugin):
        def init_state(self, m, batch):
            return {"n": jnp.zeros(())}

        def control(self, m, d, ps):
            return d, {"n": ps["n"] + 1.0}

    s = MujocoServer(worlds.BOXES, nenv=2, unpause=False, plugins=[Counter()])
    s.step(5)
    assert float(np.asarray(s.pstates[0]["n"])[0]) == 5.0
    s.reset()
    assert float(np.asarray(s.pstates[0]["n"])[0]) == 0.0


def test_reset_keeps_registered_noise_models():
    """Runtime-registered sensor noise models persist across reset (they are
    plugin members in the reference, not per-episode state)."""
    from mujoco_ros_pkgs_tpu.plugins.sensors import SensorsPlugin
    from mujoco_ros_pkgs_tpu.msgs import SensorNoiseModel

    s = MujocoServer(worlds.SENSORS, nenv=1, unpause=False,
                     plugins=[SensorsPlugin()])
    nm = SensorNoiseModel(sensor_name="ajp", mean=[0.5], std=[0.0], set_flag=1)
    assert s.register_noise_models([nm]).success
    s.reset()
    i, _ = s._plugin_of(SensorsPlugin)
    adr = s.m.sensor_adr[s.m.sensor("ajp")]
    assert float(np.asarray(s.pstates[i]["mean"])[0, adr]) == 0.5


def test_set_geom_type_rebuilds_contact_capacity():
    """set_geom_properties(set_type=...) changing the per-pair contact
    capacity must rebuild the pair table and the live contact buffers
    (VERDICT r1 weak #8) — not leave stale compiled shapes behind."""
    s = MujocoServer(worlds.BOXES, nenv=2, unpause=False)
    cap_box = s.d.contact.dist.shape[1]
    s.step(5)
    res = s.set_geom_properties(
        GeomProperties(name="box", type=2), set_type=True)   # SPHERE
    assert res.success
    cap_sph = s.d.contact.dist.shape[1]
    assert cap_sph != cap_box        # plane-box cap (4) vs plane-sphere (1)
    s.step(200)                      # steps cleanly with the rebuilt table
    z = float(np.asarray(s.d.qpos)[0, 2])
    assert 0.05 < z < 0.2            # rests near the sphere radius (0.1)
