"""Interactive watch UI control endpoints (server/watch.py POST /api/*).

The reference viewer lets an operator drive the sim interactively — live
editing of opt/qpos/ctrl synced under the physics mutex (viewer.cpp Sync,
:1552-1871), pause/run, speed, keyframes. The headless equivalent is the
watch server's JSON control plane; every endpoint here drives the same
service surface the library exposes, including eval-mode admin-hash
rejection (callbacks.cpp:213-223).
"""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from mujoco_ros_pkgs_tpu.server import MujocoServer

WORLD = """
<mujoco model="watchctl">
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="arm" pos="0 0 0.5">
      <joint name="j" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom name="g" type="capsule" size="0.04 0.2" mass="0.3"/>
    </body>
    <body name="cambody" pos="0 -2 1">
      <camera name="maincam" mode="fixed" quat="0.7933533 0.6087614 0 0"/>
    </body>
  </worldbody>
  <actuator><motor name="m" joint="j" gear="1"/></actuator>
  <keyframe><key name="k0" qpos="0.4"/></keyframe>
</mujoco>
"""


def _post(port, name, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/{name}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=30) as r:
        return json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/{path}",
                                timeout=30) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def watched():
    s = MujocoServer(WORLD, nenv=2, unpause=False)
    res = s.start_watch(port=0, fps=5.0, width=48, height=32)
    assert res.success, res.status_message
    yield s, int(res.status_message)
    s.stop_watch()
    s.shutdown()


def test_pause_step_reset(watched):
    s, port = watched
    assert _post(port, "pause", {"paused": True})["success"]
    t0 = s.sim_time
    assert _post(port, "step", {"n": 50})["success"]
    assert s.sim_time > t0
    assert _post(port, "reset", {})["success"]
    assert abs(s.sim_time) < 1e-9


def test_speed_endpoint(watched):
    s, port = watched
    assert _post(port, "speed", {"factor": 0.5})["success"]
    assert abs(s.realtime_factor - 0.5) < 1e-9
    assert _post(port, "speed", {"factor": -1})["success"]
    assert s.realtime_factor == -1.0


def test_ctrl_and_qpos_live_edit(watched):
    s, port = watched
    assert _post(port, "ctrl", {"values": [0.7]})["success"]
    np.testing.assert_allclose(np.asarray(s.d.ctrl), 0.7)
    assert _post(port, "ctrl", {"values": [0.1], "env_id": 1})["success"]
    np.testing.assert_allclose(np.asarray(s.d.ctrl[0]), 0.7)
    np.testing.assert_allclose(np.asarray(s.d.ctrl[1]), 0.1)
    # wrong shape rejected
    assert not _post(port, "ctrl", {"values": [1, 2, 3]})["success"]

    assert _post(port, "qpos", {"values": [0.3], "zero_qvel": True})["success"]
    np.testing.assert_allclose(np.asarray(s.d.qpos), 0.3)
    np.testing.assert_allclose(np.asarray(s.d.qvel), 0.0)


def test_keyframe_load_save(watched):
    s, port = watched
    assert _post(port, "keyframe", {"action": "load", "key": 0})["success"]
    np.testing.assert_allclose(np.asarray(s.d.qpos), 0.4)
    assert _post(port, "qpos", {"values": [-0.2]})["success"]
    assert _post(port, "keyframe", {"action": "save", "key": 0})["success"]
    assert _post(port, "qpos", {"values": [0.0]})["success"]
    assert _post(port, "keyframe", {"action": "load", "key": 0})["success"]
    np.testing.assert_allclose(np.asarray(s.d.qpos), -0.2, atol=1e-6)
    assert not _post(port, "keyframe", {"action": "bogus"})["success"]


def test_physics_and_wrench(watched):
    s, port = watched
    assert _post(port, "physics",
                 {"props": {"gravity": [0, 0, -5.0]}})["success"]
    np.testing.assert_allclose(np.asarray(s.m.opt.gravity), [0, 0, -5.0])
    assert not _post(port, "physics", {"props": {"nope": 1}})["success"]
    assert _post(port, "wrench",
                 {"body": "arm", "force": [0, 0, 1.0]})["success"]
    assert not _post(port, "wrench", {"body": "ghost"})["success"]


def test_stats_endpoint(watched):
    s, port = watched
    st = _get(port, "api/stats")
    assert "sim_time" in st and "solver_iterations_realized" in st
    assert st["paused"] is True
    assert "physics" in st and "gravity" in st["physics"]


def test_page_renders_profiler_figures(watched):
    """The control page carries the profiler time-series canvases (the
    viewer's figtimer/figconstraint panels, viewer.h:267-271) wired to the
    same stats fields /api/stats serves."""
    import urllib.request
    s, port = watched
    html = urllib.request.urlopen(
        f"http://127.0.0.1:{port}/", timeout=10).read().decode()
    assert 'id="prof_rt"' in html and 'id="prof_solver"' in html
    for field in ("measured_slowdown", "ncon_active",
                  "solver_iterations_realized"):
        assert field in html


def test_unknown_endpoint_and_bad_json(watched):
    s, port = watched
    try:
        _post(port, "nonsense", {})
        assert False, "expected HTTP error"
    except urllib.error.HTTPError as e:
        assert e.code == 404
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/pause", data=b"not json",
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        urllib.request.urlopen(req, timeout=10)
        assert False, "expected HTTP error"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_admin_hash_rejection():
    s = MujocoServer(WORLD, nenv=1, unpause=False, eval_mode=True,
                     admin_hash="sekrit")
    res = s.start_watch(port=0, fps=5.0, width=48, height=32)
    assert res.success, res.status_message
    port = int(res.status_message)
    try:
        r = _post(port, "pause", {"paused": True})
        assert not r["success"] and "hash" in r["message"]
        r = _post(port, "ctrl", {"values": [0.5]})
        assert not r["success"]
        assert _post(port, "pause",
                     {"paused": True, "admin_hash": "sekrit"})["success"]
    finally:
        s.stop_watch()
        s.shutdown()


def test_step_rejected_while_running():
    """The step endpoint mirrors the Step action's semantics: rejected while
    the physics loop runs unpaused (callbacks.cpp:94-129)."""
    s = MujocoServer(WORLD, nenv=1, unpause=True)
    s.start_physics_loop()
    res = s.start_watch(port=0, fps=5.0, width=48, height=32)
    assert res.success, res.status_message
    port = int(res.status_message)
    try:
        r = _post(port, "step", {"n": 10})
        assert not r["success"]
        assert _post(port, "pause", {"paused": True})["success"]
        assert _post(port, "step", {"n": 10})["success"]
    finally:
        s.stop_watch()
        s.shutdown()
