"""Watch-UI picking + drag perturbation + widget/model endpoints.

The reference viewer's mouse perturbation selects a body under the cursor
and applies a spring force while dragging (mujoco_ros/src/viewer.cpp:
1451-1480); its panels expose per-joint and per-actuator sliders
(viewer.h:284-319) and drag-drop model loading (viewer.cpp:1520-1525).
These tests drive the headless equivalents END-TO-END over HTTP: screen-ray
select -> perturb (spring wrench into xfrc_applied) -> the body actually
moves under stepping -> clear; slider-form ctrl/qpos edits; model upload."""

import json
import urllib.request

import numpy as np
import pytest

from mujoco_ros_pkgs_tpu.server import MujocoServer

WORLD = """
<mujoco model="pickworld">
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body name="ball" pos="0 0 0.5">
      <freejoint/>
      <geom name="bg" type="sphere" size="0.15" mass="0.5"/>
    </body>
    <body name="cambody" pos="0 -2 0.5">
      <camera name="maincam" mode="fixed" quat="0.7071068 0.7071068 0 0"/>
    </body>
  </worldbody>
</mujoco>
"""

W, H = 64, 48


def _post(port, name, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/{name}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def watched():
    s = MujocoServer(WORLD, nenv=2, unpause=False)
    res = s.start_watch(port=0, fps=5.0, width=W, height=H)
    assert res.success, res.status_message
    yield s, int(res.status_message)
    s.stop_watch()
    s.shutdown()


def test_select_hits_body_at_center(watched):
    s, port = watched
    # the camera at (0,-2,0.5) looks at the ball at (0,0,0.5): center pixel
    r = _post(port, "select", {"x": W / 2, "y": H / 2})
    assert r["success"]
    assert r["body_name"] == "ball"
    assert r["geom_name"] == "bg"
    assert 1.0 < r["dist"] < 2.5
    np.testing.assert_allclose(r["point"][1], -0.15, atol=0.05)


def test_select_background(watched):
    s, port = watched
    r = _post(port, "select", {"x": 1, "y": 1})  # sky
    assert r["success"] and r["body"] in (-1, 0)


def test_perturb_drag_moves_body(watched):
    s, port = watched
    _post(port, "reset", {})
    sel = _post(port, "select", {"x": W / 2, "y": H / 2})
    assert sel["body_name"] == "ball"
    # drag toward the upper-right of the view at the grab depth
    r = _post(port, "perturb", {"body": "ball", "x": W * 0.75, "y": H * 0.25,
                                "dist": sel["dist"]})
    assert r["success"]
    f = np.asarray(r["force"])
    assert np.linalg.norm(f) > 0.1
    xf = np.asarray(s.d.xfrc_applied)
    b = s.m.body("ball")
    assert np.linalg.norm(xf[:, b, :3]) > 0.1
    x0 = np.asarray(s.d.qpos)[0, :3].copy()
    assert _post(port, "step", {"n": 100})["success"]
    x1 = np.asarray(s.d.qpos)[0, :3]
    # moved toward +x (screen right) and the wrench actually acted
    assert abs(x1[0] - x0[0]) > 1e-3
    assert _post(port, "clear_perturb", {"body": "ball"})["success"]
    xf = np.asarray(s.d.xfrc_applied)
    assert np.allclose(xf[:, b, :], 0.0)


def test_minfo_and_slider_forms(watched):
    s, port = watched
    mi = _post(port, "minfo", {})
    assert mi["success"]
    assert mi["nq"] == 7 and mi["nu"] == 0
    assert "ball" in mi["bodies"]
    assert len(mi["qpos"]) == 7
    # qpos slider form: patch one coordinate
    r = _post(port, "qpos", {"index": 2, "value": 1.25, "zero_qvel": True})
    assert r["success"]
    assert abs(np.asarray(s.d.qpos)[0, 2] - 1.25) < 1e-6


def test_model_upload_reload(watched):
    s, port = watched
    new = WORLD.replace('size="0.15"', 'size="0.25"')
    r = _post(port, "reload", {"model": new})
    assert r["success"], r["message"]
    g = s.m.geom("bg")
    assert abs(float(np.asarray(s.m.geom_size[g, 0])) - 0.25) < 1e-9
    # picking still works against the reloaded model (pick cache rebuilt)
    sel = _post(port, "select", {"x": W / 2, "y": H / 2})
    assert sel["body_name"] == "ball"
    # broken upload fails cleanly and keeps the old model serving
    r = _post(port, "reload", {"model": "<mujoco><worldbody>"
                                        "<geom type='mesh' mesh='nope'/>"
                                        "</worldbody></mujoco>"})
    assert not r["success"]
    assert _post(port, "select", {"x": W / 2, "y": H / 2})["success"]
