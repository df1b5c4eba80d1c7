"""Operator surface added in round 3: physics-option editing on a running
server (the viewer Sync's mjModel.opt fields, viewer.cpp:1552-1871), the live
HTTP watch (headless replacement for the GLFW viewer window), per-subsystem
logging (rosconsole analogue), and realized solver iterations in the stats."""

import logging
import urllib.request

import numpy as np
import pytest

from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.server import MujocoServer
from mujoco_ros_pkgs_tpu.utils import log as log_mod


def test_get_set_physics_properties():
    s = MujocoServer(worlds.PENDULUM, nenv=1, unpause=False)
    props = s.get_physics_properties()
    assert props["integrator"] == "EULER"
    dt0 = float(np.asarray(props["timestep"]))
    # array field: timestep halves -> sim advances half as far per step
    r = s.set_physics_properties({"timestep": dt0 / 2})
    assert r.success, r.status_message
    s.step(10)
    assert abs(s.sim_time - 10 * dt0 / 2) < 1e-9
    # static field: iterations retraces transparently
    assert s.set_physics_properties({"iterations": 7}).success
    assert s.get_physics_properties()["iterations"] == 7
    s.step(3)
    # enum by name
    assert s.set_physics_properties({"integrator": "RK4"}).success
    assert s.get_physics_properties()["integrator"] == "RK4"
    s.step(2)
    # unknown field / bad value rejected
    assert not s.set_physics_properties({"bogus": 1}).success
    assert not s.set_physics_properties({"integrator": "WARP"}).success


def test_set_cone_rebuilds_efc_rows():
    s = MujocoServer(worlds.BOXES, nenv=2, unpause=False)
    nefc_el = s.d.efc_force_contact.shape[1]
    assert s.set_physics_properties({"cone": "PYRAMIDAL"}).success
    nefc_py = s.d.efc_force_contact.shape[1]
    assert nefc_py != nefc_el   # pyramidal facets change the row count
    assert s.step(5).success


def test_physics_properties_eval_gated():
    s = MujocoServer(worlds.PENDULUM, nenv=1, unpause=False,
                     eval_mode=True, admin_hash="sekrit")
    assert not s.set_physics_properties({"iterations": 5}).success
    assert s.set_physics_properties({"iterations": 5},
                                    admin_hash="sekrit").success


CAMWORLD = """
<mujoco model="camworld">
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1" rgba="0.5 0.5 0.5 1"/>
    <body name="ball" pos="0 0 0.5">
      <freejoint/>
      <geom name="b" type="sphere" size="0.15" mass="0.2" rgba="1 0 0 1"/>
    </body>
    <body name="cambody" pos="0 -2 1">
      <camera name="maincam" mode="fixed" quat="0.7933533 0.6087614 0 0"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_watch_stream_serves_png():
    s = MujocoServer(CAMWORLD, nenv=1, unpause=False)
    assert s.m.ncam >= 1
    res = s.start_watch(port=0, fps=5.0, width=64, height=48)
    assert res.success, res.status_message
    port = int(res.status_message)
    # duplicate start rejected
    assert not s.start_watch().success
    # single-frame endpoint returns a valid PNG
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/frame.png",
                                timeout=30) as r:
        data = r.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    # the index page embeds the stream
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/", timeout=10) as r:
        assert b"/stream" in r.read()
    # the multipart stream yields at least one part
    req = urllib.request.urlopen(f"http://127.0.0.1:{port}/stream", timeout=30)
    head = req.read(200)
    assert b"--mrpframe" in head and b"image/png" in head
    req.close()
    assert s.stop_watch().success
    assert not s.stop_watch().success


def test_watch_without_camera():
    s = MujocoServer(worlds.PENDULUM, nenv=1, unpause=False)
    res = s.start_watch()
    assert not res.success and "camera" in res.status_message


def test_named_loggers_and_level_spec():
    levels = log_mod.parse_level_spec("server=debug, render=error")
    assert levels == {"server": "debug", "render": "error"}
    with pytest.raises(ValueError):
        log_mod.parse_level_spec("nonsense")
    log_mod.configure(levels)
    assert log_mod.get_logger("server").getEffectiveLevel() == logging.DEBUG
    assert log_mod.get_logger("render").getEffectiveLevel() == logging.ERROR
    # children inherit from the package root, never from the global root
    assert not log_mod.get_logger().propagate


def test_server_logs_lifecycle(caplog):
    log_mod.configure({"server": "INFO"})
    logger = log_mod.get_logger()          # package root blocks propagation
    logger.propagate = True                # let caplog capture via root
    try:
        with caplog.at_level(logging.INFO,
                             logger="mujoco_ros_pkgs_tpu.server"):
            s = MujocoServer(worlds.PENDULUM, nenv=1, unpause=False)
            r = s.reload("<mujoco><worldbody><geom type=\"mesh\" "
                         "mesh=\"nope\"/></worldbody></mujoco>")
        assert not r.success
        msgs = [rec.message for rec in caplog.records]
        assert any("loaded" in m for m in msgs)
        assert any("reload failed" in m for m in msgs)
    finally:
        logger.propagate = False


def test_solver_stats_realized_iterations():
    s = MujocoServer(worlds.BOXES, nenv=2, unpause=False)
    s.step(40)   # boxes land -> contacts active
    st = s.get_solver_stats()
    assert st["solver_iterations_limit"] == int(s.m.opt.iterations)
    assert 1 <= st["solver_iterations_realized"] <= st["solver_iterations_limit"]
    assert st["solver_grad_norm"] >= 0.0
    assert "solver_cost" in st
