"""MJB binary model load (core/interop.py) — mj_loadModel parity.

The reference loads .mjb via mj_loadModel and its reload service accepts
either XML or MJB (mujoco_ros/src/mujoco_env.cpp:785-836). Here: the server
round-trips save_mjb -> reload(.mjb), and the interop-converted Model steps
trajectories that match the XML-compiled Model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core import interop, mjcf
from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.ops import forward as fwd

mujoco = pytest.importorskip("mujoco")


def _save_mjb(xml, path):
    mm = mujoco.MjModel.from_xml_string(xml)
    mujoco.mj_saveModel(mm, path, None)


@pytest.mark.parametrize("name,xml", [
    ("pendulum", worlds.PENDULUM),
    ("boxes", worlds.BOXES),
    ("sensors", worlds.SENSORS),
])
def test_mjb_model_matches_xml(name, xml, tmp_path):
    path = str(tmp_path / f"{name}.mjb")
    _save_mjb(xml, path)
    m_bin = interop.load_model_mjb(path)
    m_xml = mjcf.load_model_from_string(xml)

    # static structure identical
    assert m_bin.nq == m_xml.nq and m_bin.nv == m_xml.nv
    assert m_bin.geom_type == m_xml.geom_type
    assert m_bin.collision_pairs == m_xml.collision_pairs
    assert m_bin.body_names == m_xml.body_names
    assert m_bin.sensor_type == m_xml.sensor_type

    # trajectories match (same compiled constants up to float tolerance)
    def roll(m, nsteps=50):
        d = fwd.make_data(m)
        step = jax.jit(lambda dd: fwd.step(m, dd))
        for _ in range(nsteps):
            d = step(d)
        return np.asarray(d.qpos), np.asarray(d.qvel)

    qb, vb = roll(m_bin)
    qx, vx = roll(m_xml)
    np.testing.assert_allclose(qb, qx, atol=1e-9, rtol=1e-9)
    np.testing.assert_allclose(vb, vx, atol=1e-8, rtol=1e-8)


def test_server_mjb_roundtrip(tmp_path):
    """save_mjb -> reload(.mjb) on a live server (VERDICT r2 item 6)."""
    from mujoco_ros_pkgs_tpu.server import MujocoServer

    srv = MujocoServer(worlds.PENDULUM, nenv=2, unpause=False)
    srv.step(5)
    path = str(tmp_path / "world.mjb")
    res = srv.save_mjb(path)
    assert res.success, res.message
    res = srv.reload(path)
    assert res.success, res.message
    assert srv.m.body_names == mjcf.load_model_from_string(
        worlds.PENDULUM).body_names
    assert srv.step(5).success
    assert np.all(np.isfinite(np.asarray(srv.d.qpos)))
