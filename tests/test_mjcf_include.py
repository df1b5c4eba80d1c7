"""MJCF <include> expansion + repeated-section merge parity vs the oracle.

The reference inherits <include> from libmujoco's parser (the server loads
arbitrary robot MJCFs through mj_loadXML, mujoco_ros/src/mujoco_env.cpp:771);
real robot models split bodies/assets/actuators across files, so the compiler
must splice includes and merge the resulting repeated sections identically.
"""

import os

import numpy as np
import jax
import mujoco
import pytest

from mujoco_ros_pkgs_tpu.core import mjcf
from mujoco_ros_pkgs_tpu.ops import forward as fwd
from tests import oracle

MAIN = """
<mujoco model="inc">
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 0.1"/>
    <body name="b1" pos="0 0 0.3">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom name="g1" type="capsule" size="0.03 0.1"/>
    </body>
  </worldbody>
  <include file="extra.xml"/>
</mujoco>
"""

EXTRA = """
<mujocoinclude>
  <worldbody>
    <body name="b2" pos="0.05 0 0.4">
      <joint name="j2" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom name="g2" type="capsule" size="0.03 0.1"/>
    </body>
  </worldbody>
  <contact><exclude body1="b1" body2="b2"/></contact>
  <actuator><motor name="m2" joint="j2" gear="0.6"/></actuator>
</mujocoinclude>
"""

NESTED = """
<mujocoinclude>
  <include file="extra.xml"/>
  <sensor><jointpos name="sp" joint="j1"/></sensor>
</mujocoinclude>
"""


def _write(tmp_path, **files):
    for name, content in files.items():
        (tmp_path / f"{name}.xml").write_text(content)
    return str(tmp_path / "main.xml")


def test_include_matches_oracle_structure(tmp_path):
    path = _write(tmp_path, main=MAIN, extra=EXTRA)
    m = mjcf.load_model(path)
    mm = mujoco.MjModel.from_xml_path(path)
    assert len(m.body_names) == mm.nbody
    assert len(m.jnt_names) == mm.njnt
    assert len(m.actuator_names) == mm.nu
    # the exclude from the included file must prune the b1-b2 pair
    assert (1, 2) in m.pair_exclude


def test_include_trajectory_parity(tmp_path):
    path = _write(tmp_path, main=MAIN, extra=EXTRA)
    mm = mujoco.MjModel.from_xml_path(path)
    qpos, qvel = (a[-1] for a in oracle.rollout(mm, 200, ctrl=[0.4]))
    m = mjcf.load_model(path)
    d = fwd.make_data(m)
    d = d.replace(ctrl=d.ctrl.at[:].set(0.4))
    step = jax.jit(lambda dd_: fwd.step(m, dd_))
    for _ in range(200):
        d = step(d)
    np.testing.assert_allclose(np.asarray(d.qpos), qpos, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d.qvel), qvel, atol=1e-4)


def test_nested_include(tmp_path):
    main = MAIN.replace("extra.xml", "nested.xml")
    path = _write(tmp_path, main=main, nested=NESTED, extra=EXTRA)
    m = mjcf.load_model(path)
    mm = mujoco.MjModel.from_xml_path(path)
    assert len(m.body_names) == mm.nbody
    assert len(m.sensor_names) == mm.nsensor == 1


def test_include_missing_file(tmp_path):
    path = _write(tmp_path, main=MAIN)   # no extra.xml
    with pytest.raises(ValueError, match="include"):
        mjcf.load_model(path)


def test_include_cycle(tmp_path):
    main = MAIN.replace("extra.xml", "loop.xml")
    loop = '<mujocoinclude><include file="loop.xml"/></mujocoinclude>'
    path = _write(tmp_path, main=main, loop=loop)
    with pytest.raises(ValueError, match="nesting"):
        mjcf.load_model(path)
