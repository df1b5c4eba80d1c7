"""Parity for the remaining physics paths: pyramidal cones (MuJoCo's default),
joint/ball limits, condim 4/6 contacts, frictionloss (Huber rows), RK4."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_ros_pkgs_tpu as mrt
from mujoco_ros_pkgs_tpu.ops import forward
from tests import oracle


def _qacc_vs_oracle(xml, qvel0=None, qpos0=None, atol=1e-8):
    mm = mujoco.MjModel.from_xml_string(xml)
    dd = mujoco.MjData(mm)
    if qpos0 is not None:
        dd.qpos[:] = qpos0
    if qvel0 is not None:
        dd.qvel[:] = qvel0
    mujoco.mj_forward(mm, dd)

    m = mrt.load_model_from_string(xml)
    d = forward.make_data(m)
    if qpos0 is not None:
        d = d.replace(qpos=jnp.asarray(qpos0))
    if qvel0 is not None:
        d = d.replace(qvel=jnp.asarray(qvel0))
    d = jax.jit(lambda d: forward.forward(m, d))(d)
    np.testing.assert_allclose(np.asarray(d.qacc), dd.qacc, atol=atol)
    return m, d, mm, dd


def _traj_vs_oracle(xml, nsteps, atol=1e-6, qvel0=None):
    mm = mujoco.MjModel.from_xml_string(xml)
    qpos_ref, qvel_ref = oracle.rollout(mm, nsteps, qvel0=qvel0)
    m = mrt.load_model_from_string(xml)
    d = forward.make_data(m)
    if qvel0 is not None:
        d = d.replace(qvel=jnp.asarray(qvel0))
    step = jax.jit(lambda d: forward.step(m, d))
    qs = []
    for _ in range(nsteps):
        d = step(d)
        qs.append(np.asarray(d.qpos))
    np.testing.assert_allclose(np.array(qs), qpos_ref, atol=atol)


PYR_SPHERE = """<mujoco><option timestep="0.001"/>
<worldbody><geom type="plane" size="5 5 1"/>
<body pos="0 0 0.048"><freejoint/>
<geom type="sphere" size="0.05" mass="0.1" friction="0.7 0.006 0.0002"/></body>
</worldbody></mujoco>"""


@pytest.mark.parametrize("qvel0", [
    np.zeros(6),
    np.array([2.0, 0, 0, 0, 0, 0]),
    np.array([0.5, -0.3, -1.0, 2.0, 0, 1.0]),
])
def test_pyramidal_qacc(qvel0):
    _qacc_vs_oracle(PYR_SPHERE, qvel0=qvel0)


def test_pyramidal_box_drop_trajectory():
    xml = """<mujoco><option timestep="0.002"/>
    <worldbody><geom type="plane" size="5 5 1"/>
    <body pos="0 0 0.3"><freejoint/>
    <geom type="box" size="0.1 0.1 0.1" mass="0.5"/></body>
    </worldbody></mujoco>"""
    _traj_vs_oracle(xml, 300, atol=5e-5,
                    qvel0=np.array([0.3, 0, 0, 0.2, 0, 0.1]))


CONDIM_XML = """<mujoco><option timestep="0.001" cone="elliptic" impratio="3"/>
<worldbody><geom type="plane" size="5 5 1"/>
<body pos="0 0 0.048"><freejoint/>
<geom type="sphere" size="0.05" mass="0.1" condim="{condim}"
      friction="0.8 0.01 0.001"/></body>
</worldbody></mujoco>"""


@pytest.mark.parametrize("condim", [1, 4, 6])
def test_condim_variants(condim):
    qv = np.array([1.0, -0.5, 0, 1.5, 0.5, 2.0])
    _qacc_vs_oracle(CONDIM_XML.format(condim=condim), qvel0=qv, atol=1e-7)


LIMIT_XML = """<mujoco><option timestep="0.001"/><compiler angle="radian"/>
<worldbody>
<body pos="0 0 1"><joint name="h" type="hinge" axis="0 1 0" range="-0.4 0.4"
  limited="true" margin="0.02"/>
<geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04"/>
</body>
<body pos="1 0 1"><joint name="s" type="slide" axis="0 0 1" range="-0.2 0.1"
  limited="true" margin="0.02"/>
<geom type="box" size="0.05 0.05 0.05" mass="0.3"/>
</body>
</worldbody></mujoco>"""


def test_joint_limits_trajectory():
    # gravity swings the arm into its hinge limit; the block slides into the
    # slide limit — covers both lower/upper one-sided rows
    _traj_vs_oracle(LIMIT_XML, 600, atol=1e-6)


def test_joint_limit_efc_rows():
    mm = mujoco.MjModel.from_xml_string(LIMIT_XML)
    dd = mujoco.MjData(mm)
    dd.qpos[:] = [0.39, -0.19]   # both near limits
    dd.qvel[:] = [0.5, -0.5]
    mujoco.mj_forward(mm, dd)
    assert dd.nefc == 2

    m = mrt.load_model_from_string(LIMIT_XML)
    from mujoco_ros_pkgs_tpu.ops import efc as efcmod
    d = forward.make_data(m).replace(qpos=jnp.asarray(dd.qpos.copy()),
                                     qvel=jnp.asarray(dd.qvel.copy()))
    d = jax.jit(lambda d: forward.forward(m, d))(d)
    e = jax.jit(lambda d: efcmod.make_efc(m, d))(d)
    act = np.asarray(e.active)
    assert act.sum() == 2
    np.testing.assert_allclose(np.asarray(e.J)[act],
                               dd.efc_J.reshape(2, -1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(e.D)[act], dd.efc_D, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(e.aref)[act], dd.efc_aref,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.qacc), dd.qacc, atol=1e-8)


BALL_LIMIT_XML = """<mujoco><option timestep="0.001"/>
<worldbody><body pos="0 0 1">
<joint name="b" type="ball" range="0 0.5" limited="true"/>
<geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/>
</body></worldbody></mujoco>"""


def test_ball_limit_trajectory():
    _traj_vs_oracle(BALL_LIMIT_XML, 500, atol=1e-6)


FLOSS_XML = """<mujoco><option timestep="0.001"/>
<worldbody><body pos="0 0 1">
<joint name="h" type="hinge" axis="0 1 0" frictionloss="{floss}"/>
<geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04"/>
</body></worldbody></mujoco>"""


def test_frictionloss_trajectory():
    # dry friction: arm swings with Huber-cost friction rows
    _traj_vs_oracle(FLOSS_XML.format(floss=0.4), 800, atol=1e-6)


def test_frictionloss_sticks():
    # frictionloss far above the max gravity torque: the joint creeps only at
    # the tiny regularization-admitted rate (jar = -R*f, libmujoco semantics —
    # verified by trajectory parity below), far slower than free fall
    _traj_vs_oracle(FLOSS_XML.format(floss=20.0), 200, atol=1e-8)
    m = mrt.load_model_from_string(FLOSS_XML.format(floss=20.0))
    d = forward.make_data(m)
    step = jax.jit(lambda d: forward.step(m, d))
    for _ in range(200):
        d = step(d)
    assert abs(float(np.asarray(d.qvel)[0])) < 0.05


RK4_XML = """<mujoco><option timestep="0.002" integrator="RK4">
<flag contact="disable"/></option>
<worldbody><body pos="0 0 1">
<joint name="b" type="ball"/>
<geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04"/>
<body pos="0.4 0 0"><joint type="hinge" axis="0 1 0"/>
<geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/></body>
</body></worldbody></mujoco>"""


def test_rk4_trajectory():
    _traj_vs_oracle(RK4_XML, 500, atol=1e-8,
                    qvel0=np.array([0.3, 0.5, -0.2, 0.8]))
