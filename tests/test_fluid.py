"""Parity for the legacy inertia-box fluid model (opt.density / viscosity /
wind): engine_passive.c mj_inertiaBoxFluidModel semantics, plus the fluid
velocity-derivative inside implicitfast/implicit (mjd_smooth_vel).

The reference serves any model libmujoco loads (mujoco_env.cpp:498 steps the
engine verbatim), including fluid-dynamics options; these tests pin our
vectorized implementation against the oracle.
"""

import mujoco
import numpy as np

import jax
import jax.numpy as jnp

import mujoco_ros_pkgs_tpu as mrt
from mujoco_ros_pkgs_tpu.ops import forward, smooth
from tests import oracle


FLUID_XML = """<mujoco>
<option timestep="0.002" density="1.2" viscosity="0.3" wind="0.5 -0.2 0.1"
 integrator="{integrator}"><flag contact="disable"/></option>
<compiler angle="radian"/>
<worldbody>
<body pos="0 0 1"><freejoint/>
  <geom type="box" size="0.1 0.05 0.3" mass="2"/></body>
<body pos="1 0 1"><joint type="ball" damping="0.1"/>
  <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.03" mass="0.5"/></body>
</worldbody></mujoco>"""


def test_fluid_qfrc_passive_parity():
    """qfrc_passive with density+viscosity+wind matches the oracle pointwise
    over random velocity states."""
    xml = FLUID_XML.format(integrator="Euler")
    mm = mujoco.MjModel.from_xml_string(xml)
    dd = mujoco.MjData(mm)
    m = mrt.load_model_from_string(xml)
    assert m.has_fluid
    rng = np.random.default_rng(7)
    for _ in range(10):
        qvel = rng.uniform(-4.0, 4.0, mm.nv)
        qpos = mm.qpos0.copy()
        qpos[3:7] = rng.normal(size=4)
        qpos[3:7] /= np.linalg.norm(qpos[3:7])
        dd.qpos[:] = qpos
        dd.qvel[:] = qvel
        mujoco.mj_forward(mm, dd)
        d = forward.make_data(m).replace(
            qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
        d = smooth.fwd_position_smooth(m, d)
        d = smooth.com_vel(m, d)
        d = smooth.passive(m, d)
        np.testing.assert_allclose(
            np.asarray(d.qfrc_passive), dd.qfrc_passive, atol=1e-12)


def _traj(xml, nsteps, atol, qvel0=None):
    mm = mujoco.MjModel.from_xml_string(xml)
    qpos_ref, _ = oracle.rollout(mm, nsteps, qvel0=qvel0)
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


def test_fluid_euler_trajectory():
    qvel0 = np.array([1.0, -2.0, 3.0, 4.0, -1.0, 2.0, 3.0, -2.0, 1.0])
    _traj(FLUID_XML.format(integrator="Euler"), 500, atol=1e-8, qvel0=qvel0)


def test_fluid_implicitfast_trajectory():
    """implicitfast folds d qfrc_fluid/d qvel into the implicit matrix
    (mjd_smooth_vel); diverges from the oracle if that term is missing."""
    qvel0 = np.array([1.0, -2.0, 3.0, 4.0, -1.0, 2.0, 3.0, -2.0, 1.0])
    _traj(FLUID_XML.format(integrator="implicitfast"), 500, atol=1e-8,
          qvel0=qvel0)


def test_fluid_implicit_trajectory():
    qvel0 = np.array([1.0, -2.0, 3.0, 8.0, -5.0, 2.0, 6.0, -2.0, 1.0])
    _traj(FLUID_XML.format(integrator="implicit"), 400, atol=1e-7,
          qvel0=qvel0)


WIND_XML = """<mujoco>
<option timestep="0.002" density="1.2" wind="3 0 0">
<flag contact="disable"/></option>
<worldbody><body pos="0 0 2"><freejoint/>
<geom type="sphere" size="0.05" mass="0.01"/></body></worldbody></mujoco>"""


def test_fluidshape_ellipsoid_rejected():
    """The geom-level ellipsoid fluid model is unimplemented: loading must
    fail loudly, not silently run different physics."""
    import pytest
    xml = """<mujoco><option density="1.2"/><worldbody>
    <body pos="0 0 1"><freejoint/>
    <geom type="sphere" size="0.1" fluidshape="ellipsoid"/></body>
    </worldbody></mujoco>"""
    with pytest.raises(ValueError, match="fluidshape"):
        mrt.load_model_from_string(xml)


def test_wind_pushes_light_body():
    """Behavioral: a light ballistic sphere in a 3 m/s wind gains downwind
    velocity (and matches the oracle trajectory)."""
    _traj(WIND_XML, 400, atol=1e-9)
    m = mrt.load_model_from_string(WIND_XML)
    d = forward.make_data(m)
    step = jax.jit(lambda d: forward.step(m, d))
    for _ in range(400):
        d = step(d)
    assert float(d.qvel[0]) > 0.05
