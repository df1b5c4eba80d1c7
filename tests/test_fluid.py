"""Parity for the fluid models (opt.density / viscosity / wind): the legacy
inertia-box model (engine_passive.c mj_inertiaBoxFluidModel) and the
geom-level ellipsoid model (mj_ellipsoidFluidModel: potential-flow added
mass, Magnus/Kutta lift, anisotropic drag; coefficients packed at load like
mjCGeom::SetFluidCoefs), plus the fluid velocity-derivative inside
implicitfast/implicit (mjd_smooth_vel / mjd_ellipsoidFluid).

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


ELLIPSOID_XML = """<mujoco>
<option timestep="0.002" density="1.2" viscosity="0.3" wind="0.5 -0.2 0.1"
 integrator="{integrator}"><flag contact="disable"/></option>
<compiler angle="radian"/>
<worldbody>
<body pos="0 0 1"><freejoint/>
  <geom type="ellipsoid" size="0.1 0.05 0.2" euler="0.3 0.5 0.7"
   fluidshape="ellipsoid" mass="0.2"/>
  <geom type="capsule" size="0.03 0.2" fluidshape="ellipsoid"
   fluidcoef="0.4 0.2 1.0 0.9 0.8" mass="0.1" pos="0.3 0 0"
   euler="0.2 0 1.4"/></body>
<body pos="1 0 1"><joint type="ball" damping="0.1"/>
  <geom type="box" size="0.1 0.05 0.3" mass="2"/></body>
<body pos="2 0 1"><freejoint/>
  <geom type="sphere" size="0.08" fluidshape="ellipsoid" mass="0.3"/>
  <geom type="box" size="0.05 0.05 0.05" mass="0.2" pos="0.2 0 0"/></body>
</worldbody></mujoco>"""
# the third body mixes one fluid-active and one inactive geom: mj_passive
# switches the WHOLE body to the ellipsoid model, and the inactive geom
# contributes nothing (not inertia-box forces) — the parity tests cover
# that semantics too


def test_fluid_ellipsoid_coefs_parity():
    """The 12 packed geom_fluid coefficients (interaction flag, drag/lift
    coefs, potential-flow virtual mass + inertia from the kappa integrals)
    match mjCGeom::SetFluidCoefs for every primitive geom type, including
    the runtime capsule cap-extension and a custom fluidcoef."""
    xml = """<mujoco><option density="1.2"/><worldbody><body pos="0 0 1">
    <freejoint/>
    <geom type="sphere" size="0.1" fluidshape="ellipsoid" mass="1"/>
    <geom type="capsule" size="0.03 0.2" fluidshape="ellipsoid" mass="0.1"
     pos="0.3 0 0"/>
    <geom type="ellipsoid" size="0.1 0.05 0.2" fluidshape="ellipsoid"
     mass="0.2" pos="0.6 0 0"/>
    <geom type="box" size="0.1 0.15 0.25" fluidshape="ellipsoid"
     fluidcoef="0.4 0.2 1.0 0.9 0.8" mass="0.2" pos="1 0 0"/>
    <geom type="cylinder" size="0.05 0.2" fluidshape="ellipsoid" mass="0.2"
     pos="1.5 0 0"/>
    <geom type="sphere" size="0.07" mass="0.1" pos="2 0 0"/>
    </body></worldbody></mujoco>"""
    mm = mujoco.MjModel.from_xml_string(xml)
    m = mrt.load_model_from_string(xml)
    # rtol bounded by the model-array storage dtype (f32 by default) plus
    # the ~1e-9 quadrature difference vs the oracle's Gauss-Kronrod kappa
    np.testing.assert_allclose(np.asarray(m.geom_fluid), mm.geom_fluid,
                               rtol=1e-5, atol=1e-9)
    assert m.geom_fluid_active == (1, 1, 1, 1, 1, 0)


def test_fluid_ellipsoid_qfrc_passive_parity():
    """Ellipsoid-model qfrc_passive (added-mass gyroscopic coupling +
    Magnus/Kutta lift + anisotropic quadratic and Stokes drag, applied at
    the geom origin) matches mj_ellipsoidFluidModel pointwise over random
    states — alongside an inertia-box body in the same model."""
    xml = ELLIPSOID_XML.format(integrator="Euler")
    mm = mujoco.MjModel.from_xml_string(xml)
    dd = mujoco.MjData(mm)
    m = mrt.load_model_from_string(xml)
    assert m.has_fluid
    rng = np.random.default_rng(11)
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
        # atol floor: the load-time kappa quadrature agrees with the
        # oracle's Gauss-Kronrod evaluation to ~1e-9 relative, which
        # propagates linearly into the added-mass forces
        np.testing.assert_allclose(
            np.asarray(d.qfrc_passive), dd.qfrc_passive, atol=1e-8)


def test_fluid_ellipsoid_euler_trajectory():
    qvel0 = np.array([1.0, -2.0, 3.0, 4.0, -1.0, 2.0, 3.0, -2.0, 1.0,
                      -1.5, 2.5, 1.0, 3.0, -4.0, 2.0])
    # atol: the ~1e-9-relative kappa-quadrature offset vs the oracle's
    # coefficients compounds over 500 steps
    _traj(ELLIPSOID_XML.format(integrator="Euler"), 500, atol=1e-6,
          qvel0=qvel0)


def test_fluid_ellipsoid_implicitfast_trajectory():
    """implicitfast folds the exact d qfrc_fluid/d qvel of the ellipsoid
    model into the implicit matrix via jacfwd; mirrors libmujoco's
    mjd_ellipsoidFluid analytical derivative."""
    qvel0 = np.array([1.0, -2.0, 3.0, 4.0, -1.0, 2.0, 3.0, -2.0, 1.0,
                      -1.5, 2.5, 1.0, 3.0, -4.0, 2.0])
    _traj(ELLIPSOID_XML.format(integrator="implicitfast"), 500, atol=1e-6,
          qvel0=qvel0)


def test_fluidshape_on_mesh_rejected():
    """fluidshape='ellipsoid' is only defined for primitive geoms here;
    planes (infinite) must fail loudly."""
    import pytest
    xml = """<mujoco><option density="1.2"/><worldbody>
    <geom type="plane" size="1 1 0.1" fluidshape="ellipsoid"/>
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


def test_fluid_ellipsoid_grad_safe_at_rest():
    """The implicit-matrix derivative of the ellipsoid model (jacfwd
    through _fluid_qfrc) must be finite at qvel == 0, where the projected
    cross-section A_proj has a sqrt(0) kink (mjd_ellipsoidFluid handles
    the same limit analytically)."""
    xml = ELLIPSOID_XML.format(integrator="Euler")
    m = mrt.load_model_from_string(xml)
    d = forward.make_data(m)
    d = smooth.fwd_position_smooth(m, d)

    def fluid_of_qvel(qvel):
        dd = d.replace(qvel=qvel)
        dd = smooth.com_vel(m, dd)
        return smooth._fluid_qfrc(m, dd)

    J = jax.jacfwd(fluid_of_qvel)(jnp.zeros(m.nv, dtype=d.qpos.dtype))
    assert np.isfinite(np.asarray(J)).all()
