"""Parity for implicitfast/implicit integrators, cylinder/ellipsoid geoms,
site-transmission actuators, and the humanoid model family."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_ros_pkgs_tpu as mrt
from mujoco_ros_pkgs_tpu.ops import forward
from tests import oracle


def _traj(xml, nsteps, atol, ctrl=None, qvel0=None):
    mm = mujoco.MjModel.from_xml_string(xml)
    qpos_ref, _ = oracle.rollout(mm, nsteps, ctrl=ctrl, qvel0=qvel0)
    m = mrt.load_model_from_string(xml)
    d = forward.make_data(m)
    if qvel0 is not None:
        d = d.replace(qvel=jnp.asarray(qvel0))
    step = jax.jit(lambda d: forward.step(m, d))
    qs = []
    for i in range(nsteps):
        if ctrl is not None:
            d = d.replace(ctrl=jnp.asarray(
                ctrl[i] if np.ndim(ctrl) > 1 else ctrl))
        d = step(d)
        qs.append(np.asarray(d.qpos))
    np.testing.assert_allclose(np.array(qs), qpos_ref, atol=atol)


IMPLICITFAST_XML = """<mujoco>
<option timestep="0.002" integrator="implicitfast"><flag contact="disable"/></option>
<compiler angle="radian"/>
<worldbody><body pos="0 0 1">
<joint name="j0" type="hinge" axis="0 1 0" damping="2"/>
<geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04"/>
<body pos="0.4 0 0"><joint name="j1" type="hinge" axis="0 1 0" damping="1"/>
<geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/></body>
</body></worldbody>
<actuator>
  <position joint="j0" kp="30" kv="6"/>
  <velocity joint="j1" kv="2"/>
</actuator></mujoco>"""


def test_implicitfast_trajectory():
    ctrl = np.array([0.5, 0.3])
    _traj(IMPLICITFAST_XML, 500, atol=1e-8, ctrl=ctrl)


def test_implicit_trajectory():
    # full implicit: Coriolis d RNE/d qvel folded in via jacfwd + LU solve
    xml = IMPLICITFAST_XML.replace("implicitfast", "implicit")
    _traj(xml, 500, atol=1e-8, ctrl=np.array([0.5, 0.3]))


# fast free rotation: gyroscopic (Coriolis) terms dominate, so implicit and
# implicitfast genuinely diverge here — the regime the full implicit matrix
# exists for (engine_derivative.c mjd_rne_vel)
GYRO_XML = """<mujoco><option timestep="0.004" integrator="implicit">
<flag contact="disable"/></option>
<compiler angle="radian"/>
<worldbody><body pos="0 0 1"><joint name="b" type="ball" damping="0.01"/>
<geom type="box" size="0.3 0.05 0.02" mass="1"/>
<body pos="0.3 0 0"><joint name="h" type="hinge" axis="0 0 1" damping="0.01"/>
<geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.02"/></body>
</body></worldbody></mujoco>"""

GYRO_QVEL0 = np.array([25.0, 3.0, 1.0, 8.0])


def test_implicit_gyroscopic_trajectory():
    _traj(GYRO_XML, 400, atol=1e-7, qvel0=GYRO_QVEL0)


CROSS_TREE_TENDON_XML = """<mujoco>
<option timestep="0.002" integrator="implicitfast"/>
<compiler angle="radian"/>
<worldbody>
<body pos="0 0 1"><joint name="a" type="hinge" axis="0 1 0"/>
<geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/></body>
<body pos="1 0 1"><joint name="b" type="hinge" axis="0 1 0"/>
<geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/></body>
</worldbody>
<tendon><fixed damping="2"><joint joint="a" coef="1"/>
<joint joint="b" coef="-1"/></fixed></tendon></mujoco>"""


def test_implicitfast_drops_cross_tree_tendon_coupling():
    """libmujoco's qDeriv storage is tree-sparse: a fixed tendon with
    damping that couples two separate kinematic trees contributes only its
    DIAGONAL entries to the implicit matrix (pinned empirically against the
    oracle's D_colind layout). The dense-matrix implementation must apply
    the same structural mask or it under-damps relative to the oracle."""
    _traj(CROSS_TREE_TENDON_XML, 500, atol=1e-8,
          qvel0=np.array([2.0, -3.0]))


def test_implicit_differs_from_implicitfast_when_spinning():
    """Sanity: on the gyroscopic scene the two integrators must NOT agree —
    otherwise the Coriolis term silently fell out of the implicit matrix."""
    m = mrt.load_model_from_string(GYRO_XML)
    mf = mrt.load_model_from_string(
        GYRO_XML.replace('"implicit"', '"implicitfast"'))
    qvel0 = jnp.asarray(GYRO_QVEL0)
    di = forward.make_data(m).replace(qvel=qvel0)
    df = forward.make_data(mf).replace(qvel=qvel0)
    step_i = jax.jit(lambda d: forward.step(m, d))
    step_f = jax.jit(lambda d: forward.step(mf, d))
    for _ in range(200):
        di, df = step_i(di), step_f(df)
    assert float(jnp.max(jnp.abs(di.qpos - df.qpos))) > 1e-4


CYL_XML = """<mujoco><option timestep="0.002" cone="elliptic"/>
<compiler angle="radian"/>
<worldbody><geom type="plane" size="5 5 1"/>
<body pos="0 0 0.4"><freejoint/>
<geom type="cylinder" size="0.1 0.15" mass="0.5"/></body>
</worldbody></mujoco>"""


def test_cylinder_drop_settles():
    """Cylinder falls and settles upright; exact contact layout differs from
    libmujoco's, so this gates BEHAVIOR (rest height, stability), not bits."""
    m = mrt.load_model_from_string(CYL_XML)
    d = forward.make_data(m)
    step = jax.jit(lambda d: forward.step(m, d))
    for _ in range(600):
        d = step(d)
    z = float(np.asarray(d.qpos)[2])
    assert abs(z - 0.15) < 5e-3, z       # resting on its cap
    assert float(jnp.linalg.norm(d.qvel)) < 0.05


def test_ellipsoid_drop_settles():
    xml = CYL_XML.replace('type="cylinder" size="0.1 0.15"',
                          'type="ellipsoid" size="0.1 0.12 0.15"')
    m = mrt.load_model_from_string(xml)
    d = forward.make_data(m)
    step = jax.jit(lambda d: forward.step(m, d))
    for _ in range(600):
        d = step(d)
    z = float(np.asarray(d.qpos)[2])
    assert abs(z - 0.15) < 2e-2, z


SITE_TRN_XML = """<mujoco><option timestep="0.002"><flag contact="disable" gravity="disable"/></option>
<compiler angle="radian"/>
<worldbody><body pos="0 0 1"><freejoint/>
<geom type="box" size="0.1 0.1 0.02" mass="1"/>
<site name="thruster" pos="0 0 0" quat="1 0 0 0"/>
</body></worldbody>
<actuator><general site="thruster" gear="0 0 1 0 0 0" ctrlrange="0 20"
  ctrllimited="true"/></actuator></mujoco>"""


def test_site_transmission_thruster():
    mm = mujoco.MjModel.from_xml_string(SITE_TRN_XML)
    dd = mujoco.MjData(mm)
    dd.ctrl[0] = 5.0
    mujoco.mj_forward(mm, dd)

    m = mrt.load_model_from_string(SITE_TRN_XML)
    d = forward.make_data(m).replace(ctrl=jnp.asarray([5.0]))
    d = jax.jit(lambda d: forward.forward(m, d))(d)
    np.testing.assert_allclose(np.asarray(d.qacc), dd.qacc, atol=1e-10)
    assert abs(float(np.asarray(d.qacc)[2]) - 5.0) < 1e-9  # F/m = 5


def test_humanoid_trajectory_parity():
    from mujoco_ros_pkgs_tpu.models.humanoid import HUMANOID
    mm = oracle.load_oracle_string(HUMANOID)
    assert mm.nv == 27
    rng = np.random.default_rng(0)
    ctrl = rng.uniform(-0.3, 0.3, mm.nu)
    qpos_ref, _ = oracle.rollout(mm, 200, ctrl=ctrl)

    m = mrt.load_model_from_string(HUMANOID)
    assert m.nv == 27
    d = forward.make_data(m).replace(ctrl=jnp.asarray(ctrl))
    step = jax.jit(lambda d: forward.step(m, d))
    qs = []
    for _ in range(200):
        d = step(d)
        qs.append(np.asarray(d.qpos))
    # measured max deviation in this (f64) config is 4.8e-7 over the full
    # 200 steps including floor impact (~step 150); gate at 10x margin
    np.testing.assert_allclose(np.array(qs)[:100], qpos_ref[:100], atol=1e-6)
    np.testing.assert_allclose(np.array(qs), qpos_ref, atol=5e-6)
