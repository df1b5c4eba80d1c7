"""Model-compilation parity vs libmujoco on the reference test worlds.

Covers what the reference's services read/write from mjModel: masses, inertias,
joint/dof layout, geom properties (mujoco_ros/src/callbacks.cpp:508-592),
equality parameters (callbacks.cpp:641-884).
"""

import numpy as np
import pytest

import mujoco_ros_pkgs_tpu as mrt
from tests import oracle

WORLDS = [
    oracle.REF_WORLDS + "/pendulum_world.xml",
    oracle.REF_WORLDS + "/empty_world.xml",
    oracle.REF_WORLDS + "/equality_world.xml",
    oracle.SENSOR_WORLDS + "/sensors_world.xml",
]


@pytest.fixture(params=WORLDS, ids=[w.split("/")[-1] for w in WORLDS])
def pair(request):
    m = mrt.load_model(request.param)
    mm = oracle.load_oracle(request.param)
    return m, mm


def test_sizes(pair):
    m, mm = pair
    assert m.nq == mm.nq
    assert m.nv == mm.nv
    assert m.nbody == mm.nbody
    assert m.njnt == mm.njnt
    assert m.ngeom == mm.ngeom
    assert m.nsite == mm.nsite
    assert m.neq == mm.neq
    assert m.ntendon == mm.ntendon
    assert m.nsensor == mm.nsensor
    assert m.nsensordata == mm.nsensordata


def test_option(pair):
    m, mm = pair
    assert np.isclose(float(m.opt.timestep), mm.opt.timestep)
    np.testing.assert_allclose(np.asarray(m.opt.gravity), mm.opt.gravity)
    assert m.opt.cone == mm.opt.cone
    assert m.opt.integrator == mm.opt.integrator


def test_body_fields(pair):
    m, mm = pair
    assert list(m.body_parentid) == list(mm.body_parentid)
    assert list(m.body_rootid) == list(mm.body_rootid)
    assert list(m.body_weldid) == list(mm.body_weldid)
    assert list(m.body_jntnum) == list(mm.body_jntnum)
    assert list(m.body_dofadr) == list(mm.body_dofadr)
    np.testing.assert_allclose(np.asarray(m.body_pos), mm.body_pos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.body_quat), mm.body_quat, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.body_mass), mm.body_mass, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(m.body_subtreemass),
                               mm.body_subtreemass, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(m.body_ipos), mm.body_ipos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.body_inertia), mm.body_inertia,
                               rtol=1e-7, atol=1e-14)
    # iquat sign-insensitive
    for i in range(m.nbody):
        q1, q2 = np.asarray(m.body_iquat[i]), mm.body_iquat[i]
        assert min(np.abs(q1 - q2).max(), np.abs(q1 + q2).max()) < 1e-7, i


def test_joint_dof_fields(pair):
    m, mm = pair
    assert list(m.jnt_type) == list(mm.jnt_type)
    assert list(m.jnt_qposadr) == list(mm.jnt_qposadr)
    assert list(m.jnt_dofadr) == list(mm.jnt_dofadr)
    assert list(m.jnt_bodyid) == list(mm.jnt_bodyid)
    assert list(m.dof_parentid) == list(mm.dof_parentid)
    assert list(m.dof_bodyid) == list(mm.dof_bodyid)
    np.testing.assert_allclose(np.asarray(m.jnt_pos), mm.jnt_pos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.jnt_axis), mm.jnt_axis, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.qpos0), mm.qpos0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.qpos_spring), mm.qpos_spring,
                               atol=1e-12)


def test_geom_fields(pair):
    m, mm = pair
    assert list(m.geom_type) == list(mm.geom_type)
    assert list(m.geom_bodyid) == list(mm.geom_bodyid)
    assert list(m.geom_condim) == list(mm.geom_condim)
    np.testing.assert_allclose(np.asarray(m.geom_size), mm.geom_size, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.geom_pos), mm.geom_pos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.geom_friction), mm.geom_friction)
    np.testing.assert_allclose(np.asarray(m.geom_solref), mm.geom_solref)
    np.testing.assert_allclose(np.asarray(m.geom_solimp), mm.geom_solimp)
    np.testing.assert_allclose(np.asarray(m.geom_rbound), mm.geom_rbound,
                               rtol=1e-9)
    for i in range(m.ngeom):
        q1, q2 = np.asarray(m.geom_quat[i]), mm.geom_quat[i]
        assert min(np.abs(q1 - q2).max(), np.abs(q1 + q2).max()) < 1e-9, i


def test_eq_fields(pair):
    m, mm = pair
    if m.neq == 0:
        return
    assert list(m.eq_type) == list(mm.eq_type)
    assert list(m.eq_obj1id) == list(mm.eq_obj1id)
    assert list(m.eq_obj2id) == list(mm.eq_obj2id)
    np.testing.assert_allclose(np.asarray(m.eq_solref), mm.eq_solref)
    np.testing.assert_allclose(np.asarray(m.eq_solimp), mm.eq_solimp)
    np.testing.assert_allclose(np.asarray(m.eq_data), mm.eq_data, atol=1e-9)


def test_invweight0(pair):
    m, mm = pair
    np.testing.assert_allclose(np.asarray(m.dof_invweight0), mm.dof_invweight0,
                               rtol=1e-6, atol=1e-12)
    np.testing.assert_allclose(np.asarray(m.body_invweight0),
                               mm.body_invweight0, rtol=1e-6, atol=1e-12)
    if m.ntendon:
        np.testing.assert_allclose(np.asarray(m.tendon_invweight0),
                                   mm.tendon_invweight0, rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(np.asarray(m.tendon_length0),
                                   mm.tendon_length0, atol=1e-12)


def test_sensor_fields(pair):
    m, mm = pair
    if m.nsensor == 0:
        return
    # enum VALUES shifted between 2.3.7 (ours) and 3.x (oracle): compare names
    import mujoco
    from mujoco_ros_pkgs_tpu.core.types import SensorType
    ours = [SensorType(t).name for t in m.sensor_type]
    theirs = [mujoco.mjtSensor(int(t)).name.replace("mjSENS_", "")
              for t in mm.sensor_type]
    assert ours == theirs
    assert list(m.sensor_objid) == list(mm.sensor_objid)
    assert list(m.sensor_adr) == list(mm.sensor_adr)
    assert list(m.sensor_dim) == list(mm.sensor_dim)
