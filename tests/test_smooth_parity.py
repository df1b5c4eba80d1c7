"""Smooth-dynamics parity vs libmujoco (contacts/constraints disabled).

The first physics gate of SURVEY.md §7: FK, CRB mass matrix, RNE bias,
acceleration, then a 1000-step Euler trajectory on the pendulum world
(mujoco_ros/test/pendulum_world.xml; 0.001s timestep as the reference tests)."""

import mujoco
import numpy as np
import pytest

import jax
import mujoco_ros_pkgs_tpu as mrt
from mujoco_ros_pkgs_tpu.core.types import DisableBit
from mujoco_ros_pkgs_tpu.ops import forward, smooth
from tests import oracle

PEND = oracle.REF_WORLDS + "/pendulum_world.xml"
_DSBL = DisableBit.CONTACT | DisableBit.CONSTRAINT


@pytest.fixture(scope="module")
def models():
    m = mrt.load_model(PEND)
    m = m.replace(opt=m.opt.replace(disableflags=m.opt.disableflags | _DSBL))
    mm = oracle.load_oracle(PEND)
    mm.opt.disableflags |= (mujoco.mjtDisableBit.mjDSBL_CONTACT
                            | mujoco.mjtDisableBit.mjDSBL_CONSTRAINT)
    return m, mm


def _rand_state(mm, seed=0):
    rng = np.random.default_rng(seed)
    qpos = mm.qpos0 + rng.uniform(-0.3, 0.3, mm.nq)
    # normalize quats (ball at 0, free at 7..10 depending on layout)
    for j in range(mm.njnt):
        if mm.jnt_type[j] == mujoco.mjtJoint.mjJNT_BALL:
            adr = mm.jnt_qposadr[j]
            qpos[adr:adr + 4] /= np.linalg.norm(qpos[adr:adr + 4])
        if mm.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
            adr = mm.jnt_qposadr[j] + 3
            qpos[adr:adr + 4] /= np.linalg.norm(qpos[adr:adr + 4])
    qvel = rng.uniform(-1.0, 1.0, mm.nv)
    return qpos, qvel


def test_fk_parity(models):
    m, mm = models
    qpos, qvel = _rand_state(mm)
    dd = mujoco.MjData(mm)
    dd.qpos[:] = qpos
    dd.qvel[:] = qvel
    mujoco.mj_forward(mm, dd)

    d = forward.make_data(m)
    d = d.replace(qpos=jax.numpy.asarray(qpos), qvel=jax.numpy.asarray(qvel))
    d = smooth.fwd_position_smooth(m, d)

    np.testing.assert_allclose(np.asarray(d.xpos), dd.xpos, atol=1e-12)
    for i in range(m.nbody):
        q1, q2 = np.asarray(d.xquat[i]), dd.xquat[i]
        assert min(np.abs(q1 - q2).max(), np.abs(q1 + q2).max()) < 1e-12
    np.testing.assert_allclose(np.asarray(d.xipos), dd.xipos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.geom_xpos), dd.geom_xpos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.xanchor), dd.xanchor, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.xaxis), dd.xaxis, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.subtree_com), dd.subtree_com,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.cdof), dd.cdof, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.cinert), dd.cinert, atol=1e-11)

    # dense mass matrix
    M = np.zeros((mm.nv, mm.nv))
    mujoco.mj_fullM(mm, dd, M)
    np.testing.assert_allclose(np.asarray(d.qM), M, atol=1e-11)


def test_dynamics_parity(models):
    m, mm = models
    qpos, qvel = _rand_state(mm, seed=1)
    dd = mujoco.MjData(mm)
    dd.qpos[:] = qpos
    dd.qvel[:] = qvel
    mujoco.mj_forward(mm, dd)

    d = forward.make_data(m)
    d = d.replace(qpos=jax.numpy.asarray(qpos), qvel=jax.numpy.asarray(qvel))
    d = forward.forward(m, d)

    np.testing.assert_allclose(np.asarray(d.cvel), dd.cvel, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.cdof_dot), dd.cdof_dot, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.qfrc_bias), dd.qfrc_bias, atol=1e-11)
    np.testing.assert_allclose(np.asarray(d.qfrc_passive), dd.qfrc_passive,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.qacc_smooth), dd.qacc_smooth,
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.qacc), dd.qacc, atol=1e-9)


@pytest.mark.parametrize("nsteps", [1000])
def test_trajectory_parity_smooth(models, nsteps):
    m, mm = models
    qpos_ref, qvel_ref = oracle.rollout(mm, nsteps)

    d = forward.make_data(m)
    step = jax.jit(lambda d: forward.step(m, d))
    qpos_j, qvel_j = [], []
    for _ in range(nsteps):
        d = step(d)
        qpos_j.append(np.asarray(d.qpos))
        qvel_j.append(np.asarray(d.qvel))
    qpos_j, qvel_j = np.array(qpos_j), np.array(qvel_j)

    np.testing.assert_allclose(qpos_j, qpos_ref, atol=1e-8)
    np.testing.assert_allclose(qvel_j, qvel_ref, atol=1e-7)
    assert np.isclose(float(d.time), mm.opt.timestep * nsteps)
