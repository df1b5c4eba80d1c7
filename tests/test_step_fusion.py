"""Whole-step fused kernel (ops/step_tpu.py) vs the general path.

Interpret-mode sweep on CPU: the fused single-free-body step must reproduce
the general pipeline (kinematics -> narrowphase -> efc -> Newton -> Euler)
on the BOXES world from randomized states, both per-step and over a contact
trajectory. Also checks the supports() gate rejects non-qualifying models."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_ros_pkgs_tpu.core import mjcf
from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.ops import forward as fwd
from mujoco_ros_pkgs_tpu.ops import step_tpu


def _batch(m, nenv, seed=0, spread=0.25):
    d1 = fwd.make_data(m, dtype=jnp.float32)
    d = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (nenv,) + x.shape), d1)
    key = jax.random.PRNGKey(seed)
    qpos = jnp.array(d.qpos)
    qpos = qpos.at[:, 2].add(
        spread * jax.random.uniform(key, (nenv,)) - 0.05)
    quat = jax.random.normal(jax.random.fold_in(key, 2), (nenv, 4)) * 0.2
    quat = quat.at[:, 0].add(1.0)
    qpos = qpos.at[:, 3:7].set(quat / jnp.linalg.norm(quat, axis=1,
                                                      keepdims=True))
    qvel = 0.6 * jax.random.normal(jax.random.fold_in(key, 1), (nenv, 6))
    return d.replace(qpos=qpos.astype(jnp.float32),
                     qvel=qvel.astype(jnp.float32),
                     rng=jax.random.split(key, nenv))


def _steps(m, d, n, fused, solver_kernel=True):
    os.environ["MRP_STEP_FUSION"] = "1" if fused else "0"
    # pin the general path to the SAME Newton implementation the fused step
    # embeds (interpret-mode solver kernel): residual differences then come
    # only from the smooth/narrowphase/efc/integration math, not from two
    # solvers agreeing merely to convergence tolerance
    os.environ["MRP_PALLAS_SOLVER"] = "1" if solver_kernel else "0"
    step = jax.jit(lambda dd: jax.vmap(lambda x: fwd.step(m, x))(dd))
    for _ in range(n):
        d = step(d)
    os.environ.pop("MRP_PALLAS_SOLVER", None)
    return d


@pytest.fixture(scope="module")
def boxes_model():
    return mjcf.load_model_from_string(worlds.BOXES, dtype=jnp.float32)


def test_supports_gate(boxes_model):
    assert step_tpu.supports(boxes_model)
    pend = mjcf.load_model_from_string(worlds.PENDULUM, dtype=jnp.float32)
    assert not step_tpu.supports(pend)      # multi-body tree
    pile = mjcf.load_model_from_string(worlds.PILE, dtype=jnp.float32)
    assert not step_tpu.supports(pile)      # 12 free bodies


def test_single_step_matches_general(boxes_model):
    m = boxes_model
    d = _batch(m, 8)
    df = _steps(m, d, 1, fused=True)
    dg = _steps(m, d, 1, fused=False)
    np.testing.assert_allclose(df.qpos, dg.qpos, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(df.qvel, dg.qvel, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(df.qacc_warmstart, dg.qacc_warmstart,
                               rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(np.asarray(df.time), np.asarray(dg.time))
    # and against the default jnp-solver general path: same physics to
    # solver-convergence tolerance
    dj = _steps(m, d, 1, fused=False, solver_kernel=False)
    np.testing.assert_allclose(df.qpos, dj.qpos, atol=5e-4)


def test_trajectory_matches_general(boxes_model):
    m = boxes_model
    d = _batch(m, 8, seed=3)
    df = _steps(m, d, 40, fused=True)
    dg = _steps(m, d, 40, fused=False)
    assert np.isfinite(np.asarray(df.qpos)).all()
    # 40 contact steps in f32: allow impact-amplified divergence but require
    # the trajectories to agree to mm/`cm-per-second` scale
    np.testing.assert_allclose(df.qpos, dg.qpos, atol=2e-3)
    np.testing.assert_allclose(df.qvel, dg.qvel, atol=2e-2)


def test_resting_contact_matches(boxes_model):
    """Settled box: steady contact forces, warmstart path, zero drift."""
    m = boxes_model
    d1 = fwd.make_data(m, dtype=jnp.float32)
    d = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (4,) + x.shape), d1)
    d = d.replace(rng=jax.random.split(jax.random.PRNGKey(0), 4))
    dg = _steps(m, d, 120, fused=False)     # settle on the general path
    df = _steps(m, dg, 30, fused=True)
    dg2 = _steps(m, dg, 30, fused=False)
    np.testing.assert_allclose(df.qpos, dg2.qpos, atol=5e-4)
    np.testing.assert_allclose(df.qvel, dg2.qvel, atol=5e-3)
