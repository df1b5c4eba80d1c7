"""Mesh-sharded stepping (8 virtual CPU devices) + checkpoint/resume.

The reference has no multi-node capability (SURVEY.md §2.6); these tests cover
what replaces it: env-axis sharding over a Mesh with collective consumers, and
batched state save/restore (no trajectory checkpointing upstream, §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_ros_pkgs_tpu as mrt
from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.ops import forward as fwd
from mujoco_ros_pkgs_tpu.parallel import mesh as pmesh


@pytest.fixture(scope="module")
def setup():
    m = mrt.load_model_from_string(worlds.BOXES)
    d1 = fwd.make_data(m)
    nenv = 16
    d = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (nenv,) + x.shape), d1)
    d = d.replace(rng=jax.random.split(jax.random.PRNGKey(0), nenv))
    # diversify states so the consumer aggregate is non-trivial
    qpos = np.array(d.qpos)
    qpos[:, 2] += np.linspace(0, 0.3, nenv)
    d = d.replace(qpos=jnp.asarray(qpos))
    return m, d


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_unsharded(setup):
    m, d = setup
    mesh = pmesh.make_mesh(8)
    md = pmesh.replicate_model(m, mesh)
    ds = pmesh.shard_batch(d, mesh)
    step_sh = pmesh.sharded_step_fn(md, mesh)
    ds1, consumed = step_sh(ds)

    # unsharded reference
    d1 = jax.vmap(lambda dd: fwd.step(m, dd))(d)
    np.testing.assert_allclose(np.asarray(ds1.qpos), np.asarray(d1.qpos),
                               atol=1e-12)
    # collective consumer: replicated mean over the sharded env axis
    expect = np.concatenate([np.asarray(d1.qpos).mean(axis=0),
                             [np.asarray(d1.time).mean()]])
    np.testing.assert_allclose(np.asarray(consumed), expect, atol=1e-12)


def test_sharding_layout(setup):
    m, d = setup
    mesh = pmesh.make_mesh(8)
    ds = pmesh.shard_batch(d, mesh)
    shards = ds.qpos.addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape[0] == 2   # 16 envs / 8 devices


def test_scan_steps_sharded(setup):
    m, d = setup
    mesh = pmesh.make_mesh(8)
    md = pmesh.replicate_model(m, mesh)
    ds = pmesh.shard_batch(d, mesh)
    run = pmesh.scan_steps_fn(md, mesh, nsub=5)
    out = run(ds)
    assert float(np.asarray(out.time[0])) > 0
    # all envs advanced in lockstep
    np.testing.assert_allclose(np.asarray(out.time),
                               np.asarray(out.time)[0], atol=1e-12)


def test_checkpoint_roundtrip(tmp_path):
    from mujoco_ros_pkgs_tpu.server import MujocoServer, checkpoint
    s = MujocoServer(worlds.BOXES, nenv=3, unpause=False)
    s.step(10)
    qpos_ckpt = np.asarray(s.d.qpos).copy()
    t_ckpt = s.sim_time
    checkpoint.save(s, str(tmp_path / "ck"))
    s.step(20)
    assert not np.allclose(np.asarray(s.d.qpos), qpos_ckpt)
    checkpoint.load(s, str(tmp_path / "ck"))
    np.testing.assert_allclose(np.asarray(s.d.qpos), qpos_ckpt)
    assert np.isclose(s.sim_time, t_ckpt)
    # resumed trajectory is deterministic: matches a fresh continuation
    s.step(5)
    q_after = np.asarray(s.d.qpos).copy()
    checkpoint.load(s, str(tmp_path / "ck"))
    s.step(5)
    np.testing.assert_allclose(np.asarray(s.d.qpos), q_after)


def test_checkpoint_model_mismatch(tmp_path):
    from mujoco_ros_pkgs_tpu.server import MujocoServer, checkpoint
    s = MujocoServer(worlds.BOXES, nenv=2, unpause=False)
    checkpoint.save(s, str(tmp_path / "ck"))
    s2 = MujocoServer(worlds.PENDULUM, nenv=2, unpause=False)
    with pytest.raises(ValueError):
        checkpoint.load(s2, str(tmp_path / "ck"))
    s3 = MujocoServer(worlds.BOXES, nenv=4, unpause=False)
    with pytest.raises(ValueError):
        checkpoint.load(s3, str(tmp_path / "ck"))


def test_batched_env0_bitmatches_single():
    """BASELINE config 2's lockstep gate: the vmap-batched env 0 trajectory is
    BIT-IDENTICAL to the unbatched single-env trajectory (exact equality, not
    a tolerance)."""
    m = mrt.load_model_from_string(worlds.BOXES)
    d1 = fwd.make_data(m)
    d1 = d1.replace(qpos=d1.qpos.at[2].set(0.25),
                    qvel=d1.qvel.at[0].set(0.3))
    nenv = 4
    db = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (nenv,) + x.shape), d1)

    step1 = jax.jit(lambda d: fwd.step(m, d))
    stepb = jax.jit(jax.vmap(lambda dd: fwd.step(m, dd)))
    for _ in range(50):
        d1 = step1(d1)
        db = stepb(db)
    q1, qb = np.asarray(d1.qpos), np.asarray(db.qpos)
    v1, vb = np.asarray(d1.qvel), np.asarray(db.qvel)
    assert np.array_equal(qb[0], q1), np.abs(qb[0] - q1).max()
    assert np.array_equal(vb[0], v1), np.abs(vb[0] - v1).max()
    # all lockstep lanes identical
    assert np.array_equal(qb, np.broadcast_to(q1, qb.shape))
