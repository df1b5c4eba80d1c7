"""Broadphase top-k compaction (ops/broadphase.py).

The reference relies on libmujoco's sweep-and-prune broadphase
(engine_collision_driver.c via mj_collision); this framework's replacement is
a fixed-shape top-k compaction over the static pair table. These tests pin:
exactness when K covers every overlapping pair (trajectory parity with the
uncompacted path), slot-count reduction, the dynamic-slot plumbing through
efc/solver/sensors, and the overflow diagnostic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_ros_pkgs_tpu.core import mjcf
from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.ops import broadphase as bp
from mujoco_ros_pkgs_tpu.ops import forward as fwd
from mujoco_ros_pkgs_tpu.ops import narrowphase as nph


def _build(topk, iters=12):
    m = mjcf.load_model_from_string(worlds.PILE, dtype=jnp.float32,
                                    pair_topk=topk)
    return m.replace(opt=m.opt.replace(iterations=iters, ls_iterations=8))


def _rollout(m, nsteps):
    d = fwd.make_data(m, dtype=jnp.float32)
    step = jax.jit(lambda dd: fwd.step(m, dd))
    for _ in range(nsteps):
        d = step(d)
    return d


def test_slot_layout_shrinks_and_marks_dynamic():
    m0, mk = _build(0), _build(20)
    g1_full, _, _ = nph.slot_meta(m0)
    g1_k, g2_k, dims_k = nph.slot_meta(mk)
    assert len(g1_k) < len(g1_full)
    ndyn = sum(1 for g in g1_k if g == -2)
    assert ndyn == nph.n_dyn_slots(mk) > 0
    # dynamic slots sit after every static slot and have a static condim
    first_dyn = g1_k.index(-2)
    assert all(g == -2 for g in g1_k[first_dyn:])
    assert all(g2_k[i] == -2 and dims_k[i] in (1, 3, 4, 6)
               for i in range(first_dyn, len(g1_k)))


def test_pair_topk_zero_is_identity_layout():
    m0 = _build(0)
    g1, g2, dims = nph.slot_meta(m0)
    assert -2 not in g1
    assert nph.n_dyn_slots(m0) == 0
    assert fwd.make_data(m0, dtype=jnp.float32).contact.dyn_pair.shape == (0, 2)


def test_settling_trajectory_matches_uncompacted():
    """With K large enough for every truly-overlapping pair, the compacted
    contact set is exact: the pile settles bit-for-bit identically."""
    nsteps = 150
    d0 = _rollout(_build(0), nsteps)
    mk = _build(24)
    dk = _rollout(mk, nsteps)
    np.testing.assert_allclose(np.asarray(d0.qpos), np.asarray(dk.qpos),
                               rtol=0, atol=0)
    # and the broadphase never dropped an overlapping pair
    ov = jax.jit(lambda dd: bp.candidate_overflow(mk, dd))(dk)
    assert int(ov) == 0


def test_overflow_detects_undersized_k():
    """K=1 on a settled pile must report dropped overlapping pairs."""
    mk = _build(1)
    dk = _rollout(mk, 200)
    ov = jax.jit(lambda dd: bp.candidate_overflow(mk, dd))(dk)
    assert int(ov) > 0


def test_batched_vmap_step_with_compaction():
    mk = _build(16)
    d1 = fwd.make_data(mk, dtype=jnp.float32)
    nenv = 4
    d = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (nenv,) + x.shape), d1)
    d = d.replace(rng=jax.random.split(jax.random.PRNGKey(0), nenv))
    step = jax.jit(lambda dd: jax.vmap(lambda e: fwd.step(mk, e))(dd))
    for _ in range(5):
        d = step(d)
    assert bool(jnp.all(jnp.isfinite(d.qpos)))
    assert d.contact.dyn_pair.shape == (nenv, nph.n_dyn_slots(mk), 2)


def test_scores_plane_halfspace():
    """Plane pairs score by halfspace distance, finite pairs by sphere
    separation; both negative exactly when bounding volumes overlap."""
    xml = """
    <mujoco>
      <worldbody>
        <geom name="gnd" type="plane" size="5 5 1"/>
        <body pos="0 0 2"><freejoint/>
          <geom name="s1" type="sphere" size="0.5" mass="1"/></body>
        <body pos="3 0 0.4"><freejoint/>
          <geom name="s2" type="sphere" size="0.5" mass="1"/></body>
      </worldbody>
    </mujoco>"""
    m = mjcf.load_model_from_string(xml, dtype=jnp.float32)
    d = fwd.make_data(m, dtype=jnp.float32)
    d = jax.jit(lambda dd: fwd.step(m, dd))(d)
    from mujoco_ros_pkgs_tpu.core.types import GeomType
    # plane(0)-sphere1(1): center z=2, r=0.5 -> sep ~1.5 (no overlap)
    sep_p = bp.pair_scores(m, d, np.array([0]), np.array([1]), GeomType.PLANE)
    assert float(sep_p[0]) > 1.0
    # plane(0)-sphere2(2): center z~0.4 -> overlapping-ish (sep < 0)
    sep_p2 = bp.pair_scores(m, d, np.array([0]), np.array([2]),
                            GeomType.PLANE)
    assert float(sep_p2[0]) < 0.0
    # sphere-sphere 3m apart, radii 0.5: sep ~2
    sep_s = bp.pair_scores(m, d, np.array([1]), np.array([2]),
                           GeomType.SPHERE)
    assert 1.5 < float(sep_s[0]) < 2.5
