"""SoA (env-on-lanes) narrowphase vs the per-pair AoS routines.

The SoA module mirrors each analytic primitive op-for-op, so the two paths
must agree to roundoff for every geom-type pair, including tie-heavy
degenerate poses (axis-aligned stacked boxes, upright cylinders) where the
first-occurrence argmin/argmax selection semantics matter."""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_ros_pkgs_tpu.ops import math as mmath
from mujoco_ros_pkgs_tpu.ops import narrowphase as nphase
from mujoco_ros_pkgs_tpu.ops import narrowphase_soa as soa

E, P = 5, 7  # envs, pairs


def _rand_rot(rng, shape):
    q = rng.standard_normal(shape + (4,))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return jax.vmap(jax.vmap(mmath.quat_to_mat))(jnp.asarray(q))


def _setup(rng, size1, size2, identity1=False):
    """Build (m, d) stubs with 2*P geoms per env: g1s = 0..P-1, g2s = P..2P-1."""
    G = 2 * P
    xpos = rng.uniform(-0.15, 0.15, (E, G, 3))
    xmat = np.array(_rand_rot(rng, (E, G)))
    if identity1:
        xmat[:, :P] = np.eye(3)
        xpos[:, :P] = 0.0
    sizes = np.zeros((G, 3))
    sizes[:P] = size1
    sizes[P:] = size2
    m = types.SimpleNamespace(geom_size=jnp.asarray(sizes))
    d = types.SimpleNamespace(geom_xpos=jnp.asarray(xpos),
                              geom_xmat=jnp.asarray(xmat),
                              qpos=jnp.zeros((E, 1)))
    return m, d


def _run_both(fn_name, m, d):
    fn = getattr(nphase, fn_name)
    g1s = jnp.arange(P)
    g2s = jnp.arange(P, 2 * P)

    def aos_one_env(xpos, xmat, qpos):
        denv = types.SimpleNamespace(geom_xpos=xpos, geom_xmat=xmat, qpos=qpos)
        return jax.vmap(lambda a, b: fn(m, denv, a, b))(g1s, g2s)

    di_a, po_a, fr_a = jax.vmap(aos_one_env)(d.geom_xpos, d.geom_xmat, d.qpos)

    def soa_one_env(xpos, xmat):
        return soa.collide_pair(fn_name,
                                xpos[g1s], xmat[g1s], m.geom_size[g1s],
                                xpos[g2s], xmat[g2s], m.geom_size[g2s])

    di_s, po_s, fr_s = jax.vmap(soa_one_env)(d.geom_xpos, d.geom_xmat)
    return (di_a, po_a, fr_a), (di_s, po_s, fr_s)


CASES = {
    "_plane_sphere": ([0, 0, 0], [0.08, 0, 0]),
    "_plane_capsule": ([0, 0, 0], [0.05, 0.1, 0]),
    "_plane_ellipsoid": ([0, 0, 0], [0.06, 0.08, 0.1]),
    "_plane_cylinder": ([0, 0, 0], [0.07, 0.09, 0]),
    "_plane_box": ([0, 0, 0], [0.06, 0.07, 0.08]),
    "_sphere_sphere": ([0.07, 0, 0], [0.09, 0, 0]),
    "_sphere_capsule": ([0.07, 0, 0], [0.05, 0.1, 0]),
    "_sphere_cylinder": ([0.07, 0, 0], [0.06, 0.08, 0]),
    "_sphere_box": ([0.07, 0, 0], [0.06, 0.07, 0.08]),
    "_capsule_capsule": ([0.05, 0.09, 0], [0.04, 0.11, 0]),
    "_capsule_box": ([0.05, 0.09, 0], [0.06, 0.07, 0.08]),
    "_box_box": ([0.05, 0.06, 0.07], [0.06, 0.07, 0.08]),
}


@pytest.mark.parametrize("fn_name", sorted(CASES))
def test_soa_matches_aos(fn_name):
    rng = np.random.default_rng(hash(fn_name) % 2**31)
    s1, s2 = CASES[fn_name]
    plane = fn_name.startswith("_plane")
    m, d = _setup(rng, s1, s2, identity1=plane)
    (di_a, po_a, fr_a), (di_s, po_s, fr_s) = _run_both(fn_name, m, d)
    assert di_s.shape == di_a.shape
    np.testing.assert_allclose(di_s, di_a, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(po_s, po_a, rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(fr_s, fr_a, rtol=1e-9, atol=1e-12)


def test_soa_matches_aos_degenerate_ties():
    """Axis-aligned, exactly-stacked boxes and upright cylinders: every
    argmin/argmax in the routines ties, so first-occurrence semantics must
    agree between the two implementations."""
    for fn_name, s1, s2, z in [("_box_box", [0.05] * 3, [0.05] * 3, 0.099),
                               ("_plane_cylinder", [0] * 3, [0.05, 0.05, 0], 0.049),
                               ("_plane_box", [0] * 3, [0.05] * 3, 0.049),
                               ("_sphere_box", [0.05, 0, 0], [0.05] * 3, 0.0)]:
        G = 2 * P
        xpos = np.zeros((E, G, 3))
        xpos[:, P:, 2] = z
        xmat = np.tile(np.eye(3), (E, G, 1, 1))
        sizes = np.zeros((G, 3))
        sizes[:P] = s1
        sizes[P:] = s2
        m = types.SimpleNamespace(geom_size=jnp.asarray(sizes))
        d = types.SimpleNamespace(geom_xpos=jnp.asarray(xpos),
                                  geom_xmat=jnp.asarray(xmat),
                                  qpos=jnp.zeros((E, 1)))
        (di_a, po_a, fr_a), (di_s, po_s, fr_s) = _run_both(fn_name, m, d)
        np.testing.assert_allclose(di_s, di_a, rtol=1e-9, atol=1e-12,
                                   err_msg=fn_name)
        np.testing.assert_allclose(po_s, po_a, rtol=1e-9, atol=1e-12,
                                   err_msg=fn_name)
        np.testing.assert_allclose(fr_s, fr_a, rtol=1e-9, atol=1e-12,
                                   err_msg=fn_name)


def test_soa_unbatched_path():
    """The unbatched custom_vmap branch (single-env server calls)."""
    rng = np.random.default_rng(3)
    m, d = _setup(rng, [0.07, 0, 0], [0.09, 0, 0])
    g1s = jnp.arange(P)
    g2s = jnp.arange(P, 2 * P)
    di, po, fr = soa.collide_pair(
        "_sphere_sphere",
        d.geom_xpos[0][g1s], d.geom_xmat[0][g1s], m.geom_size[g1s],
        d.geom_xpos[0][g2s], d.geom_xmat[0][g2s], m.geom_size[g2s])
    assert di.shape == (P, 1)
    assert po.shape == (P, 1, 3)
    assert fr.shape == (P, 1, 3, 3)
    fn = nphase._sphere_sphere
    denv = types.SimpleNamespace(geom_xpos=d.geom_xpos[0],
                                 geom_xmat=d.geom_xmat[0], qpos=d.qpos[0])
    di_a, po_a, fr_a = jax.vmap(lambda a, b: fn(m, denv, a, b))(g1s, g2s)
    np.testing.assert_allclose(di, di_a, rtol=1e-9)
    np.testing.assert_allclose(po, po_a, rtol=1e-9)
    np.testing.assert_allclose(fr, fr_a, rtol=1e-9)


def test_collide_soa_full_step_parity(monkeypatch):
    """Force SoA in the full collide() on the pile world: contacts must match
    the AoS path to roundoff."""
    from mujoco_ros_pkgs_tpu.core import mjcf
    from mujoco_ros_pkgs_tpu.models import worlds
    from mujoco_ros_pkgs_tpu.ops import forward

    m = mjcf.load_model_from_string(worlds.PILE)
    d0 = forward.make_data(m)
    d0 = forward.forward(m, d0)

    monkeypatch.setenv("MRP_SOA_NARROWPHASE", "0")
    d_aos = nphase.collide(m, d0)
    monkeypatch.setenv("MRP_SOA_NARROWPHASE", "1")
    d_soa = nphase.collide(m, d0)
    np.testing.assert_allclose(d_soa.contact.dist, d_aos.contact.dist,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(d_soa.contact.pos, d_aos.contact.pos,
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(d_soa.contact.frame, d_aos.contact.frame,
                               rtol=1e-9, atol=1e-12)
