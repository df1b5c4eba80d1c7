"""Parity tests for the generic convex narrowphase (ops/gjk.py MPR).

MuJoCo 2.3.7 routes ellipsoid/cylinder combinations and mesh hulls through
libccd MPR with one contact per pair (engine_collision_driver.c table); the
oracle here is the mujoco pip build. Contact layouts differ between CCD
implementations, so these tests gate what the dynamics consume — penetration
depth, normal direction, and settled trajectories — not exact point layouts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_ros_pkgs_tpu.core import mjcf
from mujoco_ros_pkgs_tpu.ops import forward as fwd
from mujoco_ros_pkgs_tpu.ops import gjk

from . import oracle


# ---------------------------------------------------------------------------
# MPR unit checks against analytic sphere results
# ---------------------------------------------------------------------------

def _sphere_sup(c, r):
    c = jnp.asarray(c, dtype=jnp.float64)
    return lambda d: c + r * d / jnp.linalg.norm(d)


@pytest.mark.parametrize("gap", [-0.05, -0.01, 0.02])
def test_mpr_sphere_sphere_depth(gap):
    r1, r2 = 0.3, 0.2
    c1 = jnp.array([0.0, 0.0, 0.0])
    c2 = jnp.array([r1 + r2 + gap, 0.0, 0.0])
    dist, pos, n = gjk.mpr(_sphere_sup(c1, r1), _sphere_sup(c2, r2),
                           c1, c2, jnp.float64)
    if gap < 0:
        assert float(dist) == pytest.approx(gap, abs=2e-4)
        np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=2e-3)
        # midpoint of the overlap segment
        assert float(pos[0]) == pytest.approx(r1 + 0.5 * gap, abs=2e-3)
    else:
        assert float(dist) > 0  # masked out; magnitude is a lower bound


def test_mpr_box_box_face_depth():
    """Axis-aligned boxes overlapping by 0.04 along x."""
    def box_sup(c, s):
        c = jnp.asarray(c, dtype=jnp.float64)
        s = jnp.asarray(s, dtype=jnp.float64)
        return lambda d: c + jnp.where(d >= 0, s, -s)
    c1, c2 = jnp.zeros(3), jnp.array([0.36, 0.0, 0.0])
    dist, pos, n = gjk.mpr(box_sup(c1, [0.2] * 3), box_sup(c2, [0.2] * 3),
                           c1, c2, jnp.float64)
    assert float(dist) == pytest.approx(-0.04, abs=1e-3)
    np.testing.assert_allclose(np.asarray(n), [1, 0, 0], atol=1e-2)


# ---------------------------------------------------------------------------
# static contact parity vs the oracle (penetrating configurations)
# ---------------------------------------------------------------------------

_PAIR_WORLDS = {
    "cylinder_box": """
      <mujoco><worldbody>
        <body pos="0 0 0"><freejoint/>
          <geom type="cylinder" size="0.1 0.15"/></body>
        <body pos="0.17 0 0.05"><freejoint/>
          <geom type="box" size="0.1 0.1 0.1"/></body>
      </worldbody></mujoco>""",
    "ellipsoid_ellipsoid": """
      <mujoco><worldbody>
        <body pos="0 0 0"><freejoint/>
          <geom type="ellipsoid" size="0.1 0.08 0.06"/></body>
        <body pos="0.17 0 0.0"><freejoint/>
          <geom type="ellipsoid" size="0.1 0.08 0.06"/></body>
      </worldbody></mujoco>""",
    "capsule_cylinder": """
      <mujoco><worldbody>
        <body pos="0 0 0"><freejoint/>
          <geom type="capsule" size="0.05 0.15"/></body>
        <body pos="0.13 0 0" euler="0 20 0"><freejoint/>
          <geom type="cylinder" size="0.08 0.12"/></body>
      </worldbody></mujoco>""",
    "ellipsoid_box": """
      <mujoco><worldbody>
        <body pos="0 0 0"><freejoint/>
          <geom type="ellipsoid" size="0.1 0.08 0.06"/></body>
        <body pos="0.16 0 0"><freejoint/>
          <geom type="box" size="0.08 0.08 0.08"/></body>
      </worldbody></mujoco>""",
}


@pytest.mark.parametrize("name", sorted(_PAIR_WORLDS))
def test_static_contact_parity(name):
    xml = _PAIR_WORLDS[name]
    m = mjcf.load_model_from_string(xml)
    d = fwd.forward(m, fwd.make_data(m))
    act = np.asarray(d.contact.dist) < np.asarray(d.contact.includemargin)
    assert act.sum() >= 1, "expected at least one active contact"
    i = int(np.argmin(np.asarray(d.contact.dist)))   # deepest
    ours_dist = float(d.contact.dist[i])
    ours_n = np.asarray(d.contact.frame[i, 0])

    mm = oracle.load_oracle_string(oracle.sanitize_xml(xml))
    import mujoco
    dd = mujoco.MjData(mm)
    mujoco.mj_forward(mm, dd)
    assert dd.ncon >= 1
    # deepest oracle contact
    j = int(np.argmin(dd.contact.dist[: dd.ncon]))
    assert ours_dist == pytest.approx(float(dd.contact.dist[j]), abs=3e-3)
    assert abs(np.dot(ours_n, dd.contact.frame[j][:3])) > 0.98


# ---------------------------------------------------------------------------
# mesh pipeline: hull processing + plane/mesh drop trajectory
# ---------------------------------------------------------------------------

_MESH_XML = """
<mujoco>
  <asset>
    <mesh name="tet" vertex="0 0 0  0.2 0 0  0 0.2 0  0 0 0.2"/>
  </asset>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1"/>
    <body pos="0 0 0.3">
      <freejoint/>
      <geom name="tetg" type="mesh" mesh="tet"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_mesh_compile_parity():
    """Hull processing (CoM centering, principal frame, mass) vs mjCMesh."""
    m = mjcf.load_model_from_string(_MESH_XML)
    mm = oracle.load_oracle_string(_MESH_XML)
    assert m.nmesh == 1 and m.mesh_vertnum == (4,)
    assert m.geom_dataid[1] == 0
    np.testing.assert_allclose(np.asarray(m.body_mass[1]), mm.body_mass[1],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m.body_ipos[1]), mm.body_ipos[1],
                               atol=1e-8)
    np.testing.assert_allclose(np.sort(np.asarray(m.body_inertia[1])),
                               np.sort(mm.body_inertia[1]), rtol=1e-5)
    # geom frame offset folds the mesh CoM
    np.testing.assert_allclose(np.asarray(m.geom_pos[1]), mm.geom_pos[1],
                               atol=1e-8)


def test_mesh_drop_settles():
    """Tetrahedron dropped on the plane: settles at matching height."""
    import mujoco
    m = mjcf.load_model_from_string(_MESH_XML)
    step = jax.jit(lambda dd: fwd.step(m, dd))
    d = fwd.make_data(m)
    for _ in range(400):
        d = step(d)
    mm = oracle.load_oracle_string(_MESH_XML)
    dd = mujoco.MjData(mm)
    for _ in range(400):
        mujoco.mj_step(mm, dd)
    # settled: low velocity, z matches oracle within a few mm
    assert float(jnp.linalg.norm(d.qvel)) < 0.5
    assert float(d.qpos[2]) == pytest.approx(dd.qpos[2], abs=8e-3)


def test_convex_drop_cylinder_on_box():
    """Cylinder dropped onto a static box: penetration resolved, stays on top."""
    xml = """
    <mujoco><worldbody>
      <geom name="table" type="box" size="0.3 0.3 0.1" pos="0 0 0.1"/>
      <body pos="0 0 0.45"><freejoint/>
        <geom type="cylinder" size="0.08 0.1"/></body>
    </worldbody></mujoco>"""
    import mujoco
    m = mjcf.load_model_from_string(xml)
    step = jax.jit(lambda dd: fwd.step(m, dd))
    d = fwd.make_data(m)
    for _ in range(400):
        d = step(d)
    mm = oracle.load_oracle_string(xml)
    dd = mujoco.MjData(mm)
    for _ in range(400):
        mujoco.mj_step(mm, dd)
    assert float(d.qpos[2]) == pytest.approx(dd.qpos[2], abs=1e-2)
    assert float(jnp.linalg.norm(d.qvel)) < 0.5
