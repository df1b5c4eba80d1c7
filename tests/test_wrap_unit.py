"""Unit tests for the wrap geometry core (ops/wrap.py) — degenerate and
boundary configurations the oracle-parity scenes don't isolate."""

import numpy as np
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.ops import wrap


def _np(x):
    return np.asarray(x)


def test_no_wrap_when_chord_clears_circle():
    p0, p1 = jnp.array([-2.0, 1.5]), jnp.array([2.0, 1.5])
    t0, t1, arc, active = wrap.wrap_circle(p0, p1, 1.0,
                                           jnp.zeros(2), False)
    assert not bool(active)
    assert float(arc) == 0.0
    # inactive tangent points collapse onto the chord midpoint
    np.testing.assert_allclose(_np(t0), [0.0, 1.5], atol=1e-7)
    np.testing.assert_allclose(_np(t1), [0.0, 1.5], atol=1e-7)


def test_no_wrap_when_endpoint_inside_circle():
    p0, p1 = jnp.array([0.2, 0.0]), jnp.array([3.0, 0.1])
    _, _, arc, active = wrap.wrap_circle(p0, p1, 1.0, jnp.zeros(2), False)
    assert not bool(active) and float(arc) == 0.0


def test_symmetric_tangent_wrap():
    # chord passes just under the top: tiny symmetric arc over the top
    p0, p1 = jnp.array([-2.0, 0.9]), jnp.array([2.0, 0.9])
    t0, t1, arc, active = wrap.wrap_circle(p0, p1, 1.0, jnp.zeros(2), False)
    assert bool(active)
    assert 0.0 < float(arc) < 1.0
    np.testing.assert_allclose(_np(t0)[1], _np(t1)[1], atol=1e-6)
    np.testing.assert_allclose(_np(t0)[0], -_np(t1)[0], atol=1e-6)
    # tangent points lie ON the circle
    np.testing.assert_allclose(np.linalg.norm(_np(t0)), 1.0, atol=1e-6)


def test_sidesite_forces_long_way_around():
    # chord passes BELOW the circle; side point above -> forced top wrap
    p0, p1 = jnp.array([-2.0, -1.5]), jnp.array([2.0, -1.5])
    t0, t1, arc_top, act_top = wrap.wrap_circle(p0, p1, 1.0,
                                                jnp.array([0.0, 2.0]), True)
    assert bool(act_top) and float(arc_top) > 2.0     # substantial forced wrap
    assert _np(t0)[1] > 0 and _np(t1)[1] > 0          # tangents on the TOP
    # side point below (same side as chord): degenerate, no wrap
    _, _, arc_bot, act_bot = wrap.wrap_circle(p0, p1, 1.0,
                                              jnp.array([0.0, -2.0]), True)
    assert not bool(act_bot) and float(arc_bot) == 0.0


def test_sphere_colinear_degenerate():
    # both endpoints colinear with the center: no unique geodesic plane
    p0 = jnp.array([0.0, 0.0, 2.0])
    p1 = jnp.array([0.0, 0.0, -2.0])
    _, _, arc, active = wrap.wrap_sphere(p0, p1, 0.5, jnp.zeros(3), False)
    assert not bool(active) and float(arc) == 0.0
    assert np.all(np.isfinite(_np(arc)))


def test_cylinder_helix_z_interpolation():
    # wrap in xy with a z rise: arc length exceeds the planar arc
    p0 = jnp.array([-2.0, 0.9, 0.0])
    p1 = jnp.array([2.0, 0.9, 1.0])
    t0, t1, arc3d, active = wrap.wrap_cylinder(p0, p1, 1.0,
                                               jnp.zeros(3), False)
    assert bool(active)
    q0, q1, arc2d, _ = wrap.wrap_circle(p0[:2], p1[:2], 1.0,
                                        jnp.zeros(2), False)
    assert float(arc3d) >= float(arc2d)
    # tangent z values interpolate strictly between the endpoints' z
    assert 0.0 < float(t0[2]) < 1.0 and 0.0 < float(t1[2]) < 1.0
    assert float(t0[2]) <= float(t1[2])


def test_wrap_geom_frame_roundtrip():
    # a rotated/translated geom frame must give the same arc as local coords
    import jax
    key = jax.random.PRNGKey(3)
    ang = 0.7
    R = jnp.array([[np.cos(ang), -np.sin(ang), 0],
                   [np.sin(ang), np.cos(ang), 0],
                   [0, 0, 1.0]])
    gpos = jnp.array([0.3, -0.2, 0.5])
    p0l = jnp.array([-2.0, 0.9, 0.1])
    p1l = jnp.array([2.0, 0.9, 0.4])
    _, _, arc_local, _ = wrap.wrap_cylinder(p0l, p1l, 1.0, jnp.zeros(3), False)
    t0w, t1w, arc_world, act = wrap.wrap_geom(
        gpos + R @ p0l, gpos + R @ p1l, gpos, R, 1.0, False,
        jnp.zeros(3), False)
    assert bool(act)
    np.testing.assert_allclose(float(arc_world), float(arc_local), atol=1e-5)
