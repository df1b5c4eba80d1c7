"""Height-field collision tests (ops/hfield.py tangent-plane model).

The oracle collides hfields with triangular prisms (mjc_ConvexHField); ours
uses the bilinear tangent plane — identical for flat/planar-cell terrain,
first-order equal on slopes, so tolerances here are looser than primitive
parity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mujoco_ros_pkgs_tpu.core import mjcf
from mujoco_ros_pkgs_tpu.ops import forward as fwd
from mujoco_ros_pkgs_tpu.ops import hfield as hf

from . import oracle

# 5x5 grid over 2x2 m: plane tilted along +x (max height 0.4 m at x edge)
_RAMP = " ".join(str(j / 4.0) for i in range(5) for j in range(5))

_XML = f"""
<mujoco>
  <asset>
    <hfield name="terrain" size="1 1 0.4 0.1" nrow="5" ncol="5"
            elevation="{_RAMP}"/>
  </asset>
  <worldbody>
    <geom name="ground" type="hfield" hfield="terrain"/>
    <body name="ball" pos="0 0 0.8">
      <freejoint/>
      <geom name="ball_g" type="sphere" size="0.1"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_hfield_compile():
    m = mjcf.load_model_from_string(_XML)
    assert m.nhfield == 1
    assert m.hfield_nrow == (5,) and m.hfield_ncol == (5,)
    assert m.geom_dataid[0] == 0
    assert m.geom_type[0] == 1
    np.testing.assert_allclose(np.asarray(m.hfield_size[0]),
                               [1, 1, 0.4, 0.1])
    # pair table includes (hfield, sphere)
    assert (0, 1) in m.collision_pairs


def test_sample_height_bilinear():
    m = mjcf.load_model_from_string(_XML)
    # ramp z = 0.4 * (x+1)/2 -> z(0)=0.2, dz/dx=0.2, dz/dy=0
    z, dzdx, dzdy = hf.sample_height(m, 0, jnp.asarray(0.0), jnp.asarray(0.0))
    assert float(z) == pytest.approx(0.2, abs=1e-9)
    assert float(dzdx) == pytest.approx(0.2, abs=1e-9)
    assert float(dzdy) == pytest.approx(0.0, abs=1e-12)
    z2, _, _ = hf.sample_height(m, 0, jnp.asarray(-1.0), jnp.asarray(0.5))
    assert float(z2) == pytest.approx(0.0, abs=1e-9)


def test_hfield_sphere_contact():
    """Ball overlapping the ramp: contact dist/normal match the surface."""
    m = mjcf.load_model_from_string(_XML)
    d = fwd.make_data(m)
    # surface z at x=0 is 0.2; place ball center at 0.25 -> dist = -0.05
    d = d.replace(qpos=d.qpos.at[2].set(0.25))
    d = fwd.forward(m, d)
    i = int(np.argmin(np.asarray(d.contact.dist)))
    n = np.asarray(d.contact.frame[i, 0])
    # slope normal = normalize([-0.2, 0, 1])
    n_true = np.array([-0.2, 0, 1.0]) / np.linalg.norm([-0.2, 0, 1.0])
    assert abs(np.dot(n, n_true)) > 0.9999
    # penetration along the normal: plane through surface point
    assert float(d.contact.dist[i]) == pytest.approx(
        (0.25 - 0.2) * n_true[2] - 0.1, abs=1e-6)


def test_hfield_drop_vs_oracle():
    """Ball dropped on the ramp settles; height matches the oracle."""
    import mujoco
    m = mjcf.load_model_from_string(_XML)
    step = jax.jit(lambda dd: fwd.step(m, dd))
    d = fwd.make_data(m)
    for _ in range(500):
        d = step(d)
    mm = oracle.load_oracle_string(_XML)
    dd = mujoco.MjData(mm)
    for _ in range(500):
        mujoco.mj_step(mm, dd)
    # both roll down the slope; compare height above the local surface
    ours = np.asarray(d.qpos[:3])
    ref = np.asarray(dd.qpos[:3])
    z_surf_ours = float(hf.sample_height(m, 0, jnp.asarray(ours[0]),
                                         jnp.asarray(ours[1]))[0])
    z_surf_ref = float(hf.sample_height(m, 0, jnp.asarray(ref[0]),
                                        jnp.asarray(ref[1]))[0])
    h_ours = ours[2] - z_surf_ours
    h_ref = ref[2] - z_surf_ref
    assert h_ours == pytest.approx(h_ref, abs=0.02)
    assert 0.05 < h_ours < 0.15          # resting ~1 radius above surface


def test_hfield_box_settles():
    xml = _XML.replace('type="sphere" size="0.1"',
                       'type="box" size="0.1 0.1 0.1"')
    m = mjcf.load_model_from_string(xml)
    step = jax.jit(lambda dd: fwd.step(m, dd))
    d = fwd.make_data(m)
    for _ in range(400):
        d = step(d)
    z_surf = float(hf.sample_height(m, 0, d.qpos[0], d.qpos[1])[0])
    # resting within a couple cm of one half-extent above the local surface
    assert float(d.qpos[2]) - z_surf == pytest.approx(0.1, abs=0.03)
