"""Renderer coverage + headless viewer-replacement services.

Covers VERDICT r1 items 3/4/6: full-geom-type ray casting (parity vs the
oracle's mj_ray), batched camera streams wired into the server, PNG
encode/decode (lodepng's role), screenshot / body-wrench / save-xml / mjb /
solver-stats services, static TF frames, and the renderCallback marker hook.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mujoco_ros_pkgs_tpu as mrt
from mujoco_ros_pkgs_tpu.ops import forward as fwd, smooth
from mujoco_ros_pkgs_tpu.ops.sensor_impl import _ray_geom
from mujoco_ros_pkgs_tpu.render import camera as rcam
from mujoco_ros_pkgs_tpu.render.offscreen import StreamType
from mujoco_ros_pkgs_tpu.server import MujocoServer
from mujoco_ros_pkgs_tpu.utils import png

ALLGEOMS = """
<mujoco model="allgeoms">
  <asset>
    <mesh name="tet" vertex="0 0 0  0.3 0 0  0 0.3 0  0 0 0.3"/>
    <hfield name="hf" nrow="9" ncol="9" size="1 1 0.4 0.2"/>
  </asset>
  <worldbody>
    <geom name="floor" type="plane" size="20 20 0.1"/>
    <geom name="sph" type="sphere" size="0.3" pos="0 0 1"/>
    <geom name="cap" type="capsule" size="0.2 0.4" pos="2 0 1"/>
    <geom name="box" type="box" size="0.3 0.2 0.25" pos="4 0 1"/>
    <geom name="cyl" type="cylinder" size="0.3 0.4" pos="6 0 1"/>
    <geom name="ell" type="ellipsoid" size="0.2 0.3 0.4" pos="8 0 1"/>
    <geom name="msh" type="mesh" mesh="tet" pos="10 0 1"/>
    <geom name="hf" type="hfield" hfield="hf" pos="12 0 0.5"/>
  </worldbody>
</mujoco>
"""

CAMWORLD = """
<mujoco model="camworld">
  <option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="5 5 0.1" rgba="0.5 0.5 0.5 1"/>
    <body name="ball" pos="0 0 0.5">
      <freejoint/>
      <geom name="b" type="sphere" size="0.15" mass="0.2" rgba="1 0 0 1"/>
    </body>
    <body name="cambody" pos="0 -2 1">
      <camera name="maincam" mode="fixed" quat="0.7933533 0.6087614 0 0"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope="module")
def allgeoms():
    m = mrt.load_model_from_string(ALLGEOMS)
    d = fwd.make_data(m)
    d = jax.jit(lambda d: smooth.fwd_position_smooth(m, d))(d)
    return m, d


def test_ray_every_geom_type_vs_oracle(allgeoms):
    """mj_ray parity for ALL 8 geom types (the reference relies on mj_ray,
    which handles every type; ours must too)."""
    import mujoco
    from tests import oracle

    m, d = allgeoms
    mm = oracle.load_oracle_string(ALLGEOMS)
    dd = mujoco.MjData(mm)
    mujoco.mj_forward(mm, dd)

    rng = np.random.default_rng(3)
    targets = {"sph": [0, 0, 1], "cap": [2, 0, 1], "box": [4, 0, 1],
               "cyl": [6, 0, 1], "ell": [8, 0, 1], "msh": [10, 0.05, 1.0],
               "hf": [12, 0, 0.55], "floor": [15, 3, 0]}
    for name, tgt in targets.items():
        g = m.geom(name)
        for trial in range(4):
            origin = np.asarray(tgt, np.float64) + np.array([0, 0, 3.0]) \
                + 0.05 * rng.standard_normal(3)
            direction = np.asarray(tgt, np.float64) - origin \
                + 0.03 * rng.standard_normal(3)
            direction /= np.linalg.norm(direction)
            gid = np.zeros(1, dtype=np.int32)
            t_ref = mujoco.mj_ray(mm, dd, origin, direction, None, 1, -1, gid)
            t_our = float(_ray_geom(m, d, g, jnp.asarray(origin),
                                    jnp.asarray(direction)))
            if gid[0] != g:
                continue  # oracle hit another geom first; skip comparison
            tol = 0.02 if name == "hf" else 2e-3  # tangent-march vs prisms
            assert abs(t_our - t_ref) < tol, (name, trial, t_our, t_ref)


def test_png_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (12, 17, 3), dtype=np.uint8)
    assert np.array_equal(png.decode(png.encode(rgb)), rgb)
    rgba = rng.integers(0, 255, (7, 5, 4), dtype=np.uint8)
    assert np.array_equal(png.decode(png.encode(rgba)), rgba)
    gray = rng.integers(0, 255, (9, 9), dtype=np.uint8)
    assert np.array_equal(png.decode(png.encode(gray)), gray)
    # float depth -> mm uint16
    depth = np.array([[0.0, 1.234], [5.0, 70.0]])
    out = png.decode(png.encode(depth))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, [[0, 1234], [5000, 65535]])


@pytest.fixture(scope="module")
def cam_server():
    s = MujocoServer(model=CAMWORLD, nenv=3, unpause=False,
                     cam_config={"maincam": {
                         "stream_type": (StreamType.RGB | StreamType.DEPTH
                                         | StreamType.SEGMENTED),
                         "frequency": 1000.0, "width": 32, "height": 24,
                         "env_ids": (0, 2)}})
    yield s
    s.shutdown()


def test_stream_publishes_batched_frames(cam_server):
    s = cam_server
    got = []
    s.render_manager.subscribe("maincam", got.append)
    assert s.step(4).success
    assert got, "no frame published"
    msg = got[-1]
    assert msg["rgb"].shape == (2, 24, 32, 3)       # 2 envs batched
    assert msg["depth"].shape == (2, 24, 32)
    assert msg["segmented"].shape == (2, 24, 32)
    # the red ball must be visible: some pixel dominated by red
    rgb = msg["rgb"][0]
    seg = msg["segmented"][0]
    ball_geom = s.m.geom("b")
    assert (seg == ball_geom).any(), "ball not in segmentation"
    ball_px = rgb[seg == ball_geom]
    assert (ball_px[:, 0] > ball_px[:, 1] + 0.1).all()
    # depth at ball pixels ~ camera distance (cam at (0,-2,1), ball at z~0.5)
    depth_ball = msg["depth"][0][seg == ball_geom]
    assert 1.0 < depth_ball.mean() < 3.0


def test_screenshot_png(tmp_path, cam_server):
    s = cam_server
    path = str(tmp_path / "shot.png")
    r = s.screenshot("maincam", path, width=32, height=24)
    assert r.success, r.message
    img = png.read(path)
    assert img.shape == (24, 32, 3)
    r2 = s.screenshot("nope", str(tmp_path / "x.png"))
    assert not r2.success


def test_render_marker_injection(cam_server):
    s = cam_server
    m, d = s.m, s.d
    d1 = jax.tree_util.tree_map(lambda x: x[:1], d)
    mk = rcam.RenderMarker(pos=jnp.array([0.0, 0.0, 0.6]),
                           size=jnp.array([0.3, 0.0, 0.0]),
                           rgba=jnp.array([0.0, 1.0, 0.0, 1.0]))
    cid = m.cam_names.index("maincam")
    _, _, seg0 = rcam.render_batched(m, d1, cid, 32, 24)
    _, _, seg1 = rcam.render_batched(m, d1, cid, 32, 24, markers=(mk,))
    assert (np.asarray(seg1) == m.ngeom).any(), "marker not rendered"
    assert not (np.asarray(seg0) == m.ngeom).any()


def test_apply_body_wrench(cam_server):
    s = cam_server
    r = s.apply_body_wrench("ball", force=(5.0, 0.0, 0.0), env_id=1)
    assert r.success
    assert s.step(20).success
    vx = np.asarray(s.d.qvel)[:, 0]
    assert vx[1] > 0.05 and abs(vx[0]) < 1e-6
    assert s.clear_body_wrenches().success
    assert not s.apply_body_wrench("nobody").success


def test_save_xml_mjb_and_stats(tmp_path, cam_server):
    s = cam_server
    xp = str(tmp_path / "model.xml")
    assert s.save_xml(xp).success
    assert "camworld" in open(xp).read()
    bp = str(tmp_path / "model.mjb")
    r = s.save_mjb(bp)
    if r.success:   # pip mujoco present in this environment
        assert os.path.getsize(bp) > 100
    stats = s.get_solver_stats()
    assert stats["ncon_capacity"] >= 1
    assert stats["nefc"] >= 1
    assert "measured_slowdown" in stats


def test_static_tf_camera_frames(cam_server):
    s = cam_server
    tf = s.lookup_transform("maincam_optical_frame")
    assert tf is not None and tf[0] == "maincam_link"
    frames = s.camera_frames(0)
    pos, quat = frames["maincam_link"]
    np.testing.assert_allclose(pos, [0, -2, 1], atol=1e-9)
    assert abs(np.linalg.norm(quat) - 1) < 1e-9
