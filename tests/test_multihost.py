"""Multi-HOST distribution: 2 real processes over jax.distributed (TCP
coordinator + gloo CPU collectives), each with 4 virtual devices, stepping a
globally-sharded env batch through the shard_map path with a collective
consumer, driven by the host-coordinated control plane.

This is the capability the reference lacks entirely (single process, ROS as
the only boundary — SURVEY.md §2.6); BASELINE config 5 requires it.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

import jax
import jax.numpy as jnp

import mujoco_ros_pkgs_tpu as mrt
from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.parallel import multihost as mh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _reference_trajectory():
    """Single-process reference: same init, same shard_map path on the
    in-process 8-virtual-device mesh emulated as 2 hosts x 4 devices."""
    m = mrt.load_model_from_string(worlds.BOXES, dtype=jnp.float32)
    mesh = mh.make_host_env_mesh(n_hosts=2)
    m = mh.replicate_model(m, mesh)

    def init_fn(d, global_idx):
        qpos = np.array(d.qpos)
        qpos[:, 2] += 0.02 * global_idx
        return d.replace(qpos=jnp.asarray(qpos, dtype=jnp.float32))

    d = mh.make_global_batch(m, 16, mesh, seed=7, dtype=jnp.float32,
                             init_fn=init_fn)
    step = mh.shardmap_step_fn(m, mesh, nsub=5)
    d, c1 = step(d)
    d, c2 = step(d)
    return np.asarray(jax.device_get(d.qpos)), np.asarray(c2)


def test_two_process_sharded_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # workers pin their own platform/devices; scrub the test-process flags
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, WORKER, str(pid), "2", str(port), str(tmp_path)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))
    qpos = [np.load(tmp_path / f"qpos_{pid}.npy") for pid in range(2)]

    # both hosts observed the identical command sequence (process 0's)
    assert results[0]["observed"] == results[1]["observed"]
    cmds = [c for c, _ in results[0]["observed"]]
    assert cmds == [mh.CMD_STEP_N, mh.CMD_PAUSE, mh.CMD_RESUME,
                    mh.CMD_STEP_N, mh.CMD_SHUTDOWN]

    # both hosts hold the identical global state after the run
    np.testing.assert_array_equal(qpos[0], qpos[1])
    np.testing.assert_allclose(results[0]["consumed"],
                               results[1]["consumed"], rtol=0, atol=0)

    # the batch really was sharded over all 8 devices of the 2x4 mesh
    assert results[0]["nshards_qpos"] == 8

    # cross-check against the single-process reference on the same mesh
    # topology: per-env physics is identical; the psum'd consumer may differ
    # in summation order across real process boundaries
    ref_qpos, ref_consumed = _reference_trajectory()
    np.testing.assert_allclose(qpos[0], ref_qpos, atol=1e-6)
    np.testing.assert_allclose(results[0]["consumed"], ref_consumed,
                               atol=1e-5)


SERVER_WORKER = os.path.join(REPO, "tests", "multihost_server_worker.py")


def test_two_process_full_server(tmp_path):
    """A FULL MujocoServer per process: process 0 drives the service surface
    (step action + set_body_state + sensor readout + reset + step) and
    process 1 replays the originated op stream via serve_follower; both end
    with identical global sharded state (VERDICT r2 item 3)."""
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, SERVER_WORKER, str(pid), "2", str(port),
         str(tmp_path)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out.decode(errors="replace"))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"server worker {pid} failed:\n{out[-4000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"server_result_{pid}.json") as f:
            results.append(json.load(f))

    # batch sharded over all 8 devices of the 2x4 mesh on both hosts
    assert results[0]["nshards"] == 8
    assert results[1]["nshards"] == 8

    # identical global state on both hosts after the full service sequence:
    # process 0's originated global snapshot == [proc0 local ; proc1 local]
    final = np.asarray(results[0]["snapshots"]["final"])
    locals_cat = np.concatenate([np.asarray(results[0]["local_qpos"]),
                                 np.asarray(results[1]["local_qpos"])])
    np.testing.assert_array_equal(final, locals_cat)
    assert abs(results[0]["sim_time"] - results[1]["sim_time"]) < 1e-9

    # the sequence actually did things: action stepped 24 steps with
    # feedback, set_body_state moved the box, reset restored t=0 state
    assert results[0]["feedback"][-1] == 0
    snaps = results[0]["snapshots"]
    assert not np.allclose(snaps["after_action"], snaps["after_set_body"])
    # sensors plugin produced noisy + GT readings
    assert np.asarray(results[0]["noisy"]).size > 0
    assert np.any(np.asarray(results[0]["noisy"])
                  != np.asarray(results[0]["gt"]))


def test_host_env_mesh_single_process():
    mesh = mh.make_host_env_mesh(n_hosts=2)
    assert mesh.axis_names == ("host", "env")
    assert mesh.devices.shape == (2, 4)


def test_env_rng_host_count_independent():
    full = np.asarray(mh.env_rng(3, 16))
    lo = np.asarray(mh.env_rng(3, 16, 0, 8))
    hi = np.asarray(mh.env_rng(3, 16, 8, 16))
    np.testing.assert_array_equal(full, np.concatenate([lo, hi]))


def test_coordinator_single_process_passthrough():
    coord = mh.HostCoordinator()
    assert coord.next_command(mh.CMD_STEP_N, 7.0) == (mh.CMD_STEP_N, 7.0)
    assert coord.agree(123.0)
    coord.barrier()  # no-op
