"""Worker for tests/test_multihost.py::test_two_process_full_server.

Each process runs a FULL MujocoServer over jax.distributed (2 processes x 4
virtual CPU devices): process 0 originates the service sequence — step action,
set_body_state, sensor readout, reset, step — and process 1 replays it through
serve_follower. Both dump their gathered global state for the test to compare.

Reference analogue: the whole ROS service surface
(mujoco_ros/src/callbacks.cpp:49-92), now spanning hosts.

Usage: multihost_server_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys
import threading


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    os.environ["MRT_COORDINATOR"] = f"127.0.0.1:{port}"
    os.environ["MRT_NUM_PROCESSES"] = str(nproc)
    os.environ["MRT_PROCESS_ID"] = str(pid)

    import jax
    jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp
    from mujoco_ros_pkgs_tpu.models import worlds
    from mujoco_ros_pkgs_tpu.msgs import (BodyState, Pose, SensorNoiseModel,
                                          StepGoal, Twist)
    from mujoco_ros_pkgs_tpu.parallel import multihost as mh
    from mujoco_ros_pkgs_tpu.plugins.sensors import SensorsPlugin
    from mujoco_ros_pkgs_tpu.server import MujocoServer

    srv = MujocoServer(
        worlds.SENSORS, nenv=16, unpause=False, distributed=True,
        plugins=[SensorsPlugin({})], dtype=jnp.float32)
    assert jax.process_count() == nproc

    snapshots = []

    def snap(tag):
        # originated read: the follower joins the gather collective
        st = srv.get_batch_state()
        snapshots.append((tag, np.asarray(st["qpos"]).tolist()))

    if pid == 0:
        # --- the service sequence (originated; follower replays it) ---
        srv.register_noise_models([SensorNoiseModel(
            sensor_name="acc", mean=[0.0] * 3, std=[0.01] * 3,
            set_flag=0x7)])
        # step ACTION (async with feedback), like callbacks.cpp:94-129
        done = threading.Event()
        fb = []
        srv.step_action(StepGoal(num_steps=24),
                        feedback_cb=lambda f: fb.append(f.steps_left),
                        done_cb=lambda r: done.set())
        assert done.wait(timeout=300)
        snap("after_action")
        srv.set_body_state(BodyState(
            name="probe", pose=Pose([0.1, -0.2, 0.8], [1, 0, 0, 0]),
            twist=Twist([0, 0, 0], [0, 0, 0])))
        srv.step(8)
        snap("after_set_body")
        st = srv.get_body_state("probe", env_id=5)
        noisy, gt = srv.sensor_outputs(env_id=3)
        srv.reset()
        snap("after_reset")
        srv.step(4)
        snap("final")
        extra = dict(body_z=float(st.pose.position[2]),
                     noisy=np.asarray(noisy).tolist(),
                     gt=np.asarray(gt).tolist(),
                     feedback=fb,
                     sim_time=srv.sim_time)
        srv.shutdown()
    else:
        # follower: execute the op stream until shutdown, then dump this
        # host's LOCAL shard (collective-free) — the test reconstructs the
        # global batch from both locals and checks it against process 0's
        # originated global snapshot
        srv.serve_follower()
        extra = dict(sim_time=srv.sim_time)

    local_qpos = mh.local_shard_np(srv.d.qpos)
    nshards = len(srv.d.qpos.sharding.device_set)
    with open(os.path.join(outdir, f"server_result_{pid}.json"), "w") as f:
        json.dump(dict(snapshots=dict(snapshots), nshards=nshards,
                       local_qpos=np.asarray(local_qpos).tolist(),
                       **extra), f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
