"""Multi-process worker for the multihost test (NOT a pytest module).

Spawned N times by tests/test_multihost.py; each instance is one "host"
process joining the JAX distributed runtime over a local TCP coordinator,
stepping its shard of a globally-sharded env batch (BASELINE config 5's
"sharded over 2+ hosts feeding a sharded consumer via collectives" — the
capability the reference entirely lacks, SURVEY.md §2.6).

Usage: python multihost_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    cache = os.path.expanduser("~/.cache/mujoco_ros_pkgs_tpu/jax")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mujoco_ros_pkgs_tpu.core import mjcf
    from mujoco_ros_pkgs_tpu.models import worlds
    from mujoco_ros_pkgs_tpu.parallel import multihost as mh

    mh.initialize(coordinator_address=f"127.0.0.1:{port}",
                  num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 4 * nproc

    m = mjcf.load_model_from_string(worlds.BOXES, dtype=jnp.float32)
    mesh = mh.make_host_env_mesh()
    assert mesh.devices.shape == (nproc, 4), mesh.devices.shape
    m = mh.replicate_model(m, mesh)

    nenv = 16

    def init_fn(d, global_idx):
        qpos = np.array(d.qpos)
        qpos[:, 2] += 0.02 * global_idx  # function of GLOBAL env id
        return d.replace(qpos=jnp.asarray(qpos, dtype=jnp.float32))

    d = mh.make_global_batch(m, nenv, mesh, seed=7, dtype=jnp.float32,
                             init_fn=init_fn)

    step = mh.shardmap_step_fn(m, mesh, nsub=5)
    coord = mh.HostCoordinator()

    # control plane: process 0 originates; others propose garbage that must
    # NOT win. Sequence: step 5, pause, resume, step 5, shutdown.
    script = [(mh.CMD_STEP_N, 5.0), (mh.CMD_PAUSE, 0.0),
              (mh.CMD_RESUME, 0.0), (mh.CMD_STEP_N, 5.0),
              (mh.CMD_SHUTDOWN, 0.0)]
    observed = []
    consumed = None
    i = 0
    while True:
        propose = script[i] if pid == 0 else (mh.CMD_NOOP, -99.0)
        cmd, arg = coord.next_command(*propose)
        observed.append((cmd, arg))
        if cmd == mh.CMD_STEP_N:
            assert int(arg) == 5  # nsub baked into the compiled step
            d, consumed = step(d)
            jax.block_until_ready(consumed)
        elif cmd == mh.CMD_SHUTDOWN:
            break
        i += 1
    coord.barrier("final")
    assert coord.agree(m.nq)

    qpos_full = mh.gather_to_host(d.qpos)
    out = {
        "pid": pid,
        "observed": observed,
        "consumed": np.asarray(consumed).tolist(),
        "nshards_qpos": len(d.qpos.sharding.device_set),
    }
    np.save(os.path.join(outdir, f"qpos_{pid}.npy"), qpos_full)
    with open(os.path.join(outdir, f"result_{pid}.json"), "w") as f:
        json.dump(out, f)
    print(f"[worker {pid}] OK", flush=True)


if __name__ == "__main__":
    main()
