"""Multi-host distribution: jax.distributed + 2D ('host','env') mesh + shard_map.

The reference is strictly single-process — one mjModel/mjData per process, a
single physics thread, ROS topics as the only communication backend
(mujoco_ros/include/mujoco_ros/mujoco_env.h:298-300, SURVEY.md §2.6). The ROS
graph is its process boundary; this module is the TPU-native replacement:

- `initialize()` joins the JAX distributed runtime (one process per host;
  the coordination service replaces the ROS master).
- `make_host_env_mesh()` builds a 2D ('host','env') `jax.sharding.Mesh`:
  the 'host' axis maps to DCN (cross-process), the 'env' axis to ICI within
  a slice. Env batches are sharded over BOTH axes.
- `make_global_batch()` constructs per-host-local Data shards (no host ever
  materialises the global batch) with deterministic per-GLOBAL-env RNG, so
  trajectories are independent of the host count.
- `shardmap_step_fn()` is the hot path: `jax.shard_map` over the mesh, each
  shard stepping its local envs with `vmap(step)`, with an explicit
  `lax.psum` collective consumer (BASELINE config 5: contact-rich scene
  sharded over 2+ hosts feeding a sharded consumer via collectives).
- `HostCoordinator` is the control plane the ROS services provided:
  process 0 originates pause/resume/step-N/reset commands and every host
  observes the same sequence (the semantics of publishSimTime's "no host
  runs ahead" clock discipline, mujoco_ros/src/mujoco_env.cpp:699-714).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mujoco_ros_pkgs_tpu.core.types import Data, Model

BATCH_SPEC = P(("host", "env"))  # env batch dim sharded over both mesh axes

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_count: Optional[int] = None) -> None:
    """Join the JAX distributed runtime (idempotent).

    Arguments default to the MRT_COORDINATOR / MRT_NUM_PROCESSES /
    MRT_PROCESS_ID environment variables so launch scripts can configure a
    whole pod slice uniformly. No-ops in single-process runs (all unset).
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get("MRT_COORDINATOR")
    if num_processes is None and "MRT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MRT_NUM_PROCESSES"])
    if process_id is None and "MRT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MRT_PROCESS_ID"])
    if coordinator_address is None:
        return  # single-process
    kw = {}
    if local_device_count is not None:
        kw["local_device_count"] = local_device_count
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)
    _initialized = True


def make_host_env_mesh(n_hosts: Optional[int] = None,
                       devices=None) -> Mesh:
    """2D ('host','env') device mesh.

    Multi-process: rows are processes (DCN axis), columns the process-local
    devices (ICI axis). Single-process: `n_hosts` emulates the host axis by
    folding the flat device list (used by the driver dryrun and CPU tests);
    defaults to 1.
    """
    devs = list(devices if devices is not None else jax.devices())
    nproc = jax.process_count()
    if devices is None and nproc > 1:
        devs.sort(key=lambda dd: (dd.process_index, dd.id))
        per = len(devs) // nproc
        grid = np.array(devs).reshape(nproc, per)
    else:
        n_hosts = n_hosts or 1
        if len(devs) % n_hosts:
            raise ValueError(f"{len(devs)} devices not divisible by "
                             f"n_hosts={n_hosts}")
        grid = np.array(devs).reshape(n_hosts, len(devs) // n_hosts)
    return Mesh(grid, ("host", "env"))


def replicate_model(m: Model, mesh: Mesh) -> Model:
    """Model constants replicated to every device on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "shape") else x, m)


def env_rng(seed: int, nenv: int, lo: int = 0, hi: Optional[int] = None):
    """Deterministic per-GLOBAL-env PRNG keys [lo, hi): fold_in(env_id).

    Host-count independent: env i gets the same key whether the batch lives
    on 1 chip or 64 hosts (SURVEY §7.5 determinism requirement).
    """
    hi = nenv if hi is None else hi
    base = jax.random.PRNGKey(seed)
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(lo, hi, dtype=jnp.uint32))


def make_global_batch(m: Model, nenv: int, mesh: Mesh, seed: int = 0,
                      dtype=None,
                      init_fn: Optional[Callable] = None):
    """Globally-sharded batched Data built from per-host LOCAL shards.

    Each process materialises only its slice of the env batch —
    `jax.make_array_from_process_local_data` assembles the global array view.
    `init_fn(d_local, global_env_indices) -> d_local` customises initial
    state (heights, velocities, ...) as a function of GLOBAL env ids so the
    result is independent of process count.
    """
    from mujoco_ros_pkgs_tpu.ops import forward as fwd

    n_shards = mesh.devices.size
    if nenv % n_shards:
        raise ValueError(f"nenv={nenv} not divisible by mesh size {n_shards}")
    nproc = max(jax.process_count(), 1)
    pid = jax.process_index()
    per_host = nenv // nproc
    lo, hi = pid * per_host, (pid + 1) * per_host

    d1 = fwd.make_data(m, dtype=dtype)
    with jax.default_device(jax.local_devices()[0]):
        d_local = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (per_host,) + x.shape), d1)
        d_local = d_local.replace(rng=env_rng(seed, nenv, lo, hi))
        if init_fn is not None:
            d_local = init_fn(d_local, np.arange(lo, hi))

    sharding = NamedSharding(mesh, BATCH_SPEC)

    def assemble(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, (nenv,) + x.shape[1:])

    return jax.tree_util.tree_map(assemble, d_local)


def shardmap_step_fn(m: Model, mesh: Mesh, nsub: int = 1,
                     with_consumer: bool = True,
                     control_hook=None, passive_hook=None):
    """jit(shard_map(scan(vmap(step)))) over the ('host','env') mesh.

    Each shard advances its local envs `nsub` steps; the consumer is an
    explicit cross-shard collective (`lax.psum` over both mesh axes) of the
    global mean qpos + mean sim time, replicated to every device — the
    "sharded consumer fed via collectives" of BASELINE config 5. psum rides
    ICI within the 'env' axis and DCN across 'host'.
    """
    from mujoco_ros_pkgs_tpu.ops import forward as fwd

    nenv_total = None  # bound at trace time from the global shape

    def shard_body(d):  # d: the per-shard local batch
        axes = tuple(mesh.axis_names)

        def body(d, _):
            d = jax.vmap(lambda dd: fwd.step(m, dd, control_hook,
                                             passive_hook))(d)
            # leaves computed purely from the replicated model (tiled
            # friction, zero-size actuation buffers, ...) come out of the
            # step "unvarying"; re-tag them so the scan carry typechecks
            # under shard_map's manual-axes discipline
            def tag(x):
                missing = tuple(a for a in axes
                                if a not in jax.typeof(x).vma)
                return (jax.lax.pcast(x, missing, to="varying")
                        if missing else x)
            d = jax.tree_util.tree_map(tag, d)
            return d, None
        d, _ = jax.lax.scan(body, d, None, length=nsub)
        if with_consumer:
            local = jnp.concatenate([jnp.sum(d.qpos, axis=0),
                                     jnp.sum(d.time)[None]])
            total = jax.lax.psum(local, axis_name=("host", "env"))
            consumed = total / nenv_total
        else:
            consumed = jnp.zeros(1, dtype=d.qpos.dtype)
        return d, consumed

    smapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(BATCH_SPEC,),
        out_specs=(BATCH_SPEC, P()),
    )

    def run(d):
        nonlocal nenv_total
        nenv_total = d.qpos.shape[0]
        return smapped(d)

    return jax.jit(run)


# ---------------------------------------------------------------------------
# host-coordinated control plane
# ---------------------------------------------------------------------------

# command opcodes broadcast from process 0 (the ROS-service semantics of
# mujoco_ros/src/callbacks.cpp:49-92, re-expressed as an SPMD broadcast)
CMD_NOOP = 0
CMD_PAUSE = 1
CMD_RESUME = 2
CMD_STEP_N = 3
CMD_RESET = 4
CMD_SHUTDOWN = 5


@dataclass
class HostCoordinator:
    """SPMD control plane: process 0 originates commands, all hosts observe
    the identical sequence (and therefore stay in lockstep — the invariant
    the reference enforces via its /clock busy-wait,
    mujoco_ros/src/mujoco_env.cpp:699-714).

    Usage: every host calls `next_command(local_proposal)` at the same
    step-batch boundary; the return value is process 0's proposal on every
    host. `barrier()` ensures no host runs ahead across control operations.
    """
    tag: str = "mrt"
    _seq: int = 0

    def next_command(self, cmd: int, arg: float = 0.0) -> tuple[int, float]:
        from jax.experimental import multihost_utils
        self._seq += 1
        if jax.process_count() <= 1:
            return cmd, arg
        out = multihost_utils.broadcast_one_to_all(
            np.array([float(cmd), float(arg)], dtype=np.float64))
        return int(out[0]), float(out[1])

    def agree(self, value) -> bool:
        """True iff every process proposes an identical value (model
        fingerprint agreement before reload, etc.)."""
        from jax.experimental import multihost_utils
        if jax.process_count() <= 1:
            return True
        allv = multihost_utils.process_allgather(
            np.asarray(value, dtype=np.float64))
        return bool(np.all(allv == allv[0]))

    def barrier(self, name: str = "step"):
        from jax.experimental import multihost_utils
        if jax.process_count() <= 1:
            return
        self._seq += 1
        multihost_utils.sync_global_devices(f"{self.tag}:{name}:{self._seq}")


def gather_to_host(arr) -> np.ndarray:
    """Fetch a globally-sharded array to every host as a numpy array
    (process_allgather over the addressable shards)."""
    from jax.experimental import multihost_utils
    if jax.process_count() <= 1:
        return np.asarray(arr)
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def local_shard_np(arr) -> np.ndarray:
    """This process's contiguous slice of a batch-sharded array as numpy
    (addressable shards concatenated in global order). Collective-free."""
    shards = sorted(arr.addressable_shards,
                    key=lambda s: (s.index[0].start or 0))
    return np.concatenate([np.asarray(s.data) for s in shards])


def scatter_from_host(np_arr: np.ndarray, mesh: Mesh, dtype=None):
    """Re-shard a GLOBAL numpy array over the mesh batch spec: every process
    passes the identical global array and contributes its local slice
    (jax.make_array_from_process_local_data). Inverse of gather_to_host —
    the write half of control-plane state surgery on sharded batches."""
    sharding = NamedSharding(mesh, BATCH_SPEC)
    np_arr = np.asarray(np_arr, dtype=dtype)
    nproc = max(jax.process_count(), 1)
    nenv = np_arr.shape[0]
    per = nenv // nproc
    lo = jax.process_index() * per
    local = np_arr[lo:lo + per]
    return jax.make_array_from_process_local_data(
        sharding, local, np_arr.shape)


def broadcast_obj(obj=None):
    """Broadcast an arbitrary picklable object from process 0 to all hosts.

    The control-plane fan-out the ROS graph gave the reference for free
    (every node sees the same service call): process 0 originates a
    (service-name, args) tuple, every follower receives it and executes the
    identical mutation on its shard of the batch. Two collectives: length,
    then the padded payload bytes."""
    import pickle
    from jax.experimental import multihost_utils
    if jax.process_count() <= 1:
        return obj
    if jax.process_index() == 0:
        data = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    else:
        data = np.zeros(0, dtype=np.uint8)
    n = int(multihost_utils.broadcast_one_to_all(
        np.array([data.size], dtype=np.int64))[0])
    buf = np.zeros(n, dtype=np.uint8)
    buf[:data.size] = data
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return pickle.loads(buf.tobytes())


def shardmap_hooked_step(m: Model, mesh: Mesh, nsub: int, one_env: Callable):
    """jit(shard_map(scan(vmap(one_env)))) carrying (Data, plugin-states).

    The distributed twin of MujocoServer._get_step_fn's jit(scan(vmap)):
    `one_env(d, ps) -> (d, ps)` is the server's fully-hooked single-env step
    (OU ctrl noise + control/passive/last-stage plugin hooks), vmapped over
    the LOCAL env shard on each device and scanned nsub substeps. Both
    carries are sharded on the batch axis; the model is closed over
    (replicated)."""

    def shard_body(d, ps):
        axes = tuple(mesh.axis_names)

        def tag(x):
            missing = tuple(a for a in axes if a not in jax.typeof(x).vma)
            return (jax.lax.pcast(x, missing, to="varying")
                    if missing else x)

        def body(carry, _):
            d, ps = carry
            d, ps = jax.vmap(one_env)(d, ps)
            d = jax.tree_util.tree_map(tag, d)
            ps = jax.tree_util.tree_map(tag, ps)
            return (d, ps), None
        (d, ps), _ = jax.lax.scan(body, (d, ps), None, length=nsub)
        return d, ps

    smapped = jax.shard_map(
        shard_body, mesh=mesh,
        in_specs=(BATCH_SPEC, BATCH_SPEC),
        out_specs=(BATCH_SPEC, BATCH_SPEC),
    )
    return jax.jit(smapped, donate_argnums=(0, 1))
