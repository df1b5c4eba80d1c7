"""MujocoServer — the batched, functional reincarnation of MujocoEnv.

The reference (mujoco_ros/src/mujoco_env.cpp) is a thread bundle: a physics
thread stepping one mjData under a recursive mutex, an event thread processing
atomic request flags, ROS spinner threads mutating state through services
(src/callbacks.cpp:49-92), all paced against the wall clock. Here the same
SEMANTICS are provided around a pure, jit-compiled, BATCHED step:

- thousands of env instances step in lockstep (vmap over the env axis,
  optionally sharded over a device mesh — parallel/);
- the control plane is a set of methods mirroring the 12 services + step
  action 1:1 (set_pause, shutdown, reload, reset, set/get_body_state,
  set/get_geom_properties, set/get_eq_constraint_parameters,
  load_initial_joint_states, get_loading_request_state, step action,
  set/get_gravity, set_mocap_state, register_noise_models);
- mutations land between device step batches — the functional analogue of
  "service callbacks lock the physics mutex";
- eval-mode admin-hash gating matches callbacks.cpp:213-223 /
  mujoco_env.cpp:92-105 (constructor throws without a hash in eval mode);
- pause / manual-step / num_steps-termination / real-time pacing semantics
  follow the physics loop (mujoco_env.cpp:436-639);
- model-load failures roll back to the previous model
  (initModelFromQueue, mujoco_env.cpp:851-869).
"""

from __future__ import annotations

import threading
import time as _time
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core import mjcf
from mujoco_ros_pkgs_tpu.core.types import (
    ConeType, Data, EqType, IntegratorType, JointType, Model, SolverType,
)
from mujoco_ros_pkgs_tpu.utils.log import get_logger
from mujoco_ros_pkgs_tpu.msgs import (
    BodyState, EqualityConstraintParameters, GeomProperties, MocapState, Pose,
    ServiceResult, SolverParameters, StateUint, StepGoal, StepResult, Twist,
)
from mujoco_ros_pkgs_tpu.ops import forward as fwd
from mujoco_ros_pkgs_tpu.core import constants
from mujoco_ros_pkgs_tpu.plugins.base import MujocoPlugin, PluginRegistry

# operational status (get_loading_request_state service, callbacks.cpp:72-87)
STATUS_RUNNING = 0
STATUS_LOADING = 1
STATUS_LOAD_REQUESTED = 2

# real-time pacing grid: unbound or percent of real time (mujoco_env.h:236-239)
PERCENT_REAL_TIME = (-1, 100, 80, 66, 50, 40, 33, 25, 20, 16, 13, 10, 8, 6.6,
                     5.0, 4, 3.3, 2.5, 2, 1.6, 1.3, 1, 0.8, 0.66, 0.5, 0.4,
                     0.33, 0.25, 0.2, 0.16, 0.13, 0.1)


class AdminHashError(PermissionError):
    pass


class LockDisciplineError(AssertionError):
    """A guarded state attribute was written without holding the server lock
    (the race-detection analogue of the reference's TSAN build option,
    cmake/Sanitizers.cmake:3-7 — here the single-RLock discipline is
    enforced dynamically instead of compiled in)."""


class MujocoServer:
    """Batched simulation server.

    Args:
      model: MJCF path or XML string.
      nenv: number of lockstep env instances (the reference's single mjData
        becomes a batch axis; num_instances was deprecated upstream,
        launch/launch_server.launch:21 — here it is first-class).
      eval_mode/admin_hash: auth layer over mutating APIs.
      unpause: start running (launch arg `unpause`).
      num_steps: terminate after N steps (launch arg; -1 = forever).
      initial_joint_states: {"name": [values...]} positions, and
      initial_joint_velocities analogously (config/initial_joint_states.yaml).
      dtype: compute dtype (f64 parity / f32 TPU throughput).
    """

    def __init__(self, model: str, nenv: int = 1, *, eval_mode: bool = False,
                 admin_hash: str = "", unpause: bool = True,
                 num_steps: int = -1, realtime: float = -1.0,
                 initial_joint_states: Optional[dict] = None,
                 initial_joint_velocities: Optional[dict] = None,
                 plugins: Sequence[MujocoPlugin] = (),
                 ctrl_noise_std: float = 0.0, ctrl_noise_rate: float = 0.0,
                 cam_config: Optional[dict] = None,
                 pair_topk: int = 0, con_topk: int = 0,
                 distributed: bool = False, mesh_hosts: Optional[int] = None,
                 seed: int = 0,
                 dtype=None):
        if eval_mode and not admin_hash:
            # mujoco_env.cpp:92-105: eval mode requires an admin hash
            raise AdminHashError("eval mode requires an admin hash")
        self.eval_mode = eval_mode
        # distributed data plane (parallel/multihost.py): the env batch is a
        # globally-sharded array over the ('host','env') mesh, the step runs
        # under shard_map, and every mutating service is originated on
        # process 0 and replayed on every follower (serve_follower) so all
        # hosts observe one command sequence — the reference's whole service
        # surface (callbacks.cpp:49-92) now spanning hosts.
        self._dist = bool(distributed)
        self._seed = int(seed)
        self._following = False
        self.mesh = None
        self.coord = None
        if self._dist:
            from mujoco_ros_pkgs_tpu.parallel import multihost
            multihost.initialize()
            self.mesh = multihost.make_host_env_mesh(n_hosts=mesh_hosts)
            self.coord = multihost.HostCoordinator()
        self._admin_hash = admin_hash
        self._log = get_logger("server")
        self._watch = None
        self._watch_meta = None
        self._pick_cache = {}
        self._needs_forward = False
        self.nenv = int(nenv)
        self.dtype = dtype
        # broadphase top-k compaction knob (ops/broadphase.py; 0 = exact
        # static pair table, the reference-equivalent behavior)
        self.pair_topk = int(pair_topk)
        # active-contact solver compaction capacity (see Model.con_topk)
        self.con_topk = int(con_topk)
        self._status = STATUS_LOAD_REQUESTED
        self._load_error = ""
        self.paused = not unpause
        self.num_steps_until_exit = num_steps
        self.realtime_factor = realtime   # fraction of real time; -1 unbound
        self._speed_changed = False
        self.measured_slowdown = 0.0
        self._exit_request = False
        self._lock = threading.RLock()
        self._physics_thread: Optional[threading.Thread] = None
        # set when the stepping thread dies on an exception (failure
        # detection: launch exits nonzero instead of hanging at sim_time=0)
        self.physics_error: Optional[BaseException] = None
        self._clock_subs: List[Callable[[float], None]] = []
        self._init_js = dict(initial_joint_states or {})
        self._init_jv = dict(initial_joint_velocities or {})
        # Ornstein-Uhlenbeck ctrl noise (mujoco_env.cpp:469-481); d.ctrl is
        # the OU state, exactly as the reference uses mjData.ctrl
        self.ctrl_noise_std = float(ctrl_noise_std)
        self.ctrl_noise_rate = float(ctrl_noise_rate)

        self.registry = PluginRegistry()
        self._pending_plugins = list(plugins)
        self._cam_config = dict(cam_config or {})
        # static TF registry (registerStaticTransform, mujoco_env.cpp:178-195)
        self._static_tf: Dict[str, tuple] = {}

        # dynamic race audit (TSAN-equivalent for the lock discipline):
        # writes to the simulation state attributes below must hold _lock.
        # On by default during tests (MRP_LOCK_AUDIT=0 disables; =1 forces).
        import os as _os
        self._lock_audit = _os.environ.get("MRP_LOCK_AUDIT", "1") == "1"

        self._model_source = model
        self._load_model(model)

    # attributes whose writes constitute "the physics mutex discipline"
    # (the reference guards the same state with physics_thread_mutex_,
    # mujoco_env.h:90,155)
    _GUARDED = frozenset({"d", "m", "pstates"})

    def __setattr__(self, name, value):
        if name in MujocoServer._GUARDED:
            lock = self.__dict__.get("_lock")
            # races only exist while the physics thread runs; paused
            # single-threaded use (manual stepping, tests) stays permissive
            if (lock is not None and self.__dict__.get("_lock_audit")
                    and self.__dict__.get("_physics_thread") is not None
                    and not lock._is_owned()):
                raise LockDisciplineError(
                    f"write to MujocoServer.{name} while the physics loop is "
                    f"running, without holding the server lock — wrap the "
                    f"mutation in `with server._lock:`")
        object.__setattr__(self, name, value)

    # ------------------------------------------------------------------
    # loading / lifecycle
    # ------------------------------------------------------------------

    def _compile(self, source: str) -> Model:
        if "<" in source:   # XML string (the reference's VFS string path)
            m = mjcf.load_model_from_string(source, dtype=self.dtype,
                                            pair_topk=self.pair_topk,
                                            con_topk=self.con_topk)
        elif source.endswith(".mjb"):
            # MuJoCo binary model — mj_loadModel analogue
            # (mujoco_ros/src/mujoco_env.cpp:785-836; the reload service
            # accepts either format)
            from mujoco_ros_pkgs_tpu.core import interop
            m = interop.load_model_mjb(source, dtype=self.dtype,
                                       pair_topk=self.pair_topk,
                                       con_topk=self.con_topk)
        else:
            m = mjcf.load_model(source, dtype=self.dtype,
                                pair_topk=self.pair_topk,
                                con_topk=self.con_topk)
        return m

    def _load_model(self, source: str):
        self._status = STATUS_LOADING
        m = self._compile(source)          # propagate errors on first load
        self._install_model(m, source)

    # -- sharded-state surgery helpers (no-ops in single-host mode) --------

    def _np(self, arr) -> np.ndarray:
        """Global WRITABLE numpy copy of a (possibly sharded) batched array
        (allgathered buffers come back read-only; services mutate in place)."""
        if self._dist and jax.process_count() > 1:
            from mujoco_ros_pkgs_tpu.parallel import multihost
            return np.array(multihost.gather_to_host(arr))
        return np.array(arr)

    def _put(self, np_arr, like):
        """Write a global numpy array back as a (possibly sharded) batch."""
        if self._dist:
            from mujoco_ros_pkgs_tpu.parallel import multihost
            return multihost.scatter_from_host(np_arr, self.mesh,
                                               dtype=like.dtype)
        return jnp.asarray(np_arr, dtype=like.dtype)

    def _bcast_env(self, x1, dtype=None):
        """Broadcast one env's value to the whole (possibly sharded) batch."""
        arr = np.asarray(x1)
        full = np.broadcast_to(arr, (self.nenv,) + arr.shape)
        if self._dist:
            from mujoco_ros_pkgs_tpu.parallel import multihost
            return multihost.scatter_from_host(
                full, self.mesh, dtype=dtype or arr.dtype)
        return jnp.asarray(full, dtype=dtype)

    def _forward_batch(self):
        """Batched mj_forward over the whole env batch: recompute derived
        quantities (kinematics, sensors, contacts) without integrating."""
        key = ("fwd_only", id(self.m))
        fn = self._step_cache.get(key)
        if fn is None:
            model = self.m
            fn = jax.jit(lambda dd: jax.vmap(
                lambda x: fwd.forward(model, x))(dd))
            self._step_cache[key] = fn
        self.d = fn(self.d)

    def _fresh_env_slice(self, env_id: int):
        """_env_slice with derived state refreshed first: if a service
        mutated qpos/model state since the last step/forward, run the
        batched forward so renders/pickers see live kinematics even when
        the physics loop is not running (library mode). Takes the lock."""
        with self._lock:
            if self._needs_forward and not self._dist:
                self._forward_batch()
                self._needs_forward = False
            return self._env_slice(env_id)

    def _env_slice(self, env_id: int):
        """One env's Data pytree (gathers sharded leaves in dist mode)."""
        if self._dist and jax.process_count() > 1:
            return jax.tree_util.tree_map(
                lambda x: jnp.asarray(self._np(x)[env_id]), self.d)
        return jax.tree_util.tree_map(lambda x: x[env_id], self.d)

    def _local0(self, arr):
        """First element of this host's local shard (cheap scalar read for
        values identical across lockstep envs, e.g. sim time)."""
        if self._dist and jax.process_count() > 1:
            return np.asarray(arr.addressable_shards[0].data)[0]
        return np.asarray(arr[0])

    def _replicate_model(self, m: Model) -> Model:
        if self._dist:
            from mujoco_ros_pkgs_tpu.parallel import multihost
            return multihost.replicate_model(m, self.mesh)
        return m

    def _make_batch(self, m: Model):
        """Fresh batched Data: sharded over the mesh in distributed mode
        (host-count-independent per-env RNG), plain vmap batch otherwise."""
        if self._dist:
            from mujoco_ros_pkgs_tpu.parallel import multihost
            return multihost.make_global_batch(m, self.nenv, self.mesh,
                                               seed=self._seed,
                                               dtype=self.dtype)
        d1 = fwd.make_data(m, dtype=self.dtype)
        d = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (self.nenv,) + x.shape), d1)
        return d.replace(rng=jax.random.split(jax.random.PRNGKey(self._seed),
                                              self.nenv))

    def _install_model(self, m: Model, source: str):
        m = self._replicate_model(m)
        self.m = m
        self._model_source = source
        d1 = fwd.make_data(m, dtype=self.dtype)
        self.d = self._make_batch(m)
        self._apply_initial_joint_states()

        # plugins
        self.registry = PluginRegistry()
        for p in self._pending_plugins:
            self.registry.register(p, m, d1)
        self.pstates = self._shard_pstates(self._broadcast_pstates(
            self.registry.init_states(m, self.nenv)))
        self._step_cache: Dict[int, Callable] = {}

        # offscreen camera streams (the reference wires rendering into its
        # physics loop, mujoco_env.cpp:501-516; here streams render between
        # step batches). Per-camera <cam>_link / <cam>_optical_frame static
        # TFs are registered like offscreen_camera.cpp:95-120.
        from mujoco_ros_pkgs_tpu.render.offscreen import OffscreenRenderManager
        self.render_manager = (OffscreenRenderManager(m, self._cam_config)
                               if m.ncam else None)
        for ci, cname in enumerate(m.cam_names):
            self.register_static_transform(
                f"{cname}_link", f"{cname}_optical_frame",
                pos=(0.0, 0.0, 0.0),
                # optical frame: z forward, x right, y down (REP-103)
                quat=(0.5, -0.5, 0.5, -0.5))

        # populate derived kinematics (xpos/geom_xpos/...) so renders and
        # screen-ray picking are live BEFORE the first step — the reference
        # keeps paused sims live by running mj_forward in the paused loop
        # branch (mujoco_env.cpp:621-623); see also the paused-branch
        # _forward_batch in _physics_loop
        if not self._dist:
            self._forward_batch()
        self._needs_forward = False

        self._status = STATUS_RUNNING
        self._load_error = ""
        self._runtime_model_edits = False
        quarantined = [p.__class__.__name__ for p in self.registry.plugins
                       if p not in self.registry.cb_ready] \
            if hasattr(self.registry, "plugins") else []
        self._log.info(
            "model '%s' loaded: nenv=%d nbody=%d nv=%d ncam=%d plugins=%d%s",
            m.name or "<inline>", self.nenv, m.nbody, m.nv, m.ncam,
            len(self.registry.cb_ready),
            f" QUARANTINED={quarantined}" if quarantined else "")

    def _broadcast_pstates(self, pstates1):
        return jax.tree_util.tree_map(
            lambda x: (jnp.broadcast_to(jnp.asarray(x),
                                        (self.nenv,) + jnp.asarray(x).shape)
                       if hasattr(x, "shape") or np.isscalar(x) else x),
            pstates1)

    def _shard_pstates(self, pstates):
        if not self._dist:
            return pstates
        from mujoco_ros_pkgs_tpu.parallel import multihost
        return jax.tree_util.tree_map(
            lambda x: multihost.scatter_from_host(np.asarray(x), self.mesh),
            pstates)

    def _apply_initial_joint_states(self):
        """loadInitialJointStates (mujoco_env.cpp:266-389): set joint positions
        and velocities by name, applied at load AND on every reset."""
        m = self.m
        qpos = self._np(self.d.qpos)
        qvel = self._np(self.d.qvel)
        for name, vals in self._init_js.items():
            j = m.joint(name)
            adr = m.jnt_qposadr[j]
            n = JointType(m.jnt_type[j]).nq()
            v = np.atleast_1d(np.asarray(vals, dtype=np.float64))[:n]
            qpos[:, adr:adr + len(v)] = v
        for name, vals in self._init_jv.items():
            j = m.joint(name)
            adr = m.jnt_dofadr[j]
            n = JointType(m.jnt_type[j]).nv()
            v = np.atleast_1d(np.asarray(vals, dtype=np.float64))[:n]
            qvel[:, adr:adr + len(v)] = v
        self.d = self.d.replace(qpos=self._put(qpos, self.d.qpos),
                                qvel=self._put(qvel, self.d.qvel))

    # ------------------------------------------------------------------
    # the compiled batched step
    # ------------------------------------------------------------------

    def _get_step_fn(self, nsub: int) -> Callable:
        """jit(scan(vmap(step), length=nsub)) — cached per substep count."""
        fn = self._step_cache.get(nsub)
        if fn is not None:
            return fn
        registry = self.registry
        control_hook = registry.control_hook()
        passive_hook = registry.passive_hook()
        last_hook = registry.last_stage_hook()

        noise_std = self.ctrl_noise_std
        noise_rate = self.ctrl_noise_rate

        def one_env(m, d, ps):
            if noise_std > 0 and self.m.nu:
                dt = m.opt.timestep.astype(d.qpos.dtype)
                rate = (jnp.exp(-dt / noise_rate) if noise_rate > 0
                        else jnp.zeros((), dtype=d.qpos.dtype))
                scale = noise_std * jnp.sqrt(jnp.maximum(1.0 - rate * rate,
                                                         0.0))
                rng, sub = jax.random.split(d.rng)
                noise = jax.random.normal(sub, (self.m.nu,),
                                          dtype=d.qpos.dtype)
                d = d.replace(ctrl=rate * d.ctrl + scale * noise, rng=rng)
            if control_hook or passive_hook:
                d, ps = fwd.step(m, d, control_hook, passive_hook, hstate=ps)
            else:
                d = fwd.step(m, d)
            if last_hook:
                d, ps = last_hook(m, d, ps)
            return d, ps

        if self._dist:
            from mujoco_ros_pkgs_tpu.parallel import multihost
            model = self.m
            smapped = multihost.shardmap_hooked_step(
                model, self.mesh, nsub,
                lambda d, ps: one_env(model, d, ps))

            def run(m, d, ps):
                return smapped(d, ps)
        else:
            def batch_step(m, d, ps):
                return jax.vmap(one_env, in_axes=(None, 0, 0))(m, d, ps)

            from functools import partial

            @partial(jax.jit, donate_argnums=(1, 2))
            def run(m, d, ps):
                def body(carry, _):
                    d, ps = carry
                    d, ps = batch_step(m, d, ps)
                    return (d, ps), None
                (d, ps), _ = jax.lax.scan(body, (d, ps), None, length=nsub)
                return d, ps

        self._step_cache[nsub] = run
        return fn or run

    # -- distributed control plane (SPMD service origination) ---------------

    def _originate(self, name: str, *args, **kw):
        """Process 0 broadcasts (service, args) so every follower replays the
        identical op at the same step-batch boundary (serve_follower) — the
        ROS graph's service fan-out re-expressed as an SPMD broadcast. Reads
        that gather sharded state are originated too (the gather is a
        collective every process must join). MUST be called with self._lock
        held so broadcast order == execution order across server threads.
        No-op in single-host mode and while following."""
        # any originated mutation marks derived state stale so the paused
        # physics loop re-runs forward (mj_forward-when-paused semantics)
        self._needs_forward = True
        if not (self._dist and not self._following
                and jax.process_count() > 1):
            return
        if jax.process_index() != 0:
            raise RuntimeError("mutating services must originate on process 0")
        from mujoco_ros_pkgs_tpu.parallel import multihost
        multihost.broadcast_obj((name, args, kw))

    def serve_follower(self):
        """Command loop for processes > 0 in distributed mode: execute the
        op stream originated by process 0 until shutdown. Every op runs the
        same deterministic method body on this host's shard, keeping global
        state identical across hosts."""
        import traceback
        assert self._dist and jax.process_count() > 1
        assert jax.process_index() != 0
        from mujoco_ros_pkgs_tpu.parallel import multihost
        self._following = True
        try:
            while not self._exit_request:
                op = multihost.broadcast_obj(None)
                if op is None:
                    continue
                name, args, kw = op
                try:
                    getattr(self, name)(*args, **kw)
                except Exception:
                    traceback.print_exc()
        finally:
            self._following = False

    def _run_chunk(self, chunk: int):
        """Advance the batch `chunk` substeps (one compiled scan). The unit
        of distributed origination: every host executes the same chunk."""
        with self._lock:
            self._originate("_run_chunk", chunk)
            run = self._get_step_fn(chunk)
            self.d, self.pstates = run(self.m, self.d, self.pstates)
            jax.block_until_ready(jax.tree_util.tree_leaves(self.d.qpos))

    def step(self, nsteps: int = 1, block: bool = True) -> StepResult:
        """The Step action (callbacks.cpp:94-129). Rejected while running."""
        if not self.paused and self._physics_thread is not None:
            return StepResult(success=False)
        if nsteps <= 0:
            return StepResult(success=False)
        # batch substeps into at most 64-step compiled scans
        left = nsteps
        while left > 0:
            chunk = min(left, 64)
            self._run_chunk(chunk)
            left -= chunk
        self._publish_clock()
        self._render_offscreen()
        return StepResult(success=True)

    # -- Step ACTION (async, with feedback + preemption; callbacks.cpp:94-129)

    def step_action(self, goal: StepGoal, feedback_cb=None, done_cb=None):
        """Non-blocking step action. Feedback reports steps_left per chunk;
        preempt with `preempt_step_action`. Rejected while unpaused-running."""
        from mujoco_ros_pkgs_tpu.msgs import StepFeedback
        if not self.paused and self._physics_thread is not None:
            if done_cb:
                done_cb(StepResult(success=False))
            return False
        if goal.num_steps <= 0:
            if done_cb:
                done_cb(StepResult(success=False))
            return False
        self._step_preempt = False

        def work():
            left = goal.num_steps
            ok = True
            while left > 0:
                if self._step_preempt or self._exit_request:
                    ok = False
                    break
                chunk = min(left, 16)
                self._run_chunk(chunk)
                left -= chunk
                self._publish_clock()
                if feedback_cb:
                    feedback_cb(StepFeedback(steps_left=left))
            if done_cb:
                done_cb(StepResult(success=ok))

        t = threading.Thread(target=work, daemon=True)
        self._step_thread = t
        t.start()
        return True

    def preempt_step_action(self):
        self._step_preempt = True
        t = getattr(self, "_step_thread", None)
        if t is not None:
            t.join(timeout=30)

    # -- SetFloat / generic param store (mujoco_ros_msgs/SetFloat) ----------

    def set_float(self, name: str, value: float,
                  admin_hash: str = "") -> ServiceResult:
        err = self._check_hash(admin_hash)
        if err:
            return err
        with self._lock:
            self._originate("set_float", name, value, admin_hash)
            if not hasattr(self, "_float_params"):
                self._float_params = {}
            self._float_params[name] = float(value)
        return ServiceResult(True, "")

    def get_float(self, name: str):
        return getattr(self, "_float_params", {}).get(name)

    # -- keyframes (viewer load_key/save_key, viewer.cpp:1671-1690) --------

    def load_keyframe(self, key, admin_hash: str = "") -> ServiceResult:
        err = self._check_hash(admin_hash)
        if err:
            return err
        m = self.m
        if isinstance(key, str):
            try:
                key = m.key_names.index(key)
            except ValueError:
                return ServiceResult(False, f"keyframe '{key}' not found")
        if not (0 <= key < m.nkey):
            return ServiceResult(False, f"keyframe index {key} out of range")
        with self._lock:
            self._originate("load_keyframe", key, admin_hash)
            def bcast(x):
                return self._bcast_env(np.asarray(x), dtype=self.d.qpos.dtype)
            updates = dict(qpos=bcast(m.key_qpos[key]),
                           qvel=bcast(m.key_qvel[key]),
                           time=bcast(m.key_time[key]))
            if m.na:
                updates["act"] = bcast(m.key_act[key])
            if m.nu:
                updates["ctrl"] = bcast(m.key_ctrl[key])
            if m.nmocap:
                updates["mocap_pos"] = bcast(
                    np.asarray(m.key_mpos[key]).reshape(m.nmocap, 3))
                updates["mocap_quat"] = bcast(
                    np.asarray(m.key_mquat[key]).reshape(m.nmocap, 4))
            self.d = self.d.replace(**updates)
        return ServiceResult(True, "")

    def save_keyframe(self, key: int, env_id: int = 0,
                      admin_hash: str = "") -> ServiceResult:
        """Store env state into model keyframe slot (viewer save_key)."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        m = self.m
        if not (0 <= key < m.nkey):
            return ServiceResult(False, f"keyframe index {key} out of range")
        with self._lock:
            self._originate("save_keyframe", key, env_id, admin_hash)
            def setrow(arr, batched, post=lambda x: x):
                a = np.array(arr)
                a[key] = post(self._np(batched)[env_id])
                return jnp.asarray(a)
            updates = dict(
                key_qpos=setrow(m.key_qpos, self.d.qpos),
                key_qvel=setrow(m.key_qvel, self.d.qvel),
                key_time=setrow(m.key_time, self.d.time))
            if m.na:
                updates["key_act"] = setrow(m.key_act, self.d.act)
            if m.nu:
                updates["key_ctrl"] = setrow(m.key_ctrl, self.d.ctrl)
            if m.nmocap:
                updates["key_mpos"] = setrow(m.key_mpos, self.d.mocap_pos,
                                             np.ravel)
                updates["key_mquat"] = setrow(m.key_mquat, self.d.mocap_quat,
                                              np.ravel)
            self.m = self._replicate_model(m.replace(**updates))
        return ServiceResult(True, "")

    def _publish_clock(self):
        # read under the lock: the step fn donates d's buffers, so a
        # concurrent _run_chunk from another thread (watch control, step
        # action) deletes any array grabbed outside the lock mid-read
        t = self.sim_time
        for cb in self._clock_subs:
            cb(t)

    def _render_offscreen(self):
        """Render camera streams between step batches (the reference's
        render handshake inside physicsLoop, mujoco_env.cpp:501-516), after
        running plugin render callbacks (runRenderCbs, callbacks.cpp:145-150)."""
        if self.render_manager is None:
            return
        # hold the lock across the render read: d's buffers are donated by
        # the next step, so a concurrent chunk would delete them mid-render
        with self._lock:
            m, d, t = self.m, self.d, self.sim_time
            markers = self.registry.run_render_callbacks(m, d, t)
            self.render_manager.render_all(m, d, t, markers=markers)

    def subscribe_clock(self, cb: Callable[[float], None]):
        """In-process /clock topic (publishSimTime, mujoco_env.cpp:699-714)."""
        self._clock_subs.append(cb)

    @property
    def sim_time(self) -> float:
        # lock: self.d's buffers are DONATED by the step fn — grabbing the
        # array without the lock races a concurrent _run_chunk that deletes
        # it before _local0 materializes (the round-4 physics-thread
        # "Array has been deleted" failure)
        with self._lock:
            return float(self._local0(self.d.time))

    # ------------------------------------------------------------------
    # physics loop (real-time paced background stepping)
    # ------------------------------------------------------------------

    def start_physics_loop(self):
        if self._physics_thread is not None:
            return
        self._exit_request = False
        self._physics_thread = threading.Thread(target=self._physics_loop,
                                                daemon=True)
        self._physics_thread.start()

    def _physics_loop(self):
        """physicsLoop wrapper: a crash in the stepping thread must not leave
        a zombie server silently reporting sim_time forever — record the
        error (surfaced via `physics_error` / launch exit code) and stop.
        (The reference's physics thread aborts the process via the unhandled
        C++ exception; here the control plane stays up for diagnosis.)"""
        try:
            self._physics_loop_inner()
        except Exception as exc:   # noqa: BLE001 — any step failure
            self.physics_error = exc
            self._log.error("physics loop died: %r", exc, exc_info=True)

    def _physics_loop_inner(self):
        """physicsLoop (mujoco_env.cpp:436-639): pace sim time against the
        wall clock at realtime_factor; unbound (-1) steps as fast as possible."""
        dt = float(np.asarray(self.m.opt.timestep))
        cpu_start = _time.perf_counter()
        sim_start = self.sim_time
        while not self._exit_request and self.num_steps_until_exit != 0:
            if self.paused or self._speed_changed:
                # re-sync the pacing baseline on pause or speed change
                # (speed_changed handling, mujoco_env.cpp:490-521)
                self._speed_changed = False
                cpu_start = _time.perf_counter()
                sim_start = self.sim_time
                if self.paused:
                    # mj_forward-when-paused (mujoco_env.cpp:621-623): keep
                    # renders/pickers/sensors live after service-side state
                    # edits without advancing time
                    if self._needs_forward and not self._dist:
                        with self._lock:
                            self._forward_batch()
                            self._needs_forward = False
                    _time.sleep(0.001)
                    continue
            chunk = 8 if self.realtime_factor < 0 else 1
            if self.num_steps_until_exit > 0:
                chunk = min(chunk, self.num_steps_until_exit)
            self._run_chunk(chunk)
            if self.num_steps_until_exit > 0:
                self.num_steps_until_exit -= chunk
            self._publish_clock()
            self._render_offscreen()
            elapsed_cpu = _time.perf_counter() - cpu_start
            elapsed_sim = self.sim_time - sim_start
            if elapsed_cpu > 0:
                self.measured_slowdown = elapsed_sim / elapsed_cpu
            if self.realtime_factor > 0:
                target_cpu = elapsed_sim / self.realtime_factor
                ahead = target_cpu - elapsed_cpu
                if ahead > 0:
                    _time.sleep(min(ahead, 0.1))
        self._physics_thread = None

    def stop_physics_loop(self):
        self._exit_request = True
        t = self._physics_thread
        if t is not None:
            t.join(timeout=10)

    # ------------------------------------------------------------------
    # admin gating
    # ------------------------------------------------------------------

    def _check_hash(self, admin_hash: str) -> Optional[ServiceResult]:
        """Eval-mode gate on mutating calls (callbacks.cpp:213-223)."""
        if self.eval_mode and admin_hash != self._admin_hash:
            return ServiceResult(False, "invalid admin hash")
        return None

    # ------------------------------------------------------------------
    # services (1:1 with the reference surface, callbacks.cpp:49-92)
    # ------------------------------------------------------------------

    def set_pause(self, paused: bool, admin_hash: str = "") -> ServiceResult:
        err = self._check_hash(admin_hash)
        if err:
            return err
        with self._lock:
            self._originate("set_pause", paused, admin_hash)
            self.paused = bool(paused)
        return ServiceResult(True, "")

    def set_speed(self, factor: float, admin_hash: str = "") -> ServiceResult:
        """Real-time pacing control (the viewer's speed slider /
        percentRealTime grid, mujoco_env.h:236-239). factor <= 0 = unbound."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        with self._lock:
            self._originate("set_speed", factor, admin_hash)
            self.realtime_factor = float(factor) if factor > 0 else -1.0
            self._speed_changed = True
        return ServiceResult(True, "")

    def set_ctrl(self, values, env_id: Optional[int] = None,
                 admin_hash: str = "") -> ServiceResult:
        """Live control-vector editing — the viewer's control sliders synced
        under the physics mutex (viewer.cpp Sync, :1552-1871). env_id None
        writes all envs."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        vals = np.asarray(values, dtype=np.float64)
        if vals.shape != (self.m.nu,):
            return ServiceResult(
                False, f"ctrl needs shape ({self.m.nu},), got {vals.shape}")
        with self._lock:
            self._originate("set_ctrl", vals.tolist(), env_id, admin_hash)
            v = jnp.asarray(vals, dtype=self.d.ctrl.dtype)
            if env_id is None:
                ctrl = jnp.broadcast_to(v, self.d.ctrl.shape)
            else:
                if not (0 <= env_id < self.nenv):
                    return ServiceResult(False, f"bad env_id {env_id}")
                ctrl = self.d.ctrl.at[env_id].set(v)
            self.d = self.d.replace(ctrl=ctrl)
        return ServiceResult(True, "")

    def set_qpos(self, values, env_id: Optional[int] = None,
                 zero_qvel: bool = False,
                 admin_hash: str = "") -> ServiceResult:
        """Live qpos editing — the viewer's joint sliders (viewer.cpp Sync).
        env_id None writes all envs; zero_qvel additionally stills them."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        vals = np.asarray(values, dtype=np.float64)
        if vals.shape != (self.m.nq,):
            return ServiceResult(
                False, f"qpos needs shape ({self.m.nq},), got {vals.shape}")
        with self._lock:
            self._originate("set_qpos", vals.tolist(), env_id, zero_qvel,
                            admin_hash)
            v = jnp.asarray(vals, dtype=self.d.qpos.dtype)
            upd = {}
            if env_id is None:
                upd["qpos"] = jnp.broadcast_to(v, self.d.qpos.shape)
                if zero_qvel:
                    upd["qvel"] = jnp.zeros_like(self.d.qvel)
            else:
                if not (0 <= env_id < self.nenv):
                    return ServiceResult(False, f"bad env_id {env_id}")
                upd["qpos"] = self.d.qpos.at[env_id].set(v)
                if zero_qvel:
                    upd["qvel"] = self.d.qvel.at[env_id].set(0.0)
            self.d = self.d.replace(**upd)
        return ServiceResult(True, "")

    def shutdown(self) -> ServiceResult:
        with self._lock:
            self._originate("shutdown")
            self._exit_request = True
        self.stop_physics_loop()
        return ServiceResult(True, "")

    def reload(self, model: str = "", admin_hash: str = "") -> ServiceResult:
        """Reload current or new model; rollback on failure
        (initModelFromQueue, mujoco_env.cpp:771-911)."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        source = model or self._model_source
        with self._lock:
            self._originate("reload", model, admin_hash)
            self._status = STATUS_LOAD_REQUESTED
            try:
                self._status = STATUS_LOADING
                m = self._compile(source)
            except Exception as exc:
                self._load_error = str(exc)
                self._status = STATUS_RUNNING   # rollback: old model intact
                self._log.error("reload failed (old model kept): %s", exc)
                return ServiceResult(False, self._load_error)
            self._install_model(m, source)
        return ServiceResult(True, "")

    def reset(self, admin_hash: str = "") -> ServiceResult:
        """mj_resetData + initial joint state reapply + plugin reset
        (resetSim, mujoco_env.cpp:246-264)."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        with self._lock:
            self._originate("reset", admin_hash)
            d1 = fwd.make_data(self.m, dtype=self.dtype)
            self.d = self._make_batch(self.m)
            self._apply_initial_joint_states()
            self.registry.reset_all(self.m, d1)
            # plugin STATE pytrees (PID integrators, mocap targets, noise
            # buffers) are re-initialized too — the reference resets plugins
            # on reset via safe_reset (mujoco_env.cpp:246-264); runtime
            # registrations held on plugin objects (e.g. noise models) are
            # reflected because init_state reads the plugin's current config
            self.pstates = self._shard_pstates(self._broadcast_pstates(
                self.registry.init_states(self.m, self.nenv)))
        return ServiceResult(True, "")

    def get_batch_state(self) -> dict:
        """Global numpy snapshot of the batch trajectory state (qpos, qvel,
        time). In distributed mode this is an ORIGINATED read: the gather is
        a collective every host joins (followers replay it)."""
        with self._lock:
            self._originate("get_batch_state")
            return dict(qpos=self._np(self.d.qpos),
                        qvel=self._np(self.d.qvel),
                        time=self._np(self.d.time))

    def get_loading_request_state(self) -> StateUint:
        desc = {STATUS_RUNNING: "simulation ready",
                STATUS_LOADING: "loading in progress",
                STATUS_LOAD_REQUESTED: "load request pending"}[self._status]
        return StateUint(self._status, desc)

    # -- body state ----------------------------------------------------

    def _free_jnt_of_body(self, b: int) -> Optional[int]:
        if self.m.body_jntnum[b] == 1:
            j = self.m.body_jntadr[b]
            if self.m.jnt_type[j] == int(JointType.FREE):
                return j
        return None

    def get_body_state(self, name: str, env_id: int = 0) -> BodyState:
        m = self.m
        b = m.body(name)
        st = BodyState(name=name)
        st.mass = float(np.asarray(m.body_mass[b]))
        j = self._free_jnt_of_body(b)
        if j is not None:
            qadr, vadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
            with self._lock:
                # reads gather sharded state — a collective all hosts join
                self._originate("get_body_state", name, env_id)
                qpos = self._np(self.d.qpos)[env_id]
                qvel = self._np(self.d.qvel)[env_id]
            st.pose = Pose(qpos[qadr:qadr + 3].copy(),
                           qpos[qadr + 3:qadr + 7].copy())
            # free-joint angular velocity is body-local; report world
            from mujoco_ros_pkgs_tpu.ops import math as mmath
            q = jnp.asarray(qpos[qadr + 3:qadr + 7])
            w_local = jnp.asarray(qvel[vadr + 3:vadr + 6])
            w_world = np.asarray(mmath.rot_vec_quat(w_local, q))
            st.twist = Twist(qvel[vadr:vadr + 3].copy(), w_world)
        return st

    def set_body_state(self, state: BodyState, set_pose: bool = True,
                       set_twist: bool = True, set_mass: bool = False,
                       admin_hash: str = "") -> ServiceResult:
        """SetBodyState (callbacks.cpp:226-505): pose/twist for free-jointed
        bodies; mass update re-derives constants like mj_setConst
        (callbacks.cpp:244-258)."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        m = self.m
        try:
            b = m.body(state.name)
        except ValueError:
            return ServiceResult(False, f"body '{state.name}' not found")
        with self._lock:
            self._originate("set_body_state", state, set_pose, set_twist,
                            set_mass, admin_hash)
            if set_pose or set_twist:
                j = self._free_jnt_of_body(b)
                if j is None:
                    return ServiceResult(
                        False, f"body '{state.name}' has no free joint")
                qadr, vadr = m.jnt_qposadr[j], m.jnt_dofadr[j]
                qpos = self._np(self.d.qpos)
                qvel = self._np(self.d.qvel)
                envs = (slice(None) if state.env_id is None else state.env_id)
                if set_pose:
                    quat = np.asarray(state.pose.orientation, dtype=np.float64)
                    quat = quat / max(np.linalg.norm(quat), 1e-15)
                    pos = np.asarray(state.pose.position, dtype=np.float64)
                    # resolve a non-world frame_id to world through the
                    # static-TF registry / camera frames — the reference
                    # transforms the incoming PoseStamped with tf2
                    # (callbacks.cpp:298-302)
                    fid = getattr(state.pose, "frame_id", "") or ""
                    if fid not in ("", "world"):
                        fr = self._resolve_frame(
                            fid, 0 if state.env_id is None else state.env_id)
                        if fr is None:
                            return ServiceResult(
                                False, f"unknown TF frame '{fid}'")
                        fpos, fquat = fr
                        from mujoco_ros_pkgs_tpu.ops import math as mmath
                        pos = fpos + np.asarray(mmath.rot_vec_quat(
                            jnp.asarray(pos), jnp.asarray(fquat)))
                        quat = np.asarray(mmath.quat_mul(
                            jnp.asarray(fquat), jnp.asarray(quat)))
                    qpos[envs, qadr:qadr + 3] = pos
                    qpos[envs, qadr + 3:qadr + 7] = quat
                if set_twist:
                    # world angular velocity → body-local free-joint dofs
                    from mujoco_ros_pkgs_tpu.ops import math as mmath
                    quat = qpos[0 if state.env_id is None else state.env_id,
                                qadr + 3:qadr + 7]
                    w_local = np.asarray(mmath.rot_vec_quat_inv(
                        jnp.asarray(np.asarray(state.twist.angular,
                                               dtype=np.float64)),
                        jnp.asarray(quat)))
                    qvel[envs, vadr:vadr + 3] = state.twist.linear
                    qvel[envs, vadr + 3:vadr + 6] = w_local
                self.d = self.d.replace(
                    qpos=self._put(qpos, self.d.qpos),
                    qvel=self._put(qvel, self.d.qvel))
            if set_mass:
                body_mass = np.array(m.body_mass)
                body_mass[b] = state.mass
                newm = m.replace(body_mass=jnp.asarray(body_mass))
                newm = constants.set_constants(newm)   # mj_setConst re-derive
                self.m = self._replicate_model(newm)
        return ServiceResult(True, "")

    # -- geom properties ----------------------------------------------

    def get_geom_properties(self, name: str) -> GeomProperties:
        m = self.m
        g = m.geom(name)
        fr = np.asarray(m.geom_friction[g])
        sz = np.asarray(m.geom_size[g])
        return GeomProperties(
            name=name, type=m.geom_type[g],
            body_mass=float(np.asarray(m.body_mass[m.geom_bodyid[g]])),
            friction_slide=float(fr[0]), friction_spin=float(fr[1]),
            friction_roll=float(fr[2]),
            size_0=float(sz[0]), size_1=float(sz[1]), size_2=float(sz[2]))

    def set_geom_properties(self, props: GeomProperties,
                            set_type: bool = False, set_mass: bool = False,
                            set_friction: bool = False, set_size: bool = False,
                            admin_hash: str = "") -> ServiceResult:
        """SetGeomProperties (callbacks.cpp:508-592)."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        m = self.m
        try:
            g = m.geom(props.name)
        except ValueError:
            return ServiceResult(False, f"geom '{props.name}' not found")
        with self._lock:
            self._originate("set_geom_properties", props, set_type, set_mass,
                            set_friction, set_size, admin_hash)
            updates = {}
            if set_friction:
                fr = np.array(m.geom_friction)
                fr[g] = [props.friction_slide, props.friction_spin,
                         props.friction_roll]
                updates["geom_friction"] = jnp.asarray(fr)
            if set_size:
                sz = np.array(m.geom_size)
                sz[g] = [props.size_0, props.size_1, props.size_2]
                updates["geom_size"] = jnp.asarray(sz)
                rb = np.array(m.geom_rbound)
                from mujoco_ros_pkgs_tpu.core.mjcf import _geom_rbound
                rb[g] = _geom_rbound(m.geom_type[g], sz[g])
                updates["geom_rbound"] = jnp.asarray(rb)
            if set_mass:
                bm = np.array(m.body_mass)
                bm[m.geom_bodyid[g]] = props.body_mass
                updates["body_mass"] = jnp.asarray(bm)
            newm = m.replace(**updates) if updates else m
            if set_type and props.type != m.geom_type[g]:
                # static structure change: rebuild the collision pair table
                # (per-pair contact capacities depend on the type) and the
                # live contact/efc buffers whose shapes were compiled from it
                from mujoco_ros_pkgs_tpu.core import assemble
                from mujoco_ros_pkgs_tpu.ops import narrowphase
                from mujoco_ros_pkgs_tpu.ops import efc as efcmod
                gt = list(m.geom_type)
                gt[g] = int(props.type)
                newm = newm.replace(geom_type=tuple(gt))
                rb = np.array(newm.geom_rbound)
                from mujoco_ros_pkgs_tpu.core.mjcf import _geom_rbound
                rb[g] = _geom_rbound(int(props.type), np.asarray(newm.geom_size[g]))
                newm = newm.replace(geom_rbound=jnp.asarray(rb))
                newm = assemble.rebuild_pair_table(newm)
                c1 = narrowphase.empty_contact(newm, self.d.qpos.dtype)
                nefc = max(efcmod.row_layout(newm)["nrow"], 1)
                self.d = self.d.replace(
                    contact=jax.tree_util.tree_map(self._bcast_env, c1),
                    efc_force_contact=self._bcast_env(
                        np.zeros(nefc), dtype=self.d.qpos.dtype))
            if updates or set_type:
                newm = constants.set_constants(newm)
                self.m = self._replicate_model(newm)
                self._runtime_model_edits = True
                for p in self.registry.cb_ready:
                    p.on_geom_changed(newm, g)
        return ServiceResult(True, "")

    # -- gravity -------------------------------------------------------

    def get_gravity(self) -> np.ndarray:
        return np.asarray(self.m.opt.gravity)

    def set_gravity(self, gravity, admin_hash: str = "") -> ServiceResult:
        err = self._check_hash(admin_hash)
        if err:
            return err
        with self._lock:
            self._originate("set_gravity",
                            tuple(np.asarray(gravity).tolist()), admin_hash)
            self.m = self._replicate_model(self.m.replace(opt=self.m.opt.replace(
                gravity=jnp.asarray(np.asarray(gravity, dtype=np.float64)))))
            self._runtime_model_edits = True
        return ServiceResult(True, "")

    # -- physics options (viewer Sync's mjModel.opt editing,
    #    viewer.cpp:1552-1871, as a service) ----------------------------

    _OPT_ARRAY_FIELDS = ("timestep", "gravity", "wind", "magnetic", "density",
                         "viscosity", "impratio", "o_margin", "tolerance",
                         "ls_tolerance")
    _OPT_STATIC_FIELDS = ("integrator", "cone", "solver", "iterations",
                          "ls_iterations", "disableflags")

    def get_physics_properties(self) -> dict:
        """Current mjModel.opt as a plain dict (enums by name)."""
        o = self.m.opt
        out = {f: np.asarray(getattr(o, f)).tolist()
               for f in self._OPT_ARRAY_FIELDS}
        out.update(integrator=IntegratorType(o.integrator).name,
                   cone=ConeType(o.cone).name,
                   solver=SolverType(o.solver).name,
                   iterations=int(o.iterations),
                   ls_iterations=int(o.ls_iterations),
                   disableflags=int(o.disableflags))
        return out

    def set_physics_properties(self, props: dict,
                               admin_hash: str = "") -> ServiceResult:
        """Edit mjModel.opt on a running server — the operator surface the
        reference exposes through the viewer's option section + Sync
        (viewer.cpp:1552-1871). Array-valued fields (timestep, wind, ...)
        apply without retracing; structural fields (integrator, cone, solver,
        iterations, disableflags) retrace the step on next use, and a cone
        change rebuilds the efc row layout (pyramidal facets vs elliptic
        blocks change nefc)."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        unknown = [k for k in props
                   if k not in self._OPT_ARRAY_FIELDS
                   and k not in self._OPT_STATIC_FIELDS]
        if unknown:
            return ServiceResult(False, f"unknown option fields: {unknown}")
        with self._lock:
            self._originate("set_physics_properties", dict(props), admin_hash)
            o = self.m.opt
            old_cone = o.cone
            upd = {}
            try:
                for k, v in props.items():
                    if k in self._OPT_ARRAY_FIELDS:
                        cur = np.asarray(getattr(o, k))
                        arr = np.asarray(v, dtype=np.float64).reshape(cur.shape)
                        upd[k] = jnp.asarray(arr)
                    elif k in ("integrator", "cone", "solver"):
                        enum_t = {"integrator": IntegratorType,
                                  "cone": ConeType,
                                  "solver": SolverType}[k]
                        upd[k] = int(enum_t[v.upper()] if isinstance(v, str)
                                     else enum_t(int(v)))
                    else:
                        upd[k] = int(v)
            except (KeyError, ValueError) as exc:
                return ServiceResult(False, f"bad option value: {exc}")
            newm = self.m.replace(opt=o.replace(**upd))
            if {"density", "viscosity", "wind"} & set(upd):
                # fluid-ness is a static branch of passive(); flipping it
                # retraces the step on next use (documented above)
                newm = newm.replace(has_fluid=bool(
                    float(np.asarray(newm.opt.density)) > 0
                    or float(np.asarray(newm.opt.viscosity)) > 0
                    or np.any(np.asarray(newm.opt.wind) != 0)))
            if int(newm.opt.cone) != int(old_cone):
                # efc row structure changes with the cone type: rebuild the
                # contact-force buffer exactly like the set_geom_properties
                # set_type path
                from mujoco_ros_pkgs_tpu.ops import efc as efcmod
                nefc = max(efcmod.row_layout(newm)["nrow"], 1)
                self.d = self.d.replace(
                    efc_force_contact=self._bcast_env(
                        np.zeros(nefc), dtype=self.d.qpos.dtype))
            self.m = self._replicate_model(newm)
            self._runtime_model_edits = True
            self._log.info("physics options updated: %s", sorted(props))
        return ServiceResult(True, "")

    # -- equality constraints -----------------------------------------

    def get_eq_constraint_parameters(self, name: str, env_id: int = 0
                                     ) -> EqualityConstraintParameters:
        m = self.m
        e = m.eq_names.index(name)
        data = np.asarray(m.eq_data[e])
        solref = np.asarray(m.eq_solref[e])
        solimp = np.asarray(m.eq_solimp[e])
        with self._lock:
            self._originate("get_eq_constraint_parameters", name, env_id)
            eq_active = bool(self._np(self.d.eq_active)[env_id, e])
        p = EqualityConstraintParameters(
            name=name, type=m.eq_type[e],
            active=eq_active,
            solverParameters=SolverParameters(
                dmin=solimp[0], dmax=solimp[1], width=solimp[2],
                midpoint=solimp[3], power=solimp[4],
                timeconst=solref[0], dampratio=solref[1]))
        if m.eq_type[e] == int(EqType.CONNECT):
            p.anchor = data[0:3].copy()
            p.element1 = m.body_names[m.eq_obj1id[e]]
            p.element2 = m.body_names[m.eq_obj2id[e]]
        elif m.eq_type[e] == int(EqType.WELD):
            p.anchor = data[0:3].copy()
            p.relpose = Pose(data[3:6].copy(), data[6:10].copy())
            p.torquescale = float(data[10])
            p.element1 = m.body_names[m.eq_obj1id[e]]
            p.element2 = m.body_names[m.eq_obj2id[e]]
        elif m.eq_type[e] == int(EqType.JOINT):
            p.polycoef = data[0:5].copy()
            p.element1 = m.jnt_names[m.eq_obj1id[e]]
            p.element2 = (m.jnt_names[m.eq_obj2id[e]]
                          if m.eq_obj2id[e] >= 0 else "")
        else:
            p.polycoef = data[0:5].copy()
            p.element1 = m.tendon_names[m.eq_obj1id[e]]
            p.element2 = (m.tendon_names[m.eq_obj2id[e]]
                          if m.eq_obj2id[e] >= 0 else "")
        return p

    def set_eq_constraint_parameters(self, p: EqualityConstraintParameters,
                                     admin_hash: str = "") -> ServiceResult:
        """SetEqualityConstraintParameters (callbacks.cpp:641-884)."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        m = self.m
        try:
            e = m.eq_names.index(p.name)
        except ValueError:
            return ServiceResult(False, f"equality '{p.name}' not found")
        with self._lock:
            self._originate("set_eq_constraint_parameters", p, admin_hash)
            data = np.array(m.eq_data)
            solref = np.array(m.eq_solref)
            solimp = np.array(m.eq_solimp)
            sp = p.solverParameters
            solimp[e] = [sp.dmin, sp.dmax, sp.width, sp.midpoint, sp.power]
            solref[e] = [sp.timeconst, sp.dampratio]
            if m.eq_type[e] == int(EqType.CONNECT):
                data[e, 0:3] = p.anchor
            elif m.eq_type[e] == int(EqType.WELD):
                data[e, 0:3] = p.anchor
                q = np.asarray(p.relpose.orientation, dtype=np.float64)
                qn = np.linalg.norm(q)
                data[e, 3:6] = p.relpose.position
                data[e, 6:10] = q / qn if qn > 1e-15 else [1, 0, 0, 0]
                data[e, 10] = p.torquescale
            else:
                data[e, 0:5] = p.polycoef
            self.m = self._replicate_model(m.replace(
                eq_data=jnp.asarray(data),
                eq_solref=jnp.asarray(solref),
                eq_solimp=jnp.asarray(solimp)))
            ea = self._np(self.d.eq_active)
            envs = slice(None) if p.env_id is None else p.env_id
            ea[envs, e] = bool(p.active)
            self.d = self.d.replace(eq_active=self._put(ea, self.d.eq_active))
        return ServiceResult(True, "")

    # -- plugin-backed services ---------------------------------------

    def _plugin_of(self, cls):
        for i, p in enumerate(self.registry.cb_ready):
            if isinstance(p, cls):
                return i, p
        return None, None

    def set_mocap_state(self, state: MocapState,
                        admin_hash: str = "") -> ServiceResult:
        err = self._check_hash(admin_hash)
        if err:
            return err
        from mujoco_ros_pkgs_tpu.plugins.mocap import MocapPlugin
        i, p = self._plugin_of(MocapPlugin)
        if p is None:
            return ServiceResult(False, "no mocap plugin loaded")
        with self._lock:
            self._originate("set_mocap_state", state, admin_hash)
            states = list(self.pstates)
            ps_np = jax.tree_util.tree_map(self._np, states[i])
            new_ps, res = p.set_state(ps_np, state)
            states[i] = self._shard_pstates(new_ps)
            self.pstates = tuple(states)
        return res

    def register_noise_models(self, models, admin_hash: str = "") -> ServiceResult:
        err = self._check_hash(admin_hash)
        if err:
            return err
        from mujoco_ros_pkgs_tpu.plugins.sensors import SensorsPlugin
        i, p = self._plugin_of(SensorsPlugin)
        if p is None:
            return ServiceResult(False, "no sensors plugin loaded")
        with self._lock:
            self._originate("register_noise_models", models, admin_hash)
            rejected = p.register_noise_models(models)
            mean, std, enabled = p.noise_arrays(self.m)
            ps = dict(self.pstates[i])
            ps["mean"] = self._bcast_env(np.asarray(mean))
            ps["std"] = self._bcast_env(np.asarray(std))
            ps["enabled"] = self._bcast_env(np.asarray(enabled))
            states = list(self.pstates)
            states[i] = ps
            self.pstates = tuple(states)
        return ServiceResult(rejected == 0, f"{rejected} models rejected")

    def sensor_outputs(self, env_id: int = 0):
        """Read the sensors plugin's (noisy, ground-truth) arrays.
        GT is withheld in eval mode (plugin.cpp:64-68)."""
        from mujoco_ros_pkgs_tpu.plugins.sensors import SensorsPlugin
        i, p = self._plugin_of(SensorsPlugin)
        if p is None:
            return None, None
        with self._lock:
            self._originate("sensor_outputs", env_id)
            ps = self.pstates[i]
            noisy = self._np(ps["noisy"])[env_id]
            gt = None if self.eval_mode else self._np(ps["gt"])[env_id]
        return noisy, gt

    def load_initial_joint_states(self, positions: dict, velocities: dict,
                                  admin_hash: str = "") -> ServiceResult:
        err = self._check_hash(admin_hash)
        if err:
            return err
        with self._lock:
            self._originate("load_initial_joint_states", positions,
                            velocities, admin_hash)
            self._init_js = dict(positions)
            self._init_jv = dict(velocities)
            self._apply_initial_joint_states()
        return ServiceResult(True, "")

    # ------------------------------------------------------------------
    # static TF registry (registerStaticTransform, mujoco_env.cpp:178-195;
    # per-camera frames offscreen_camera.cpp:95-120)
    # ------------------------------------------------------------------

    def register_static_transform(self, parent: str, child: str,
                                  pos=(0.0, 0.0, 0.0),
                                  quat=(1.0, 0.0, 0.0, 0.0)) -> None:
        """Register a static parent->child transform (pos, wxyz quat)."""
        self._static_tf[child] = (parent, np.asarray(pos, dtype=np.float64),
                                  np.asarray(quat, dtype=np.float64))

    def static_transforms(self) -> dict:
        """All registered static transforms: child -> (parent, pos, quat)."""
        return dict(self._static_tf)

    def lookup_transform(self, child: str):
        """(parent, pos, quat) of a registered static frame, or None."""
        return self._static_tf.get(child)

    def _resolve_frame(self, frame_id: str, env_id: int = 0):
        """World pose (pos, wxyz quat) of a named TF frame, chaining static
        transforms parent-ward until 'world' and falling back to live
        camera frames — the tf2 lookup the reference performs before
        applying a PoseStamped (callbacks.cpp:298-302). None if unknown."""
        from mujoco_ros_pkgs_tpu.ops import math as mmath
        if frame_id in ("", "world"):
            return (np.zeros(3), np.array([1.0, 0.0, 0.0, 0.0]))
        if frame_id in self._static_tf:
            parent, pos, quat = self._static_tf[frame_id]
            base = self._resolve_frame(parent, env_id)
            if base is None:
                return None
            bpos, bquat = base
            wpos = bpos + np.asarray(mmath.rot_vec_quat(
                jnp.asarray(pos), jnp.asarray(bquat)))
            wquat = np.asarray(mmath.quat_mul(jnp.asarray(bquat),
                                              jnp.asarray(quat)))
            return (wpos, wquat)
        if frame_id.endswith("_link") and frame_id[:-5] in self.m.cam_names:
            frames = self.camera_frames(env_id)
            if frame_id in frames:
                return frames[frame_id]
        return None

    def camera_frames(self, env_id: int = 0) -> dict:
        """World pose of every camera's <cam>_link frame for one env (the
        reference broadcasts these as TF; offscreen_camera.cpp:95-120)."""
        from mujoco_ros_pkgs_tpu.render import camera as rcam
        from mujoco_ros_pkgs_tpu.ops import math as mmath_
        with self._lock:
            self._originate("camera_frames", env_id)
            d1 = self._env_slice(env_id)
        out = {}
        for ci, name in enumerate(self.m.cam_names):
            pos, R = rcam.cam_pose(self.m, d1, ci)
            out[f"{name}_link"] = (np.asarray(pos),
                                   np.asarray(mmath_.mat_to_quat(R)))
        return out

    # ------------------------------------------------------------------
    # headless viewer replacements (the GLFW viewer's deliverables without a
    # GUI: screenshot, force perturbation, model save, solver stats —
    # viewer.h:86-324)
    # ------------------------------------------------------------------

    def screenshot(self, cam_name: str = "", path: str = "", env_id: int = 0,
                   width: int = 720, height: int = 480) -> ServiceResult:
        """Render one camera of one env and write a PNG (the viewer's
        lodepng screenshot path, viewer.cpp:2231-2245). Empty cam_name uses
        the first model camera."""
        from mujoco_ros_pkgs_tpu.render import camera as rcam
        from mujoco_ros_pkgs_tpu.utils import png
        if self.m.ncam == 0:
            return ServiceResult(False, "model has no cameras")
        if not cam_name:
            cam_name = self.m.cam_names[0]
        try:
            cid = self.m.cam_names.index(cam_name)
        except ValueError:
            return ServiceResult(False, f"no camera named '{cam_name}'")
        # snapshot under the lock; render OUTSIDE it (a recompile or slow
        # raster must not stall the physics loop), with the jitted render
        # cached per (camera, size) like OffscreenCameraStream._render_jit
        with self._lock:
            self._originate("screenshot", cam_name, "", env_id, width, height)
            d1 = self._env_slice(env_id)
            model = self.m
        key = (cid, width, height, id(model))
        cache = getattr(self, "_screenshot_jit", None)
        if cache is None or cache[0] != key:
            fn = jax.jit(lambda dd: rcam.render(model, dd, cid, width, height))
            self._screenshot_jit = (key, fn)
        rgb, depth, seg = self._screenshot_jit[1](d1)
        if path:
            png.write(path, np.asarray(rgb))
        return ServiceResult(True, path or "rendered (no path given)")

    def start_watch(self, port: int = 0, cam_name: str = "", env_id: int = 0,
                    fps: float = 10.0, width: int = 480,
                    height: int = 320, host: str = "127.0.0.1") -> ServiceResult:
        """Continuous live view of the running sim over HTTP (multipart PNG
        stream) — the headless replacement for watching the reference's GLFW
        viewer window (viewer.cpp RenderLoop, :2262-2383). Returns the bound
        port in the message; browse to http://host:port/. Binds loopback by
        default (the reference viewer window is local-only); pass an explicit
        host to expose it."""
        from mujoco_ros_pkgs_tpu.render import camera as rcam
        from mujoco_ros_pkgs_tpu.server.watch import WatchServer
        if self._watch is not None:
            return ServiceResult(False, f"watch already at :{self._watch.port}")
        if self.m.ncam == 0:
            return ServiceResult(False, "model has no cameras")
        if not cam_name:
            cam_name = self.m.cam_names[0]
        try:
            cid = self.m.cam_names.index(cam_name)
        except ValueError:
            return ServiceResult(False, f"no camera named '{cam_name}'")

        render_cache = {}
        self._watch_meta = (cid, width, height)
        self._pick_cache = {}

        def frame():
            d1 = self._fresh_env_slice(env_id)
            with self._lock:
                model = self.m
            key = id(model)
            fn = render_cache.get(key)
            if fn is None:
                render_cache.clear()
                fn = jax.jit(lambda dd: rcam.render(model, dd, cid,
                                                    width, height))
                render_cache[key] = fn
            rgb, _, _ = fn(d1)
            return np.asarray(rgb, dtype=np.uint8)

        try:
            self._watch = WatchServer(frame, port=port, fps=fps, host=host,
                                      control=self._watch_control())
        except OSError as exc:
            return ServiceResult(False, f"watch bind failed: {exc}")
        return ServiceResult(True, str(self._watch.port))

    def _watch_control(self) -> dict:
        """JSON endpoint table for the watch UI (server/watch.py): each entry
        maps a parsed request body onto an existing service call — the
        headless analogue of the viewer's interactive Sync editing opt, qpos
        and ctrl under the physics mutex (viewer.cpp:1552-1871). The admin
        hash rides in the body and is enforced by the services."""

        def res(r) -> dict:
            return {"success": bool(r.success),
                    "message": getattr(r, "status_message", "")}

        def pause(b):
            return res(self.set_pause(bool(b.get("paused", True)),
                                      admin_hash=b.get("admin_hash", "")))

        def step(b):
            r = self.step(int(b.get("n", 1)))
            return {"success": bool(r.success),
                    "message": "" if r.success
                               else "rejected (running or bad n)"}

        def reset(b):
            return res(self.reset(admin_hash=b.get("admin_hash", "")))

        def speed(b):
            return res(self.set_speed(float(b.get("factor", -1.0)),
                                      admin_hash=b.get("admin_hash", "")))

        def keyframe(b):
            act = b.get("action", "load")
            if act == "load":
                r = self.load_keyframe(b.get("key", 0),
                                       admin_hash=b.get("admin_hash", ""))
            elif act == "save":
                r = self.save_keyframe(int(b.get("key", 0)),
                                       env_id=int(b.get("env_id", 0)),
                                       admin_hash=b.get("admin_hash", ""))
            else:
                return {"success": False, "message": f"bad action '{act}'"}
            return res(r)

        def ctrl(b):
            values = b.get("values")
            if values is None and "index" in b:
                # single-slider form: patch one entry of the live vector
                env_id = b.get("env_id")
                with self._lock:
                    base = np.array(self._env_slice(
                        int(env_id) if env_id is not None else 0).ctrl,
                        dtype=np.float64)
                base[int(b["index"])] = float(b.get("value", 0.0))
                values = base.tolist()
            return res(self.set_ctrl(values if values is not None else [],
                                     env_id=b.get("env_id"),
                                     admin_hash=b.get("admin_hash", "")))

        def qpos(b):
            values = b.get("values")
            if values is None and "index" in b:
                env_id = b.get("env_id")
                with self._lock:
                    base = np.array(self._env_slice(
                        int(env_id) if env_id is not None else 0).qpos,
                        dtype=np.float64)
                base[int(b["index"])] = float(b.get("value", 0.0))
                values = base.tolist()
            return res(self.set_qpos(values if values is not None else [],
                                     env_id=b.get("env_id"),
                                     zero_qvel=bool(b.get("zero_qvel", False)),
                                     admin_hash=b.get("admin_hash", "")))

        def physics(b):
            return res(self.set_physics_properties(
                dict(b.get("props", {})),
                admin_hash=b.get("admin_hash", "")))

        def wrench(b):
            return res(self.apply_body_wrench(
                b.get("body", ""),
                force=b.get("force", (0.0, 0.0, 0.0)),
                torque=b.get("torque", (0.0, 0.0, 0.0)),
                env_id=b.get("env_id"),
                admin_hash=b.get("admin_hash", "")))

        def stats(b):
            s = self.get_solver_stats()
            s.update(paused=self.paused,
                     realtime_factor=self.realtime_factor,
                     physics=self.get_physics_properties())
            return s

        def _pick_fn(model, cid, W, H):
            """jit'd (select + perturb-target) kernel, cached per model."""
            key = id(model)
            fn = self._pick_cache.get(key)
            if fn is None:
                self._pick_cache.clear()
                from mujoco_ros_pkgs_tpu.render import camera as rcam

                def run(dd, x, y, dist, bid):
                    t, g, point = rcam.pick(model, dd, cid, x, y, W, H)
                    origin, direction = rcam.pixel_ray(model, dd, cid, x, y,
                                                       W, H)
                    target = origin + dist * direction
                    xpos_b = dd.xpos[bid]
                    root = jnp.asarray(model.body_rootid)[bid]
                    cv = dd.cvel[bid]
                    v_b = cv[3:] + jnp.cross(cv[:3],
                                             xpos_b - dd.subtree_com[root])
                    return t, g, point, target, xpos_b, v_b
                fn = jax.jit(run)
                self._pick_cache[key] = fn
            return fn

        def select(b):
            """Screen-ray body pick (the viewer's mjv_select analogue)."""
            if self._watch_meta is None:
                return {"success": False, "message": "no watch running"}
            cid, W, H = self._watch_meta
            d1 = self._fresh_env_slice(int(b.get("env_id", 0)))
            with self._lock:
                model = self.m
            fn = _pick_fn(model, cid, W, H)
            t, g, point, _, _, _ = fn(d1, float(b.get("x", 0)),
                                      float(b.get("y", 0)), 1.0, 0)
            g = int(np.asarray(g))
            out = {"success": True, "geom": g, "body": -1, "body_name": "",
                   "geom_name": "", "dist": float(np.asarray(t)) if g >= 0
                   else -1.0,
                   "point": np.asarray(point).tolist()}
            if g >= 0:
                body = int(model.geom_bodyid[g])
                out.update(body=body, body_name=model.body_names[body],
                           geom_name=model.geom_names[g])
            return out

        def perturb(b):
            """Drag perturbation: mass-scaled spring toward the mouse ray at
            the grab depth, re-applied on every drag event — the headless
            twin of the viewer's ApplyForcePerturbations
            (mujoco_ros/src/viewer.cpp:1451-1480)."""
            if self._watch_meta is None:
                return {"success": False, "message": "no watch running"}
            cid, W, H = self._watch_meta
            name = b.get("body", "")
            try:
                bid = self.m.body(name)
            except ValueError:
                return {"success": False, "message": f"no body '{name}'"}
            env_id = b.get("env_id")
            kp = float(b.get("kp", 100.0))
            kv = 2.0 * float(np.sqrt(kp))
            d1 = self._fresh_env_slice(
                int(env_id) if env_id is not None else 0)
            with self._lock:
                model = self.m
            fn = _pick_fn(model, cid, W, H)
            _, _, _, target, xpos_b, v_b = fn(
                d1, float(b.get("x", 0)), float(b.get("y", 0)),
                float(b.get("dist", 1.0)), bid)
            mass = float(np.asarray(model.body_mass[bid]))
            f = mass * (kp * (np.asarray(target) - np.asarray(xpos_b))
                        - kv * np.asarray(v_b))
            r = self.apply_body_wrench(name, force=f.tolist(),
                                       env_id=env_id,
                                       admin_hash=b.get("admin_hash", ""))
            return {"success": bool(r.success),
                    "message": getattr(r, "status_message", ""),
                    "force": f.tolist()}

        def clear_perturb(b):
            return res(self.apply_body_wrench(
                b.get("body", ""), force=(0.0, 0.0, 0.0),
                torque=(0.0, 0.0, 0.0), env_id=b.get("env_id"),
                admin_hash=b.get("admin_hash", "")))

        def minfo(b):
            """Model layout for the widget panel: actuators + 1-dof joints
            with ranges, plus the live ctrl/qpos of one env (the data behind
            the viewer's joint/control slider sections, viewer.h:284-319)."""
            m = self.m
            with self._lock:
                d1 = self._env_slice(int(b.get("env_id", 0)))
                ctrl = np.asarray(d1.ctrl, dtype=np.float64).tolist()
                qpos = np.asarray(d1.qpos, dtype=np.float64).tolist()
            acts = [{"name": n,
                     "ctrlrange": np.asarray(m.actuator_ctrlrange[i],
                                             dtype=np.float64).tolist(),
                     "limited": bool(m.actuator_ctrllimited[i])}
                    for i, n in enumerate(m.actuator_names)]
            joints = [{"name": n, "type": int(m.jnt_type[i]),
                       "qposadr": int(m.jnt_qposadr[i]),
                       "range": np.asarray(m.jnt_range[i],
                                           dtype=np.float64).tolist(),
                       "limited": bool(m.jnt_limited[i])}
                      for i, n in enumerate(m.jnt_names)]
            return {"success": True, "nu": m.nu, "nq": m.nq,
                    "actuators": acts, "joints": joints,
                    "bodies": list(m.body_names), "ctrl": ctrl, "qpos": qpos}

        def reload_ep(b):
            # model upload / reload from the page (drag-drop model load,
            # viewer.cpp:1520-1525)
            return res(self.reload(b.get("model", ""),
                                   admin_hash=b.get("admin_hash", "")))

        return dict(pause=pause, step=step, reset=reset, speed=speed,
                    keyframe=keyframe, ctrl=ctrl, qpos=qpos, physics=physics,
                    wrench=wrench, stats=stats, select=select,
                    perturb=perturb, clear_perturb=clear_perturb,
                    minfo=minfo, reload=reload_ep)

    def stop_watch(self) -> ServiceResult:
        if self._watch is None:
            return ServiceResult(False, "no watch running")
        self._watch.stop()
        self._watch = None
        self._watch_meta = None
        self._pick_cache.clear()
        return ServiceResult(True, "")

    def apply_body_wrench(self, name: str, force=(0.0, 0.0, 0.0),
                          torque=(0.0, 0.0, 0.0), env_id: Optional[int] = None,
                          admin_hash: str = "") -> ServiceResult:
        """Set a persistent external wrench on a body (world frame, at the
        body CoM) — the headless ApplyForcePerturbations (viewer.h:86-324,
        mouse perturbation writes xfrc_applied the same way). env_id None
        applies to every env; wrench persists until cleared."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        try:
            b = self.m.body(name)
        except ValueError:
            return ServiceResult(False, f"no body named '{name}'")
        wrench = np.concatenate([np.asarray(force, dtype=np.float64),
                                 np.asarray(torque, dtype=np.float64)])
        with self._lock:
            self._originate("apply_body_wrench", name, tuple(force),
                            tuple(torque), env_id, admin_hash)
            xf = self._np(self.d.xfrc_applied)
            if env_id is None:
                xf[:, b, :] = wrench
            else:
                xf[env_id, b, :] = wrench
            self.d = self.d.replace(
                xfrc_applied=self._put(xf, self.d.xfrc_applied))
        return ServiceResult(True, "")

    def clear_body_wrenches(self, admin_hash: str = "") -> ServiceResult:
        err = self._check_hash(admin_hash)
        if err:
            return err
        with self._lock:
            self._originate("clear_body_wrenches", admin_hash)
            self.d = self.d.replace(
                xfrc_applied=self._bcast_env(
                    np.zeros(self.d.xfrc_applied.shape[1:]),
                    dtype=self.d.qpos.dtype))
        return ServiceResult(True, "")

    def save_xml(self, path: str, admin_hash: str = "") -> ServiceResult:
        """Save the LIVE model as MJCF (viewer save_xml via mj_saveLastXML,
        viewer.cpp:1671-1690): the compiled Model — including runtime edits
        made through set_geom_properties / set_physics_properties / gravity —
        is serialized by core/mjcf_writer.py, so save -> reload reproduces
        the edited model's trajectories (tests/test_mjcf_writer.py). Falls
        back to the load-time source if the live model has no writer support
        (says so in the result message)."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        from mujoco_ros_pkgs_tpu.core import mjcf_writer
        try:
            with self._lock:
                xml = mjcf_writer.model_to_xml(self.m)
        except Exception as exc:
            self._log.warning("live-model writer failed (%s); saving the "
                              "load-time source instead", exc)
            src = self._model_source
            if "<" not in src:
                try:
                    with open(src) as f:
                        src = f.read()
                except OSError as exc2:
                    return ServiceResult(False, str(exc2))
            try:
                with open(path, "w") as f:
                    f.write(src)
            except OSError as exc2:
                return ServiceResult(False, str(exc2))
            return ServiceResult(
                True, f"{path} (load-time source; live writer failed: {exc})")
        try:
            with open(path, "w") as f:
                f.write(xml)
        except OSError as exc:
            return ServiceResult(False, str(exc))
        return ServiceResult(True, path)

    def save_mjb(self, path: str, admin_hash: str = "") -> ServiceResult:
        """Save the model as MuJoCo binary .mjb (viewer save_mjb) via the
        libmujoco compiler (the reference calls mj_saveModel)."""
        err = self._check_hash(admin_hash)
        if err:
            return err
        try:
            import mujoco
        except ImportError:
            return ServiceResult(False, "mujoco (pip) unavailable for mjb io")
        src = self._model_source
        try:
            mm = (mujoco.MjModel.from_xml_string(src) if "<" in src
                  else mujoco.MjModel.from_xml_path(src))
            mujoco.mj_saveModel(mm, path, None)
        except Exception as exc:
            return ServiceResult(False, f"mjb save failed: {exc}")
        return ServiceResult(True, path)

    def get_solver_stats(self, env_id: int = 0) -> dict:
        """Solver/contact diagnostics — the data behind the viewer's profiler
        figures (figconstraint/figcost/figtimer, viewer.h:267-271), exported
        as a dict instead of an mjvFigure."""
        with self._lock:
            self._originate("get_solver_stats", env_id)
            c = self.d.contact
            dist = self._np(c.dist)[env_id]
            incm = self._np(c.includemargin)[env_id]
            active = dist < incm
            fc = self._np(self.d.efc_force_contact)[env_id]
            qfc = self._np(self.d.qfrc_constraint)[env_id]
            # snapshot the model + the env slice under the lock; the
            # diagnostic compute below is pure over these immutable arrays
            m = self.m
            d1 = self._env_slice(env_id)
            stats = {
                "ncon_capacity": int(dist.shape[0]),
                "ncon_active": int(active.sum()),
                "max_penetration": float(max(0.0, -(dist.min()))
                                         if dist.size else 0.0),
                "efc_force_max": float(np.abs(fc).max()) if fc.size else 0.0,
                "qfrc_constraint_norm": float(np.linalg.norm(qfc)),
                "measured_slowdown": float(self.measured_slowdown),
                "sim_time": self.sim_time,
                "solver_iterations_limit": int(m.opt.iterations),
                "nefc": int(fc.shape[0]),
            }
        # realized solver work: a diagnostic single-env re-solve that counts
        # actual Newton iterations (the reference profiler plots
        # mjData.solver_iter, not the limit). Run OUTSIDE the physics lock:
        # its first call per model compiles a separate executable, which must
        # not stall the physics loop (ADVICE r3 #2).
        from mujoco_ros_pkgs_tpu.ops import solver as solver_mod
        sstats = solver_mod.solve_stats(m, d1)
        stats.update({
            "solver_iterations_realized": int(sstats["iterations"]),
            "solver_grad_norm": float(sstats.get("grad_norm", 0.0)),
            "solver_cost": float(sstats.get("cost", 0.0)),
            # pairs the broadphase top-k compaction dropped while their
            # bounding volumes overlapped (0 = contact set exact;
            # raise pair_topk if this is ever positive)
            "broadphase_overflow": self._broadphase_overflow(m, d1),
        })
        return stats

    def _broadphase_overflow(self, m, d1) -> int:
        if not m.pair_topk:
            return 0
        from mujoco_ros_pkgs_tpu.ops import broadphase as bp
        return int(bp.candidate_overflow(m, d1))
