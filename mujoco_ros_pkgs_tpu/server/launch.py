"""CLI entry point — the launch/config layer (L5) reborn.

Mirrors the reference's roslaunch surface (mujoco_ros/launch/
launch_server.launch:5-28: modelfile, headless/no_x, unpause, num_steps,
eval_mode, realtime, verbose, mujoco_plugin_config yaml, initial joint
states) plus the --admin-hash CLI flag (mujoco_ros/src/main.cpp:80-82).
Rosparam trees become a YAML/JSON config file; the ROS graph becomes the
in-process server (plus this blocking loop).

Usage:
    python -m mujoco_ros_pkgs_tpu.server.launch --modelfile world.xml \
        --nenv 4096 --realtime -1 --num-steps -1
"""

from __future__ import annotations

import argparse
import json
import signal
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="mujoco_ros_pkgs_tpu.server",
        description="TPU-native batched MuJoCo-class simulation server")
    ap.add_argument("--modelfile", required=True,
                    help="MJCF path (or XML string via --model-string)")
    ap.add_argument("--model-string", action="store_true",
                    help="treat --modelfile as literal XML")
    ap.add_argument("--wait-for-model", type=float, default=0.0, metavar="S",
                    help="poll up to S seconds for --modelfile to appear "
                         "before loading (the reference's wait_for_xml "
                         "busy-wait on the param server, main.cpp:103-129); "
                         "0 = require the file up front")
    ap.add_argument("--nenv", type=int, default=1,
                    help="lockstep env instances (batch size)")
    ap.add_argument("--unpause", action="store_true", default=True)
    ap.add_argument("--no-unpause", dest="unpause", action="store_false")
    ap.add_argument("--num-steps", type=int, default=-1,
                    help="terminate after N steps (-1 = run forever)")
    ap.add_argument("--eval-mode", action="store_true")
    ap.add_argument("--admin-hash", default="")
    ap.add_argument("--realtime", type=float, default=-1.0,
                    help="real-time fraction (-1 = unbound)")
    ap.add_argument("--ctrl-noise-std", type=float, default=0.0)
    ap.add_argument("--ctrl-noise-rate", type=float, default=0.0)
    ap.add_argument("--config", default="",
                    help="YAML/JSON config: initial joint states, plugins, "
                         "cam_config/<name>/{stream_type,frequency,width,"
                         "height,use_segid,env_ids,png_dir}")
    ap.add_argument("--png-dir", default="",
                    help="dump every camera stream's frames as PNGs here "
                         "(the viewer screenshot path, viewer.cpp:2231-2245)")
    ap.add_argument("--f32", action="store_true",
                    help="compute in float32 (TPU throughput mode)")
    ap.add_argument("--pair-topk", type=int, default=0,
                    help="broadphase top-k compaction: oversized narrowphase "
                         "groups only run their K most-overlapping pairs "
                         "(0 = exact static pair table; see "
                         "ops/broadphase.py and the broadphase_overflow "
                         "solver stat)")
    ap.add_argument("--con-topk", type=int, default=0,
                    help="active-contact solver compaction: the constraint "
                         "solver iterates on the K most-penetrating contact "
                         "slots per condim group (0 = all slots; exact "
                         "while the active count stays <= K; see "
                         "Model.con_topk)")
    ap.add_argument("--distributed", action="store_true",
                    help="shard the env batch over a ('host','env') mesh "
                         "(parallel/multihost.py); services are originated "
                         "on process 0 and replayed on every follower")
    ap.add_argument("--coordinator", default="",
                    help="jax.distributed coordinator address host:port "
                         "(also via MRT_COORDINATOR)")
    ap.add_argument("--num-processes", type=int, default=0,
                    help="total processes in the distributed run")
    ap.add_argument("--process-id", type=int, default=-1,
                    help="this process's rank (0 originates commands)")
    ap.add_argument("--mesh-hosts", type=int, default=0,
                    help="fold a single process's devices into N virtual "
                         "host rows (testing without a pod)")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--log-level", default="",
                    help="per-subsystem log levels, e.g. "
                         "'server=debug,render=error' or a bare default "
                         "level like 'info' (the rosconsole.config analogue)")
    ap.add_argument("--watch-port", type=int, default=-1,
                    help="serve a live HTTP view of env 0 on this port "
                         "(0 = ephemeral; the headless viewer-window "
                         "replacement). Requires a model camera.")
    ap.add_argument("--watch-host", default="127.0.0.1",
                    help="bind address for the live view (default loopback — "
                         "the reference viewer window is local-only; set "
                         "0.0.0.0 to expose it deliberately)")
    ap.add_argument("--profile-dir", default="",
                    help="write a jax.profiler trace of the run here "
                         "(the reference's profile:=true CPUPROFILE hook, "
                         "launch_server.launch:93-95; view with TensorBoard "
                         "or xprof)")
    return ap


def load_config(path: str) -> dict:
    if not path:
        return {}
    with open(path) as f:
        text = f.read()
    try:
        return json.loads(text)
    except json.JSONDecodeError:
        try:
            import yaml
            return yaml.safe_load(text)
        except ImportError:
            raise RuntimeError("config is not JSON and pyyaml is unavailable")


def make_plugins(cfg: dict):
    """Instantiate plugins from config (the rosparam `MujocoPlugins` array,
    mujoco_ros/src/plugin_utils.cpp:41-64, with `type` keys)."""
    out = []
    for entry in cfg.get("MujocoPlugins", []):
        ptype = entry.get("type", "")
        if ptype in ("mujoco_ros_sensors/MujocoRosSensorsPlugin", "sensors"):
            from mujoco_ros_pkgs_tpu.plugins.sensors import SensorsPlugin
            out.append(SensorsPlugin(entry))
        elif ptype in ("mujoco_ros_mocap/MocapPlugin", "mocap"):
            from mujoco_ros_pkgs_tpu.plugins.mocap import MocapPlugin
            out.append(MocapPlugin(entry))
        elif ptype in ("mujoco_ros_control/MujocoRosControlPlugin",
                       "ros_control"):
            from mujoco_ros_pkgs_tpu.plugins.ros_control import RosControlPlugin
            out.append(RosControlPlugin(entry))
        else:
            raise ValueError(f"unknown plugin type '{ptype}'")
    return out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from mujoco_ros_pkgs_tpu.utils import backend
    from mujoco_ros_pkgs_tpu.utils import log as log_mod
    if args.log_level:
        if "=" in args.log_level:
            log_mod.configure(log_mod.parse_level_spec(args.log_level))
        else:
            log_mod.configure(default_level=args.log_level)
    elif args.verbose:
        log_mod.configure(default_level="INFO")
    else:
        log_mod.configure()
    backend.enable_compile_cache()
    backend.ensure_cpu_backend()
    import jax.numpy as jnp
    from mujoco_ros_pkgs_tpu.server import MujocoServer

    if args.distributed and args.coordinator:
        from mujoco_ros_pkgs_tpu.parallel import multihost
        multihost.initialize(
            coordinator_address=args.coordinator or None,
            num_processes=args.num_processes or None,
            process_id=args.process_id if args.process_id >= 0 else None)

    cfg = load_config(args.config)
    model = args.modelfile
    if args.wait_for_model > 0 and not args.model_string:
        import os as _os
        import time as _time
        deadline = _time.monotonic() + args.wait_for_model
        while not _os.path.exists(model):
            if _time.monotonic() >= deadline:
                print(f"model file '{model}' did not appear within "
                      f"{args.wait_for_model:.0f}s", file=sys.stderr)
                return 2
            _time.sleep(0.1)
    cam_config = dict(cfg.get("cam_config", {}))
    if args.png_dir:   # "*" = defaults applied to every camera
        cam_config.setdefault("*", {})["png_dir"] = args.png_dir
    srv = MujocoServer(
        model, nenv=args.nenv, eval_mode=args.eval_mode,
        admin_hash=args.admin_hash, unpause=args.unpause,
        num_steps=args.num_steps, realtime=args.realtime,
        initial_joint_states=cfg.get("initial_joint_positions", {}),
        initial_joint_velocities=cfg.get("initial_joint_velocities", {}),
        plugins=make_plugins(cfg),
        ctrl_noise_std=args.ctrl_noise_std,
        ctrl_noise_rate=args.ctrl_noise_rate,
        cam_config=cam_config,
        pair_topk=args.pair_topk,
        con_topk=args.con_topk,
        distributed=args.distributed,
        mesh_hosts=args.mesh_hosts or None,
        dtype=jnp.float32 if args.f32 else None)

    # follower processes execute the op stream from process 0 and exit
    if args.distributed:
        import jax
        if jax.process_count() > 1 and jax.process_index() != 0:
            srv.serve_follower()
            return 0

    stop = {"flag": False}

    def sigint(_sig, _frm):   # main.cpp:52-56 sets exit_request
        stop["flag"] = True
        srv.shutdown()
    signal.signal(signal.SIGINT, sigint)

    if args.profile_dir:
        import jax
        jax.profiler.start_trace(args.profile_dir)

    if args.watch_port >= 0:
        res = srv.start_watch(port=args.watch_port, host=args.watch_host)
        msg = res.status_message
        print("live view: "
              + (f"http://{args.watch_host}:{msg}" if res.success else msg),
              file=sys.stderr)

    srv.start_physics_loop()
    period = 1.0 if args.verbose else 0.2
    while (not stop["flag"] and srv.num_steps_until_exit != 0
           and srv.physics_error is None):
        time.sleep(period)
        if args.verbose:
            print(f"sim_time={srv.sim_time:.3f}s "
                  f"slowdown={srv.measured_slowdown:.2f}x "
                  f"paused={srv.paused}", file=sys.stderr)
    srv.stop_physics_loop()
    if srv.physics_error is not None:
        print(f"FATAL: physics loop died: {srv.physics_error!r}",
              file=sys.stderr)
        return 1
    if args.profile_dir:
        import jax
        jax.profiler.stop_trace()
    return 0


if __name__ == "__main__":
    sys.exit(main())
