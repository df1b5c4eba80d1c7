"""Joint-command hardware interface — mujoco_ros_control's DefaultRobotHWSim
reborn as an in-graph control hook.

Reference (mujoco_ros_control/src/default_robot_hw_sim.cpp): per-joint control
methods EFFORT / POSITION / POSITION_PID / VELOCITY / VELOCITY_PID with PID
gains from config (:195-214), joint-limit enforcement (:340-446), readSim
(qpos/qvel/qfrc_applied → joint vectors, :230-246) and writeSim (:248-326):
  EFFORT        → d->qfrc_applied
  POSITION      → direct qpos write, zeroing qvel
  POSITION_PID  → PID on angle error → clamped effort
  VELOCITY      → direct qvel write
  VELOCITY_PID  → PID on velocity error
E-stop freezes position commands / zeroes efforts (:251-260,272,307). The
hosting plugin enforces a control-period decimation inside mjcb_control
(mujoco_ros_control/src/mujoco_ros_control_plugin.cpp:153-194), blocks on a
URDF robot_description, and parses its transmissions (:198-232); URDF
hard+soft joint limits are enforced via joint_limits_interface
saturation/soft-limit handles (default_robot_hw_sim.cpp:340-446). Both are
implemented here: config may carry a `robot_description` URDF whose
transmissions define the joint table, and `<safety_controller>` soft limits
are enforced with the joint_limits_interface equations (velocity bounds
-k_position*(q - soft_bound), effort bounds -k_velocity*(v - vel_bound)).

Commands are set host-side (server control plane) and consumed in-graph; PID
integrator/previous-error live in the plugin state pytree. All joint writes
are static-group vectorized scatters — graph size does not grow with the
joint count.
"""

from __future__ import annotations

import enum
from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import Data, JointType, Model
from mujoco_ros_pkgs_tpu.plugins.base import MujocoPlugin
from mujoco_ros_pkgs_tpu.plugins import urdf as urdf_mod


class ControlMethod(enum.IntEnum):
    EFFORT = 0
    POSITION = 1
    POSITION_PID = 2
    VELOCITY = 3
    VELOCITY_PID = 4


_EFFORT_CHANNEL = (int(ControlMethod.EFFORT), int(ControlMethod.POSITION_PID),
                   int(ControlMethod.VELOCITY_PID))


class HardwareSim:
    """Second-level hardware-simulation interface — the RobotHWSim seam
    (mujoco_ros_control/include/mujoco_ros_control/robot_hw_sim.h:62).

    `RosControlPlugin` hosts whichever implementation its config names
    (`hardware: {type: "..."}`), defaulting to `DefaultRobotHWSim`. Custom
    hardware models register with `register_hardware_sim` — the analogue of
    the reference's second-level pluginlib loading
    (mujoco_ros_control_plugin.cpp:126-147)."""

    def init_sim(self, plugin: "RosControlPlugin", m: Model) -> bool:
        """Bind to the hosting plugin's joint tables; False quarantines."""
        self.plugin = plugin
        return True

    def init_state(self, m: Model, batch: int):
        return ()

    def read_sim(self, m: Model, d: Data) -> Dict[str, Any]:
        """Joint state vectors (readSim, default_robot_hw_sim.cpp:230-246)."""
        p = self.plugin
        qadrs = np.array(p.qpos_adr)
        dofs = np.array(p.dof_adr)
        return dict(position=d.qpos[qadrs], velocity=d.qvel[dofs],
                    effort=d.qfrc_applied[dofs])

    def write_sim(self, m: Model, d: Data, ps: Any) -> Tuple[Data, Any]:
        """Apply commands to the sim (writeSim); runs inside the compiled
        step's control hook. Must be pure/traceable."""
        raise NotImplementedError


_HW_REGISTRY: Dict[str, type] = {}


def register_hardware_sim(name: str, cls: type) -> None:
    """Register a custom HardwareSim implementation by type name."""
    if not issubclass(cls, HardwareSim):
        raise TypeError(f"{cls} must subclass HardwareSim")
    _HW_REGISTRY[name] = cls


class RosControlPlugin(MujocoPlugin):
    """config = {
        # EITHER a URDF whose <transmission> elements define the joints
        # (reference: mujoco_ros_control_plugin.cpp:198-232) ...
        "robot_description": "<robot ...>...</robot>" | "/path/robot.urdf",
        "pid_gains": {joint: [p, i, d, i_clamp]},   # upgrades POS/VEL -> *_PID
        # ... OR (additionally: overrides URDF entries) a hand-written table:
        "joints": {name: {"method": "POSITION_PID",
                          "pid": [p, i, d, i_clamp],
                          "effort_limit": float,
                          "position_limits": [lo, hi],
                          "velocity_limit": float,
                          "soft_limits": {"lower": .., "upper": ..,
                                           "k_position": .., "k_velocity": ..}}},
        "control_period": float (default: model timestep),
    }"""

    def load(self, m: Model, d: Data) -> bool:
        self._m = m
        cfg: Dict[str, dict] = {}
        desc = self.config.get("robot_description")
        if desc:
            try:
                urdf = urdf_mod.parse_urdf(desc)
                cfg.update(urdf_mod.joints_config_from_urdf(
                    urdf, self.config.get("pid_gains")))
            except ValueError as exc:
                self.load_error = str(exc)
                return False
        cfg.update(self.config.get("joints", {}))
        if not cfg:
            self.load_error = ("no joints configured (neither "
                               "robot_description transmissions nor a "
                               "'joints' table)")
            return False
        self.joint_ids = []
        self.dof_adr = []
        self.qpos_adr = []
        self.methods = []
        pid, eff_lim, pos_lim, vel_lim = [], [], [], []
        soft = []
        for name, jc in cfg.items():
            try:
                j = m.joint(name)
            except ValueError:
                self.load_error = (f"joint '{name}' (from a URDF transmission "
                                   f"or joints table) does not exist in the "
                                   f"MJCF model")
                return False
            if m.jnt_type[j] not in (int(JointType.HINGE), int(JointType.SLIDE)):
                self.load_error = f"joint '{name}' is not 1-dof"
                return False
            self.joint_ids.append(j)
            self.dof_adr.append(m.jnt_dofadr[j])
            self.qpos_adr.append(m.jnt_qposadr[j])
            self.methods.append(int(ControlMethod[jc.get("method", "EFFORT")]))
            pid.append(jc.get("pid", [0.0, 0.0, 0.0, 0.0]))
            eff_lim.append(jc.get("effort_limit", np.inf))
            pos_lim.append(jc.get("position_limits", [-np.inf, np.inf]))
            vel_lim.append(jc.get("velocity_limit", np.inf))
            sl = jc.get("soft_limits")
            if sl:
                soft.append([1.0, sl.get("lower", -np.inf),
                             sl.get("upper", np.inf),
                             sl.get("k_position", 0.0),
                             sl.get("k_velocity", 0.0)])
            else:
                soft.append([0.0, -np.inf, np.inf, 0.0, 0.0])
        self.pid = np.array(pid)                       # (nj, 4)
        self.eff_lim = np.array(eff_lim)
        self.pos_lim = np.array(pos_lim)
        self.vel_lim = np.array(vel_lim)
        self.soft = np.array(soft)                     # (nj, 5)
        self.control_period = float(self.config.get(
            "control_period", float(np.asarray(m.opt.timestep))))
        hw_cfg = self.config.get("hardware", {}) or {}
        hw_type = hw_cfg.get("type", "mujoco_ros_control/DefaultRobotHWSim")
        hw_cls = _HW_REGISTRY.get(hw_type)
        if hw_cls is None:
            self._log_error = (f"unknown hardware sim type '{hw_type}' "
                               f"(registered: {sorted(_HW_REGISTRY)})")
            raise ValueError(self._log_error)
        self.hw = hw_cls()
        if hw_cfg.get("control_period") is not None:
            self.control_period = float(hw_cfg["control_period"])
        return bool(self.hw.init_sim(self, m))

    def init_state(self, m: Model, batch: int) -> Any:
        nj = len(self.joint_ids)
        z = jnp.zeros(nj)
        return dict(command=z, integral=z, prev_err=z,
                    estop=jnp.zeros((), dtype=bool),
                    last_update=jnp.full((), -jnp.inf))

    # -- host-side control plane --
    def set_commands(self, ps: Any, commands: np.ndarray) -> Any:
        return dict(ps, command=jnp.asarray(commands))

    def set_estop(self, ps: Any, active: bool) -> Any:
        return dict(ps, estop=jnp.asarray(bool(active)))

    def reset(self, m: Model, d: Data) -> None:
        pass

    # -- in-graph --
    def control(self, m: Model, d: Data, ps: Any) -> Tuple[Data, Any]:
        """controlCallback: control-period decimation + readSim/update/
        writeSim through the hosted HardwareSim implementation
        (mujoco_ros_control_plugin.cpp:153-194)."""
        return self.hw.write_sim(m, d, ps)


class DefaultRobotHWSim(HardwareSim):
    """The reference's DefaultRobotHWSim: EFFORT / POSITION / POSITION_PID /
    VELOCITY / VELOCITY_PID with PID, hard + URDF soft joint limits, e-stop
    semantics (default_robot_hw_sim.cpp:84-446), fully vectorized."""

    def write_sim(self, m: Model, d: Data, ps: Any) -> Tuple[Data, Any]:
        self_ = self.plugin
        return _default_write_sim(self_, m, d, ps)


register_hardware_sim("mujoco_ros_control/DefaultRobotHWSim",
                      DefaultRobotHWSim)


def _default_write_sim(self, m: Model, d: Data, ps: Any) -> Tuple[Data, Any]:
        dtype = d.qpos.dtype
        dofs = np.array(self.dof_adr)
        qadrs = np.array(self.qpos_adr)
        q = d.qpos[qadrs].astype(dtype)
        v = d.qvel[dofs].astype(dtype)
        cmd = ps["command"].astype(dtype)
        estop = ps["estop"]
        dt = m.opt.timestep.astype(dtype)

        # control-period decimation for the PID update
        do_update = (d.time - ps["last_update"]) >= (self.control_period - 1e-12)
        last_update = jnp.where(do_update, d.time, ps["last_update"])

        pid_p = jnp.asarray(self.pid[:, 0], dtype=dtype)
        pid_i = jnp.asarray(self.pid[:, 1], dtype=dtype)
        pid_d = jnp.asarray(self.pid[:, 2], dtype=dtype)
        i_clamp = jnp.asarray(self.pid[:, 3], dtype=dtype)
        eff_lim = jnp.asarray(self.eff_lim, dtype=dtype)
        pos_lo = jnp.asarray(self.pos_lim[:, 0], dtype=dtype)
        pos_hi = jnp.asarray(self.pos_lim[:, 1], dtype=dtype)
        vel_lim = jnp.asarray(self.vel_lim, dtype=dtype)

        methods = np.array(self.methods)
        qfrc = d.qfrc_applied
        qpos = d.qpos
        qvel = d.qvel

        # PID (shared between POSITION_PID / VELOCITY_PID)
        err_pos = jnp.clip(cmd, pos_lo, pos_hi) - q
        err_vel = jnp.clip(cmd, -vel_lim, vel_lim) - v
        err = jnp.where(jnp.asarray(methods == int(ControlMethod.POSITION_PID)),
                        err_pos, err_vel)
        integral = jnp.where(do_update,
                             jnp.clip(ps["integral"] + err * dt,
                                      -i_clamp, i_clamp),
                             ps["integral"])
        deriv = jnp.where(do_update, (err - ps["prev_err"]) / dt, 0.0)
        prev_err = jnp.where(do_update, err, ps["prev_err"])
        pid_out = pid_p * err + pid_i * integral + pid_d * deriv
        pid_out = jnp.clip(pid_out, -eff_lim, eff_lim)

        # joint_limits_interface soft-limit bounds (URDF <safety_controller>,
        # default_robot_hw_sim.cpp:340-446): position error bounds velocity,
        # velocity error bounds effort
        has_soft = self.soft[:, 0] > 0.5               # static np mask
        soft_lo = jnp.asarray(self.soft[:, 1], dtype=dtype)
        soft_hi = jnp.asarray(self.soft[:, 2], dtype=dtype)
        k_p_lim = jnp.asarray(self.soft[:, 3], dtype=dtype)
        k_v_lim = jnp.asarray(self.soft[:, 4], dtype=dtype)
        vel_min = jnp.clip(-k_p_lim * (q - soft_lo), -vel_lim, vel_lim)
        vel_max = jnp.clip(-k_p_lim * (q - soft_hi), -vel_lim, vel_lim)
        eff_min = jnp.clip(-k_v_lim * (v - vel_min), -eff_lim, eff_lim)
        eff_max = jnp.clip(-k_v_lim * (v - vel_max), -eff_lim, eff_lim)

        # ---- effort channel (EFFORT + both PID modes), vectorized ----
        is_direct_eff = methods == int(ControlMethod.EFFORT)
        e_all = jnp.where(jnp.asarray(is_direct_eff),
                          jnp.clip(cmd, -eff_lim, eff_lim), pid_out)
        e_all = jnp.where(jnp.asarray(has_soft),
                          jnp.clip(e_all, eff_min, eff_max), e_all)
        e_all = jnp.where(estop, 0.0, e_all)
        eff_g = np.nonzero(np.isin(methods, _EFFORT_CHANNEL))[0]
        if eff_g.size:
            qfrc = qfrc.at[dofs[eff_g]].set(e_all[eff_g])

        # ---- POSITION: direct write, qvel zeroed; e-stop freezes ----
        pos_g = np.nonzero(methods == int(ControlMethod.POSITION))[0]
        if pos_g.size:
            dtc = jnp.asarray(self.control_period, dtype=dtype)
            tgt = jnp.clip(cmd, pos_lo, pos_hi)
            tgt = jnp.where(jnp.asarray(has_soft),
                            jnp.clip(tgt, q + vel_min * dtc,
                                     q + vel_max * dtc), tgt)
            tgt = jnp.where(estop, q, tgt)
            qpos = qpos.at[qadrs[pos_g]].set(tgt[pos_g])
            qvel = qvel.at[dofs[pos_g]].set(0.0)

        # ---- VELOCITY: direct write; e-stop zeroes ----
        vel_g = np.nonzero(methods == int(ControlMethod.VELOCITY))[0]
        if vel_g.size:
            vt = jnp.clip(cmd, -vel_lim, vel_lim)
            vt = jnp.where(jnp.asarray(has_soft),
                           jnp.clip(vt, vel_min, vel_max), vt)
            vt = jnp.where(estop, 0.0, vt)
            qvel = qvel.at[dofs[vel_g]].set(vt[vel_g])

        nps = dict(ps, integral=integral, prev_err=prev_err,
                   last_update=last_update)
        return d.replace(qfrc_applied=qfrc, qpos=qpos, qvel=qvel), nps
