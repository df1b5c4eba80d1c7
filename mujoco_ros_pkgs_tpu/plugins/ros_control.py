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
(mujoco_ros_control/src/mujoco_ros_control_plugin.cpp:153-194).

Commands are set host-side (server control plane) and consumed in-graph; PID
integrator/previous-error live in the plugin state pytree.
"""

from __future__ import annotations

import enum
from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import Data, JointType, Model
from mujoco_ros_pkgs_tpu.plugins.base import MujocoPlugin


class ControlMethod(enum.IntEnum):
    EFFORT = 0
    POSITION = 1
    POSITION_PID = 2
    VELOCITY = 3
    VELOCITY_PID = 4


class RosControlPlugin(MujocoPlugin):
    """config = {
        "joints": {name: {"method": "POSITION_PID",
                          "pid": [p, i, d, i_clamp],
                          "effort_limit": float,
                          "position_limits": [lo, hi],
                          "velocity_limit": float}},
        "control_period": float (default: model timestep),
    }"""

    def load(self, m: Model, d: Data) -> bool:
        self._m = m
        cfg = self.config.get("joints", {})
        if not cfg:
            self.load_error = "no joints configured"
            return False
        self.joint_ids = []
        self.dof_adr = []
        self.qpos_adr = []
        self.methods = []
        pid, eff_lim, pos_lim, vel_lim = [], [], [], []
        for name, jc in cfg.items():
            j = m.joint(name)
            if m.jnt_type[j] not in (int(JointType.HINGE), int(JointType.SLIDE)):
                self.load_error = f"joint '{name}' is not 1-dof"
                return False
            self.joint_ids.append(j)
            self.dof_adr.append(m.jnt_dofadr[j])
            self.qpos_adr.append(m.jnt_qposadr[j])
            self.methods.append(int(ControlMethod[jc.get("method", "EFFORT")]))
            pid.append(jc.get("pid", [0.0, 0.0, 0.0, 0.0]))
            eff_lim.append(jc.get("effort_limit", np.inf))
            pos_lim.append(jc.get("position_limits",
                                  [-np.inf, np.inf]))
            vel_lim.append(jc.get("velocity_limit", np.inf))
        self.pid = np.array(pid)                       # (nj, 4)
        self.eff_lim = np.array(eff_lim)
        self.pos_lim = np.array(pos_lim)
        self.vel_lim = np.array(vel_lim)
        self.control_period = float(self.config.get(
            "control_period", float(np.asarray(m.opt.timestep))))
        return True

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
        dtype = d.qpos.dtype
        nj = len(self.joint_ids)
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

        for k in range(nj):
            mth = methods[k]
            dof, qadr = int(dofs[k]), int(qadrs[k])
            if mth == int(ControlMethod.EFFORT):
                e = jnp.clip(cmd[k], -eff_lim[k], eff_lim[k])
                e = jnp.where(estop, 0.0, e)
                qfrc = qfrc.at[dof].set(e)
            elif mth == int(ControlMethod.POSITION):
                tgt = jnp.clip(cmd[k], pos_lo[k], pos_hi[k])
                tgt = jnp.where(estop, q[k], tgt)   # freeze on e-stop
                qpos = qpos.at[qadr].set(tgt)
                qvel = qvel.at[dof].set(0.0)
            elif mth == int(ControlMethod.POSITION_PID):
                e = jnp.where(estop, 0.0, pid_out[k])
                qfrc = qfrc.at[dof].set(e)
            elif mth == int(ControlMethod.VELOCITY):
                tgt = jnp.clip(cmd[k], -vel_lim[k], vel_lim[k])
                tgt = jnp.where(estop, 0.0, tgt)
                qvel = qvel.at[dof].set(tgt)
            elif mth == int(ControlMethod.VELOCITY_PID):
                e = jnp.where(estop, 0.0, pid_out[k])
                qfrc = qfrc.at[dof].set(e)

        nps = dict(ps, integral=integral, prev_err=prev_err,
                   last_update=last_update)
        return d.replace(qfrc_applied=qfrc, qpos=qpos, qvel=qvel), nps
