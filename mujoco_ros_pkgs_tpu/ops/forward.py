"""Forward dynamics pipeline + integrators: the mj_forward / mj_step analogue.

`step(m, d)` is THE hot function: jit it, vmap it over envs, shard the env axis
over a mesh. Plugin-style hooks (reference: mjcb_control / mjcb_passive set at
mujoco_ros/src/mujoco_env.cpp:150-153, fan-out in src/callbacks.cpp:131-143)
are pure functions `hook(m, d) -> d` fused into the same compiled step.
"""

from __future__ import annotations

from typing import Callable, Optional

import functools

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import (
    Contact, Data, DisableBit, IntegratorType, JointType, Model,
)
from mujoco_ros_pkgs_tpu.ops import math as mmath
from mujoco_ros_pkgs_tpu.ops import smooth

# stateful hook: (m, d, hook_state) -> (d, hook_state); state may be ()
Hook = Optional[Callable]


def make_data(m: Model, dtype=None) -> Data:
    """Fresh Data at qpos0 (mj_makeData + mj_resetData analogue)."""
    dtype = dtype or m.qpos0.dtype

    def z(*shape):
        return jnp.zeros(shape, dtype=dtype)

    from mujoco_ros_pkgs_tpu.ops import narrowphase
    from mujoco_ros_pkgs_tpu.ops import efc as efcmod
    contact = narrowphase.empty_contact(m, dtype)
    nefc = max(efcmod.row_layout(m)["nrow"], 1)

    mocap_pos = z(m.nmocap, 3)
    mocap_quat = jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=dtype), (m.nmocap, 1))
    for b in range(m.nbody):
        mid = m.body_mocapid[b]
        if mid >= 0:
            mocap_pos = mocap_pos.at[mid].set(m.body_pos[b].astype(dtype))
            mocap_quat = mocap_quat.at[mid].set(m.body_quat[b].astype(dtype))

    return Data(
        time=jnp.zeros((), dtype=dtype),
        qpos=m.qpos0.astype(dtype), qvel=z(m.nv), act=z(m.na), ctrl=z(m.nu),
        qfrc_applied=z(m.nv), xfrc_applied=z(m.nbody, 6),
        eq_active=jnp.asarray(np.array(m.eq_active0, dtype=bool)),
        mocap_pos=mocap_pos, mocap_quat=mocap_quat,
        xpos=z(m.nbody, 3),
        xquat=jnp.tile(jnp.array([1.0, 0, 0, 0], dtype=dtype), (m.nbody, 1)),
        xmat=jnp.tile(jnp.eye(3, dtype=dtype), (m.nbody, 1, 1)),
        xipos=z(m.nbody, 3), ximat=jnp.tile(jnp.eye(3, dtype=dtype), (m.nbody, 1, 1)),
        xanchor=z(m.njnt, 3), xaxis=z(m.njnt, 3),
        geom_xpos=z(m.ngeom, 3), geom_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (m.ngeom, 1, 1)),
        site_xpos=z(m.nsite, 3), site_xmat=jnp.tile(jnp.eye(3, dtype=dtype), (m.nsite, 1, 1)),
        subtree_com=z(m.nbody, 3), cinert=z(m.nbody, 10), cdof=z(m.nv, 6),
        cvel=z(m.nbody, 6), cdof_dot=z(m.nv, 6),
        qM=z(m.nv, m.nv),
        qfrc_bias=z(m.nv), qfrc_passive=z(m.nv), qfrc_actuator=z(m.nv),
        qfrc_smooth=z(m.nv), qacc_smooth=z(m.nv), qfrc_constraint=z(m.nv),
        qacc=z(m.nv), qacc_warmstart=z(m.nv),
        actuator_length=z(m.nu), actuator_velocity=z(m.nu),
        actuator_force=z(m.nu), actuator_moment=z(m.nu, m.nv), act_dot=z(m.na),
        ten_length=z(m.ntendon), ten_velocity=z(m.ntendon),
        ten_J=z(m.ntendon, m.nv),
        contact=contact, efc_force_contact=z(nefc),
        sensordata=z(m.nsensordata),
        rng=jax.random.PRNGKey(0),
    )


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def forward(m: Model, d: Data, control_hook: Hook = None,
            passive_hook: Hook = None, hstate=None):
    """mj_forward analogue: full dynamics computation, no integration.

    Returns (d, hstate) when hooks are stateful (hstate is not None), else d.
    """
    from mujoco_ros_pkgs_tpu.ops import collision, constraint, sensor

    stateful = hstate is not None
    d = smooth.fwd_position_smooth(m, d)
    d = collision.collide(m, d)
    d = sensor.sensor_pos(m, d)
    d = smooth.com_vel(m, d)
    d = smooth.passive(m, d)
    if passive_hook is not None:
        if stateful:
            d, hstate = passive_hook(m, d, hstate)
        else:
            d = passive_hook(m, d)
    d = smooth.rne(m, d)
    d = sensor.sensor_vel(m, d)
    if control_hook is not None:
        if stateful:
            d, hstate = control_hook(m, d, hstate)
        else:
            d = control_hook(m, d)
    d = smooth.actuation(m, d)
    d = smooth.fwd_acceleration_smooth(m, d)
    d = constraint.fwd_constraint(m, d)
    d = sensor.sensor_acc(m, d)
    return (d, hstate) if stateful else d


# ---------------------------------------------------------------------------
# position integration (mj_integratePos)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=128)
def _intpos_meta(jnt_type, jnt_qposadr, jnt_dofadr):
    """Static joint groups for vectorized position integration: 1-dof
    (hinge/slide) scatters collapse into ONE batched update; quaternion
    joints (ball + free-rot) into one vmapped quat_integrate; free-joint
    translations into one more (mj_integratePos semantics)."""
    lin_q, lin_v = [], []     # 1-dof joints + free translations (3 each)
    quat_q, quat_v = [], []   # quaternion blocks (qadr of 4, vadr of 3)
    for jt, qadr, vadr in zip(jnt_type, jnt_qposadr, jnt_dofadr):
        if jt == int(JointType.FREE):
            lin_q += [qadr, qadr + 1, qadr + 2]
            lin_v += [vadr, vadr + 1, vadr + 2]
            quat_q.append(qadr + 3)
            quat_v.append(vadr + 3)
        elif jt == int(JointType.BALL):
            quat_q.append(qadr)
            quat_v.append(vadr)
        else:
            lin_q.append(qadr)
            lin_v.append(vadr)
    qq = np.array(quat_q, dtype=np.int32)
    return (np.array(lin_q, dtype=np.int32), np.array(lin_v, dtype=np.int32),
            qq[:, None] + np.arange(4)[None, :],
            np.array(quat_v, dtype=np.int32)[:, None] + np.arange(3)[None, :])


def integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                  dt) -> jax.Array:
    lin_q, lin_v, quat_q, quat_v = _intpos_meta(
        m.jnt_type, m.jnt_qposadr, m.jnt_dofadr)
    out = qpos
    if lin_q.size:
        out = out.at[lin_q].set(qpos[lin_q] + dt * qvel[lin_v])
    if quat_q.size:
        q = jax.vmap(lambda a, b: mmath.quat_integrate(a, b, dt))(
            qpos[quat_q], qvel[quat_v])
        out = out.at[quat_q].set(q)
    return out


# ---------------------------------------------------------------------------
# integrators
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=128)
def _act_slot_meta(actuator_dyntype, actuator_actadr, actuator_actlimited,
                   na):
    """Per-activation-slot integration metadata: source actuator index,
    FILTEREXACT mask, actrange clamp mask (mj_advance semantics)."""
    from mujoco_ros_pkgs_tpu.core.types import DynType
    is_fe = np.zeros(na, dtype=bool)
    src = np.zeros(na, dtype=np.int32)
    lim = np.zeros(na, dtype=bool)
    for i, (dt, adr) in enumerate(zip(actuator_dyntype, actuator_actadr)):
        if adr >= 0:
            src[adr] = i
            is_fe[adr] = dt == int(DynType.FILTEREXACT)
            lim[adr] = bool(actuator_actlimited[i]) if actuator_actlimited \
                else False
    return is_fe, src, lim


def _advance(m: Model, d: Data, qacc: jax.Array, act_dot: jax.Array,
             qvel_for_pos: jax.Array = None) -> Data:
    h = m.opt.timestep.astype(d.qpos.dtype)
    qvel = d.qvel + h * qacc
    if m.na:
        act = d.act + h * act_dot
        is_fe, src, lim = _act_slot_meta(
            m.actuator_dyntype, m.actuator_actadr, m.actuator_actlimited,
            m.na)
        if is_fe.any():
            # FILTEREXACT: exact first-order-filter update
            # act += act_dot * tau * (1 - exp(-h/tau))  (mj_advance)
            tau = jnp.maximum(m.actuator_dynprm[src, 0],
                              mmath.MINVAL).astype(act.dtype)
            act = jnp.where(jnp.asarray(is_fe),
                            d.act + act_dot * tau * (1.0 - jnp.exp(-h / tau)),
                            act)
        if lim.any():
            lo = m.actuator_actrange[src, 0].astype(act.dtype)
            hi = m.actuator_actrange[src, 1].astype(act.dtype)
            act = jnp.where(jnp.asarray(lim), jnp.clip(act, lo, hi), act)
    else:
        act = d.act
    qpos = integrate_pos(m, d.qpos, qvel_for_pos if qvel_for_pos is not None else qvel, h)
    return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def euler(m: Model, d: Data) -> Data:
    """mj_Euler: semi-implicit, with implicit joint damping when present."""
    h = m.opt.timestep.astype(d.qpos.dtype)
    qacc = d.qacc
    if m.has_damping:
        MhB = d.qM + h * jnp.diag(m.dof_damping)
        qfrc = d.qfrc_smooth + d.qfrc_constraint
        from mujoco_ros_pkgs_tpu.ops import linalg_tpu
        qacc = linalg_tpu.psd_solve(MhB, qfrc)
    return _advance(m, d, qacc, d.act_dot)


def _qderiv_smooth(m: Model, d: Data) -> jax.Array:
    """d (qfrc_passive + qfrc_actuator) / d qvel — the mjd_smooth_vel terms
    shared by implicitfast and implicit: joint/tendon damping and affine
    actuator velocity gains (engine_derivative.c mjd_smooth_vel, minus the
    RNE term which only full implicit folds in)."""
    from mujoco_ros_pkgs_tpu.core.types import BiasType, DynType, GainType

    qD = -jnp.diag(m.dof_damping)                      # d qfrc_passive / d qvel
    for t in range(m.ntendon):
        qD = qD - m.tendon_damping[t] * jnp.outer(d.ten_J[t], d.ten_J[t])
    if m.nu:
        # d force_i / d vel_i = dgain/dvel * input + dbias/dvel
        ctrl = d.ctrl
        if not (m.opt.disableflags & DisableBit.CLAMPCTRL):
            limited = jnp.asarray(np.array(m.actuator_ctrllimited, dtype=bool))
            ctrl = jnp.where(limited,
                             jnp.clip(ctrl, m.actuator_ctrlrange[:, 0],
                                      m.actuator_ctrlrange[:, 1]), ctrl)
        inputs = []
        for i in range(m.nu):
            if m.actuator_dyntype[i] == int(DynType.NONE):
                inputs.append(ctrl[i])
            else:
                inputs.append(d.act[m.actuator_actadr[i]])
        inp = jnp.stack(inputs)
        gaintype = np.array(m.actuator_gaintype)
        biastype = np.array(m.actuator_biastype)
        dgain = jnp.where(jnp.asarray(gaintype == int(GainType.AFFINE)),
                          m.actuator_gainprm[:, 2], 0.0)
        dbias = jnp.where(jnp.asarray(biastype == int(BiasType.AFFINE)),
                          m.actuator_biasprm[:, 2], 0.0)
        dfdv = dgain * inp + dbias                      # (nu,)
        qD = qD + d.actuator_moment.T @ (dfdv[:, None] * d.actuator_moment)
    if m.has_fluid:
        # d qfrc_fluid / d qvel (mjd_smooth_vel includes the inertia-box
        # fluid drag derivative): exact jacfwd through com_vel + the drag law
        def fluid_of_qvel(qvel):
            dd = d.replace(qvel=qvel)
            dd = smooth.com_vel(m, dd)
            return smooth._fluid_qfrc(m, dd)
        qD = qD + jax.jacfwd(fluid_of_qvel)(d.qvel)
    return qD


@functools.lru_cache(maxsize=128)
def _qderiv_sparsity_meta(body_parentid, body_dofnum, body_dofadr,
                          dof_simple, nv, simple_truncate):
    """Structural mask of libmujoco's sparse qDeriv storage (empirically
    pinned against the oracle's D_rownnz/D_colind + dof_simplenum):

    - entries exist only for tree-ancestor dof pairs (so e.g. a cross-tree
      fixed-tendon damping derivative is DROPPED, verified against 3.x);
    - implicitfast additionally stores MhB in the legacy qM sparsity, where
      'simple' dofs (Model.dof_simple — compiler output, see
      core/assemble.py compute_simple_dofs) keep only their diagonal: this
      is what drops the world-frame off-diagonals of the fluid drag
      derivative for tumbling free bodies;
    - full implicit's qLU uses the D sparsity: ancestor pairs, no simple
      truncation.

    All inputs are static Model metadata — safe under jit with a traced
    Model (the server passes m as a jit argument).
    """
    nbody = len(body_parentid)
    amask = np.zeros((nv, nv), dtype=bool)
    body_dofs = [list(range(body_dofadr[b], body_dofadr[b] + body_dofnum[b]))
                 for b in range(nbody)]
    for b in range(nbody):
        chain_dofs = []
        p = b
        while p != 0:
            chain_dofs = body_dofs[p] + chain_dofs
            p = body_parentid[p]
        for x, i in enumerate(chain_dofs):
            for j in chain_dofs[:x + 1]:
                amask[i, j] = True
    mask = amask | amask.T
    if simple_truncate and dof_simple:
        simple = np.zeros(nv, dtype=bool)
        simple[list(dof_simple)] = True
        offdiag = ~np.eye(nv, dtype=bool)
        mask = mask & ~(offdiag & (simple[:, None] | simple[None, :]))
    return mask


def _qderiv_sparsity(m: Model, simple_truncate: bool) -> np.ndarray:
    return _qderiv_sparsity_meta(
        m.body_parentid, m.body_dofnum, m.body_dofadr, m.dof_simple,
        m.nv, simple_truncate)


def implicitfast(m: Model, d: Data) -> Data:
    """mj_implicit (fast variant): solve (M - h*dqfrc/dqvel) qacc = qfrc with
    the velocity-derivative of passive + actuation forces (joint/tendon
    damping, affine actuator velocity gains). The Coriolis derivative of full
    implicit is omitted and the matrix symmetrized + Cholesky-factorized
    (libmujoco's implicitfast does the same)."""
    h = m.opt.timestep.astype(d.qpos.dtype)
    qD = _qderiv_smooth(m, d)
    qD = qD * jnp.asarray(_qderiv_sparsity(m, simple_truncate=True),
                          dtype=d.qpos.dtype)
    A = d.qM - h * qD
    A = 0.5 * (A + A.T)                                 # symmetrize
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    from mujoco_ros_pkgs_tpu.ops import linalg_tpu
    qacc = linalg_tpu.psd_solve(A, qfrc)
    return _advance(m, d, qacc, d.act_dot)


def implicit(m: Model, d: Data) -> Data:
    """mj_implicit (full): additionally folds the Coriolis/centrifugal
    velocity derivative d qfrc_bias / d qvel into the implicit matrix and
    LU-solves the (non-symmetric) system, matching engine_forward.c
    mj_implicit + engine_derivative.c mjd_rne_vel.

    TPU-first: libmujoco hand-derives the RNE derivative; here it is exact
    forward-mode autodiff through the com_vel + rne level-order sweeps —
    qfrc_bias is quadratic in qvel, so jacfwd is exact to machine precision,
    and under vmap the nv tangent passes batch onto the MXU."""
    h = m.opt.timestep.astype(d.qpos.dtype)
    qD = _qderiv_smooth(m, d)

    def bias_of_qvel(qvel):
        dd = d.replace(qvel=qvel)
        dd = smooth.com_vel(m, dd)
        dd = smooth.rne(m, dd)
        return dd.qfrc_bias

    dbias = jax.jacfwd(bias_of_qvel)(d.qvel)            # (nv, nv)
    # qfrc_smooth = passive + actuator + applied - bias  =>  subtract dbias;
    # qLU's D sparsity keeps ancestor pairs only (no simple truncation)
    A = d.qM - h * ((qD - dbias) * jnp.asarray(
        _qderiv_sparsity(m, simple_truncate=False), dtype=d.qpos.dtype))
    qfrc = d.qfrc_smooth + d.qfrc_constraint
    qacc = jnp.linalg.solve(A, qfrc)                    # general LU, as mujoco
    return _advance(m, d, qacc, d.act_dot)


_RK4_A = np.array([[0.5, 0, 0], [0, 0.5, 0], [0, 0, 1.0]])
_RK4_B = np.array([1 / 6, 1 / 3, 1 / 3, 1 / 6])


def rk4(m: Model, d: Data, control_hook: Hook = None,
        passive_hook: Hook = None, hstate=None):
    """mj_RungeKutta(4)."""
    stateful = hstate is not None
    h = m.opt.timestep.astype(d.qpos.dtype)
    d0 = d
    qvels = [d.qvel]
    qaccs = [d.qacc]
    act_dots = [d.act_dot]
    for i in range(3):
        a = _RK4_A[i]
        dqvel = sum(a[j] * qvels[j] for j in range(i + 1))
        dqacc = sum(a[j] * qaccs[j] for j in range(i + 1))
        dact = sum(a[j] * act_dots[j] for j in range(i + 1))
        qpos_i = integrate_pos(m, d0.qpos, dqvel, h)
        di = d0.replace(qpos=qpos_i, qvel=d0.qvel + h * dqacc,
                        act=d0.act + h * dact if m.na else d0.act,
                        time=d0.time + float(np.sum(_RK4_A[i])) * h)
        out = forward(m, di, control_hook, passive_hook, hstate)
        di, hstate = out if stateful else (out, hstate)
        qvels.append(di.qvel)
        qaccs.append(di.qacc)
        act_dots.append(di.act_dot)
    Fv = sum(_RK4_B[j] * qvels[j] for j in range(4))
    Fa = sum(_RK4_B[j] * qaccs[j] for j in range(4))
    Fd = sum(_RK4_B[j] * act_dots[j] for j in range(4))
    qpos = integrate_pos(m, d0.qpos, Fv, h)
    d = d0.replace(qpos=qpos, qvel=d0.qvel + h * Fa,
                   act=d0.act + h * Fd if m.na else d0.act,
                   time=d0.time + h)
    return (d, hstate) if stateful else d


def step(m: Model, d: Data, control_hook: Hook = None,
         passive_hook: Hook = None, hstate=None):
    """mj_step analogue: forward dynamics + integration.

    (mujoco_ros steps this from its physics thread, mujoco_env.cpp:436-639;
    here it is a pure function — pause/run/step-N semantics live in server/.)
    Returns (d, hstate) when hstate is given, else d.
    """
    stateful = hstate is not None
    if (control_hook is None and passive_hook is None and not stateful
            and d.qpos.dtype == jnp.float32):
        # whole-step fused kernel for single-free-body models (BOXES-class):
        # one Pallas program instead of ~600 small env-leading XLA ops
        from mujoco_ros_pkgs_tpu.ops import step_tpu
        if step_tpu.available() and step_tpu.supports(m):
            return step_tpu.step(m, d)
    out = forward(m, d, control_hook, passive_hook, hstate)
    d, hstate = out if stateful else (out, hstate)
    if m.opt.integrator == int(IntegratorType.RK4):
        return rk4(m, d, control_hook, passive_hook, hstate)
    d = d.replace(qacc_warmstart=d.qacc)
    if m.opt.integrator == int(IntegratorType.IMPLICIT):
        d = implicit(m, d)
    elif m.opt.integrator == int(IntegratorType.IMPLICITFAST):
        d = implicitfast(m, d)
    else:
        d = euler(m, d)
    return (d, hstate) if stateful else d
