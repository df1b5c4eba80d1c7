"""Core pytree types: Model (static physics constants), Data (per-env state).

Design: the reference holds one `mjModel*`/`mjData*` pair per process
(mujoco_ros/include/mujoco_ros/mujoco_env.h:298-300) and steps it on a dedicated
thread. Here, `Model` is a pytree of device constants + hashable structural
metadata, and `Data` is a pytree of arrays for ONE env; thousands of envs are a
leading batch axis introduced by `jax.vmap` and sharded across a device mesh.

Structural metadata (sizes, joint types, tree topology, enum-typed columns) is
stored as *static* fields (python ints / tuples) so that model-specific loops
unroll at trace time into fixed XLA programs — no dynamic shapes, no gathers on
topology, MXU-friendly dense linear algebra.

Integer enum values match mjtJoint/mjtGeom/... of MuJoCo 2.3.7 so that models
compiled here are field-for-field comparable with libmujoco in the parity tests.
"""

from __future__ import annotations

import enum
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct


class DisableBit(enum.IntFlag):
    """mjtDisableBit (mjmodel.h)."""
    CONSTRAINT = 1 << 0
    EQUALITY = 1 << 1
    FRICTIONLOSS = 1 << 2
    LIMIT = 1 << 3
    CONTACT = 1 << 4
    PASSIVE = 1 << 5
    GRAVITY = 1 << 6
    CLAMPCTRL = 1 << 7
    WARMSTART = 1 << 8
    FILTERPARENT = 1 << 9
    ACTUATION = 1 << 10
    REFSAFE = 1 << 11
    SENSOR = 1 << 12


class JointType(enum.IntEnum):
    FREE = 0
    BALL = 1
    SLIDE = 2
    HINGE = 3

    def nq(self) -> int:
        return {0: 7, 1: 4, 2: 1, 3: 1}[int(self)]

    def nv(self) -> int:
        return {0: 6, 1: 3, 2: 1, 3: 1}[int(self)]


class GeomType(enum.IntEnum):
    PLANE = 0
    HFIELD = 1
    SPHERE = 2
    CAPSULE = 3
    ELLIPSOID = 4
    CYLINDER = 5
    BOX = 6
    MESH = 7


class IntegratorType(enum.IntEnum):
    EULER = 0
    RK4 = 1
    IMPLICIT = 2
    IMPLICITFAST = 3


class ConeType(enum.IntEnum):
    PYRAMIDAL = 0
    ELLIPTIC = 1


class SolverType(enum.IntEnum):
    PGS = 0
    CG = 1
    NEWTON = 2


class EqType(enum.IntEnum):
    CONNECT = 0
    WELD = 1
    JOINT = 2
    TENDON = 3
    # DISTANCE = 4 existed in 2.3.7 but is unsupported there too


class WrapType(enum.IntEnum):
    JOINT = 1
    PULLEY = 2
    SITE = 3
    SPHERE = 4
    CYLINDER = 5


class TrnType(enum.IntEnum):
    JOINT = 0
    JOINTINPARENT = 1
    SLIDERCRANK = 2
    TENDON = 3
    SITE = 4


class DynType(enum.IntEnum):
    NONE = 0
    INTEGRATOR = 1
    FILTER = 2
    FILTEREXACT = 3
    MUSCLE = 4


class GainType(enum.IntEnum):
    FIXED = 0
    AFFINE = 1
    MUSCLE = 2


class BiasType(enum.IntEnum):
    NONE = 0
    AFFINE = 1
    MUSCLE = 2


class SensorType(enum.IntEnum):
    """mjtSensor; names match the string table the reference sensors plugin maps
    (mujoco_ros_sensors/src/mujoco_sensor_handler_plugin.cpp:70-105)."""
    TOUCH = 0
    ACCELEROMETER = 1
    VELOCIMETER = 2
    GYRO = 3
    FORCE = 4
    TORQUE = 5
    MAGNETOMETER = 6
    RANGEFINDER = 7
    JOINTPOS = 8
    JOINTVEL = 9
    TENDONPOS = 10
    TENDONVEL = 11
    ACTUATORPOS = 12
    ACTUATORVEL = 13
    ACTUATORFRC = 14
    BALLQUAT = 15
    BALLANGVEL = 16
    JOINTLIMITPOS = 17
    JOINTLIMITVEL = 18
    JOINTLIMITFRC = 19
    TENDONLIMITPOS = 20
    TENDONLIMITVEL = 21
    TENDONLIMITFRC = 22
    FRAMEPOS = 23
    FRAMEQUAT = 24
    FRAMEXAXIS = 25
    FRAMEYAXIS = 26
    FRAMEZAXIS = 27
    FRAMELINVEL = 28
    FRAMEANGVEL = 29
    FRAMELINACC = 30
    FRAMEANGACC = 31
    SUBTREECOM = 32
    SUBTREELINVEL = 33
    SUBTREEANGMOM = 34
    CLOCK = 35


class ObjType(enum.IntEnum):
    """mjtObj subset used by sensors/refs."""
    UNKNOWN = 0
    BODY = 1
    XBODY = 2
    JOINT = 3
    GEOM = 5
    SITE = 6
    CAMERA = 7


# ---------------------------------------------------------------------------


def _static(**kw):
    return struct.field(pytree_node=False, **kw)


@struct.dataclass
class Option:
    """mjOption analogue (MJCF <option>)."""
    timestep: jax.Array
    gravity: jax.Array          # (3,)
    wind: jax.Array             # (3,)
    magnetic: jax.Array         # (3,)
    density: jax.Array
    viscosity: jax.Array
    impratio: jax.Array
    o_margin: jax.Array
    o_solref: jax.Array         # (2,)
    o_solimp: jax.Array         # (5,)
    tolerance: jax.Array
    ls_tolerance: jax.Array
    integrator: int = _static(default=int(IntegratorType.EULER))
    cone: int = _static(default=int(ConeType.PYRAMIDAL))
    solver: int = _static(default=int(SolverType.NEWTON))
    iterations: int = _static(default=100)
    ls_iterations: int = _static(default=50)
    disableflags: int = _static(default=0)


@struct.dataclass
class Model:
    """mjModel analogue: compiled, static physics constants for one MJCF model.

    Array fields are device arrays (float64 on compile; cast via `astype`).
    Fields suffixed `_t` (or typed Tuple) are static structural metadata.
    """
    # ---- sizes (static) ----
    nq: int = _static()
    nv: int = _static()
    nu: int = _static()
    na: int = _static()
    nbody: int = _static()
    njnt: int = _static()
    ngeom: int = _static()
    nsite: int = _static()
    nmocap: int = _static()
    neq: int = _static()
    ntendon: int = _static()
    nwrap: int = _static()
    nsensor: int = _static()
    nsensordata: int = _static()
    nkey: int = _static()

    opt: Option = None

    # ---- qpos defaults ----
    qpos0: jax.Array = None          # (nq,)
    qpos_spring: jax.Array = None    # (nq,)

    # ---- bodies ----
    body_parentid: Tuple[int, ...] = _static(default=())
    body_rootid: Tuple[int, ...] = _static(default=())
    body_weldid: Tuple[int, ...] = _static(default=())
    body_jntnum: Tuple[int, ...] = _static(default=())
    body_jntadr: Tuple[int, ...] = _static(default=())
    body_dofnum: Tuple[int, ...] = _static(default=())
    body_dofadr: Tuple[int, ...] = _static(default=())
    body_geomnum: Tuple[int, ...] = _static(default=())
    body_geomadr: Tuple[int, ...] = _static(default=())
    body_mocapid: Tuple[int, ...] = _static(default=())
    body_pos: jax.Array = None       # (nbody, 3)
    body_quat: jax.Array = None      # (nbody, 4)
    body_ipos: jax.Array = None      # (nbody, 3)
    body_iquat: jax.Array = None     # (nbody, 4)
    body_mass: jax.Array = None      # (nbody,)
    body_subtreemass: jax.Array = None
    body_inertia: jax.Array = None   # (nbody, 3)
    body_invweight0: jax.Array = None  # (nbody, 2)
    body_gravcomp: jax.Array = None  # (nbody,)

    # ---- joints ----
    jnt_type: Tuple[int, ...] = _static(default=())
    jnt_qposadr: Tuple[int, ...] = _static(default=())
    jnt_dofadr: Tuple[int, ...] = _static(default=())
    jnt_bodyid: Tuple[int, ...] = _static(default=())
    jnt_limited: Tuple[int, ...] = _static(default=())
    jnt_actfrclimited: Tuple[int, ...] = _static(default=())
    jnt_pos: jax.Array = None        # (njnt, 3)
    jnt_axis: jax.Array = None       # (njnt, 3)
    jnt_stiffness: jax.Array = None  # (njnt,)
    jnt_range: jax.Array = None      # (njnt, 2)
    jnt_actfrcrange: jax.Array = None
    jnt_solref: jax.Array = None     # (njnt, 2)
    jnt_solimp: jax.Array = None     # (njnt, 5)
    jnt_margin: jax.Array = None     # (njnt,)

    # ---- dofs ----
    dof_bodyid: Tuple[int, ...] = _static(default=())
    dof_jntid: Tuple[int, ...] = _static(default=())
    dof_parentid: Tuple[int, ...] = _static(default=())  # -1 for root dofs
    dof_armature: jax.Array = None   # (nv,)
    dof_damping: jax.Array = None    # (nv,)
    dof_invweight0: jax.Array = None # (nv,)
    dof_frictionloss: jax.Array = None
    dof_solref: jax.Array = None     # (nv, 2)
    dof_solimp: jax.Array = None     # (nv, 5)

    # ---- geoms ----
    geom_type: Tuple[int, ...] = _static(default=())
    geom_bodyid: Tuple[int, ...] = _static(default=())
    geom_contype: Tuple[int, ...] = _static(default=())
    geom_conaffinity: Tuple[int, ...] = _static(default=())
    geom_condim: Tuple[int, ...] = _static(default=())
    geom_priority: Tuple[int, ...] = _static(default=())
    geom_size: jax.Array = None      # (ngeom, 3)
    geom_rbound: jax.Array = None    # (ngeom,)
    geom_pos: jax.Array = None       # (ngeom, 3)
    geom_quat: jax.Array = None      # (ngeom, 4)
    geom_friction: jax.Array = None  # (ngeom, 3)
    geom_solmix: jax.Array = None    # (ngeom,)
    geom_solref: jax.Array = None    # (ngeom, 2)
    geom_solimp: jax.Array = None    # (ngeom, 5)
    geom_margin: jax.Array = None    # (ngeom,)
    geom_gap: jax.Array = None       # (ngeom,)
    geom_dataid: Tuple[int, ...] = _static(default=())  # mesh id or -1
    # ellipsoid fluid-interaction model (mjNFLUID=12 per geom: active flag,
    # blunt/slender/angular drag, kutta/magnus lift, virtual mass (3),
    # virtual inertia (3)); geom_fluid_active mirrors column 0 statically
    # so the passive-force pipeline can gate the model at trace time
    geom_fluid: jax.Array = None     # (ngeom, 12)
    geom_fluid_active: Tuple[int, ...] = _static(default=())

    # ---- meshes (convex hulls; support fn = argmax verts @ dir, ops/gjk.py) ----
    nmesh: int = _static(default=0)
    mesh_vertnum: Tuple[int, ...] = _static(default=())
    mesh_names: Tuple[str, ...] = _static(default=())
    mesh_vert: jax.Array = None      # (nmesh, max_vert, 3) padded local hull verts

    # ---- height fields (normalized [0,1] elevation grids, ops/hfield.py) ----
    nhfield: int = _static(default=0)
    hfield_nrow: Tuple[int, ...] = _static(default=())
    hfield_ncol: Tuple[int, ...] = _static(default=())
    hfield_names: Tuple[str, ...] = _static(default=())
    hfield_size: jax.Array = None    # (nhfield, 4) rx, ry, top_z, bottom_z
    hfield_data: jax.Array = None    # (nhfield, max_nrow, max_ncol) in [0,1]

    # ---- sites ----
    site_bodyid: Tuple[int, ...] = _static(default=())
    site_pos: jax.Array = None       # (nsite, 3)
    site_quat: jax.Array = None      # (nsite, 4)

    # ---- cameras (render/ L3) ----
    ncam: int = _static(default=0)
    cam_bodyid: Tuple[int, ...] = _static(default=())
    cam_names: Tuple[str, ...] = _static(default=())
    cam_pos: jax.Array = None        # (ncam, 3)
    cam_quat: jax.Array = None       # (ncam, 4)
    cam_fovy: jax.Array = None       # (ncam,)
    geom_rgba: jax.Array = None      # (ngeom, 4) for the raycast renderer

    # ---- equality constraints ----
    eq_type: Tuple[int, ...] = _static(default=())
    eq_obj1id: Tuple[int, ...] = _static(default=())
    eq_obj2id: Tuple[int, ...] = _static(default=())
    eq_active0: Tuple[int, ...] = _static(default=())
    eq_solref: jax.Array = None      # (neq, 2)
    eq_solimp: jax.Array = None      # (neq, 5)
    eq_data: jax.Array = None        # (neq, 11)

    # ---- tendons (fixed only for now) ----
    tendon_adr: Tuple[int, ...] = _static(default=())
    tendon_num: Tuple[int, ...] = _static(default=())
    tendon_limited: Tuple[int, ...] = _static(default=())
    tendon_range: jax.Array = None       # (ntendon, 2)
    tendon_solref_lim: jax.Array = None  # (ntendon, 2)
    tendon_solimp_lim: jax.Array = None  # (ntendon, 5)
    tendon_margin: jax.Array = None
    tendon_stiffness: jax.Array = None
    tendon_damping: jax.Array = None
    tendon_frictionloss: jax.Array = None
    tendon_lengthspring: jax.Array = None  # (ntendon, 2) in 3.x, (ntendon,) in 2.3.7; we keep (2,)
    tendon_length0: jax.Array = None
    tendon_invweight0: jax.Array = None
    wrap_type: Tuple[int, ...] = _static(default=())
    wrap_objid: Tuple[int, ...] = _static(default=())
    wrap_prm: jax.Array = None       # (nwrap,) fixed-tendon coef per entry
    # spatial-tendon structural metadata (static: the wrap path shapes the
    # traced program; wrap_prm stays the runtime-editable coef array)
    wrap_sidesite: Tuple[int, ...] = _static(default=())  # site id | -1
    wrap_divisor: Tuple[float, ...] = _static(default=()) # pulley divisors

    # ---- actuators ----
    actuator_trntype: Tuple[int, ...] = _static(default=())
    actuator_dyntype: Tuple[int, ...] = _static(default=())
    actuator_gaintype: Tuple[int, ...] = _static(default=())
    actuator_biastype: Tuple[int, ...] = _static(default=())
    actuator_trnid: Tuple[Tuple[int, int], ...] = _static(default=())
    actuator_actadr: Tuple[int, ...] = _static(default=())
    actuator_actnum: Tuple[int, ...] = _static(default=())
    actuator_ctrllimited: Tuple[int, ...] = _static(default=())
    actuator_forcelimited: Tuple[int, ...] = _static(default=())
    actuator_dynprm: jax.Array = None   # (nu, 10)
    actuator_gainprm: jax.Array = None  # (nu, 10)
    actuator_biasprm: jax.Array = None  # (nu, 10)
    actuator_ctrlrange: jax.Array = None
    actuator_forcerange: jax.Array = None
    actuator_gear: jax.Array = None     # (nu, 6)
    actuator_actlimited: Tuple[int, ...] = _static(default=())
    actuator_actrange: jax.Array = None      # (nu, 2)
    actuator_lengthrange: jax.Array = None   # (nu, 2) muscle normalization
    actuator_acc0: jax.Array = None          # (nu,) |M^-1 moment| at qpos0

    # ---- sensors ----
    sensor_type: Tuple[int, ...] = _static(default=())
    sensor_objtype: Tuple[int, ...] = _static(default=())
    sensor_objid: Tuple[int, ...] = _static(default=())
    sensor_reftype: Tuple[int, ...] = _static(default=())
    sensor_refid: Tuple[int, ...] = _static(default=())
    sensor_adr: Tuple[int, ...] = _static(default=())
    sensor_dim: Tuple[int, ...] = _static(default=())
    sensor_cutoff: jax.Array = None  # (nsensor,)
    sensor_noise: jax.Array = None   # (nsensor,)

    # ---- keyframes ----
    key_time: jax.Array = None
    key_qpos: jax.Array = None
    key_qvel: jax.Array = None
    key_act: jax.Array = None
    key_ctrl: jax.Array = None
    key_mpos: jax.Array = None
    key_mquat: jax.Array = None

    # ---- names (static) ----
    name: str = _static(default="")
    body_names: Tuple[str, ...] = _static(default=())
    jnt_names: Tuple[str, ...] = _static(default=())
    geom_names: Tuple[str, ...] = _static(default=())
    site_names: Tuple[str, ...] = _static(default=())
    eq_names: Tuple[str, ...] = _static(default=())
    tendon_names: Tuple[str, ...] = _static(default=())
    actuator_names: Tuple[str, ...] = _static(default=())
    sensor_names: Tuple[str, ...] = _static(default=())
    key_names: Tuple[str, ...] = _static(default=())

    # ---- static structure flags (decided at compile; model arrays may be
    # traced inside jit, so row-structure choices can't read their values) ----
    dof_floss_adr: Tuple[int, ...] = _static(default=())   # dofs with frictionloss>0
    tendon_floss_adr: Tuple[int, ...] = _static(default=())
    has_damping: bool = _static(default=False)
    # opt.density/viscosity/wind active (legacy inertia-box fluid model);
    # flipping it via set_physics_properties retraces the step
    has_fluid: bool = _static(default=False)
    # dofs with structurally-diagonal qM rows (mujoco's dof_simplenum>0):
    # compiler output, frozen at load exactly like libmujoco's
    dof_simple: Tuple[int, ...] = _static(default=())

    # ---- precomputed collision pair table (static) ----
    # each entry: (geom1, geom2, ncon_capacity); grouped by (type1, type2) at use site
    collision_pairs: Tuple[Tuple[int, int], ...] = _static(default=())
    ncon_max: int = _static(default=0)
    # pair-table provenance, kept so the table can be REBUILT when a geom's
    # type changes at runtime (set_geom_properties set_type — the reference
    # recompiles contact capacities implicitly because libmujoco's mj_collision
    # re-dispatches per step, mujoco_ros/src/callbacks.cpp:508-592):
    pair_exclude: Tuple[Tuple[int, int], ...] = _static(default=())   # body ids
    pair_explicit: Tuple[Tuple[int, int], ...] = _static(default=())  # geom ids
    collision_mode: str = _static(default="all")
    # broadphase compaction: narrowphase groups with more than pair_topk
    # pairs run an in-graph AABB/bounding-sphere sweep and only the top-k
    # most-overlapping pairs hit the narrowphase (0 = every static pair runs,
    # the reference behavior). See ops/broadphase.py.
    pair_topk: int = _static(default=0)
    # active-contact compaction: when > 0, the constraint solver gathers the
    # con_topk most-penetrating contact slots per condim group (per env, in
    # slot order) and iterates only on those — the TPU analogue of
    # mj_makeConstraint instantiating ACTIVE contacts only. Exact whenever
    # the per-env active count stays <= con_topk (deeper-contacts-win
    # otherwise); see ops/solver._BlockView.
    con_topk: int = _static(default=0)

    def astype(self, dtype) -> "Model":
        """Cast all floating-point arrays to dtype (e.g. f32 for TPU throughput)."""
        def cast(x):
            if isinstance(x, (jax.Array,)) and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(dtype)
            return x
        return jax.tree_util.tree_map(cast, self)

    # -- name lookups (host-side helpers, mirror mj_name2id) --
    def body(self, name: str) -> int:
        return self.body_names.index(name)

    def joint(self, name: str) -> int:
        return self.jnt_names.index(name)

    def geom(self, name: str) -> int:
        return self.geom_names.index(name)

    def site(self, name: str) -> int:
        return self.site_names.index(name)

    def sensor(self, name: str) -> int:
        return self.sensor_names.index(name)

    def actuator(self, name: str) -> int:
        return self.actuator_names.index(name)


@struct.dataclass
class Contact:
    """Fixed-capacity batched contact set (mjContact analogue, masked).

    All arrays have leading dim ncon_max; `dist > includemargin` rows are inactive.
    """
    dist: jax.Array          # (ncon,)
    pos: jax.Array           # (ncon, 3)
    frame: jax.Array         # (ncon, 3, 3) rows: normal, tangent1, tangent2
    includemargin: jax.Array # (ncon,)
    friction: jax.Array      # (ncon, 5)
    solref: jax.Array        # (ncon, 2)
    solimp: jax.Array        # (ncon, 5)
    geom1: Tuple[int, ...] = _static(default=())
    geom2: Tuple[int, ...] = _static(default=())
    dim: Tuple[int, ...] = _static(default=())   # condim per slot
    # broadphase-compacted groups (m.pair_topk > 0) carry TRACED geom ids:
    # slots whose static geom1 is the -2 sentinel read their pair from
    # dyn_pair[j] (j = slot's rank among dynamic slots). (ndyn, 2) int32.
    dyn_pair: jax.Array = None


@struct.dataclass
class Data:
    """mjData analogue for ONE env (batch via vmap). Pure pytree of arrays."""
    # inputs / state
    time: jax.Array
    qpos: jax.Array          # (nq,)
    qvel: jax.Array          # (nv,)
    act: jax.Array           # (na,)
    ctrl: jax.Array          # (nu,)
    qfrc_applied: jax.Array  # (nv,)
    xfrc_applied: jax.Array  # (nbody, 6)  [force(3), torque(3)] world, at body com
    eq_active: jax.Array     # (neq,) bool
    mocap_pos: jax.Array     # (nmocap, 3)
    mocap_quat: jax.Array    # (nmocap, 4)

    # kinematics
    xpos: jax.Array          # (nbody, 3)
    xquat: jax.Array         # (nbody, 4)
    xmat: jax.Array          # (nbody, 3, 3)
    xipos: jax.Array         # (nbody, 3)
    ximat: jax.Array         # (nbody, 3, 3)
    xanchor: jax.Array       # (njnt, 3)
    xaxis: jax.Array         # (njnt, 3)
    geom_xpos: jax.Array     # (ngeom, 3)
    geom_xmat: jax.Array     # (ngeom, 3, 3)
    site_xpos: jax.Array     # (nsite, 3)
    site_xmat: jax.Array     # (nsite, 3, 3)
    subtree_com: jax.Array   # (nbody, 3)

    # com-based quantities
    cinert: jax.Array        # (nbody, 10)
    cdof: jax.Array          # (nv, 6)
    cvel: jax.Array          # (nbody, 6)
    cdof_dot: jax.Array      # (nv, 6)

    # mass matrix (dense) and factorization
    qM: jax.Array            # (nv, nv)

    # forces
    qfrc_bias: jax.Array     # (nv,)
    qfrc_passive: jax.Array  # (nv,)
    qfrc_actuator: jax.Array # (nv,)
    qfrc_smooth: jax.Array   # (nv,)
    qacc_smooth: jax.Array   # (nv,)
    qfrc_constraint: jax.Array  # (nv,)
    qacc: jax.Array          # (nv,)
    qacc_warmstart: jax.Array  # (nv,)

    # actuation
    actuator_length: jax.Array    # (nu,)
    actuator_velocity: jax.Array  # (nu,)
    actuator_force: jax.Array     # (nu,)
    actuator_moment: jax.Array    # (nu, nv)
    act_dot: jax.Array            # (na,)

    # tendons
    ten_length: jax.Array    # (ntendon,)
    ten_velocity: jax.Array  # (ntendon,)
    ten_J: jax.Array         # (ntendon, nv)

    # constraints & contacts
    contact: Contact
    efc_force_contact: jax.Array  # (ncon_max * max condim? see constraint.py) placeholder
    sensordata: jax.Array    # (nsensordata,)

    # per-env RNG (used by noise hooks; split/folded per step)
    rng: jax.Array
