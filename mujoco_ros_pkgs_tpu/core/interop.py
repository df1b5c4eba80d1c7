"""pip-mujoco interop: build a Model from a compiled mjModel.

This is the `.mjb` binary-load path the reference gets from `mj_loadModel`
(mujoco_ros/src/mujoco_env.cpp:785-836 — its reload service accepts either
XML or MJB). MJB is a raw dump of a compiled mjModel, so the natural reader
is libmujoco itself (via the `mujoco` pip package); this module then maps the
compiled arrays onto our pytree Model. Because our field names and enum
values mirror mjModel/mjt* (MuJoCo 2.3.7 layout), most of the mapping is
mechanical; the exceptions are handled explicitly:

- sensor types are translated BY NAME (3.x inserted mjSENS_CAMPROJECTION
  mid-enum, shifting values vs the 2.3.7 ordering our SensorType pins);
- flat mesh/hfield buffers are re-padded into our fixed-shape blocks;
- the static collision pair table and qpos0-derived constants are recomputed
  with the same code paths the MJCF compiler uses
  (assemble.rebuild_pair_table, constants.set_constants).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from mujoco_ros_pkgs_tpu.core import types


def _names(mm, objtype, n):
    import mujoco
    out = []
    for i in range(n):
        nm = mujoco.mj_id2name(mm, objtype, i)
        out.append(nm if nm is not None else "")
    return tuple(out)


def _itup(arr):
    return tuple(int(v) for v in np.asarray(arr).ravel())


def model_from_mujoco(mm, dtype=None, pair_topk: int = 0,
                      con_topk: int = 0) -> types.Model:
    """Convert a compiled `mujoco.MjModel` into a Model pytree."""
    import jax.numpy as jnp
    import mujoco
    from mujoco_ros_pkgs_tpu.core import assemble, constants

    def J(x):
        return jnp.asarray(np.asarray(x, dtype=np.float64))

    o = mm.opt
    opt = types.Option(
        timestep=J(o.timestep), gravity=J(o.gravity), wind=J(o.wind),
        magnetic=J(o.magnetic), density=J(o.density),
        viscosity=J(o.viscosity), impratio=J(o.impratio),
        o_margin=J(o.o_margin), o_solref=J(o.o_solref),
        o_solimp=J(o.o_solimp), tolerance=J(o.tolerance),
        ls_tolerance=J(o.ls_tolerance),
        integrator=int(o.integrator), cone=int(o.cone),
        solver=int(o.solver), iterations=int(o.iterations),
        ls_iterations=int(o.ls_iterations),
        # bits beyond SENSOR (1<<12) are 3.x-only (midphase, eulerdamp, ...)
        disableflags=int(o.disableflags) & 0x1FFF)

    # sensor types by NAME (values shifted in 3.x)
    sensor_type = []
    for v in np.asarray(mm.sensor_type):
        name = mujoco.mjtSensor(int(v)).name.removeprefix("mjSENS_")
        try:
            sensor_type.append(int(types.SensorType[name]))
        except KeyError:
            raise ValueError(f"unsupported sensor type {name} in mjb model")

    # flat mesh verts -> (nmesh, max_vert, 3) padded with the first vertex
    nmesh = int(mm.nmesh)
    if nmesh:
        vnum = np.asarray(mm.mesh_vertnum)
        vadr = np.asarray(mm.mesh_vertadr)
        maxv = int(vnum.max())
        verts = np.zeros((nmesh, maxv, 3))
        for i in range(nmesh):
            v = np.asarray(mm.mesh_vert[vadr[i]:vadr[i] + vnum[i]])
            verts[i, :vnum[i]] = v
            verts[i, vnum[i]:] = v[:1]
        mesh_vert = J(verts)
    else:
        mesh_vert = J(np.zeros((0, 0, 3)))

    # flat hfield data -> (nhfield, max_nrow, max_ncol)
    nhf = int(mm.nhfield)
    if nhf:
        rows, cols = np.asarray(mm.hfield_nrow), np.asarray(mm.hfield_ncol)
        adr = np.asarray(mm.hfield_adr)
        hdata = np.zeros((nhf, int(rows.max()), int(cols.max())))
        for i in range(nhf):
            hdata[i, :rows[i], :cols[i]] = np.asarray(
                mm.hfield_data[adr[i]:adr[i] + rows[i] * cols[i]]
            ).reshape(rows[i], cols[i])
        hfield_data = J(hdata)
    else:
        hfield_data = J(np.zeros((0, 0, 0)))

    # exclude pairs: packed body signature body1<<16 | body2
    excl = tuple((int(s) >> 16, int(s) & 0xFFFF)
                 for s in np.asarray(mm.exclude_signature))
    expl = tuple((int(g1), int(g2)) for g1, g2 in
                 zip(np.asarray(mm.pair_geom1), np.asarray(mm.pair_geom2)))

    OBJ = mujoco.mjtObj
    m = types.Model(
        nq=int(mm.nq), nv=int(mm.nv), nu=int(mm.nu), na=int(mm.na),
        nbody=int(mm.nbody), njnt=int(mm.njnt), ngeom=int(mm.ngeom),
        nsite=int(mm.nsite), nmocap=int(mm.nmocap), neq=int(mm.neq),
        ntendon=int(mm.ntendon), nwrap=int(mm.nwrap),
        nsensor=int(mm.nsensor), nsensordata=int(mm.nsensordata),
        nkey=int(mm.nkey), nmesh=nmesh, nhfield=nhf, ncam=int(mm.ncam),
        opt=opt,
        qpos0=J(mm.qpos0), qpos_spring=J(mm.qpos_spring),
        body_parentid=_itup(mm.body_parentid),
        body_rootid=_itup(mm.body_rootid),
        body_weldid=_itup(mm.body_weldid),
        body_jntnum=_itup(mm.body_jntnum),
        body_jntadr=_itup(mm.body_jntadr),
        body_dofnum=_itup(mm.body_dofnum),
        body_dofadr=_itup(mm.body_dofadr),
        body_geomnum=_itup(mm.body_geomnum),
        body_geomadr=_itup(mm.body_geomadr),
        body_mocapid=_itup(mm.body_mocapid),
        body_pos=J(mm.body_pos), body_quat=J(mm.body_quat),
        body_ipos=J(mm.body_ipos), body_iquat=J(mm.body_iquat),
        body_mass=J(mm.body_mass),
        body_subtreemass=J(mm.body_subtreemass),
        body_inertia=J(mm.body_inertia),
        body_invweight0=J(mm.body_invweight0),
        body_gravcomp=J(mm.body_gravcomp),
        jnt_type=_itup(mm.jnt_type),
        jnt_qposadr=_itup(mm.jnt_qposadr),
        jnt_dofadr=_itup(mm.jnt_dofadr),
        jnt_bodyid=_itup(mm.jnt_bodyid),
        jnt_limited=_itup(mm.jnt_limited),
        jnt_actfrclimited=_itup(mm.jnt_actfrclimited),
        jnt_pos=J(mm.jnt_pos), jnt_axis=J(mm.jnt_axis),
        jnt_stiffness=J(mm.jnt_stiffness), jnt_range=J(mm.jnt_range),
        jnt_actfrcrange=J(mm.jnt_actfrcrange),
        jnt_solref=J(mm.jnt_solref), jnt_solimp=J(mm.jnt_solimp),
        jnt_margin=J(mm.jnt_margin),
        dof_bodyid=_itup(mm.dof_bodyid), dof_jntid=_itup(mm.dof_jntid),
        dof_parentid=_itup(mm.dof_parentid),
        dof_armature=J(mm.dof_armature), dof_damping=J(mm.dof_damping),
        dof_invweight0=J(mm.dof_invweight0),
        dof_frictionloss=J(mm.dof_frictionloss),
        dof_solref=J(mm.dof_solref), dof_solimp=J(mm.dof_solimp),
        geom_type=_itup(mm.geom_type), geom_bodyid=_itup(mm.geom_bodyid),
        geom_contype=_itup(mm.geom_contype),
        geom_conaffinity=_itup(mm.geom_conaffinity),
        geom_condim=_itup(mm.geom_condim),
        geom_priority=_itup(mm.geom_priority),
        geom_size=J(mm.geom_size), geom_rbound=J(mm.geom_rbound),
        geom_pos=J(mm.geom_pos), geom_quat=J(mm.geom_quat),
        geom_friction=J(mm.geom_friction), geom_solmix=J(mm.geom_solmix),
        geom_solref=J(mm.geom_solref), geom_solimp=J(mm.geom_solimp),
        geom_margin=J(mm.geom_margin), geom_gap=J(mm.geom_gap),
        geom_dataid=_itup(mm.geom_dataid), geom_rgba=J(mm.geom_rgba),
        geom_fluid=J(mm.geom_fluid.reshape(-1, 12)),
        geom_fluid_active=tuple(
            int(v > 0) for v in mm.geom_fluid.reshape(-1, 12)[:, 0]),
        mesh_vertnum=_itup(mm.mesh_vertnum) if nmesh else (),
        mesh_names=_names(mm, OBJ.mjOBJ_MESH, nmesh),
        mesh_vert=mesh_vert,
        hfield_nrow=_itup(mm.hfield_nrow) if nhf else (),
        hfield_ncol=_itup(mm.hfield_ncol) if nhf else (),
        hfield_names=_names(mm, OBJ.mjOBJ_HFIELD, nhf),
        hfield_size=J(mm.hfield_size) if nhf else J(np.zeros((0, 4))),
        hfield_data=hfield_data,
        site_bodyid=_itup(mm.site_bodyid),
        site_pos=J(mm.site_pos), site_quat=J(mm.site_quat),
        cam_bodyid=_itup(mm.cam_bodyid),
        cam_names=_names(mm, OBJ.mjOBJ_CAMERA, int(mm.ncam)),
        cam_pos=J(mm.cam_pos), cam_quat=J(mm.cam_quat),
        cam_fovy=J(mm.cam_fovy),
        eq_type=_itup(mm.eq_type), eq_obj1id=_itup(mm.eq_obj1id),
        eq_obj2id=_itup(mm.eq_obj2id), eq_active0=_itup(mm.eq_active0),
        eq_solref=J(mm.eq_solref), eq_solimp=J(mm.eq_solimp),
        eq_data=J(mm.eq_data[:, :11]),
        tendon_adr=_itup(mm.tendon_adr), tendon_num=_itup(mm.tendon_num),
        tendon_limited=_itup(mm.tendon_limited),
        tendon_range=J(mm.tendon_range),
        tendon_solref_lim=J(mm.tendon_solref_lim),
        tendon_solimp_lim=J(mm.tendon_solimp_lim),
        tendon_margin=J(mm.tendon_margin),
        tendon_stiffness=J(mm.tendon_stiffness),
        tendon_damping=J(mm.tendon_damping),
        tendon_frictionloss=J(mm.tendon_frictionloss),
        tendon_lengthspring=J(mm.tendon_lengthspring),
        tendon_length0=J(mm.tendon_length0),
        tendon_invweight0=J(mm.tendon_invweight0),
        wrap_type=_itup(mm.wrap_type), wrap_objid=_itup(mm.wrap_objid),
        wrap_prm=J(mm.wrap_prm),
        # mjModel.wrap_prm doubles as sidesite id (sphere/cylinder) and
        # pulley divisor — split into the static structural tuples
        wrap_sidesite=tuple(
            int(p) if t in (int(types.WrapType.SPHERE),
                            int(types.WrapType.CYLINDER)) else -1
            for t, p in zip(np.asarray(mm.wrap_type),
                            np.asarray(mm.wrap_prm))),
        wrap_divisor=tuple(
            float(p) if t == int(types.WrapType.PULLEY) else 1.0
            for t, p in zip(np.asarray(mm.wrap_type),
                            np.asarray(mm.wrap_prm))),
        actuator_trntype=_itup(mm.actuator_trntype),
        actuator_dyntype=_itup(mm.actuator_dyntype),
        actuator_gaintype=_itup(mm.actuator_gaintype),
        actuator_biastype=_itup(mm.actuator_biastype),
        actuator_trnid=tuple((int(a), int(b))
                             for a, b in np.asarray(mm.actuator_trnid)),
        actuator_actadr=_itup(mm.actuator_actadr),
        actuator_actnum=_itup(mm.actuator_actnum),
        actuator_ctrllimited=_itup(mm.actuator_ctrllimited),
        actuator_forcelimited=_itup(mm.actuator_forcelimited),
        actuator_dynprm=J(mm.actuator_dynprm),
        actuator_gainprm=J(mm.actuator_gainprm),
        actuator_biasprm=J(mm.actuator_biasprm),
        actuator_ctrlrange=J(mm.actuator_ctrlrange),
        actuator_forcerange=J(mm.actuator_forcerange),
        actuator_gear=J(mm.actuator_gear),
        actuator_actlimited=tuple(int(x) for x in mm.actuator_actlimited),
        actuator_actrange=J(mm.actuator_actrange),
        actuator_lengthrange=J(mm.actuator_lengthrange),
        actuator_acc0=J(mm.actuator_acc0),
        sensor_type=tuple(sensor_type),
        sensor_objtype=_itup(mm.sensor_objtype),
        sensor_objid=_itup(mm.sensor_objid),
        sensor_reftype=_itup(mm.sensor_reftype),
        sensor_refid=_itup(mm.sensor_refid),
        sensor_adr=_itup(mm.sensor_adr), sensor_dim=_itup(mm.sensor_dim),
        sensor_cutoff=J(mm.sensor_cutoff), sensor_noise=J(mm.sensor_noise),
        key_time=J(mm.key_time), key_qpos=J(mm.key_qpos),
        key_qvel=J(mm.key_qvel), key_act=J(mm.key_act),
        key_ctrl=J(mm.key_ctrl), key_mpos=J(mm.key_mpos),
        key_mquat=J(mm.key_mquat),
        name=_names(mm, OBJ.mjOBJ_MODEL, 1)[0] or "mjb",
        body_names=_names(mm, OBJ.mjOBJ_BODY, int(mm.nbody)),
        jnt_names=_names(mm, OBJ.mjOBJ_JOINT, int(mm.njnt)),
        geom_names=_names(mm, OBJ.mjOBJ_GEOM, int(mm.ngeom)),
        site_names=_names(mm, OBJ.mjOBJ_SITE, int(mm.nsite)),
        eq_names=_names(mm, OBJ.mjOBJ_EQUALITY, int(mm.neq)),
        tendon_names=_names(mm, OBJ.mjOBJ_TENDON, int(mm.ntendon)),
        actuator_names=_names(mm, OBJ.mjOBJ_ACTUATOR, int(mm.nu)),
        sensor_names=_names(mm, OBJ.mjOBJ_SENSOR, int(mm.nsensor)),
        key_names=_names(mm, OBJ.mjOBJ_KEY, int(mm.nkey)),
        dof_floss_adr=tuple(v for v in range(int(mm.nv))
                            if mm.dof_frictionloss[v] > 0),
        tendon_floss_adr=tuple(t for t in range(int(mm.ntendon))
                               if mm.tendon_frictionloss[t] > 0),
        has_damping=bool(np.any(np.asarray(mm.dof_damping) > 0)),
        has_fluid=bool(float(mm.opt.density) > 0
                       or float(mm.opt.viscosity) > 0
                       or np.any(np.asarray(mm.opt.wind) != 0)),
        dof_simple=tuple(v for v in range(int(mm.nv))
                         if int(mm.dof_simplenum[v]) > 0),
        pair_exclude=excl, pair_explicit=expl,
        collision_mode="all",
        pair_topk=int(pair_topk),
        con_topk=int(con_topk),
    )
    m = assemble.rebuild_pair_table(m)
    m = constants.set_constants(m)
    if dtype is not None:
        m = m.astype(dtype)
    return m


def load_model_mjb(path: str, dtype=None, pair_topk: int = 0,
                   con_topk: int = 0) -> types.Model:
    """Load a MuJoCo binary `.mjb` model (mj_loadModel analogue)."""
    try:
        import mujoco
    except ImportError as e:
        raise ValueError(f"mjb load requires the mujoco pip package: {e}")
    mm = mujoco.MjModel.from_binary_path(path)
    return model_from_mujoco(mm, dtype=dtype, pair_topk=pair_topk,
                             con_topk=con_topk)
