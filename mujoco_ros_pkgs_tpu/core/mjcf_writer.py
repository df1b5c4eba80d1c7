"""Model -> MJCF serialization (mj_saveLastXML analogue).

The reference's viewer saves the LIVE mjModel — including runtime edits made
through services — via mj_saveLastXML (mujoco_ros/src/viewer.cpp:1671-1690).
This module reconstructs an MJCF document from the compiled `Model` so that
`load_model_from_string(model_to_xml(m))` produces an equivalent model:
masses/inertias are emitted explicitly (no recompute drift), mesh assets are
emitted as inline vertex hulls with the compiler's (com, principal-frame)
folding analytically un-done, and every runtime-editable quantity (geom
size/type/friction, opt fields, equality parameters, ...) comes from the
live arrays.

Round-trip contract (tests/test_mjcf_writer.py): trajectories of the
reloaded model match the source model bit-for-near (same compiler, same
semantics); models edited through the server services survive
save_xml -> reload.
"""

from __future__ import annotations

import io
from typing import List
from xml.sax.saxutils import quoteattr

import numpy as np

from mujoco_ros_pkgs_tpu.core import types
from mujoco_ros_pkgs_tpu.core.types import (
    DynType, EqType, GainType, GeomType, JointType, SensorType, TrnType,
    WrapType, ObjType,
)

_GEOM_NAMES = {int(GeomType.PLANE): "plane", int(GeomType.HFIELD): "hfield",
               int(GeomType.SPHERE): "sphere", int(GeomType.CAPSULE): "capsule",
               int(GeomType.ELLIPSOID): "ellipsoid",
               int(GeomType.CYLINDER): "cylinder", int(GeomType.BOX): "box",
               int(GeomType.MESH): "mesh"}
_JNT_NAMES = {int(JointType.FREE): "free", int(JointType.BALL): "ball",
              int(JointType.SLIDE): "slide", int(JointType.HINGE): "hinge"}
_INT_NAMES = {0: "Euler", 1: "RK4", 2: "implicit", 3: "implicitfast"}
_SOLVER_NAMES = {0: "PGS", 1: "CG", 2: "Newton"}


def _f(x) -> str:
    """Float formatting: shortest repr that round-trips float64."""
    return np.format_float_positional(float(x), trim="-", precision=17)


def _vec(a) -> str:
    return " ".join(_f(v) for v in np.asarray(a).ravel())


class _El:
    """Tiny XML builder (keeps attribute order deterministic)."""

    def __init__(self, tag: str, **attrs):
        self.tag = tag
        self.attrs = {k: v for k, v in attrs.items() if v is not None}
        self.children: List["_El"] = []

    def add(self, tag, **attrs) -> "_El":
        el = _El(tag, **attrs)
        self.children.append(el)
        return el

    def write(self, out: io.StringIO, indent: int = 0):
        pad = "  " * indent
        attrs = "".join(f" {k}={quoteattr(str(v))}"
                        for k, v in self.attrs.items())
        if not self.children:
            out.write(f"{pad}<{self.tag}{attrs}/>\n")
            return
        out.write(f"{pad}<{self.tag}{attrs}>\n")
        for c in self.children:
            c.write(out, indent + 1)
        out.write(f"{pad}</{self.tag}>\n")


def _tri(v) -> str:
    return "true" if v else "false"


def model_to_xml(m: "types.Model") -> str:
    A = lambda x: np.asarray(x, dtype=np.float64)   # noqa: E731

    root = _El("mujoco", model=m.name or "model")
    root.add("compiler", angle="radian", autolimits="false")

    # ---- option ----
    o = m.opt
    flags_el = None
    opt = root.add(
        "option", timestep=_f(o.timestep), gravity=_vec(o.gravity),
        wind=_vec(o.wind), magnetic=_vec(o.magnetic), density=_f(o.density),
        viscosity=_f(o.viscosity), impratio=_f(o.impratio),
        o_margin=_f(o.o_margin), o_solref=_vec(o.o_solref),
        o_solimp=_vec(o.o_solimp),
        integrator=_INT_NAMES[int(o.integrator)],
        cone=("pyramidal" if int(o.cone) == 0 else "elliptic"),
        solver=_SOLVER_NAMES[int(o.solver)],
        iterations=str(int(o.iterations)),
        ls_iterations=str(int(o.ls_iterations)),
        tolerance=_f(o.tolerance), ls_tolerance=_f(o.ls_tolerance))
    if int(o.disableflags):
        names = {"constraint": 1 << 0, "equality": 1 << 1,
                 "frictionloss": 1 << 2, "limit": 1 << 3, "contact": 1 << 4,
                 "passive": 1 << 5, "gravity": 1 << 6, "clampctrl": 1 << 7,
                 "warmstart": 1 << 8, "filterparent": 1 << 9,
                 "actuation": 1 << 10, "refsafe": 1 << 11, "sensor": 1 << 12}
        flags_el = opt.add("flag")
        for k, bit in names.items():
            if int(o.disableflags) & bit:
                flags_el.attrs[k] = "disable"

    # ---- assets: meshes as inline vertex hulls ----
    # the loader re-centers meshes to (com, principal frame); compute the
    # folding it will apply to OUR emitted verts so geom pos/quat can be
    # pre-compensated (see geom emission below)
    mesh_fold = []
    if m.mesh_names:
        from mujoco_ros_pkgs_tpu.core.mjcf import _Mesh
        asset = root.add("asset")
        for mi, name in enumerate(m.mesh_names):
            verts = A(m.mesh_vert[mi][: m.mesh_vertnum[mi]])
            asset.add("mesh", name=name, vertex=_vec(verts))
            mesh_fold.append(_Mesh(name, verts))
    if m.hfield_names:
        asset = root.add("asset") if not m.mesh_names else root.children[-1]
        for hi, name in enumerate(m.hfield_names):
            nrow, ncol = m.hfield_nrow[hi], m.hfield_ncol[hi]
            data = A(m.hfield_data[hi][:nrow, :ncol])
            asset.add("hfield", name=name, size=_vec(m.hfield_size[hi]),
                      nrow=str(nrow), ncol=str(ncol),
                      elevation=_vec(data))

    # ---- body tree ----
    children: List[List[int]] = [[] for _ in range(m.nbody)]
    for b in range(1, m.nbody):
        children[m.body_parentid[b]].append(b)

    def _quat_mul(u, v):
        w0, x0, y0, z0 = u
        w1, x1, y1, z1 = v
        return np.array([
            w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
            w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
            w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
            w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1])

    def _quat_rot(v, q):
        qv = np.array([0.0, *v])
        qc = q * np.array([1.0, -1, -1, -1])
        return _quat_mul(_quat_mul(q, qv), qc)[1:]

    def emit_geom(parent: _El, gi: int):
        gt = m.geom_type[gi]
        attrs = dict(
            name=m.geom_names[gi] or None, type=_GEOM_NAMES[gt],
            contype=str(m.geom_contype[gi]),
            conaffinity=str(m.geom_conaffinity[gi]),
            condim=str(m.geom_condim[gi]),
            priority=str(m.geom_priority[gi]),
            friction=_vec(m.geom_friction[gi]),
            solmix=_f(m.geom_solmix[gi]), solref=_vec(m.geom_solref[gi]),
            solimp=_vec(m.geom_solimp[gi]), margin=_f(m.geom_margin[gi]),
            gap=_f(m.geom_gap[gi]), rgba=_vec(m.geom_rgba[gi]))
        if m.geom_fluid_active and m.geom_fluid_active[gi]:
            attrs["fluidshape"] = "ellipsoid"
            attrs["fluidcoef"] = _vec(m.geom_fluid[gi][1:6])
        pos = A(m.geom_pos[gi])
        quat = A(m.geom_quat[gi])
        size = A(m.geom_size[gi])
        did = m.geom_dataid[gi]
        if gt == int(GeomType.MESH):
            fold = mesh_fold[did]
            # loader will do: pos' = pos + R(quat) com2, quat' = quat * q2;
            # choose attrs so pos'/quat' equal the live values
            q2c = fold.quat * np.array([1.0, -1, -1, -1])
            quat_attr = _quat_mul(quat, q2c)
            quat_attr /= np.linalg.norm(quat_attr)
            pos_attr = pos - _quat_rot(fold.com, quat_attr)
            attrs.update(mesh=m.mesh_names[did], pos=_vec(pos_attr),
                         quat=_vec(quat_attr))
        elif gt == int(GeomType.HFIELD):
            attrs.update(hfield=m.hfield_names[did], pos=_vec(pos),
                         quat=_vec(quat))
        else:
            attrs.update(pos=_vec(pos), quat=_vec(quat), size=_vec(size))
        # per-geom mass: emit explicitly so density recompute cannot drift
        # (body inertial is explicit anyway; geom mass only feeds that)
        parent.add("geom", **{k: v for k, v in attrs.items()
                              if v is not None})

    def emit_body(parent: _El, b: int):
        if b == 0:
            el = parent
        else:
            el = parent.add(
                "body", name=m.body_names[b],
                pos=_vec(m.body_pos[b]), quat=_vec(m.body_quat[b]))
            if m.body_mocapid[b] >= 0:
                el.attrs["mocap"] = "true"
            if float(m.body_gravcomp[b]):
                el.attrs["gravcomp"] = _f(m.body_gravcomp[b])
            mass = float(m.body_mass[b])
            if mass > 0:
                el.add("inertial", pos=_vec(m.body_ipos[b]),
                       quat=_vec(m.body_iquat[b]), mass=_f(mass),
                       diaginertia=_vec(m.body_inertia[b]))
            for ji in range(m.body_jntadr[b],
                            m.body_jntadr[b] + m.body_jntnum[b]):
                jt = m.jnt_type[ji]
                vadr = m.jnt_dofadr[ji]
                qadr = m.jnt_qposadr[ji]
                jattrs = dict(name=m.jnt_names[ji] or None,
                              type=_JNT_NAMES[jt],
                              pos=_vec(m.jnt_pos[ji]))
                if jt != int(JointType.FREE):
                    jattrs.update(
                        axis=_vec(m.jnt_axis[ji]),
                        stiffness=_f(m.jnt_stiffness[ji]),
                        damping=_f(m.dof_damping[vadr]),
                        armature=_f(m.dof_armature[vadr]),
                        frictionloss=_f(m.dof_frictionloss[vadr]),
                        limited=_tri(m.jnt_limited[ji]),
                        range=_vec(m.jnt_range[ji]),
                        margin=_f(m.jnt_margin[ji]),
                        solreflimit=_vec(m.jnt_solref[ji]),
                        solimplimit=_vec(m.jnt_solimp[ji]),
                        actuatorfrclimited=_tri(m.jnt_actfrclimited[ji]),
                        actuatorfrcrange=_vec(m.jnt_actfrcrange[ji]))
                    if jt in (int(JointType.SLIDE), int(JointType.HINGE)):
                        jattrs.update(ref=_f(m.qpos0[qadr]),
                                      springref=_f(m.qpos_spring[qadr]))
                el.add("joint", **{k: v for k, v in jattrs.items()
                                   if v is not None})
            for gi in range(m.body_geomadr[b],
                            m.body_geomadr[b] + m.body_geomnum[b]):
                emit_geom(el, gi)
            for si in range(m.nsite):
                if m.site_bodyid[si] == b:
                    el.add("site", name=m.site_names[si] or None,
                           pos=_vec(m.site_pos[si]),
                           quat=_vec(m.site_quat[si]))
            for ci in range(len(m.cam_names)):
                if m.cam_bodyid[ci] == b:
                    el.add("camera", name=m.cam_names[ci] or None,
                           mode="fixed", pos=_vec(m.cam_pos[ci]),
                           quat=_vec(m.cam_quat[ci]),
                           fovy=_f(m.cam_fovy[ci]))
        for c in children[b]:
            emit_body(el, c)

    wb = root.add("worldbody")
    # world-attached geoms/sites/cameras
    for gi in range(m.body_geomadr[0], m.body_geomadr[0] + m.body_geomnum[0]):
        emit_geom(wb, gi)
    for si in range(m.nsite):
        if m.site_bodyid[si] == 0:
            wb.add("site", name=m.site_names[si] or None,
                   pos=_vec(m.site_pos[si]), quat=_vec(m.site_quat[si]))
    for ci in range(len(m.cam_names)):
        if m.cam_bodyid[ci] == 0:
            wb.add("camera", name=m.cam_names[ci] or None, mode="fixed",
                   pos=_vec(m.cam_pos[ci]), quat=_vec(m.cam_quat[ci]),
                   fovy=_f(m.cam_fovy[ci]))
    for c in children[0]:
        emit_body(wb, c)

    # ---- contact pairs/excludes ----
    if m.pair_exclude or m.pair_explicit:
        ce = root.add("contact")
        for (b1, b2) in m.pair_exclude:
            ce.add("exclude", body1=m.body_names[b1], body2=m.body_names[b2])
        for (g1, g2) in m.pair_explicit:
            ce.add("pair", geom1=m.geom_names[g1], geom2=m.geom_names[g2])

    # ---- equality ----
    if m.neq:
        eq = root.add("equality")
        data = A(m.eq_data)
        for e in range(m.neq):
            et = m.eq_type[e]
            common = dict(name=m.eq_names[e] or None,
                          active=_tri(m.eq_active0[e]),
                          solref=_vec(m.eq_solref[e]),
                          solimp=_vec(m.eq_solimp[e]))
            if et == int(EqType.CONNECT):
                eq.add("connect", body1=m.body_names[m.eq_obj1id[e]],
                       body2=(m.body_names[m.eq_obj2id[e]]
                              if m.eq_obj2id[e] else None),
                       anchor=_vec(data[e, 0:3]), **common)
            elif et == int(EqType.WELD):
                eq.add("weld", body1=m.body_names[m.eq_obj1id[e]],
                       body2=(m.body_names[m.eq_obj2id[e]]
                              if m.eq_obj2id[e] else None),
                       anchor=_vec(data[e, 0:3]),
                       relpose=_vec(data[e, 3:10]),
                       torquescale=_f(data[e, 10]), **common)
            elif et == int(EqType.JOINT):
                eq.add("joint", joint1=m.jnt_names[m.eq_obj1id[e]],
                       joint2=(m.jnt_names[m.eq_obj2id[e]]
                               if m.eq_obj2id[e] >= 0 else None),
                       polycoef=_vec(data[e, 0:5]), **common)
            elif et == int(EqType.TENDON):
                eq.add("tendon", tendon1=m.tendon_names[m.eq_obj1id[e]],
                       tendon2=(m.tendon_names[m.eq_obj2id[e]]
                                if m.eq_obj2id[e] >= 0 else None),
                       polycoef=_vec(data[e, 0:5]), **common)

    # ---- tendons ----
    if m.ntendon:
        te = root.add("tendon")
        wrap_prm = A(m.wrap_prm)
        for t in range(m.ntendon):
            adr, num = m.tendon_adr[t], m.tendon_num[t]
            kinds = [m.wrap_type[w] for w in range(adr, adr + num)]
            fixed = all(k == int(WrapType.JOINT) for k in kinds)
            lengthspring = A(m.tendon_lengthspring[t])
            attrs = dict(
                name=m.tendon_names[t] or None,
                limited=_tri(m.tendon_limited[t]),
                range=_vec(m.tendon_range[t]),
                solreflimit=_vec(m.tendon_solref_lim[t]),
                solimplimit=_vec(m.tendon_solimp_lim[t]),
                margin=_f(m.tendon_margin[t]),
                stiffness=_f(m.tendon_stiffness[t]),
                damping=_f(m.tendon_damping[t]),
                frictionloss=_f(m.tendon_frictionloss[t]))
            if lengthspring[0] >= 0:
                attrs["springlength"] = _vec(lengthspring)
            el = te.add("fixed" if fixed else "spatial",
                        **{k: v for k, v in attrs.items() if v is not None})
            for w in range(adr, adr + num):
                wt = m.wrap_type[w]
                if wt == int(WrapType.JOINT):
                    el.add("joint", joint=m.jnt_names[m.wrap_objid[w]],
                           coef=_f(wrap_prm[w]))
                elif wt == int(WrapType.SITE):
                    el.add("site", site=m.site_names[m.wrap_objid[w]])
                elif wt in (int(WrapType.SPHERE), int(WrapType.CYLINDER)):
                    ss = m.wrap_sidesite[w]
                    el.add("geom", geom=m.geom_names[m.wrap_objid[w]],
                           sidesite=(m.site_names[ss] if ss >= 0 else None))
                elif wt == int(WrapType.PULLEY):
                    el.add("pulley", divisor=_f(m.wrap_divisor[w]))

    # ---- actuators (always as <general> — exact prm round-trip) ----
    if m.nu:
        ae = root.add("actuator")
        dynnames = {0: "none", 1: "integrator", 2: "filter",
                    3: "filterexact", 4: "muscle"}
        gainnames = {0: "fixed", 1: "affine", 2: "muscle"}
        biasnames = {0: "none", 1: "affine", 2: "muscle"}
        for i in range(m.nu):
            trn = m.actuator_trntype[i]
            tid = m.actuator_trnid[i][0]
            attrs = dict(
                name=m.actuator_names[i] or None,
                dyntype=dynnames[m.actuator_dyntype[i]],
                gaintype=gainnames[m.actuator_gaintype[i]],
                biastype=biasnames[m.actuator_biastype[i]],
                dynprm=_vec(m.actuator_dynprm[i]),
                gainprm=_vec(m.actuator_gainprm[i]),
                biasprm=_vec(m.actuator_biasprm[i]),
                gear=_vec(m.actuator_gear[i]),
                ctrllimited=_tri(m.actuator_ctrllimited[i]),
                ctrlrange=_vec(m.actuator_ctrlrange[i]),
                forcelimited=_tri(m.actuator_forcelimited[i]),
                forcerange=_vec(m.actuator_forcerange[i]),
                actlimited=_tri(m.actuator_actlimited[i])
                if m.actuator_actlimited else None,
                actrange=_vec(m.actuator_actrange[i]))
            lr = A(m.actuator_lengthrange[i])
            if lr[1] > lr[0]:
                attrs["lengthrange"] = _vec(lr)
            if trn in (int(TrnType.JOINT), int(TrnType.JOINTINPARENT)):
                attrs["joint"] = m.jnt_names[tid]
            elif trn == int(TrnType.TENDON):
                attrs["tendon"] = m.tendon_names[tid]
            elif trn == int(TrnType.SITE):
                attrs["site"] = m.site_names[tid]
            ae.add("general", **{k: v for k, v in attrs.items()
                                 if v is not None})

    # ---- sensors ----
    if m.nsensor:
        se = root.add("sensor")
        objnames = {int(ObjType.SITE): ("site", m.site_names),
                    int(ObjType.JOINT): ("joint", m.jnt_names),
                    int(ObjType.BODY): ("body", m.body_names),
                    int(ObjType.XBODY): ("body", m.body_names),
                    int(ObjType.GEOM): ("geom", m.geom_names),
                    int(ObjType.UNKNOWN) + 100: ("tendon", m.tendon_names),
                    int(ObjType.UNKNOWN) + 200: ("actuator",
                                                 m.actuator_names)}
        frame_types = {int(t) for t in (
            SensorType.FRAMEPOS, SensorType.FRAMEQUAT, SensorType.FRAMEXAXIS,
            SensorType.FRAMEYAXIS, SensorType.FRAMEZAXIS,
            SensorType.FRAMELINVEL, SensorType.FRAMEANGVEL,
            SensorType.FRAMELINACC, SensorType.FRAMEANGACC)}
        objtypestr = {int(ObjType.BODY): "body", int(ObjType.XBODY): "xbody",
                      int(ObjType.JOINT): "joint", int(ObjType.GEOM): "geom",
                      int(ObjType.SITE): "site",
                      int(ObjType.CAMERA): "camera"}
        for s in range(m.nsensor):
            st = m.sensor_type[s]
            tag = SensorType(st).name.lower()
            attrs = dict(name=m.sensor_names[s] or None,
                         cutoff=_f(m.sensor_cutoff[s]),
                         noise=_f(m.sensor_noise[s]))
            ot, oid = m.sensor_objtype[s], m.sensor_objid[s]
            if st in frame_types:
                attrs["objtype"] = objtypestr[ot]
                attrs["objname"] = objnames[ot][1][oid]
            elif oid >= 0 and ot in objnames:
                key, names = objnames[ot]
                attrs[key] = names[oid]
            rt, rid = m.sensor_reftype[s], m.sensor_refid[s]
            if rid >= 0 and rt in objtypestr:
                attrs["reftype"] = objtypestr[rt]
                attrs["refname"] = objnames[rt][1][rid]
            se.add(tag, **{k: v for k, v in attrs.items() if v is not None})

    # ---- keyframes ----
    if m.nkey:
        ke = root.add("keyframe")
        for k in range(m.nkey):
            attrs = dict(name=m.key_names[k] or None,
                         time=_f(m.key_time[k]), qpos=_vec(m.key_qpos[k]),
                         qvel=_vec(m.key_qvel[k]))
            if m.na:
                attrs["act"] = _vec(m.key_act[k])
            if m.nu:
                attrs["ctrl"] = _vec(m.key_ctrl[k])
            if m.nmocap:
                attrs["mpos"] = _vec(m.key_mpos[k])
                attrs["mquat"] = _vec(m.key_mquat[k])
            ke.add("key", **{k2: v for k2, v in attrs.items()
                             if v is not None})

    out = io.StringIO()
    root.write(out)
    return out.getvalue()
