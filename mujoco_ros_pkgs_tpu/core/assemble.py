"""Model assembly: joint/dof layout, reference-frame resolution, static tables.

Second stage of the MJCF compiler (first stage: core/mjcf.py parse). Mirrors
what mjCModel::Compile produces for the fields our runtime uses; integer/enum
columns become static tuples so physics loops unroll at trace time.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List

import numpy as np

from mujoco_ros_pkgs_tpu.core import types
from mujoco_ros_pkgs_tpu.core.types import (
    EqType, GeomType, JointType, ObjType, SensorType, TrnType, WrapType,
)

_SOLREF = (0.02, 1.0)
_SOLIMP = (0.9, 0.95, 0.001, 0.5, 2.0)

# capacity of contact points per geom-type pair — sourced from the narrowphase
# dispatch table so the compiler and collision driver can never disagree
from mujoco_ros_pkgs_tpu.ops.narrowphase import PAIR_NCON as _PAIR_NCON  # noqa: E402


def collision_pair_table(geom_type, geom_contype, geom_conaffinity,
                         geom_bodyid, body_weldid, body_parentid,
                         filterparent, excludes, explicit_pairs,
                         collision_mode="all"):
    """Static collision pair list + total contact capacity.

    Mirrors mj_collision's body-pair filter (weld/parent/exclude) and the
    contype&conaffinity bitmask rule of MuJoCo 2.3.7. Reused at runtime by
    MujocoServer.set_geom_properties(set_type=...) to rebuild the pair table
    when a geom's type (and therefore per-pair contact capacity) changes.
    """
    ngeom = len(geom_type)
    pairs = []
    if collision_mode != "predefined":
        for g1 in range(ngeom):
            for g2 in range(g1 + 1, ngeom):
                b1, b2 = geom_bodyid[g1], geom_bodyid[g2]
                w1, w2 = body_weldid[b1], body_weldid[b2]
                if w1 == w2:
                    continue
                if (b1, b2) in excludes or (b2, b1) in excludes:
                    continue
                if filterparent and w1 != 0 and w2 != 0:
                    wp1 = body_weldid[body_parentid[w1]]
                    wp2 = body_weldid[body_parentid[w2]]
                    if w1 == wp2 or w2 == wp1:
                        continue
                if not ((geom_contype[g1] & geom_conaffinity[g2])
                        or (geom_contype[g2] & geom_conaffinity[g1])):
                    continue
                pairs.append((g1, g2))
    for (g1, g2) in explicit_pairs:
        if (g1, g2) not in pairs and (g2, g1) not in pairs:
            pairs.append((g1, g2))

    ordered, ncon_max = [], 0
    for (g1, g2) in pairs:
        t1, t2 = geom_type[g1], geom_type[g2]
        if t1 > t2:
            g1, g2, t1, t2 = g2, g1, t2, t1
        cap = _PAIR_NCON.get((GeomType(t1), GeomType(t2)))
        if cap is None:
            continue  # unsupported narrowphase pair — skipped (logged by server)
        ordered.append((g1, g2))
        ncon_max += cap
    return tuple(ordered), ncon_max


def compute_simple_dofs(body_parentid, body_dofnum, body_dofadr, jnt_bodyid,
                        jnt_type, body_ipos, body_iquat):
    """Dofs with structurally-diagonal qM rows — libmujoco's dof_simplenum>0
    (pinned empirically against the oracle): the dofs of an isolated
    single-joint body (no ancestor dofs, no descendant dofs) whose inertia
    orientation is identity and, for free/ball joints, whose com sits at the
    joint frame. Used by the implicit integrators to reproduce the legacy qM
    sparsity truncation of qDeriv (ops/forward.py `_qderiv_sparsity`)."""
    from mujoco_ros_pkgs_tpu.core.types import JointType as JT

    nbody = len(body_parentid)
    ipos = np.asarray(body_ipos, dtype=np.float64)
    iquat = np.asarray(body_iquat, dtype=np.float64)
    has_desc_dofs = np.zeros(nbody, dtype=bool)
    for b in range(nbody - 1, 0, -1):
        if body_dofnum[b] or has_desc_dofs[b]:
            has_desc_dofs[body_parentid[b]] = True
    simple = []
    for b in range(1, nbody):
        if not body_dofnum[b] or has_desc_dofs[b]:
            continue
        p = body_parentid[b]
        anc = False
        while p != 0:
            if body_dofnum[p]:
                anc = True
                break
            p = body_parentid[p]
        if anc:
            continue
        jids = [j for j in range(len(jnt_bodyid)) if jnt_bodyid[j] == b]
        if len(jids) != 1:
            continue
        jt = jnt_type[jids[0]]
        if (abs(iquat[b][0] - 1.0) > 1e-12
                or np.any(np.abs(iquat[b][1:]) > 1e-12)):
            continue
        if jt in (int(JT.FREE), int(JT.BALL)) and np.any(
                np.abs(ipos[b]) > 1e-12):
            continue
        simple.extend(range(body_dofadr[b], body_dofadr[b] + body_dofnum[b]))
    return tuple(simple)


def rebuild_pair_table(m: "types.Model") -> "types.Model":
    """Recompute collision_pairs/ncon_max for a Model whose geom types (or
    filter inputs) changed at runtime. Returns an updated Model."""
    filterparent = not bool(m.opt.disableflags
                            & types.DisableBit.FILTERPARENT)
    ordered, ncon_max = collision_pair_table(
        m.geom_type, m.geom_contype, m.geom_conaffinity, m.geom_bodyid,
        m.body_weldid, m.body_parentid, filterparent, m.pair_exclude,
        m.pair_explicit, m.collision_mode)
    return m.replace(collision_pairs=ordered, ncon_max=ncon_max)


def _floats(s):
    return np.array([float(x) for x in s.split()], dtype=np.float64)


def _attr_f(e, name, default=None, n=None):
    v = e.get(name)
    if v is None:
        if default is None:
            return None
        out = np.array(default, dtype=np.float64)
    else:
        out = _floats(v)
    if n is not None:
        full = np.zeros(n)
        full[: min(out.size, n)] = out[:n]
        if out.size == 1 and n > 1:
            pass  # keep zero-padded (MJCF pads, does not broadcast most attrs)
        out = full
    return out


def _tri(e, name, autolimits, has_range):
    v = e.get(name)
    if v is None or v.lower() == "auto":
        return 1 if (autolimits and has_range) else 0
    return 1 if v.lower() in ("true", "1") else 0


def _assemble(root, comp, defaults_tree, bodies, jnts, geoms, sites, cams,
              meshes=None, hfields=None, opt=None):
    import jax.numpy as jnp
    from mujoco_ros_pkgs_tpu.core.mjcf import _apply_defaults, _quat_mul, _quat_rot, _quat_to_mat

    nbody = len(bodies)
    njnt = len(jnts)
    ngeom = len(geoms)
    nsite = len(sites)

    # ---------------- body topology ----------------
    body_parentid = [b.parentid for b in bodies]
    body_rootid = [0] * nbody
    for i in range(1, nbody):
        j = i
        while body_parentid[j] != 0:
            j = body_parentid[j]
        body_rootid[i] = j
    body_weldid = [0] * nbody
    for i in range(1, nbody):
        body_weldid[i] = i if bodies[i].joints else body_weldid[body_parentid[i]]

    body_mocapid = [-1] * nbody
    nmocap = 0
    for i, b in enumerate(bodies):
        if getattr(b, "mocap", False):
            body_mocapid[i] = nmocap
            nmocap += 1

    # ---------------- joint / dof layout ----------------
    jnt_qposadr, jnt_dofadr = [], []
    nq = nv = 0
    for j in jnts:
        jt = JointType(j.type)
        jnt_qposadr.append(nq)
        jnt_dofadr.append(nv)
        nq += jt.nq()
        nv += jt.nv()

    body_jntnum = [len(b.joints) for b in bodies]
    body_jntadr = [(b.joints[0] if b.joints else -1) for b in bodies]
    body_dofnum = [sum(JointType(jnts[ji].type).nv() for ji in b.joints)
                   for b in bodies]
    body_dofadr = [(jnt_dofadr[b.joints[0]] if b.joints else -1) for b in bodies]

    dof_bodyid, dof_jntid = [], []
    for ji, j in enumerate(jnts):
        for _ in range(JointType(j.type).nv()):
            dof_bodyid.append(j.bodyid)
            dof_jntid.append(ji)

    # dof_parentid: previous dof within the body's joint chain, else last dof of
    # nearest ancestor body with dofs, else -1
    dof_parentid = [-1] * nv
    last_body_dof = [-1] * nbody  # last dof index of each body after its joints
    for bi in range(1, nbody):
        # ancestor last dof
        anc = body_parentid[bi]
        while anc != 0 and last_body_dof[anc] < 0:
            anc = body_parentid[anc]
        prev = last_body_dof[anc] if anc != 0 else -1
        for ji in bodies[bi].joints:
            adr = jnt_dofadr[ji]
            for k in range(JointType(jnts[ji].type).nv()):
                dof_parentid[adr + k] = prev
                prev = adr + k
        last_body_dof[bi] = prev if bodies[bi].joints else -1

    # ---------------- qpos0 / qpos_spring ----------------
    qpos0 = np.zeros(nq)
    qpos_spring = np.zeros(nq)
    for ji, j in enumerate(jnts):
        adr = jnt_qposadr[ji]
        t = JointType(j.type)
        if t == JointType.FREE:
            if body_parentid[j.bodyid] != 0:
                raise ValueError("free joint must be on a child of world")
            qpos0[adr:adr + 3] = bodies[j.bodyid].pos
            qpos0[adr + 3:adr + 7] = bodies[j.bodyid].quat
            qpos_spring[adr:adr + 7] = qpos0[adr:adr + 7]
        elif t == JointType.BALL:
            qpos0[adr] = 1.0
            qpos_spring[adr] = 1.0
        else:
            qpos0[adr] = j.ref
            qpos_spring[adr] = j.springref

    # ---------------- subtree mass ----------------
    body_subtreemass = np.array([b.mass for b in bodies], dtype=np.float64)
    for i in range(nbody - 1, 0, -1):
        body_subtreemass[body_parentid[i]] += body_subtreemass[i]

    # ---------------- world FK at qpos0 (for equality refs) ----------------
    wpos = np.zeros((nbody, 3))
    wquat = np.tile(np.array([1.0, 0, 0, 0]), (nbody, 1))
    for i in range(1, nbody):
        p = body_parentid[i]
        wquat[i] = _quat_mul(wquat[p], bodies[i].quat)
        wpos[i] = wpos[p] + _quat_rot(bodies[i].pos, wquat[p])

    # ---------------- tendons (fixed + spatial) ----------------
    ten_elems = []
    for te in root.iter("tendon"):
        for fe in te:
            if fe.tag in ("fixed", "spatial"):
                ten_elems.append(fe)
    ntendon = len(ten_elems)
    tendon_adr, tendon_num, tendon_limited = [], [], []
    tendon_range = np.zeros((ntendon, 2))
    tendon_solref_lim = np.tile(np.array(_SOLREF), (ntendon, 1))
    tendon_solimp_lim = np.tile(np.array(_SOLIMP), (ntendon, 1))
    tendon_margin = np.zeros(ntendon)
    tendon_stiffness = np.zeros(ntendon)
    tendon_damping = np.zeros(ntendon)
    tendon_frictionloss = np.zeros(ntendon)
    tendon_lengthspring = np.full((ntendon, 2), -1.0)
    tendon_names = []
    wrap_type, wrap_objid, wrap_prm = [], [], []
    jnt_names_list = [j.name for j in jnts]
    for ti, fe in enumerate(ten_elems):
        fe = _apply_defaults(fe, defaults_tree.get("main", {}), "tendon")
        tendon_names.append(fe.get("name", ""))
        tendon_adr.append(len(wrap_type))
        cnt = 0
        _site_names = [s.name for s in sites]
        _geom_names = [g.name for g in geoms]
        for we in fe:
            if we.tag == "joint":          # fixed tendon entry
                wrap_type.append(int(WrapType.JOINT))
                wrap_objid.append(jnt_names_list.index(we.get("joint")))
                wrap_prm.append(float(we.get("coef")))
                cnt += 1
            elif we.tag == "site":         # spatial path via a site
                wrap_type.append(int(WrapType.SITE))
                try:
                    wrap_objid.append(_site_names.index(we.get("site")))
                except ValueError:
                    raise ValueError(
                        f"tendon '{fe.get('name', '')}': unknown site "
                        f"'{we.get('site')}'")
                wrap_prm.append(0.0)
                cnt += 1
            elif we.tag == "geom":         # sphere/cylinder wrap obstacle
                try:
                    gid = _geom_names.index(we.get("geom"))
                except ValueError:
                    raise ValueError(
                        f"tendon '{fe.get('name', '')}': unknown wrap geom "
                        f"'{we.get('geom')}'")
                gt = geoms[gid].type
                if gt == int(GeomType.SPHERE):
                    wrap_type.append(int(WrapType.SPHERE))
                elif gt == int(GeomType.CYLINDER):
                    wrap_type.append(int(WrapType.CYLINDER))
                else:
                    raise ValueError(
                        f"tendon '{fe.get('name', '')}': wrap geom "
                        f"'{we.get('geom')}' must be a sphere or cylinder")
                wrap_objid.append(gid)
                ss = we.get("sidesite")
                if ss is not None:
                    try:
                        wrap_prm.append(float(_site_names.index(ss)))
                    except ValueError:
                        raise ValueError(
                            f"tendon '{fe.get('name', '')}': unknown "
                            f"sidesite '{ss}'")
                else:
                    wrap_prm.append(-1.0)
                cnt += 1
            elif we.tag == "pulley":       # branch divisor
                wrap_type.append(int(WrapType.PULLEY))
                wrap_objid.append(-1)
                wrap_prm.append(float(we.get("divisor", "1")))
                cnt += 1
        tendon_num.append(cnt)
        tendon_limited.append(_tri(fe, "limited", comp.autolimits,
                                   fe.get("range") is not None))
        tendon_range[ti] = _attr_f(fe, "range", [0, 0])
        tendon_solref_lim[ti] = _attr_f(fe, "solreflimit", _SOLREF)
        tendon_solimp_lim[ti] = _attr_f(fe, "solimplimit", _SOLIMP)
        tendon_margin[ti] = float(fe.get("margin", "0"))
        tendon_stiffness[ti] = float(fe.get("stiffness", "0"))
        tendon_damping[ti] = float(fe.get("damping", "0"))
        tendon_frictionloss[ti] = float(fe.get("frictionloss", "0"))
        if fe.get("springlength") is not None:
            sl = _floats(fe.get("springlength"))
            tendon_lengthspring[ti] = sl if sl.size == 2 else np.array([sl[0], sl[0]])
    nwrap = len(wrap_type)

    # ---------------- actuators ----------------
    act_elems = []
    for ae in root.iter("actuator"):
        act_elems.extend(list(ae))
    nu = len(act_elems)
    a_trntype, a_dyntype, a_gaintype, a_biastype = [], [], [], []
    a_trnid, a_actadr, a_actnum = [], [], []
    a_ctrllimited, a_forcelimited = [], []
    a_dynprm = np.zeros((nu, 10))
    a_gainprm = np.zeros((nu, 10))
    a_biasprm = np.zeros((nu, 10))
    a_ctrlrange = np.zeros((nu, 2))
    a_forcerange = np.zeros((nu, 2))
    a_gear = np.zeros((nu, 6))
    a_actlimited = []
    a_actrange = np.zeros((nu, 2))
    a_lengthrange = np.zeros((nu, 2))
    actuator_names = []
    na = 0
    for ai, ae in enumerate(act_elems):
        tag = ae.tag
        ae = _apply_defaults(ae, defaults_tree.get(ae.get("class", "main"),
                                                   defaults_tree["main"]), tag)
        actuator_names.append(ae.get("name", ""))
        gear = _attr_f(ae, "gear", [1, 0, 0, 0, 0, 0], n=6)
        a_gear[ai] = gear
        dynprm = np.zeros(10); dynprm[0] = 1.0
        gainprm = np.zeros(10); gainprm[0] = 1.0
        biasprm = np.zeros(10)
        dyntype, gaintype, biastype = 0, 0, 0
        if tag == "motor":
            pass
        elif tag == "position":
            kp = float(ae.get("kp", "1"))
            kv = float(ae.get("kv", "0"))
            gainprm[0] = kp
            biastype = 1
            biasprm[1], biasprm[2] = -kp, -kv
        elif tag == "velocity":
            kv = float(ae.get("kv", "1"))
            gainprm[0] = kv
            biastype = 1
            biasprm[2] = -kv
        elif tag == "intvelocity":
            kp = float(ae.get("kp", "1"))
            gainprm[0] = kp
            biastype = 1
            biasprm[1] = -kp
            dyntype = 1  # integrator
        elif tag == "damper":
            kv = float(ae.get("kv", "1"))
            gaintype = 1
            gainprm[:3] = [0, 0, -kv]
        elif tag == "muscle":
            # <muscle> shortcut (MJCF reference defaults; curves in
            # ops/muscle.py are pinned against the oracle's mju_muscle*)
            dyntype, gaintype, biastype = 4, 2, 2
            tc = _attr_f(ae, "timeconst", [0.01, 0.04], n=2)
            dynprm[0], dynprm[1] = tc
            dynprm[2] = float(ae.get("tausmooth", "0"))
            rng = _attr_f(ae, "range", [0.75, 1.05], n=2)
            gainprm[0], gainprm[1] = rng
            for k, (nm, dv) in enumerate(
                    (("force", -1.0), ("scale", 200.0), ("lmin", 0.5),
                     ("lmax", 1.6), ("vmax", 1.5), ("fpmax", 1.3),
                     ("fvmax", 1.2)), start=2):
                gainprm[k] = float(ae.get(nm, dv))
            biasprm[:9] = gainprm[:9]
            if ae.get("ctrlrange") is None:
                ae.set("ctrlrange", "0 1")
        elif tag == "general":
            dyntype = {"none": 0, "integrator": 1, "filter": 2,
                       "filterexact": 3, "muscle": 4}[ae.get("dyntype", "none")]
            gaintype = {"fixed": 0, "affine": 1, "muscle": 2}[ae.get("gaintype", "fixed")]
            biastype = {"none": 0, "affine": 1, "muscle": 2}[ae.get("biastype", "none")]
            for nm, arr in (("dynprm", dynprm), ("gainprm", gainprm),
                            ("biasprm", biasprm)):
                if ae.get(nm) is not None:
                    v = _floats(ae.get(nm))
                    arr[: v.size] = v
        else:
            raise ValueError(f"unsupported actuator <{tag}>")
        a_dynprm[ai], a_gainprm[ai], a_biasprm[ai] = dynprm, gainprm, biasprm
        a_dyntype.append(dyntype); a_gaintype.append(gaintype); a_biastype.append(biastype)
        if ae.get("joint") is not None:
            a_trntype.append(int(TrnType.JOINT))
            a_trnid.append((jnt_names_list.index(ae.get("joint")), -1))
        elif ae.get("tendon") is not None:
            a_trntype.append(int(TrnType.TENDON))
            a_trnid.append((tendon_names.index(ae.get("tendon")), -1))
        elif ae.get("site") is not None:
            a_trntype.append(int(TrnType.SITE))
            a_trnid.append(([s.name for s in sites].index(ae.get("site")), -1))
        else:
            raise ValueError("actuator needs joint/tendon/site transmission")
        a_ctrllimited.append(_tri(ae, "ctrllimited", comp.autolimits,
                                  ae.get("ctrlrange") is not None))
        a_forcelimited.append(_tri(ae, "forcelimited", comp.autolimits,
                                   ae.get("forcerange") is not None))
        a_ctrlrange[ai] = _attr_f(ae, "ctrlrange", [0, 0])
        a_forcerange[ai] = _attr_f(ae, "forcerange", [0, 0])
        a_actlimited.append(_tri(ae, "actlimited", comp.autolimits,
                                 ae.get("actrange") is not None))
        a_actrange[ai] = _attr_f(ae, "actrange", [0, 0])
        a_lengthrange[ai] = _attr_f(ae, "lengthrange", [0, 0])
        # muscle actuators without lengthrange are filled in post-assembly
        # by core/lengthrange.py (the mj_setLengthRange analogue)
        if dyntype != 0:
            a_actadr.append(na); a_actnum.append(1); na += 1
        else:
            a_actadr.append(-1); a_actnum.append(0)

    # ---------------- equality constraints ----------------
    body_names_list = [b.name for b in bodies]
    eq_elems = []
    for ee in root.iter("equality"):
        eq_elems.extend(list(ee))
    neq = len(eq_elems)
    eq_type, eq_obj1id, eq_obj2id, eq_active0, eq_names = [], [], [], [], []
    eq_solref = np.tile(np.array(_SOLREF), (neq, 1))
    eq_solimp = np.tile(np.array(_SOLIMP), (neq, 1))
    eq_data = np.zeros((neq, 11))
    eq_data[:, 10] = 1.0  # torquescale column defaults to 1 for all types
    for ei, ee in enumerate(eq_elems):
        ee = _apply_defaults(ee, defaults_tree.get("main", {}), "equality")
        eq_names.append(ee.get("name", ""))
        eq_solref[ei] = _attr_f(ee, "solref", _SOLREF)
        eq_solimp[ei] = _attr_f(ee, "solimp", _SOLIMP)
        eq_active0.append(1 if ee.get("active", "true").lower() in ("true", "1") else 0)
        if ee.tag == "connect":
            eq_type.append(int(EqType.CONNECT))
            b1 = body_names_list.index(ee.get("body1"))
            b2 = body_names_list.index(ee.get("body2")) if ee.get("body2") else 0
            eq_obj1id.append(b1); eq_obj2id.append(b2)
            anchor = _attr_f(ee, "anchor", [0, 0, 0])
            eq_data[ei, 0:3] = anchor
            # world point of anchor at qpos0, expressed in body2 frame
            wp = wpos[b1] + _quat_rot(anchor, wquat[b1])
            eq_data[ei, 3:6] = _quat_to_mat(wquat[b2]).T @ (wp - wpos[b2])
        elif ee.tag == "weld":
            eq_type.append(int(EqType.WELD))
            b1 = body_names_list.index(ee.get("body1"))
            b2 = body_names_list.index(ee.get("body2")) if ee.get("body2") else 0
            eq_obj1id.append(b1); eq_obj2id.append(b2)
            anchor = _attr_f(ee, "anchor", [0, 0, 0])
            eq_data[ei, 0:3] = anchor
            if ee.get("relpose") is not None:
                rp = _floats(ee.get("relpose"))
                qn = np.linalg.norm(rp[3:7])
                if qn > 1e-15:
                    rp[3:7] /= qn
                eq_data[ei, 3:10] = rp
            else:
                # zero quat → compiler stores pose of BODY2 in BODY1's frame
                # at qpos0 (verified vs oracle: tests/test_constraint_parity)
                R1T = _quat_to_mat(wquat[b1]).T
                eq_data[ei, 3:6] = R1T @ (wpos[b2] - wpos[b1])
                q1 = wquat[b1].copy(); q2 = wquat[b2].copy()
                q1inv = q1 * np.array([1.0, -1, -1, -1])
                eq_data[ei, 6:10] = _quat_mul(q1inv, q2)
            eq_data[ei, 10] = float(ee.get("torquescale", "1"))
        elif ee.tag == "joint":
            eq_type.append(int(EqType.JOINT))
            eq_obj1id.append(jnt_names_list.index(ee.get("joint1")))
            eq_obj2id.append(jnt_names_list.index(ee.get("joint2"))
                             if ee.get("joint2") else -1)
            eq_data[ei, 0:5] = _attr_f(ee, "polycoef", [0, 1, 0, 0, 0], n=5)
        elif ee.tag == "tendon":
            eq_type.append(int(EqType.TENDON))
            eq_obj1id.append(tendon_names.index(ee.get("tendon1")))
            eq_obj2id.append(tendon_names.index(ee.get("tendon2"))
                             if ee.get("tendon2") else -1)
            eq_data[ei, 0:5] = _attr_f(ee, "polycoef", [0, 1, 0, 0, 0], n=5)
        else:
            raise ValueError(f"unsupported equality <{ee.tag}>")

    # ---------------- sensors ----------------
    site_names_list = [s.name for s in sites]
    geom_names_list = [g.name for g in geoms]
    sen_elems = []
    for se in root.iter("sensor"):
        sen_elems.extend(list(se))
    _SDIM = {
        SensorType.TOUCH: 1, SensorType.ACCELEROMETER: 3, SensorType.VELOCIMETER: 3,
        SensorType.GYRO: 3, SensorType.FORCE: 3, SensorType.TORQUE: 3,
        SensorType.MAGNETOMETER: 3, SensorType.RANGEFINDER: 1,
        SensorType.JOINTPOS: 1, SensorType.JOINTVEL: 1,
        SensorType.TENDONPOS: 1, SensorType.TENDONVEL: 1,
        SensorType.ACTUATORPOS: 1, SensorType.ACTUATORVEL: 1,
        SensorType.ACTUATORFRC: 1, SensorType.BALLQUAT: 4, SensorType.BALLANGVEL: 3,
        SensorType.JOINTLIMITPOS: 1, SensorType.JOINTLIMITVEL: 1,
        SensorType.JOINTLIMITFRC: 1, SensorType.TENDONLIMITPOS: 1,
        SensorType.TENDONLIMITVEL: 1, SensorType.TENDONLIMITFRC: 1,
        SensorType.FRAMEPOS: 3, SensorType.FRAMEQUAT: 4, SensorType.FRAMEXAXIS: 3,
        SensorType.FRAMEYAXIS: 3, SensorType.FRAMEZAXIS: 3,
        SensorType.FRAMELINVEL: 3, SensorType.FRAMEANGVEL: 3,
        SensorType.FRAMELINACC: 3, SensorType.FRAMEANGACC: 3,
        SensorType.SUBTREECOM: 3, SensorType.SUBTREELINVEL: 3,
        SensorType.SUBTREEANGMOM: 3, SensorType.CLOCK: 1,
    }
    _OBJ = {"body": ObjType.BODY, "xbody": ObjType.XBODY, "joint": ObjType.JOINT,
            "geom": ObjType.GEOM, "site": ObjType.SITE, "camera": ObjType.CAMERA}

    def _resolve(objtype: ObjType, name: str) -> int:
        if objtype in (ObjType.BODY, ObjType.XBODY):
            return body_names_list.index(name)
        if objtype == ObjType.JOINT:
            return jnt_names_list.index(name)
        if objtype == ObjType.GEOM:
            return geom_names_list.index(name)
        if objtype == ObjType.SITE:
            return site_names_list.index(name)
        raise ValueError(f"cannot resolve {objtype} {name}")

    nsensor = len(sen_elems)
    s_type, s_objtype, s_objid, s_reftype, s_refid, s_adr, s_dim = [], [], [], [], [], [], []
    s_cutoff = np.zeros(nsensor)
    s_noise = np.zeros(nsensor)
    sensor_names = []
    adr = 0
    for si, se in enumerate(sen_elems):
        st = SensorType[se.tag.upper()]
        sensor_names.append(se.get("name", ""))
        s_type.append(int(st))
        objtype, objid = int(ObjType.UNKNOWN), -1
        if se.get("site") is not None:
            objtype, objid = int(ObjType.SITE), site_names_list.index(se.get("site"))
        elif se.get("joint") is not None:
            objtype, objid = int(ObjType.JOINT), jnt_names_list.index(se.get("joint"))
        elif se.get("tendon") is not None:
            objtype, objid = int(ObjType.UNKNOWN) + 100, tendon_names.index(se.get("tendon"))
        elif se.get("actuator") is not None:
            objtype, objid = int(ObjType.UNKNOWN) + 200, actuator_names.index(se.get("actuator"))
        elif se.get("body") is not None:
            objtype, objid = int(ObjType.BODY), body_names_list.index(se.get("body"))
        elif se.get("objtype") is not None:
            ot = _OBJ[se.get("objtype")]
            objtype, objid = int(ot), _resolve(ot, se.get("objname"))
        s_objtype.append(objtype); s_objid.append(objid)
        if se.get("reftype") is not None:
            rt = _OBJ[se.get("reftype")]
            s_reftype.append(int(rt)); s_refid.append(_resolve(rt, se.get("refname")))
        elif se.get("refname") is not None:
            # MJCF allows refname with implied type per sensor; default xbody
            s_reftype.append(int(ObjType.XBODY))
            s_refid.append(body_names_list.index(se.get("refname")))
        else:
            s_reftype.append(int(ObjType.UNKNOWN)); s_refid.append(-1)
        s_cutoff[si] = float(se.get("cutoff", "0"))
        s_noise[si] = float(se.get("noise", "0"))
        s_adr.append(adr)
        d = _SDIM[st]
        s_dim.append(d)
        adr += d
    nsensordata = adr

    # ---------------- keyframes ----------------
    key_elems = []
    for ke in root.iter("keyframe"):
        key_elems.extend([k for k in ke if k.tag == "key"])
    nkey = len(key_elems)
    key_time = np.zeros(max(nkey, 0))
    key_qpos = np.tile(qpos0, (nkey, 1)) if nkey else np.zeros((0, nq))
    key_qvel = np.zeros((nkey, nv))
    key_act = np.zeros((nkey, na))
    key_ctrl = np.zeros((nkey, nu))
    key_mpos = np.zeros((nkey, max(nmocap, 0) * 3))
    key_mquat = np.tile(np.array([1.0, 0, 0, 0]), (nkey, max(nmocap, 1)))[:, :nmocap * 4] \
        if nkey else np.zeros((0, nmocap * 4))
    key_names = []
    for ki, ke in enumerate(key_elems):
        key_names.append(ke.get("name", ""))
        key_time[ki] = float(ke.get("time", "0"))
        for nm, arr, width in (("qpos", key_qpos, nq), ("qvel", key_qvel, nv),
                               ("act", key_act, na), ("ctrl", key_ctrl, nu),
                               ("mpos", key_mpos, nmocap * 3),
                               ("mquat", key_mquat, nmocap * 4)):
            if ke.get(nm) is not None:
                v = _floats(ke.get(nm))
                arr[ki, : v.size] = v

    # ---------------- collision pair table ----------------
    # (built by collision_pair_table below; provenance stored on the Model so
    # the table can be rebuilt on runtime geom-type changes)
    filterparent = not bool(opt["disableflags"] & types.DisableBit.FILTERPARENT)
    excludes = set()
    explicit_pairs = []
    for ce in root.iter("contact"):
        for pe in ce:
            if pe.tag == "exclude":
                excludes.add((body_names_list.index(pe.get("body1")),
                              body_names_list.index(pe.get("body2"))))
            elif pe.tag == "pair":
                explicit_pairs.append((geom_names_list.index(pe.get("geom1")),
                                       geom_names_list.index(pe.get("geom2"))))

    ordered, ncon_max = collision_pair_table(
        geom_type=tuple(g.type for g in geoms),
        geom_contype=tuple(g.contype for g in geoms),
        geom_conaffinity=tuple(g.conaffinity for g in geoms),
        geom_bodyid=tuple(g.bodyid for g in geoms),
        body_weldid=tuple(body_weldid),
        body_parentid=tuple(body_parentid),
        filterparent=filterparent,
        excludes=tuple(sorted(excludes)),
        explicit_pairs=tuple(explicit_pairs),
        collision_mode=opt["collision_mode"])

    # ---------------- build Model ----------------
    def J(x):
        return jnp.asarray(np.asarray(x, dtype=np.float64))

    # mesh hulls → one padded (nmesh, max_vert, 3) block; padding repeats the
    # first vertex so the support argmax (ops/gjk.py) is unaffected
    mesh_list = list(meshes.values()) if meshes else []
    if mesh_list:
        maxv = max(mv.verts.shape[0] for mv in mesh_list)
        mesh_vert_padded = np.stack([
            np.concatenate([mv.verts,
                            np.tile(mv.verts[:1], (maxv - mv.verts.shape[0], 1))])
            for mv in mesh_list])
    else:
        mesh_vert_padded = np.zeros((0, 0, 3))

    hf_list = list(hfields.values()) if hfields else []
    if hf_list:
        mr = max(h.nrow for h in hf_list)
        mc = max(h.ncol for h in hf_list)
        hf_data = np.zeros((len(hf_list), mr, mc))
        for k, h in enumerate(hf_list):
            hf_data[k, : h.nrow, : h.ncol] = h.data
        hf_size = np.stack([h.size for h in hf_list])
    else:
        hf_data = np.zeros((0, 0, 0))
        hf_size = np.zeros((0, 4))

    option = types.Option(
        timestep=J(opt["timestep"]), gravity=J(opt["gravity"]), wind=J(opt["wind"]),
        magnetic=J(opt["magnetic"]), density=J(opt["density"]),
        viscosity=J(opt["viscosity"]), impratio=J(opt["impratio"]),
        o_margin=J(opt["o_margin"]), o_solref=J(opt["o_solref"]),
        o_solimp=J(opt["o_solimp"]), tolerance=J(opt["tolerance"]),
        ls_tolerance=J(opt["ls_tolerance"]), integrator=opt["integrator"],
        cone=opt["cone"], solver=opt["solver"], iterations=opt["iterations"],
        ls_iterations=opt["ls_iterations"], disableflags=opt["disableflags"])

    m = types.Model(
        nq=nq, nv=nv, nu=nu, na=na, nbody=nbody, njnt=njnt, ngeom=ngeom,
        nsite=nsite, nmocap=nmocap, neq=neq, ntendon=ntendon, nwrap=nwrap,
        nsensor=nsensor, nsensordata=nsensordata, nkey=nkey, opt=option,
        qpos0=J(qpos0), qpos_spring=J(qpos_spring),
        body_parentid=tuple(body_parentid), body_rootid=tuple(body_rootid),
        body_weldid=tuple(body_weldid),
        body_jntnum=tuple(body_jntnum), body_jntadr=tuple(body_jntadr),
        body_dofnum=tuple(body_dofnum), body_dofadr=tuple(body_dofadr),
        body_geomnum=tuple(len(b.geoms) for b in bodies),
        body_geomadr=tuple((b.geoms[0] if b.geoms else -1) for b in bodies),
        body_mocapid=tuple(body_mocapid),
        body_pos=J(np.stack([b.pos for b in bodies])),
        body_quat=J(np.stack([b.quat for b in bodies])),
        body_ipos=J(np.stack([b.ipos for b in bodies])),
        body_iquat=J(np.stack([b.iquat for b in bodies])),
        body_mass=J(np.array([b.mass for b in bodies])),
        body_subtreemass=J(body_subtreemass),
        body_inertia=J(np.stack([b.inertia for b in bodies])),
        body_invweight0=J(np.zeros((nbody, 2))),
        body_gravcomp=J(np.array([b.gravcomp for b in bodies])),
        jnt_type=tuple(j.type for j in jnts),
        jnt_qposadr=tuple(jnt_qposadr), jnt_dofadr=tuple(jnt_dofadr),
        jnt_bodyid=tuple(j.bodyid for j in jnts),
        jnt_limited=tuple(j.limited for j in jnts),
        jnt_actfrclimited=tuple(j.actfrclimited for j in jnts),
        jnt_pos=J(np.stack([j.pos for j in jnts]) if njnt else np.zeros((0, 3))),
        jnt_axis=J(np.stack([j.axis for j in jnts]) if njnt else np.zeros((0, 3))),
        jnt_stiffness=J(np.array([j.stiffness for j in jnts])),
        jnt_range=J(np.stack([j.range for j in jnts]) if njnt else np.zeros((0, 2))),
        jnt_actfrcrange=J(np.stack([j.actfrcrange for j in jnts]) if njnt else np.zeros((0, 2))),
        jnt_solref=J(np.stack([j.solref for j in jnts]) if njnt else np.zeros((0, 2))),
        jnt_solimp=J(np.stack([j.solimp for j in jnts]) if njnt else np.zeros((0, 5))),
        jnt_margin=J(np.array([j.margin for j in jnts])),
        dof_bodyid=tuple(dof_bodyid), dof_jntid=tuple(dof_jntid),
        dof_parentid=tuple(dof_parentid),
        dof_armature=J(np.array([jnts[j].armature for j in dof_jntid])),
        dof_damping=J(np.array([jnts[j].damping for j in dof_jntid])),
        dof_invweight0=J(np.zeros(nv)),
        dof_frictionloss=J(np.array([jnts[j].frictionloss for j in dof_jntid])),
        dof_solref=J(np.stack([jnts[j].solref_fri for j in dof_jntid]) if nv else np.zeros((0, 2))),
        dof_solimp=J(np.stack([jnts[j].solimp_fri for j in dof_jntid]) if nv else np.zeros((0, 5))),
        geom_type=tuple(g.type for g in geoms),
        geom_bodyid=tuple(g.bodyid for g in geoms),
        geom_contype=tuple(g.contype for g in geoms),
        geom_conaffinity=tuple(g.conaffinity for g in geoms),
        geom_condim=tuple(g.condim for g in geoms),
        geom_priority=tuple(g.priority for g in geoms),
        geom_size=J(np.stack([g.size for g in geoms]) if ngeom else np.zeros((0, 3))),
        geom_rbound=J(np.array([g.rbound for g in geoms])),
        geom_pos=J(np.stack([g.pos for g in geoms]) if ngeom else np.zeros((0, 3))),
        geom_quat=J(np.stack([g.quat for g in geoms]) if ngeom else np.zeros((0, 4))),
        geom_friction=J(np.stack([g.friction for g in geoms]) if ngeom else np.zeros((0, 3))),
        geom_solmix=J(np.array([g.solmix for g in geoms])),
        geom_solref=J(np.stack([g.solref for g in geoms]) if ngeom else np.zeros((0, 2))),
        geom_solimp=J(np.stack([g.solimp for g in geoms]) if ngeom else np.zeros((0, 5))),
        geom_margin=J(np.array([g.margin for g in geoms])),
        geom_gap=J(np.array([g.gap for g in geoms])),
        geom_dataid=tuple(getattr(g, "meshid", -1) for g in geoms),
        geom_fluid=J(np.stack([getattr(g, "fluid", np.zeros(12))
                               for g in geoms])
                     if ngeom else np.zeros((0, 12))),
        geom_fluid_active=tuple(
            int(getattr(g, "fluid", np.zeros(12))[0] > 0) for g in geoms),
        nmesh=len(mesh_list),
        mesh_vertnum=tuple(mv.verts.shape[0] for mv in mesh_list),
        mesh_names=tuple(mv.name for mv in mesh_list),
        mesh_vert=J(mesh_vert_padded),
        nhfield=len(hf_list),
        hfield_nrow=tuple(h.nrow for h in hf_list),
        hfield_ncol=tuple(h.ncol for h in hf_list),
        hfield_names=tuple(h.name for h in hf_list),
        hfield_size=J(hf_size),
        hfield_data=J(hf_data),
        site_bodyid=tuple(s.bodyid for s in sites),
        site_pos=J(np.stack([s.pos for s in sites]) if nsite else np.zeros((0, 3))),
        site_quat=J(np.stack([s.quat for s in sites]) if nsite else np.zeros((0, 4))),
        ncam=len(cams),
        cam_bodyid=tuple(c.bodyid for c in cams),
        cam_names=tuple(c.name for c in cams),
        cam_pos=J(np.stack([c.pos for c in cams]) if cams else np.zeros((0, 3))),
        cam_quat=J(np.stack([c.quat for c in cams]) if cams else np.zeros((0, 4))),
        cam_fovy=J(np.array([c.fovy for c in cams])),
        geom_rgba=J(np.stack([g.rgba for g in geoms]) if ngeom else np.zeros((0, 4))),
        eq_type=tuple(eq_type), eq_obj1id=tuple(eq_obj1id),
        eq_obj2id=tuple(eq_obj2id), eq_active0=tuple(eq_active0),
        eq_solref=J(eq_solref), eq_solimp=J(eq_solimp), eq_data=J(eq_data),
        tendon_adr=tuple(tendon_adr), tendon_num=tuple(tendon_num),
        tendon_limited=tuple(tendon_limited),
        tendon_range=J(tendon_range), tendon_solref_lim=J(tendon_solref_lim),
        tendon_solimp_lim=J(tendon_solimp_lim), tendon_margin=J(tendon_margin),
        tendon_stiffness=J(tendon_stiffness), tendon_damping=J(tendon_damping),
        tendon_frictionloss=J(tendon_frictionloss),
        tendon_lengthspring=J(tendon_lengthspring),
        tendon_length0=J(np.zeros(ntendon)),
        tendon_invweight0=J(np.zeros(ntendon)),
        wrap_type=tuple(wrap_type), wrap_objid=tuple(wrap_objid),
        wrap_prm=J(np.array(wrap_prm) if wrap_prm else np.zeros(0)),
        # static spatial-tendon structure: sidesite ids for sphere/cylinder
        # entries (else -1), pulley divisors (else 1.0)
        wrap_sidesite=tuple(
            int(p) if t in (int(WrapType.SPHERE), int(WrapType.CYLINDER))
            else -1 for t, p in zip(wrap_type, wrap_prm)),
        wrap_divisor=tuple(
            float(p) if t == int(WrapType.PULLEY) else 1.0
            for t, p in zip(wrap_type, wrap_prm)),
        actuator_trntype=tuple(a_trntype), actuator_dyntype=tuple(a_dyntype),
        actuator_gaintype=tuple(a_gaintype), actuator_biastype=tuple(a_biastype),
        actuator_trnid=tuple(a_trnid), actuator_actadr=tuple(a_actadr),
        actuator_actnum=tuple(a_actnum),
        actuator_ctrllimited=tuple(a_ctrllimited),
        actuator_forcelimited=tuple(a_forcelimited),
        actuator_dynprm=J(a_dynprm), actuator_gainprm=J(a_gainprm),
        actuator_biasprm=J(a_biasprm), actuator_ctrlrange=J(a_ctrlrange),
        actuator_forcerange=J(a_forcerange), actuator_gear=J(a_gear),
        actuator_actlimited=tuple(a_actlimited),
        actuator_actrange=J(a_actrange),
        actuator_lengthrange=J(a_lengthrange),
        actuator_acc0=J(np.zeros(nu)),
        sensor_type=tuple(s_type), sensor_objtype=tuple(s_objtype),
        sensor_objid=tuple(s_objid), sensor_reftype=tuple(s_reftype),
        sensor_refid=tuple(s_refid), sensor_adr=tuple(s_adr),
        sensor_dim=tuple(s_dim), sensor_cutoff=J(s_cutoff), sensor_noise=J(s_noise),
        key_time=J(key_time), key_qpos=J(key_qpos), key_qvel=J(key_qvel),
        key_act=J(key_act), key_ctrl=J(key_ctrl), key_mpos=J(key_mpos),
        key_mquat=J(key_mquat),
        name=root.get("model", ""),
        body_names=tuple(body_names_list),
        jnt_names=tuple(jnt_names_list),
        geom_names=tuple(geom_names_list),
        site_names=tuple(site_names_list),
        eq_names=tuple(eq_names), tendon_names=tuple(tendon_names),
        actuator_names=tuple(actuator_names),
        sensor_names=tuple(sensor_names), key_names=tuple(key_names),
        collision_pairs=tuple(ordered), ncon_max=ncon_max,
        pair_exclude=tuple(sorted(excludes)),
        pair_explicit=tuple(explicit_pairs),
        collision_mode=opt["collision_mode"],
        dof_floss_adr=tuple(v for v in range(nv)
                            if jnts[dof_jntid[v]].frictionloss > 0),
        tendon_floss_adr=tuple(t for t in range(ntendon)
                               if tendon_frictionloss[t] > 0),
        has_damping=bool(any(jnts[j].damping > 0 for j in dof_jntid)),
        has_fluid=bool(opt["density"] > 0 or opt["viscosity"] > 0
                       or np.any(np.asarray(opt["wind"]) != 0)),
        dof_simple=compute_simple_dofs(
            tuple(body_parentid), tuple(body_dofnum), tuple(body_dofadr),
            tuple(j.bodyid for j in jnts), tuple(j.type for j in jnts),
            np.stack([b.ipos for b in bodies]),
            np.stack([b.iquat for b in bodies])),
    )

    from mujoco_ros_pkgs_tpu.core import constants
    return constants.set_constants(m)
