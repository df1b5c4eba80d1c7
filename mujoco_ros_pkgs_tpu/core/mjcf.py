"""MJCF parser + model compiler targeting MuJoCo 2.3.7 semantics.

Host-side (numpy) compiler producing a `Model` pytree. This is a ground-up
implementation of the subset of the MJCF schema exercised by the reference
server's worlds and tests (mujoco_ros/test/*.xml, mujoco_ros_sensors/test/*.xml)
plus what RL-scale workloads need: bodies/joints/geoms/sites, defaults classes,
inertia-from-geom, actuators (motor/position/velocity/general), fixed tendons,
equality constraints (connect/weld/joint/tendon), sensors, keyframes.

It also accepts 2.3.7-era attributes that MuJoCo 3.x rejects (e.g.
`option/collision="all"`, mujoco_ros/test/pendulum_world.xml:2) so the
reference worlds load unmodified.

Derived quantities that require dynamics at qpos0 (dof_invweight0,
body_invweight0, tendon_invweight0/length0, actuator_acc0) are computed in
core/constants.py (mj_setConst analogue) using our own smooth dynamics.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Any, Dict, List, Optional

import numpy as np

from mujoco_ros_pkgs_tpu.core import types
from mujoco_ros_pkgs_tpu.core.types import (
    BiasType, DynType, EqType, GainType, GeomType, IntegratorType, JointType,
    ObjType, SensorType, TrnType, WrapType,
)

_SOLREF = (0.02, 1.0)
_SOLIMP = (0.9, 0.95, 0.001, 0.5, 2.0)


# ---------------------------------------------------------------------------
# parsing helpers
# ---------------------------------------------------------------------------

def _floats(s: str) -> np.ndarray:
    return np.array([float(x) for x in s.split()], dtype=np.float64)


def _attr_f(e: ET.Element, name: str, default=None, n: Optional[int] = None):
    """Parse a float-array attribute. Partial values overlay onto the default
    prefix-wise (MuJoCo semantics: size="0.05" -> (0.05, 0, 0), friction="1"
    -> (1, 0.005, 0.0001)); no broadcasting."""
    v = e.get(name)
    if v is None:
        if default is None:
            return None
        out = np.array(default, dtype=np.float64)
        if n is not None and out.size < n:
            out = np.concatenate([out, np.zeros(n - out.size)])
        return out
    parsed = _floats(v)
    if n is None:
        return parsed
    base = np.array(default, dtype=np.float64) if default is not None else np.zeros(n)
    if base.size < n:
        base = np.concatenate([base, np.zeros(n - base.size)])
    out = base.copy()
    out[: min(parsed.size, n)] = parsed[:n]
    return out


def _attr_s(e: ET.Element, name: str, default: str = "") -> str:
    return e.get(name, default)


def _attr_b(e: ET.Element, name: str, default: bool) -> bool:
    v = e.get(name)
    if v is None:
        return default
    return v.lower() in ("true", "1")


_TRISTATE = {"true": 1, "1": 1, "false": 0, "0": 0, "auto": 2}


def _attr_tri(e: ET.Element, name: str, default: int = 2) -> int:
    v = e.get(name)
    if v is None:
        return default
    return _TRISTATE[v.lower()]


class _Compiler:
    """Parsed <compiler> settings."""

    def __init__(self, e: Optional[ET.Element]):
        self.angle = "degree"
        self.eulerseq = "xyz"
        self.autolimits = True
        self.inertiafromgeom = "auto"
        self.boundmass = 0.0
        self.boundinertia = 0.0
        self.balanceinertia = False
        self.settotalmass = -1.0
        self.meshdir = ""
        if e is not None:
            self.meshdir = _attr_s(e, "meshdir", "")
            self.angle = _attr_s(e, "angle", self.angle)
            self.eulerseq = _attr_s(e, "eulerseq", self.eulerseq)
            self.autolimits = _attr_b(e, "autolimits", self.autolimits)
            self.inertiafromgeom = _attr_s(e, "inertiafromgeom", self.inertiafromgeom)
            self.boundmass = float(_attr_s(e, "boundmass", "0"))
            self.boundinertia = float(_attr_s(e, "boundinertia", "0"))
            self.balanceinertia = _attr_b(e, "balanceinertia", False)
            self.settotalmass = float(_attr_s(e, "settotalmass", "-1"))

    def ang(self, x):
        """Convert parsed angles to radians if compiler angle="degree"."""
        if self.angle == "degree":
            return np.asarray(x) * np.pi / 180.0
        return np.asarray(x)


# ---------------------------------------------------------------------------
# quaternion helpers (host-side numpy; conventions match ops/math.py)
# ---------------------------------------------------------------------------

def _quat_mul(u, v):
    return np.array([
        u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
        u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
        u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
        u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0],
    ])


def _quat_rot(v, q):
    u, w = q[1:4], q[0]
    c = np.cross(u, v)
    return v + 2.0 * (w * c + np.cross(u, c))


def _quat_to_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _mat_to_quat(m):
    tr = np.trace(m)
    if tr > 0:
        s = np.sqrt(tr + 1.0) * 2
        q = np.array([0.25 * s, (m[2, 1] - m[1, 2]) / s,
                      (m[0, 2] - m[2, 0]) / s, (m[1, 0] - m[0, 1]) / s])
    elif m[0, 0] > m[1, 1] and m[0, 0] > m[2, 2]:
        s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
        q = np.array([(m[2, 1] - m[1, 2]) / s, 0.25 * s,
                      (m[0, 1] + m[1, 0]) / s, (m[0, 2] + m[2, 0]) / s])
    elif m[1, 1] > m[2, 2]:
        s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
        q = np.array([(m[0, 2] - m[2, 0]) / s, (m[0, 1] + m[1, 0]) / s,
                      0.25 * s, (m[1, 2] + m[2, 1]) / s])
    else:
        s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
        q = np.array([(m[1, 0] - m[0, 1]) / s, (m[0, 2] + m[2, 0]) / s,
                      (m[1, 2] + m[2, 1]) / s, 0.25 * s])
    q = q / np.linalg.norm(q)
    return q if q[0] >= 0 else -q


def _axis_angle_quat(axis, angle):
    axis = np.asarray(axis, dtype=np.float64)
    n = np.linalg.norm(axis)
    if n < 1e-15:
        return np.array([1.0, 0, 0, 0])
    axis = axis / n
    return np.concatenate([[np.cos(angle / 2)], axis * np.sin(angle / 2)])


def _principal_inertia(full: np.ndarray):
    """Diagonalize a full 3x3 inertia with the MINIMAL rotation from the input
    frame (libmujoco keeps geom-frame axis order rather than sorting
    eigenvalues — verified against the oracle; see tests/test_compile_parity).

    Returns (diag(3,), quat(4,)).
    """
    w, V = np.linalg.eigh(full)
    # choose the column permutation whose rotation is closest to identity
    import itertools
    best, best_score = None, -np.inf
    for perm in itertools.permutations(range(3)):
        score = sum(abs(V[i, perm[i]]) for i in range(3))
        if score > best_score:
            best_score, best = score, perm
    V = V[:, list(best)]
    w = w[list(best)]
    # sign-fix: diagonal entries positive
    for i in range(3):
        if V[i, i] < 0:
            V[:, i] *= -1
    if np.linalg.det(V) < 0:
        # flip the axis with the smallest diagonal alignment
        i = int(np.argmin(np.abs(np.diag(V))))
        V[:, i] *= -1
    return w, _mat_to_quat(V)


def _z2quat(vec: np.ndarray, degenerate_identity: bool = True) -> np.ndarray:
    """Minimal rotation taking +z to vec (mjuu_z2quat semantics, verified
    against the oracle): the FROMTO path returns identity whenever the cross
    product vanishes (including antiparallel — harmless for the z-symmetric
    geoms fromto applies to), while the ZAXIS attribute path falls back to a
    180-degree rotation about x for the antiparallel case."""
    z = vec / np.linalg.norm(vec)
    axis = np.cross([0.0, 0, 1], z)
    s = np.linalg.norm(axis)
    if s < 1e-10:
        if degenerate_identity or z[2] > 0:
            return np.array([1.0, 0, 0, 0])
        return _axis_angle_quat(np.array([1.0, 0, 0]), np.pi)
    return _axis_angle_quat(axis, np.arctan2(s, z[2]))


def _orientation(e: ET.Element, comp: _Compiler) -> np.ndarray:
    """Resolve MJCF frame orientation: quat | axisangle | euler | zaxis | xyaxes."""
    if e.get("axisangle") is not None:
        v = _floats(e.get("axisangle"))
        return _axis_angle_quat(v[:3], float(comp.ang(v[3])))
    if e.get("euler") is not None:
        eul = comp.ang(_floats(e.get("euler")))
        q = np.array([1.0, 0, 0, 0])
        axes = {"x": [1.0, 0, 0], "y": [0, 1.0, 0], "z": [0, 0, 1.0]}
        for i, ax in enumerate(comp.eulerseq):
            qi = _axis_angle_quat(axes[ax.lower()], eul[i])
            q = _quat_mul(q, qi) if ax.islower() else _quat_mul(qi, q)
        return q
    if e.get("zaxis") is not None:
        return _z2quat(_floats(e.get("zaxis")), degenerate_identity=False)
    if e.get("xyaxes") is not None:
        v = _floats(e.get("xyaxes"))
        x = v[:3] / np.linalg.norm(v[:3])
        y = v[3:6] - x * np.dot(x, v[3:6])
        y = y / np.linalg.norm(y)
        z = np.cross(x, y)
        return _mat_to_quat(np.stack([x, y, z], axis=1))
    q = _attr_f(e, "quat", [1.0, 0, 0, 0])
    return q / np.linalg.norm(q)


# ---------------------------------------------------------------------------
# defaults tree
# ---------------------------------------------------------------------------

_DEFAULT_FIELDS = ("joint", "geom", "site", "tendon", "equality", "motor",
                   "position", "velocity", "general", "pair")


def _collect_defaults(root: ET.Element) -> Dict[str, Dict[str, Dict[str, str]]]:
    """Flatten the <default> class tree into {class: {elemtype: {attr: val}}}."""
    out: Dict[str, Dict[str, Dict[str, str]]] = {}

    def walk(e: ET.Element, inherited: Dict[str, Dict[str, str]]):
        cls = e.get("class", "main")
        merged = {k: dict(v) for k, v in inherited.items()}
        for child in e:
            if child.tag in _DEFAULT_FIELDS:
                d = merged.setdefault(child.tag, {})
                d.update(child.attrib)
        out[cls] = merged
        for child in e:
            if child.tag == "default":
                walk(child, merged)

    found = False
    for e in root:
        if e.tag == "default":
            walk(e, {})
            found = True
    if not found or "main" not in out:
        out.setdefault("main", {})
    return out


def _apply_defaults(e: ET.Element, defaults: Dict[str, Dict[str, str]],
                    elemtype: str) -> ET.Element:
    """Return a shallow element clone with class defaults filled in."""
    merged = dict(defaults.get(elemtype, {}))
    merged.pop("class", None)
    merged.update(e.attrib)
    clone = ET.Element(e.tag, merged)
    clone.extend(list(e))
    return clone


# ---------------------------------------------------------------------------
# geom inertia
# ---------------------------------------------------------------------------

def _geom_volume(gtype: int, size: np.ndarray) -> float:
    r = size[0]
    if gtype == GeomType.SPHERE:
        return 4.0 / 3.0 * np.pi * r ** 3
    if gtype == GeomType.CAPSULE:
        return 4.0 / 3.0 * np.pi * r ** 3 + 2.0 * size[1] * np.pi * r * r
    if gtype == GeomType.CYLINDER:
        return 2.0 * size[1] * np.pi * r * r
    if gtype == GeomType.ELLIPSOID:
        return 4.0 / 3.0 * np.pi * size[0] * size[1] * size[2]
    if gtype == GeomType.BOX:
        return 8.0 * size[0] * size[1] * size[2]
    return 0.0


def _geom_inertia_diag(gtype: int, size: np.ndarray, mass: float) -> np.ndarray:
    """Diagonal rotational inertia of a geom about its own frame (= principal)."""
    r = size[0]
    if gtype == GeomType.SPHERE:
        i = 0.4 * mass * r * r
        return np.array([i, i, i])
    if gtype == GeomType.CAPSULE:
        hl = size[1]
        v_sph = 4.0 / 3.0 * np.pi * r ** 3
        v_cyl = 2.0 * hl * np.pi * r * r
        ms = mass * v_sph / (v_sph + v_cyl)
        mc = mass - ms
        iz = 0.4 * ms * r * r + 0.5 * mc * r * r
        ixy = (mc * (3 * r * r + 4 * hl * hl) / 12.0
               + ms * (0.4 * r * r + hl * hl + 0.75 * hl * r))
        return np.array([ixy, ixy, iz])
    if gtype == GeomType.CYLINDER:
        hl = size[1]
        iz = 0.5 * mass * r * r
        ixy = mass * (3 * r * r + 4 * hl * hl) / 12.0
        return np.array([ixy, ixy, iz])
    if gtype == GeomType.ELLIPSOID:
        a, b, c = size
        return mass / 5.0 * np.array([b * b + c * c, a * a + c * c, a * a + b * b])
    if gtype == GeomType.BOX:
        sx, sy, sz = size
        return mass / 3.0 * np.array([sy * sy + sz * sz, sx * sx + sz * sz,
                                      sx * sx + sy * sy])
    return np.zeros(3)


def _geom_rbound(gtype: int, size: np.ndarray) -> float:
    if gtype == GeomType.PLANE or gtype == GeomType.HFIELD:
        return 0.0
    if gtype == GeomType.SPHERE:
        return size[0]
    if gtype in (GeomType.CAPSULE, GeomType.CYLINDER):
        return size[0] + size[1] if gtype == GeomType.CAPSULE else float(
            np.sqrt(size[0] ** 2 + size[1] ** 2))
    if gtype == GeomType.ELLIPSOID:
        return float(np.max(size))
    if gtype == GeomType.BOX:
        return float(np.linalg.norm(size))
    return float(np.max(size))


def _fluid_semiaxes(gtype: int, size: np.ndarray) -> np.ndarray:
    """Equivalent-ellipsoid semiaxes of a primitive geom (the runtime
    readGeomSemiAxes convention: capsules include the caps, boxes use their
    half-sizes)."""
    if gtype == GeomType.SPHERE:
        return np.array([size[0], size[0], size[0]])
    if gtype == GeomType.CAPSULE:
        return np.array([size[0], size[0], size[1] + size[0]])
    if gtype == GeomType.CYLINDER:
        return np.array([size[0], size[0], size[1]])
    return np.asarray(size[:3], dtype=np.float64)


def _fluid_kappa(a: float, b: float, c: float) -> float:
    """Potential-flow added-mass factor of an ellipsoid translating along
    its first semiaxis: kappa = integral_0^inf
    a*b*c / sqrt((a^2+l)^3 (b^2+l) (c^2+l)) dl  (Lamb 1932 §114; the
    mjCGeom::GetAddedMassKappa integral). Evaluated by 400-point
    Gauss-Legendre under l = a^2 u/(1-u); exact to ~1e-9 of the oracle's
    Gauss-Kronrod value (sphere limit kappa = 2/3)."""
    x, w = np.polynomial.legendre.leggauss(400)
    u = 0.5 * (x + 1.0)
    lam = a * a * u / (1.0 - u)
    dl = a * a / (1.0 - u) ** 2
    f = a * b * c / np.sqrt((a * a + lam) ** 3 * (b * b + lam)
                            * (c * c + lam))
    return float(np.sum(f * dl * 0.5 * w))


def _fluid_ellipsoid_coefs(semi: np.ndarray, coef: np.ndarray) -> np.ndarray:
    """Pack the 12 per-geom fluid-interaction numbers (mjNFLUID layout:
    [active, blunt_drag, slender_drag, ang_drag, kutta_lift, magnus_lift,
    virtual_mass(3), virtual_inertia(3)]) from the equivalent-ellipsoid
    semiaxes — density-free; opt.density multiplies in at runtime."""
    a, b, c = (float(s) for s in semi)
    vol = 4.0 / 3.0 * np.pi * a * b * c
    kx = _fluid_kappa(a, b, c)
    ky = _fluid_kappa(b, c, a)
    kz = _fluid_kappa(c, a, b)
    vmass = [vol * k / max(1e-15, 2.0 - k) for k in (kx, ky, kz)]

    def vinertia(d1, d2, k1, k2):
        # Lamb's added moment of inertia about the axis orthogonal to the
        # (d1, d2) semiaxes; zero in the axisymmetric limit d1 == d2
        num = (d1 * d1 - d2 * d2) ** 2 * (k2 - k1)
        den = 2.0 * (d1 * d1 - d2 * d2) + (d1 * d1 + d2 * d2) * (k1 - k2)
        return 0.0 if abs(den) < 1e-12 else vol / 5.0 * num / den

    vin = [vinertia(b, c, ky, kz), vinertia(c, a, kz, kx),
           vinertia(a, b, kx, ky)]
    return np.array([1.0, *np.asarray(coef, dtype=np.float64), *vmass,
                     *vin])


# ---------------------------------------------------------------------------
# mesh assets (convex hulls) — mjCMesh::Compile analogue
# ---------------------------------------------------------------------------


class _Mesh:
    """Processed mesh asset: convex hull in the principal-inertia frame.

    Mirrors libmujoco's mesh pipeline: center at the hull CoM, rotate into
    the principal axes, and fold the (com, quat) transform into every geom
    that references the mesh. Collision uses ONLY the hull vertices (support
    function in ops/gjk.py), matching mjc_Convex semantics."""

    __slots__ = ("name", "verts", "com", "quat", "volume", "inertia_unit",
                 "rbound", "aabb_half")

    def __init__(self, name: str, raw_verts: np.ndarray):
        from scipy.spatial import ConvexHull, QhullError
        if raw_verts.shape[0] < 4:
            raise ValueError(f"mesh '{name}': need >=4 vertices")
        try:
            hull = ConvexHull(raw_verts)
        except QhullError as e:
            raise ValueError(
                f"mesh '{name}': degenerate vertex set (convex hull failed: "
                f"{str(e).splitlines()[0]})") from e
        pts = hull.points
        # orient each simplex outward using qhull's facet normals
        tris = []
        for simplex, eq in zip(hull.simplices, hull.equations):
            a, b, c = pts[simplex]
            n = np.cross(b - a, c - a)
            tris.append(simplex if np.dot(n, eq[:3]) >= 0
                        else simplex[[0, 2, 1]])
        tris = np.asarray(tris)
        vol, com, I_full = _poly_mass_properties(pts, tris)
        if vol <= 1e-12:
            raise ValueError(f"mesh '{name}': degenerate (volume {vol})")
        w, vecs = np.linalg.eigh(I_full)
        if np.linalg.det(vecs) < 0:
            vecs[:, 2] = -vecs[:, 2]
        hull_verts = pts[hull.vertices]
        local = (hull_verts - com) @ vecs       # R^T (v - com)
        self.name = name
        self.verts = local
        self.com = com
        self.quat = _mat_to_quat(vecs)
        self.volume = float(vol)
        self.inertia_unit = np.maximum(w, 0.0)   # unit density, about CoM
        self.rbound = float(np.max(np.linalg.norm(local, axis=1)))
        self.aabb_half = np.max(np.abs(local), axis=0)


def _poly_mass_properties(verts: np.ndarray, tris: np.ndarray):
    """(volume, com, unit-density inertia about com) of a closed polyhedron
    via signed-tetrahedron decomposition about the origin."""
    a = verts[tris[:, 0]]
    b = verts[tris[:, 1]]
    c = verts[tris[:, 2]]
    v = np.einsum("ij,ij->i", a, np.cross(b, c)) / 6.0       # signed volumes
    vol = v.sum()
    com = (v[:, None] * (a + b + c) / 4.0).sum(0) / vol
    # second moment sum over tets: V/20 (aa'+bb'+cc' + ss') with s = a+b+c
    s = a + b + c
    C = np.einsum("i,ij,ik->jk", v / 20.0, a, a)
    C += np.einsum("i,ij,ik->jk", v / 20.0, b, b)
    C += np.einsum("i,ij,ik->jk", v / 20.0, c, c)
    C += np.einsum("i,ij,ik->jk", v / 20.0, s, s)
    C -= vol * np.outer(com, com)
    I_full = np.trace(C) * np.eye(3) - C
    return vol, com, I_full


def _load_mesh_vertices(path: str) -> np.ndarray:
    """Vertex soup from STL (binary/ascii), OBJ, or MuJoCo legacy MSH."""
    ext = os.path.splitext(path)[1].lower()
    with open(path, "rb") as f:
        data = f.read()
    if ext == ".obj":
        verts = []
        for line in data.decode("utf-8", errors="replace").splitlines():
            t = line.split()
            if len(t) >= 4 and t[0] == "v":
                verts.append([float(t[1]), float(t[2]), float(t[3])])
        return np.asarray(verts)
    if ext == ".msh":
        nvert = int(np.frombuffer(data[:4], dtype=np.int32)[0])
        off = 16  # nvert, nnormal, ntexcoord, nface headers
        return np.frombuffer(data[off:off + 12 * nvert],
                             dtype=np.float32).reshape(nvert, 3).astype(np.float64)
    # STL: binary iff the size matches the triangle-count header
    if len(data) >= 84:
        ntri = int(np.frombuffer(data[80:84], dtype=np.uint32)[0])
        if len(data) == 84 + 50 * ntri:
            raw = np.frombuffer(data[84:], dtype=np.uint8).reshape(ntri, 50)
            tris = raw[:, 12:48].copy().view(np.float32).reshape(ntri, 9)
            return tris.reshape(-1, 3).astype(np.float64)
    verts = []
    for line in data.decode("utf-8", errors="replace").splitlines():
        t = line.split()
        if len(t) == 4 and t[0] == "vertex":
            verts.append([float(t[1]), float(t[2]), float(t[3])])
    return np.asarray(verts)


class _HField:
    """Height-field asset: normalized [0,1] elevation grid (mjCHField)."""

    __slots__ = ("name", "size", "nrow", "ncol", "data")

    def __init__(self, name: str, size: np.ndarray, nrow: int, ncol: int,
                 data: Optional[np.ndarray]):
        if nrow < 2 or ncol < 2:
            raise ValueError(f"hfield '{name}': need nrow,ncol >= 2")
        if data is None:
            data = np.zeros((nrow, ncol))
        data = np.asarray(data, dtype=np.float64).reshape(nrow, ncol)
        # normalize to [0,1] like mjCHField::Compile
        lo, hi = data.min(), data.max()
        if hi - lo > 1e-15:
            data = (data - lo) / (hi - lo)
        else:
            data = np.zeros_like(data)
        self.name = name
        self.size = np.asarray(size, dtype=np.float64)
        self.nrow, self.ncol = nrow, ncol
        self.data = data


def _load_hfield_file(path: str):
    """PNG (via PIL) or MuJoCo custom binary (int32 nrow, ncol, float32 data)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".png":
        from PIL import Image
        img = Image.open(path).convert("L")
        arr = np.asarray(img, dtype=np.float64)
        return arr.shape[0], arr.shape[1], arr
    with open(path, "rb") as f:
        raw = f.read()
    nrow, ncol = np.frombuffer(raw[:8], dtype=np.int32)
    data = np.frombuffer(raw[8:8 + 4 * nrow * ncol], dtype=np.float32)
    return int(nrow), int(ncol), data.reshape(int(nrow), int(ncol)).astype(np.float64)


def _parse_assets(root: ET.Element, base_dir: str, comp: "_Compiler"
                  ) -> Dict[str, _Mesh]:
    meshes: Dict[str, _Mesh] = {}
    asset = root.find("asset")
    if asset is None:
        return meshes
    for e in asset.iter("mesh"):
        file = _attr_s(e, "file")
        name = _attr_s(e, "name") or os.path.splitext(os.path.basename(file))[0]
        scale = _attr_f(e, "scale", [1.0, 1.0, 1.0], n=3)
        if e.get("vertex") is not None:
            raw = _floats(e.get("vertex")).reshape(-1, 3)
        elif file:
            path = os.path.join(base_dir, comp.meshdir, file)
            raw = _load_mesh_vertices(path)
        else:
            raise ValueError(f"mesh '{name}': neither file nor vertex data")
        meshes[name] = _Mesh(name, raw * np.asarray(scale))
    return meshes


def _parse_hfields(root: ET.Element, base_dir: str, comp: "_Compiler"
                   ) -> Dict[str, _HField]:
    hfields: Dict[str, _HField] = {}
    asset = root.find("asset")
    if asset is None:
        return hfields
    for e in asset.iter("hfield"):
        file = _attr_s(e, "file")
        name = _attr_s(e, "name") or os.path.splitext(os.path.basename(file))[0]
        size = _attr_f(e, "size", None, n=4)
        if size is None:
            raise ValueError(f"hfield '{name}': size attribute required")
        if e.get("elevation") is not None:      # inline grid (row-major)
            nrow = int(_attr_s(e, "nrow", "0"))
            ncol = int(_attr_s(e, "ncol", "0"))
            data = _floats(e.get("elevation"))
        elif file:
            nrow, ncol, data = _load_hfield_file(
                os.path.join(base_dir, comp.meshdir, file))
        else:
            nrow = int(_attr_s(e, "nrow", "0"))
            ncol = int(_attr_s(e, "ncol", "0"))
            data = None
        hfields[name] = _HField(name, size, nrow, ncol, data)
    return hfields


# ---------------------------------------------------------------------------
# intermediate spec objects
# ---------------------------------------------------------------------------

class _Body:
    def __init__(self):
        self.name = ""
        self.parentid = 0
        self.pos = np.zeros(3)
        self.quat = np.array([1.0, 0, 0, 0])
        self.mocap = False
        self.gravcomp = 0.0
        self.childclass: Optional[str] = None
        self.explicit_inertial = False
        self.ipos = np.zeros(3)
        self.iquat = np.array([1.0, 0, 0, 0])
        self.mass = 0.0
        self.inertia = np.zeros(3)
        self.joints: List[int] = []
        self.geoms: List[int] = []


class _Joint:
    pass


class _Geom:
    pass


# ---------------------------------------------------------------------------


def load_model(path: str, dtype=None, pair_topk: int = 0,
               con_topk: int = 0) -> types.Model:
    """Load and compile an MJCF file (mj_loadXML analogue)."""
    with open(path) as f:
        xml = f.read()
    return load_model_from_string(xml, dtype=dtype,
                                  base_dir=os.path.dirname(path),
                                  pair_topk=pair_topk, con_topk=con_topk)


def load_model_from_string(xml: str, dtype=None, base_dir: str = ".",
                           pair_topk: int = 0, con_topk: int = 0) -> types.Model:
    """Compile an MJCF string to a Model (mirrors the reference's VFS string-load
    path, mujoco_ros/src/mujoco_env.cpp:771-911).

    Compilation always runs on CPU: it is eager host-side math, and remote
    accelerator backends (the axon tunnel) pay one RPC per eager op."""
    from mujoco_ros_pkgs_tpu.utils import backend
    root = ET.fromstring(xml)
    if root.tag != "mujoco":
        raise ValueError(f"expected <mujoco> root, got <{root.tag}>")
    _expand_includes(root, base_dir)
    _merge_repeated_sections(root)
    with backend.cpu_default_device():
        m = _compile(root, base_dir)
        if pair_topk:
            m = m.replace(pair_topk=int(pair_topk))
        if con_topk:
            m = m.replace(con_topk=int(con_topk))
        if dtype is not None:
            m = m.astype(dtype)
    return m


# sections whose repeats (hand-written or produced by <include>) merge by
# appending children into the first occurrence; attribute-bearing singletons
# merge attributes with later-wins (libmujoco's repeated-section semantics)
_MERGE_SECTIONS = ("worldbody", "asset", "contact", "tendon", "actuator",
                   "sensor", "equality", "default", "keyframe", "custom")
_ATTR_SECTIONS = ("compiler", "option", "size", "visual", "statistic")


def _expand_includes(elem: ET.Element, base_dir: str, depth: int = 0) -> None:
    """Splice <include file=.../> elements in place (libmujoco's include
    semantics: the included file's root children replace the element; paths
    resolve relative to the main model file; recursion allowed)."""
    if depth > 16:
        raise ValueError("<include> nesting too deep (cycle?)")
    i = 0
    while i < len(elem):
        ch = elem[i]
        if ch.tag == "include":
            fname = ch.get("file")
            if not fname:
                raise ValueError("<include> requires a file attribute")
            path = (fname if os.path.isabs(fname)
                    else os.path.join(base_dir, fname))
            try:
                inc = ET.parse(path).getroot()
            except (OSError, ET.ParseError) as exc:
                raise ValueError(f"<include file='{fname}'>: {exc}") from exc
            _expand_includes(inc, base_dir, depth + 1)
            elem.remove(ch)
            for j, sub in enumerate(list(inc)):
                elem.insert(i + j, sub)
            i += len(inc)
        else:
            _expand_includes(ch, base_dir, depth)
            i += 1


def _merge_repeated_sections(root: ET.Element) -> None:
    """Fold repeated top-level sections into the first occurrence (repeats
    arise naturally from <include>; libmujoco merges them)."""
    seen: Dict[str, ET.Element] = {}
    for ch in list(root):
        t = ch.tag
        if t in seen and t in _MERGE_SECTIONS:
            for sub in list(ch):
                seen[t].append(sub)
            root.remove(ch)
        elif t in seen and t in _ATTR_SECTIONS:
            seen[t].attrib.update(ch.attrib)
            for sub in list(ch):
                seen[t].append(sub)
            root.remove(ch)
        else:
            seen[t] = ch


def _compile(root: ET.Element, base_dir: str) -> types.Model:
    import jax.numpy as jnp

    comp = _Compiler(root.find("compiler"))
    defaults_tree = _collect_defaults(root)
    meshes = _parse_assets(root, base_dir, comp)
    hfields = _parse_hfields(root, base_dir, comp)

    # ---------------- option ----------------
    oe = root.find("option")
    flags = 0
    timestep, gravity = 0.002, np.array([0.0, 0, -9.81])
    wind = np.zeros(3)
    magnetic = np.array([0.0, -0.5, 0.0])
    density = viscosity = 0.0
    impratio, o_margin = 1.0, 0.0
    o_solref, o_solimp = np.array(_SOLREF), np.array(_SOLIMP)
    integrator, cone = int(IntegratorType.EULER), int(types.ConeType.PYRAMIDAL)
    solver, iterations, ls_iterations = int(types.SolverType.NEWTON), 100, 50
    tolerance, ls_tolerance = 1e-8, 0.01
    if oe is not None:
        timestep = float(_attr_s(oe, "timestep", str(timestep)))
        gravity = _attr_f(oe, "gravity", gravity)
        wind = _attr_f(oe, "wind", wind)
        magnetic = _attr_f(oe, "magnetic", magnetic)
        density = float(_attr_s(oe, "density", "0"))
        viscosity = float(_attr_s(oe, "viscosity", "0"))
        impratio = float(_attr_s(oe, "impratio", "1"))
        o_margin = float(_attr_s(oe, "o_margin", "0"))
        o_solref = _attr_f(oe, "o_solref", o_solref)
        o_solimp = _attr_f(oe, "o_solimp", o_solimp)
        integrator = {"Euler": 0, "RK4": 1, "implicit": 2, "implicitfast": 3}[
            _attr_s(oe, "integrator", "Euler")]
        cone = {"pyramidal": 0, "elliptic": 1}[_attr_s(oe, "cone", "pyramidal")]
        solver = {"PGS": 0, "CG": 1, "Newton": 2}[_attr_s(oe, "solver", "Newton")]
        iterations = int(_attr_s(oe, "iterations", "100"))
        ls_iterations = int(_attr_s(oe, "ls_iterations", "50"))
        tolerance = float(_attr_s(oe, "tolerance", "1e-8"))
        ls_tolerance = float(_attr_s(oe, "ls_tolerance", "0.01"))
        fe = oe.find("flag")
        if fe is not None:
            names = {"constraint": 1 << 0, "equality": 1 << 1,
                     "frictionloss": 1 << 2, "limit": 1 << 3, "contact": 1 << 4,
                     "passive": 1 << 5, "gravity": 1 << 6, "clampctrl": 1 << 7,
                     "warmstart": 1 << 8, "filterparent": 1 << 9,
                     "actuation": 1 << 10, "refsafe": 1 << 11, "sensor": 1 << 12}
            for k, bit in names.items():
                if fe.get(k, "enable") == "disable":
                    flags |= bit
        # 2.3.7-era: collision="all|predefined|dynamic" — "predefined" keeps only
        # explicit <pair>s; model it via a flag on the compiler below.
        collision_mode = _attr_s(oe, "collision", "all")
    else:
        collision_mode = "all"

    # ---------------- storage ----------------
    bodies: List[_Body] = []
    jnts: List[Any] = []
    geoms: List[Any] = []
    sites: List[Any] = []
    cams: List[Any] = []

    world = _Body()
    world.name = "world"
    world.parentid = 0
    bodies.append(world)

    def parse_joint(e, bclass, bodyid):
        if e.tag != "freejoint":
            # <freejoint> accepts only name/group — joint defaults do NOT
            # apply to it (libmujoco semantics)
            e = _apply_defaults(e, defaults_tree.get(bclass,
                                                     defaults_tree["main"]),
                                "joint")
        j = _Joint()
        j.name = _attr_s(e, "name")
        if e.tag == "freejoint":
            j.type = int(JointType.FREE)
        else:
            j.type = {"free": 0, "ball": 1, "slide": 2, "hinge": 3}[
                _attr_s(e, "type", "hinge")]
        j.bodyid = bodyid
        j.pos = _attr_f(e, "pos", [0, 0, 0])
        j.axis = _attr_f(e, "axis", [0, 0, 1])
        j.axis = j.axis / np.linalg.norm(j.axis)
        j.stiffness = float(_attr_s(e, "stiffness", "0"))
        rng = _attr_f(e, "range", [0, 0])
        if j.type in (int(JointType.HINGE), int(JointType.BALL)):
            rng = comp.ang(rng)
        j.range = rng
        limited = _attr_tri(e, "limited", 2)
        if limited == 2:  # auto
            limited = 1 if (comp.autolimits and e.get("range") is not None) else 0
        j.limited = limited
        frcrng = _attr_f(e, "actuatorfrcrange", [0, 0])
        j.actfrcrange = frcrng
        afl = _attr_tri(e, "actuatorfrclimited", 2)
        if afl == 2:
            afl = 1 if (comp.autolimits and e.get("actuatorfrcrange") is not None) else 0
        j.actfrclimited = afl
        j.solref = _attr_f(e, "solreflimit", _SOLREF)
        j.solimp = _attr_f(e, "solimplimit", _SOLIMP)
        j.solref_fri = _attr_f(e, "solreffriction", _SOLREF)
        j.solimp_fri = _attr_f(e, "solimpfriction", _SOLIMP)
        j.margin = float(_attr_s(e, "margin", "0"))
        ref = float(_attr_s(e, "ref", "0"))
        springref = float(_attr_s(e, "springref", "0"))
        if j.type in (int(JointType.HINGE),):
            ref, springref = float(comp.ang(ref)), float(comp.ang(springref))
        j.ref, j.springref = ref, springref
        j.armature = float(_attr_s(e, "armature", "0"))
        j.damping = float(_attr_s(e, "damping", "0"))
        j.frictionloss = float(_attr_s(e, "frictionloss", "0"))
        jnts.append(j)
        return len(jnts) - 1

    def parse_geom(e, bclass, bodyid):
        e = _apply_defaults(e, defaults_tree.get(bclass, defaults_tree["main"]),
                            "geom")
        g = _Geom()
        g.name = _attr_s(e, "name")
        g.type = {"plane": 0, "hfield": 1, "sphere": 2, "capsule": 3,
                  "ellipsoid": 4, "cylinder": 5, "box": 6, "mesh": 7}[
            _attr_s(e, "type", "sphere")]
        g.bodyid = bodyid
        fluidshape = _attr_s(e, "fluidshape", "none")
        if fluidshape not in ("none", "ellipsoid"):
            raise ValueError(
                f"geom '{e.get('name', '')}': unknown fluidshape="
                f"'{fluidshape}' (expected 'none' or 'ellipsoid')")
        g.fluidshape = fluidshape
        g.fluidcoef = _attr_f(e, "fluidcoef", [0.5, 0.25, 1.5, 1.0, 1.0], n=5)
        g.contype = int(_attr_s(e, "contype", "1"))
        g.conaffinity = int(_attr_s(e, "conaffinity", "1"))
        g.condim = int(_attr_s(e, "condim", "3"))
        g.priority = int(_attr_s(e, "priority", "0"))
        g.size = _attr_f(e, "size", [0, 0, 0], n=3)
        g.friction = _attr_f(e, "friction", [1.0, 0.005, 0.0001], n=3)
        g.solmix = float(_attr_s(e, "solmix", "1"))
        g.solref = _attr_f(e, "solref", _SOLREF)
        g.solimp = _attr_f(e, "solimp", _SOLIMP)
        g.margin = float(_attr_s(e, "margin", "0"))
        g.gap = float(_attr_s(e, "gap", "0"))
        g.rgba = _attr_f(e, "rgba", [0.5, 0.5, 0.5, 1.0], n=4)
        g.pos = _attr_f(e, "pos", [0, 0, 0])
        g.quat = _orientation(e, comp)
        if e.get("fromto") is not None:
            ft = _floats(e.get("fromto"))
            a, b = ft[:3], ft[3:]
            g.pos = 0.5 * (a + b)
            d = b - a
            g.quat = _z2quat(d)
            g.size[1] = np.linalg.norm(d) / 2.0
        # mesh reference: fold the asset's (com, principal quat) into the geom
        # frame, exactly as mjCMesh::Compile re-centers meshes in libmujoco
        g.meshid = -1
        g.inertia_diag = None
        mesh_name = _attr_s(e, "mesh")
        hfield_name = _attr_s(e, "hfield")
        if g.type == GeomType.HFIELD or hfield_name:
            if g.type != GeomType.HFIELD:
                raise ValueError(f"geom '{g.name}': hfield attr requires "
                                 f"type='hfield'")
            if hfield_name not in hfields:
                raise ValueError(f"geom '{g.name}': undefined hfield "
                                 f"'{hfield_name}'")
            # geom_dataid indexes the hfield table (mjModel semantics)
            g.meshid = list(hfields).index(hfield_name)
            g.size = hfields[hfield_name].size[:3].copy()
        if mesh_name:
            if g.type != GeomType.MESH:
                raise ValueError(
                    f"geom '{g.name}': mesh-fitting (mesh attr with "
                    f"type != mesh) is not supported")
            if mesh_name not in meshes:
                raise ValueError(f"geom '{g.name}': undefined mesh "
                                 f"'{mesh_name}' (no such <asset> mesh)")
            mesh = meshes[mesh_name]
            g.meshid = list(meshes).index(mesh_name)
            g.pos = np.asarray(g.pos, dtype=np.float64) + _quat_rot(mesh.com, g.quat)
            g.quat = _quat_mul(g.quat, mesh.quat)
            g.size = mesh.aabb_half.copy()
        elif g.type == GeomType.MESH:
            raise ValueError(f"geom '{g.name}': type mesh without mesh attr")
        # mass/density
        density = float(_attr_s(e, "density", "1000"))
        if mesh_name:
            vol = mesh.volume
        else:
            vol = _geom_volume(g.type, g.size)
        if e.get("mass") is not None:
            g.mass = float(e.get("mass"))
        else:
            g.mass = density * vol
        if mesh_name:
            g.inertia_diag = mesh.inertia_unit * (g.mass / mesh.volume)
            g.rbound = mesh.rbound
        else:
            g.rbound = _geom_rbound(g.type, g.size)
        # geom-level ellipsoid fluid-interaction model: pack the 12
        # mjNFLUID coefficients (interaction flag, 5 fluidcoef, virtual
        # mass 3, virtual inertia 3) exactly as mjCGeom::SetFluidCoefs
        # does at compile time, so engine parity holds bit-for-bit on the
        # coefficient side.
        if g.fluidshape == "ellipsoid":
            if g.type in (GeomType.PLANE, GeomType.HFIELD, GeomType.MESH):
                raise ValueError(
                    f"geom '{g.name}': fluidshape='ellipsoid' requires a "
                    f"primitive geom (sphere/capsule/cylinder/ellipsoid/"
                    f"box)")
            g.fluid = _fluid_ellipsoid_coefs(
                _fluid_semiaxes(g.type, g.size), g.fluidcoef)
        else:
            g.fluid = np.zeros(12)
        geoms.append(g)
        return len(geoms) - 1

    def parse_site(e, bclass, bodyid):
        e = _apply_defaults(e, defaults_tree.get(bclass, defaults_tree["main"]),
                            "site")
        s = _Geom()
        s.name = _attr_s(e, "name")
        s.bodyid = bodyid
        s.pos = _attr_f(e, "pos", [0, 0, 0])
        s.quat = _orientation(e, comp)
        if e.get("fromto") is not None:
            ft = _floats(e.get("fromto"))
            a, b = ft[:3], ft[3:]
            s.pos = 0.5 * (a + b)
            s.quat = _z2quat(b - a)
        sites.append(s)
        return len(sites) - 1

    def parse_camera(e, bodyid):
        c = _Geom()
        c.name = _attr_s(e, "name")
        c.bodyid = bodyid
        c.pos = _attr_f(e, "pos", [0, 0, 0])
        c.quat = _orientation(e, comp)
        # mujoco stores fovy in degrees regardless of compiler angle
        c.fovy = float(_attr_s(e, "fovy", "45"))
        cams.append(c)
        return len(cams) - 1

    def walk_body(e: ET.Element, parentid: int, parent_class: str):
        b = _Body()
        b.name = _attr_s(e, "name")
        b.parentid = parentid
        bclass = e.get("childclass", parent_class)
        b.childclass = bclass
        b.pos = _attr_f(e, "pos", [0, 0, 0])
        b.quat = _orientation(e, comp)
        b.mocap = _attr_b(e, "mocap", False)
        b.gravcomp = float(_attr_s(e, "gravcomp", "0"))
        bodies.append(b)
        bid = len(bodies) - 1

        ie = e.find("inertial")
        if ie is not None:
            b.explicit_inertial = True
            b.ipos = _attr_f(ie, "pos", [0, 0, 0])
            b.iquat = _orientation(ie, comp)
            b.mass = float(ie.get("mass"))
            if ie.get("diaginertia") is not None:
                b.inertia = _floats(ie.get("diaginertia"))
            elif ie.get("fullinertia") is not None:
                fi = _floats(ie.get("fullinertia"))
                M = np.array([[fi[0], fi[3], fi[4]],
                              [fi[3], fi[1], fi[5]],
                              [fi[4], fi[5], fi[2]]])
                w, q = _principal_inertia(M)
                b.inertia = w
                b.iquat = _quat_mul(b.iquat, q)

        for child in e:
            if child.tag in ("joint", "freejoint"):
                b.joints.append(parse_joint(child, bclass, bid))
            elif child.tag == "geom":
                b.geoms.append(parse_geom(child, bclass, bid))
            elif child.tag == "site":
                parse_site(child, bclass, bid)
            elif child.tag == "camera":
                parse_camera(child, bid)
            elif child.tag == "body":
                walk_body(child, bid, bclass)

    wb = root.find("worldbody")
    if wb is None:
        raise ValueError("no <worldbody>")
    for child in wb:
        if child.tag == "geom":
            world.geoms.append(parse_geom(child, "main", 0))
        elif child.tag == "site":
            parse_site(child, "main", 0)
        elif child.tag == "camera":
            parse_camera(child, 0)
        elif child.tag == "body":
            walk_body(child, 0, "main")

    # ---------------- inertia from geoms ----------------
    for b in bodies[1:]:
        use_geom = (comp.inertiafromgeom == "true"
                    or (comp.inertiafromgeom == "auto" and not b.explicit_inertial))
        if use_geom and b.geoms:
            masses = np.array([geoms[g].mass for g in b.geoms])
            coms = np.stack([geoms[g].pos for g in b.geoms])
            mass = masses.sum()
            com = ((masses[:, None] * coms).sum(0) / mass) if mass > 1e-15 else np.zeros(3)
            full = np.zeros((3, 3))
            for gi in b.geoms:
                g = geoms[gi]
                R = _quat_to_mat(g.quat)
                I_g = np.diag(g.inertia_diag if g.inertia_diag is not None
                              else _geom_inertia_diag(g.type, g.size, g.mass))
                d = g.pos - com
                full += (R @ I_g @ R.T
                         + g.mass * (np.dot(d, d) * np.eye(3) - np.outer(d, d)))
            w, q = _principal_inertia(full)
            b.mass = float(mass)
            b.inertia = np.maximum(w, 0.0)
            b.ipos = com
            b.iquat = q
        elif not b.explicit_inertial:
            b.mass = 0.0
            b.inertia = np.zeros(3)
        b.mass = max(b.mass, comp.boundmass)
        b.inertia = np.maximum(b.inertia, comp.boundinertia)
        if comp.balanceinertia:
            pass  # not needed by the reference worlds

    from mujoco_ros_pkgs_tpu.core.assemble import _assemble
    n_out = _assemble(root, comp, defaults_tree, bodies, jnts, geoms, sites, cams,
                      meshes=meshes, hfields=hfields,
                      opt=dict(timestep=timestep, gravity=gravity, wind=wind,
                           magnetic=magnetic, density=density,
                           viscosity=viscosity, impratio=impratio,
                           o_margin=o_margin, o_solref=o_solref,
                           o_solimp=o_solimp, integrator=integrator, cone=cone,
                           solver=solver, iterations=iterations,
                           ls_iterations=ls_iterations, tolerance=tolerance,
                           ls_tolerance=ls_tolerance, disableflags=flags,
                           collision_mode=collision_mode))
    if n_out.nu:
        from mujoco_ros_pkgs_tpu.core import lengthrange as _lr
        if _lr.needs_auto(n_out).any():
            n_out = _lr.apply_auto_lengthrange(n_out)
    return n_out
