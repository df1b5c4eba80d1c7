"""Quaternion and 6D spatial algebra in MuJoCo conventions, as pure jnp functions.

Conventions (matching libmujoco 2.3.7, the engine the reference server drives —
see SURVEY.md L0; reference: mujoco_ros/src/mujoco_env.cpp uses mj_step et al.):

- quaternions are (w, x, y, z), unit norm;
- 6D spatial vectors are [rotational(3); translational(3)] — rotation FIRST;
- "com-based" spatial quantities are expressed in world orientation with the
  reference point at the subtree center-of-mass of the kinematic tree root.

All functions are unbatched; batch via `jax.vmap`. All are differentiable and
jit-safe (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# mjMINVAL
MINVAL = 1e-15


def norm_safe(x: jax.Array, axis=None) -> jax.Array:
    """Norm that is safe to differentiate at 0."""
    sq = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(sq, MINVAL * MINVAL))


def normalize(x: jax.Array) -> jax.Array:
    """Normalize a vector; returns x unchanged (scaled by 1/MINVAL-guard) near 0."""
    n = norm_safe(x)
    return x / n


def normalize_with_norm(x: jax.Array):
    n = norm_safe(x)
    return x / n, n


# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------

def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
    """Hamilton product u*v (mju_mulQuat)."""
    return jnp.stack([
        u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
        u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
        u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
        u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0],
    ])


def quat_conj(q: jax.Array) -> jax.Array:
    """Conjugate (= inverse for unit quats; mju_negQuat)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul_axis(q: jax.Array, axis: jax.Array) -> jax.Array:
    """Multiply quaternion by a pure vector quaternion (mju_mulQuatAxis)."""
    return jnp.stack([
        -q[1] * axis[0] - q[2] * axis[1] - q[3] * axis[2],
        q[0] * axis[0] + q[2] * axis[2] - q[3] * axis[1],
        q[0] * axis[1] + q[3] * axis[0] - q[1] * axis[2],
        q[0] * axis[2] + q[1] * axis[1] - q[2] * axis[0],
    ])


def rot_vec_quat(vec: jax.Array, q: jax.Array) -> jax.Array:
    """Rotate vec by quaternion q (mju_rotVecQuat): world = R(q) @ local."""
    # v' = v + 2w(u x v) + 2u x (u x v), u = q[1:4], w = q[0]
    u = q[1:4]
    w = q[0]
    c = jnp.cross(u, vec)
    return vec + 2.0 * (w * c + jnp.cross(u, c))


def rot_vec_quat_inv(vec: jax.Array, q: jax.Array) -> jax.Array:
    """Rotate vec by the inverse of q (local = R(q)^T @ world)."""
    return rot_vec_quat(vec, quat_conj(q))


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Quaternion to 3x3 rotation matrix (mju_quat2Mat)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], dtype=q.dtype)


def mat_to_quat(mat: jax.Array) -> jax.Array:
    """3x3 rotation matrix to quaternion (mju_mat2Quat semantics, branchless)."""
    # Shepperd's method with lax.switch on argmax of the 4 candidate traces.
    m = mat
    tr = m[0, 0] + m[1, 1] + m[2, 2]
    cand = jnp.stack([tr, m[0, 0], m[1, 1], m[2, 2]])

    def from_w(_):
        s = jnp.sqrt(jnp.maximum(tr + 1.0, MINVAL)) * 2.0
        return jnp.stack([0.25 * s,
                          (m[2, 1] - m[1, 2]) / s,
                          (m[0, 2] - m[2, 0]) / s,
                          (m[1, 0] - m[0, 1]) / s])

    def from_x(_):
        s = jnp.sqrt(jnp.maximum(1.0 + m[0, 0] - m[1, 1] - m[2, 2], MINVAL)) * 2.0
        return jnp.stack([(m[2, 1] - m[1, 2]) / s,
                          0.25 * s,
                          (m[0, 1] + m[1, 0]) / s,
                          (m[0, 2] + m[2, 0]) / s])

    def from_y(_):
        s = jnp.sqrt(jnp.maximum(1.0 + m[1, 1] - m[0, 0] - m[2, 2], MINVAL)) * 2.0
        return jnp.stack([(m[0, 2] - m[2, 0]) / s,
                          (m[0, 1] + m[1, 0]) / s,
                          0.25 * s,
                          (m[1, 2] + m[2, 1]) / s])

    def from_z(_):
        s = jnp.sqrt(jnp.maximum(1.0 + m[2, 2] - m[0, 0] - m[1, 1], MINVAL)) * 2.0
        return jnp.stack([(m[1, 0] - m[0, 1]) / s,
                          (m[0, 2] + m[2, 0]) / s,
                          (m[1, 2] + m[2, 1]) / s,
                          0.25 * s])

    q = jax.lax.switch(jnp.argmax(cand), [from_w, from_x, from_y, from_z], None)
    q = normalize(q)
    # canonical sign: w >= 0
    return jnp.where(q[0] < 0, -q, q)


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """(unit axis, angle) -> quaternion (mju_axisAngle2Quat)."""
    s = jnp.sin(angle * 0.5)
    return jnp.concatenate([jnp.cos(angle * 0.5)[None], axis * s])


def quat_integrate(q: jax.Array, vel: jax.Array, dt: jax.Array) -> jax.Array:
    """Integrate quaternion by LOCAL-frame angular velocity (mju_quatIntegrate).

    MuJoCo free/ball joint angular velocity lives in the child-body local frame;
    integration right-multiplies: q' = q * exp(dt/2 * vel).
    """
    angle = norm_safe(vel) * dt
    axis = normalize(vel)
    return quat_mul(q, axis_angle_to_quat(axis, angle))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Velocity-space difference: 3D rotation taking qb to qa (mju_subQuat)."""
    # qdif = neg(qb)*qa, convert to 3D velocity (axis*angle)
    qdif = quat_mul(quat_conj(qb), qa)
    qdif = jnp.where(qdif[0] < 0, -qdif, qdif)
    axis, sin_half = normalize_with_norm(qdif[1:4])
    angle = 2.0 * jnp.arctan2(sin_half, qdif[0])
    return axis * angle


def quat_to_vel(q: jax.Array) -> jax.Array:
    """Quaternion -> 3D angular displacement (mju_quat2Vel with dt=1)."""
    q = jnp.where(q[0] < 0, -q, q)
    axis, sin_half = normalize_with_norm(q[1:4])
    angle = 2.0 * jnp.arctan2(sin_half, q[0])
    return axis * angle


def euler_to_quat(euler: jax.Array, seq: str = "xyz") -> jax.Array:
    """Euler angles (radians) to quaternion, MuJoCo compiler eulerseq semantics.

    Lowercase letters = intrinsic (rotating) axes: q = q1*q2*q3 applied in order.
    """
    axes = {"x": jnp.array([1.0, 0.0, 0.0]),
            "y": jnp.array([0.0, 1.0, 0.0]),
            "z": jnp.array([0.0, 0.0, 1.0])}
    q = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=jnp.asarray(euler).dtype)
    for i, ax in enumerate(seq):
        qi = axis_angle_to_quat(axes[ax.lower()].astype(q.dtype), euler[i])
        if ax.islower():
            q = quat_mul(q, qi)   # intrinsic: post-multiply
        else:
            q = quat_mul(qi, q)   # extrinsic: pre-multiply
    return q


# ---------------------------------------------------------------------------
# 6D spatial algebra ([rot; tran], MuJoCo ordering)
# ---------------------------------------------------------------------------

def motion_cross(u: jax.Array, v: jax.Array) -> jax.Array:
    """Motion-vector cross product (mju_crossMotion): u x_m v."""
    ang = jnp.cross(u[:3], v[:3])
    lin = jnp.cross(u[:3], v[3:]) + jnp.cross(u[3:], v[:3])
    return jnp.concatenate([ang, lin])


def force_cross(u: jax.Array, f: jax.Array) -> jax.Array:
    """Force-vector cross product (mju_crossForce): u x_f f (u is motion)."""
    ang = jnp.cross(u[:3], f[:3]) + jnp.cross(u[3:], f[3:])
    lin = jnp.cross(u[:3], f[3:])
    return jnp.concatenate([ang, lin])


def transform_motion(vec: jax.Array, newpos: jax.Array, oldpos: jax.Array) -> jax.Array:
    """Translate a motion vector's reference point (mju_transformSpatial, no rot)."""
    dif = newpos - oldpos
    lin = vec[3:] - jnp.cross(dif, vec[:3])
    return jnp.concatenate([vec[:3], lin])


def transform_force(vec: jax.Array, newpos: jax.Array, oldpos: jax.Array) -> jax.Array:
    """Translate a force vector's reference point."""
    dif = newpos - oldpos
    ang = vec[:3] - jnp.cross(dif, vec[3:])
    return jnp.concatenate([ang, vec[3:]])


def inert_vec_mul(inert: jax.Array, v: jax.Array) -> jax.Array:
    """Spatial inertia (10,) times motion vector (6,) -> force vector (mju_mulInertVec).

    inert layout (MuJoCo cinert): [Ixx Iyy Izz Ixy Ixz Iyz, hx hy hz, m] where
    h = m * com_offset and I is about the reference point.
    """
    Ixx, Iyy, Izz, Ixy, Ixz, Iyz = inert[0], inert[1], inert[2], inert[3], inert[4], inert[5]
    h = inert[6:9]
    m = inert[9]
    w, l = v[:3], v[3:]
    Iw = jnp.stack([
        Ixx * w[0] + Ixy * w[1] + Ixz * w[2],
        Ixy * w[0] + Iyy * w[1] + Iyz * w[2],
        Ixz * w[0] + Iyz * w[1] + Izz * w[2],
    ])
    ang = Iw + jnp.cross(h, l)
    lin = m * l - jnp.cross(h, w)
    return jnp.concatenate([ang, lin])


def inert_from_mass_com_fullinertia(mass, inertia_at_com, com, mat=None):
    """Build a 10-vector spatial inertia at a reference point from mass, 3x3
    rotational inertia about the COM (in some frame), and COM offset from the
    reference point; optional rotation mat maps that frame to the target frame.

    Parallel-axis: I_ref = R I_com R^T + m*(c.c 1 - c c^T).
    """
    if mat is not None:
        inertia_at_com = mat @ inertia_at_com @ mat.T
    c = com
    cc = jnp.outer(c, c)
    shift = mass * (jnp.dot(c, c) * jnp.eye(3, dtype=cc.dtype) - cc)
    full = inertia_at_com + shift
    return jnp.concatenate([
        jnp.stack([full[0, 0], full[1, 1], full[2, 2],
                   full[0, 1], full[0, 2], full[1, 2]]),
        mass * c,
        jnp.asarray(mass)[None] if jnp.ndim(mass) == 0 else mass[None],
    ])
