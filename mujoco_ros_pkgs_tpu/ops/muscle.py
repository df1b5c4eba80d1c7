"""Muscle actuator model — mju_muscleDynamics / mju_muscleGain /
mju_muscleBias analogues (branchless jnp, vectorized over actuators).

The reference gets muscles through libmujoco's actuation pipeline
(mj_fwdActuation dispatches on dyntype/gaintype/biastype; the server steps it
via mj_step, mujoco_ros/src/mujoco_env.cpp:498). Every curve here is pinned
pointwise against the pip oracle's exposed mju_muscle* bindings over dense
grids (tests/test_muscle.py).

Parameter vectors (actuator_gainprm == actuator_biasprm for muscles):
  prm = (range0, range1, force, scale, lmin, lmax, vmax, fpmax, fvmax)
  dynprm = (tau_act, tau_deact, tausmooth)

force < 0 means "derive peak force from scale": F0 = scale / acc0, where
acc0 = |M^-1 moment| at qpos0 (computed at model build, mj_setConst
semantics).
"""

from __future__ import annotations

import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.ops import math as mmath


def _sigmoid(x):
    """Quintic smoothstep on [0, 1] (mju_sigmoid)."""
    x = jnp.clip(x, 0.0, 1.0)
    return x * x * x * (3.0 * x * (2.0 * x - 5.0) + 10.0)


def dynamics(ctrl, act, dynprm):
    """Activation rate act_dot(ctrl, act). dynprm (..., >=3)."""
    tau_act = dynprm[..., 0]
    tau_deact = dynprm[..., 1]
    tausmooth = dynprm[..., 2]
    ctrlclamp = jnp.clip(ctrl, 0.0, 1.0)
    actclamp = jnp.clip(act, 0.0, 1.0)
    t_act = tau_act * (0.5 + 1.5 * actclamp)
    t_deact = tau_deact / (0.5 + 1.5 * actclamp)
    dctrl = ctrlclamp - act
    tau_hard = jnp.where(dctrl > 0, t_act, t_deact)
    sig = _sigmoid(dctrl / jnp.maximum(tausmooth, mmath.MINVAL) + 0.5)
    tau_smooth = t_deact + sig * (t_act - t_deact)
    tau = jnp.where(tausmooth > 0, tau_smooth, tau_hard)
    return dctrl / jnp.maximum(tau, mmath.MINVAL)


def _norm_length_vel(length, vel, lengthrange, prm):
    r0, r1 = prm[..., 0], prm[..., 1]
    lmin, lmax, vmax = prm[..., 4], prm[..., 5], prm[..., 6]
    L0 = ((lengthrange[..., 1] - lengthrange[..., 0])
          / jnp.maximum(r1 - r0, mmath.MINVAL))
    L = r0 + (length - lengthrange[..., 0]) / jnp.maximum(L0, mmath.MINVAL)
    V = vel / jnp.maximum(L0 * vmax, mmath.MINVAL)
    return L, V, lmin, lmax


def _peak_force(acc0, prm):
    force, scale = prm[..., 2], prm[..., 3]
    return jnp.where(force < 0,
                     scale / jnp.maximum(acc0, mmath.MINVAL), force)


def _bump(L, A, mid, B):
    """Quadratic spline bump: 0 at A and B, 1 at mid (mju_muscleGain FL)."""
    left = 0.5 * (A + mid)
    right = 0.5 * (mid + B)
    eps = mmath.MINVAL
    xl = (L - A) / jnp.maximum(left - A, eps)
    xm_l = (mid - L) / jnp.maximum(mid - left, eps)
    xm_r = (L - mid) / jnp.maximum(right - mid, eps)
    xr = (B - L) / jnp.maximum(B - right, eps)
    val = jnp.where(L < left, 0.5 * xl * xl,
                    jnp.where(L < mid, 1.0 - 0.5 * xm_l * xm_l,
                              jnp.where(L < right, 1.0 - 0.5 * xm_r * xm_r,
                                        0.5 * xr * xr)))
    return jnp.where((L <= A) | (L >= B), 0.0, val)


def gain(length, vel, lengthrange, acc0, prm):
    """Active muscle gain (<= 0): -F0 * FL(L) * FV(V)."""
    L, V, lmin, lmax = _norm_length_vel(length, vel, lengthrange, prm)
    F0 = _peak_force(acc0, prm)
    fvmax = prm[..., 8]
    FL = _bump(L, lmin, 1.0, lmax)
    y = fvmax - 1.0
    FV = jnp.where(
        V <= -1.0, 0.0,
        jnp.where(V <= 0.0, (V + 1.0) * (V + 1.0),
                  jnp.where(V <= y,
                            fvmax - (y - V) * (y - V)
                            / jnp.maximum(y, mmath.MINVAL),
                            fvmax)))
    return -F0 * FL * FV


def bias(length, lengthrange, acc0, prm):
    """Passive muscle force (<= 0): -F0 * FP(L)."""
    L, _, _, lmax = _norm_length_vel(length, jnp.zeros_like(length),
                                     lengthrange, prm)
    F0 = _peak_force(acc0, prm)
    fpmax = prm[..., 7]
    b = 0.5 * (lmax + 1.0)
    eps = mmath.MINVAL
    x_mid = (L - 1.0) / jnp.maximum(b - 1.0, eps)
    x_hi = (L - b) / jnp.maximum(b - 1.0, eps)
    FP = jnp.where(L <= 1.0, 0.0,
                   jnp.where(L <= b, 0.5 * x_mid * x_mid, 0.5 + x_hi))
    return -F0 * fpmax * FP
