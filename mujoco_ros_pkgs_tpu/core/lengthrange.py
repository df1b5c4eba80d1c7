"""Automatic actuator lengthrange computation (mj_setLengthRange analogue).

libmujoco's compiler fills in missing muscle `lengthrange` attributes by
simulation: it pushes each actuator's transmission toward both extremes
with a damped, constraint-respecting dynamics probe and records the
achieved length range.  The reference therefore accepts any valid muscle
model without the attribute (models load through callbacks.cpp:177-201
verbatim); this module restores that acceptance for the TPU engine:

- joint transmission on a limited scalar joint: the range is analytic,
  ``gear0 * jnt_range`` (ordered) — no simulation needed;
- tendon transmission: a damped push simulation against the model's
  joint/tendon limit constraints, gravity/contacts/actuation disabled
  (the probe measures the transmission geometry, not the dynamics), run
  once per direction at model-load time;
- anything unbounded (no limits anywhere along the transmission) is a
  ``ValueError`` naming the actuator, like libmujoco's
  "lengthrange computation failed" compile error.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import (
    DisableBit, JointType, Model, TrnType)

# probe constants (the mjLROpt analogues: target coordinate acceleration,
# per-step velocity damping, step count per direction)
_ACCEL = 20.0
_DAMP = 0.85
_NSTEP = 400
_DIVERGED = 1e6


def needs_auto(m: Model) -> np.ndarray:
    """Bool mask over actuators: muscle gain/bias with missing lengthrange."""
    lr = np.asarray(m.actuator_lengthrange)
    need = np.zeros(m.nu, dtype=bool)
    for i in range(m.nu):
        if (m.actuator_gaintype[i] == 2 or m.actuator_biastype[i] == 2) \
                and lr[i, 0] >= lr[i, 1]:
            need[i] = True
    return need


def _probe_model(m: Model) -> Model:
    """The measurement model: no gravity/contacts/actuation/passive, limits
    and equality constraints kept (they are what bounds the range)."""
    flags = (int(m.opt.disableflags)
             | DisableBit.CONTACT | DisableBit.GRAVITY
             | DisableBit.ACTUATION | DisableBit.PASSIVE)
    return m.replace(opt=m.opt.replace(disableflags=flags))


def _simulate_range(m: Model, i: int) -> tuple:
    """Damped push probe for actuator i: drive the transmission coordinate
    toward each extreme and record the settled actuator length."""
    from mujoco_ros_pkgs_tpu.ops import forward as fwd

    mp = _probe_model(m)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    def run(sign):
        d0 = fwd.make_data(mp, dtype=dtype)

        def body(_, carry):
            d, ext = carry
            moment = d.actuator_moment[i]
            denom = jnp.maximum(jnp.dot(
                moment, jax.scipy.linalg.cho_solve(
                    (jnp.linalg.cholesky(d.qM), True), moment)),
                1e-12)
            scale = _ACCEL / denom
            d = d.replace(qfrc_applied=sign * scale * moment,
                          qvel=d.qvel * _DAMP)
            d = fwd.step(mp, d)
            ln = d.actuator_length[i]
            ext = jnp.where(sign > 0, jnp.maximum(ext, ln),
                            jnp.minimum(ext, ln))
            return d, ext

        d0 = fwd.forward(mp, d0)     # populate moments before the loop
        ext0 = d0.actuator_length[i]
        _, ext = jax.lax.fori_loop(0, _NSTEP, body, (d0, ext0))
        return ext

    lo = float(jax.jit(run)(jnp.asarray(-1.0, dtype)))
    hi = float(jax.jit(run)(jnp.asarray(1.0, dtype)))
    return lo, hi


def apply_auto_lengthrange(m: Model) -> Model:
    """Fill missing muscle lengthranges; raise for uncomputable ones."""
    need = needs_auto(m)
    if not need.any():
        return m
    lr = np.array(m.actuator_lengthrange)
    for i in np.nonzero(need)[0]:
        trn = m.actuator_trntype[i]
        name = m.actuator_names[i] if m.actuator_names else str(i)
        if trn == int(TrnType.JOINT):
            j = m.actuator_trnid[i][0]
            if m.jnt_type[j] not in (int(JointType.HINGE), int(JointType.SLIDE)):
                raise ValueError(
                    f"muscle actuator '{name}': automatic lengthrange needs "
                    "a scalar (hinge/slide) joint transmission")
            if not m.jnt_limited[j]:
                raise ValueError(
                    f"muscle actuator '{name}': automatic lengthrange "
                    "computation failed — the transmission joint has no "
                    "range; add limits or an explicit lengthrange")
            g = float(np.asarray(m.actuator_gear[i, 0]))
            r = np.asarray(m.jnt_range[j], dtype=np.float64)
            lo, hi = sorted((g * r[0], g * r[1]))
        elif trn == int(TrnType.TENDON):
            t = m.actuator_trnid[i][0]
            bounded = bool(m.tendon_limited[t]) or any(
                m.jnt_limited[j] for j in range(m.njnt))
            if not bounded:
                raise ValueError(
                    f"muscle actuator '{name}': automatic lengthrange "
                    "computation failed — nothing bounds the tendon; add "
                    "joint/tendon limits or an explicit lengthrange")
            lo, hi = _simulate_range(m, int(i))
            if not (np.isfinite(lo) and np.isfinite(hi)) \
                    or abs(lo) > _DIVERGED or abs(hi) > _DIVERGED:
                raise ValueError(
                    f"muscle actuator '{name}': lengthrange probe diverged; "
                    "give an explicit lengthrange")
        else:
            raise ValueError(
                f"muscle actuator '{name}' needs an explicit lengthrange "
                "(automatic computation supports joint/tendon transmission)")
        if hi - lo < 1e-9:
            raise ValueError(
                f"muscle actuator '{name}': computed lengthrange is "
                f"degenerate [{lo}, {hi}]; give an explicit lengthrange")
        lr[i] = (lo, hi)
    return m.replace(actuator_lengthrange=jnp.asarray(
        lr, dtype=m.actuator_lengthrange.dtype))
