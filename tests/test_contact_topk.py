"""Active-contact solver compaction (m.con_topk).

With K above the per-env active-contact count, dropping the inactive slots is
exact: every per-slot quantity of an inactive slot contributes an exact zero
to the solver's reductions, and the compaction preserves slot order (sorted
top-k), so trajectories must be IDENTICAL to the uncompacted solve.
This is the TPU twin of mj_makeConstraint instantiating only active contacts
(libmujoco engine_core_constraint.c, reached by the reference server through
mj_step at mujoco_ros/src/mujoco_env.cpp:498)."""

import numpy as np
import jax

from mujoco_ros_pkgs_tpu.core import mjcf
from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.ops import forward as fwd


def _traj(con_topk, nsteps=40):
    m = mjcf.load_model_from_string(worlds.PILE, con_topk=con_topk)
    d = fwd.make_data(m)
    step = jax.jit(lambda d: fwd.step(m, d))
    out = []
    for _ in range(nsteps):
        d = step(d)
        out.append(np.asarray(d.qpos))
    return m, d, np.stack(out)


def test_con_topk_exact_when_capacity_sufficient():
    m0, d0, t0 = _traj(0)
    m64, d64, t64 = _traj(64)
    # block view is genuinely compacted
    from mujoco_ros_pkgs_tpu.ops import efc as efcmod
    e = efcmod.make_efc(m64, fwd.forward(m64, fwd.make_data(m64)))
    assert any(J.shape[0] == 64 for J in e.cb_J)
    assert any(dst is None for dst in e.cb_dest)
    np.testing.assert_array_equal(t64, t0)
    np.testing.assert_array_equal(np.asarray(d64.efc_force_contact),
                                  np.asarray(d0.efc_force_contact))


def test_con_topk_noop_when_capacity_above_slots():
    # K >= slot count: no compaction path is taken at all
    m = mjcf.load_model_from_string(worlds.PILE, con_topk=100000)
    from mujoco_ros_pkgs_tpu.ops import efc as efcmod
    e = efcmod.make_efc(m, fwd.forward(m, fwd.make_data(m)))
    assert all(dst is not None for dst in e.cb_dest)
