"""Forced coverage for the fused Pallas TPU solver (ops/solver_tpu.py).

The kernel is gated on TPU backends (``available()``), so without these tests
no CI run ever traces it — round 2 shipped a NameError in the cone block that
only fired on the chip. Interpret-mode execution of the *full* unrolled kernel
is too slow for CI (minutes of XLA-CPU compile), so coverage is split:

1. ``_row_forces`` — the cone/force math — is pure jnp. We evaluate it on
   tiles built from REAL scene Efc rows (BOXES condim-3, ARM7 limits, condim
   4/6 worlds) and random jar, and assert force/cost/Hessian parity against
   the reference ``solver._forces_and_weights`` on identical inputs. This is
   the layer where the round-2 NameError and the phantom condim-4 support
   lived; any rename/shape drift between the two implementations fails here
   on plain CPU.
2. ``solve_batched`` — the Pallas plumbing (ref layout, tiling, grid) — runs
   once in interpret mode on a tiny synthetic problem with ``niter=2`` and a
   condim-3 cone, asserting KKT optimality (grad ≈ 0 at the returned x) and
   f-row consistency. Small program, compiles in seconds.
3. ``supports()`` gating matches exactly what the kernel body implements.

Full step-level kernel-vs-jnp trajectory parity on the real chip is exercised
by bench.py (it asserts finiteness) and scripts/chip_parity.py.

Reference analogue: libmujoco's solver serves every model unconditionally
(mujoco_ros delegates to mj_step, mujoco_ros/src/mujoco_env.cpp:913-945).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core import mjcf
from mujoco_ros_pkgs_tpu.models import worlds
from mujoco_ros_pkgs_tpu.ops import forward as fwd
from mujoco_ros_pkgs_tpu.ops import efc as efc_mod
from mujoco_ros_pkgs_tpu.ops import solver, solver_tpu


CONDIM4_WORLD = """
<mujoco>
  <option timestep="0.002" iterations="8" cone="elliptic"/>
  <worldbody>
    <geom type="plane" size="2 2 0.1"/>
    <body pos="0 0 0.08">
      <freejoint/>
      <geom type="box" size="0.05 0.05 0.05" condim="4"
            friction="0.8 0.01 0.0001" mass="0.4"/>
    </body>
  </worldbody>
</mujoco>
"""

CONDIM6_WORLD = CONDIM4_WORLD.replace('condim="4"', 'condim="6"')


def _scene_efc(xml, qpos_noise=0.0, seed=0):
    """Build a real Efc from a scene (f32, post-contact state)."""
    m = mjcf.load_model_from_string(xml, dtype=jnp.float32)
    d = fwd.make_data(m, dtype=jnp.float32)
    key = jax.random.PRNGKey(seed)
    if qpos_noise:
        d = d.replace(qpos=d.qpos + qpos_noise * jax.random.normal(
            key, d.qpos.shape).astype(jnp.float32))
    # position-dependent stages so contacts exist and J/D/aref are realistic
    from mujoco_ros_pkgs_tpu.ops import smooth, collision
    d = smooth.fwd_position_smooth(m, d)
    d = collision.collide(m, d)
    efc = efc_mod.make_efc(m, d)
    return m, d, efc


def _tiles_from_rows(arr):
    """(nefc,) f32 -> list of (8,128) tiles broadcasting the scalar per row."""
    return [jnp.full((8, 128), v, dtype=jnp.float32) for v in np.asarray(arr)]


@pytest.mark.parametrize("name,xml", [
    ("boxes_condim3", worlds.BOXES),
    ("arm7_limits", worlds.ARM7),
    ("condim4", CONDIM4_WORLD),
    ("condim6", CONDIM6_WORLD),
])
def test_row_forces_matches_jnp(name, xml):
    """Kernel cone/force math == reference jnp math on real scene rows."""
    m, d, efc = _scene_efc(xml, qpos_noise=0.005)
    nefc = len(efc.kinds)
    assert nefc > 0
    # VMEM budget: scenes over 64 rows (arm7: 100) take the jnp path at
    # runtime (measured scoped-VMEM OOM on v5e) but the row MATH must still
    # agree — _row_forces is exercised directly below either way
    assert solver_tpu.supports(efc, m.nv) == (nefc <= 64), name

    key = jax.random.PRNGKey(1)
    jar = 0.05 * jax.random.normal(key, (nefc,)).astype(jnp.float32)

    # reference path
    f_ref, w_ref, cost_ref, groups = solver._forces_and_weights(m, efc, jar)

    # kernel path (pure jnp on (8,128) tiles; env-constant rows)
    con_rows = set()
    con_base = tuple(zip(efc.con_base, efc.con_dim))
    for base, dim in con_base:
        con_rows.update(range(base, base + dim))
    mu_tiles = [[jnp.full((8, 128), float(efc.con_mu[ci, k]), jnp.float32)
                 for k in range(5)] for ci in range(len(efc.con_base))]
    f_k, w_k, cost_k, Wcon = solver_tpu._row_forces(
        efc.kinds, con_rows, con_base, mu_tiles,
        _tiles_from_rows(efc.D), _tiles_from_rows(efc.frictionloss),
        [jnp.full((8, 128), bool(a)) for a in np.asarray(efc.active)],
        _tiles_from_rows(jar), want_w=True)

    f_k0 = np.array([np.asarray(t)[0, 0] for t in f_k])
    np.testing.assert_allclose(f_k0, np.asarray(f_ref), atol=1e-4, rtol=1e-4,
                               err_msg=f"{name}: row forces diverge")
    cost_k0 = float(sum(np.asarray(t)[0, 0] for t in cost_k))
    np.testing.assert_allclose(cost_k0, float(cost_ref), atol=1e-3, rtol=1e-3,
                               err_msg=f"{name}: cost diverges")
    # Hessian cone blocks vs reference W (same order: per contact)
    wi = 0
    for (idx, W_ref) in groups:
        C, dim = idx.shape
        for c in range(C):
            while Wcon[wi] is None:
                wi += 1
            Wk = Wcon[wi]
            for i in range(dim):
                for j in range(i + 1):
                    np.testing.assert_allclose(
                        float(np.asarray(Wk[(i, j)])[0, 0]),
                        float(W_ref[c, i, j]), atol=1e-3, rtol=1e-3,
                        err_msg=f"{name}: W[{i},{j}] contact {c}")
            wi += 1


def test_solve_batched_kkt():
    """Pallas plumbing end-to-end (interpret mode): tiny condim-3 problem,
    returned x satisfies the KKT condition M(x-a) = Jᵀ f(Jx-aref)."""
    nv, B = 3, 8
    kinds = ("lim", "con", "con", "con")
    con_base = ((1, 3),)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    A = jax.random.normal(ks[0], (B, nv, nv)).astype(jnp.float32)
    M = A @ jnp.swapaxes(A, 1, 2) + 3.0 * jnp.eye(nv)[None]
    J = jax.random.normal(ks[1], (B, 4, nv)).astype(jnp.float32)
    aref = 0.3 * jax.random.normal(ks[2], (B, 4)).astype(jnp.float32)
    D = jnp.abs(jax.random.normal(ks[3], (B, 4))).astype(jnp.float32) + 0.5
    floss = jnp.zeros((B, 4), jnp.float32)
    active = jnp.ones((B, 4), bool)
    mu = jnp.tile(jnp.asarray([[0.9, 0.9, 0.005, 1e-4, 1e-4]],
                              jnp.float32), (B, 1))[:, None, :]
    a_s = jax.random.normal(ks[4], (B, nv)).astype(jnp.float32)

    x, qf, frows = solver_tpu.solve_batched(
        kinds, con_base, nv, niter=6, nls=3, tol=1e-8, warmstart=False,
        J=J, aref=aref, D=D, floss=floss, active=active, mu=mu,
        M=M.astype(jnp.float32), a_s=a_s, ws=a_s)

    x = np.asarray(x)
    assert np.all(np.isfinite(x))
    # recompute forces at x via the pure-jnp row math and check both outputs
    jar = np.einsum('brv,bv->br', np.asarray(J), x) - np.asarray(aref)
    grad_norms = []
    for b in range(B):
        mu_tiles = [[jnp.full((8, 128), float(mu[b, 0, k]), jnp.float32)
                     for k in range(5)]]
        f_t, _, _, _ = solver_tpu._row_forces(
            kinds, {1, 2, 3}, con_base, mu_tiles,
            _tiles_from_rows(D[b]), _tiles_from_rows(floss[b]),
            [jnp.full((8, 128), True)] * 4, _tiles_from_rows(jar[b]), False)
        f_b = np.array([np.asarray(t)[0, 0] for t in f_t])
        np.testing.assert_allclose(np.asarray(frows)[b], f_b, atol=2e-4,
                                   err_msg=f"env {b}: f rows inconsistent")
        np.testing.assert_allclose(
            np.asarray(qf)[b], np.asarray(J)[b].T @ f_b, atol=2e-3,
            err_msg=f"env {b}: qfrc != Jᵀf")
        grad = (np.asarray(M)[b] @ (x[b] - np.asarray(a_s)[b])
                - np.asarray(J)[b].T @ f_b)
        grad_norms.append(np.linalg.norm(grad))
    # converged to the strictly-convex optimum
    assert np.median(grad_norms) < 5e-2, grad_norms


def test_supports_gating():
    """supports() accepts exactly the shapes the kernel body implements."""
    class FakeEfc:
        def __init__(self, dims, nkinds):
            self.con_dim = dims
            self.kinds = tuple(["lim"] * nkinds)

    assert solver_tpu.supports(FakeEfc((1, 3, 4, 6), 20), nv=7)
    assert not solver_tpu.supports(FakeEfc((2,), 4), nv=7)
    assert not solver_tpu.supports(FakeEfc((3,), 4), nv=64)
