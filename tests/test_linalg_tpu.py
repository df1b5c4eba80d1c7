"""Batched Pallas Cholesky-solve kernel (ops/linalg_tpu.py) correctness.

Runs the kernel in interpret mode on CPU (MRP_PALLAS_LINALG=1) against
numpy reference solves — the same pattern tests/test_solver_tpu.py uses for
the fused solver kernel. The kernel replaces XLA-TPU's "Cholesky" +
"TriangularSolve" custom-calls, profiled at ~50% of pile step time (r4).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_ros_pkgs_tpu.ops import linalg_tpu


@pytest.fixture(autouse=True)
def _force_kernel(monkeypatch):
    monkeypatch.setenv("MRP_PALLAS_LINALG", "1")


def _spd(rng, B, n, scale=1.0):
    A = rng.normal(size=(B, n, n)).astype(np.float32) * scale
    return A @ np.transpose(A, (0, 2, 1)) + 3 * scale * scale * np.eye(
        n, dtype=np.float32)


@pytest.mark.parametrize("n", [1, 7, 8, 27, 72, 96])
def test_kernel_matches_numpy(n):
    """Direct interpret-mode run of the Pallas kernel (psd_solve routes CPU
    lowerings to the XLA path via lax.platform_dependent, so the kernel body
    itself is exercised through _solve_batched here)."""
    rng = np.random.default_rng(n)
    B = 5
    H = _spd(rng, B, n)
    g = rng.normal(size=(B, n)).astype(np.float32)
    x = linalg_tpu._solve_batched(jnp.asarray(H), jnp.asarray(g), n)
    ref = np.stack([np.linalg.solve(H[i], g[i]) for i in range(B)])
    np.testing.assert_allclose(np.asarray(x), ref,
                               atol=2e-5 * max(1.0, np.abs(ref).max()))


@pytest.mark.parametrize("n", [7, 27])
def test_psd_solve_api(n):
    rng = np.random.default_rng(n)
    B = 4
    H = _spd(rng, B, n)
    g = rng.normal(size=(B, n)).astype(np.float32)
    x = jax.vmap(linalg_tpu.psd_solve)(jnp.asarray(H), jnp.asarray(g))
    ref = np.stack([np.linalg.solve(H[i], g[i]) for i in range(B)])
    np.testing.assert_allclose(np.asarray(x), ref,
                               atol=2e-5 * max(1.0, np.abs(ref).max()))


def test_unbatched_path():
    rng = np.random.default_rng(0)
    H = _spd(rng, 1, 27)[0]
    g = rng.normal(size=(27,)).astype(np.float32)
    x = linalg_tpu.psd_solve(jnp.asarray(H), jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(H, g),
                               atol=2e-5)


def test_large_batch_padding():
    rng = np.random.default_rng(1)
    B, n = 200, 12   # non-multiple of the 128-lane block
    H = _spd(rng, B, n)
    g = rng.normal(size=(B, n)).astype(np.float32)
    x = linalg_tpu._solve_batched(jnp.asarray(H), jnp.asarray(g), n)
    ref = np.stack([np.linalg.solve(H[i], g[i]) for i in range(B)])
    np.testing.assert_allclose(np.asarray(x), ref, atol=2e-5)


def test_fp64_falls_back_to_xla():
    rng = np.random.default_rng(2)
    H = jnp.asarray(_spd(rng, 1, 9)[0], dtype=jnp.float64)
    g = jnp.asarray(rng.normal(size=(9,)), dtype=jnp.float64)
    x = linalg_tpu.psd_solve(H, g)
    assert x.dtype == jnp.float64
    np.testing.assert_allclose(np.asarray(x),
                               np.linalg.solve(np.asarray(H), np.asarray(g)),
                               atol=1e-10)


def test_ill_scaled_systems():
    rng = np.random.default_rng(3)
    H = _spd(rng, 3, 24, scale=30.0)    # condition-stress the f32 factor
    g = rng.normal(size=(3, 24)).astype(np.float32)
    x = linalg_tpu._solve_batched(jnp.asarray(H), jnp.asarray(g), 24)
    ref = np.stack([np.linalg.solve(H[i], g[i]) for i in range(3)])
    np.testing.assert_allclose(np.asarray(x), ref,
                               atol=1e-4 * max(1.0, np.abs(ref).max()))
