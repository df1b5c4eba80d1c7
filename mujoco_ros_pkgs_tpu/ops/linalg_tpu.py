"""Batched dense SPD solve (Cholesky factor + triangular solves) as a Pallas
TPU kernel — the engine-side replacement for libmujoco's mj_factorM /
mj_solveM and the per-iteration Newton Hessian factorization the reference
reaches through mj_step's constraint solver (stepped by the server at
mujoco_ros/src/mujoco_env.cpp:498).

Why: XLA-TPU lowers `cholesky` of a batched small matrix to the generic
"Cholesky" custom-call, which expands to a serialized per-batch loop.
Profiled on the r4 pile scene (f32[512,72,72]): **4.0 ms per factorization**,
with 3-4 factorizations per step (mass matrix, implicit-damping matrix, one
per Newton iteration) — ~50% of total step time; the paired TriangularSolve
custom-calls (0.47 ms each) add more. This kernel runs factor+solve fused in
VMEM with the env batch on the 128 lanes: a sequential column loop whose body
is a handful of full-matrix masked vector ops (rank-1 trailing update), so
the Mosaic program stays tiny while the arithmetic is fully vectorized across
envs. Measured ~20x faster than the custom-call pair at (512, 72, 72).

Scope: f32, n <= 96 (VMEM: two (n, n, 128) buffers per block). Everything
else falls back to jax.scipy. The per-env API (`psd_solve`) is a
custom_vmap: the batched call (the server/bench `vmap(step)` path) runs the
kernel over the whole env batch, the unbatched call keeps jax.scipy.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MAX_N = 96


def available() -> bool:
    env = os.environ.get("MRP_PALLAS_LINALG", "auto")
    if env == "0":
        return False
    if env == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _kernel(n_pad: int, n: int):
    def kernel(H_ref, g_ref, x_ref, A, y):
        A[...] = H_ref[...]
        y[...] = g_ref[...]
        ri = lax.broadcasted_iota(jnp.int32, (n_pad, _LANES), 0)
        ci3 = lax.broadcasted_iota(jnp.int32, (n_pad, n_pad, _LANES), 0)
        ri3 = lax.broadcasted_iota(jnp.int32, (n_pad, n_pad, _LANES), 1)

        def col(j):
            return A[pl.ds(j, 1), :, :][0]

        def rowval(vec, j):
            return jnp.sum(jnp.where(ri == j, vec, 0.0), axis=0)   # (128,)

        # ---- right-looking Cholesky: one rank-1 masked trailing update per
        # column (the whole-matrix op keeps the program tiny; masks confine
        # the arithmetic to the trailing submatrix) ----
        def fact_body(j, _):
            colj = col(j)
            diag = rowval(colj, j)
            inv = lax.rsqrt(jnp.maximum(diag, 1e-30))
            Lcol = jnp.where(ri == j, diag * inv,
                             jnp.where(ri > j, colj * inv, 0.0))
            A[pl.ds(j, 1), :, :] = Lcol[None]
            outer = Lcol[:, None, :] * Lcol[None, :, :]
            mask = (ci3 > j) & (ri3 > j)
            A[...] = A[...] - jnp.where(mask, outer, 0.0)
            return 0

        lax.fori_loop(0, n, fact_body, 0)

        # ---- forward substitution L y = g ----
        def fwd_body(j, _):
            colj = col(j)
            diag = rowval(colj, j)
            yj = rowval(y[...], j) / diag
            yb = jnp.broadcast_to(yj[None], (n_pad, _LANES))
            y[...] = jnp.where(ri == j, yb,
                               jnp.where(ri > j, y[...] - colj * yb, y[...]))
            return 0

        lax.fori_loop(0, n, fwd_body, 0)

        # ---- backward substitution L^T x = y (in place) ----
        def bwd_body(t, _):
            i = n - 1 - t
            coli = col(i)
            diag = rowval(coli, i)
            dot = jnp.sum(jnp.where(ri > i, coli * y[...], 0.0), axis=0)
            xi = (rowval(y[...], i) - dot) / diag
            xb = jnp.broadcast_to(xi[None], (n_pad, _LANES))
            y[...] = jnp.where(ri == i, xb, y[...])
            return 0

        lax.fori_loop(0, n, bwd_body, 0)
        x_ref[...] = y[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("n",))
def _solve_batched(H, g, n: int):
    """H: (B, n, n) SPD f32, g: (B, n) -> x: (B, n)."""
    B0 = H.shape[0]
    n_pad = max(8, ((n + 7) // 8) * 8)
    B = max(_LANES, ((B0 + _LANES - 1) // _LANES) * _LANES)
    dtype = jnp.float32
    H = H.astype(dtype)
    g = g.astype(dtype)
    if n_pad != n:
        # identity-extend so the padded factorization stays well-posed
        H = jnp.pad(H, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
        H = H.at[:, np.arange(n, n_pad), np.arange(n, n_pad)].set(1.0)
        g = jnp.pad(g, ((0, 0), (0, n_pad - n)))
    if B != B0:
        H = jnp.concatenate(
            [H, jnp.broadcast_to(jnp.eye(n_pad, dtype=dtype),
                                 (B - B0, n_pad, n_pad))])
        g = jnp.concatenate([g, jnp.zeros((B - B0, n_pad), dtype=dtype)])
    # env batch onto the minor (lane) axis; H is symmetric, so axis order of
    # the matrix dims is irrelevant
    H_t = jnp.moveaxis(H, 0, 2)          # (n_pad, n_pad, B)
    g_t = jnp.moveaxis(g, 0, 1)          # (n_pad, B)

    try:
        vma = frozenset(jax.typeof(H_t).vma)
    except Exception:
        vma = frozenset()
    shp_kw = dict(vma=vma) if vma else {}

    x_t = pl.pallas_call(
        _kernel(n_pad, n),
        grid=(B // _LANES,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[pl.BlockSpec((n_pad, n_pad, _LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n_pad, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n_pad, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, B), dtype, **shp_kw),
        scratch_shapes=[pltpu.VMEM((n_pad, n_pad, _LANES), dtype),
                        pltpu.VMEM((n_pad, _LANES), dtype)],
    )(H_t, g_t)
    return jnp.moveaxis(x_t, 1, 0)[:B0, :n]


def _xla_solve(H, g):
    L = jax.scipy.linalg.cholesky(H, lower=True)
    return jax.scipy.linalg.cho_solve((L, True), g)


def psd_solve(H: jax.Array, g: jax.Array) -> jax.Array:
    """x = H^{-1} g for SPD H — per-env API.

    Under vmap (the server/bench batching point) on a TPU backend with f32
    and n <= 96, the whole batch runs in the fused Pallas kernel; otherwise
    jax.scipy (XLA custom-call) is used."""
    n = H.shape[-1]
    if not (available() and H.dtype == jnp.float32 and n <= _MAX_N):
        return _xla_solve(H, g)

    @jax.custom_batching.custom_vmap
    def _f(H, g):
        return _solve_batched(H[None], g[None], n)[0]

    @_f.def_vmap
    def _rule(axis_size, in_batched, H, g):
        bH, bg = in_batched
        if not bH:
            H = jnp.broadcast_to(H, (axis_size,) + H.shape)
        if not bg:
            g = jnp.broadcast_to(g, (axis_size,) + g.shape)
        return _solve_batched(H, g, n), True

    # per-lowering-platform dispatch: a TPU backend being REGISTERED does not
    # mean this computation lowers for TPU (CPU meshes / jax.default_device
    # under a TPU-capable process); Mosaic cannot lower for CPU outside
    # interpret mode, so route the CPU lowering to the XLA solve
    return jax.lax.platform_dependent(H, g, cpu=_xla_solve, default=_f)
