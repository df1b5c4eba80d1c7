"""Broadphase: in-graph bounding-volume sweep gating the narrowphase.

The reference gets libmujoco's sweep-and-prune for free (mj_collision's
broadphase in engine_collision_driver.c); this repo's pair table is static,
so without gating EVERY compile-time pair runs narrowphase every step —
fine at tens of geoms, O(pairs) dense work for a contact-rich pile.

TPU-native design: a data-dependent *pair list* is hostile to XLA (dynamic
shapes), so the broadphase is a fixed-shape TOP-K COMPACTION. Per
narrowphase group (same type pair / mesh data / condim), a cheap separation
score is computed for ALL pairs in one vectorized program, `lax.top_k`
selects the K most-overlapping pairs, and only those K run the (expensive)
narrowphase — with TRACED geom ids flowing into dynamically-indexed contact
slots (Contact.dyn_pair). K is `m.pair_topk` (0 disables compaction: the
reference-exact behavior; every parity test runs in that mode).

Unlike libmujoco's exact AABB sweep this is approximate when more than K
pairs of one group truly overlap — `candidate_overflow()` measures exactly
that, per step, so servers/benchmarks can assert K was large enough.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mujoco_ros_pkgs_tpu.core.types import Data, GeomType, Model


def pair_scores(m: Model, d: Data, g1s: np.ndarray, g2s: np.ndarray,
                t1: GeomType) -> jax.Array:
    """Separation score for each pair (negative = bounding volumes overlap).

    Sphere-bound test |x1-x2| - r1 - r2 - margin for finite geoms; halfspace
    test n·(x2-x1) - r2 - margin when geom1 is a plane (planes have no
    bounding sphere). Margins are the pair maxima so margin-activated
    contacts stay visible to the broadphase.
    """
    x1 = d.geom_xpos[g1s]
    x2 = d.geom_xpos[g2s]
    r1 = m.geom_rbound[g1s]
    r2 = m.geom_rbound[g2s]
    margin = jnp.maximum(m.geom_margin[g1s], m.geom_margin[g2s])
    if t1 == GeomType.PLANE:
        n = d.geom_xmat[g1s][:, :, 2]                 # plane +z normal
        sep = jnp.einsum('pk,pk->p', n, x2 - x1) - r2
    else:
        sep = jnp.linalg.norm(x2 - x1 + 1e-12, axis=1) - r1 - r2
    return sep - margin


def compactable(t1: GeomType, t2: GeomType) -> bool:
    """Whether a (t1, t2) group may be top-k compacted: both geoms need a
    bounding volume the score understands. HFIELDs (rbound 0, not a
    halfspace) and plane-plane keep the static path."""
    if t1 == GeomType.HFIELD or t2 == GeomType.HFIELD:
        return False
    if t2 == GeomType.PLANE:          # plane always sorts first (t1 <= t2)
        return False
    return True


def candidate_overflow(m: Model, d: Data) -> jax.Array:
    """Number of bounding-volume-overlapping pairs the top-k compaction
    DROPPED this step (scalar int32; 0 = the contact set is exact).

    Servers surface this through get_solver_stats; benchmarks assert 0."""
    from mujoco_ros_pkgs_tpu.ops import narrowphase as np_

    total = jnp.zeros((), dtype=jnp.int32)
    for grp in np_.pair_groups(m):
        if not grp["topk"]:
            continue
        sep = pair_scores(m, d, grp["g1s"], grp["g2s"], grp["key"][1])
        n_overlap = jnp.sum((sep < 0).astype(jnp.int32))
        total = total + jnp.maximum(n_overlap - grp["topk"], 0)
    return total
