"""Broad phase: speculative AABB overlap → fixed-capacity candidate pair list.

The reference maintains two incrementally-refined BVHs and enumerates overlaps by
recursive tree traversal (reference: CollisionDetection/BroadPhase.cs:18,
Trees/Tree_SelfQueries.cs). Deep pointer-chasing tree descent is hostile to XLA, so the
TPU design offers two sort-free/fixed-shape strategies, both emitting the same
``(pair_a, pair_b, valid)`` arrays of static capacity:

- ``brute_force``: full N×N AABB test (upper triangle). Exact; one big fused elementwise
  pass; ideal up to a few thousand collidables.
- ``sweep``: sort by AABB min-x, compare each body only against the next K bodies in
  sorted order (windowed sweep-and-prune). O(N·K) with fixed shapes; exact as long as no
  x-slab contains more than K overlapping successors (window overflow is detected and
  reported so capacity can be raised).

Pairs with both endpoints non-dynamic or both asleep are dropped (the reference likewise
never tests static-static / sleeping-sleeping; BroadPhase active/static tree split).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..bodies import KIND_DYNAMIC, KIND_EMPTY
from ..utils.vec import Vec3


class PairList(NamedTuple):
    a: jnp.ndarray  # (MPAIR,) int32 body slot (a < b)
    b: jnp.ndarray  # (MPAIR,) int32
    valid: jnp.ndarray  # (MPAIR,) bool
    overflow: jnp.ndarray  # () bool — candidate count exceeded capacity


def _pair_filter(kind, awake):
    """(N, N) upper-triangular admissibility: at least one awake dynamic, both exist."""
    exists = kind != KIND_EMPTY
    active_dynamic = (kind == KIND_DYNAMIC) & awake
    either_active = active_dynamic[:, None] | active_dynamic[None, :]
    both_exist = exists[:, None] & exists[None, :]
    iu = jnp.triu(jnp.ones((kind.shape[0], kind.shape[0]), bool), k=1)
    return both_exist & either_active & iu


def brute_force(aabb_min: Vec3, aabb_max: Vec3, kind, awake, max_pairs: int) -> PairList:
    n = kind.shape[0]
    overlap = (
        (aabb_min.x[:, None] <= aabb_max.x[None, :])
        & (aabb_min.y[:, None] <= aabb_max.y[None, :])
        & (aabb_min.z[:, None] <= aabb_max.z[None, :])
        & (aabb_max.x[:, None] >= aabb_min.x[None, :])
        & (aabb_max.y[:, None] >= aabb_min.y[None, :])
        & (aabb_max.z[:, None] >= aabb_min.z[None, :])
    )
    mask = overlap & _pair_filter(kind, awake)
    count = jnp.sum(mask)
    ai, bi = jnp.nonzero(mask, size=max_pairs, fill_value=0)
    idx = jnp.arange(max_pairs)
    valid = idx < count
    return PairList(ai.astype(jnp.int32), bi.astype(jnp.int32), valid, count > max_pairs)


def sweep(aabb_min: Vec3, aabb_max: Vec3, kind, awake, max_pairs: int, window: int = 64) -> PairList:
    """Windowed sweep-and-prune along x. Fixed shapes: (N, window) candidate matrix."""
    n = kind.shape[0]
    exists = kind != KIND_EMPTY
    # Sort by min-x; non-existent slots to +inf so they cluster at the end.
    key = jnp.where(exists, aabb_min.x, jnp.inf)
    order = jnp.argsort(key)
    inv = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

    s_min = aabb_min[order]
    s_max = aabb_max[order]
    s_kind = kind[order]
    s_awake = awake[order]

    # Candidate j = order position i+1 … i+window.
    offs = jnp.arange(1, window + 1)
    j_pos = jnp.arange(n)[:, None] + offs[None, :]
    j_clamped = jnp.minimum(j_pos, n - 1)
    in_range = j_pos < n

    def gv(v):
        return v[j_clamped]

    o_min = Vec3(gv(s_min.x), gv(s_min.y), gv(s_min.z))
    o_max = Vec3(gv(s_max.x), gv(s_max.y), gv(s_max.z))
    # x overlap by sweep invariant: candidate's min-x <= our max-x.
    x_ok = o_min.x <= s_max.x[:, None]
    yz_ok = (
        (s_min.y[:, None] <= o_max.y)
        & (s_max.y[:, None] >= o_min.y)
        & (s_min.z[:, None] <= o_max.z)
        & (s_max.z[:, None] >= o_min.z)
    )
    ok = in_range & x_ok & yz_ok

    o_kind = s_kind[j_clamped]
    o_awake = s_awake[j_clamped]
    active_dyn_i = ((s_kind == KIND_DYNAMIC) & s_awake)[:, None]
    active_dyn_j = (o_kind == KIND_DYNAMIC) & o_awake
    exist_i = (s_kind != KIND_EMPTY)[:, None]
    exist_j = o_kind != KIND_EMPTY
    ok = ok & (active_dyn_i | active_dyn_j) & exist_i & exist_j

    # Window overflow: some body's x-interval reaches beyond its window.
    last = jnp.minimum(jnp.arange(n) + window, n - 1)
    reach = jnp.where(exists[order], s_min.x[last] <= s_max.x, False)
    tail_ok = (jnp.arange(n) + window) >= (n - 1)
    overflow_window = jnp.any(reach & ~tail_ok)

    count = jnp.sum(ok)
    ii, jj = jnp.nonzero(ok, size=max_pairs, fill_value=0)
    orig_i = order[ii]
    orig_j = order[jnp.minimum(ii + 1 + jj, n - 1)]
    a = jnp.minimum(orig_i, orig_j).astype(jnp.int32)
    b = jnp.maximum(orig_i, orig_j).astype(jnp.int32)
    valid = jnp.arange(max_pairs) < count
    return PairList(a, b, valid, (count > max_pairs) | overflow_window)
