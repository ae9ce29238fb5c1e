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
from ..utils.packing import compact_true
from ..utils.vec import Vec3


class PairList(NamedTuple):
    a: jnp.ndarray  # (MPAIR,) int32 body slot (a < b)
    b: jnp.ndarray  # (MPAIR,) int32
    valid: jnp.ndarray  # (MPAIR,) bool
    overflow: jnp.ndarray  # () bool — candidate count exceeded capacity
    # (6,) int32 TRUE demand counters (pre-clamp), the inputs of demand-driven sizing
    # (reference SimulationAllocationSizes sizing-from-live-counts):
    # [candidate pairs, grid entries, grid large set, max per-row candidates,
    #  cell-window overflow flag, per-row-k overflow flag]. The two flags drive
    #  geometric (doubling) growth where a cheap exact count doesn't exist.
    demand: jnp.ndarray = None


def _demand(pairs=0, entries=0, large=0, max_row=0, window_hit=False,
            rowk_hit=False):
    return jnp.stack([
        jnp.asarray(pairs, jnp.int32), jnp.asarray(entries, jnp.int32),
        jnp.asarray(large, jnp.int32), jnp.asarray(max_row, jnp.int32),
        jnp.asarray(window_hit, jnp.int32), jnp.asarray(rowk_hit, jnp.int32),
    ])


def _pair_filter(kind, awake, group):
    """(N, N) upper-triangular admissibility: at least one awake dynamic, both exist,
    not filtered by a shared nonzero collision group (reference
    INarrowPhaseCallbacks.AllowContactGeneration / demo SubgroupCollisionFilter)."""
    exists = kind != KIND_EMPTY
    active_dynamic = (kind == KIND_DYNAMIC) & awake
    either_active = active_dynamic[:, None] | active_dynamic[None, :]
    both_exist = exists[:, None] & exists[None, :]
    group_ok = (group[:, None] != group[None, :]) | (group == 0)[:, None]
    # Lower triangle: each pair lives in the LARGER index's row. Scenes list big statics
    # (ground, meshes) first, so this keeps per-row partner counts bounded by local
    # contact valence instead of concentrating thousands of pairs in the ground's row
    # (matters for brute_force's per-row compaction cap).
    tl = jnp.tril(jnp.ones((kind.shape[0], kind.shape[0]), bool), k=-1)
    return both_exist & either_active & group_ok & tl


def brute_force(
    aabb_min: Vec3, aabb_max: Vec3, kind, awake, group, max_pairs: int,
    row_candidates: int = 32,
) -> PairList:
    """Exact N×N AABB pair test with two-stage compaction.

    A single ``jnp.nonzero`` over the N² mask lowers to a scatter over N² elements —
    measured 151 ms at N=4160 on TPU, dominating the whole step. Instead: per-row prefix
    sums locate each row's first ``row_candidates`` hits via vmapped binary search (cheap
    fused reductions + (N·K) gathers), then one small nonzero compacts (N·K) → max_pairs.
    Rows with more than ``row_candidates`` partners (b > a side only) raise the overflow
    flag, never silently drop."""
    import jax

    n = kind.shape[0]
    overlap = (
        (aabb_min.x[:, None] <= aabb_max.x[None, :])
        & (aabb_min.y[:, None] <= aabb_max.y[None, :])
        & (aabb_min.z[:, None] <= aabb_max.z[None, :])
        & (aabb_max.x[:, None] >= aabb_min.x[None, :])
        & (aabb_max.y[:, None] >= aabb_min.y[None, :])
        & (aabb_max.z[:, None] >= aabb_min.z[None, :])
    )
    mask = overlap & _pair_filter(kind, awake, group)

    k = min(row_candidates, n)
    # Per-row compaction via top_k (a custom call XLA materializes once — a fused
    # cumsum+binary-search formulation was rematerialized per consumer and cost 17ms/step
    # in context): the k smallest column indices with mask set, per row.
    score = jnp.where(mask, -jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1), -(2**30))
    neg_cols, _ = jax.lax.top_k(score, k)
    valid_rk = neg_cols > -(2**30)
    cols = jnp.where(valid_rk, -neg_cols, 0)
    row_counts = jnp.sum(mask, axis=1)

    count = jnp.sum(jnp.minimum(row_counts, k))  # pairs actually harvested
    fi, _ = compact_true(valid_rk, max_pairs)
    # One payload ROW gather instead of a (row, col) 2D element gather (~30 ns/element
    # × max_pairs — see grid2 decode note).
    payload = jnp.stack(
        [jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k)), cols],
        axis=-1,
    ).reshape(n * k, 2)
    pr = payload[fi]
    ai = pr[:, 0]
    bi = pr[:, 1]
    valid = jnp.arange(max_pairs) < count
    overflow = (count > max_pairs) | jnp.any(row_counts > k)
    # Row index is the larger body (lower-triangle mask); report pairs as (a < b).
    return PairList(
        bi.astype(jnp.int32), ai.astype(jnp.int32), valid, overflow,
        _demand(pairs=jnp.sum(row_counts), max_row=jnp.max(row_counts)),
    )


def brute_force_rows(
    aabb_min: Vec3, aabb_max: Vec3, kind, awake, group, row_start, row_count: int,
    max_pairs: int,
) -> PairList:
    """Row-block brute force for the sharded single-world step: tests rows
    [row_start, row_start+row_count) of the upper-triangular N×N pair matrix. Each device
    of a mesh owns one row block (pair (a,b), a<b, lives on the device owning row a —
    stable across frames, so the warm-start cache stays local). ``row_start`` may be a
    traced value (device index × block)."""
    import jax

    n = kind.shape[0]
    rows = row_start + jnp.arange(row_count)
    r = lambda x: jax.lax.dynamic_slice_in_dim(x, row_start, row_count)
    overlap = (
        (r(aabb_min.x)[:, None] <= aabb_max.x[None, :])
        & (r(aabb_min.y)[:, None] <= aabb_max.y[None, :])
        & (r(aabb_min.z)[:, None] <= aabb_max.z[None, :])
        & (r(aabb_max.x)[:, None] >= aabb_min.x[None, :])
        & (r(aabb_max.y)[:, None] >= aabb_min.y[None, :])
        & (r(aabb_max.z)[:, None] >= aabb_min.z[None, :])
    )
    exists = kind != KIND_EMPTY
    active_dynamic = (kind == KIND_DYNAMIC) & awake
    either_active = r(active_dynamic)[:, None] | active_dynamic[None, :]
    both_exist = r(exists)[:, None] & exists[None, :]
    group_ok = (r(group)[:, None] != group[None, :]) | (r(group) == 0)[:, None]
    # Pair lives in the LARGER index's row (see _pair_filter) — big early-slot statics
    # don't concentrate every pair on one device.
    lower = rows[:, None] > jnp.arange(n)[None, :]
    mask = overlap & both_exist & either_active & group_ok & lower
    count = jnp.sum(mask)
    fi, _ = compact_true(mask, max_pairs)
    ai = fi // n
    bi = fi % n
    valid = jnp.arange(max_pairs) < count
    return PairList(
        bi.astype(jnp.int32),
        (ai.astype(jnp.int32) + row_start).astype(jnp.int32),
        valid,
        count > max_pairs,
        _demand(pairs=count),
    )


def sweep(aabb_min: Vec3, aabb_max: Vec3, kind, awake, group, max_pairs: int, window: int = 64) -> PairList:
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
    s_group = group[order]

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
    o_group = s_group[j_clamped]
    group_ok = (s_group[:, None] != o_group) | (s_group == 0)[:, None]
    ok = ok & (active_dyn_i | active_dyn_j) & exist_i & exist_j & group_ok

    # Window overflow: some body's x-interval reaches beyond its window.
    last = jnp.minimum(jnp.arange(n) + window, n - 1)
    reach = jnp.where(exists[order], s_min.x[last] <= s_max.x, False)
    tail_ok = (jnp.arange(n) + window) >= (n - 1)
    overflow_window = jnp.any(reach & ~tail_ok)

    # Two-stage compaction (see brute_force): per-row prefix sums + binary search pick
    # each row's first ≤k hits from its window (the (N, window) cumsum is small enough
    # to gather from quickly), then one small nonzero compacts (N·k) → max_pairs.
    import jax

    k = min(32, window)
    row_cum = jnp.cumsum(ok.astype(jnp.int32), axis=1)
    row_counts = row_cum[:, -1]
    ks = jnp.arange(1, k + 1)
    cand = jnp.minimum(jax.vmap(lambda rc: jnp.searchsorted(rc, ks))(row_cum), window - 1)
    valid_rk = (ks - 1)[None, :] < row_counts[:, None]
    count = jnp.sum(jnp.minimum(row_counts, k))
    fi, _ = compact_true(valid_rk, max_pairs)
    ii = fi // k
    ki = fi % k
    jj = cand[ii, ki]
    orig_i = order[ii]
    orig_j = order[jnp.minimum(ii + 1 + jj, n - 1)]
    a = jnp.minimum(orig_i, orig_j).astype(jnp.int32)
    b = jnp.maximum(orig_i, orig_j).astype(jnp.int32)
    valid = jnp.arange(max_pairs) < count
    overflow = (count > max_pairs) | overflow_window | jnp.any(row_counts > k)
    return PairList(
        a, b, valid, overflow,
        _demand(pairs=jnp.sum(row_counts), max_row=jnp.max(row_counts)),
    )

def grid2(
    aabb_min: Vec3,
    aabb_max: Vec3,
    kind,
    awake,
    group,
    max_pairs: int,
    cell_size: float = 0.0,
    cell_capacity: int = 16,
    max_large: int = 64,
    entry_factor: int = 7,
    cell_factor: float = 1.2,
    pair_k: int = 8,
) -> PairList:
    """Replicated-cell-entry broad phase — the gather-free large-N structure.

    The stencil grid (``grid``) gathers (N, 14·K) candidate rows per frame; XLA tiles the
    (rows, 8) gather output (8, 128) → 16x lane padding → a 14 GB temp at 64k bodies
    (HBM OOM; BASELINE.md roadmap item 2), and the gather itself costs ~N·stencil serial
    row fetches. This design inverts it: each small body INSERTS an entry into every cell
    its AABB overlaps (≤ 8 cells when extent ≤ cell size), entries are sorted once by
    cell key (stable argsort of 8N int32 — cheap), and candidate pairs are entries within
    ``cell_capacity`` positions in sorted order with equal keys — pure shift/roll
    comparisons with NO gathers beyond one packed (E_CAP, 8) feature fetch. A pair
    sharing several cells is deduplicated by the HOME-CELL rule: it is emitted only from
    the cell containing max(min_a, min_b) (the min corner of the AABB intersection, which
    lies in a cell both bodies occupy — component-wise, so exactly one cell).

    Capacities (all overflow-detected, never silent): E_CAP = entry_factor·N sorted
    entries; same-cell window = cell_capacity; per-entry emitted pairs ≤ 8;
    ``max_large`` oversized bodies (extent > cell) tested against everyone.

    ``cell_size <= 0`` → adaptive: cell_factor × median live AABB extent (traced value,
    no recompile). Larger cells mean fewer entries per body but more bodies per cell.
    """
    import jax

    n = kind.shape[0]
    exists = kind != KIND_EMPTY
    active_dynamic = (kind == KIND_DYNAMIC) & awake

    ext = aabb_max - aabb_min
    max_ext = jnp.maximum(ext.x, jnp.maximum(ext.y, ext.z))
    if cell_size and cell_size > 0:
        cs = jnp.float32(cell_size)
    else:
        live_ext = jnp.where(exists, max_ext, jnp.nan)
        cs = jnp.maximum(jnp.nanmedian(live_ext) * jnp.float32(cell_factor), 1e-3)
        # Clamp from below by the k-th largest live extent so at most k-1 bodies can
        # classify as 'large' — a uniform extent distribution around the median would
        # otherwise overflow max_large (median×factor splits the upper tail, not a
        # fixed count).
        k_lim = max(2, min(max_large // 2, n))
        top_ext, _ = jax.lax.top_k(jnp.where(exists, max_ext, -jnp.inf), k_lim)
        cs = jnp.maximum(cs, top_ext[k_lim - 1])
    large = exists & (max_ext > cs)
    small = exists & ~large
    inv_cs = 1.0 / cs

    # Min-corner cell + whether the AABB crosses into the next cell per axis.
    c0x = jnp.floor(aabb_min.x * inv_cs).astype(jnp.int32)
    c0y = jnp.floor(aabb_min.y * inv_cs).astype(jnp.int32)
    c0z = jnp.floor(aabb_min.z * inv_cs).astype(jnp.int32)
    ox = (jnp.floor(aabb_max.x * inv_cs).astype(jnp.int32) > c0x) & small
    oy = (jnp.floor(aabb_max.y * inv_cs).astype(jnp.int32) > c0y) & small
    oz = (jnp.floor(aabb_max.z * inv_cs).astype(jnp.int32) > c0z) & small

    def cell_key(ix, iy, iz):
        return ((ix & 1023) << 20) | ((iy & 1023) << 10) | (iz & 1023)

    BIGKEY = jnp.int32(2**31 - 1)
    # 8 entry slots per body; slot j = (dx, dy, dz) bits of j.
    dx = jnp.arange(8, dtype=jnp.int32) & 1
    dy = (jnp.arange(8, dtype=jnp.int32) >> 1) & 1
    dz = (jnp.arange(8, dtype=jnp.int32) >> 2) & 1
    evalid = (
        small[:, None]
        & ((dx[None, :] == 0) | ox[:, None])
        & ((dy[None, :] == 0) | oy[:, None])
        & ((dz[None, :] == 0) | oz[:, None])
    )
    ekey = jnp.where(
        evalid,
        cell_key(c0x[:, None] + dx[None, :], c0y[:, None] + dy[None, :],
                 c0z[:, None] + dz[None, :]),
        BIGKEY,
    ).reshape(-1)
    ebody = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, 8)
    ).reshape(-1)

    entry_count = jnp.sum(evalid)
    E_CAP = min(_round_up_int(entry_factor * n, 128), 8 * n)
    # ONE stable multi-operand sort carries the body payload with the keys (two 1D
    # permute-gathers of 8N elements cost more than the sort itself — ~7ns/element).
    # Stable: same-cell entries stay in (body, slot) order — deterministic.
    skey, sbody = jax.lax.sort((ekey, ebody), num_keys=1, is_stable=True)
    skey = skey[:E_CAP]
    sbody = sbody[:E_CAP]
    overflow_entries = entry_count > E_CAP

    # Packed per-entry features: ONE row gather (see ``grid`` packing rationale).
    flags = active_dynamic.astype(jnp.float32)
    feat = jnp.stack(
        [aabb_min.x, aabb_min.y, aabb_min.z, aabb_max.x, aabb_max.y, aabb_max.z,
         group.astype(jnp.float32), flags],
        axis=-1,
    )  # (N, 8)
    f = feat[sbody]  # (E_CAP, 8)
    fmin_x, fmin_y, fmin_z = f[:, 0], f[:, 1], f[:, 2]
    fmax_x, fmax_y, fmax_z = f[:, 3], f[:, 4], f[:, 5]
    fgroup = f[:, 6]
    factive = f[:, 7] >= 1.0

    W = cell_capacity
    pos_e = jnp.arange(E_CAP, dtype=jnp.int32)

    def rolled(x, d):
        return jnp.roll(x, -d, axis=0)

    ok_cols = []
    for d in range(1, W + 1):
        in_range = (pos_e + d) < E_CAP
        same_cell = (skey == rolled(skey, d)) & (skey != BIGKEY) & in_range
        r_min_x, r_min_y, r_min_z = rolled(fmin_x, d), rolled(fmin_y, d), rolled(fmin_z, d)
        overlap = (
            (fmin_x <= rolled(fmax_x, d)) & (fmax_x >= r_min_x)
            & (fmin_y <= rolled(fmax_y, d)) & (fmax_y >= r_min_y)
            & (fmin_z <= rolled(fmax_z, d)) & (fmax_z >= r_min_z)
        )
        either_active = factive | rolled(factive, d)
        rgroup = rolled(fgroup, d)
        group_ok = (fgroup != rgroup) | (fgroup == 0.0)
        # Home cell: the cell of max(min_a, min_b), wrapped like the keys.
        hx = jnp.floor(jnp.maximum(fmin_x, r_min_x) * inv_cs).astype(jnp.int32)
        hy = jnp.floor(jnp.maximum(fmin_y, r_min_y) * inv_cs).astype(jnp.int32)
        hz = jnp.floor(jnp.maximum(fmin_z, r_min_z) * inv_cs).astype(jnp.int32)
        home_here = cell_key(hx, hy, hz) == skey
        ok_cols.append(same_cell & overlap & either_active & group_ok & home_here)
    ok = jnp.stack(ok_cols, axis=1)  # (E_CAP, W)
    # Window overflow: a cell with more than W+1 entries may have pairs farther apart.
    overflow_window = jnp.any(
        (skey == rolled(skey, W)) & (skey != BIGKEY) & ((pos_e + W) < E_CAP)
    )

    # Accepted pairs compact DIRECTLY from the (E_CAP, W) acceptance matrix — the old
    # per-entry top_k bound (KP) lowered to a row sort of E_CAP·W elements (measured
    # 8.3 ms/step at 16k once autosize doubled W) and added an overflow class
    # (row_counts > KP) for nothing: the one global compaction already bounds output.
    pb_dense = jnp.stack([rolled(sbody, d) for d in range(1, W + 1)], axis=1)
    row_counts = jnp.sum(ok, axis=1)

    # ---- Large bodies: test against everything (N × L) with packed rows.
    groupf = group.astype(jnp.float32)
    me = jnp.arange(n)[:, None]
    large_count = jnp.sum(large)
    large_idx, _ = compact_true(large, max_large)
    large_live = jnp.arange(max_large) < large_count
    gl = feat[large_idx]  # (L, 8)
    lg_ok = (
        large_live[None, :]
        & exists[:, None]
        & (large_idx[None, :] != me)
        & (active_dynamic[:, None] | (gl[None, :, 7] >= 1.0))
        & ((groupf[:, None] != gl[None, :, 6]) | (group == 0)[:, None])
        & (aabb_min.x[:, None] <= gl[None, :, 3]) & (aabb_max.x[:, None] >= gl[None, :, 0])
        & (aabb_min.y[:, None] <= gl[None, :, 4]) & (aabb_max.y[:, None] >= gl[None, :, 1])
        & (aabb_min.z[:, None] <= gl[None, :, 5]) & (aabb_max.z[:, None] >= gl[None, :, 2])
        # dedupe large-large: keep i < j only
        & (~large[:, None] | (me < large_idx[None, :]))
    )
    KL = min(max(pair_k, 8), max_large)  # follows the autosized per-row budget
    lidx_dense = jnp.broadcast_to(large_idx[None, :], (n, max_large))
    lbk, _ = jax.lax.top_k(jnp.where(lg_ok, lidx_dense, -1), KL)  # (N, KL)
    valid_lk = lbk >= 0
    lrow_counts = jnp.sum(lg_ok, axis=1)
    overflow_lk = jnp.any(lrow_counts > KL)

    # ---- ONE compaction over both candidate sets (smalls first) + ONE payload
    # row-gather: (a, b) rows packed next to the validity mask.
    count = jnp.sum(row_counts) + jnp.sum(jnp.minimum(lrow_counts, KL))
    pay_small = jnp.stack(
        [jnp.broadcast_to(sbody[:, None], (E_CAP, W)), pb_dense], axis=-1
    ).reshape(E_CAP * W, 2)
    pay_large = jnp.stack(
        [jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, KL)), lbk],
        axis=-1,
    ).reshape(n * KL, 2)
    payload = jnp.concatenate([pay_small, pay_large])
    flat_valid = jnp.concatenate([ok.reshape(-1), valid_lk.reshape(-1)])
    fi, _ = compact_true(flat_valid, max_pairs)
    pr = payload[fi]  # one (max_pairs, 2) row gather
    pa, pb = pr[:, 0], pr[:, 1]
    a = jnp.minimum(pa, pb)
    b = jnp.maximum(pa, pb)
    valid = jnp.arange(max_pairs) < count
    overflow = (
        (count > max_pairs) | overflow_entries | overflow_window
        | (large_count > max_large) | overflow_lk
    )
    return PairList(
        a, b, valid, overflow,
        _demand(
            pairs=jnp.sum(row_counts) + jnp.sum(lrow_counts),
            entries=entry_count, large=large_count,
            max_row=jnp.maximum(jnp.max(row_counts), jnp.max(lrow_counts)),
            window_hit=overflow_window,
            rowk_hit=overflow_lk,
        ),
    )


def _round_up_int(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def grid(
    aabb_min: Vec3,
    aabb_max: Vec3,
    kind,
    awake,
    group,
    max_pairs: int,
    cell_size: float = 0.0,
    cell_capacity: int = 16,
    max_large: int = 64,
) -> PairList:
    """Sorted uniform-grid broad phase — the TPU-native large-N structure (replaces the
    reference's incrementally-refined BVHs, SURVEY §7 'sort-based pair enumeration').

    Small bodies (AABB extent ≤ cell_size) key their center cell with a collision-free
    packed 30-bit key (world wraps every 1024 cells — distant aliases are culled by the
    exact AABB test) and are sorted by key once. Each body gathers candidates from its
    own cell plus a 13-cell HALF stencil (every adjacent-cell pair enumerated exactly
    once), via searchsorted ranges into the sorted key array. Candidates pass the exact
    AABB/filters test, compact per body via top_k, then one small nonzero emits pairs.
    Bodies larger than a cell (ground slabs, meshes) form a 'large' set tested against
    everyone.

    ``cell_size <= 0`` → ADAPTIVE: 1.3 × the median live AABB extent, recomputed per
    frame (a traced value — no recompilation), so fast-moving frames with big
    velocity-expanded boxes automatically use coarser cells (roadmap: grid tuning under
    velocity expansion). All candidate feature fetches go through ONE packed (N, 8) row
    matrix — per-candidate scalar gathers of aabb/kind/group cost ~16 separate 1D
    gathers over N·stencil indices and dominated the whole step (measured 290 ms at 16k
    bodies before packing).

    Overflow (cell fuller than cell_capacity, per-body pair count > 32, more large bodies
    than max_large, or more pairs than max_pairs) is detected and reported, never silent.
    """
    import jax

    n = kind.shape[0]
    exists = kind != KIND_EMPTY
    active_dynamic = (kind == KIND_DYNAMIC) & awake

    center = (aabb_min + aabb_max) * 0.5
    ext = aabb_max - aabb_min
    max_ext = jnp.maximum(ext.x, jnp.maximum(ext.y, ext.z))
    if cell_size and cell_size > 0:
        cs = jnp.float32(cell_size)
    else:
        # Median live extent × 1.3: bodies beyond it form the 'large' set. The median is
        # robust to a few huge statics (ground slabs, meshes).
        live_ext = jnp.where(exists, max_ext, jnp.nan)
        cs = jnp.maximum(jnp.nanmedian(live_ext) * 1.3, 1e-3)
        # Bound the large set by construction (see grid2): cell size at least the k-th
        # largest live extent → fewer than k large bodies.
        k_lim = max(2, min(max_large // 2, n))
        top_ext, _ = jax.lax.top_k(jnp.where(exists, max_ext, -jnp.inf), k_lim)
        cs = jnp.maximum(cs, top_ext[k_lim - 1])
    large = exists & (max_ext > cs)
    small = exists & ~large

    inv_cs = 1.0 / cs
    cx = jnp.floor(center.x * inv_cs).astype(jnp.int32) & 1023
    cy = jnp.floor(center.y * inv_cs).astype(jnp.int32) & 1023
    cz = jnp.floor(center.z * inv_cs).astype(jnp.int32) & 1023

    def cell_key(ix, iy, iz):
        return ((ix & 1023) << 20) | ((iy & 1023) << 10) | (iz & 1023)

    BIGKEY = jnp.int32(2**31 - 1)
    key = jnp.where(small, cell_key(cx, cy, cz), BIGKEY)
    order = jnp.argsort(key).astype(jnp.int32)
    sorted_key = key[order]
    my_sorted_pos = jnp.zeros(n, jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))

    # Packed per-body features: aabb min/max + flags/group, ONE row gather per candidate
    # matrix instead of ~16 scalar 1D gathers (utils/packing.py rationale). float32 holds
    # the int fields exactly (|group| < 2^24).
    flags = (
        small.astype(jnp.float32)
        + 2.0 * active_dynamic.astype(jnp.float32)
        + 4.0 * exists.astype(jnp.float32)
    )
    feat = jnp.stack(
        [aabb_min.x, aabb_min.y, aabb_min.z, aabb_max.x, aabb_max.y, aabb_max.z,
         group.astype(jnp.float32), flags],
        axis=-1,
    )  # (N, 8)

    # Half stencil: own cell (same-cell pairs deduped by sorted position) + 13 forward
    # neighbors — each unordered adjacent-cell pair appears in exactly one direction.
    HALF = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0), (1, -1, 0),
            (1, 0, 1), (1, 0, -1), (0, 1, 1), (0, 1, -1), (1, 1, 1), (1, 1, -1),
            (1, -1, 1), (1, -1, -1)]
    K = cell_capacity
    offs = jnp.arange(K)
    cand_cols = []
    ok_cols = []
    cell_count = None
    for (dx_, dy_, dz_) in HALF:
        nk = cell_key(cx + dx_, cy + dy_, cz + dz_)
        s0 = jnp.searchsorted(sorted_key, nk).astype(jnp.int32)
        s1 = jnp.searchsorted(sorted_key, nk, side="right").astype(jnp.int32)
        if dx_ == dy_ == dz_ == 0:
            cell_count = s1 - s0
            # Same cell: only partners AFTER this body in sorted order (dedup + self).
            s0 = my_sorted_pos + 1
        pos = s0[:, None] + offs[None, :]
        okc = pos < s1[:, None]
        cand_cols.append(order[jnp.minimum(pos, n - 1)])
        ok_cols.append(okc)
    cand = jnp.concatenate(cand_cols, axis=1)  # (N, 14K)
    cand_ok = jnp.concatenate(ok_cols, axis=1)
    overflow_cell = jnp.any(jnp.where(small, cell_count, 0) > K)

    g = feat[cand]  # (N, 14K, 8) — the single candidate row gather
    g_min = Vec3(g[..., 0], g[..., 1], g[..., 2])
    g_max = Vec3(g[..., 3], g[..., 4], g[..., 5])
    g_group = g[..., 6]
    g_flags = g[..., 7]
    g_small = jnp.mod(g_flags, 2.0) >= 1.0
    g_active = jnp.mod(jnp.floor(g_flags / 2.0), 2.0) >= 1.0

    def overlap_pk(lo, hi):
        return (
            (aabb_min.x[:, None] <= hi.x) & (aabb_max.x[:, None] >= lo.x)
            & (aabb_min.y[:, None] <= hi.y) & (aabb_max.y[:, None] >= lo.y)
            & (aabb_min.z[:, None] <= hi.z) & (aabb_max.z[:, None] >= lo.z)
        )

    me = jnp.arange(n)[:, None]
    groupf = group.astype(jnp.float32)
    group_ok = (groupf[:, None] != g_group) | (group == 0)[:, None]
    pair_ok = (
        cand_ok
        & small[:, None]
        & g_small
        & (active_dynamic[:, None] | g_active)
        & group_ok
        & overlap_pk(g_min, g_max)
    )

    # Large bodies: test against everything (N × L), same packed-row fetch.
    large_count = jnp.sum(large)
    large_idx, _ = compact_true(large, max_large)
    large_live = jnp.arange(max_large) < large_count
    gl = feat[large_idx]  # (L, 8)
    gl_min = Vec3(gl[None, :, 0], gl[None, :, 1], gl[None, :, 2])
    gl_max = Vec3(gl[None, :, 3], gl[None, :, 4], gl[None, :, 5])
    gl_active = jnp.mod(jnp.floor(gl[None, :, 7] / 2.0), 2.0) >= 1.0
    group_ok_lg = (groupf[:, None] != gl[None, :, 6]) | (group == 0)[:, None]
    lg_ok = (
        large_live[None, :]
        & exists[:, None]
        & (large_idx[None, :] != me)
        & (active_dynamic[:, None] | gl_active)
        & group_ok_lg
        & overlap_pk(gl_min, gl_max)
        # dedupe large-large: keep i < j only
        & (~large[:, None] | (me < large_idx[None, :]))
    )

    all_j = jnp.concatenate([cand, jnp.broadcast_to(large_idx[None, :], (n, max_large))], 1)
    all_ok = jnp.concatenate([pair_ok, lg_ok], 1)

    # Per-row top_k compaction (see brute_force): k smallest candidate columns per body.
    KP = 32
    score = jnp.where(all_ok, -jax.lax.broadcasted_iota(jnp.int32, all_ok.shape, 1), -(2**30))
    neg_cols, _ = jax.lax.top_k(score, KP)
    valid_rk = neg_cols > -(2**30)
    cols = jnp.where(valid_rk, -neg_cols, 0)
    row_counts = jnp.sum(all_ok, axis=1)

    count = jnp.sum(jnp.minimum(row_counts, KP))
    fi, _ = compact_true(valid_rk, max_pairs)
    ai = fi // KP
    ki = fi % KP
    jj = all_j[ai, jnp.minimum(cols[ai, ki], all_j.shape[1] - 1)]
    a = jnp.minimum(ai.astype(jnp.int32), jj.astype(jnp.int32))
    b = jnp.maximum(ai.astype(jnp.int32), jj.astype(jnp.int32))
    valid = jnp.arange(max_pairs) < count
    overflow = (
        (count > max_pairs) | overflow_cell | (large_count > max_large)
        | jnp.any(row_counts > KP)
    )
    return PairList(
        a, b, valid, overflow,
        _demand(pairs=jnp.sum(row_counts), large=large_count,
                max_row=jnp.max(row_counts)),
    )
