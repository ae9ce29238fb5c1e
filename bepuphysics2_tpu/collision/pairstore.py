"""Persistent slot-stable contact pair store — the TPU analogue of the reference's
incremental constraint bookkeeping.

The reference never rebuilds its constraint world per frame: pairs enter/leave the
PairCache incrementally (CollisionDetection/PairCache.cs:102), constraints keep their
ConstraintBatch/TypeBatch slot across frames (Solver.cs:984, Solver_Add), and per-frame
cost is proportional to CHANGE, not to population. The first three rounds of this engine
rebuilt everything per frame instead — join-sort the cache, recolor, re-pack color
buckets, un-pack impulses — which made the (fused, capacity-sized) XLA bookkeeping the
whole step cost at 4k+ bodies. This module restores the reference's incremental model in
fixed-shape XLA form:

- **Slot-stable records.** A contact pair occupies ONE slot for its whole life; its
  accumulated impulses, feature ids, and solver color live in place. Warm starting is
  row-local (no cross-frame join), and the solver consumes slots directly (no per-frame
  bucket packing or unpacking).
- **Pages.** Slots group into fixed-size pages; every row of a page shares one solver
  color (page_color). The solver executes pages ordered by color — a permutation of PAGE
  IDS (a few hundred ints), not of rows. Jacobi-fallback rows live in pages tagged with
  color == C and solve with mass splitting, exactly like the previous bucket layout.
- **Bucketized hash membership.** An (HB, 8)-lane cuckoo-less bucket hash maps
  (body_a, body_b) → slot: ONE packed (candidates, 8·3) row gather answers "is this
  broad-phase candidate already stored?" for every candidate at once. No tombstone
  chains: a bucket is the whole probe set, so removal just clears the lane.
- **Persistent color claims.** ``used[body]`` holds a bitmask of colors claimed by live
  rows on that body (the reference's per-batch IndexSet, ConstraintBatch.cs). New rows
  propose the lowest free color with churn-bounded arbitration; rows that find none solve
  in the Jacobi pages and re-propose later. Claims update only on insert/remove — the
  per-frame full-table rebuild (solver/coloring.py:168) disappears.

Per-frame cost: a handful of candidate-sized row gathers (hash probe, liveness test) plus
churn-bounded scatters. Nothing scales with capacity except trivially-fused elementwise
masks.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bodies import KIND_DYNAMIC, KIND_EMPTY
from ..utils.vec import Vec2

EMPTY = jnp.int32(-1)
LANES = 8  # hash bucket width (one TPU sublane row)


class PairStore(NamedTuple):
    """Persistent pair world. B slots = P pages × page rows; all shapes static."""

    body_a: jnp.ndarray  # (B,) int32
    body_b: jnp.ndarray  # (B,) int32
    live: jnp.ndarray  # (B,) bool — slot holds a pair
    active_prev: jnp.ndarray  # (B,) bool — last frame's prestep.valid (tangent carry)
    color: jnp.ndarray  # (B,) int32 — 0..C-1, or C (Jacobi pages)
    hpos: jnp.ndarray  # (B,) int32 — flat hash position bucket*LANES + lane
    feature: jnp.ndarray  # (B, 4) int32 — -1 = no prior contact (no carry)
    imp_pen: jnp.ndarray  # (B, 4) f32 accumulated impulses (persist in place)
    imp_tx: jnp.ndarray  # (B,)
    imp_ty: jnp.ndarray  # (B,)
    imp_tw: jnp.ndarray  # (B,)
    used: jnp.ndarray  # (NB+1,) int32 color-claim bitmask per body (store rows only)
    # (NB+1,) f32 per-body count of LIVE Jacobi (color == C) rows — maintained
    # incrementally by the same churn-bounded scatters as the claims, so the solver's
    # mass-splitting valence costs no per-frame full-bank pass. Live ⊇ active, so a
    # body with sleeping Jacobi pairs reads a conservatively larger valence (safe:
    # mass splitting only requires scale >= concurrent writers).
    jacv: jnp.ndarray
    # (HB*LANES, 3) int32 packed hash lanes [body_a, body_b, slot]; -1 = empty. One
    # packed row means the membership probe is ONE (candidates, LANES*3) gather —
    # three separate tables cost three capacity-sized gathers (~4.4 ms at 16k).
    ht: jnp.ndarray
    page_color: jnp.ndarray  # (P,) int32 — -1 = empty/unallocated page

    @staticmethod
    def empty(capacity: int, n_bodies: int, page: int) -> "PairStore":
        assert capacity % page == 0
        p = capacity // page
        hb = max(8, _next_pow2(-(-capacity // 2)))
        return PairStore(
            body_a=jnp.zeros(capacity, jnp.int32),
            body_b=jnp.zeros(capacity, jnp.int32),
            live=jnp.zeros(capacity, bool),
            active_prev=jnp.zeros(capacity, bool),
            color=jnp.zeros(capacity, jnp.int32),
            hpos=jnp.zeros(capacity, jnp.int32),
            feature=jnp.full((capacity, 4), -1, jnp.int32),
            imp_pen=jnp.zeros((capacity, 4), jnp.float32),
            imp_tx=jnp.zeros(capacity, jnp.float32),
            imp_ty=jnp.zeros(capacity, jnp.float32),
            imp_tw=jnp.zeros(capacity, jnp.float32),
            used=jnp.zeros(n_bodies + 1, jnp.int32),
            jacv=jnp.zeros(n_bodies + 1, jnp.float32),
            ht=jnp.full((hb * LANES, 3), -1, jnp.int32),
            page_color=jnp.full(p, -1, jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.body_a.shape[0]

    @property
    def n_pages(self) -> int:
        return self.page_color.shape[0]

    @property
    def page(self) -> int:
        return self.capacity // self.n_pages


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _hash_bucket(a, b, hb: int):
    """Deterministic bucket id for a pair. int32 wrap-around is fine for hashing."""
    h = a * jnp.int32(-1640531527) + b * jnp.int32(97001)
    h = h ^ (h >> 15)
    return (h & jnp.int32(hb - 1)).astype(jnp.int32)


def _compact(mask: jnp.ndarray, cap: int):
    """Ascending indices of True (padded with the input size), via cumsum + one SORTED
    scatter (targets are nondecreasing) — cheaper than the sort-based compact_true for
    per-frame churn sets. Returns (idx (cap,), count, overflow)."""
    m = mask.shape[0]
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    kept = mask & (rank < cap)
    out = (
        jnp.full(cap + 1, m, jnp.int32)
        .at[jnp.where(kept, rank, cap)]
        .set(jnp.arange(m, dtype=jnp.int32), mode="drop", indices_are_sorted=True)
    )[:cap]
    count = jnp.sum(mask)
    return out, jnp.minimum(count, cap), count > cap


def update(
    store: PairStore,
    kind, awake, group,  # (NB,) body columns
    aabb_min, aabb_max,  # Vec3 (NB,) — this frame's predicted bounds
    cand_a, cand_b, cand_valid,  # broad-phase candidates (MP,)
    cand_insertable,  # (MP,) bool — pair type handled by this store (convex-convex)
    num_colors: int,
    ext_used,  # (NB+1,) int32 — color claims of OTHER banks (joints, compound records)
    churn_cap: int,
    dead_cap: int,
    repair_cap: int,
):
    """One frame of store maintenance: retire separated pairs, admit new broad-phase
    pairs (with color + page slot assignment), and retry colors for Jacobi rows.

    Returns (store', overflow, demand). Deferred work is never wrong: a dead row past
    dead_cap retires next frame (its manifold is empty meanwhile), a new pair past
    churn_cap enters next frame (the candidate list re-emits it), a Jacobi row past
    repair_cap keeps mass-split solving. ``overflow`` flags only real capacity losses
    (slot/hash exhaustion). ``demand`` is a (3,) int32 vector of TRUE per-frame demand
    [admissions, retirements, live rows] for demand-driven sizing
    (reference SimulationAllocationSizes / Solver TypeBatch growth-from-counts)."""
    B = store.capacity
    NB = kind.shape[0]
    C = num_colors
    P = store.n_pages
    page = store.page
    hb = store.ht.shape[0] // LANES
    maskC = jnp.int32((1 << C) - 1)
    overflow = jnp.bool_(False)

    a0, b0 = store.body_a, store.body_b

    # ---- liveness: a stored pair survives while its bodies exist, at least one is
    # dynamic, its AABBs (speculative-expanded) still overlap, and no collision-group
    # filter applies. Sleeping pairs survive (records + impulses retained in place —
    # the reference's PairCache_Activity semantics without any bank migration).
    brow = jnp.stack(
        [
            aabb_min.x, aabb_min.y, aabb_min.z, aabb_max.x, aabb_max.y, aabb_max.z,
            kind.astype(jnp.float32), group.astype(jnp.float32),
            ((kind == KIND_DYNAMIC) & awake).astype(jnp.float32),
        ],
        -1,
    )
    ra = brow[a0]
    rb = brow[b0]
    overlap = (
        (ra[:, 0] <= rb[:, 3]) & (rb[:, 0] <= ra[:, 3])
        & (ra[:, 1] <= rb[:, 4]) & (rb[:, 1] <= ra[:, 4])
        & (ra[:, 2] <= rb[:, 5]) & (rb[:, 2] <= ra[:, 5])
    )
    ka = ra[:, 6].astype(jnp.int32)
    kb = rb[:, 6].astype(jnp.int32)
    ga = ra[:, 7].astype(jnp.int32)
    gb = rb[:, 7].astype(jnp.int32)
    ok = (
        overlap
        & (ka != KIND_EMPTY) & (kb != KIND_EMPTY)
        & ((ka == KIND_DYNAMIC) | (kb == KIND_DYNAMIC))
        & ((ga != gb) | (ga == 0))
    )
    # Row activity (an awake dynamic endpoint) rides the SAME side gathers — a separate
    # post-update awake[a]|awake[b] pass cost two more capacity-sized gathers.
    row_awake = (ra[:, 8] > 0) | (rb[:, 8] > 0)
    dead = store.live & ~ok
    dsel, _, _ = _compact(dead, dead_cap)  # spill retires next frame — harmless
    dsel_c = jnp.minimum(dsel, B - 1)
    d_live = dsel < B
    # Clear hash lanes + unclaim colors of retired rows (whole packed row -> -1).
    dh = jnp.where(d_live, store.hpos[dsel_c], hb * LANES)
    ht = store.ht.at[dh].set(EMPTY, mode="drop")
    dcol = store.color[dsel_c]
    dbit = jnp.where(d_live & (dcol < C), jnp.int32(1) << jnp.maximum(dcol, 0), 0)
    # Claims were only placed on DYNAMIC endpoints — unclaim must mirror that exactly
    # (kind flips reset the whole store host-side, so kind-now == kind-at-claim).
    da_dyn = kind[a0[dsel_c]] == KIND_DYNAMIC
    db_dyn = kind[b0[dsel_c]] == KIND_DYNAMIC
    used = (
        store.used
        .at[jnp.where(d_live & da_dyn, a0[dsel_c], NB)].add(-dbit, mode="drop")
        .at[jnp.where(d_live & db_dyn, b0[dsel_c], NB)].add(-dbit, mode="drop")
    )
    # Incremental Jacobi valence: retiring color-C rows release a count at both ends.
    djac = jnp.where(d_live & (dcol == C), -1.0, 0.0)
    jacv = (
        store.jacv
        .at[jnp.where(d_live, a0[dsel_c], NB)].add(djac, mode="drop")
        .at[jnp.where(d_live, b0[dsel_c], NB)].add(djac, mode="drop")
    )
    live = store.live & ~(jnp.zeros(B, bool).at[jnp.where(d_live, dsel_c, B)].set(
        True, mode="drop"
    ))

    # ---- membership probe for every candidate: ONE packed row gather.
    cb = _hash_bucket(cand_a, cand_b, hb)
    htr = ht.reshape(hb, LANES * 3)[cb].reshape(-1, LANES, 3)  # (MP, LANES, 3)
    hit = (
        (htr[:, :, 0] == cand_a[:, None])
        & (htr[:, :, 1] == cand_b[:, None])
        & (htr[:, :, 2] >= 0)
    )
    found = cand_valid & jnp.any(hit, axis=1)
    new = cand_valid & ~found & cand_insertable

    # ---- admit new pairs (churn-bounded).
    nsel, _, n_ovfl = _compact(new, churn_cap)
    # A dropped new pair is only a one-frame delay unless the candidate list itself
    # overflowed upstream; report churn spill as overflow so sizing stays honest.
    overflow = overflow | n_ovfl
    nsel_c = jnp.minimum(nsel, cand_a.shape[0] - 1)
    n_liv = nsel < cand_a.shape[0]
    na = jnp.where(n_liv, cand_a[nsel_c], 0)
    nb_ = jnp.where(n_liv, cand_b[nsel_c], 0)

    # Hash lane assignment first: a pair we cannot index must not be stored at all
    # (an unfindable record would be re-inserted as a duplicate constraint later).
    nbk = _hash_bucket(na, nb_, hb)
    occ = ht.reshape(hb, LANES, 3)[nbk][:, :, 2] >= 0  # occupancy after removals
    # Intra-frame contention: rank new rows sharing a bucket, then take the rank-th
    # free lane. Ranks via one (NB-free) scatter-add walk: count = prefix occurrences.
    ones = jnp.ones(churn_cap, jnp.int32)
    # prefix rank of equal buckets in churn order: segment ranks via sort-free pass —
    # churn_cap is small, use a (cc, cc) comparison only if tiny; otherwise sort.
    order = jnp.argsort(jnp.where(n_liv, nbk, hb), stable=True)
    nbk_s = nbk[order]
    seg_new = jnp.concatenate([jnp.array([True]), nbk_s[1:] != nbk_s[:-1]])
    seg_id = jnp.cumsum(seg_new.astype(jnp.int32)) - 1
    pos_in_seg = jnp.arange(churn_cap, dtype=jnp.int32) - (
        jnp.zeros(churn_cap, jnp.int32)
        .at[seg_id]
        .max(jnp.arange(churn_cap, dtype=jnp.int32) * seg_new.astype(jnp.int32))
    )[seg_id]
    brank = jnp.zeros(churn_cap, jnp.int32).at[order].set(pos_in_seg)
    free_rank = jnp.cumsum(~occ, axis=1) - 1  # rank of each free lane within bucket
    # lane = index of the (brank)-th free lane; none → hash overflow for this pair.
    lane_match = (~occ) & (free_rank == brank[:, None])
    has_lane = jnp.any(lane_match, axis=1)
    lane = jnp.argmax(lane_match, axis=1).astype(jnp.int32)
    n_ok = n_liv & has_lane
    overflow = overflow | jnp.any(n_liv & ~has_lane)

    # ---- color proposals for new rows and for Jacobi retries (repair set).
    rmask = live & (store.color == C)
    rsel, _, _ = _compact(rmask, repair_cap)
    rsel_c = jnp.minimum(rsel, B - 1)
    r_liv = rsel < B
    ra_ = jnp.where(r_liv, a0[rsel_c], 0)
    rb_ = jnp.where(r_liv, b0[rsel_c], 0)

    cc = churn_cap + repair_cap
    pa = jnp.concatenate([na, ra_])
    pb = jnp.concatenate([nb_, rb_])
    p_live = jnp.concatenate([n_ok, r_liv])
    is_new = jnp.concatenate([jnp.ones(churn_cap, bool), jnp.zeros(repair_cap, bool)])

    # Only dynamic endpoints conflict (statics/kinematics don't block colors —
    # reference Solver.GetBlockingBodyHandles).
    dyn_a = kind[pa] == KIND_DYNAMIC
    dyn_b = kind[pb] == KIND_DYNAMIC

    used_all = used | ext_used  # claim sets are disjoint by invariant; | is also reset-safe
    # Per-color admission: a color must have page capacity somewhere.
    page_live = jnp.sum(live.reshape(P, page), axis=1)
    page_col = jnp.where(page_live > 0, store.page_color, -1)
    page_free = page - page_live
    cols = jnp.arange(C + 1, dtype=jnp.int32)
    cap_c = jnp.sum(
        jnp.where(page_col[None, :] == cols[:, None], page_free[None, :], 0), axis=1
    )  # (C+1,) free slots in pages already of color c
    n_empty = jnp.sum(page_col == -1)
    full_bits = jnp.sum(
        jnp.where((cap_c[:C] == 0) & (n_empty == 0), jnp.int32(1) << cols[:C], 0)
    )

    slotarr = jnp.arange(cc, dtype=jnp.int32)
    pcolor = jnp.full(cc, C, jnp.int32)
    pactive = p_live
    sink = jnp.int32(NB * C)
    _BIGP = jnp.int32(2**31 - 1)
    pref = jnp.abs(pa * jnp.int32(-1640531527) + pb * jnp.int32(40503)) % C
    for _ in range(2):
        ua = jnp.where(dyn_a, used_all[jnp.where(dyn_a, pa, NB)], 0)
        ub = jnp.where(dyn_b, used_all[jnp.where(dyn_b, pb, NB)], 0)
        avail = (~(ua | ub)) & maskC & ~full_bits
        has = pactive & (avail != 0)
        rot = ((avail >> pref) | (avail << (C - pref))) & maskC
        low = rot & (-rot)
        idx = jnp.round(
            jnp.log2(jnp.maximum(low, 1).astype(jnp.float32))
        ).astype(jnp.int32)
        prop = (idx + pref) % C
        tgt_a = jnp.where(dyn_a & has, pa * C + prop, sink)
        tgt_b = jnp.where(dyn_b & has, pb * C + prop, sink)
        table = (
            jnp.full(NB * C + 1, _BIGP)
            .at[tgt_a].min(slotarr)
            .at[tgt_b].min(slotarr)
        )
        win = has & (~dyn_a | (table[tgt_a] == slotarr)) & (
            ~dyn_b | (table[tgt_b] == slotarr)
        )
        pcolor = jnp.where(win, prop, pcolor)
        pactive = pactive & ~win
        wbit = jnp.where(win, jnp.int32(1) << prop, 0)
        used_all = (
            used_all
            .at[jnp.where(dyn_a, pa, NB)].add(jnp.where(dyn_a, wbit, 0))
            .at[jnp.where(dyn_b, pb, NB)].add(jnp.where(dyn_b, wbit, 0))
        )

    # Repair rows that failed keep their Jacobi slot (no move, no write).
    moving = p_live & (is_new | (pcolor < C))

    # ---- page slot allocation, per final color, capacity-demoting on shortfall.
    def alloc(colors, active):
        """colors (cc,) in [0..C]; returns (slot (cc,), got (cc,), demoted (cc,))."""
        onehot = (colors[:, None] == cols[None, :]) & active[:, None]  # (cc, C+1)
        k = jnp.cumsum(onehot.astype(jnp.int32), axis=0) - 1  # rank within color
        krow = jnp.sum(jnp.where(onehot, k, 0), axis=1)
        demand = jnp.sum(onehot, axis=0)  # (C+1,)
        # Existing-page capacity prefix per color over page index order.
        elig = page_col[None, :] == cols[:, None]  # (C+1, P)
        pc = jnp.cumsum(jnp.where(elig, page_free[None, :], 0), axis=1)  # (C+1, P)
        total_c = pc[:, -1]
        # New-page demand per color, empty pages handed out in color order.
        extra = jnp.maximum(demand - total_c, 0)
        npages = -(-extra // page)
        np_pref = jnp.cumsum(npages) - npages  # start index into the empty-page list
        # Empty page list (first P entries, ascending).
        esel, _, _ = _compact(page_col == -1, P)
        can_new = (np_pref[colors] + jnp.maximum(krow - total_c[colors], 0) // page) < n_empty
        got = active & ((krow < total_c[colors]) | can_new)
        # slot for rows placed in existing pages:
        pcs = pc[colors]  # (cc, P)
        pidx = jnp.sum((pcs <= krow[:, None]).astype(jnp.int32), axis=1)  # first pc>k
        pidx_c = jnp.minimum(pidx, P - 1)
        base = jnp.where(pidx > 0, jnp.take_along_axis(pcs, jnp.maximum(pidx - 1, 0)[:, None], 1)[:, 0], 0)
        j_exist = krow - base
        in_exist = krow < total_c[colors]
        # rows placed in fresh pages:
        k2 = jnp.maximum(krow - total_c[colors], 0)
        e_idx = jnp.minimum(np_pref[colors] + k2 // page, P - 1)
        fresh_page = esel[e_idx]
        fresh_page_c = jnp.minimum(fresh_page, P - 1)
        j_fresh = k2 % page
        pg = jnp.where(in_exist, pidx_c, fresh_page_c)
        jj = jnp.where(in_exist, j_exist, j_fresh)
        return pg, jj, got, in_exist

    # Free-slot rank table: slot of the j-th free slot within each page.
    free = ~live
    fr = jnp.cumsum(free.reshape(P, page).astype(jnp.int32), axis=1) - 1
    free_slot = (
        jnp.full(P * page + 1, B, jnp.int32)
        .at[
            jnp.where(
                free,
                jnp.arange(B, dtype=jnp.int32) // page * page + fr.reshape(-1),
                P * page,
            )
        ]
        .set(jnp.arange(B, dtype=jnp.int32), mode="drop")
    )[: P * page].reshape(P, page)

    pg1, jj1, got1, _ = alloc(pcolor, moving)
    # shortfall → demote to Jacobi and retry allocation for those rows only.
    retry = moving & ~got1
    pcolor2 = jnp.where(retry, C, pcolor)
    # Rows that already got a slot keep it; rerun alloc for the union so Jacobi ranks
    # stay consistent (alloc is deterministic over the same inputs).
    still_moving = moving & (got1 | is_new)  # failed repair rows stay put
    pcolor_f = jnp.where(retry, C, pcolor)
    pg, jj, got, _ = alloc(pcolor_f, still_moving)
    overflow = overflow | jnp.any(still_moving & ~got)
    place = still_moving & got
    new_slot = jnp.where(
        place, free_slot[jnp.minimum(pg, P - 1), jnp.minimum(jj, page - 1)], B
    )
    place = place & (new_slot < B)

    # ---- write phase -------------------------------------------------------------
    ns_c = jnp.minimum(new_slot, B - 1)
    w = jnp.where(place, new_slot, B)

    # new-page colors
    page_color_new = page_col.at[jnp.where(place, pg, P)].set(
        pcolor_f, mode="drop"
    )

    # claims for winners (color < C): new rows and moved repair rows claim now.
    wbit2 = jnp.where(place & (pcolor_f < C), jnp.int32(1) << jnp.minimum(pcolor_f, C - 1), 0)
    used2 = (
        used
        .at[jnp.where(dyn_a, pa, NB)].add(jnp.where(dyn_a, wbit2, 0), mode="drop")
        .at[jnp.where(dyn_b, pb, NB)].add(jnp.where(dyn_b, wbit2, 0), mode="drop")
    )
    # Jacobi valence deltas of the write phase: admitted rows landing in Jacobi pages
    # count up; repair rows that moved (always C → some c < C) count down.
    jd = jnp.where(
        place & is_new & (pcolor_f == C), 1.0,
        jnp.where(place & ~is_new, -1.0, 0.0),
    )
    jacv2 = (
        jacv
        .at[jnp.where(place, pa, NB)].add(jd, mode="drop")
        .at[jnp.where(place, pb, NB)].add(jd, mode="drop")
    )

    # moved repair rows: free old slot, carry impulses/features, update hash slot value.
    mv = place & ~is_new
    old_slot = jnp.concatenate([jnp.full(churn_cap, B, jnp.int32), rsel])
    old_c = jnp.minimum(old_slot, B - 1)
    live2 = live.at[jnp.where(mv, old_c, B)].set(False, mode="drop")
    live2 = live2.at[w].set(True, mode="drop")

    carry = lambda col, newv: col.at[w].set(newv, mode="drop")
    feat_new = jnp.where(is_new[:, None], jnp.full((cc, 4), -1, jnp.int32), store.feature[old_c])
    pen_new = jnp.where(is_new[:, None], 0.0, store.imp_pen[old_c])
    tx_new = jnp.where(is_new, 0.0, store.imp_tx[old_c])
    ty_new = jnp.where(is_new, 0.0, store.imp_ty[old_c])
    tw_new = jnp.where(is_new, 0.0, store.imp_tw[old_c])
    ap_new = jnp.where(is_new, False, store.active_prev[old_c])
    hp_new = jnp.where(
        is_new,
        jnp.concatenate([nbk * LANES + lane, jnp.zeros(repair_cap, jnp.int32)]),
        store.hpos[old_c],
    )

    body_a2 = carry(a0, pa)
    body_b2 = carry(b0, pb)
    color2 = carry(store.color, pcolor_f)
    feature2 = store.feature.at[w].set(feat_new, mode="drop")
    imp_pen2 = store.imp_pen.at[w].set(pen_new, mode="drop")
    imp_tx2 = carry(store.imp_tx, tx_new)
    imp_ty2 = carry(store.imp_ty, ty_new)
    imp_tw2 = carry(store.imp_tw, tw_new)
    ap2 = store.active_prev.at[w].set(ap_new, mode="drop")
    hpos2 = carry(store.hpos, hp_new)

    # hash writes: one packed-row scatter covers inserts AND moved-row slot updates
    # (a moved row keeps its bodies, so rewriting all three columns is identical).
    hflat = jnp.where(place, hp_new, hb * LANES)
    ht2 = ht.at[hflat].set(
        jnp.stack([pa, pb, new_slot], -1), mode="drop"
    )

    store2 = store._replace(
        body_a=body_a2,
        body_b=body_b2,
        live=live2,
        active_prev=ap2,
        color=color2,
        hpos=hpos2,
        feature=feature2,
        imp_pen=imp_pen2,
        imp_tx=imp_tx2,
        imp_ty=imp_ty2,
        imp_tw=imp_tw2,
        used=used2,
        jacv=jacv2,
        ht=ht2,
        page_color=page_color_new,
    )
    demand = jnp.stack([
        jnp.sum(new).astype(jnp.int32),
        jnp.sum(dead).astype(jnp.int32),
        jnp.sum(live2).astype(jnp.int32),
    ])
    # Per-slot activity after the write phase: admitted rows are active by construction
    # (the broad phase only emits pairs with an awake dynamic endpoint); moved repair
    # rows carry their old slot's activity.
    act_new = jnp.where(is_new, True, row_awake[old_c])
    active_out = live2 & row_awake.at[w].set(act_new, mode="drop")
    return store2, overflow, demand, active_out


def exec_order(store: PairStore, num_colors: int):
    """Page execution permutation for the solver: pages sorted by color ascending,
    Jacobi (C) pages after all colored pages, empty pages last. Returns
    (perm (P,), page_is_jacobi (P,) in exec order, inv_perm (P,))."""
    P = store.n_pages
    key = jnp.where(store.page_color < 0, num_colors + 1, store.page_color)
    perm = jnp.argsort(key, stable=True).astype(jnp.int32)
    inv = jnp.zeros(P, jnp.int32).at[perm].set(jnp.arange(P, dtype=jnp.int32))
    is_jac = key[perm] == num_colors
    return perm, is_jac, inv


def jacobi_counts(body_a, body_b, jac_mask, n_bodies: int, cap: int):
    """Per-body count (NB+1,) f32 of Jacobi rows (for mass splitting). Jacobi rows are
    normally few (high-valence hotspots), so they compact to ``cap`` and scatter from
    there; a runtime cond falls back to the full-bank scatter when they are not —
    exact at any population."""
    B = body_a.shape[0]

    def small(_):
        sel, _, _ = _compact(jac_mask, cap)
        lv = sel < B
        sc = jnp.minimum(sel, B - 1)
        one = lv.astype(jnp.float32)
        return (
            jnp.zeros(n_bodies + 1, jnp.float32)
            .at[jnp.where(lv, body_a[sc], n_bodies)].add(one, mode="drop")
            .at[jnp.where(lv, body_b[sc], n_bodies)].add(one, mode="drop")
        )

    def full(_):
        one = jac_mask.astype(jnp.float32)
        return (
            jnp.zeros(n_bodies + 1, jnp.float32)
            .at[jnp.where(jac_mask, body_a, n_bodies)].add(one, mode="drop")
            .at[jnp.where(jac_mask, body_b, n_bodies)].add(one, mode="drop")
        )

    return jax.lax.cond(jnp.sum(jac_mask) <= cap, small, full, None)


def store_claims(bodies, colors, valid, n_bodies: int, num_colors: int):
    """Claim bitmask (NB+1,) from an external bank's persisted colors (for ext_used).
    ``bodies``: (M, k) int32; colors (M,) with -1/C = no claim."""
    m, k = bodies.shape
    bit = jnp.where(valid & (colors >= 0) & (colors < num_colors),
                    jnp.int32(1) << jnp.maximum(colors, 0), 0)
    out = jnp.zeros(n_bodies + 1, jnp.int32)
    for j in range(k):
        out = out.at[jnp.minimum(bodies[:, j], n_bodies)].add(bit)
    return out


def migrate(store: PairStore, new_capacity: int, n_bodies: int, new_page: int,
            num_colors: int, kind=None) -> PairStore:
    """HOST-side store resize preserving every live pair's color, features, and
    accumulated impulses (the reference's Resize moves its caches instead of dropping
    them, Simulation.EnsureCapacity). Runs between steps in numpy: live rows re-place
    into the new page layout grouped by color, the hash re-inserts with the device
    hash function, and the claim/valence tables rebuild from the carried rows.
    Rows beyond the new capacity (shrink below live count) drop — the broad phase
    re-admits them over subsequent frames with a one-time warm-start loss.

    Without this, autosize's reconfigure rebuilt the store EMPTY: a settled scene lost
    all warm starts at once, re-settled with jolts, and its wake storms kept marginal
    stacks awake indefinitely (measured: the 2,880-body colosseum sleeps fully without
    a resize and never fully sleeps across one)."""
    import numpy as np

    assert new_capacity % new_page == 0
    P = new_capacity // new_page
    hb = max(8, _next_pow2(-(-new_capacity // 2)))
    C = num_colors

    live = np.asarray(store.live)
    idx = np.nonzero(live)[0]
    a = np.asarray(store.body_a)[idx]
    b = np.asarray(store.body_b)[idx]
    color = np.minimum(np.asarray(store.color)[idx], C)
    feature = np.asarray(store.feature)[idx]
    imp_pen = np.asarray(store.imp_pen)[idx]
    imp_tx = np.asarray(store.imp_tx)[idx]
    imp_ty = np.asarray(store.imp_ty)[idx]
    imp_tw = np.asarray(store.imp_tw)[idx]
    active_prev = np.asarray(store.active_prev)[idx]

    # Place rows grouped by color into fresh pages (color-homogeneous pages).
    order = np.argsort(color, kind="stable")
    slots = np.full(len(idx), -1, np.int64)
    page_color = np.full(P, -1, np.int32)
    next_slot = 0
    kept = np.zeros(len(idx), bool)
    for j in order:
        c = int(color[j])
        if next_slot % new_page == 0:
            pg = next_slot // new_page
            if pg >= P:
                break  # shrink spill: dropped rows re-enter from candidates
            page_color[pg] = c
        elif page_color[next_slot // new_page] != c:
            # color change mid-page: advance to the next page boundary
            next_slot = (next_slot // new_page + 1) * new_page
            pg = next_slot // new_page
            if pg >= P:
                break
            page_color[pg] = c
        slots[j] = next_slot
        kept[j] = True
        next_slot += 1

    # Hash insert (device-identical bucket function; int32 wraparound emulated).
    a64 = a.astype(np.int64) * -1640531527 + b.astype(np.int64) * 97001
    h32 = (a64 & 0xFFFFFFFF).astype(np.uint32).view(np.int32)
    h32 = h32 ^ (h32 >> 15)  # arithmetic shift on int32, matching jnp
    bucket = (h32 & np.int32(hb - 1)).astype(np.int64)

    body_a2 = np.zeros(new_capacity, np.int32)
    body_b2 = np.zeros(new_capacity, np.int32)
    live2 = np.zeros(new_capacity, bool)
    ap2 = np.zeros(new_capacity, bool)
    color2 = np.zeros(new_capacity, np.int32)
    hpos2 = np.zeros(new_capacity, np.int32)
    feature2 = np.full((new_capacity, 4), -1, np.int32)
    pen2 = np.zeros((new_capacity, 4), np.float32)
    tx2 = np.zeros(new_capacity, np.float32)
    ty2 = np.zeros(new_capacity, np.float32)
    tw2 = np.zeros(new_capacity, np.float32)
    used2 = np.zeros(n_bodies + 1, np.int32)
    jacv2 = np.zeros(n_bodies + 1, np.float32)
    ht2 = np.full((hb * LANES, 3), -1, np.int32)
    lane_fill = np.zeros(hb, np.int32)

    # Claims follow update()'s rule exactly: only DYNAMIC endpoints claim (a static
    # endpoint's claim would never be unclaimed on retirement — a permanent leak).
    kind_np = (
        np.asarray(kind) if kind is not None else np.ones(n_bodies, np.int32)
    )
    for j in np.nonzero(kept)[0]:
        s = int(slots[j])
        bi = int(bucket[j])
        ln = int(lane_fill[bi])
        if ln >= LANES:
            kept[j] = False  # hash bucket saturated in the new table: drop (re-admits)
            live2[s] = False
            continue
        lane_fill[bi] = ln + 1
        hp = bi * LANES + ln
        body_a2[s] = a[j]
        body_b2[s] = b[j]
        live2[s] = True
        ap2[s] = active_prev[j]
        color2[s] = color[j]
        hpos2[s] = hp
        feature2[s] = feature[j]
        pen2[s] = imp_pen[j]
        tx2[s] = imp_tx[j]
        ty2[s] = imp_ty[j]
        tw2[s] = imp_tw[j]
        ht2[hp] = (a[j], b[j], s)
        c = int(color[j])
        if c < C:
            if kind_np[a[j]] == KIND_DYNAMIC:
                used2[a[j]] |= 1 << c
            if kind_np[b[j]] == KIND_DYNAMIC:
                used2[b[j]] |= 1 << c
        else:
            jacv2[a[j]] += 1.0
            jacv2[b[j]] += 1.0

    return PairStore(
        body_a=jnp.asarray(body_a2), body_b=jnp.asarray(body_b2),
        live=jnp.asarray(live2), active_prev=jnp.asarray(ap2),
        color=jnp.asarray(color2), hpos=jnp.asarray(hpos2),
        feature=jnp.asarray(feature2), imp_pen=jnp.asarray(pen2),
        imp_tx=jnp.asarray(tx2), imp_ty=jnp.asarray(ty2), imp_tw=jnp.asarray(tw2),
        used=jnp.asarray(used2), jacv=jnp.asarray(jacv2), ht=jnp.asarray(ht2),
        page_color=jnp.asarray(page_color),
    )
