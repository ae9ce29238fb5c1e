"""Device-side constraint graph coloring — fully on-TPU, fixed shapes, deterministic.

The reference assigns each constraint to the first ``ConstraintBatch`` whose per-batch
``IndexSet`` contains none of its dynamic bodies — greedy graph coloring maintained
incrementally on the host as constraints are added (reference: Solver.cs:984-1093,
ConstraintBatch.cs; overflow past 64 colors goes to a Jacobi-style fallback batch,
SequentialFallbackBatch.cs:37). Within a color no two constraints share a dynamic body, so
a whole color solves in parallel with conflict-free scatter — this is *the* invariant that
makes parallel Gauss-Seidel correct without atomics (SURVEY §2.9 P2).

Contact constraints are rebuilt every frame, so coloring must run on device every frame.
This implements round-based parallel greedy coloring (Jones–Plassmann with slot-index
priority): in round c every still-uncolored constraint proposes color c; a constraint wins
iff it holds the minimum slot index among proposers on each of its dynamic bodies
(two segmented min-scatters per round). Constraints still uncolored after ``num_colors``
rounds land in the Jacobi bucket (color == num_colors), solved with mass-splitting — TPUs
tolerate a much lower color budget than the reference's 64 because the Jacobi fallback
vectorizes perfectly (SURVEY §2.9 P3).

Deterministic by construction: priorities are slot indices, no RNG, no atomics.
"""
from __future__ import annotations

import jax.numpy as jnp

_BIG = jnp.int32(2**31 - 1)


def color_constraints(
    body_a: jnp.ndarray,
    body_b: jnp.ndarray,
    dynamic_a: jnp.ndarray,
    dynamic_b: jnp.ndarray,
    valid: jnp.ndarray,
    n_bodies: int,
    num_colors: int,
) -> jnp.ndarray:
    """Returns per-constraint color in [0, num_colors]; num_colors = Jacobi bucket.

    Args:
      body_a/body_b: (M,) int32 body slots. For one-body constraints pass body_b = body_a
        with dynamic_b = False.
      dynamic_a/b: (M,) bool — only dynamic endpoints create conflicts (kinematics don't
        block, matching reference Solver.GetBlockingBodyHandles, Solver.cs:1058).
      valid: (M,) bool live records.
    """
    refs = jnp.stack([body_a, body_b], -1)
    dyn = jnp.stack([dynamic_a, dynamic_b], -1)
    return color_constraints_kary(refs, dyn, valid, n_bodies, num_colors)[0]


def color_constraints_kary(
    refs: jnp.ndarray,  # (M, K) int32 body slots
    dyn: jnp.ndarray,  # (M, K) bool — dynamic endpoints (only these conflict)
    valid: jnp.ndarray,  # (M,) bool
    n_bodies: int,
    num_colors: int,
    segments=None,
):
    """K-ary generalization (covers 1-4 body constraints uniformly).

    ``segments``: optional list of (start, size, cap) static sub-ranges of the constraint
    table. When given, a round's winners within a segment beyond ``cap`` DEFER to a later
    round (capacity-aware coloring — this is what lets each color become a fixed-size
    compacted bucket downstream without ever dropping a constraint; deferred rows simply
    take a later color, and only rows whose body valence genuinely exceeds the color
    budget land in the Jacobi bucket). Returns (color, rank): rank is the row's win rank
    within its segment's round (bucket position), -1 outside any segment.
    """
    import jax

    m, k = refs.shape
    slot = jnp.arange(m, dtype=jnp.int32)

    # One fused (M·K,) scatter-min / gather per round instead of K separate 1D passes.
    flat_tgt = jnp.where(dyn, refs, n_bodies).reshape(-1)

    def round_body(c, carry):
        color, rank, unassigned = carry
        prio = jnp.where(unassigned, slot, _BIG)
        body_min = jnp.full(n_bodies + 1, _BIG, jnp.int32)
        body_min = body_min.at[flat_tgt].min(
            jnp.broadcast_to(prio[:, None], (m, k)).reshape(-1)
        )[:n_bodies]
        win = unassigned & jnp.all(~dyn | (body_min[refs] == prio[:, None]), axis=1)
        if segments:
            new_rank = rank
            for start, size, cap in segments:
                seg_win = win[start : start + size]
                seg_rank = jnp.cumsum(seg_win.astype(jnp.int32)) - 1
                keep = seg_win & (seg_rank < cap)
                win = win.at[start : start + size].set(keep)
                new_rank = new_rank.at[start : start + size].set(
                    jnp.where(keep, seg_rank, rank[start : start + size])
                )
            rank = new_rank
        return jnp.where(win, c, color), rank, unassigned & ~win

    color, rank, _ = jax.lax.fori_loop(
        0,
        num_colors,
        round_body,
        (jnp.full(m, num_colors, jnp.int32), jnp.full(m, -1, jnp.int32), valid),
    )
    return color, rank


def color_constraints_incremental(
    refs: jnp.ndarray,  # (M, K) int32 body slots
    dyn: jnp.ndarray,  # (M, K) bool — dynamic endpoints (only these conflict)
    valid: jnp.ndarray,  # (M,) bool
    prev_color: jnp.ndarray,  # (M,) int32 — last frame's color, -1 = none
    n_bodies: int,
    num_colors: int,
    segments=None,
    rounds: int = 3,
    churn_cap: int = None,
    base_used=None,
):
    """Incremental coloring with cross-frame color persistence — the TPU analogue of the
    reference's *persistent* batch membership (constraints keep their ConstraintBatch
    across frames, Solver.cs:984; BatchCompressor.cs only repairs incrementally). The
    per-frame full recoloring loop (color_constraints_kary: num_colors sequential
    scatter-min rounds over the whole table — measured 12 ms/step at 24k constraint
    capacity, 25% of the step) is replaced by:

    1. **Carry**: rows with a valid previous color keep it. Valid because a row's body
       slots never change and last frame's assignment was conflict-free per (body, color)
       — the caller must clear persisted colors whenever a body's dynamic/kinematic kind
       changes (only that flips conflict structure).
    2. **Churn rounds**: still-uncolored rows are compacted to ``churn_cap`` slots
       (overflow rows solve in the Jacobi bucket this frame and retry next frame) and run
       ``rounds`` rounds of: propose the lowest free color (free-bit search rotated by a
       per-row hash so fresh scenes spread across colors instead of filling color 0 as a
       matching), arbitrate per (body, proposed color) by min slot index. Steady-state
       churn is small, so the per-round scatters run over churn_cap rows, not M.
    3. **Capacity/rank**: per (segment, color) rows are ranked carried-first in slot
       order via one-hot cumsums; rows past the segment cap demote to the Jacobi bucket
       (correctly solved there with mass splitting — never dropped) and forget their
       color so they re-propose next frame.

    Returns (color, rank): color in [0, num_colors] (num_colors = Jacobi bucket); rank =
    bucket position within (segment, color), -1 outside segments / in the Jacobi bucket.
    Persist ``where(color < num_colors, color, -1)`` for the next frame.
    """
    import jax

    m, k = refs.shape
    C = num_colors
    if C > 24:
        raise ValueError("num_colors > 24 unsupported (bitmask color search)")
    if churn_cap is None:
        churn_cap = max(min(m, 64), m // 4)
    churn_cap = min(churn_cap, m)
    maskC = jnp.int32((1 << C) - 1)
    slot = jnp.arange(m, dtype=jnp.int32)

    carried = valid & (prev_color >= 0) & (prev_color < C)
    color = jnp.where(carried, prev_color, C)
    unassigned = valid & ~carried

    # Per-body used-color bitmask from carried rows. The carry invariant guarantees at
    # most one carried row per (body, color), so scatter-ADD of single bits is bitwise OR.
    # Targets are the raw refs (pre-sorted once — sorted-index TPU scatters are ~10x
    # faster, solver/solve.py measurement); dead/non-dynamic entries contribute a
    # neutral 0 through the VALUE instead of a sink target.
    flat_ref = refs.reshape(-1)
    _iota = jnp.arange(m * k, dtype=jnp.int32)
    fr_s, fr_p = jax.lax.sort((flat_ref, _iota), num_keys=1)
    cbit = jnp.where(carried, jnp.int32(1) << jnp.maximum(prev_color, 0), 0)
    cbit_flat = jnp.where(dyn, cbit[:, None], 0).reshape(-1)
    used = (
        jnp.zeros(n_bodies + 1, jnp.int32)
        .at[fr_s]
        .add(cbit_flat[fr_p], indices_are_sorted=True)
    )
    if base_used is not None:
        # Claims held by OTHER banks (the persistent pair store) — same (body, color)
        # uniqueness invariant, so proposals here stay globally conflict-free.
        used = used | base_used

    # Compact the churn set.
    from ..utils.packing import compact_true
    sel, n_un = compact_true(unassigned, churn_cap)
    live = jnp.arange(churn_cap) < n_un
    srefs = refs[sel]
    sdyn = dyn[sel] & live[:, None]
    # Preferred color offset hashes the BODY REFS, not the slot index: the sharded path
    # lays the same constraints out at different global slots (device-major blocks), and
    # slot-hashed proposals would assign different colors → different Gauss-Seidel sweep
    # order → sharded ≠ unsharded trajectories. Everything else (min-slot arbitration,
    # churn compaction, capacity ranks) depends only on RELATIVE order, which both
    # layouts share, so body-hashed proposals make the two colorings identical.
    pref = jnp.abs(
        srefs[:, 0] * jnp.int32(-1640531527) + srefs[:, 1] * jnp.int32(40503)
    ) % C
    scolor = jnp.full(churn_cap, C, jnp.int32)
    sactive = live

    # Capacity awareness: per (segment, color) remaining slots after carried rows. Churn
    # rows must not propose a FULL color — without this, demand skew toward low colors
    # demotes the overflow to the Jacobi bucket every frame FOREVER (the demoted rows
    # re-propose the same full color next frame). Tracked per round: winners decrement.
    if segments:
        cols = jnp.arange(C, dtype=jnp.int32)
        seg_index = jnp.full(m, -1, jnp.int32)
        seg_remaining = []  # python list of (C,) arrays, one per segment
        for si, (start, size, cap) in enumerate(segments):
            seg_index = seg_index.at[start : start + size].set(si)
            kseg = jax.lax.dynamic_slice_in_dim(carried, start, size)
            cseg = jax.lax.dynamic_slice_in_dim(jnp.where(carried, prev_color, C), start, size)
            counts = jnp.sum(
                (cseg[:, None] == cols[None, :]) & kseg[:, None], axis=0
            )
            seg_remaining.append(cap - counts)
        s_seg = seg_index[sel]  # (cc,) segment id per churn row, -1 = uncapped

        def full_bits_row():
            bits = jnp.zeros(churn_cap, jnp.int32)
            for si in range(len(segments)):
                fb = jnp.sum(jnp.where(seg_remaining[si] <= 0, jnp.int32(1) << cols, 0))
                bits = jnp.where(s_seg == si, fb, bits)
            return bits
    else:
        s_seg = None

    sink = jnp.int32(n_bodies * C)
    _BIGP = jnp.int32(2**31 - 1)
    for _ in range(rounds):
        # Mask non-dynamic endpoints on READ: the sink slot used[n_bodies] accumulates
        # every non-dynamic endpoint's bits and is meaningless.
        ub = jnp.where(sdyn, used[jnp.where(sdyn, srefs, n_bodies)], 0)  # (cc, k)
        used_row = ub[:, 0]
        for j in range(1, k):
            used_row = used_row | ub[:, j]
        avail = (~used_row) & maskC
        if segments:
            avail = avail & ~full_bits_row()
        has = sactive & (avail != 0)
        # Lowest free color starting from the per-row preferred offset.
        rot = ((avail >> pref) | (avail << (C - pref))) & maskC
        low = rot & (-rot)
        idx = jnp.round(jnp.log2(jnp.maximum(low, 1).astype(jnp.float32))).astype(jnp.int32)
        prop = (idx + pref) % C
        # Arbitrate per (body, proposed color): min original-slot priority wins.
        tgt = jnp.where(sdyn & has[:, None], srefs * C + prop[:, None], sink)
        table = (
            jnp.full(n_bodies * C + 1, _BIGP)
            .at[tgt.reshape(-1)]
            .min(jnp.broadcast_to(sel[:, None], (churn_cap, k)).reshape(-1))
        )
        win = has & jnp.all(~sdyn | (table[tgt] == sel[:, None]), axis=1)
        scolor = jnp.where(win, prop, scolor)
        sactive = sactive & ~win
        wbit = jnp.where(win, jnp.int32(1) << prop, 0)
        used = used.at[jnp.where(sdyn, srefs, n_bodies).reshape(-1)].add(
            jnp.broadcast_to(wbit[:, None], (churn_cap, k)).reshape(-1)
        )
        if segments:
            for si in range(len(segments)):
                won_here = win & (s_seg == si)
                seg_remaining[si] = seg_remaining[si] - jnp.sum(
                    (prop[:, None] == cols[None, :]) & won_here[:, None], axis=0
                )

    color = color.at[jnp.where(live, sel, m)].set(scolor, mode="drop")

    # Capacity enforcement + bucket ranks per segment, carried rows first (stable).
    rank = jnp.full(m, -1, jnp.int32)
    if segments:
        cols = jnp.arange(C, dtype=jnp.int32)
        for start, size, cap in segments:
            cseg = jax.lax.dynamic_slice_in_dim(color, start, size)
            vseg = jax.lax.dynamic_slice_in_dim(valid, start, size)
            kseg = jax.lax.dynamic_slice_in_dim(carried, start, size)
            oh = (cseg[:, None] == cols[None, :]) & vseg[:, None]
            oh_c = oh & kseg[:, None]
            oh_n = oh & ~kseg[:, None]
            cum_c = jnp.cumsum(oh_c.astype(jnp.int32), axis=0)
            cum_n = jnp.cumsum(oh_n.astype(jnp.int32), axis=0)
            tot_c = cum_c[-1][None, :]
            r = jnp.sum(
                jnp.where(oh_c, cum_c - 1, 0) + jnp.where(oh_n, cum_n - 1 + tot_c, 0),
                axis=1,
            )
            in_color = vseg & (cseg < C)
            demote = in_color & (r >= cap)
            color = jax.lax.dynamic_update_slice_in_dim(
                color, jnp.where(demote, C, cseg), start, 0
            )
            rank = jax.lax.dynamic_update_slice_in_dim(
                rank, jnp.where(in_color & ~demote, r, -1), start, 0
            )
    return color, rank


def jacobi_valence(body_a, body_b, dynamic_a, dynamic_b, in_jacobi, n_bodies: int):
    """Per-body count of Jacobi-bucket constraints touching it (≥1), for mass splitting
    (reference fallback scales per-body inertia by constraint count,
    SequentialFallbackBatch.cs:37)."""
    refs = jnp.stack([body_a, body_b], -1)
    dyn = jnp.stack([dynamic_a, dynamic_b], -1)
    return jacobi_valence_kary(refs, dyn, in_jacobi, n_bodies)


def jacobi_valence_kary(refs, dyn, in_jacobi, n_bodies: int, extra_counts=None):
    """``extra_counts``: optional (n_bodies+1,) f32 Jacobi-row counts from banks outside
    this table (the persistent pair store) — merged before the max-with-1."""
    import jax

    m, k = refs.shape
    flat_ref = refs.reshape(-1)
    iota = jnp.arange(m * k, dtype=jnp.int32)
    fr_s, fr_p = jax.lax.sort((flat_ref, iota), num_keys=1)
    vals = (dyn & in_jacobi[:, None]).astype(jnp.float32).reshape(-1)
    val = (
        jnp.zeros(n_bodies + 1, jnp.float32)
        .at[jnp.minimum(fr_s, n_bodies)]
        .add(vals[fr_p], indices_are_sorted=True)
    )[:n_bodies]
    if extra_counts is not None:
        val = val + extra_counts[:n_bodies]
    return jnp.maximum(val, 1.0)
