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


def jacobi_valence(body_a, body_b, dynamic_a, dynamic_b, in_jacobi, n_bodies: int):
    """Per-body count of Jacobi-bucket constraints touching it (≥1), for mass splitting
    (reference fallback scales per-body inertia by constraint count,
    SequentialFallbackBatch.cs:37)."""
    refs = jnp.stack([body_a, body_b], -1)
    dyn = jnp.stack([dynamic_a, dynamic_b], -1)
    return jacobi_valence_kary(refs, dyn, in_jacobi, n_bodies)


def jacobi_valence_kary(refs, dyn, in_jacobi, n_bodies: int):
    m, k = refs.shape
    flat = jnp.where(dyn & in_jacobi[:, None], refs, n_bodies).reshape(-1)
    val = (
        jnp.zeros(n_bodies + 1, jnp.float32)
        .at[flat]
        .add(jnp.broadcast_to(in_jacobi.astype(jnp.float32)[:, None], (m, k)).reshape(-1))
    )[:n_bodies]
    return jnp.maximum(val, 1.0)
