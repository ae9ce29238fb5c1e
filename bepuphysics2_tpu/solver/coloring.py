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
    return color_constraints_kary(refs, dyn, valid, n_bodies, num_colors)


def color_constraints_kary(
    refs: jnp.ndarray,  # (M, K) int32 body slots
    dyn: jnp.ndarray,  # (M, K) bool — dynamic endpoints (only these conflict)
    valid: jnp.ndarray,  # (M,) bool
    n_bodies: int,
    num_colors: int,
) -> jnp.ndarray:
    """K-ary generalization (covers 1-4 body constraints uniformly)."""
    import jax

    m, k = refs.shape
    slot = jnp.arange(m, dtype=jnp.int32)

    def round_body(c, carry):
        color, unassigned = carry
        prio = jnp.where(unassigned, slot, _BIG)
        body_min = jnp.full(n_bodies, _BIG, jnp.int32)
        for j in range(k):
            body_min = body_min.at[jnp.where(dyn[:, j], refs[:, j], n_bodies)].min(
                prio, mode="drop"
            )
        win = unassigned
        for j in range(k):
            win = win & (~dyn[:, j] | (body_min[refs[:, j]] == prio))
        return jnp.where(win, c, color), unassigned & ~win

    color, _ = jax.lax.fori_loop(
        0, num_colors, round_body, (jnp.full(m, num_colors, jnp.int32), valid)
    )
    return color


def jacobi_valence(body_a, body_b, dynamic_a, dynamic_b, in_jacobi, n_bodies: int):
    """Per-body count of Jacobi-bucket constraints touching it (≥1), for mass splitting
    (reference fallback scales per-body inertia by constraint count,
    SequentialFallbackBatch.cs:37)."""
    refs = jnp.stack([body_a, body_b], -1)
    dyn = jnp.stack([dynamic_a, dynamic_b], -1)
    return jacobi_valence_kary(refs, dyn, in_jacobi, n_bodies)


def jacobi_valence_kary(refs, dyn, in_jacobi, n_bodies: int):
    ones = in_jacobi.astype(jnp.float32)
    val = jnp.zeros(n_bodies, jnp.float32)
    for j in range(refs.shape[1]):
        val = val.at[jnp.where(dyn[:, j] & in_jacobi, refs[:, j], n_bodies)].add(
            ones, mode="drop"
        )
    return jnp.maximum(val, 1.0)
