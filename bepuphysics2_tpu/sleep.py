"""Island sleeping/waking as pure masking — no memory moves.

The reference moves sleeping islands into inactive BodySets/ConstraintSets and their
broad-phase leaves into the static tree (reference: IslandSleeper.cs:13 bounded DFS
``CollectIsland``, IslandAwakener.cs:17 two-phase copy-back). The TPU equivalent keeps
every body in place and flips masks (SURVEY §5.7 'active-mask compaction instead of set
moves'):

- **Island labels** are computed on device by label propagation with pointer jumping over
  the current constraint graph (contacts + all joint banks): each awake dynamic body
  starts labeled with its own index; constraint edges scatter-min labels; a few rounds
  of ``label = label[label]`` collapse chains. Constraint-graph closure is exactly the
  reference's island invariant (IslandSleeper.cs:174).
- **Candidacy** follows the reference's velocity+timer heuristic (BodyActivity): a body
  whose kinetic measure stays below its ``sleep_threshold`` for ``sleep_time`` seconds is
  a candidate; an island sleeps only when EVERY member is a candidate.
- **Waking** is exact whole-island wake: each sleeping body remembers the label of the
  island it slept in; any new contact from an awake body (or host-side user action) wakes
  every body sharing that stored label in one scatter/gather.

Sleeping bodies cost almost nothing: they are filtered out of broad-phase pair
generation (sleeping-vs-sleeping), skip integration, and their joints deactivate when no
endpoint is awake.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .bodies import BodyState, KIND_DYNAMIC

LABEL_ROUNDS = 4  # scatter-min + pointer-jump rounds (diameter up to ~2^(2^rounds))


def _collect_edges(presteps, joint_banks: dict):
    """Gather all constraint edges (a, b, live) from contact banks and joint banks."""
    if not isinstance(presteps, (list, tuple)):
        presteps = [presteps]
    edges = [(p.body_a, p.body_b, p.valid) for p in presteps]
    for name in sorted(joint_banks.keys()):
        bank = joint_banks[name]
        bodies = bank["bodies"]
        valid = bank["valid"]
        nb = bodies.shape[1]
        for j in range(1, nb):
            edges.append((bodies[:, 0], bodies[:, j], valid))
    a = jnp.concatenate([e[0] for e in edges])
    b = jnp.concatenate([e[1] for e in edges])
    live = jnp.concatenate([e[2] for e in edges])
    return a, b, live


def compute_islands(state: BodyState, presteps, joint_banks: dict,
                    axis_name: str = None) -> jnp.ndarray:
    """Island label per body (label = min body index in the island) over dynamic bodies
    connected by live constraints. Non-dynamic bodies keep their own index (statics/
    kinematics never merge islands — matching the reference: kinematics don't propagate
    islands, Solver.GetBlockingBodyHandles).

    ``axis_name``: when set, this runs INSIDE shard_map with bodies replicated and the
    constraint banks sharded — each round's per-shard scatter-min is combined with a
    cross-shard ``pmin`` so labels converge over the GLOBAL constraint graph (islands
    spanning shards merge exactly; SURVEY §5.8)."""
    n = state.pos.x.shape[0]
    labels = jnp.arange(n, dtype=jnp.int32)
    ea, eb, live = _collect_edges(presteps, joint_banks)
    dyn_a = state.kind[ea] == KIND_DYNAMIC
    dyn_b = state.kind[eb] == KIND_DYNAMIC
    edge_ok = live & dyn_a & dyn_b

    # Edge endpoints are static across rounds: pre-sort the scatter targets once
    # (sorted-index TPU scatters are ~10x faster; solver/solve.py measurement) and
    # neutralize dead edges through the VALUE (min with n is a no-op) instead of
    # redirecting their target.
    iota = jnp.arange(ea.shape[0], dtype=jnp.int32)
    ea_s, ea_p = jax.lax.sort((ea, iota), num_keys=1)
    eb_s, eb_p = jax.lax.sort((eb, iota), num_keys=1)

    def body_round(_, labels):
        la = labels[ea]
        lb = labels[eb]
        m = jnp.where(edge_ok, jnp.minimum(la, lb), n)
        labels = labels.at[ea_s].min(m[ea_p], indices_are_sorted=True)
        labels = labels.at[eb_s].min(m[eb_p], indices_are_sorted=True)
        if axis_name is not None:
            labels = jax.lax.pmin(labels, axis_name)
        # Pointer jumping (twice) to collapse chains quickly.
        labels = labels[labels]
        labels = labels[labels]
        return labels

    return jax.lax.fori_loop(0, LABEL_ROUNDS, body_round, labels)


def wake_touched(state: BodyState, prestep, axis_name: str = None) -> BodyState:
    """Wake sleeping bodies contacted by awake dynamics — whole stored island at once
    (reference IslandAwakener: narrow-phase touch triggers island awakening).
    The pair-table scatters/gathers only run when anything is actually asleep
    (runtime cond; fully-awake scenes skip this stage)."""
    n = state.pos.x.shape[0]
    sleeping_dyn = (state.kind == KIND_DYNAMIC) & ~state.awake

    def wake_pass(_):
        a, b = prestep.body_a, prestep.body_b
        awake_dyn = (state.kind == KIND_DYNAMIC) & state.awake
        touch_b = prestep.valid & awake_dyn[a] & sleeping_dyn[b]
        touch_a = prestep.valid & awake_dyn[b] & sleeping_dyn[a]

        woken_label = jnp.zeros(n, bool)
        lbl = state.sleep_island
        woken_label = woken_label.at[jnp.where(touch_b, lbl[b], n)].set(True, mode="drop")
        woken_label = woken_label.at[jnp.where(touch_a, lbl[a], n)].set(True, mode="drop")
        if axis_name is not None:
            # Touches seen by ANY shard wake the island everywhere (pair banks are
            # sharded; the cond predicate is replicated so every shard enters here).
            woken_label = jax.lax.pmax(woken_label.astype(jnp.int32), axis_name) > 0
        wake = sleeping_dyn & woken_label[lbl]
        return state._replace(
            awake=state.awake | wake,
            sleep_timer=jnp.where(wake, 0.0, state.sleep_timer),
        )

    return jax.lax.cond(jnp.any(sleeping_dyn), wake_pass, lambda _: state, None)


def update_sleep(state: BodyState, presteps, joint_banks: dict, dt, sleep_time: float,
                 axis_name: str = None) -> BodyState:
    """Post-solve candidacy update + island sleep decision.

    The island label propagation (LABEL_ROUNDS scatter-min/pointer-jump rounds — measured
    3 ms/step at 4k bodies) only matters when some body's timer has actually crossed
    ``sleep_time``; active scenes skip it entirely behind a runtime ``lax.cond`` — the
    analogue of the reference only traversing a tested fraction of candidate islands per
    frame (IslandSleeper.cs:28-38)."""
    n = state.pos.x.shape[0]
    dyn_awake = (state.kind == KIND_DYNAMIC) & state.awake

    kinetic = state.vel.length_squared() + state.omega.length_squared()
    below = kinetic < state.sleep_threshold
    can_sleep = state.sleep_threshold >= 0.0
    timer = jnp.where(dyn_awake & below, state.sleep_timer + dt, 0.0)
    candidate = dyn_awake & below & can_sleep & (timer > sleep_time)

    def sleep_pass(_):
        labels = compute_islands(state, presteps, joint_banks, axis_name=axis_name)
        # Island sleeps iff every dynamic awake member is a candidate.
        island_all = jnp.ones(n, bool)
        island_all = island_all.at[jnp.where(dyn_awake, labels, n)].min(
            candidate, mode="drop"
        )
        go_sleep = dyn_awake & island_all[labels]

        zero = jnp.zeros_like(state.vel.x)
        from .utils.vec import Vec3

        sleeping_vel = state.vel.where(~go_sleep, Vec3(zero, zero, zero))
        sleeping_omega = state.omega.where(~go_sleep, Vec3(zero, zero, zero))
        return state._replace(
            awake=state.awake & ~go_sleep,
            vel=sleeping_vel,
            omega=sleeping_omega,
            sleep_timer=timer,
            sleep_island=jnp.where(go_sleep, labels, state.sleep_island),
        )

    def no_candidates(_):
        return state._replace(sleep_timer=timer)

    return jax.lax.cond(jnp.any(candidate), sleep_pass, no_candidates, None)
