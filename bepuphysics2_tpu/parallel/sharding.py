"""Multi-chip execution: sharded batched simulation + spatially-sharded single sim.

The reference's parallelism is shared-memory fork-join threads (SURVEY §2.9, §5.8:
IThreadDispatcher.cs:25, Solver_Solve.cs:297-654 claim/spin machinery). On TPU a single
chip already executes each stage as one fused program, so multi-chip parallelism maps to
jax.sharding over a device Mesh with XLA collectives riding ICI:

1. **Batched worlds (data parallel)** — ``batched_step``: vmap the full timestep over a
   leading batch axis of independent simulations and shard that axis over the mesh. Zero
   communication; the production pattern for RL environment farms / parameter sweeps.

2. **Constraint-sharded single world** (``shard_map`` plan) — bodies replicated, the
   contact/constraint arrays sharded over devices; each color's conflict-free velocity
   deltas are computed locally and combined with ``psum``. Because within a color no two
   constraints share a body (the coloring invariant), the psum of per-shard deltas is
   EXACTLY the single-device Gauss-Seidel result — distribution changes no semantics.
   Islands (sleeping units) are the natural multi-host shard unit since they share no
   constraints (IslandSleeper.cs:174 guarantees closure; SURVEY §5.8).

This module implements (1) fully; (2) lands with the island infrastructure.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..simulation import SimConfig, SimState, step


def make_mesh(n_devices: int | None = None, axis: str = "world"):
    devs = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(devs, (axis,))


def batched_step_fn(config: SimConfig, mesh: Mesh, axis: str = "world"):
    """Returns a jitted function stepping a BATCH of independent simulations, with the
    batch axis sharded over ``mesh``. All pytree leaves of the batched SimState carry a
    leading batch dimension (batch must divide by the mesh size).

    Execution shape: ``shard_map`` over the batch axis with a ``lax.scan`` over each
    device's local worlds — the compiled body is the plain single-world step. (A vmapped
    step is semantically identical but lowers batched scatters/sorts whose XLA:CPU
    compile cost is ~9x the unbatched program — the round-4 dryrun-timeout regression;
    on TPU the scan also avoids batching overhead in the one-world-per-device case.)"""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def _local(states: SimState, shapes, joint_banks, dt):
        def body(_, s):
            s2, diag = step(s, shapes, joint_banks, dt, config)
            return None, (s2, diag)

        _, (out, diags) = jax.lax.scan(body, None, states)
        return out, diags

    specs = dict(
        mesh=mesh,
        in_specs=(P(axis), P(), P(), P()),  # states batch-sharded; rest replicated
        out_specs=P(axis),
    )
    try:
        fn = shard_map(_local, check_vma=False, **specs)
    except TypeError:  # older jax spelling
        fn = shard_map(_local, check_rep=False, **specs)
    return jax.jit(fn)


def replicate_state(state: SimState, batch: int, mesh: Mesh = None, axis: str = "world"):
    """Tile a single-world state into a batch (for batched stepping). When ``mesh`` is
    given, the batch axis is placed sharded over it — matching batched_step_fn's output
    sharding, so the first call compiles the same program as the steady state."""
    out = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), state
    )
    if mesh is not None:
        sh = NamedSharding(mesh, P(axis))
        out = jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), out)
    return out


def sharded_step_fn(config: SimConfig, mesh: Mesh, present_types=None, axis: str = "world"):
    """ONE world, constraints sharded over the mesh — the reference's multithreaded
    solve mapped to chips (SURVEY §5.8): bodies replicated, the pair/contact pipeline and
    every joint bank sharded along their slot axes, per-color velocity deltas combined
    with ``psum`` over ICI. Exactness: the device-side graph coloring is computed over the
    all-gathered global constraint table (identical on every device), and within a color
    no two constraints anywhere share a body, so psum of shard deltas == the single-device
    Gauss-Seidel update (solver/solve.py ``axis_name``).

    Pair→device assignment is by broad-phase row block (pair (a,b) lives with row a), so
    the warm-start PairCache stays device-local across frames.

    Constraints: brute-force broad phase; convex pairs only (no compound/mesh
    expansion). Sleeping IS supported: wake-on-touch pmax-combines woken island labels
    across shards and the island label propagation pmin-combines each round, so islands
    spanning shards sleep/wake exactly as on one device. body_capacity, max_pairs, and
    every joint bank capacity must be divisible by the mesh size.
    """
    import numpy as np
    from functools import partial
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from ..collision import broadphase as bp
    from ..collision.narrowphase import narrow_phase, update_cache
    from ..shapes import compute_body_bounds
    from ..simulation import StepDiagnostics
    from ..solver.solve import solve_all
    from ..utils.vec import Vec3

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    nb = config.body_capacity
    if nb % n_dev or config.max_pairs % n_dev:
        raise ValueError(
            f"body_capacity ({nb}) and max_pairs ({config.max_pairs}) must divide by the "
            f"mesh size ({n_dev})"
        )
    rows_per_dev = nb // n_dev
    local_pairs = config.max_pairs // n_dev

    def _local_step(state: SimState, shapes, joint_banks, dt):
        bodies = state.bodies
        aabb_min, aabb_max = compute_body_bounds(
            bodies.pos, bodies.orn, bodies.vel, bodies.omega, bodies.shape, shapes, dt
        )
        has_shape = bodies.shape >= 0
        big = jnp.float32(3.0e38)
        aabb_min = aabb_min.where(has_shape, Vec3.full(has_shape.shape, big, big, big))
        aabb_max = aabb_max.where(has_shape, Vec3.full(has_shape.shape, -big, -big, -big))

        dev = jax.lax.axis_index(axis)
        pairs = bp.brute_force_rows(
            aabb_min, aabb_max, bodies.kind, bodies.awake, bodies.collision_group,
            dev * rows_per_dev, rows_per_dev, local_pairs,
        )
        prestep, imp, pcolor, _t_eval = narrow_phase(
            bodies, shapes, pairs, state.cache, dt, present_types=present_types
        )
        # Whole-island wake on touch: touches live in the SHARDED pair bank, so the
        # woken-label set combines with a pmax across the mesh (sleep.py axis_name).
        if config.enable_sleep:
            from ..sleep import wake_touched

            bodies = wake_touched(bodies, prestep, axis_name=axis)
        banks = {
            name: dict(
                joint_banks[name],
                impulse=state.joint_impulses[name],
                color=state.joint_colors[name],
            )
            for name in joint_banks
        }
        new_bodies, imps, joint_imps, _, ccolors, jcolors, _sdem = solve_all(
            bodies, [(prestep, imp, pcolor)], banks, config.integrator,
            config.solve_config(), dt, axis_name=axis,
        )
        # Candidacy timers + island sleep decision over the GLOBAL constraint graph
        # (label propagation pmin-combined across shards each round).
        if config.enable_sleep:
            from ..sleep import update_sleep

            new_bodies = update_sleep(
                new_bodies, [prestep], banks, dt, config.sleep_time, axis_name=axis
            )
        cache = update_cache(prestep, imps[0], nb, ccolors[0], slot_live=pairs.valid)
        diag = StepDiagnostics(
            pair_count=jax.lax.psum(jnp.sum(pairs.valid), axis),
            contact_count=jax.lax.psum(
                jnp.sum(prestep.contact_mask & prestep.valid[:, None]), axis
            ),
            overflow=jax.lax.psum(pairs.overflow.astype(jnp.int32), axis) > 0,
            # Collapse the psum COUNT to the broad-phase bit (bit 1) — a raw psum of
            # 0/1 indicators would read as a different overflow source (bit 2 = solver,
            # bit 4 = store) whenever 2 or 4 shards overflowed.
            overflow_src=jnp.where(
                jax.lax.psum(pairs.overflow.astype(jnp.int32), axis) > 0,
                jnp.int32(1), jnp.int32(0),
            ),
            demand=jnp.concatenate(
                [jax.lax.psum(pairs.demand, axis), jnp.zeros(6, jnp.int32)]
            ),
        )
        # Sleep banks pass through (the masked sleeping needs no bank migration).
        # use_pair_store=False here: the sharded pipeline keeps the per-frame cache
        # join — the store's churn scatters don't shard; SURVEY §5.8 islands-as-shards
        # is the designed follow-up.
        return SimState(
            new_bodies, cache, state.ccache, joint_imps, jcolors,
            state.sleep_cache, state.sleep_ccache, state.store,
        ), diag

    rep = P()
    shard0 = P(axis)

    def state_specs(state: SimState) -> SimState:
        return SimState(
            bodies=jax.tree_util.tree_map(lambda _: rep, state.bodies),
            cache=jax.tree_util.tree_map(lambda _: shard0, state.cache),
            ccache=jax.tree_util.tree_map(lambda _: rep, state.ccache),
            joint_impulses=jax.tree_util.tree_map(lambda _: shard0, state.joint_impulses),
            joint_colors=jax.tree_util.tree_map(lambda _: shard0, state.joint_colors),
            sleep_cache=jax.tree_util.tree_map(lambda _: rep, state.sleep_cache),
            sleep_ccache=jax.tree_util.tree_map(lambda _: rep, state.sleep_ccache),
            store=jax.tree_util.tree_map(lambda _: rep, state.store),
        )

    def make(state: SimState, shapes, joint_banks):
        """Build the jitted sharded step for these concrete pytree structures."""
        in_specs = (
            state_specs(state),
            jax.tree_util.tree_map(lambda _: rep, shapes),
            jax.tree_util.tree_map(lambda _: shard0, joint_banks),
            rep,
        )
        out_specs = (
            state_specs(state),
            StepDiagnostics(
                pair_count=rep, contact_count=rep, overflow=rep, overflow_src=rep,
                demand=rep,
            ),
        )
        # check_vma (new name) / check_rep (old): the per-device color slices are
        # device-varying while bodies come out replicated via psum; disable the
        # replication checker rather than fight its inference.
        try:
            fn = shard_map(
                _local_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_vma=False,
            )
        except TypeError:
            fn = shard_map(
                _local_step, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_rep=False,
            )
        return jax.jit(fn)

    return make


def shard_state(state: SimState, mesh: Mesh, axis: str = "world") -> SimState:
    """Place a SimState for the sharded single-world step: bodies/ccache replicated,
    cache and joint impulses sharded along their leading (slot) axis."""
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(axis))
    return SimState(
        bodies=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state.bodies),
        cache=jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state.cache),
        ccache=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state.ccache),
        joint_impulses=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), state.joint_impulses
        ),
        joint_colors=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sh), state.joint_colors
        ),
        sleep_cache=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state.sleep_cache
        ),
        sleep_ccache=jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), state.sleep_ccache
        ),
        store=jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), state.store),
    )
