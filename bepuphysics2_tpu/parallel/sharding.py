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
    leading batch dimension."""

    def _step(states: SimState, shapes, joint_banks, dt):
        return jax.vmap(lambda s: step(s, shapes, joint_banks, dt, config))(states)

    batch_sharding = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(axis)), 0
    )
    return jax.jit(
        _step,
        in_shardings=(
            NamedSharding(mesh, P(axis)),  # states: batch axis sharded
            NamedSharding(mesh, P()),  # shapes replicated
            NamedSharding(mesh, P()),  # joint banks replicated
            NamedSharding(mesh, P()),
        ),
        out_shardings=(NamedSharding(mesh, P(axis)), NamedSharding(mesh, P(axis))),
    )


def replicate_state(state: SimState, batch: int) -> SimState:
    """Tile a single-world state into a batch (for batched stepping)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), state
    )
