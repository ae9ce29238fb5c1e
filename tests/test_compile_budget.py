"""Compile-cost guard: the step program at multichip-dryrun size must stay cheap to
compile on CPU.

Round 4 shipped a regression where the dryrun's step compile blew past 3 minutes on a
1-core box (MULTICHIP_r04 rc=124). The graph shape — not the scene size — drives this
cost, so a 16-body scene is a faithful canary for the whole dryrun/test dev loop.
"""
import time

import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow  # one full step compile (~30 s on a 1-core box)
def test_step_compile_budget_at_dryrun_size():
    from __graft_entry__ import _build_pile_sim
    from bepuphysics2_tpu.simulation import step

    sim, config = _build_pile_sim(
        body_capacity=64, max_pairs=128, substeps=2, num_colors=2, n_bodies=16,
        settle=True,
    )
    state = sim.state
    shapes = sim.shapes.device()

    t0 = time.time()
    lowered = jax.jit(step, static_argnames=("config", "present_types")).lower(
        state, shapes, {}, jnp.float32(1 / 60), config,
        tuple(sorted({int(t) for t in sim.shapes.types if t >= 0})),
    )
    t_lower = time.time() - t0
    t0 = time.time()
    lowered.compile()
    t_compile = time.time() - t0
    # Budgets sized 2x over the measured 1-core times (lower ~4 s, compile ~27 s at
    # opt level 1); the round-4 regression was 6-10x over these.
    assert t_lower < 30.0, f"step lowering took {t_lower:.1f}s (budget 30s)"
    assert t_compile < 60.0, f"step compile took {t_compile:.1f}s (budget 60s)"
