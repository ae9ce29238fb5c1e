"""Per-stage profiling — the reference SimulationProfiler equivalent
(reference: SimulationProfiler.cs:10, stage taxonomy of DefaultTimestepper.cs:28).

The production step is ONE fused XLA program, so stage timing can't be observed from
inside it. ``profile_stages`` compiles each stage as its own jitted function and times
them with device synchronization — same stage taxonomy as the reference (bounds/broad
phase/narrow phase/solve/sleep), intended for tuning, not for the hot path.
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def profile_stages(sim, dt: float = 1.0 / 60.0, iters: int = 20) -> dict:
    """Returns {stage: seconds_per_call} measured on the simulation's current state."""
    from .collision import broadphase as bp
    from .collision.narrowphase import narrow_phase
    from .shapes import compute_body_bounds
    from .solver.solve import solve_all
    from .utils.vec import Vec3

    if sim._dirty:
        sim._push()
    state = sim._state
    shapes = sim.shapes.device()
    config = sim.config
    bodies = state.bodies

    @jax.jit
    def stage_bounds(bodies):
        return compute_body_bounds(
            bodies.pos, bodies.orn, bodies.vel, bodies.omega, bodies.shape, shapes, dt
        )

    method = config.broadphase
    if method == "auto":
        method = "brute" if config.body_capacity <= 8192 else "sweep"

    @jax.jit
    def stage_broad(aabb_min, aabb_max, bodies):
        if method == "brute":
            return bp.brute_force(
                aabb_min, aabb_max, bodies.kind, bodies.awake, bodies.collision_group,
                config.max_pairs,
            )
        return bp.sweep(
            aabb_min, aabb_max, bodies.kind, bodies.awake, bodies.collision_group,
            config.max_pairs, config.sweep_window,
        )

    # Gate testers by the shapes actually present (same as step()); without this the
    # profiler would time testers the fused step never runs.
    present = tuple(sorted({int(t) for t in sim.shapes.types if t >= 0}))

    @jax.jit
    def stage_narrow(bodies, pairs):
        return narrow_phase(bodies, shapes, pairs, state.cache, dt, present_types=present)

    @jax.jit
    def stage_solve(bodies, prestep, imp):
        return solve_all(
            bodies, [(prestep, imp)], {}, config.integrator, config.solve_config(), dt
        )

    def timeit(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters, out

    results = {}
    results["bounds"], (amin, amax) = timeit(stage_bounds, bodies)
    # Bodies without shapes excluded, mirroring step().
    has_shape = bodies.shape >= 0
    big = jnp.float32(3.0e38)
    amin = amin.where(has_shape, Vec3.full(has_shape.shape, big, big, big))
    amax = amax.where(has_shape, Vec3.full(has_shape.shape, -big, -big, -big))
    results["broadphase"], pairs = timeit(stage_broad, amin, amax, bodies)
    results["narrowphase"], (prestep, imp, _pc) = timeit(stage_narrow, bodies, pairs)
    results["solve"], _ = timeit(stage_solve, bodies, prestep, imp)
    return results
