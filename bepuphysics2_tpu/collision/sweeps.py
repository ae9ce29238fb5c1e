"""Shape sweeps: conservative advancement to time-of-impact, vectorized over all bodies.

The reference's sweep testers find TOI by sample-based conservative advancement over the
swept poses, including angular velocity (reference:
CollisionDetection/SweepTasks/ConvexSweepTaskCommon.cs:116-230, GJKDistanceTester.cs:8,
scene-level Simulation.Sweep Simulation_Queries.cs:267). Here the same algorithm runs as
one fixed-iteration masked kernel against EVERY collidable simultaneously (min-t reduce),
using the engine's generic GJK distance:

    t ← 0
    repeat ITERS times:
        d, n ← GJK distance between the shapes posed at time t
        done if d < ε (impact) or t > max_t (miss)
        t += d / (upper bound of approach speed)       # can never skip a contact

The approach-speed bound is |v_rel·n| + |ω_a|·r_a + |ω_b|·r_b (normal-projected linear
velocity plus worst-case surface speed from rotation), matching the reference's bound.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bodies import BodyState
from ..shapes.registry import ShapeData
from ..utils.vec import Quat, Vec3, integrate_orientation
from .convex import SupportCtx, gjk_closest

SWEEP_ITERS = 32
_INF = 3.0e38


class SweepHit(NamedTuple):
    hit: jnp.ndarray
    t: jnp.ndarray
    body: jnp.ndarray


def sweep_shape_all(
    state: BodyState,
    shapes: ShapeData,
    shape_type,
    shape_params,  # (12,) packed params of the swept shape
    shape_row,  # registry row for hull pools (-1 if none)
    pos: Vec3,
    orn: Quat,
    vel: Vec3,
    omega: Vec3,
    sweep_radius,  # maximum radius of the swept shape (for angular bound)
    max_t,
) -> SweepHit:
    """TOI of the swept shape against every collidable; min-t reduction."""
    n = state.pos.x.shape[0]

    tgt_shape = jnp.maximum(state.shape, 0)
    tgt_type = jnp.where(state.shape >= 0, shapes.type[tgt_shape], -1)
    tgt_params = shapes.params[tgt_shape]
    tgt_radius = shapes.max_radius[tgt_shape]
    exists = state.exists & (state.shape >= 0)

    bshape = jnp.full((n,), 1, jnp.int32)

    def ctx_at(t):
        # Integrate both the swept shape's and each target's pose to time t.
        a_pos = pos + vel * t
        a_orn = integrate_orientation(orn, omega, t)
        b_pos = state.pos + state.vel * t
        b_orn = integrate_orientation(state.orn, state.omega, t)
        # Broadcast swept shape over all targets (it is the 'A' of each pair).
        ones = jnp.ones((n,), jnp.float32)
        a_pos_b = Vec3(a_pos.x * ones, a_pos.y * ones, a_pos.z * ones)
        a_orn_b = Quat(a_orn.x * ones, a_orn.y * ones, a_orn.z * ones, a_orn.w * ones)
        params_a = jnp.broadcast_to(shape_params[None, :], (n, shape_params.shape[0]))
        return SupportCtx(
            type_a=jnp.full((n,), shape_type, jnp.int32),
            params_a=params_a,
            type_b=tgt_type,
            params_b=tgt_params,
            orn_ab=a_orn_b.conjugate().mul(b_orn),
            pos_ab=a_orn_b.rotate_inverse(b_pos - a_pos_b),
            hull_points=Vec3(shapes.hull_x, shapes.hull_y, shapes.hull_z),
            hull_start_a=jnp.broadcast_to(
                shapes.hull_start[jnp.maximum(shape_row, 0)], (n,)
            ),
            hull_count_a=jnp.broadcast_to(
                jnp.where(shape_row >= 0, shapes.hull_count[jnp.maximum(shape_row, 0)], 0),
                (n,),
            ),
            hull_start_b=shapes.hull_start[tgt_shape],
            hull_count_b=shapes.hull_count[tgt_shape],
        )

    # Approach-speed upper bound per target.
    rel_v = vel - state.vel  # conservative: use magnitude, not normal projection
    speed_bound = (
        rel_v.length()
        + omega.length() * sweep_radius
        + state.omega.length() * tgt_radius
        + 1e-6
    )

    def body_fn(_, carry):
        t, done, hit_t = carry
        ctx = ctx_at(t)
        dist, _, _, margin = gjk_closest(ctx)
        dist = dist - margin  # surface distance including radii margins
        impact = dist < 1e-4
        new_hit_t = jnp.where(impact & ~done, t, hit_t)
        advance = jnp.maximum(dist, 0.0) / speed_bound
        new_t = t + jnp.maximum(advance, 1e-5)
        new_done = done | impact | (new_t > max_t)
        return (jnp.where(new_done, t, new_t), new_done, new_hit_t)

    t0 = jnp.zeros((n,), jnp.float32)
    done0 = ~exists
    hit_t0 = jnp.full((n,), _INF, jnp.float32)
    _, _, hit_t = jax.lax.fori_loop(0, SWEEP_ITERS, body_fn, (t0, done0, hit_t0))

    hit_t = jnp.where(exists, hit_t, _INF)
    best = jnp.argmin(hit_t)
    best_t = hit_t[best]
    found = best_t < _INF
    return SweepHit(
        hit=found,
        t=jnp.where(found, best_t, jnp.asarray(max_t, jnp.float32)),
        body=jnp.where(found, best.astype(jnp.int32), -1),
    )


def pair_toi(state: BodyState, shapes: ShapeData, a, b, live, max_t, iters: int = 12):
    """Conservative-advancement time-of-impact for body pairs (a[i], b[i]) — the CCD
    sweep of the reference's NarrowPhaseCCDContinuations/ConvexSweepTaskCommon, as one
    fixed-iteration masked kernel over the compacted CCD pair set. Returns t_hit in
    [0, max_t] (max_t when no impact within the step)."""
    sa = jnp.maximum(state.shape[a], 0)
    sb = jnp.maximum(state.shape[b], 0)
    type_a = jnp.where(state.shape[a] >= 0, shapes.type[sa], -1)
    type_b = jnp.where(state.shape[b] >= 0, shapes.type[sb], -1)
    ra = shapes.max_radius[sa]
    rb = shapes.max_radius[sb]
    pos_a0, pos_b0 = state.pos[a], state.pos[b]
    orn_a0, orn_b0 = state.orn[a], state.orn[b]
    vel_a, vel_b = state.vel[a], state.vel[b]
    om_a, om_b = state.omega[a], state.omega[b]

    def ctx_at(t):
        pa = pos_a0 + vel_a * t
        pb = pos_b0 + vel_b * t
        qa = integrate_orientation(orn_a0, om_a, t)
        qb = integrate_orientation(orn_b0, om_b, t)
        return SupportCtx(
            type_a=type_a,
            params_a=shapes.params[sa],
            type_b=type_b,
            params_b=shapes.params[sb],
            orn_ab=qa.conjugate().mul(qb),
            pos_ab=qa.rotate_inverse(pb - pa),
            hull_points=Vec3(shapes.hull_x, shapes.hull_y, shapes.hull_z),
            hull_start_a=shapes.hull_start[sa],
            hull_count_a=shapes.hull_count[sa],
            hull_start_b=shapes.hull_start[sb],
            hull_count_b=shapes.hull_count[sb],
        )

    speed_bound = (
        (vel_a - vel_b).length() + om_a.length() * ra + om_b.length() * rb + 1e-6
    )

    def body_fn(_, carry):
        t, done, hit_t = carry
        dist, _, _, margin = gjk_closest(ctx_at(t))
        dist = dist - margin
        impact = dist < 1e-4
        new_hit_t = jnp.where(impact & ~done, t, hit_t)
        advance = jnp.maximum(dist, 0.0) / speed_bound
        new_t = t + jnp.maximum(advance, 1e-5)
        new_done = done | impact | (new_t > max_t)
        return (jnp.where(new_done, t, new_t), new_done, new_hit_t)

    n = a.shape[0]
    t0 = jnp.zeros((n,), jnp.float32)
    done0 = ~live
    hit0 = jnp.full((n,), jnp.asarray(max_t, jnp.float32))
    _, _, hit_t = jax.lax.fori_loop(0, iters, body_fn, (t0, done0, hit0))
    return jnp.where(live, jnp.minimum(hit_t, max_t), jnp.asarray(max_t, jnp.float32))
