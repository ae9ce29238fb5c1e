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
    # prune_k mode only (None otherwise): True when the K-candidate budget filled with
    # candidates whose conservative entry bound precedes the returned t — the result
    # MAY not be the earliest impact; re-sweep with prune_k=0 when exactness matters.
    saturated: jnp.ndarray = None


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
    child_owner=None,  # (K,) int32 body slot per compound/mesh child target (-1 = pad)
    child_rows=None,  # (K,) int32 child-pool rows matching child_owner
    prune_k: int = 0,
) -> SweepHit:
    """TOI of the swept shape against every collidable; min-t reduction.

    Targets are unified (owner body, local pose, convex shape) tuples: every plain body
    is a target with identity local pose; compound/mesh bodies are EXPANDED into one
    target per child via ``child_owner``/``child_rows`` (host-enumerated — reference
    sweeps recurse into compound children, CompoundSweepTaskCommon) and masked out as
    whole-body targets, so sweeps are exact against children rather than treating the
    compound as a point."""
    from ..shapes.registry import COMPOUND, MESH, BIG_COMPOUND, TRIANGLE

    n = state.pos.x.shape[0]

    tgt_shape = jnp.maximum(state.shape, 0)
    tgt_type = jnp.where(state.shape >= 0, shapes.type[tgt_shape], -1)
    is_comp = (tgt_type == COMPOUND) | (tgt_type == MESH) | (tgt_type == BIG_COMPOUND)

    # ---- Unified target arrays: bodies first, child targets appended.
    tg_owner = jnp.arange(n, dtype=jnp.int32)
    tg_type = tgt_type
    tg_params = shapes.params[tgt_shape]
    tg_hull_start = shapes.hull_start[tgt_shape]
    tg_hull_count = shapes.hull_count[tgt_shape]
    tg_radius = shapes.max_radius[tgt_shape]
    tg_exists = state.exists & (state.shape >= 0) & ~is_comp
    zero = jnp.zeros((n,), jnp.float32)
    tg_lpos = Vec3(zero, zero, zero)
    tg_lorn = Quat(zero, zero, zero, jnp.ones((n,), jnp.float32))

    if child_owner is not None and child_owner.shape[0] > 0:
        co = child_owner
        cr = jnp.maximum(child_rows, 0)
        cs = shapes.child_shape[cr]
        is_tri = cs < 0
        cs_c = jnp.maximum(cs, 0)
        ctype = jnp.where(is_tri, TRIANGLE, shapes.type[cs_c])
        k = co.shape[0]
        tri12 = jnp.concatenate(
            [shapes.child_tri[cr], jnp.zeros((k, 3), jnp.float32)], axis=1
        )
        cparams = jnp.where(is_tri[:, None], tri12, shapes.params[cs_c])
        lp = Vec3(
            shapes.child_pos[cr, 0], shapes.child_pos[cr, 1], shapes.child_pos[cr, 2]
        )
        lq = Quat(
            shapes.child_orn[cr, 0], shapes.child_orn[cr, 1],
            shapes.child_orn[cr, 2], shapes.child_orn[cr, 3],
        )
        # Rotational lever arm bound: farthest AABB corner from the owner origin.
        mn = shapes.child_aabb_min[cr]
        mx = shapes.child_aabb_max[cr]
        far = jnp.maximum(jnp.abs(mn), jnp.abs(mx))
        crad = jnp.sqrt(far[:, 0] ** 2 + far[:, 1] ** 2 + far[:, 2] ** 2)

        tg_owner = jnp.concatenate([tg_owner, jnp.maximum(co, 0)])
        tg_type = jnp.concatenate([tg_type, ctype])
        tg_params = jnp.concatenate([tg_params, cparams])
        tg_hull_start = jnp.concatenate([tg_hull_start, shapes.hull_start[cs_c]])
        tg_hull_count = jnp.concatenate(
            [tg_hull_count, jnp.where(is_tri, 0, shapes.hull_count[cs_c])]
        )
        tg_radius = jnp.concatenate([tg_radius, crad])
        tg_exists = jnp.concatenate([tg_exists, (co >= 0) & state.exists[jnp.maximum(co, 0)]])
        tg_lpos = Vec3(*(jnp.concatenate([a, b]) for a, b in zip(tg_lpos, lp)))
        tg_lorn = Quat(*(jnp.concatenate([a, b]) for a, b in zip(tg_lorn, lq)))

    T = tg_owner.shape[0]
    o_pos = state.pos[tg_owner]
    o_orn = state.orn[tg_owner]
    o_vel = state.vel[tg_owner]
    o_omega = state.omega[tg_owner]

    saturated = None
    if prune_k and prune_k < T:
        # BVH-descent analogue for sweeps (reference Trees/RayBatcher.cs:125 batching +
        # Tree_Sweep.cs pruning): a cheap conservative ENTRY-TIME lower bound per
        # target (center gap over approach-speed bound) selects the prune_k earliest
        # candidates; the expensive GJK conservative advancement then runs on K
        # targets instead of T. Exact unless more than K candidates' bounds precede
        # the true impact — reported via ``saturated``.
        b0 = o_pos + o_orn.rotate(tg_lpos)
        gap = (b0 - pos).length() - tg_radius - sweep_radius
        sb_ = (
            (vel - o_vel).length()
            + omega.length() * sweep_radius
            + o_omega.length() * tg_radius
            + 1e-6
        )
        entry = jnp.maximum(gap, 0.0) / sb_
        entry = jnp.where(tg_exists & (entry <= max_t), entry, _INF)
        neg_entry, sel = jax.lax.top_k(-entry, prune_k)
        cand_live = neg_entry > -_INF
        kth_entry = -neg_entry[-1]
        kth_live = cand_live[-1]

        tg_owner = tg_owner[sel]
        tg_type = tg_type[sel]
        tg_params = tg_params[sel]
        tg_hull_start = tg_hull_start[sel]
        tg_hull_count = tg_hull_count[sel]
        tg_radius = tg_radius[sel]
        tg_exists = cand_live
        tg_lpos = Vec3(tg_lpos.x[sel], tg_lpos.y[sel], tg_lpos.z[sel])
        tg_lorn = Quat(tg_lorn.x[sel], tg_lorn.y[sel], tg_lorn.z[sel], tg_lorn.w[sel])
        o_pos = Vec3(o_pos.x[sel], o_pos.y[sel], o_pos.z[sel])
        o_orn = Quat(o_orn.x[sel], o_orn.y[sel], o_orn.z[sel], o_orn.w[sel])
        o_vel = Vec3(o_vel.x[sel], o_vel.y[sel], o_vel.z[sel])
        o_omega = Vec3(o_omega.x[sel], o_omega.y[sel], o_omega.z[sel])
        T = prune_k
        saturated = (kth_live, kth_entry)  # finalized after the TOI reduce

    def ctx_at(t):
        # Integrate both the swept shape's and each target owner's pose to time t.
        a_pos = pos + vel * t
        a_orn = integrate_orientation(orn, omega, t)
        ow_pos = o_pos + o_vel * t
        ow_orn = integrate_orientation(o_orn, o_omega, t)
        b_pos = ow_pos + ow_orn.rotate(tg_lpos)
        b_orn = ow_orn.mul(tg_lorn)
        # Broadcast swept shape over all targets (it is the 'A' of each pair).
        ones = jnp.ones((T,), jnp.float32)
        a_pos_b = Vec3(a_pos.x * ones, a_pos.y * ones, a_pos.z * ones)
        a_orn_b = Quat(a_orn.x * ones, a_orn.y * ones, a_orn.z * ones, a_orn.w * ones)
        params_a = jnp.broadcast_to(shape_params[None, :], (T, shape_params.shape[0]))
        return SupportCtx(
            type_a=jnp.full((T,), shape_type, jnp.int32),
            params_a=params_a,
            type_b=tg_type,
            params_b=tg_params,
            orn_ab=a_orn_b.conjugate().mul(b_orn),
            pos_ab=a_orn_b.rotate_inverse(b_pos - a_pos_b),
            hull_points=Vec3(shapes.hull_x, shapes.hull_y, shapes.hull_z),
            hull_start_a=jnp.broadcast_to(
                shapes.hull_start[jnp.maximum(shape_row, 0)], (T,)
            ),
            hull_count_a=jnp.broadcast_to(
                jnp.where(shape_row >= 0, shapes.hull_count[jnp.maximum(shape_row, 0)], 0),
                (T,),
            ),
            hull_start_b=tg_hull_start,
            hull_count_b=tg_hull_count,
            hull_windows=shapes.hull_win.shape[0],
        )

    # Approach-speed upper bound per target (child lever arm folded into tg_radius).
    rel_v = vel - o_vel  # conservative: use magnitude, not normal projection
    speed_bound = (
        rel_v.length()
        + omega.length() * sweep_radius
        + o_omega.length() * tg_radius
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

    t0 = jnp.zeros((T,), jnp.float32)
    done0 = ~tg_exists
    hit_t0 = jnp.full((T,), _INF, jnp.float32)
    _, _, hit_t = jax.lax.fori_loop(0, SWEEP_ITERS, body_fn, (t0, done0, hit_t0))

    hit_t = jnp.where(tg_exists, hit_t, _INF)
    best = jnp.argmin(hit_t)
    best_t = hit_t[best]
    found = best_t < _INF
    sat_out = None
    if saturated is not None:
        kth_live, kth_entry = saturated
        sat_out = kth_live & (
            kth_entry <= jnp.minimum(best_t, jnp.asarray(max_t, jnp.float32))
        )
    return SweepHit(
        hit=found,
        t=jnp.where(found, best_t, jnp.asarray(max_t, jnp.float32)),
        body=jnp.where(found, tg_owner[best], -1),
        saturated=sat_out,
    )


def pair_toi(
    state: BodyState, shapes: ShapeData, a, b, live, max_t, iters: int = 12,
    max_children: int = 8,
):
    """Conservative-advancement time-of-impact for body pairs (a[i], b[i]) — the CCD
    sweep of the reference's NarrowPhaseCCDContinuations/ConvexSweepTaskCommon, as one
    fixed-iteration masked kernel over the compacted CCD pair set. Returns t_hit in
    [0, max_t] (max_t when no impact within the step).

    Pairs with a compound/mesh endpoint sweep against that endpoint's CHILDREN
    (reference SweepTasks/ConvexCompoundSweepTask: the sweep recurses into the compound;
    previously such endpoints were treated at body level, so a fast small shape could
    tunnel through one thin panel of a compound). Child candidates come from the same
    clustered selection the narrow phase uses, queried with the sweep-inflated bounding
    sphere; composite-composite pairs keep the body-level bound."""
    from ..shapes.registry import BIG_COMPOUND, COMPOUND, MESH, TRIANGLE
    from .compound import _select_children_clustered

    def _is_comp(t):
        return (t == COMPOUND) | (t == MESH) | (t == BIG_COMPOUND)

    type_a_raw = jnp.where(state.shape[a] >= 0, shapes.type[jnp.maximum(state.shape[a], 0)], -1)
    type_b_raw = jnp.where(state.shape[b] >= 0, shapes.type[jnp.maximum(state.shape[b], 0)], -1)
    # Canonicalize: if A is the (only) composite, swap so the composite sits on B.
    swap = _is_comp(type_a_raw) & ~_is_comp(type_b_raw)
    a, b = jnp.where(swap, b, a), jnp.where(swap, a, b)

    sa = jnp.maximum(state.shape[a], 0)
    sb = jnp.maximum(state.shape[b], 0)
    type_a = jnp.where(state.shape[a] >= 0, shapes.type[sa], -1)
    type_b = jnp.where(state.shape[b] >= 0, shapes.type[sb], -1)
    comp_pair = _is_comp(type_b) & ~_is_comp(type_a)
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
            hull_windows=shapes.hull_win.shape[0],
        )

    speed_bound = (
        (vel_a - vel_b).length() + om_a.length() * ra + om_b.length() * rb + 1e-6
    )

    def _advance(ctx_at_fn, bound, live0, m):
        def body_fn(_, carry):
            t, done, hit_t = carry
            dist, _, _, margin = gjk_closest(ctx_at_fn(t))
            dist = dist - margin
            impact = dist < 1e-4
            new_hit_t = jnp.where(impact & ~done, t, hit_t)
            advance = jnp.maximum(dist, 0.0) / bound
            new_t = t + jnp.maximum(advance, 1e-5)
            new_done = done | impact | (new_t > max_t)
            return (jnp.where(new_done, t, new_t), new_done, new_hit_t)

        t0 = jnp.zeros((m,), jnp.float32)
        hit0 = jnp.full((m,), jnp.asarray(max_t, jnp.float32))
        _, _, hit_t = jax.lax.fori_loop(0, iters, body_fn, (t0, ~live0, hit0))
        return hit_t

    n = a.shape[0]
    hit_body = _advance(ctx_at, speed_bound, live & ~comp_pair, n)

    if max_children > 0:
        # ---- child-level sweeps for convex-vs-compound/mesh pairs ----------------------
        from ..shapes.registry import ShapeRegistry

        n_pick = max(1, -(-max_children // ShapeRegistry.CLUSTER_SIZE))
        rel_pos_local = orn_b0.rotate_inverse(pos_a0 - pos_b0)
        qrad = ra + (vel_a - vel_b).length() * max_t + (om_a.length() + om_b.length()) * (ra + rb) * max_t
        rows, cand_ok, _ovf = _select_children_clustered(
            shapes, sb, rel_pos_local, qrad, n_pick
        )
        K = rows.shape[1]
        cr = jnp.maximum(rows, 0)
        cshape = shapes.child_shape[cr]
        is_tri = cshape < 0
        cs_c = jnp.maximum(cshape, 0)
        ctype = jnp.where(is_tri, TRIANGLE, shapes.type[cs_c])
        tri12 = jnp.concatenate(
            [shapes.child_tri[cr], jnp.zeros(cr.shape + (3,), jnp.float32)], axis=-1
        )
        cparams = jnp.where(is_tri[..., None], tri12, shapes.params[cs_c])
        lp = Vec3(shapes.child_pos[cr, 0], shapes.child_pos[cr, 1], shapes.child_pos[cr, 2])
        lq = Quat(
            shapes.child_orn[cr, 0], shapes.child_orn[cr, 1],
            shapes.child_orn[cr, 2], shapes.child_orn[cr, 3],
        )
        live_child = (
            comp_pair[:, None] & live[:, None] & cand_ok & (rows >= 0)
        ).reshape(-1)

        def flat(x):
            return jnp.broadcast_to(x[:, None], (n, K)).reshape(-1)

        def flatv(v):
            return Vec3(flat(v.x), flat(v.y), flat(v.z))

        def flatq(q):
            return Quat(flat(q.x), flat(q.y), flat(q.z), flat(q.w))

        fa_pos, fa_vel = flatv(pos_a0), flatv(vel_a)
        fb_pos, fb_vel = flatv(pos_b0), flatv(vel_b)
        fa_orn, fb_orn = flatq(orn_a0), flatq(orn_b0)
        fa_om, fb_om = flatv(om_a), flatv(om_b)
        lp_f = Vec3(lp.x.reshape(-1), lp.y.reshape(-1), lp.z.reshape(-1))
        lq_f = Quat(
            lq.x.reshape(-1), lq.y.reshape(-1), lq.z.reshape(-1), lq.w.reshape(-1)
        )

        def ctx_child(t):
            pa = fa_pos + fa_vel * t
            qa = integrate_orientation(fa_orn, fa_om, t)
            ow = fb_pos + fb_vel * t
            qo = integrate_orientation(fb_orn, fb_om, t)
            pb = ow + qo.rotate(lp_f)
            qb = qo.mul(lq_f)
            return SupportCtx(
                type_a=flat(type_a),
                params_a=shapes.params[flat(sa)],
                type_b=ctype.reshape(-1),
                params_b=cparams.reshape(-1, cparams.shape[-1]),
                orn_ab=qa.conjugate().mul(qb),
                pos_ab=qa.rotate_inverse(pb - pa),
                hull_points=Vec3(shapes.hull_x, shapes.hull_y, shapes.hull_z),
                hull_start_a=shapes.hull_start[flat(sa)],
                hull_count_a=shapes.hull_count[flat(sa)],
                hull_start_b=jnp.where(
                    is_tri.reshape(-1), 0, shapes.hull_start[cs_c.reshape(-1)]
                ),
                hull_count_b=jnp.where(
                    is_tri.reshape(-1), 0, shapes.hull_count[cs_c.reshape(-1)]
                ),
                hull_windows=shapes.hull_win.shape[0],
            )

        bound_child = flat(speed_bound)
        hit_c = _advance(ctx_child, bound_child, live_child, n * K)
        hit_child = jnp.min(hit_c.reshape(n, K), axis=1)
        hit_body = jnp.where(comp_pair, hit_child, hit_body)

    return jnp.where(live, jnp.minimum(hit_body, max_t), jnp.asarray(max_t, jnp.float32))
