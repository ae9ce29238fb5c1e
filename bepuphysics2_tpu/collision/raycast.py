"""Scene ray casting: vectorized ray-vs-all-collidables with min-t reduction.

The reference traverses its BVHs per ray and dispatches per-shape ray testers
(reference: Trees/Tree_RayCast.cs:137, BroadPhase_Queries.cs:42,
Simulation_Queries.cs:167; batched rays via Trees/RayBatcher.cs:125). On TPU the natural
formulation is the RayBatcher taken to its limit: evaluate every (ray, collidable) pair's
analytic intersection in one fused pass and reduce with a masked min — exact, branch-free,
and for the batched case a perfectly regular (R, N) computation. BVH pruning returns as an
optimization once the LBVH lands; the API is already batched-first.

Shape tests: sphere/capsule/box/cylinder/triangle analytic intersections (reference
Collidables/{Sphere,Capsule,Box,Cylinder,Triangle}.cs RayTest implementations' semantics).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bodies import BodyState
from ..shapes.registry import (
    BIG_COMPOUND,
    BOX,
    CAPSULE,
    COMPOUND,
    CYLINDER,
    MESH,
    SPHERE,
    TRIANGLE,
    ShapeData,
)
from ..utils.packing import select_col, select_cols
from ..utils.vec import Quat, Vec3

_INF = 3.0e38


class RayHit(NamedTuple):
    hit: jnp.ndarray  # bool
    t: jnp.ndarray  # distance along (unnormalized) direction
    body: jnp.ndarray  # int32 body slot (-1 = miss)
    normal: Vec3  # world-space surface normal at hit
    # prune_k mode only (None otherwise): True where the K-candidate budget saturated
    # with the K-th candidate's conservative entry bound <= the returned t — i.e. an
    # unexamined body COULD hit earlier; the result may not be the true closest hit.
    # Callers needing exactness re-cast those rays with prune_k=0.
    saturated: jnp.ndarray = None


def _ray_sphere(o: Vec3, d: Vec3, radius):
    """Ray from o along d vs origin-centered sphere. Returns (t, normal, hit)."""
    a = d.dot(d)
    b = 2.0 * o.dot(d)
    c = o.dot(o) - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / jnp.maximum(2.0 * a, 1e-30)
    t1 = (-b + sq) / jnp.maximum(2.0 * a, 1e-30)
    t = jnp.where(t0 >= 0.0, t0, t1)
    hit = (disc >= 0.0) & (t >= 0.0)
    n = (o + d * t).normalize()
    return t, n, hit


def _ray_box(o: Vec3, d: Vec3, h: Vec3):
    """Slab test vs origin-centered AABB with half extents h."""
    inv = Vec3(
        1.0 / jnp.where(jnp.abs(d.x) > 1e-12, d.x, jnp.where(d.x >= 0, 1e-12, -1e-12)),
        1.0 / jnp.where(jnp.abs(d.y) > 1e-12, d.y, jnp.where(d.y >= 0, 1e-12, -1e-12)),
        1.0 / jnp.where(jnp.abs(d.z) > 1e-12, d.z, jnp.where(d.z >= 0, 1e-12, -1e-12)),
    )
    t1 = Vec3((-h.x - o.x) * inv.x, (-h.y - o.y) * inv.y, (-h.z - o.z) * inv.z)
    t2 = Vec3((h.x - o.x) * inv.x, (h.y - o.y) * inv.y, (h.z - o.z) * inv.z)
    tmin_v = t1.min(t2)
    tmax_v = t1.max(t2)
    tmin = jnp.maximum(tmin_v.x, jnp.maximum(tmin_v.y, tmin_v.z))
    tmax = jnp.minimum(tmax_v.x, jnp.minimum(tmax_v.y, tmax_v.z))
    hit = (tmax >= tmin) & (tmax >= 0.0)
    t = jnp.maximum(tmin, 0.0)
    # Normal: the axis achieving tmin, signed opposite the ray.
    eps = 1e-6
    nx = jnp.where(jnp.abs(tmin - t1.x) < eps, -jnp.sign(d.x), jnp.where(jnp.abs(tmin - t2.x) < eps, -jnp.sign(d.x), 0.0))
    is_x = tmin == tmin_v.x
    is_y = (~is_x) & (tmin == tmin_v.y)
    n = Vec3(
        jnp.where(is_x, -jnp.sign(d.x), 0.0),
        jnp.where(is_y, -jnp.sign(d.y), 0.0),
        jnp.where(~(is_x | is_y), -jnp.sign(d.z), 0.0),
    )
    return t, n, hit


def _ray_capsule(o: Vec3, d: Vec3, radius, half_length):
    """Ray vs Y-axis capsule at origin: infinite-cylinder quadratic clamped to the
    segment, plus endpoint sphere caps."""
    # Side surface: project out Y.
    ox, oz, dx, dz = o.x, o.z, d.x, d.z
    a = dx * dx + dz * dz
    b = 2.0 * (ox * dx + oz * dz)
    c = ox * ox + oz * oz - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_a = jnp.maximum(a, 1e-30)
    ts0 = (-b - sq) / (2.0 * safe_a)
    ts1 = (-b + sq) / (2.0 * safe_a)
    ts = jnp.where(ts0 >= 0.0, ts0, ts1)
    y_at = o.y + d.y * ts
    side_ok = (disc >= 0.0) & (a > 1e-12) & (ts >= 0.0) & (jnp.abs(y_at) <= half_length)
    side_n = Vec3(o.x + d.x * ts, jnp.zeros_like(ts), o.z + d.z * ts).normalize()

    # Caps.
    t_top, n_top, hit_top = _ray_sphere(Vec3(o.x, o.y - half_length, o.z), d, radius)
    t_bot, n_bot, hit_bot = _ray_sphere(Vec3(o.x, o.y + half_length, o.z), d, radius)

    t = jnp.where(side_ok, ts, _INF)
    t_cap_top = jnp.where(hit_top, t_top, _INF)
    t_cap_bot = jnp.where(hit_bot, t_bot, _INF)
    t_all = jnp.minimum(t, jnp.minimum(t_cap_top, t_cap_bot))
    n = side_n
    n = n_top.where(t_cap_top == t_all, n)
    n = n_bot.where(t_cap_bot == t_all, n)
    n = side_n.where(t == t_all, n)
    return t_all, n, t_all < _INF


def _ray_cylinder(o: Vec3, d: Vec3, radius, half_length):
    """Ray vs Y-axis cylinder at origin: side quadratic + flat disc caps."""
    a = d.x * d.x + d.z * d.z
    b = 2.0 * (o.x * d.x + o.z * d.z)
    c = o.x * o.x + o.z * o.z - radius * radius
    disc = b * b - 4.0 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    safe_a = jnp.maximum(a, 1e-30)
    ts0 = (-b - sq) / (2.0 * safe_a)
    ts1 = (-b + sq) / (2.0 * safe_a)
    ts = jnp.where(ts0 >= 0.0, ts0, ts1)
    y_at = o.y + d.y * ts
    side_ok = (disc >= 0.0) & (a > 1e-12) & (ts >= 0.0) & (jnp.abs(y_at) <= half_length)
    side_n = Vec3(o.x + d.x * ts, jnp.zeros_like(ts), o.z + d.z * ts).normalize()

    # Caps at y = ±half_length.
    safe_dy = jnp.where(jnp.abs(d.y) > 1e-12, d.y, 1e-12)
    t_up = (half_length - o.y) / safe_dy
    t_dn = (-half_length - o.y) / safe_dy
    def cap_ok(t_cap):
        px = o.x + d.x * t_cap
        pz = o.z + d.z * t_cap
        return (jnp.abs(d.y) > 1e-12) & (t_cap >= 0.0) & (px * px + pz * pz <= radius * radius)
    up_ok = cap_ok(t_up)
    dn_ok = cap_ok(t_dn)

    t = jnp.where(side_ok, ts, _INF)
    t_u = jnp.where(up_ok, t_up, _INF)
    t_d = jnp.where(dn_ok, t_dn, _INF)
    t_all = jnp.minimum(t, jnp.minimum(t_u, t_d))
    n = side_n
    n = Vec3.full(t_all.shape, 0.0, 1.0, 0.0).where(t_u == t_all, n)
    n = Vec3.full(t_all.shape, 0.0, -1.0, 0.0).where(t_d == t_all, n)
    n = side_n.where(t == t_all, n)
    return t_all, n, t_all < _INF


def _ray_triangle(o: Vec3, d: Vec3, va: Vec3, vb: Vec3, vc: Vec3):
    """Möller–Trumbore (two-sided; the engine treats stored triangles one-sided inside
    meshes, handled at the mesh layer)."""
    e1 = vb - va
    e2 = vc - va
    p = d.cross(e2)
    det = e1.dot(p)
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    s = o - va
    u = s.dot(p) * inv_det
    q = s.cross(e1)
    v = d.dot(q) * inv_det
    t = e2.dot(q) * inv_det
    hit = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t >= 0.0)
    n = e1.cross(e2).normalize()
    n = n.where(n.dot(d) < 0.0, -1.0 * n)
    return t, n, hit


def _cast_collidables(pos, orn, shape, shapes: ShapeData, o_b: Vec3, d_b: Vec3,
                      children_window: int):
    """Exact per-collidable ray tests (all registered shape types + compound/mesh child
    pools). ``pos``/``orn``/``shape`` are per-collidable arrays of any trailing shape
    that broadcasts against the ray components in ``o_b``/``d_b`` — (N,) for the
    all-bodies pass, (R, K) for the pruned candidate pass. Returns (t, n_local) with
    t = +inf at misses; the caller applies liveness/max-t filtering and the min-t
    reduction."""
    shape_id = jnp.maximum(shape, 0)
    stype = jnp.where(shape >= 0, shapes.type[shape_id], -1)
    params = shapes.params[shape_id]

    # Transform ray into each body's local frame.
    rel = o_b - pos
    local_o = orn.rotate_inverse(rel)
    local_d = orn.rotate_inverse(d_b)

    results = []
    t_sph, n_sph, h_sph = _ray_sphere(local_o, local_d, params[..., 0])
    results.append((SPHERE, t_sph, n_sph, h_sph))
    t_cap, n_cap, h_cap = _ray_capsule(local_o, local_d, params[..., 0], params[..., 1])
    results.append((CAPSULE, t_cap, n_cap, h_cap))
    t_box, n_box, h_box = _ray_box(local_o, local_d, Vec3(params[..., 0], params[..., 1], params[..., 2]))
    results.append((BOX, t_box, n_box, h_box))
    t_cyl, n_cyl, h_cyl = _ray_cylinder(local_o, local_d, params[..., 0], params[..., 1])
    results.append((CYLINDER, t_cyl, n_cyl, h_cyl))
    t_tri, n_tri, h_tri = _ray_triangle(
        local_o, local_d,
        Vec3(params[..., 0], params[..., 1], params[..., 2]),
        Vec3(params[..., 3], params[..., 4], params[..., 5]),
        Vec3(params[..., 6], params[..., 7], params[..., 8]),
    )
    results.append((TRIANGLE, t_tri, n_tri, h_tri))

    t = jnp.full_like(t_sph, _INF)
    n_local = Vec3.zeros(t.shape)
    for type_id, tt, nn, hh in results:
        sel = (stype == type_id) & hh
        t = jnp.where(sel, tt, t)
        n_local = nn.where(sel, n_local)

    # Compound/mesh bodies: test the ray against each child in the shape's child-pool
    # window (reference: compounds/meshes recurse into their own Tree during RayTest,
    # Simulation_Queries.cs:146; here one fused (N, W) pass). ``children_window`` bounds
    # the per-shape child count examined (0 disables the pass entirely).
    if children_window > 0:
        W = children_window
        offs = jnp.arange(W)
        cstart = shapes.child_start[shape_id]
        ccnt = shapes.child_count[shape_id]
        rows = jnp.minimum(cstart[..., None] + offs, shapes.child_shape.shape[0] - 1)
        live = (offs < ccnt[..., None]) & (
            (stype == COMPOUND) | (stype == BIG_COMPOUND) | (stype == MESH)
        )[..., None]

        lo_w = Vec3(local_o.x[..., None], local_o.y[..., None], local_o.z[..., None])
        ld_w = Vec3(local_d.x[..., None], local_d.y[..., None], local_d.z[..., None])

        # Mesh triangles: vertices live directly in the body's (mesh) frame.
        tri = shapes.child_tri[rows]
        tt, tn, th = _ray_triangle(
            lo_w, ld_w,
            Vec3(tri[..., 0], tri[..., 1], tri[..., 2]),
            Vec3(tri[..., 3], tri[..., 4], tri[..., 5]),
            Vec3(tri[..., 6], tri[..., 7], tri[..., 8]),
        )
        cs = shapes.child_shape[rows]
        is_tri = cs < 0
        tc = jnp.where(live & is_tri & th, tt, _INF)
        nc = tn

        # Registered convex children: transform the ray into each child's frame.
        cs_c = jnp.maximum(cs, 0)
        ctype = shapes.type[cs_c]
        cparams = shapes.params[cs_c]
        cpos = Vec3(
            shapes.child_pos[rows, 0], shapes.child_pos[rows, 1], shapes.child_pos[rows, 2]
        )
        corn = Quat(
            shapes.child_orn[rows, 0], shapes.child_orn[rows, 1],
            shapes.child_orn[rows, 2], shapes.child_orn[rows, 3],
        )
        o_c = corn.rotate_inverse(lo_w - cpos)
        d_c = corn.rotate_inverse(ld_w)
        for type_id, fn in (
            (SPHERE, lambda: _ray_sphere(o_c, d_c, cparams[..., 0])),
            (CAPSULE, lambda: _ray_capsule(o_c, d_c, cparams[..., 0], cparams[..., 1])),
            (BOX, lambda: _ray_box(o_c, d_c, Vec3(cparams[..., 0], cparams[..., 1], cparams[..., 2]))),
            (CYLINDER, lambda: _ray_cylinder(o_c, d_c, cparams[..., 0], cparams[..., 1])),
        ):
            st, sn, sh = fn()
            sel = live & ~is_tri & (ctype == type_id) & sh
            better = sel & (st < tc)
            tc = jnp.where(better, st, tc)
            nc = corn.rotate(sn).where(better, nc)

        best_c = jnp.argmin(tc, axis=-1)
        tc_best = select_col(tc, best_c)
        n_best = Vec3(
            select_col(nc.x, best_c),
            select_col(nc.y, best_c),
            select_col(nc.z, best_c),
        )
        closer = tc_best < t
        t = jnp.where(closer, tc_best, t)
        n_local = n_best.where(closer, n_local)

    return t, n_local


def ray_cast_all(
    state: BodyState, shapes: ShapeData, origin: Vec3, direction: Vec3, max_t,
    exclude=None, children_window: int = 0, prune_k: int = 0,
) -> RayHit:
    """Cast ray(s) against every collidable; min-t reduction. ``origin``/``direction``
    may be single vectors (scalar components) or batched (R,) components — broadcasting
    produces an (R, N) test grid reduced over N. ``exclude``: optional body slot to skip
    (a self-cast filter — the reference expresses this through IRayHitHandler.AllowTest,
    Simulation_Queries.cs:35).

    ``prune_k`` > 0 (batched rays only) enables the TPU analogue of BVH descent
    (reference Trees/Tree_RayCast.cs:137, RayBatcher.cs:125): a cheap bounding-sphere
    pass over all N ranks bodies by a conservative LOWER bound on their hit time, the
    ``prune_k`` earliest candidates are gathered, and the expensive shape/child-pool
    tests run on (R, K) instead of (R, N). For the closest-hit query this is exact
    unless more than K bounding spheres start earlier than the true hit's lower bound —
    i.e. exact in any scene that isn't K-deep along the ray corridor."""
    n_bodies = state.pos.x.shape[0]
    batched = jnp.ndim(origin.x) > 0
    if batched:
        o_b = Vec3(origin.x[:, None], origin.y[:, None], origin.z[:, None])
        d_b = Vec3(direction.x[:, None], direction.y[:, None], direction.z[:, None])
        max_t_b = jnp.asarray(max_t)[..., None] if jnp.ndim(max_t) > 0 else max_t
    else:
        o_b, d_b, max_t_b = origin, direction, max_t

    exists = state.exists & (state.shape >= 0)
    if exclude is not None:
        exists = exists & (jnp.arange(n_bodies) != exclude)

    if prune_k and batched and prune_k < n_bodies:
        # ---- phase 1: conservative entry times vs per-body bounding spheres.
        r_bound = shapes.max_radius[jnp.maximum(state.shape, 0)]
        rel = o_b - state.pos  # (R, N)
        dd = jnp.maximum(d_b.dot(d_b), 1e-30)
        d_len = jnp.sqrt(dd)
        tproj = -rel.dot(d_b) / dd
        tc = jnp.clip(tproj, 0.0, max_t_b)
        closest = rel + d_b * tc
        miss = closest.dot(closest) > (r_bound * r_bound)
        # Lower bound on any hit t: sphere entry can't precede tproj - r/|d|.
        entry = jnp.maximum(tproj - r_bound / d_len, 0.0)
        entry = jnp.where(miss | ~exists, _INF, entry)
        neg_entry, idx = jax.lax.top_k(-entry, prune_k)  # K earliest candidates
        cand_live = neg_entry > -_INF

        rows = jnp.arange(idx.shape[0])[:, None]
        posK = Vec3(state.pos.x[idx], state.pos.y[idx], state.pos.z[idx])
        ornK = Quat(state.orn.x[idx], state.orn.y[idx], state.orn.z[idx],
                    state.orn.w[idx])
        t, n_local = _cast_collidables(
            posK, ornK, state.shape[idx], shapes, o_b, d_b, children_window
        )
        t = jnp.where(cand_live & (t <= max_t_b), t, _INF)
        best_c = jnp.argmin(t, axis=-1)
        best = idx[rows[:, 0], best_c]
        best_t = t[rows[:, 0], best_c]
        n_sel = Vec3(
            n_local.x[rows[:, 0], best_c],
            n_local.y[rows[:, 0], best_c],
            n_local.z[rows[:, 0], best_c],
        )
        orn_sel = state.orn[best]
        # Saturation signal: the K-th (latest-entry) candidate was live AND its entry
        # lower bound precedes the found t — an unexamined body could be closer. When
        # the K-th entry exceeds best_t (or the budget wasn't filled), the pruned
        # result is provably the exact closest hit.
        mt = max_t_b[..., 0] if jnp.ndim(max_t_b) > 0 else jnp.asarray(max_t, jnp.float32)
        best_t_cmp = jnp.minimum(t[rows[:, 0], best_c], mt)
        saturated = cand_live[:, -1] & (-neg_entry[:, -1] <= best_t_cmp)
    else:
        t, n_local = _cast_collidables(
            state.pos, state.orn, state.shape, shapes, o_b, d_b, children_window
        )
        t = jnp.where(exists & (t <= max_t_b), t, _INF)
        best = jnp.argmin(t, axis=-1)
        if batched:
            rows = jnp.arange(t.shape[0])
            best_t = t[rows, best]
            n_sel = Vec3(
                n_local.x[rows, best], n_local.y[rows, best], n_local.z[rows, best]
            )
        else:
            best_t = t[best]
            n_sel = Vec3(n_local.x[best], n_local.y[best], n_local.z[best])
        orn_sel = state.orn[best]
        saturated = None  # full pass: exact by construction
    world_n = orn_sel.rotate(n_sel)
    hit = best_t < _INF
    return RayHit(
        hit=hit,
        t=jnp.where(hit, best_t, jnp.asarray(max_t, jnp.float32)),
        body=jnp.where(hit, best.astype(jnp.int32), -1),
        normal=world_n.where(hit, Vec3.zeros(hit.shape)),
        saturated=saturated,
    )
