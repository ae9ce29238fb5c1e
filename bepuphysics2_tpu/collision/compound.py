"""Compound & mesh narrow phase: bounded child-pair expansion.

The reference dispatches compound/mesh pairs through dedicated tasks that walk the
compound's children or the mesh's embedded BVH, spawn child convex tests, and reduce the
child manifolds (reference: CollisionDetection/CollisionTasks/ConvexCompoundCollisionTask.cs,
CompoundPairCollisionTask.cs, *OverlapFinder.cs, NonconvexReduction.cs:25, MeshReduction.cs).

TPU re-design (fixed shapes, SURVEY §7 phase 6):
- broad-phase pairs touching a compound/mesh are compacted into MPC slots;
- each slot expands into E child records; WHICH children occupy the slots is chosen on
  device by an AABB prefilter in the compound's local frame (stable argsort — overlapping
  children first), bounding the work exactly like the reference's per-pair BVH walk;
- child records resolve to plain convex pairs (triangle children use the TRIANGLE type)
  and run through the SAME tester registry / generic GJK-MPR kernel as body pairs;
- instead of reducing child manifolds to one ≤4-contact nonconvex manifold, every child
  record becomes its own contact-constraint record (same bodies, child-local offsets
  rebased to the body center). This preserves MORE contact information than the
  reference's reduction; warm starting stays exact because the cache key includes the
  child slot.

Compound/mesh vs convex pairs expand via ``expand_compound_pairs``;
compound/mesh vs compound/mesh via ``expand_compound_compound`` (children_per_side² child
records per pair, both sides prefiltered — the reference's CompoundPairCollisionTask /
CompoundMeshReduction). With cc expansion disabled such pairs raise the overflow flag.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..bodies import BodyState
from ..shapes.registry import COMPOUND, MESH, TRIANGLE, ShapeData
from ..utils.packing import compact_true,  select_col, select_cols
from ..utils.vec import Quat, Vec3


class ChildPairs(NamedTuple):
    """Expanded child-pair records (capacity MPC × E, flattened)."""

    body_a: jnp.ndarray  # (M,) scene body owning the compound side A of the record
    body_b: jnp.ndarray
    slot: jnp.ndarray  # (M,) int32 — expansion slot (for cache keying)
    valid: jnp.ndarray
    # Resolved convex child data (canonical: type_i <= type_j):
    type_i: jnp.ndarray
    type_j: jnp.ndarray
    params_i: jnp.ndarray  # (M, 12)
    params_j: jnp.ndarray
    pos_i: Vec3  # world child poses
    pos_j: Vec3
    orn_i: Quat
    orn_j: Quat
    shape_i: jnp.ndarray  # shape rows (for hull pools); -1 for triangles
    shape_j: jnp.ndarray
    swapped: jnp.ndarray  # (M,) bool — canonicalization swapped i/j relative to (a,b)
    conv_is_a: jnp.ndarray  # (M,) bool — the convex (non-compound) body is scene body_a
    overflow: jnp.ndarray  # () bool
    t: jnp.ndarray  # (M,) CCD evaluation time of the record's poses (0 = no CCD)


def _sphere_vs_aabb(mn, mx, cx, cy, cz, radius):
    """Squared clamp-distance from sphere center to AABB + overlap mask.
    mn/mx: (..., 3); cx/cy/cz, radius broadcastable to the leading dims."""
    qx = jnp.clip(cx, mn[..., 0], mx[..., 0]) - cx
    qy = jnp.clip(cy, mn[..., 1], mx[..., 1]) - cy
    qz = jnp.clip(cz, mn[..., 2], mx[..., 2]) - cz
    d2 = qx * qx + qy * qy + qz * qz
    return d2 <= radius * radius, d2


def _child_aabb_overlap(shapes: ShapeData, child_rows, other_center_local: Vec3, other_radius):
    """Per-child prefilter: the other body's bounding sphere vs each child's
    host-precomputed local AABB (ShapeData.child_aabb_* — tight for long thin
    children, exact for triangles). child_rows: (MPC, W)."""
    mn = shapes.child_aabb_min[child_rows]
    mx = shapes.child_aabb_max[child_rows]
    return _sphere_vs_aabb(
        mn, mx,
        other_center_local.x[:, None], other_center_local.y[:, None],
        other_center_local.z[:, None], other_radius[:, None],
    )


def _select_children_clustered(
    shapes: ShapeData, c_shape, other_local: Vec3, other_radius, n_pick: int
):
    """Two-level child candidate selection — the TPU analogue of the reference's
    per-pair BVH walk (ConvexCompoundOverlapFinder / Mesh.Tree): test the other body's
    bounding sphere against the shape's cluster spheres (built Morton-ordered at
    registration, registry._build_clusters), keep the ``n_pick`` overlapping clusters,
    and expand them to CLUSTER_SIZE child rows each. Returns (rows (MPC, n_pick·CS),
    candidate_ok, overflow) — overflow fires when more clusters overlap than examined,
    never silently drops."""
    from ..shapes.registry import ShapeRegistry

    CS = ShapeRegistry.CLUSTER_SIZE
    crow = shapes.shape_cluster_row[c_shape]  # (MPC,)
    crow_c = jnp.maximum(crow, 0)
    counts = shapes.cl_count[crow_c]
    ovb, d2 = _sphere_vs_aabb(
        shapes.cl_min[crow_c], shapes.cl_max[crow_c],
        other_local.x[:, None], other_local.y[:, None], other_local.z[:, None],
        other_radius[:, None],
    )
    ov = ovb & (counts > 0) & (crow >= 0)[:, None]
    n_pick = min(n_pick, ov.shape[1])
    overflow = jnp.any(jnp.sum(ov, -1) > n_pick)
    # Nearest overlapping clusters first (same rationale as _pick_nearest).
    order = jnp.argsort(jnp.where(ov, d2, jnp.float32(3.0e38)), axis=-1)[:, :n_pick]
    pick_first = select_cols(shapes.cl_first[crow_c], order)
    pick_cnt = select_cols(counts, order)
    pick_ok = select_cols(ov, order)
    sub = jnp.arange(CS, dtype=jnp.int32)
    rows = pick_first[:, :, None] + sub[None, None, :]
    ok = pick_ok[:, :, None] & (sub[None, None, :] < pick_cnt[:, :, None])
    rows = jnp.minimum(rows, shapes.child_shape.shape[0] - 1)
    m = rows.shape[0]
    return rows.reshape(m, -1), ok.reshape(m, -1), overflow


def _pick_nearest(rows, ov, d2, n_keep: int):
    """Keep the ``n_keep`` NEAREST overlapping children (by centroid distance), then
    re-sort the kept set by child row so slots stay stable across frames while the same
    children remain in contact (slot-keyed warm-start cache). Nearest-first matters when
    demand exceeds capacity: the supporting contacts are the close ones — a
    first-by-index pick can drop the child actually holding the body up."""
    BIGF = jnp.float32(3.0e38)
    key = jnp.where(ov, d2, BIGF)
    order = jnp.argsort(key, axis=-1)[:, :n_keep]
    picked_rows = select_cols(rows, order)
    picked_ok = select_cols(ov, order)
    rkey = jnp.where(picked_ok, picked_rows, jnp.int32(2**31 - 1))
    stable = jnp.argsort(rkey, axis=-1)
    return select_cols(picked_rows, stable), select_cols(picked_ok, stable)


def expand_compound_pairs(
    state: BodyState,
    shapes: ShapeData,
    pair_a: jnp.ndarray,
    pair_b: jnp.ndarray,
    pair_valid: jnp.ndarray,
    max_compound_pairs: int,
    children_per_pair: int,
    child_window: int,
    flag_both_comp: bool = True,
    pair_t=None,
    dt=0.0,
) -> ChildPairs:
    """Compact compound/mesh-involved pairs and expand into child convex records.
    ``flag_both_comp``: raise overflow on compound-vs-compound pairs (set False when the
    caller routes those through expand_compound_compound). ``pair_t``: per-pair CCD
    time-of-impact (narrow_phase t_eval): poses are advanced to it before selection and
    manifold generation (reference NarrowPhaseCCDContinuations: compound CCD pairs
    evaluate their child manifolds at the swept pose)."""
    nb = state.pos.x.shape[0]
    sa = jnp.maximum(state.shape[pair_a], 0)
    sb = jnp.maximum(state.shape[pair_b], 0)
    ta = jnp.where(state.shape[pair_a] >= 0, shapes.type[sa], -1)
    tb = jnp.where(state.shape[pair_b] >= 0, shapes.type[sb], -1)
    comp_a = (ta == COMPOUND) | (ta == MESH)
    comp_b = (tb == COMPOUND) | (tb == MESH)
    is_comp = pair_valid & (comp_a | comp_b)
    both_comp = pair_valid & comp_a & comp_b  # unsupported this phase → overflow flag

    count = jnp.sum(is_comp & ~both_comp)
    sel, _ = compact_true(is_comp & ~both_comp, max_compound_pairs)
    live_pair = jnp.arange(max_compound_pairs) < count
    overflow = count > max_compound_pairs
    if flag_both_comp:
        overflow = overflow | jnp.any(both_comp)

    # Orient so C = the compound/mesh side, V = the convex side.
    a_sel = pair_a[sel]
    b_sel = pair_b[sel]
    a_is_comp = comp_a[sel]
    c_body = jnp.where(a_is_comp, a_sel, b_sel)
    v_body = jnp.where(a_is_comp, b_sel, a_sel)
    c_shape = jnp.maximum(state.shape[c_body], 0)
    v_shape = jnp.maximum(state.shape[v_body], 0)

    # Select children: bounding test in the compound's local frame, overlapping first.
    # CCD pairs evaluate at their TOI-advanced poses.
    from ..utils.vec import integrate_orientation as _int_orn

    t_sel = pair_t[sel] if pair_t is not None else jnp.zeros_like(a_sel, jnp.float32)

    def _adv_pos(bod):
        return state.pos[bod] + state.vel[bod] * t_sel

    def _adv_orn(bod):
        return _int_orn(state.orn[bod], state.omega[bod], t_sel)

    c_pos = _adv_pos(c_body)
    c_orn = _adv_orn(c_body)
    v_pos = _adv_pos(v_body)
    other_local = c_orn.rotate_inverse(v_pos - c_pos)
    # Selection radius carries the speculative band (reference: the child BVH query
    # uses the velocity-expanded bounds): remaining in-step motion + the resting
    # margin, so near-touching children (incl. the TOI-advanced CCD pose, where the
    # gap is ~1e-4 by construction) are never missed.
    rel_speed = (state.vel[c_body] - state.vel[v_body]).length()
    slack = (
        rel_speed * jnp.maximum(jnp.asarray(dt, jnp.float32) - t_sel, 0.0)
        + 0.5 * (state.spec_margin_min[c_body] + state.spec_margin_min[v_body])
        + 1e-3
    )
    v_radius = shapes.max_radius[v_shape] + slack

    from ..shapes.registry import ShapeRegistry

    n_pick = max(1, child_window // ShapeRegistry.CLUSTER_SIZE)
    rows, cand_ok, cl_ovf = _select_children_clustered(
        shapes, c_shape, other_local, v_radius, n_pick
    )
    ov, d2 = _child_aabb_overlap(shapes, rows, other_local, v_radius)
    ov = ov & cand_ok
    child_overflow = jnp.any(jnp.sum(ov, -1) > children_per_pair)
    overflow = overflow | child_overflow | cl_ovf
    picked_rows, picked_ok = _pick_nearest(rows, ov, d2, children_per_pair)

    E = children_per_pair
    MPC = max_compound_pairs
    M = MPC * E

    def flat(x):
        return x.reshape(M, *x.shape[2:])

    rec_pair = jnp.repeat(jnp.arange(MPC), E)
    rec_slot = jnp.tile(jnp.arange(E, dtype=jnp.int32), MPC)
    child_row = flat(picked_rows)
    rec_valid = flat(picked_ok) & live_pair[rec_pair]

    cb = c_body[rec_pair]
    vb = v_body[rec_pair]
    body_a = jnp.minimum(cb, vb)
    body_b = jnp.maximum(cb, vb)

    # Resolve child convex shape + world pose.
    cs = shapes.child_shape[child_row]
    is_tri = cs < 0
    cs_c = jnp.maximum(cs, 0)
    child_type = jnp.where(is_tri, TRIANGLE, shapes.type[cs_c])
    child_params = jnp.where(
        is_tri[:, None], shapes.child_tri[child_row].astype(jnp.float32) @ _TRI_PAD,
        shapes.params[cs_c],
    )
    local_p = Vec3(
        shapes.child_pos[child_row, 0],
        shapes.child_pos[child_row, 1],
        shapes.child_pos[child_row, 2],
    )
    local_q = Quat(
        shapes.child_orn[child_row, 0],
        shapes.child_orn[child_row, 1],
        shapes.child_orn[child_row, 2],
        shapes.child_orn[child_row, 3],
    )
    t_rec = t_sel[rec_pair]
    cpos_r = state.pos[cb] + state.vel[cb] * t_rec
    corn_r = _int_orn(state.orn[cb], state.omega[cb], t_rec)
    child_pos = cpos_r + corn_r.rotate(local_p)
    child_orn = corn_r.mul(local_q)

    v_type = shapes.type[v_shape][rec_pair]
    v_params = shapes.params[v_shape][rec_pair]
    v_pos_r = state.pos[vb] + state.vel[vb] * t_rec
    v_orn_r = _int_orn(state.orn[vb], state.omega[vb], t_rec)
    v_shape_r = v_shape[rec_pair]

    # Canonical order: lower type id = i.
    swap = child_type > v_type
    type_i = jnp.where(swap, v_type, child_type)
    type_j = jnp.where(swap, child_type, v_type)
    params_i = jnp.where(swap[:, None], v_params, child_params)
    params_j = jnp.where(swap[:, None], child_params, v_params)
    pos_i = v_pos_r.where(swap, child_pos)
    pos_j = child_pos.where(swap, v_pos_r)
    orn_i = v_orn_r.where(swap, child_orn)
    orn_j = child_orn.where(swap, v_orn_r)
    shape_i = jnp.where(swap, v_shape_r, jnp.where(is_tri, -1, cs_c))
    shape_j = jnp.where(swap, jnp.where(is_tri, -1, cs_c), v_shape_r)
    # 'swapped' relative to (body_a, body_b): the manifold comes out relative to pose_i's
    # owner; record which scene body that is.
    i_owner = jnp.where(swap, vb, cb)
    swapped_rel_a = i_owner != body_a

    return ChildPairs(
        body_a=body_a,
        body_b=body_b,
        slot=(rec_pair * E + rec_slot).astype(jnp.int32),
        valid=rec_valid,
        type_i=type_i,
        type_j=type_j,
        params_i=params_i,
        params_j=params_j,
        pos_i=pos_i,
        pos_j=pos_j,
        orn_i=orn_i,
        orn_j=orn_j,
        shape_i=shape_i,
        shape_j=shape_j,
        swapped=swapped_rel_a,
        conv_is_a=vb == body_a,
        overflow=overflow,
        t=t_rec,
    )


# Maps a 9-wide triangle row into the 12-wide params layout (first 9 columns).
# Kept as a host numpy constant: a module-level jnp array would bind to whatever
# trace is active if this module is first imported inside a jit trace.
import numpy as _np

_TRI_PAD = _np.eye(9, 12, dtype=_np.float32)


def expand_compound_compound(
    state: BodyState,
    shapes: ShapeData,
    pair_a: jnp.ndarray,
    pair_b: jnp.ndarray,
    pair_valid: jnp.ndarray,
    max_cc_pairs: int,
    children_per_side: int,
    child_window: int,
) -> ChildPairs:
    """Compound/mesh vs compound/mesh pairs (reference CompoundPairCollisionTask /
    CompoundMeshReduction): per pair, the ``children_per_side`` children of each side
    closest to overlapping the other (bounding prefilter in each compound's local frame)
    combine into children_per_side² convex child-pair records that run through the same
    tester registry as everything else. Slots key the warm-start cache."""
    sa = jnp.maximum(state.shape[pair_a], 0)
    sb = jnp.maximum(state.shape[pair_b], 0)
    ta = jnp.where(state.shape[pair_a] >= 0, shapes.type[sa], -1)
    tb = jnp.where(state.shape[pair_b] >= 0, shapes.type[sb], -1)
    comp_a = (ta == COMPOUND) | (ta == MESH)
    comp_b = (tb == COMPOUND) | (tb == MESH)
    both = pair_valid & comp_a & comp_b

    count = jnp.sum(both)
    sel, _ = compact_true(both, max_cc_pairs)
    live_pair = jnp.arange(max_cc_pairs) < count
    overflow = count > max_cc_pairs

    a_sel = pair_a[sel]
    b_sel = pair_b[sel]
    shape_a = jnp.maximum(state.shape[a_sel], 0)
    shape_b = jnp.maximum(state.shape[b_sel], 0)

    from ..shapes.registry import ShapeRegistry

    n_pick = max(1, child_window // ShapeRegistry.CLUSTER_SIZE)

    def pick_children(c_shape, c_body, o_body, o_shape):
        """Top children_per_side children of c overlapping the other body's sphere
        (cluster prefilter first — see _select_children_clustered)."""
        other_local = state.orn[c_body].rotate_inverse(state.pos[o_body] - state.pos[c_body])
        rows, cand_ok, cl_ovf = _select_children_clustered(
            shapes, c_shape, other_local, shapes.max_radius[o_shape], n_pick
        )
        ov, d2 = _child_aabb_overlap(shapes, rows, other_local, shapes.max_radius[o_shape])
        ov = ov & cand_ok
        pr, po = _pick_nearest(rows, ov, d2, children_per_side)
        return pr, po, jnp.any(jnp.sum(ov, -1) > children_per_side) | cl_ovf

    rows_a, ok_a, ovf_a = pick_children(shape_a, a_sel, b_sel, shape_b)
    rows_b, ok_b, ovf_b = pick_children(shape_b, b_sel, a_sel, shape_a)
    overflow = overflow | ovf_a | ovf_b

    E = children_per_side
    MPC = max_cc_pairs
    M = MPC * E * E
    rec_pair = jnp.repeat(jnp.arange(MPC), E * E)
    rec_ka = jnp.tile(jnp.repeat(jnp.arange(E), E), MPC)
    rec_kb = jnp.tile(jnp.arange(E), MPC * E)
    row_a = rows_a[rec_pair, rec_ka]
    row_b = rows_b[rec_pair, rec_kb]
    rec_valid = ok_a[rec_pair, rec_ka] & ok_b[rec_pair, rec_kb] & live_pair[rec_pair]

    def resolve(child_row, owner):
        cs = shapes.child_shape[child_row]
        is_tri = cs < 0
        cs_c = jnp.maximum(cs, 0)
        ctype = jnp.where(is_tri, TRIANGLE, shapes.type[cs_c])
        cparams = jnp.where(
            is_tri[:, None],
            shapes.child_tri[child_row].astype(jnp.float32) @ _TRI_PAD,
            shapes.params[cs_c],
        )
        lp = Vec3(
            shapes.child_pos[child_row, 0],
            shapes.child_pos[child_row, 1],
            shapes.child_pos[child_row, 2],
        )
        lq = Quat(
            shapes.child_orn[child_row, 0],
            shapes.child_orn[child_row, 1],
            shapes.child_orn[child_row, 2],
            shapes.child_orn[child_row, 3],
        )
        wpos = state.pos[owner] + state.orn[owner].rotate(lp)
        worn = state.orn[owner].mul(lq)
        return ctype, cparams, wpos, worn, jnp.where(is_tri, -1, cs_c)

    oa = a_sel[rec_pair]
    ob = b_sel[rec_pair]
    type_ca, params_ca, pos_ca, orn_ca, srow_ca = resolve(row_a, oa)
    type_cb, params_cb, pos_cb, orn_cb, srow_cb = resolve(row_b, ob)

    body_a = jnp.minimum(oa, ob)
    body_b = jnp.maximum(oa, ob)

    swap = type_ca > type_cb
    type_i = jnp.where(swap, type_cb, type_ca)
    type_j = jnp.where(swap, type_ca, type_cb)
    params_i = jnp.where(swap[:, None], params_cb, params_ca)
    params_j = jnp.where(swap[:, None], params_ca, params_cb)
    pos_i = pos_cb.where(swap, pos_ca)
    pos_j = pos_ca.where(swap, pos_cb)
    orn_i = orn_cb.where(swap, orn_ca)
    orn_j = orn_ca.where(swap, orn_cb)
    shape_i = jnp.where(swap, srow_cb, srow_ca)
    shape_j = jnp.where(swap, srow_ca, srow_cb)
    i_owner = jnp.where(swap, ob, oa)
    return ChildPairs(
        body_a=body_a,
        body_b=body_b,
        slot=(rec_pair * E * E + rec_ka * E + rec_kb).astype(jnp.int32),
        valid=rec_valid,
        type_i=type_i,
        type_j=type_j,
        params_i=params_i,
        params_j=params_j,
        pos_i=pos_i,
        pos_j=pos_j,
        orn_i=orn_i,
        orn_j=orn_j,
        shape_i=shape_i,
        shape_j=shape_j,
        swapped=i_owner != body_a,
        # For tri-vs-tri or tri-vs-convex between two compounds, the 'convex side' of a
        # record is whichever owner is NOT the i-side triangle's owner; reuse the same
        # convention as convex-compound: conv = the j-side owner relative to body_a.
        conv_is_a=jnp.where(swap, oa, ob) == body_a,
        overflow=overflow,
        t=jnp.zeros_like(body_a, jnp.float32),
    )
