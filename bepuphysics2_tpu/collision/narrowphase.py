"""Narrow phase: type-pair dispatch → manifolds → contact constraints + warm-start carry.

Mirrors the reference pipeline (reference: CollisionDetection/NarrowPhase.cs:399
``HandleOverlap`` → CollisionBatcher.cs:33 SIMD type batching → manifold →
NarrowPhaseConstraintUpdate.cs:291 constraint update with PairCache feature-id impulse
redistribution, PairCache.cs:78). TPU re-design:

- the CollisionBatcher's accumulate-until-SIMD-width batching becomes: run each registered
  type-pair tester over the full pair array under a type mask (fixed shapes, no dynamic
  batching needed — SURVEY §2.9 P8);
- the persistent PairCache becomes last frame's constraint records; matching is a sorted
  key lookup (searchsorted) on the pair key, and per-contact accumulated-impulse carry
  matches feature ids exactly like the reference's redistribution;
- material blending (INarrowPhaseCallbacks.ConfigureContactManifold equivalent) combines
  per-body materials: friction = sqrt(fA·fB), spring settings & max recovery = min.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..bodies import BodyState
from ..shapes.registry import BOX, CAPSULE, CONVEX_HULL, CYLINDER, SPHERE, TRIANGLE, ShapeData
from ..utils.spring import SpringSettings
from ..utils.vec import Quat, Vec2, Vec3
from ..constraints.contact import ContactImpulses, ContactPrestep
from . import testers
from .broadphase import PairList
from .compound import expand_compound_compound, expand_compound_pairs
from .convex import SupportCtx, generic_convex_manifold
from .manifold import Manifold


class PairCache(NamedTuple):
    """Previous frame's contact records for warm starting (reference PairCache.cs:102)."""

    key: jnp.ndarray  # (MP,) int32 b-major pair key (see pair_key): b * NB + a
    feature: jnp.ndarray  # (MP, 4) int32
    penetration: jnp.ndarray  # (MP, 4)
    tangent: Vec2  # (MP,)
    twist: jnp.ndarray  # (MP,)
    valid: jnp.ndarray  # (MP,) bool
    # Solver color carried across frames (reference: constraints KEEP their
    # ConstraintBatch across frames, Solver.cs:984 — persistence makes per-frame
    # recoloring incremental; see solver/coloring.py color_constraints_incremental).
    # -1 = unassigned / Jacobi.
    color: jnp.ndarray  # (MP,) int32
    # Body slots of the record (for cross-bank color-claim accounting; the persistent
    # store must see these claims when admitting new pairs — collision/pairstore.py).
    body_a: jnp.ndarray  # (MP,) int32
    body_b: jnp.ndarray  # (MP,) int32

    @staticmethod
    def empty(capacity: int) -> "PairCache":
        return PairCache(
            key=jnp.full(capacity, 2**31 - 1, jnp.int32),  # dead = +BIG (sorts last)
            feature=jnp.zeros((capacity, 4), jnp.int32),
            penetration=jnp.zeros((capacity, 4), jnp.float32),
            tangent=Vec2.zeros(capacity),
            twist=jnp.zeros(capacity, jnp.float32),
            valid=jnp.zeros(capacity, bool),
            color=jnp.full(capacity, -1, jnp.int32),
            body_a=jnp.zeros(capacity, jnp.int32),
            body_b=jnp.zeros(capacity, jnp.int32),
        )

    def resized(self, capacity: int) -> "PairCache":
        """Grow/shrink the bank (reference Simulation.EnsureCapacity/Resize,
        Simulation.cs:332-415). Growth appends dead (+BIG-key) rows, preserving the
        ascending-key invariant; shrink keeps the lowest-keyed rows (dead rows sort last,
        so they drop first — live records are only lost if live count exceeds the new
        capacity, which degrades warm starting for one frame, never correctness)."""
        import jax

        cur = self.key.shape[0]
        if capacity == cur:
            return self
        if capacity > cur:
            pad = PairCache.empty(capacity - cur)
            return jax.tree_util.tree_map(
                lambda a, b: jnp.concatenate([a, b]), self, pad
            )
        order = jnp.argsort(self.key)[:capacity]
        return jax.tree_util.tree_map(lambda a: a[order], self)


# Registered convex type-pair testers (canonical order: type_a <= type_b).
# Each entry: (type_a, type_b, fn(pos_ab, orn_a, orn_b, params_a, params_b) -> Manifold).
def _sphere_sphere(pos_ab, orn_a, orn_b, pa, pb):
    return testers.sphere_sphere(pos_ab, pa, pb)


def _sphere_capsule(pos_ab, orn_a, orn_b, pa, pb):
    return testers.sphere_capsule(pos_ab, orn_b, pa, pb)


def _sphere_box(pos_ab, orn_a, orn_b, pa, pb):
    return testers.sphere_box(pos_ab, orn_b, pa, pb)


def _capsule_capsule(pos_ab, orn_a, orn_b, pa, pb):
    return testers.capsule_capsule(pos_ab, orn_a, orn_b, pa, pb)


def _box_box(pos_ab, orn_a, orn_b, pa, pb):
    return testers.box_box(pos_ab, orn_a, orn_b, pa, pb)


def _capsule_box(pos_ab, orn_a, orn_b, pa, pb):
    return testers.capsule_box(pos_ab, orn_a, orn_b, pa, pb)


def _sphere_triangle(pos_ab, orn_a, orn_b, pa, pb):
    return testers.sphere_triangle(pos_ab, orn_b, pa, pb)


def _capsule_triangle(pos_ab, orn_a, orn_b, pa, pb):
    return testers.capsule_triangle(pos_ab, orn_a, orn_b, pa, pb)


def _box_triangle(pos_ab, orn_a, orn_b, pa, pb):
    return testers.box_triangle(pos_ab, orn_a, orn_b, pa, pb)


TESTER_REGISTRY = [
    (SPHERE, SPHERE, _sphere_sphere),
    (SPHERE, CAPSULE, _sphere_capsule),
    (SPHERE, BOX, _sphere_box),
    (SPHERE, TRIANGLE, _sphere_triangle),
    (CAPSULE, CAPSULE, _capsule_capsule),
    (CAPSULE, BOX, _capsule_box),
    (CAPSULE, TRIANGLE, _capsule_triangle),
    (BOX, BOX, _box_box),
    (BOX, TRIANGLE, _box_triangle),
]


def run_convex_testers(
    shapes: ShapeData,
    ti, tj, params_i, params_j, pos_i, pos_j, orn_i, orn_j, shape_i, shape_j,
    valid, present_types=None, include_triangles=False,
) -> Manifold:
    """Run the analytic tester registry + the generic GJK/MPR fallback over canonical
    (type_i ≤ type_j) convex pair records. ``shape_i/j``: registry rows (−1 = raw
    triangle params). Returns a manifold relative to the i-side pose."""
    mp = ti.shape[0]
    pos_ij = pos_j - pos_i
    manifold = Manifold.empty(mp)
    present = set(present_types) if present_types is not None else None
    if present is not None and include_triangles:
        present = present | {TRIANGLE}
    covered = jnp.zeros(mp, bool)
    for t0, t1, fn in TESTER_REGISTRY:
        sel_types = (ti == t0) & (tj == t1)
        covered = covered | sel_types
        if present is not None and (t0 not in present or t1 not in present):
            continue  # trace-time skip: this type pair cannot occur in the scene
        m = fn(pos_ij, orn_i, orn_j, params_i, params_j)
        sel = valid & sel_types
        manifold = m.where(sel, manifold)

    # Generic support-mapping fallback for every other convex pair (cylinder/hull/
    # triangle families, capsule-box, ... — the reference's DepthRefiner-backed testers).
    from ..shapes.custom import CUSTOM_SUPPORTS

    def _is_convex_id(p):
        return 0 <= p <= CONVEX_HULL or p in CUSTOM_SUPPORTS

    generic_possible = True
    if present is not None:
        analytic = {(t0, t1) for t0, t1, _ in TESTER_REGISTRY}
        convex_present = sorted(p for p in present if _is_convex_id(p))
        generic_possible = any(
            (x, y) not in analytic
            for xi, x in enumerate(convex_present)
            for y in convex_present[xi:]
        )
    if generic_possible:
        from ..utils.vec import Vec3 as _V3

        si = jnp.maximum(shape_i, 0)
        sj = jnp.maximum(shape_j, 0)
        # Trace-time gate: the 64-wide hull-window gather inside every support call is
        # the single most expensive part of the generic kernel (measured ~50% of its
        # device time in hull-free scenes) — skip it entirely when no hull shape exists.
        hulls_possible = present is None or CONVEX_HULL in present
        ctx = SupportCtx(
            type_a=ti,
            params_a=params_i,
            type_b=tj,
            params_b=params_j,
            orn_ab=orn_i.conjugate().mul(orn_j),
            pos_ab=orn_i.rotate_inverse(pos_ij),
            hull_points=(
                _V3(shapes.hull_x, shapes.hull_y, shapes.hull_z)
                if hulls_possible
                else None
            ),
            hull_start_a=shapes.hull_start[si],
            hull_count_a=shapes.hull_count[si],
            hull_start_b=shapes.hull_start[sj],
            hull_count_b=shapes.hull_count[sj],
            hull_windows=shapes.hull_win.shape[0],
        )
        gm = generic_convex_manifold(ctx, orn_i)
        def convex_mask(t):
            m = (t >= 0) & (t <= CONVEX_HULL)
            for tid in CUSTOM_SUPPORTS:
                m = m | (t == tid)
            return m

        convex_pair = convex_mask(ti) & convex_mask(tj)
        gsel = valid & convex_pair & ~covered
        manifold = gm.where(gsel, manifold)
    return manifold


def convex_pair_records(
    state: BodyState,
    shapes: ShapeData,
    a, b, valid,
    dt,
    spec_margin_max: float = 1.0e30,
    present_types: tuple = None,
    max_ccd: int = 0,
):
    """Tester dispatch core: convex manifolds + contact prestep records for an explicit
    (a, b, valid) pair set — shared by the per-frame candidate path (``narrow_phase``)
    and the persistent-store path (``narrow_phase_store``).

    ``max_ccd > 0`` enables continuous collision detection (reference
    ContinuousDetectionMode.Continuous, NarrowPhaseCCDContinuations + SweepTasks): pairs
    with a Continuous endpoint whose relative displacement this step risks tunneling are
    swept to time-of-impact (collision/sweeps.py pair_toi); their manifolds are evaluated
    at the TOI-advanced poses and the depths warped back to t=0 as speculative contacts,
    so the solver stops motion exactly at impact."""
    mp = a.shape[0]

    # Packed per-body feature rows: ONE row gather per pair side instead of ~20 scalar
    # gathers (utils/packing.py rationale; the canonical i/j sides then come from
    # elementwise selects instead of two more gathers). Shape row/type id and the
    # (<=12-wide) shape params fold into the SAME row: the per-BODY param/type tables
    # are built once at (NB,) size (cheap), so the per-PAIR cost stays two row gathers
    # — measured ~1.4 ms per separate capacity-sized gather at 16k, so folding the
    # shape/type/params lookups in here removed ~6 passes.
    shp = jnp.maximum(state.shape, 0)
    btype = jnp.where(state.shape >= 0, shapes.type[shp], -1)  # (NB,)
    bparams = shapes.params[shp]  # (NB, 12)
    bodyf = jnp.concatenate(
        [
            jnp.stack(
                [
                    state.pos.x, state.pos.y, state.pos.z,
                    state.orn.x, state.orn.y, state.orn.z, state.orn.w,
                    state.vel.x, state.vel.y, state.vel.z,
                    state.friction, state.spring_frequency, state.spring_damping,
                    state.max_recovery_velocity,
                    state.spec_margin_min, state.spec_margin_max,
                    shp.astype(jnp.float32),  # exact: shape rows << 2^24
                    btype.astype(jnp.float32),
                ],
                -1,
            ),
            bparams,
        ],
        axis=-1,
    )
    fa = bodyf[a]
    fb = bodyf[b]

    shape_a = fa[:, 16].astype(jnp.int32)
    shape_b = fb[:, 16].astype(jnp.int32)
    ta = fa[:, 17].astype(jnp.int32)
    tb = fb[:, 17].astype(jnp.int32)

    # Canonical order for the testers: lower type id first.
    swap = ta > tb
    ti = jnp.where(swap, tb, ta)
    tj = jnp.where(swap, ta, tb)
    shape_i = jnp.where(swap, shape_b, shape_a)
    shape_j = jnp.where(swap, shape_a, shape_b)
    params_i = jnp.where(swap[:, None], fb[:, 18:30], fa[:, 18:30])
    params_j = jnp.where(swap[:, None], fa[:, 18:30], fb[:, 18:30])

    fi = jnp.where(swap[:, None], fb, fa)
    fj = jnp.where(swap[:, None], fa, fb)
    pos_i = Vec3(fi[:, 0], fi[:, 1], fi[:, 2])
    pos_j = Vec3(fj[:, 0], fj[:, 1], fj[:, 2])
    orn_i = Quat(fi[:, 3], fi[:, 4], fi[:, 5], fi[:, 6])
    orn_j = Quat(fj[:, 3], fj[:, 4], fj[:, 5], fj[:, 6])
    vel_a = Vec3(fa[:, 7], fa[:, 8], fa[:, 9])
    vel_b = Vec3(fb[:, 7], fb[:, 8], fb[:, 9])

    t_eval = None
    if max_ccd > 0:
        from .sweeps import pair_toi
        from ..utils.vec import integrate_orientation

        i = jnp.where(swap, b, a)
        j = jnp.where(swap, a, b)
        cont = state.continuity
        ra = shapes.max_radius[shape_a]
        rb = shapes.max_radius[shape_b]
        rel_disp = (vel_a - vel_b).length() * dt
        # Tunneling risk: displacement this step exceeds half the smaller shape's size.
        risk = (
            valid
            & ((cont[a] > 0) | (cont[b] > 0))
            & (rel_disp > 0.5 * jnp.minimum(ra, rb))
        )
        from ..utils.packing import compact_true as _ct
        sel, _ = _ct(risk, max_ccd)
        live = jnp.arange(max_ccd) < jnp.sum(risk)
        t_hit = pair_toi(state, shapes, a[sel], b[sel], live, dt)
        t_eval = (
            jnp.zeros(mp, jnp.float32)
            .at[jnp.where(live, sel, mp)]
            .set(t_hit, mode="drop")
        )
        # Evaluate CCD pairs' manifolds at their TOI-advanced poses.
        te_i = t_eval
        pos_i = pos_i + state.vel[i] * te_i
        pos_j = pos_j + state.vel[j] * te_i
        orn_i = integrate_orientation(orn_i, state.omega[i], te_i)
        orn_j = integrate_orientation(orn_j, state.omega[j], te_i)

    manifold = run_convex_testers(
        shapes, ti, tj, params_i, params_j, pos_i, pos_j, orn_i, orn_j,
        shape_i, shape_j, valid, present_types,
    )

    # Un-flip manifolds of swapped pairs so offsets are relative to scene body `a` and the
    # normal points from b to a. For swapped pairs the tester's A is scene body b, so the
    # offset correction is pos(tester A) − pos(scene a) = pos_b − pos_a = pos_i − pos_j.
    flipped = manifold.flipped(pos_i - pos_j)
    manifold = flipped.where(swap, manifold)

    if t_eval is not None:
        # Warp CCD depths back to t=0: depth(0) = depth(t) + n·(v_a − v_b)·t (the normal
        # points B→A; approaching pairs get a negative speculative depth that lets the
        # solver allow exactly the approach up to the TOI).
        vn = manifold.normal.dot(vel_a - vel_b)
        manifold = manifold._replace(depth=manifold.depth + (vn * t_eval)[:, None])

    # Speculative margin acceptance (reference Collidable speculative margin clamp,
    # Collidables/Collidable.cs:115,131,139): discard contacts further than the pair
    # margin = clamp(relative-speed·dt + (min_a+min_b)/2, ·, min(max_a, max_b)). The
    # reference clamps each endpoint's |v|·dt to its own [min, max] then SUMS; using the
    # relative speed with the averaged minimum and min-combined maximum is tighter
    # (fewer ghost speculative contacts) while honoring both collidables' bounds, and
    # matches the bounds-prediction expansion (each AABB grows by min_i/2, so every
    # pair within the resting band is guaranteed to reach the narrow phase).
    rel_speed = (vel_a - vel_b).length()
    pair_min = 0.5 * (fa[:, 14] + fb[:, 14])
    pair_max = jnp.minimum(jnp.minimum(fa[:, 15], fb[:, 15]), spec_margin_max)
    margin = jnp.clip(rel_speed * dt + pair_min, 0.0, jnp.maximum(pair_min, pair_max))
    contact_ok = manifold.contact_mask & (manifold.depth > -margin[:, None])
    record_valid = valid & jnp.any(contact_ok, axis=-1)

    # Pair material (geometric-mean friction; conservative min spring/recovery).
    friction = jnp.sqrt(fa[:, 10] * fb[:, 10])
    freq = jnp.minimum(fa[:, 11], fb[:, 11])
    damping = jnp.maximum(fa[:, 12], fb[:, 12])
    max_rec = jnp.minimum(fa[:, 13], fb[:, 13])

    prestep = ContactPrestep(
        body_a=a,
        body_b=b,
        normal=manifold.normal,
        offset_a=manifold.offset_a,
        offset_b=Vec3(fb[:, 0] - fa[:, 0], fb[:, 1] - fa[:, 1], fb[:, 2] - fa[:, 2]),
        depth=manifold.depth,
        contact_mask=contact_ok,
        valid=record_valid,
        friction=friction,
        spring=SpringSettings.make(freq, damping),
        max_recovery_velocity=max_rec,
        feature=manifold.feature,
    )

    # t_eval: per-pair CCD evaluation time (None when CCD is off) — the compound path
    # reuses it so compound/mesh CCD pairs also evaluate at their TOI.
    return prestep, t_eval


def narrow_phase(
    state: BodyState,
    shapes: ShapeData,
    pairs: PairList,
    cache: PairCache,
    dt,
    spec_margin_max: float = 1.0e30,
    present_types: tuple = None,
    max_ccd: int = 0,
    pairs_sorted: bool = False,
    sleep_bank: PairCache = None,
):
    """Per-frame candidate path: tester core + sorted-join warm-start carry against the
    previous frame's PairCache (kept for the sharded backend and legacy configs; the
    single-chip default is the persistent-store path, narrow_phase_store)."""
    n_bodies = state.pos.x.shape[0]
    prestep, t_eval = convex_pair_records(
        state, shapes, pairs.a, pairs.b, pairs.valid, dt,
        spec_margin_max=spec_margin_max, present_types=present_types, max_ccd=max_ccd,
    )
    imp, carried_color = _warm_start_from_cache(
        prestep, cache, n_bodies, presorted=pairs_sorted, sleep_bank=sleep_bank
    )
    return prestep, imp, carried_color, t_eval


def ccd_eval_times(state, shapes, a, b, valid, dt, max_ccd: int):
    """Standalone CCD TOI pass over an explicit pair set (same risk gate + conservative
    advancement as the convex core). Used by the store path to supply the compound
    expansion with CANDIDATE-aligned evaluation times (its pair list is the broad-phase
    candidates, not store slots)."""
    from .sweeps import pair_toi
    from ..utils.packing import compact_true as _ct

    mp = a.shape[0]
    sa = jnp.maximum(state.shape[a], 0)
    sb = jnp.maximum(state.shape[b], 0)
    ra = shapes.max_radius[sa]
    rb = shapes.max_radius[sb]
    rel_disp = (state.vel[a] - state.vel[b]).length() * dt
    cont = state.continuity
    risk = valid & ((cont[a] > 0) | (cont[b] > 0)) & (
        rel_disp > 0.5 * jnp.minimum(ra, rb)
    )
    sel, _ = _ct(risk, max_ccd)
    live = jnp.arange(max_ccd) < jnp.sum(risk)
    t_hit = pair_toi(state, shapes, a[sel], b[sel], live, dt)
    return (
        jnp.zeros(mp, jnp.float32)
        .at[jnp.where(live, sel, mp)]
        .set(t_hit, mode="drop")
    )


def narrow_phase_store(
    state: BodyState,
    shapes: ShapeData,
    store,
    active,
    dt,
    spec_margin_max: float = 1.0e30,
    present_types: tuple = None,
    max_ccd: int = 0,
):
    """Persistent-store path: manifolds for every store slot, with ROW-LOCAL warm-start
    carry — the pair's previous features/impulses live in the same slot, so the
    reference's feature-id impulse redistribution (PairCache.cs:78) is an elementwise
    compare instead of a cross-frame join. Returns (prestep, imp, t_eval)."""
    prestep, t_eval = convex_pair_records(
        state, shapes, store.body_a, store.body_b, active, dt,
        spec_margin_max=spec_margin_max, present_types=present_types, max_ccd=max_ccd,
    )
    eq = (
        (prestep.feature[:, :, None] == store.feature[:, None, :])
        & prestep.contact_mask[:, :, None]
        & (store.feature[:, None, :] >= 0)
    )
    matched = store.active_prev & prestep.valid
    pen = jnp.sum(jnp.where(eq, store.imp_pen[:, None, :], 0.0), axis=-1)
    pen = jnp.where(matched[:, None], pen, 0.0)
    imp = ContactImpulses(
        penetration=pen,
        tangent=Vec2(
            jnp.where(matched, store.imp_tx, 0.0),
            jnp.where(matched, store.imp_ty, 0.0),
        ),
        twist=jnp.where(matched, store.imp_tw, 0.0),
    )
    return prestep, imp, t_eval


def pair_key(body_a, body_b, n_bodies: int):
    """Stable pair identity for the warm-start cache: b-MAJOR (b = the larger slot).
    The brute broad phase emits pairs exactly in ascending (b, a) order (row-major
    compaction with the pair living in the larger body's row), so b-major keys make the
    cache sorted BY CONSTRUCTION — the match path then skips its per-step argsort."""
    return body_b * n_bodies + body_a


def _warm_start_from_cache(
    prestep: ContactPrestep, cache: PairCache, n_bodies: int, presorted: bool = False,
    sleep_bank: PairCache = None,
):
    """Carry accumulated impulses from last frame's records by (pair key, feature id)
    (reference NarrowPhaseConstraintUpdate impulse redistribution + PairCache.cs:78)."""
    key = pair_key(prestep.body_a, prestep.body_b, n_bodies)
    return _warm_start_from_cache_keyed(
        prestep, cache, key, presorted=presorted, sleep_bank=sleep_bank
    )


def update_cache(
    prestep: ContactPrestep, imp: ContactImpulses, n_bodies: int, color,
    slot_live=None,
) -> PairCache:
    """Store this frame's records for next frame's warm start. ``color`` is the solver
    color this frame assigned each record (-1 = Jacobi/unassigned, retried next frame).

    ``slot_live``: broad-phase pair-slot liveness (a PREFIX of the bank). Keys are
    masked by it rather than by ``prestep.valid``: contact-less pairs interleave with
    contact-bearing ones, and masking those keys would destroy the ascending key order
    the presorted match path relies on. Carry validity is still gated per record by
    ``cache.valid`` at match time."""
    live = prestep.valid if slot_live is None else slot_live
    key = jnp.where(
        live, pair_key(prestep.body_a, prestep.body_b, n_bodies), 2**31 - 1
    )
    return PairCache(
        key=key,
        feature=prestep.feature,
        penetration=imp.penetration,
        tangent=imp.tangent,
        twist=imp.twist,
        valid=prestep.valid,
        color=color,
        body_a=prestep.body_a,
        body_b=prestep.body_b,
    )

def narrow_phase_compound(
    state: BodyState,
    shapes: ShapeData,
    pairs: PairList,
    cache: PairCache,
    dt,
    max_compound_pairs: int,
    children_per_pair: int,
    child_window: int,
    present_types: tuple = None,
    max_cc_pairs: int = 0,
    cc_children_per_side: int = 4,
    sleep_bank: PairCache = None,
    pair_t=None,
):
    """Compound/mesh pair path: expand into child convex records and build a second
    contact bank (see collision/compound.py). Cache keys combine (pair key, child slot).
    ``max_cc_pairs > 0`` additionally expands compound-vs-compound/mesh pairs into
    child×child records (reference CompoundPairCollisionTask). ``pair_t``: per-pair CCD
    TOI from the convex path — compound CCD pairs evaluate children at the advanced
    poses and warp depths back (reference NarrowPhaseCCDContinuations +
    SweepTasks/ConvexCompoundSweepTask). Returns (prestep, impulses, cache_keys,
    overflow)."""
    n_bodies = state.pos.x.shape[0]
    cp = expand_compound_pairs(
        state, shapes, pairs.a, pairs.b, pairs.valid,
        max_compound_pairs, children_per_pair, child_window,
        flag_both_comp=max_cc_pairs == 0,
        pair_t=pair_t,
        dt=dt,
    )
    # Per-record cache subslot within a pair; cc records use an offset slot space so the
    # composite keys never collide with convex-compound records of the same pair.
    sub = cp.slot % children_per_pair
    sub_cap = children_per_pair
    if max_cc_pairs > 0:
        cc = expand_compound_compound(
            state, shapes, pairs.a, pairs.b, pairs.valid,
            max_cc_pairs, cc_children_per_side, child_window,
        )
        cc_sub = children_per_pair + (cc.slot % (cc_children_per_side * cc_children_per_side))
        sub_cap = children_per_pair + cc_children_per_side * cc_children_per_side
        cp = jax.tree_util.tree_map(
            lambda x, y: jnp.concatenate([x, y]) if jnp.ndim(x) > 0 else x | y, cp, cc
        )
        sub = jnp.concatenate([sub, cc_sub])

    manifold = run_convex_testers(
        shapes, cp.type_i, cp.type_j, cp.params_i, cp.params_j,
        cp.pos_i, cp.pos_j, cp.orn_i, cp.orn_j, cp.shape_i, cp.shape_j,
        cp.valid, present_types, include_triangles=True,
    )

    # Rebase offsets from the i-side pose to scene body_a's center (advanced to the
    # record's CCD evaluation time, like the poses the manifold was built from); flip
    # the normal when the i-side belongs to scene body_b.
    body_a_pos = state.pos[cp.body_a] + state.vel[cp.body_a] * cp.t
    rebase = cp.pos_i - body_a_pos
    manifold = manifold._replace(
        offset_a=Vec3(
            manifold.offset_a.x + rebase.x[:, None],
            manifold.offset_a.y + rebase.y[:, None],
            manifold.offset_a.z + rebase.z[:, None],
        ),
        normal=manifold.normal.where(~cp.swapped, -1.0 * manifold.normal),
    )

    # --- Mesh triangle treatment: one-sidedness + boundary smoothing (reference:
    # Triangle one-sided semantics + MeshReduction.cs ghost-contact removal).
    # Triangles are one-sided: manifolds whose normal approaches the BACK face (against
    # the winding normal) are culled — a convex can't catch internal back faces while
    # sliding across a mesh. Near-face normals snap exactly onto the face normal
    # (boundary smoothing): contacts generated against internal triangle edges otherwise
    # tilt the normal and create ghost bumps on flat mesh ground.
    tri_i = (cp.type_i == TRIANGLE) & (cp.shape_i == -1)
    tri_j = (cp.type_j == TRIANGLE) & (cp.shape_j == -1)
    is_mesh_tri = tri_i | tri_j
    params_t = jnp.where(tri_i[:, None], cp.params_i, cp.params_j)
    orn_t = cp.orn_i.where(tri_i, cp.orn_j)
    va = Vec3(params_t[:, 0], params_t[:, 1], params_t[:, 2])
    vb_ = Vec3(params_t[:, 3], params_t[:, 4], params_t[:, 5])
    vc = Vec3(params_t[:, 6], params_t[:, 7], params_t[:, 8])
    face_w = orn_t.rotate((vb_ - va).cross(vc - va).normalize())
    # Normal points body_b → body_a; toward-convex = +n iff the convex side is body_a.
    toward_conv = manifold.normal.where(cp.conv_is_a, -1.0 * manifold.normal)
    dotf = toward_conv.dot(face_w)
    front = ~is_mesh_tri | (dotf > -0.01)
    SMOOTH_COS = 0.7  # snap normals within ~45° of the face onto it
    snap = is_mesh_tri & (dotf > SMOOTH_COS) & (dotf < 0.99999)
    snapped_toward = face_w.where(snap, toward_conv)
    new_normal = snapped_toward.where(cp.conv_is_a, -1.0 * snapped_toward)
    manifold = manifold._replace(
        normal=new_normal,
        depth=jnp.where(snap[:, None], manifold.depth * dotf[:, None], manifold.depth),
    )

    a, b = cp.body_a, cp.body_b
    # CCD warp-back (see narrow_phase): depth(0) = depth(t) + n·(v_a − v_b)·t.
    vn_ccd = manifold.normal.dot(state.vel[a] - state.vel[b])
    manifold = manifold._replace(depth=manifold.depth + (vn_ccd * cp.t)[:, None])
    rel_speed = (state.vel[a] - state.vel[b]).length()
    # Per-collidable margin bounds (Collidable.cs:131,139) — see narrow_phase.
    pair_min = 0.5 * (state.spec_margin_min[a] + state.spec_margin_min[b])
    pair_max = jnp.minimum(state.spec_margin_max[a], state.spec_margin_max[b])
    margin = jnp.clip(rel_speed * dt + pair_min, 0.0, jnp.maximum(pair_min, pair_max))
    contact_ok = (
        cp.valid[:, None] & front[:, None] & manifold.contact_mask
        & (manifold.depth > -margin[:, None])
    )
    record_valid = cp.valid & front & jnp.any(contact_ok, axis=-1)

    friction = jnp.sqrt(state.friction[a] * state.friction[b])
    freq = jnp.minimum(state.spring_frequency[a], state.spring_frequency[b])
    damping = jnp.maximum(state.spring_damping[a], state.spring_damping[b])
    max_rec = jnp.minimum(state.max_recovery_velocity[a], state.max_recovery_velocity[b])

    prestep = ContactPrestep(
        body_a=a,
        body_b=b,
        normal=manifold.normal,
        offset_a=manifold.offset_a,
        offset_b=state.pos[b] - state.pos[a],
        depth=manifold.depth,
        contact_mask=contact_ok,
        valid=record_valid,
        friction=friction,
        spring=SpringSettings.make(freq, damping),
        max_recovery_velocity=max_rec,
        feature=manifold.feature,
    )

    # Warm start: composite key = pair_key * sub_cap + subslot (stable: child enumeration
    # order is deterministic). Requires NB² · sub_cap < 2^31.
    key = pair_key(a, b, n_bodies) * sub_cap + sub
    imp, carried_color = _warm_start_from_cache_keyed(
        prestep, cache, key, sleep_bank=sleep_bank
    )
    return prestep, imp, carried_color, key, cp.overflow


def _warm_start_from_cache_keyed(
    prestep: ContactPrestep, cache: PairCache, key, presorted: bool = False,
    sleep_bank: PairCache = None,
) -> ContactImpulses:
    """Generic cache carry given explicit record keys (sorted-key lookup + feature-id
    impulse redistribution). One packed row gather fetches the whole hit record
    (utils/packing.py rationale).

    ``presorted``: the cache's VALID records are an ascending-key prefix (true when the
    records came from the brute broad phase with b-major keys — see pair_key), so the
    per-step argsort (measured 2.6 ms at 24k records) is skipped.

    ``sleep_bank``: optional sleeping-pair storage (ascending keys by construction —
    retain_sleeping); pairs missing from the active cache match against it, so islands
    woken this frame warm-start instead of rebuilding impulses (reference
    PairCache_Activity)."""
    from ..utils.packing import gather_rows

    # Dead slots store +BIG keys at WRITE time (update_cache), so the key array is
    # usable directly: ascending by construction on the presorted path, and argsorted
    # otherwise. Records without contacts keep their real pair key (order-preserving);
    # ``hit["valid"]`` gates the actual carry.
    if presorted:
        sorted_keys = cache.key
        sort_idx = None
    else:
        sort_idx = jnp.argsort(cache.key)
        sorted_keys = cache.key[sort_idx]
    # method='sort': the default 'scan' lowers to a vmapped while-loop binary search
    # (measured 3.5 ms/step at 4k bodies — the single hottest narrow-phase op); the
    # sort-based join is one fused sort over keys+queries instead.
    pos = jnp.searchsorted(sorted_keys, key, method="sort")
    pos_c = jnp.minimum(pos, sorted_keys.shape[0] - 1)
    hit_slot = pos_c if sort_idx is None else sort_idx[pos_c]
    hit = gather_rows(
        dict(
            feature=cache.feature, penetration=cache.penetration,
            tx=cache.tangent.x, ty=cache.tangent.y, twist=cache.twist,
            valid=cache.valid, color=cache.color,
        ),
        hit_slot,
    )
    matched = (sorted_keys[pos_c] == key) & prestep.valid & hit["valid"]

    if sleep_bank is not None:
      # The bank join (a second sorted join over the full pair bank) only matters when
      # the bank holds rows at all — fully-awake scenes skip it behind a runtime cond.
      def _with_sleep_bank(_):
        spos = jnp.searchsorted(sleep_bank.key, key, method="sort")
        spos_c = jnp.minimum(spos, sleep_bank.key.shape[0] - 1)
        shit = gather_rows(
            dict(
                feature=sleep_bank.feature, penetration=sleep_bank.penetration,
                tx=sleep_bank.tangent.x, ty=sleep_bank.tangent.y,
                twist=sleep_bank.twist, valid=sleep_bank.valid,
                # Colors do NOT survive sleep: while the pair slept, other constraints
                # (awake-vs-sleeping contacts) may have claimed its (body, color) slots,
                # so a carried color could break the conflict-free invariant. Impulses
                # carry; the color re-proposes (-1) on the wake frame.
                color=jnp.full_like(sleep_bank.color, -1),
            ),
            spos_c,
        )
        smatched = (
            (sleep_bank.key[spos_c] == key) & prestep.valid & shit["valid"] & ~matched
        )
        new_hit = jax.tree_util.tree_map(
            lambda h, s: jnp.where(
                smatched.reshape((-1,) + (1,) * (h.ndim - 1)), s, h
            ),
            hit, shit,
        )
        return new_hit, matched | smatched

      hit, matched = jax.lax.cond(
          jnp.any(sleep_bank.valid), _with_sleep_bank, lambda _: (hit, matched), None
      )

    eq = (prestep.feature[:, :, None] == hit["feature"][:, None, :]) & prestep.contact_mask[:, :, None]
    pen = jnp.sum(jnp.where(eq, hit["penetration"][:, None, :], 0.0), axis=-1)
    pen = jnp.where(matched[:, None], pen, 0.0)
    tangent = Vec2(
        jnp.where(matched, hit["tx"], 0.0),
        jnp.where(matched, hit["ty"], 0.0),
    )
    twist = jnp.where(matched, hit["twist"], 0.0)
    carried_color = jnp.where(matched, hit["color"], -1)
    return ContactImpulses(pen, tangent, twist), carried_color


def update_cache_keyed(prestep: ContactPrestep, imp: ContactImpulses, key, color) -> PairCache:
    return PairCache(
        key=jnp.where(prestep.valid, key, 2**31 - 1),
        feature=prestep.feature,
        penetration=imp.penetration,
        tangent=imp.tangent,
        twist=imp.twist,
        valid=prestep.valid,
        color=color,
        body_a=prestep.body_a,
        body_b=prestep.body_b,
    )


def retain_sleeping(
    sleep_bank: PairCache, new_cache: PairCache, kind, awake, n_bodies: int,
    sub_cap: int = 1,
):
    """End-of-step migration of contact records into/out of the SLEEP bank — the
    reference's sleeping pair storage (PairCache_Activity.cs: sleeping islands keep their
    pairs in inactive cache sets, so wakes warm-start instead of rebuilding impulses).

    A pair is FROZEN when neither endpoint is an awake dynamic (exactly the pairs the
    next broad phase will drop). Per step, with end-of-step masks:
      - keep a bank row while its pair stays frozen and was not re-absorbed into the
        active cache this frame (the match consults the bank, so a woken pair re-enters
        the active cache the same frame its pair reappears);
      - add active-cache rows whose pairs froze this step (bodies just slept).
    The merged set compacts into the bank capacity (ascending key order, so the match
    path can searchsorted directly); spill raises the overflow diagnostic, never silent.
    ``sub_cap``: composite-key subslot capacity (1 for the convex pair cache; the
    compound child cache packs key = pair_key·sub_cap + slot)."""
    S = sleep_bank.key.shape[0]
    BIG = jnp.int32(2**31 - 1)
    active_dyn = (kind == 1) & awake  # KIND_DYNAMIC == 1

    def frozen_of(key, live):
        pk = key // sub_cap
        a = pk % n_bodies
        b = pk // n_bodies
        a = jnp.clip(a, 0, n_bodies - 1)
        b = jnp.clip(b, 0, n_bodies - 1)
        exists = (kind[a] != 0) & (kind[b] != 0)
        return live & exists & ~(active_dyn[a] | active_dyn[b])

    # Live keys of the active cache, ascending (dead rows store +BIG already; rows with
    # valid=False keep real keys — mask them so only impulse-bearing records count).
    new_keys_live = jnp.where(new_cache.valid, new_cache.key, BIG)
    sorted_new = jnp.sort(new_keys_live)
    pos = jnp.searchsorted(sorted_new, sleep_bank.key, method="sort")
    in_new = sorted_new[jnp.minimum(pos, sorted_new.shape[0] - 1)] == sleep_bank.key

    frozen_bank = frozen_of(sleep_bank.key, sleep_bank.valid)
    # Wake grace: an island woken MID-frame has its pairs absent from this frame's
    # active cache (the broad phase ran with the asleep mask) yet unfrozen now — they
    # must survive until next frame's match re-absorbs them. The bank's ``color`` field
    # is free (colors never survive sleep — see the match path), so it serves as an
    # unfrozen-age counter: frozen rows reset to -1, unfrozen kept rows age by 1 and
    # drop after one full unfrozen frame without re-absorption.
    grace = (
        sleep_bank.valid & ~in_new & ~frozen_bank & (sleep_bank.color < 1)
    )
    keep = (frozen_bank & ~in_new) | grace
    add = frozen_of(new_cache.key, new_cache.valid)

    from ..utils.packing import compact_true, gather_rows

    age_bank = jnp.where(frozen_bank, -1, sleep_bank.color + 1)
    merged = jax.tree_util.tree_map(
        lambda s, n: jnp.concatenate([s, n]),
        sleep_bank._replace(color=age_bank),
        new_cache._replace(color=jnp.full_like(new_cache.color, -1)),
    )
    mask = jnp.concatenate([keep, add])
    sel, count = compact_true(mask, S)
    live_out = jnp.arange(S) < count
    bank = gather_rows(merged, sel)
    bank = bank._replace(
        key=jnp.where(live_out, bank.key, BIG),
        valid=live_out & bank.valid,
    )
    # compact_true selects in concat-position order, not key order — one small sort
    # restores the ascending-key invariant the match path relies on.
    order = jnp.argsort(bank.key)
    bank = gather_rows(bank, order)
    return bank, count > S
