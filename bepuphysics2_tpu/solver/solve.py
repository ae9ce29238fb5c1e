"""Substepped TGS solver — the reference's Solver_Solve loop as one XLA program.

Semantics follow reference Solver<T>.Solve (Solver_Solve.cs:1415):

    for substep in 0..S-1:
        if substep > 0:
            incremental contact depth update (vs. velocities)   [IncrementallyUpdateForSubstep]
            integrate poses (h = dt/S)                          [warm start AllowPoseIntegration]
        integrate velocities (gravity/damping callback)         [GatherAndIntegrate]
        warm start: re-apply accumulated (per-substep) impulses — contacts + all joints
        for iteration in 0..V-1:
            for color in colors: solve color (contacts then joints, Gauss-Seidel)
            Jacobi bucket with mass splitting
    final pose integration (h)                                  [IntegrateAfterSubstepping]

Constraints = one contact array + one fixed-capacity bank per registered joint type (the
reference's TypeBatches, Constraints/TypeBatch.cs:10). All constraints share ONE device-side
graph coloring (reference ConstraintBatch color classes, Solver.cs:984) computed per step
over the K-ary body-reference table; the leftover Jacobi bucket uses per-body mass
splitting (reference SequentialFallbackBatch.cs:37).

TPU execution shape (single chip): contact banks are reordered ONCE per step into
**color-bucket layout** — a flat ``((num_colors+1)·cap,)`` array whose slice ``c`` holds
exactly the constraints of color ``c`` (capacity-aware coloring guarantees the fit; slice
``num_colors`` is the compacted Jacobi bucket). Each color pass is ONE fused
gather → jacobian-recompute → impulse-clamp → scatter kernel: body pose/inertia ride in a
packed per-substep (NB, 14) context table and velocities in a packed (NB, 6) array, so a
pass costs two row gathers + one conflict-free scatter. Jacobians/effective masses are
recomputed inside each pass (the reference does the same per solve, TwoBodyTypeProcessor
.cs:205 — on TPU the recompute fuses into the pass for free, where a materialized kernel
would cost two full HBM round-trips per substep; measured ~3x solver speedup at 64k).

All TWO-BODY joint types share ONE type-tagged color-bucketed bank: a single pass per
color applies every present type's kernel masked by the row's type tag (the reference
iterates TypeBatches per ConstraintBatch, ConstraintBatch.cs — here the types fuse into
one kernel per color, collapsing |types|·|colors| masked full-bank sweeps into |colors|
compact passes; this is what fixed the joint-heavy RagdollTube pathology).

Multi-chip (``axis_name`` set): constraint banks are sharded; buckets would need
device-local capacities, so the sharded path keeps masked full-bank color passes with the
per-color ``psum`` combination (exact under the coloring invariant — see solve_all).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..bodies import BodyState, KIND_DYNAMIC
from ..constraints import contact as contact_mod
from ..constraints.contact import BodyVel, ContactImpulses, ContactPrestep, GatheredInertia
from ..constraints.joints import JOINT_TYPES, ONE_BODY_NAMES, JointContext, MultiBodyContext
from ..integrator import IntegratorConfig, integrate_poses, integrate_velocities
from ..utils.vec import Quat, Sym3, Vec3
from .coloring import color_constraints_incremental, jacobi_valence_kary
from ..utils.packing import gather_rows


@dataclasses.dataclass(frozen=True)
class SolveConfig:
    """reference SolveDescription (SolveDescription.cs:17)."""

    substeps: int = 8
    velocity_iterations: int = 1
    num_colors: int = 8  # Jacobi fallback beyond this (reference default 64 is CPU-motivated)
    # Per-color bucket capacity = color_cap_factor * M / num_colors (rounded up). The
    # capacity-aware coloring defers over-cap rows to later colors, so larger factors
    # trade more per-pass math for less Jacobi spill.
    color_cap_factor: float = 1.5
    # Incremental coloring (colors persist across frames through the pair cache): number
    # of conflict-resolution rounds per frame and the churn compaction capacity (None =
    # table/4). Rows that miss out solve in the Jacobi bucket and retry next frame.
    color_rounds: int = 3
    color_churn_cap: int = None
    # Jacobi-slice capacity as a fraction of each contact bank (independent of the color
    # caps so aggressive color_cap_factor tuning can't drop demoted rows).
    jacobi_cap_factor: float = 0.3
    # Per-substep velocity iteration schedule (reference SolveDescription
    # .VelocityIterationScheduler, SolveDescription.cs:17): an optional tuple of length
    # ``substeps`` overriding velocity_iterations per substep.
    iteration_schedule: tuple = None
    # Velocity-iteration backend: "auto" = Pallas color-sweep kernel on TPU
    # (ops/sweep.py — VMEM-resident velocities across every color pass of a substep),
    # XLA elsewhere; "xla"/"pallas" force a path ("pallas" off-TPU runs the kernel in
    # interpreter mode — slow, for tests).
    backend: str = "auto"
    # Windowed-kernel wide-row (Morton-seam) capacity. 0 = auto (bank/8); autosize
    # derives it from the measured wide demand (StepDiagnostics.demand[D_WIDE]).
    wide_cap_rows: int = 0

    def iterations_for(self, substep: int) -> int:
        if self.iteration_schedule is not None:
            return int(self.iteration_schedule[substep])
        return self.velocity_iterations


# ---------------------------------------------------------------------------------------
# packed-array helpers

def _vel_to6(state: BodyState) -> jnp.ndarray:
    return jnp.stack(
        [state.vel.x, state.vel.y, state.vel.z, state.omega.x, state.omega.y, state.omega.z],
        -1,
    )


def _vel_from6(state: BodyState, v6: jnp.ndarray) -> BodyState:
    return state._replace(
        vel=Vec3(v6[:, 0], v6[:, 1], v6[:, 2]),
        omega=Vec3(v6[:, 3], v6[:, 4], v6[:, 5]),
    )


def _inertia7(state: BodyState, world_ii: Sym3) -> jnp.ndarray:
    return jnp.stack(
        [state.inv_mass, world_ii.xx, world_ii.yx, world_ii.yy, world_ii.zx, world_ii.zy, world_ii.zz],
        -1,
    )


def _ctx14(state: BodyState, world_ii: Sym3) -> jnp.ndarray:
    """Packed per-substep body context table (NB, 14): pos3 | orn4 | inv_mass | inertia6.

    TPU row gathers cost the same for any width ≤ 128 lanes (measured ~3 ns/row), so one
    wide gather from this table replaces the ~10 per-component gathers a joint pass would
    otherwise issue against the SoA body pytree — the packed-row analogue of the
    reference's 256-bit BodyDynamics cache-line layout (BodyProperties.cs:319)."""
    return jnp.stack(
        [
            state.pos.x, state.pos.y, state.pos.z,
            state.orn.x, state.orn.y, state.orn.z, state.orn.w,
            state.inv_mass,
            world_ii.xx, world_ii.yx, world_ii.yy, world_ii.zx, world_ii.zy, world_ii.zz,
        ],
        -1,
    )


def _split14(rows: jnp.ndarray, scale=None):
    """(m, 14) context rows → (pos: Vec3, orn: Quat, inertia: GatheredInertia).
    ``scale``: optional (m,) Jacobi mass-splitting factor applied to the inertia."""
    pos = Vec3(rows[:, 0], rows[:, 1], rows[:, 2])
    orn = Quat(rows[:, 3], rows[:, 4], rows[:, 5], rows[:, 6])
    im = rows[:, 7:14]
    if scale is not None:
        im = im * scale[:, None]
    gi = GatheredInertia(im[:, 0], Sym3(*(im[:, k] for k in range(1, 7))))
    return pos, orn, gi


def _gather_vel(v6, idx) -> BodyVel:
    g = v6[idx]
    return BodyVel(Vec3(g[:, 0], g[:, 1], g[:, 2]), Vec3(g[:, 3], g[:, 4], g[:, 5]))


def _gather_inertia(i7, idx, scale=None) -> GatheredInertia:
    g = i7[idx]
    if scale is not None:
        g = g * scale[:, None]
    return GatheredInertia(
        g[:, 0], Sym3(g[:, 1], g[:, 2], g[:, 3], g[:, 4], g[:, 5], g[:, 6])
    )


def _vel_pair_from12(g: jnp.ndarray):
    """Split a (2m, 6) gathered velocity block into the A-rows and B-rows BodyVels."""
    m = g.shape[0] // 2
    va = BodyVel(Vec3(g[:m, 0], g[:m, 1], g[:m, 2]), Vec3(g[:m, 3], g[:m, 4], g[:m, 5]))
    vb = BodyVel(Vec3(g[m:, 0], g[m:, 1], g[m:, 2]), Vec3(g[m:, 3], g[m:, 4], g[m:, 5]))
    return va, vb


def _pack_dv(dv: BodyVel) -> jnp.ndarray:
    return jnp.stack(
        [dv.linear.x, dv.linear.y, dv.linear.z, dv.angular.x, dv.angular.y, dv.angular.z], -1
    )


def _scatter_dv(v6, idx, dv: BodyVel, scale=None):
    p = _pack_dv(dv)
    if scale is not None:
        p = p * scale[:, None]
    return v6.at[idx].add(p)


def _delta(new: BodyVel, old: BodyVel) -> BodyVel:
    return BodyVel(new.linear - old.linear, new.angular - old.angular)


def _zero_vel(n) -> BodyVel:
    return BodyVel(Vec3.zeros(n), Vec3.zeros(n))


def _pad_refs(bodies, dyn_cols, m):
    """Pad body refs / dynamic masks to 4 columns (K-ary coloring table)."""
    refs = jnp.zeros((m, 4), jnp.int32)
    dyn = jnp.zeros((m, 4), bool)
    for j, (r, d) in enumerate(zip(bodies, dyn_cols)):
        refs = refs.at[:, j].set(r)
        dyn = dyn.at[:, j].set(d)
    return refs, dyn


def _bcast(mask, like):
    return mask.reshape(mask.shape + (1,) * (like.ndim - mask.ndim))


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _pad_cols(x: jnp.ndarray, width: int) -> jnp.ndarray:
    if x.shape[1] == width:
        return x
    return jnp.pad(x, ((0, 0), (0, width - x.shape[1])))


def _sort_with_perm(idx, axis=0):
    iota = jax.lax.broadcasted_iota(jnp.int32, idx.shape, axis)
    return jax.lax.sort((idx, iota), dimension=axis, num_keys=1)


# Unified two-body joint bank widths (max over all registered types; padded columns are
# zero and ignored by each type's kernel).
_U_PRESTEP = max(
    getattr(t, "N_PRESTEP") for t in JOINT_TYPES.values() if getattr(t, "N_BODIES", 2) <= 2
)
_U_IMPULSE = max(
    getattr(t, "N_IMPULSE") for t in JOINT_TYPES.values() if getattr(t, "N_BODIES", 2) <= 2
)


def _wide_counts(wide_row, body_a, body_b, n_bodies, wide_cap):
    """Per-body count of wide rows (mass-split writer valence). Wide rows are a small
    minority, so compact-then-scatter beats two full-bank scatter-adds (~1 ms vs
    ~3.2 ms at 16k); rows past wide_cap sink and never solve, so capping is exact."""
    from . import windowing

    B = wide_row.shape[0]
    wsel, _ = windowing._compact(wide_row, wide_cap)
    wl = wsel < B
    wc = jnp.minimum(wsel, B - 1)
    one = wl.astype(jnp.float32)
    return (
        jnp.zeros(n_bodies + 1, jnp.float32)
        .at[jnp.where(wl, body_a[wc], n_bodies)].add(one, mode="drop")
        .at[jnp.where(wl, body_b[wc], n_bodies)].add(one, mode="drop")
    )


def _solve_store_fast(state, store_bank, integrator_cfg, cfg, dt, interpret,
                      use_win: bool):
    """Whole-solve fast path for store-only scenes: slot-order prestep+impulses pack
    ONCE into a (B, 44) matrix, move ONCE into the execution layout, and the entire
    substepped solve runs as one Pallas program. ``use_win`` picks the layout:
    windowed (ops/sweep.py solve_substeps_contacts_win; above the full-width kernel's
    ~8k-body routing range) or page-execution order for the full-width one-hot kernel
    (solve_substeps_contacts; at most one page gather of the packed matrix).

    Why this exists: the general path moved ~30 separate capacity-sized leaves through
    the page permutation and the windowed scatter every step — at 16k bodies those
    relayout passes (~1.2-1.6 ms each on v5e) dominated the step, not the solve. One
    wide row move costs the same as one narrow move on TPU (lane-dim ≤ 128), so the
    packed matrix collapses ~45 passes into 3 (pack, scatter, unpack). The reference
    identity: constraint data lives in its TypeBatch layout permanently and per-frame
    cost is proportional to change (TypeBatch.cs:10, Solver_Solve.cs:297) — here the
    slot-stable store is the permanent layout and this is its one-move execution view.
    """
    from ..ops import sweep as psweep
    from ..utils.spring import compute_springiness
    from . import windowing

    h = dt / cfg.substeps
    inv_h = cfg.substeps / dt
    C = cfg.num_colors
    st = store_bank["store"]
    sps = store_bank["ps"]
    simp0 = store_bank["imp"]
    active = store_bank["active"]
    n_bodies = state.pos.x.shape[0]
    B = st.capacity

    # Mass-splitting valence for Jacobi rows (reference SequentialFallbackBatch.cs:37)
    # — maintained incrementally by the store's churn scatters (store.jacv), so the
    # per-frame full-bank count pass is gone.
    jac_slot = active & (st.color == C)
    is_jac = st.color == C

    # ---- pack once (slot order): 32 prestep + 8 impulse columns. Scales append per
    # layout below (the windowed layout adds wide rows to the mass-split set).
    fvalid = sps.valid.astype(jnp.float32)
    psc = psweep.pack_contact_prestep_cols(sps, compute_springiness(sps.spring, h))
    imc = psweep.pack_contact_impulses_cols(simp0) * fvalid[:, None]
    M = jnp.concatenate([psc, imc], axis=-1)

    lin_scale = (
        (1.0 - integrator_cfg.linear_damping) ** h
        if integrator_cfg.linear_damping
        else 1.0
    )
    ang_scale = (
        (1.0 - integrator_cfg.angular_damping) ** h
        if integrator_cfg.angular_damping
        else 1.0
    )
    gmask = (state.kind == KIND_DYNAMIC) & state.awake
    li = state.inv_inertia
    overflow = jnp.bool_(False)
    wide_demand = jnp.int32(0)

    if use_win:
        # ---- windowed layout straight from slot order (grouping is by (color,
        # block); input order is irrelevant, so the page-exec permutation is skipped).
        sb_w = 256
        wide_cap = max(sb_w, _round_up(cfg.wide_cap_rows or B // 8, sb_w))
        lay = windowing.body_layout(state.pos, state.kind)
        rw = windowing.row_windows(
            lay, st.body_a, st.body_b, sps.valid, st.color, C, sb_w, wide_cap
        )
        dest = rw["dest"]
        bp = rw["bp"]
        nsl = rw["n_slices"]
        # Mass-split set = Jacobi-colored rows + wide rows (color-free wide slices mix
        # colors, so every wide row splits). Per-body writer count = incremental
        # color-C valence + this frame's wide-row count.
        wide_row = rw["wide"]
        wct = _wide_counts(wide_row, st.body_a, st.body_b, n_bodies, wide_cap)
        split_val = jnp.maximum(st.jacv[:n_bodies] + wct[:n_bodies], 1.0)
        split_row = is_jac | wide_row
        sa = jnp.where(split_row, split_val[st.body_a], 1.0)
        sb_scale = jnp.where(split_row, split_val[st.body_b], 1.0)
        Mw_in = jnp.concatenate(
            [M, sa[:, None], sb_scale[:, None],
             rw["rel_a"][:, None].astype(jnp.float32),
             rw["rel_b"][:, None].astype(jnp.float32)],
            axis=-1,
        )
        Mw = windowing.scatter_rows(dest, bp, Mw_in)  # the ONE capacity-sized move

        # Padding rows scattered as zero — their scales must read 1 (the kernel
        # divides deltas by scale; real Jacobi scales are >= 1 so 0 unambiguously
        # means padding).
        sa_w = jnp.where(Mw[:, 40] == 0, 1.0, Mw[:, 40])
        sbw_ = jnp.where(Mw[:, 41] == 0, 1.0, Mw[:, 41])
        rel_a_w = Mw[:, 42].astype(jnp.int32)
        rel_b_w = Mw[:, 43].astype(jnp.int32)

        def _slice_major(xa, xb):
            return jnp.concatenate(
                [xa.reshape(nsl, sb_w), xb.reshape(nsl, sb_w)], axis=1
            ).reshape(-1)

        whi2 = _slice_major(rel_a_w // psweep.L, rel_b_w // psweep.L)
        wlo2 = _slice_major(rel_a_w % psweep.L, rel_b_w % psweep.L)
        wscale = _slice_major(sa_w, sbw_)
        ps_t = Mw[:, :32].T
        # Kernel impulse+depth state (IMPD_ROWS): 8 impulse rows + 4 initial depth
        # rows (columns 18-21 of the packed prestep) + 4 pad.
        imp_t = jnp.concatenate(
            [Mw[:, 32:40], Mw[:, 18:22], jnp.zeros((bp, 4), jnp.float32)], axis=-1
        ).T

        pos_slot = lay["pos_slot"]
        slot_pos = lay["slot_pos"]
        perm = lambda x: windowing.permute_rows(x, pos_slot)
        v6n_p, pos_p, orn_p, imp_out = psweep.solve_substeps_contacts_win(
            perm(_vel_to6(state)),
            Vec3(perm(state.pos.x), perm(state.pos.y), perm(state.pos.z)),
            Quat(perm(state.orn.x), perm(state.orn.y), perm(state.orn.z),
                 perm(state.orn.w)),
            perm(state.inv_mass),
            Sym3(perm(li.xx), perm(li.yx), perm(li.yy), perm(li.zx), perm(li.zy),
                 perm(li.zz)),
            perm(gmask), perm(state.integrable),
            ps_t, imp_t, whi2, wlo2, wscale, rw["wseg"],
            h, inv_h, lin_scale, ang_scale,
            nch=lay["nch"], sb=sb_w, n_substeps=cfg.substeps,
            n_iters=cfg.velocity_iterations,
            angular_mode=integrator_cfg.angular_mode,
            gravity=integrator_cfg.gravity,
            interpret=interpret,
        )
        state = _vel_from6(
            state._replace(
                pos=Vec3(pos_p.x[slot_pos], pos_p.y[slot_pos], pos_p.z[slot_pos]),
                orn=Quat(orn_p.x[slot_pos], orn_p.y[slot_pos], orn_p.z[slot_pos],
                         orn_p.w[slot_pos]),
            ),
            v6n_p[slot_pos],
        )
        # Impulses back to SLOT order with one row gather. Wide-overflow rows
        # (dest == sink) keep their incoming warm-start impulses, not zeros.
        # The barrier materializes the (BP, 8) transpose first — fused into the
        # gather it becomes a strided column walk (measured 3.3 ms at 16k vs
        # ~0.8 ms for transpose + row gather).
        placed = dest < bp
        imp_rows_t = jax.lax.optimization_barrier(imp_out.T)
        imp_rows = jnp.where(
            placed[:, None], imp_rows_t[jnp.minimum(dest, bp - 1)][:, :8], imc
        )
        overflow = rw["wide_overflow"]
        wide_demand = rw["wide_demand"].astype(jnp.int32)
    else:
        # ---- full-width one-hot kernel (<=8k bodies): the execution layout is the
        # page permutation (pages sorted by color, Jacobi last — slices never
        # straddle a color, which is what makes in-kernel immediate scatters exact).
        from ..collision import pairstore as _ps

        valence = jnp.maximum(st.jacv[:n_bodies], 1.0)
        sa = jnp.where(is_jac, valence[st.body_a], 1.0)
        sb_scale = jnp.where(is_jac, valence[st.body_b], 1.0)
        M = jnp.concatenate([M, sa[:, None], sb_scale[:, None]], axis=-1)
        page = st.page
        P = st.n_pages
        perm_pages, _isj, inv_perm = _ps.exec_order(st, C)
        Ints = jnp.stack([st.body_a, st.body_b], -1)
        Mx = M.reshape(P, page, M.shape[1])[perm_pages].reshape(B, M.shape[1])
        Ix = Ints.reshape(P, page, 2)[perm_pages].reshape(B, 2)
        sa_x = jnp.where(Mx[:, 40] == 0, 1.0, Mx[:, 40])
        sb_x = jnp.where(Mx[:, 41] == 0, 1.0, Mx[:, 41])
        nsl = B // page
        a_rs = Ix[:, 0].reshape(nsl, page)
        b_rs = Ix[:, 1].reshape(nsl, page)
        idx2 = jnp.concatenate([a_rs, b_rs], axis=1).reshape(-1)
        scale = jnp.concatenate(
            [sa_x.reshape(nsl, page), sb_x.reshape(nsl, page)], axis=1
        ).reshape(-1)
        ps_t = Mx[:, :32].T
        imp_t = Mx[:, 32:40].T
        nch = max(128, _round_up(-(-n_bodies // psweep.L), 128))
        v6n, pos_n, orn_n, imp_out = psweep.solve_substeps_contacts(
            _vel_to6(state), state.pos, state.orn, state.inv_mass,
            state.inv_inertia, gmask, state.integrable,
            ps_t, imp_t, idx2, scale,
            h, inv_h, lin_scale, ang_scale,
            nch=nch, sb=page, n_substeps=cfg.substeps,
            n_iters=cfg.velocity_iterations,
            angular_mode=integrator_cfg.angular_mode,
            gravity=integrator_cfg.gravity,
            interpret=interpret,
        )
        state = _vel_from6(state._replace(pos=pos_n, orn=orn_n), v6n)
        # exec order -> slot order: one inverse page gather of the impulse rows
        # (barrier: materialize the transpose before gathering, see win branch).
        imp_rows = jax.lax.optimization_barrier(imp_out.T).reshape(P, page, 8)[
            inv_perm
        ].reshape(B, 8)

    state = integrate_poses(state, integrator_cfg, h)
    imp_slot = simp0._replace(
        penetration=imp_rows[:, :4],
        tangent=simp0.tangent._replace(x=imp_rows[:, 4], y=imp_rows[:, 5]),
        twist=imp_rows[:, 6],
    )
    demand = jnp.stack([jnp.sum(jac_slot).astype(jnp.int32), wide_demand])
    return state, [imp_slot], {}, overflow, [], {}, demand


def solve_all(
    state: BodyState,
    contact_banks,
    joint_banks: dict,
    integrator_cfg: IntegratorConfig,
    cfg: SolveConfig,
    dt,
    axis_name: str = None,
    store_bank: dict = None,
    base_used=None,
):
    """Run the full substepped solve over contact banks + joint banks.
    ``contact_banks``: list of (ContactPrestep, ContactImpulses[, prev_color]) — e.g. the
    body-pair bank and the compound-child bank. ``prev_color`` ((M,) int32, -1 = none) is
    last frame's solver color carried through the pair cache; omitted → fresh coloring.
    ``joint_banks[name]`` may carry a "color" entry with the same meaning.
    Returns (state, [contact_impulses...], {name: jimps}, overflow,
    [contact_colors...], {name: jcolors}) — the colors are persistable assignments
    (-1 = Jacobi/unassigned, retried next frame). ``overflow`` is True
    iff the compacted Jacobi bucket spilled (a capacity diagnostic, like broad-phase pair
    overflow; spilled rows are reported, not silently mis-solved).

    ``axis_name``: when set, this call runs INSIDE shard_map over a device mesh axis with
    body state replicated and every constraint bank sharded along its slot axis. Coloring
    is computed over the all-gathered global constraint table (identical on every device,
    so the color classes are globally conflict-free), and each velocity-update pass
    accumulates a local (NB, 6) delta that is ``psum``-combined over the axis — within a
    color no two constraints on ANY device share a body, so the psum of per-shard deltas
    is exactly the single-device Gauss-Seidel result (SURVEY §5.8; the reference's
    claim-based work distribution, Solver_Solve.cs:297, maps to this collective)."""
    h = dt / cfg.substeps
    inv_h = cfg.substeps / dt
    n_bodies = state.pos.x.shape[0]
    # ``store_bank``: persistent-pair-store bank (collision/pairstore.py), already in
    # page-execution order (pages sorted by color; Jacobi pages last). It arrives
    # pre-colored and pre-placed, so it skips the coloring table and bucket packing
    # below entirely — the per-frame cost that used to dominate the step. Fields:
    # ps (ContactPrestep, exec order), imp (ContactImpulses), page (rows per page),
    # jacobi ((B,) bool rows in Jacobi pages), jac_counts ((NB+1,) f32 per-body Jacobi
    # row counts for mass splitting). ``base_used``: the store's (NB+1,) color-claim
    # bitmask — joint/compound coloring must avoid those (body, color) slots.
    if store_bank is not None and axis_name is not None:
        raise ValueError("store banks are single-chip; use the masked sharded path")
    # Two-body (incl. one-body) joint types first so their groups form ONE contiguous
    # range of the global coloring table (the unified bank's capacity segment);
    # multi-body types follow, uncapped.
    tb_names = sorted(
        n for n in joint_banks if getattr(JOINT_TYPES[n], "N_BODIES", 2) <= 2
    )
    mb_names = sorted(
        n for n in joint_banks if getattr(JOINT_TYPES[n], "N_BODIES", 2) > 2
    )
    bank_names = tb_names + mb_names
    # Normalize contact banks to (prestep, impulses) + carried colors.
    prev_colors_c = []
    _norm = []
    for cb in contact_banks:
        ps_, im_ = cb[0], cb[1]
        pc_ = cb[2] if len(cb) > 2 and cb[2] is not None else jnp.full(
            ps_.body_a.shape[0], -1, jnp.int32
        )
        _norm.append((ps_, im_))
        prev_colors_c.append(pc_)
    contact_banks = _norm
    n_cbanks = len(contact_banks)
    bucketed = axis_name is None
    C = cfg.num_colors
    _pallas_capable = (
        bucketed
        and cfg.backend != "xla"
        and (
            cfg.backend in ("pallas", "pallas_win")
            or jax.default_backend() == "tpu"
        )
    )
    # Above ~8k bodies the full-width one-hot routing (rows x bodies MACs) loses; the
    # store bank switches to the WINDOWED kernel there (ops/sweep.py contact_sweep_win):
    # constant per-slice routing cost at any body count. "pallas_win" forces it at any
    # size (tests). The kernel keeps one whole-bank (IMPD_ROWS, bp) state scratch in
    # VMEM; past the feasibility bound (v5e: 128 MB) fall back to the XLA page sweep
    # instead of failing to compile.
    win_feasible = True
    if store_bank is not None:
        _Bc = store_bank["store"].capacity
        _nblk = -(-n_bodies // 1024)
        _bp_est = (
            _Bc
            + (cfg.num_colors + 1) * _nblk * 256
            + max(256, cfg.wide_cap_rows or _Bc // 8)
        )
        _nch_est = -(-((1024 + (_nblk + 2) * 1024) // 8) // 128) * 128
        _states = 4 * _nch_est * (2 * 128 + 5 * 64)
        # Second bound: an untracked kernel fault ("TPU worker crashed") reproduces at
        # a ~725k-row padded bank while ~623k runs clean (BASELINE.md known fault);
        # clamp below the working point until root-caused — XLA fallback beats a crash.
        win_feasible = (
            16 * 4 * _bp_est + _states < 108 * 1024 * 1024 and _bp_est <= 650_000
        )
    use_win = (
        _pallas_capable
        and store_bank is not None
        and win_feasible
        and (n_bodies > 8192 or cfg.backend == "pallas_win")
    )
    use_pallas = _pallas_capable and (
        n_bodies <= 8192 or cfg.backend == "pallas" or use_win
    ) and (store_bank is None or use_win or store_bank["store"].page % 128 == 0)
    pallas_interpret = jax.default_backend() != "tpu"
    if use_pallas:
        from ..ops import sweep as psweep

    # ---- Persistent-store execution views -----------------------------------------
    # ``store_bank`` arrives RAW from the caller: dict(store=PairStore, ps=prestep,
    # imp=impulses, active=mask), all in slot order. Store-only scenes above the
    # full-width range take the one-packed-move fast path; every other store
    # configuration derives the page-execution trees here (moved from simulation.py
    # so the layout policy lives in one place).
    inv_perm_pages = None
    if store_bank is not None and bucketed:
        from ..collision import pairstore as _pairstore

        if (
            use_pallas and not bank_names and not contact_banks
            and cfg.iteration_schedule is None
            and integrator_cfg.velocity_callback is None
            and (use_win or store_bank["store"].page % 128 == 0)
        ):
            return _solve_store_fast(
                state, store_bank, integrator_cfg, cfg, dt, pallas_interpret,
                use_win=use_win,
            )
        _st = store_bank["store"]
        _page = _st.page
        _P = _st.n_pages
        _B = _st.capacity
        perm_pages, _is_jac_pages, inv_perm_pages = _pairstore.exec_order(_st, C)

        def _pg(x):
            return x.reshape((_P, _page) + x.shape[1:])[perm_pages].reshape(
                (_B,) + x.shape[1:]
            )

        _active = store_bank["active"]
        _jac_counts = _st.jacv  # incrementally-maintained live Jacobi valence
        store_bank = dict(
            ps=jax.tree_util.tree_map(_pg, store_bank["ps"]),
            imp=jax.tree_util.tree_map(_pg, store_bank["imp"]),
            page=_page, jacobi=jnp.repeat(_is_jac_pages, _page),
            jac_counts=_jac_counts, color=_pg(_st.color),
        )

    def gather_global(x):
        """Concatenate a sharded per-constraint array across the mesh axis."""
        return jax.lax.all_gather(x, axis_name, axis=0, tiled=True) if axis_name else x

    # ---- Joint constraint activity: a joint sleeps when no endpoint is awake.
    def bank_live(bank, name):
        cls = JOINT_TYPES[name]
        nb = getattr(cls, "N_BODIES", 2)
        live = bank["valid"]
        awake_any = jnp.zeros_like(live)
        for j in range(nb if name not in ONE_BODY_NAMES else 1):
            awake_any = awake_any | state.awake[bank["bodies"][:, j]]
        return live & awake_any

    # ---- Unified coloring table.
    dyn_of = lambda idx: state.kind[idx] == KIND_DYNAMIC
    groups = []
    caps = []
    segments = []
    off_running = 0
    # Pallas slice size — shared by every contact bank so the whole-solve kernel can
    # treat their concatenated bucket banks as one slice stream.
    cap_raws = [
        max(1, -(-int(cfg.color_cap_factor * ps.body_a.shape[0]) // C))
        for ps, _ in contact_banks
    ]
    if use_pallas and store_bank is not None:
        sb_global = store_bank["page"]
    else:
        sb_global = (
            min(512, _round_up(max(cap_raws + [1]), 128)) if use_pallas else 0
        )
    bank_sb = []  # pallas slice size per contact bank
    for ci, (ps, _) in enumerate(contact_banks):
        mi = ps.body_a.shape[0]
        c_refs, c_dyn = _pad_refs(
            [ps.body_a, ps.body_b], [dyn_of(ps.body_a), dyn_of(ps.body_b)], mi
        )
        groups.append((f"__contacts{ci}__", c_refs, c_dyn, ps.valid))
        cap_raw = cap_raws[ci]
        if use_pallas:
            # Color capacities must be a multiple of the streamed slice so slices never
            # straddle a color boundary (conflict freedom holds only within a color).
            sb_i = sb_global
            cap = min(_round_up(cap_raw, sb_i), _round_up(mi, sb_i))
            bank_sb.append(sb_i)
        else:
            cap = min(_round_up(cap_raw, 8), _round_up(mi, 8))
            bank_sb.append(0)
        caps.append(cap)
        if bucketed:
            segments.append((off_running, mi, cap))
        off_running += mi
    bank_valid = {}
    mu_total = 0
    joint_seg_start = off_running
    for name in bank_names:
        bank = joint_banks[name]
        cls = JOINT_TYPES[name]
        nb = getattr(cls, "N_BODIES", 2)
        m = bank["bodies"].shape[0]
        if name in ONE_BODY_NAMES:
            cols = [bank["bodies"][:, 0]]
            dyns = [dyn_of(bank["bodies"][:, 0])]
        else:
            cols = [bank["bodies"][:, j] for j in range(nb)]
            dyns = [dyn_of(c) for c in cols]
        refs, dyn = _pad_refs(cols, dyns, m)
        v = bank_live(bank, name)
        bank_valid[name] = v
        groups.append((name, refs, dyn, v))
        if name in tb_names:
            mu_total += m
        off_running += m
    cap_u = 0
    if bucketed and mu_total:
        cap_u = min(
            _round_up(max(1, -(-int(cfg.color_cap_factor * mu_total) // C)), 8),
            _round_up(mu_total, 8),
        )
        segments.append((joint_seg_start, mu_total, cap_u))

    # Carried colors per group, same order as ``groups`` (contacts then joint banks).
    prev_list = list(prev_colors_c) + [
        joint_banks[name].get(
            "color", jnp.full(joint_banks[name]["bodies"].shape[0], -1, jnp.int32)
        )
        for name in bank_names
    ]

    # Global constraint table: identical on every device under sharding, so the greedy
    # coloring result is identical too — the invariant that makes per-color psum exact.
    # Columns are sliced to the scene's actual max constraint arity: contacts and most
    # joints reference 2 bodies, and XLA scatters cost ~serial time PER INDEX — padded
    # sink columns in the coloring/valence tables doubled that cost for nothing.
    max_arity = 2
    for name in bank_names:
        if name not in ONE_BODY_NAMES:
            max_arity = max(max_arity, getattr(JOINT_TYPES[name], "N_BODIES", 2))
    g_refs = [gather_global(g[1][:, :max_arity]) for g in groups]
    if groups:
        all_refs = jnp.concatenate(g_refs, axis=0)
        all_dyn = jnp.concatenate(
            [gather_global(g[2][:, :max_arity]) for g in groups], axis=0
        )
        all_valid = jnp.concatenate([gather_global(g[3]) for g in groups], axis=0)
        all_prev = jnp.concatenate([gather_global(pc) for pc in prev_list], axis=0)
        all_color, all_rank = color_constraints_incremental(
            all_refs, all_dyn, all_valid, all_prev, n_bodies, C,
            segments=segments or None, rounds=cfg.color_rounds,
            churn_cap=cfg.color_churn_cap, base_used=base_used,
        )
    else:  # store-only scene: every constraint is pre-colored in the store
        all_refs = jnp.zeros((0, max_arity), jnp.int32)
        all_dyn = jnp.zeros((0, max_arity), bool)
        all_color = jnp.zeros(0, jnp.int32)
        all_rank = jnp.zeros(0, jnp.int32)

    dev = jax.lax.axis_index(axis_name) if axis_name else 0
    colors = {}
    ranks = {}
    off = 0
    for gi, (key, refs, dyn, v) in enumerate(groups):
        m = refs.shape[0]  # local size
        m_g = g_refs[gi].shape[0]  # global size
        colors[key] = jax.lax.dynamic_slice_in_dim(all_color[off : off + m_g], dev * m, m)
        ranks[key] = jax.lax.dynamic_slice_in_dim(all_rank[off : off + m_g], dev * m, m)
        off += m_g

    # Persistable colors for the next frame (-1 = Jacobi/unassigned → re-propose).
    persist_c = [
        jnp.where(
            contact_banks[ci][0].valid & (colors[f"__contacts{ci}__"] < C),
            colors[f"__contacts{ci}__"], -1,
        )
        for ci in range(n_cbanks)
    ]
    persist_j = {
        name: jnp.where(
            groups[n_cbanks + gi][3] & (colors[name] < C), colors[name], -1
        )
        for gi, name in enumerate(bank_names)
    }

    # ---- Color-bucket layout per contact bank (single-chip path) -----------------------
    overflow = jnp.bool_(False)
    # True demand counters for demand-driven sizing: [max Jacobi-slice rows across
    # banks, windowed wide-row demand] (see Simulation.autosize).
    jac_demand = jnp.int32(0)
    wide_demand = jnp.int32(0)
    buckets = []
    cbank_in_jacobi = []
    if bucketed:
        for ci, (ps, im) in enumerate(contact_banks):
            mi = ps.body_a.shape[0]
            cap = caps[ci]
            ncap = C * cap
            # The Jacobi slice gets its OWN capacity: tight color caps (small
            # color_cap_factor) shrink the per-pass banks, but demoted/over-valence rows
            # land here and must never be dropped — size it by jacobi_cap_factor of the
            # bank instead of one color cap.
            if use_pallas:
                sb_i = bank_sb[ci]
                jcap = min(
                    _round_up(max(8, int(cfg.jacobi_cap_factor * mi)), sb_i),
                    _round_up(mi, sb_i),
                )
            else:
                jcap = min(
                    _round_up(max(8, int(cfg.jacobi_cap_factor * mi)), 8),
                    _round_up(mi, 8),
                )
            B = ncap + jcap
            col = colors[f"__contacts{ci}__"]
            rnk = ranks[f"__contacts{ci}__"]
            jac = ps.valid & (col == C)
            jac_demand = jnp.maximum(jac_demand, jnp.sum(jac))
            rank_j = jnp.cumsum(jac.astype(jnp.int32)) - 1
            kept_j = jac & (rank_j < jcap)
            overflow = overflow | jnp.any(jac & ~kept_j)
            pos = jnp.where(
                ps.valid & (col < C),
                col * cap + rnk,
                jnp.where(kept_j, ncap + rank_j, B),
            )
            order = (
                jnp.full(B + 1, mi, jnp.int32)
                .at[pos]
                .set(jnp.arange(mi, dtype=jnp.int32), mode="drop")[:B]
            )
            present = order < mi
            oc = jnp.minimum(order, mi - 1)
            # Packed row gathers: one (mi,K)->(B,K) gather per dtype family instead of
            # ~30 scalar-column gathers (utils/packing.py rationale).
            ps_b, imp_g = gather_rows((ps, im), oc)
            ps_b = ps_b._replace(valid=present & ps_b.valid)
            # Padding rows alias row mi-1 — zero their impulses so warm starts can't
            # double-apply a real row's accumulated impulse.
            imp_b = jax.tree_util.tree_map(
                lambda x: jnp.where(_bcast(present, x), x, 0), imp_g
            )
            cbank_in_jacobi.append(kept_j)
            buckets.append(
                dict(order=order, present=present, ps=ps_b, imp=imp_b, cap=cap, m=mi,
                     pos=pos, sb_slice=bank_sb[ci])
            )
    else:
        for ci, (ps, _) in enumerate(contact_banks):
            jm = ps.valid & (colors[f"__contacts{ci}__"] == C)
            jac_demand = jnp.maximum(jac_demand, jnp.sum(jm))
            cbank_in_jacobi.append(jm)

    # ---- Unified two-body joint bucket (single-chip path) ------------------------------
    # All two-body joint types' records interleave into ONE color-bucketed bank with a
    # per-row type tag; a color pass runs every PRESENT type's kernel masked by tag, so
    # the whole joint population costs |colors| passes per sweep instead of
    # |types|·|colors| masked full-bank sweeps (reference ConstraintBatch → TypeBatch
    # iteration, ConstraintBatch.cs, collapsed type-wise).
    ju = None
    ju_in_jacobi = None
    if bucketed and mu_total:
        type_ids = {name: ti for ti, name in enumerate(tb_names)}
        u_a = jnp.concatenate([joint_banks[n]["bodies"][:, 0] for n in tb_names])
        u_b = jnp.concatenate([joint_banks[n]["bodies"][:, 1] for n in tb_names])
        u_valid = jnp.concatenate([bank_valid[n] for n in tb_names])
        u_color = jnp.concatenate([colors[n] for n in tb_names])
        u_rank = jnp.concatenate([ranks[n] for n in tb_names])
        u_tag = jnp.concatenate(
            [
                jnp.full(joint_banks[n]["bodies"].shape[0], type_ids[n], jnp.int32)
                for n in tb_names
            ]
        )
        u_ps = jnp.concatenate(
            [_pad_cols(joint_banks[n]["prestep"], _U_PRESTEP) for n in tb_names]
        )
        u_imp = jnp.concatenate(
            [
                _pad_cols(
                    joint_banks[n]["impulse"]
                    * bank_valid[n][:, None].astype(jnp.float32),
                    _U_IMPULSE,
                )
                for n in tb_names
            ]
        )
        ncap_u = C * cap_u
        jcap_u = min(
            _round_up(max(8, int(cfg.jacobi_cap_factor * mu_total)), 8),
            _round_up(mu_total, 8),
        )
        BU = ncap_u + jcap_u
        jac_u = u_valid & (u_color == C)
        jac_demand = jnp.maximum(jac_demand, jnp.sum(jac_u))
        rank_ju = jnp.cumsum(jac_u.astype(jnp.int32)) - 1
        kept_ju = jac_u & (rank_ju < jcap_u)
        overflow = overflow | jnp.any(jac_u & ~kept_ju)
        pos_u = jnp.where(
            u_valid & (u_color < C),
            u_color * cap_u + u_rank,
            jnp.where(kept_ju, ncap_u + rank_ju, BU),
        )
        order_u = (
            jnp.full(BU + 1, mu_total, jnp.int32)
            .at[pos_u]
            .set(jnp.arange(mu_total, dtype=jnp.int32), mode="drop")[:BU]
        )
        present_u = order_u < mu_total
        oc_u = jnp.minimum(order_u, mu_total - 1)
        g = gather_rows(
            dict(a=u_a, b=u_b, tag=u_tag, valid=u_valid, ps=u_ps, imp=u_imp), oc_u
        )
        live_u = present_u & g["valid"]
        imp_bu = jnp.where(present_u[:, None], g["imp"], 0.0)
        ju = dict(
            order=order_u, present=present_u, live=live_u, a=g["a"], b=g["b"],
            tag=g["tag"], ps=g["ps"], imp0=imp_bu, cap=cap_u, ncap=ncap_u, m=mu_total,
            type_ids=type_ids, pos=pos_u,
        )
        ju_in_jacobi = kept_ju

    # Jacobi membership per group → global per-body valence for mass splitting.
    jacobi_groups = list(cbank_in_jacobi)
    if bucketed:
        for name in tb_names:
            jacobi_groups.append(bank_valid[name] & (colors[name] == C))
        for name in mb_names:
            jacobi_groups.append(bank_valid[name] & (colors[name] == C))
    else:
        for name in bank_names:
            jacobi_groups.append(bank_valid[name] & (colors[name] == C))
    store_jac_counts = store_bank["jac_counts"] if store_bank is not None else None
    if groups:
        in_jacobi_all = jnp.concatenate([gather_global(f) for f in jacobi_groups])
        valence = jacobi_valence_kary(
            all_refs, all_dyn, in_jacobi_all, n_bodies, extra_counts=store_jac_counts
        )
    elif store_jac_counts is not None:
        valence = jnp.maximum(store_jac_counts[:n_bodies], 1.0)
    else:
        valence = jnp.ones(n_bodies, jnp.float32)

    # ---- Persistent-store bucket: arrives packed (exec order), pre-colored ----------
    # Above the full-width kernel's economic range, re-lay the bank out in windowed
    # (color, Morton-block) order and solve it with the windowed Pallas sweep
    # (ops/sweep.py contact_sweep_win + solver/windowing.py) — the reference solve loop
    # has no size cliff (Solver_Solve.cs:297-654) and neither does this path.
    if store_bank is not None and bucketed:
        sps = store_bank["ps"]
        jrow = store_bank["jacobi"]
        jac_demand = jnp.maximum(jac_demand, jnp.sum(jrow & sps.valid))
        a_s = sps.body_a
        b_s = sps.body_b
        sa_s = jnp.where(jrow, valence[a_s], 1.0)
        sb_s = jnp.where(jrow, valence[b_s], 1.0)
        # Stale impulses of non-live slots must not warm start.
        simp = jax.tree_util.tree_map(
            lambda x: jnp.where(_bcast(sps.valid, x), x, 0.0), store_bank["imp"]
        )
        if use_win:
            from . import windowing

            sb_w = 256  # windowed slice rows
            Bs = a_s.shape[0]
            wide_cap = max(sb_w, _round_up(cfg.wide_cap_rows or Bs // 8, sb_w))
            lay = windowing.body_layout(state.pos, state.kind)
            rw = windowing.row_windows(
                lay, a_s, b_s, sps.valid, store_bank["color"], C, sb_w, wide_cap
            )
            dest = rw["dest"]
            bp = rw["bp"]
            # Wide rows execute color-free (mass-split): fold this frame's wide-row
            # writer counts into the split scales (see _solve_store_fast).
            wide_row = rw["wide"]
            wct = _wide_counts(wide_row, a_s, b_s, n_bodies, wide_cap)
            sval = jnp.maximum(store_bank["jac_counts"][:n_bodies] + wct[:n_bodies], 1.0)
            split_row = jrow | wide_row
            sa_s = jnp.where(split_row, sval[a_s], 1.0)
            sb_s = jnp.where(split_row, sval[b_s], 1.0)
            # Padded-layout bank: scatter rows to their (color, block) slot; padding
            # rows are invalid (zero mask/impulse) and contribute exactly zero.
            ps_w = jax.tree_util.tree_map(
                lambda x: windowing.scatter_rows(dest, bp, x), sps
            )
            imp_w = jax.tree_util.tree_map(
                lambda x: windowing.scatter_rows(dest, bp, x), simp
            )
            aw = windowing.scatter_rows(dest, bp, a_s)
            bw = windowing.scatter_rows(dest, bp, b_s)
            saw = windowing.scatter_rows(dest, bp, sa_s, fill=1)
            sbw = windowing.scatter_rows(dest, bp, sb_s, fill=1)
            # Window-relative body index per side (every slice — narrow AND wide —
            # routes through its own 4-segment window).
            rel_a = windowing.scatter_rows(dest, bp, rw["rel_a"])
            rel_b = windowing.scatter_rows(dest, bp, rw["rel_b"])
            sbk = dict(
                win=dict(
                    lay=lay, sb=sb_w, wide_cap=wide_cap, bp=bp,
                    n_slices=rw["n_slices"], wseg=rw["wseg"],
                    rel_a=rel_a, rel_b=rel_b,
                    dest=dest, orig_valid=sps.valid,
                ),
                page=sb_w, ps=ps_w, imp=imp_w, imp_orig=simp,
                idx2=jnp.concatenate([aw, bw]),
                sa=saw, sb=sbw, s2=jnp.concatenate([saw, sbw]),
            )
            solver_overflow_extra = rw["wide_overflow"]
            wide_demand = rw["wide_demand"]
        else:
            sbk = dict(
                pages=True, page=store_bank["page"], ps=sps, imp=simp,
                idx2=jnp.concatenate([a_s, b_s]),
                sa=sa_s, sb=sb_s, s2=jnp.concatenate([sa_s, sb_s]),
            )
            solver_overflow_extra = jnp.bool_(False)
        buckets.insert(0, sbk)
    else:
        solver_overflow_extra = jnp.bool_(False)
    overflow = overflow | solver_overflow_extra

    if bucketed:
        # Per-side Jacobi inertia/impulse scaling, baked per bucket row (1 outside the
        # Jacobi slice). reference SequentialFallbackBatch.cs:37 mass splitting.
        for bk in buckets:
            if bk.get("pages") or bk.get("win"):
                continue  # store bucket: sa/sb/s2/idx2 prebuilt; page/window owns layout
            ba = bk["ps"].body_a
            bb = bk["ps"].body_b
            cap = bk["cap"]
            is_j = jnp.arange(ba.shape[0]) >= C * cap
            sa = jnp.where(is_j, valence[ba], 1.0)
            sb = jnp.where(is_j, valence[bb], 1.0)
            bk["sa"] = sa
            bk["sb"] = sb
            bk["s2"] = jnp.concatenate([sa, sb])
            bk["idx2"] = jnp.concatenate([ba, bb])
            ncap = C * cap
            bk["idx2_col"] = jnp.concatenate(
                [ba[:ncap].reshape(C, cap), bb[:ncap].reshape(C, cap)], axis=1
            )
            bk["idx2_j"] = jnp.concatenate([ba[ncap:], bb[ncap:]])
            bk["s2_j"] = jnp.concatenate([sa[ncap:], sb[ncap:]])
            # Pre-sorted scatter targets: TPU scatters with indices_are_sorted run
            # measurably faster (sorted 131k-row scatter-add: 1.66 → 0.86 ms). The bucket
            # layouts are static per step, so one sort here makes EVERY pass's scatter
            # sorted; each pass pays only a cheap values-permutation gather.
            bk["idx2_j_s"], bk["idx2_j_p"] = _sort_with_perm(bk["idx2_j"])

            # Per-color INVERSE maps turn the color-pass scatter into a gather-apply:
            # within a color no two live rows share a body (the coloring invariant), so
            # body → bucket-position is a function, and
            #     v6 += p2_padded[inv_col[c]]
            # applies the color's deltas with one (NB,·) row gather. Measured on v5e,
            # arbitrary row gathers cost ~2.3 ns/row vs ~6-13 ns/row for scatter-add
            # (experiments/gather_cost_model.py), so this wins whenever the body count
            # is not much larger than a color's row count; small banks (compound
            # children) keep the sorted-scatter path.
            present_col = bk["present"][:ncap].reshape(C, cap)
            present2 = jnp.concatenate([present_col, present_col], axis=1)  # (C, 2cap)
            # Padding positions alias row m-1's bodies — mask them to the sentinel
            # column so they can't steal a real body's map slot.
            tgt2 = jnp.where(present2, bk["idx2_col"], n_bodies)
            bk["use_ga"] = n_bodies < 12 * cap
            if bk["use_ga"]:
                pos2 = jnp.broadcast_to(
                    jnp.arange(2 * cap, dtype=jnp.int32)[None, :], (C, 2 * cap)
                )
                # NOT unique_indices: every padding alias lands on the sentinel column
                # (sliced off below), where duplicates are allowed to race.
                bk["inv_col"] = (
                    jnp.full((C, n_bodies + 1), 2 * cap, jnp.int32)
                    .at[jnp.arange(C, dtype=jnp.int32)[:, None], tgt2]
                    .set(pos2)
                )[:, :n_bodies]
            else:
                # Sorted scatter fallback: sink the padding aliases (mode=drop) so the
                # per-color targets are truly unique.
                bk["idx2_col_s"], bk["idx2_col_p"] = _sort_with_perm(tgt2, axis=1)
                bk["idx2_s"], bk["idx2_p"] = _sort_with_perm(bk["idx2"])

        if use_pallas:
            # Per-step Pallas slice metadata: body indices and mass-splitting scales in
            # slice layout (slice s = [A rows | B rows]); springiness precomputed so the
            # kernel streams plain f32 rows (ops/sweep.py layout).
            from ..utils.spring import compute_springiness as _springiness

            if use_win:
                # All pallas banks share the PERMUTED (appendix + Morton) velocity
                # layout; non-store banks route full-width against it, so their body
                # indices remap to layout positions.
                win0 = next(bk["win"] for bk in buckets if bk.get("win"))
                p_nch = win0["lay"]["nch"]
            else:
                p_nch = max(128, _round_up(-(-n_bodies // psweep.L), 128))
            for bk in buckets:
                sb_i = (
                    bk["page"] if (bk.get("pages") or bk.get("win"))
                    else bk["sb_slice"]
                )
                B = bk["idx2"].shape[0] // 2
                if B == 0 or sb_i == 0:
                    bk["p_nsl"] = 0
                    continue
                nsl = B // sb_i
                bk["p_nsl"] = nsl
                if bk.get("win"):
                    w = bk["win"]
                    nsl_w = w["n_slices"]

                    def _slice_major(xa, xb):
                        return jnp.concatenate(
                            [xa.reshape(nsl_w, sb_i), xb.reshape(nsl_w, sb_i)],
                            axis=1,
                        ).reshape(-1)

                    # Window-relative chunk/lane per side (all slices are windowed —
                    # narrow 3-block windows and wide (blkA, blkB) windows share the
                    # 4-segment kernel path).
                    bk["p_whi2"] = _slice_major(
                        w["rel_a"] // psweep.L, w["rel_b"] // psweep.L
                    )
                    bk["p_wlo2"] = _slice_major(
                        w["rel_a"] % psweep.L, w["rel_b"] % psweep.L
                    )
                    bk["p_wscale"] = _slice_major(bk["sa"], bk["sb"])
                else:
                    ba_s = bk["ps"].body_a.reshape(nsl, sb_i)
                    bb_s = bk["ps"].body_b.reshape(nsl, sb_i)
                    if use_win:
                        # Remap slot ids to permuted layout positions.
                        sp = win0["lay"]["slot_pos"]
                        ba_s = sp[ba_s]
                        bb_s = sp[bb_s]
                    bk["p_idx2"] = jnp.concatenate([ba_s, bb_s], axis=1).reshape(-1)
                    sa_s = bk["sa"].reshape(nsl, sb_i)
                    sb_s = bk["sb"].reshape(nsl, sb_i)
                    bk["p_scale"] = jnp.concatenate([sa_s, sb_s], axis=1).reshape(-1)
                bk["p_spring"] = _springiness(bk["ps"].spring, h)

        if ju is not None:
            cap = ju["cap"]
            ncap = ju["ncap"]
            BU = ju["order"].shape[0]
            is_j = jnp.arange(BU) >= ncap
            sa = jnp.where(is_j, valence[ju["a"]], 1.0)
            sb = jnp.where(is_j, valence[ju["b"]], 1.0)
            ju["sa"] = sa
            ju["sb"] = sb
            ju["idx2"] = jnp.concatenate([ju["a"], ju["b"]])
            ju["idx2_col"] = jnp.concatenate(
                [ju["a"][:ncap].reshape(C, cap), ju["b"][:ncap].reshape(C, cap)], axis=1
            )
            present_col = ju["present"][:ncap].reshape(C, cap)
            present2 = jnp.concatenate([present_col, present_col], axis=1)
            ju["tgt2"] = jnp.where(present2, ju["idx2_col"], n_bodies)
            ju["idx2_col_s"], ju["idx2_col_p"] = _sort_with_perm(ju["tgt2"], axis=1)
            # Full-bank sorted scatter for warm starts; Jacobi slice scatter for the
            # fallback pass.
            present2_full = jnp.concatenate([ju["present"], ju["present"]])
            ju["tgt2_full"] = jnp.where(present2_full, ju["idx2"], n_bodies)
            ju["idx2_s"], ju["idx2_p"] = _sort_with_perm(ju["tgt2_full"])
            ju["idx2_j"] = jnp.concatenate([ju["a"][ncap:], ju["b"][ncap:]])
            pj = jnp.concatenate([ju["present"][ncap:], ju["present"][ncap:]])
            ju["idx2_j_s"], ju["idx2_j_p"] = _sort_with_perm(
                jnp.where(pj, ju["idx2_j"], n_bodies)
            )
            ju["s2_j"] = jnp.concatenate([sa[ncap:], sb[ncap:]])

    # ---- Masked-path helpers (sharded execution) ---------------------------------------
    cbank_refs = [(ps.body_a, ps.body_b) for ps, _ in contact_banks]
    cbank_val = [(valence[a_], valence[b_]) for a_, b_ in cbank_refs]
    cbank_idx2 = [jnp.concatenate([a_, b_]) for a_, b_ in cbank_refs]
    cbank_val2 = [jnp.concatenate([va_, vb_]) for va_, vb_ in cbank_val]

    def apply_dv(v6, dv):
        """Apply an accumulated velocity-delta array; under sharding the deltas from all
        shards combine with one psum (exact within a color — see docstring)."""
        if axis_name is not None:
            dv = jax.lax.psum(dv, axis_name)
        return v6 + dv

    def gather_inertia_pair(i7, ci, jacobi: bool):
        idx2 = cbank_idx2[ci]
        m = idx2.shape[0] // 2
        gi = i7[idx2]
        if jacobi:
            gi = gi * cbank_val2[ci][:, None]
        ia = GatheredInertia(gi[:m, 0], Sym3(*(gi[:m, k] for k in range(1, 7))))
        ib = GatheredInertia(gi[m:, 0], Sym3(*(gi[m:, k] for k in range(1, 7))))
        return ia, ib

    def contact_pass_kern(v6, dv, ci, kern, imp_l, mask, jacobi: bool):
        """Masked full-bank pass (sharded path): gather velocities, apply the precomputed
        kernel, scatter deltas."""
        idx2 = cbank_idx2[ci]
        va, vb = _vel_pair_from12(v6[idx2])
        new_imp, nva, nvb = contact_mod.apply_iteration(kern, imp_l, va, vb, mask)
        p2 = jnp.concatenate([_pack_dv(_delta(nva, va)), _pack_dv(_delta(nvb, vb))])
        if jacobi:
            p2 = p2 / cbank_val2[ci][:, None]
        dv = dv.at[idx2].add(p2)
        return dv, new_imp

    # ---- Joint passes (masked path + multibody types) ----------------------------------
    def two_body_ctx(v6, i7, state, bank, active, jacobi):
        a = bank["bodies"][:, 0]
        b = bank["bodies"][:, 1]
        sa = valence[a] if jacobi else None
        sb = valence[b] if jacobi else None
        return JointContext(
            pos_a=state.pos[a], orn_a=state.orn[a],
            inertia_a=_gather_inertia(i7, a, sa), vel_a=_gather_vel(v6, a),
            pos_b=state.pos[b], orn_b=state.orn[b],
            inertia_b=_gather_inertia(i7, b, sb), vel_b=_gather_vel(v6, b),
            active=active,
        )

    def joint_pass(v6, dv, i7, state, name, bank, imp_l, mask, jacobi: bool):
        cls = JOINT_TYPES[name]
        nb = getattr(cls, "N_BODIES", 2)
        if nb <= 2:
            a = bank["bodies"][:, 0]
            b = bank["bodies"][:, 1]
            ctx = two_body_ctx(v6, i7, state, bank, mask, jacobi)
            new_imp, dva, dvb = cls.solve(bank["prestep"], imp_l, ctx, h, inv_h)
            idx2 = jnp.concatenate([a, b])
            p2 = jnp.concatenate([_pack_dv(dva), _pack_dv(dvb)])
            if jacobi:
                p2 = p2 / jnp.concatenate([valence[a], valence[b]])[:, None]
            dv = dv.at[idx2].add(p2)
            return dv, new_imp
        idxs = [bank["bodies"][:, j] for j in range(nb)]
        ctx = MultiBodyContext(
            pos=[state.pos[i] for i in idxs],
            vel=[_gather_vel(v6, i) for i in idxs],
            inv_mass=[
                i7[i, 0] * (valence[i] if jacobi else 1.0) for i in idxs
            ],
            active=mask,
        )
        new_imp, dvs = cls.solve(bank["prestep"], imp_l, ctx, h, inv_h)
        for j, i in enumerate(idxs):
            dv = _scatter_dv(dv, i, dvs[j], (1.0 / valence[i]) if jacobi else None)
        return dv, new_imp

    def joint_warm_start(v6, dv, i7, state, name, bank, imp_l):
        cls = JOINT_TYPES[name]
        nb = getattr(cls, "N_BODIES", 2)
        if nb <= 2:
            a = bank["bodies"][:, 0]
            b = bank["bodies"][:, 1]
            ctx = two_body_ctx(v6, i7, state, bank, bank_valid[name], False)
            dva, dvb = cls.warm_start(bank["prestep"], imp_l, ctx)
            dv = _scatter_dv(dv, a, dva)
            return _scatter_dv(dv, b, dvb)
        idxs = [bank["bodies"][:, j] for j in range(nb)]
        ctx = MultiBodyContext(
            pos=[state.pos[i] for i in idxs],
            vel=[_gather_vel(v6, i) for i in idxs],
            inv_mass=[i7[i, 0] for i in idxs],
            active=bank_valid[name],
        )
        dvs = cls.warm_start(bank["prestep"], imp_l, ctx)
        for j, i in enumerate(idxs):
            dv = _scatter_dv(dv, i, dvs[j])
        return dv

    def mb_iteration_tail(v6, i7, state, jimps):
        """Per-iteration solve of the (rare) 3/4-body types: masked full-bank per-color
        passes (their banks are tiny; two-body types run in the unified bucket sweep)."""
        if not mb_names:
            return v6, jimps

        def jcolor_pass(c, sc):
            v6, jimps = sc
            dv = jnp.zeros_like(v6)
            new_jimps = dict(jimps)
            for name in mb_names:
                mask_j = bank_valid[name] & (colors[name] == c)
                dv, new_jimps[name] = joint_pass(
                    v6, dv, i7, state, name, joint_banks[name], jimps[name], mask_j, False
                )
            return apply_dv(v6, dv), new_jimps

        v6, jimps = jax.lax.fori_loop(0, C, jcolor_pass, (v6, jimps))
        dv = jnp.zeros_like(v6)
        new_jimps = dict(jimps)
        for name in mb_names:
            mask_j = bank_valid[name] & (colors[name] == C)
            dv, new_jimps[name] = joint_pass(
                v6, dv, i7, state, name, joint_banks[name], jimps[name], mask_j, True
            )
        return apply_dv(v6, dv), new_jimps

    def joint_iteration_tail(v6, i7, state, jimps):
        """Per-iteration joint solve for the sharded path: per-color masked passes then
        the Jacobi bucket over every joint bank."""
        if not bank_names:
            return v6, jimps

        def jcolor_pass(c, sc):
            v6, jimps = sc
            dv = jnp.zeros_like(v6)
            new_jimps = dict(jimps)
            for name in bank_names:
                mask_j = bank_valid[name] & (colors[name] == c)
                dv, new_jimps[name] = joint_pass(
                    v6, dv, i7, state, name, joint_banks[name], jimps[name], mask_j, False
                )
            return apply_dv(v6, dv), new_jimps

        v6, jimps = jax.lax.fori_loop(0, C, jcolor_pass, (v6, jimps))
        dv = jnp.zeros_like(v6)
        new_jimps = dict(jimps)
        for name in bank_names:
            mask_j = bank_valid[name] & (colors[name] == C)
            dv, new_jimps[name] = joint_pass(
                v6, dv, i7, state, name, joint_banks[name], jimps[name], mask_j, True
            )
        return apply_dv(v6, dv), new_jimps

    # Joint impulses must be zero for inactive records before warm start.
    joint_imps = {
        name: joint_banks[name]["impulse"] * bank_valid[name][:, None].astype(jnp.float32)
        for name in bank_names
    }

    # ---- Unified joint bank kernels (bucketed path) ------------------------------------
    def ju_ctx(table14, v6, idx2, active, scale2=None):
        """Build a JointContext from ONE context-table gather + ONE velocity gather."""
        rows = table14[idx2]
        m = idx2.shape[0] // 2
        sa = scale2[:m] if scale2 is not None else None
        sb = scale2[m:] if scale2 is not None else None
        pos_a, orn_a, gi_a = _split14(rows[:m], sa)
        pos_b, orn_b, gi_b = _split14(rows[m:], sb)
        va, vb = _vel_pair_from12(v6[idx2])
        return JointContext(
            pos_a=pos_a, orn_a=orn_a, inertia_a=gi_a, vel_a=va,
            pos_b=pos_b, orn_b=orn_b, inertia_b=gi_b, vel_b=vb,
            active=active,
        )

    def ju_apply_types(fn_name, ps, imp, tag, ctx):
        """Run every present type's ``solve``/``warm_start`` masked by the row tag and
        merge results. Types fuse into one VPU kernel — padded columns are dead lanes."""
        n = tag.shape[0]
        dva = _zero_vel(n)
        dvb = _zero_vel(n)
        new_imp = imp
        for name in tb_names:
            cls = JOINT_TYPES[name]
            m_t = ctx.active & (tag == ju["type_ids"][name])
            ctx_t = ctx._replace(active=m_t)
            ps_t = ps[:, : cls.N_PRESTEP]
            imp_t = new_imp[:, : cls.N_IMPULSE]
            if fn_name == "solve":
                imp_out, da, db = cls.solve(ps_t, imp_t, ctx_t, h, inv_h)
                new_imp = jnp.where(
                    m_t[:, None],
                    _pad_cols(imp_out, _U_IMPULSE),
                    new_imp,
                )
            else:
                da, db = cls.warm_start(ps_t, imp_t, ctx_t)
            sel = lambda d: jax.tree_util.tree_map(
                lambda x: jnp.where(m_t, x, 0.0), d
            )
            da, db = sel(da), sel(db)
            dva = BodyVel(dva.linear + da.linear, dva.angular + da.angular)
            dvb = BodyVel(dvb.linear + db.linear, dvb.angular + db.angular)
        return new_imp, dva, dvb

    # ---- Bucketed substep loop (single chip) -------------------------------------------
    def contact_bucket_sweep(ci, table14, v6, imp_flat, ps_full):
        """One Gauss-Seidel sweep over a contact bank: lax.scan over the color slices
        (contiguous ~cap-row blocks), then the compacted Jacobi slice with mass-split
        scaling. Each pass is one fused gather → prepare → iterate → scatter kernel;
        jacobians/effective masses are recomputed in-pass (reference recomputes per solve
        too, TwoBodyTypeProcessor.cs:205 — materializing them instead costs two extra
        full-bank HBM round-trips per substep). Conflict-freedom within a color makes
        the immediate scatter exact."""
        bk = buckets[ci]
        cap = bk["cap"]
        ncap = C * cap
        ps_rs = jax.tree_util.tree_map(
            lambda x: x[:ncap].reshape((C, cap) + x.shape[1:]), ps_full
        )

        def body(carry, xs):
            v6, imp_flat, c = carry
            ps_c, extra = xs
            imp_c = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, c * cap, cap), imp_flat
            )
            if bk["use_ga"]:
                idx2_c, inv_c = extra
            else:
                idx2_c, idx2_c_s, idx2_c_p = extra
            rows = table14[idx2_c]
            _, _, ia = _split14(rows[:cap])
            _, _, ib = _split14(rows[cap:])
            va, vb = _vel_pair_from12(v6[idx2_c])
            kern = contact_mod.prepare(ps_c, ia, ib, h, inv_h)
            new_imp, nva, nvb = contact_mod.apply_iteration(
                kern, imp_c, va, vb, ps_c.valid
            )
            p2 = jnp.concatenate([_pack_dv(_delta(nva, va)), _pack_dv(_delta(nvb, vb))])
            if bk["use_ga"]:
                # Gather-apply (see inv_col construction): one (NB, 6) row gather from
                # the color's padded delta block replaces the scatter-add.
                p2z = jnp.concatenate([p2, jnp.zeros((1, 6), p2.dtype)])
                v6 = v6 + p2z[inv_c]
            else:
                # Padding aliases were masked to the sentinel n_bodies (dropped), so the
                # in-bounds targets are unique — but the sentinel repeats, so
                # unique_indices must stay off.
                v6 = v6.at[idx2_c_s].add(
                    p2[idx2_c_p], mode="drop", indices_are_sorted=True
                )
            imp_flat = jax.tree_util.tree_map(
                lambda full, new: jax.lax.dynamic_update_slice_in_dim(full, new, c * cap, 0),
                imp_flat, new_imp,
            )
            return (v6, imp_flat, c + 1), None

        extra_xs = (
            (bk["idx2_col"], bk["inv_col"])
            if bk["use_ga"]
            else (bk["idx2_col"], bk["idx2_col_s"], bk["idx2_col_p"])
        )
        (v6, imp_flat, _), _ = jax.lax.scan(
            body, (v6, imp_flat, jnp.int32(0)), (ps_rs, extra_xs)
        )

        # Jacobi slice: rows here MAY share bodies; inertia is valence-scaled and the
        # deltas are divided by valence (mass splitting).
        ps_j = jax.tree_util.tree_map(lambda x: x[ncap:], ps_full)
        imp_j = jax.tree_util.tree_map(lambda x: x[ncap:], imp_flat)
        rows_j = table14[bk["idx2_j"]]
        half_j = bk["idx2_j"].shape[0] // 2
        _, _, ia_j = _split14(rows_j[:half_j], bk["s2_j"][:half_j])
        _, _, ib_j = _split14(rows_j[half_j:], bk["s2_j"][half_j:])
        va, vb = _vel_pair_from12(v6[bk["idx2_j"]])
        kern_j = contact_mod.prepare(ps_j, ia_j, ib_j, h, inv_h)
        new_imp, nva, nvb = contact_mod.apply_iteration(kern_j, imp_j, va, vb, ps_j.valid)
        p2 = jnp.concatenate([_pack_dv(_delta(nva, va)), _pack_dv(_delta(nvb, vb))])
        v6 = v6.at[bk["idx2_j_s"]].add(
            (p2 / bk["s2_j"][:, None])[bk["idx2_j_p"]], indices_are_sorted=True
        )
        imp_flat = jax.tree_util.tree_map(
            lambda full, new: full.at[ncap:].set(new), imp_flat, new_imp
        )
        return v6, imp_flat

    def store_page_sweep(ci, table14, v6, imp_flat, ps_full):
        """XLA fallback sweep for the persistent-store bank: lax.scan over PAGES in the
        store's execution order. Pages of one color are mutually conflict-free (the
        store's claim invariant), so immediate per-page scatter-adds are exact; Jacobi
        pages carry per-row mass-split scales (inertia scaled up, deltas divided)."""
        bk = buckets[ci]
        page = bk["page"]
        B = bk["idx2"].shape[0] // 2
        nsl = B // page
        ps_rs = jax.tree_util.tree_map(
            lambda x: x.reshape((nsl, page) + x.shape[1:]), ps_full
        )
        a_rs = bk["ps"].body_a.reshape(nsl, page)
        b_rs = bk["ps"].body_b.reshape(nsl, page)
        sa_rs = bk["sa"].reshape(nsl, page)
        sb_rs = bk["sb"].reshape(nsl, page)

        def body(carry, xs):
            v6, imp_flat, s = carry
            ps_c, a_c, b_c, sa_c, sb_c = xs
            imp_c = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, s * page, page), imp_flat
            )
            idx2_c = jnp.concatenate([a_c, b_c])
            rows = table14[idx2_c]
            _, _, ia = _split14(rows[:page], sa_c)
            _, _, ib = _split14(rows[page:], sb_c)
            va, vb = _vel_pair_from12(v6[idx2_c])
            kern = contact_mod.prepare(ps_c, ia, ib, h, inv_h)
            new_imp, nva, nvb = contact_mod.apply_iteration(
                kern, imp_c, va, vb, ps_c.valid
            )
            p2 = jnp.concatenate([_pack_dv(_delta(nva, va)), _pack_dv(_delta(nvb, vb))])
            v6 = v6.at[idx2_c].add(p2 / jnp.concatenate([sa_c, sb_c])[:, None])
            imp_flat = jax.tree_util.tree_map(
                lambda full, new: jax.lax.dynamic_update_slice_in_dim(
                    full, new, s * page, 0
                ),
                imp_flat, new_imp,
            )
            return (v6, imp_flat, s + 1), None

        (v6, imp_flat, _), _ = jax.lax.scan(
            body, (v6, imp_flat, jnp.int32(0)), (ps_rs, a_rs, b_rs, sa_rs, sb_rs)
        )
        return v6, imp_flat

    def ju_color_sweep(table14, v6, imp_flat):
        """One Gauss-Seidel sweep over the unified joint bank (all two-body types)."""
        cap = ju["cap"]
        ncap = ju["ncap"]
        ps_rs = ju["ps"][:ncap].reshape(C, cap, _U_PRESTEP)
        tag_rs = ju["tag"][:ncap].reshape(C, cap)
        live_rs = ju["live"][:ncap].reshape(C, cap)

        def body(carry, xs):
            v6, imp_flat, c = carry
            ps_c, tag_c, live_c, idx2_c, idx2_c_s, idx2_c_p = xs
            imp_c = jax.lax.dynamic_slice_in_dim(imp_flat, c * cap, cap)
            ctx = ju_ctx(table14, v6, idx2_c, live_c)
            new_imp, dva, dvb = ju_apply_types("solve", ps_c, imp_c, tag_c, ctx)
            p2 = jnp.concatenate([_pack_dv(dva), _pack_dv(dvb)])
            v6 = v6.at[idx2_c_s].add(
                p2[idx2_c_p], mode="drop", indices_are_sorted=True
            )
            imp_flat = jax.lax.dynamic_update_slice_in_dim(imp_flat, new_imp, c * cap, 0)
            return (v6, imp_flat, c + 1), None

        (v6, imp_flat, _), _ = jax.lax.scan(
            body,
            (v6, imp_flat, jnp.int32(0)),
            (ps_rs, tag_rs, live_rs, ju["idx2_col"], ju["idx2_col_s"], ju["idx2_col_p"]),
        )

        # Jacobi slice with mass splitting.
        ps_j = ju["ps"][ncap:]
        tag_j = ju["tag"][ncap:]
        live_j = ju["live"][ncap:]
        imp_j = imp_flat[ncap:]
        ctx_j = ju_ctx(table14, v6, ju["idx2_j"], live_j, ju["s2_j"])
        new_imp, dva, dvb = ju_apply_types("solve", ps_j, imp_j, tag_j, ctx_j)
        p2 = jnp.concatenate([_pack_dv(dva), _pack_dv(dvb)]) / ju["s2_j"][:, None]
        v6 = v6.at[ju["idx2_j_s"]].add(
            p2[ju["idx2_j_p"]], mode="drop", indices_are_sorted=True
        )
        imp_flat = imp_flat.at[ncap:].set(new_imp)
        return v6, imp_flat

    def substep_bucketed(carry, first: bool, n_iters: int = None):
        state, presteps_b, imps_b, jimps, ju_imp = carry
        if n_iters is None:
            n_iters = cfg.velocity_iterations
        if not first:
            v6 = _vel_to6(state)
            new_ps = []
            for ci in range(len(buckets)):
                # ONE (2B, 6) gather for both sides — per-gather fixed cost halves.
                va, vb = _vel_pair_from12(v6[buckets[ci]["idx2"]])
                new_ps.append(
                    contact_mod.incremental_depth_update(presteps_b[ci], va, vb, h)
                )
            presteps_b = tuple(new_ps)
            state = integrate_poses(state, integrator_cfg, h)
        state = integrate_velocities(state, integrator_cfg, h)

        world_ii = state.world_inv_inertia()
        table14 = _ctx14(state, world_ii)
        i7 = table14[:, 7:14]
        v6 = _vel_to6(state)

        # Warm start (pure accumulation; Jacobi rows apply mass-split deltas). Deltas are
        # velocity-independent, so ONE fused elementwise pass over each full bucket bank
        # computes them (warm_start with zero velocities returns the deltas directly).
        dv = jnp.zeros_like(v6)
        g2_cache = {}
        for ci in range(len(buckets)):
            bk = buckets[ci]
            B = bk["idx2"].shape[0] // 2
            rows = table14[bk["idx2"]]
            g2 = rows[:, 7:14] * bk["s2"][:, None]
            if bk.get("win"):
                g2_cache[ci] = g2  # jacobi-prescaled: streamed into the windowed kernel
            ia = GatheredInertia(g2[:B, 0], Sym3(*(g2[:B, k] for k in range(1, 7))))
            ib = GatheredInertia(g2[B:, 0], Sym3(*(g2[B:, k] for k in range(1, 7))))
            zb = _zero_vel(B)
            dva, dvb = contact_mod.warm_start(presteps_b[ci], imps_b[ci], ia, ib, zb, zb)
            p2 = jnp.concatenate([_pack_dv(dva), _pack_dv(dvb)]) / bk["s2"][:, None]
            if bk.get("pages") or bk.get("win"):
                # Store bank (exec page layout, no padding aliases): one scatter-add.
                # Invalid rows contribute exactly zero (impulses pre-zeroed + kernel
                # gating), so duplicate body targets only occur across pages where the
                # adds are genuinely independent.
                dv = dv.at[bk["idx2"]].add(p2)
            elif bk["use_ga"]:
                cap = bk["cap"]
                ncap = C * cap
                # Color rows via the per-color inverse maps: one batched row gather
                # (C, NB, 6) summed over colors replaces the 2B-row scatter-add.
                pa = p2[:ncap].reshape(C, cap, 6)
                pb = p2[B : B + ncap].reshape(C, cap, 6)
                p2c = jnp.concatenate([pa, pb], axis=1)  # (C, 2cap, 6)
                p2cz = jnp.concatenate(
                    [p2c, jnp.zeros((C, 1, 6), p2.dtype)], axis=1
                )
                g = jnp.take_along_axis(p2cz, bk["inv_col"][:, :, None], axis=1)
                dv = dv + jnp.sum(g, axis=0)
                # Jacobi slice rows keep the (small) sorted scatter.
                pj = jnp.concatenate([p2[ncap:B], p2[B + ncap :]])
                dv = dv.at[bk["idx2_j_s"]].add(
                    pj[bk["idx2_j_p"]], indices_are_sorted=True
                )
            else:
                dv = dv.at[bk["idx2_s"]].add(
                    p2[bk["idx2_p"]], mode="drop", indices_are_sorted=True
                )
        if ju is not None:
            ctx_w = ju_ctx(table14, v6, ju["idx2"], ju["live"])
            _, dva, dvb = ju_apply_types("warm", ju["ps"], ju_imp, ju["tag"], ctx_w)
            p2 = jnp.concatenate([_pack_dv(dva), _pack_dv(dvb)])
            dv = dv.at[ju["idx2_s"]].add(
                p2[ju["idx2_p"]], mode="drop", indices_are_sorted=True
            )
        for name in mb_names:
            dv = joint_warm_start(v6, dv, i7, state, name, joint_banks[name], jimps[name])
        v6 = v6 + dv

        if use_pallas:
            # Pallas path: all contact color slices + Jacobi pseudo-colors of a bank run
            # inside ONE kernel with VMEM-resident velocities (ops/sweep.py). Joint
            # sweeps (rare in contact-heavy scenes) stay on the XLA path, interleaved
            # per iteration to preserve the Gauss-Seidel order.
            if use_win:
                from . import windowing as _winm

                _lay = next(bk["win"] for bk in buckets if bk.get("win"))["lay"]
                tt = None  # every win bucket routes through 4-segment windows
            else:
                tt = psweep.pack_state_t(table14, p_nch)
            ps_ts = {}
            it_ts = {}
            for ci in range(len(buckets)):
                bk = buckets[ci]
                if bk["p_nsl"]:
                    ps_ts[ci] = psweep.pack_contact_prestep(
                        presteps_b[ci], bk["p_spring"]
                    )
                    if bk.get("win"):
                        g2 = g2_cache[ci]
                        BP = g2.shape[0] // 2
                        it_ts[ci] = psweep.pack_inertia_rows(g2[:BP], g2[BP:])

            def run_banks(v6, imps_b, n_it):
                if use_win:
                    v6p = _winm.permute_rows(v6, _lay["pos_slot"])
                    vt = psweep.pack_state_v(v6p, p_nch)
                else:
                    vt = psweep.pack_state_v(v6, p_nch)
                new_imps = list(imps_b)
                for ci in range(len(buckets)):
                    bk = buckets[ci]
                    if not bk["p_nsl"]:
                        continue
                    imp_t = psweep.pack_contact_impulses(imps_b[ci])
                    if bk.get("win"):
                        w = bk["win"]
                        vt, imp_t = psweep.contact_sweep_win(
                            vt, it_ts[ci], ps_ts[ci], imp_t,
                            bk["p_whi2"], bk["p_wlo2"], bk["p_wscale"], w["wseg"],
                            h, inv_h,
                            sb=w["sb"], n_iters=n_it, interpret=pallas_interpret,
                        )
                    else:
                        vt, imp_t = psweep.contact_sweep(
                            vt, tt, ps_ts[ci], imp_t, bk["p_idx2"], bk["p_scale"],
                            h, inv_h,
                            sb=bk["page"] if bk.get("pages") else bk["sb_slice"],
                            n_iters=n_it,
                            interpret=pallas_interpret,
                        )
                    new_imps[ci] = psweep.unpack_contact_impulses(imp_t, imps_b[ci])
                if use_win:
                    NP = p_nch * psweep.L
                    v6p_out = psweep.unpack_state_v(vt, NP)
                    return v6p_out[_lay["slot_pos"]], tuple(new_imps)
                return psweep.unpack_state_v(vt, n_bodies), tuple(new_imps)

            only_contacts = (ju is None) and not mb_names
            if only_contacts and len(buckets) == 1 and not use_win:
                v6, imps_b = run_banks(v6, imps_b, n_iters)
            else:
                for _ in range(n_iters):
                    v6, imps_b = run_banks(v6, imps_b, 1)
                    if ju is not None:
                        v6, ju_imp = ju_color_sweep(table14, v6, ju_imp)
                    v6, jimps = mb_iteration_tail(v6, i7, state, jimps)
        else:
            def iteration(_, sc):
                v6, imps_b, jimps, ju_imp = sc
                new_imps = list(imps_b)
                for ci in range(len(buckets)):
                    sweep = (
                        store_page_sweep
                        if buckets[ci].get("pages")
                        else contact_bucket_sweep
                    )
                    v6, new_imps[ci] = sweep(
                        ci, table14, v6, imps_b[ci], presteps_b[ci]
                    )
                if ju is not None:
                    v6, ju_imp = ju_color_sweep(table14, v6, ju_imp)
                v6, jimps = mb_iteration_tail(v6, i7, state, jimps)
                return v6, tuple(new_imps), jimps, ju_imp

            v6, imps_b, jimps, ju_imp = jax.lax.fori_loop(
                0, n_iters, iteration, (v6, imps_b, jimps, ju_imp)
            )
        state = _vel_from6(state, v6)
        return state, presteps_b, imps_b, jimps, ju_imp

    # ---- Masked substep loop (sharded path) --------------------------------------------
    def substep_masked(carry, first: bool, n_iters: int = None):
        state, presteps_l, imps_l, jimps, _ju_unused = carry
        if n_iters is None:
            n_iters = cfg.velocity_iterations
        if not first:
            v6 = _vel_to6(state)
            new_presteps = []
            for ci in range(n_cbanks):
                ca, cb = cbank_refs[ci]
                va = _gather_vel(v6, ca)
                vb = _gather_vel(v6, cb)
                new_presteps.append(
                    contact_mod.incremental_depth_update(presteps_l[ci], va, vb, h)
                )
            presteps_l = tuple(new_presteps)
            state = integrate_poses(state, integrator_cfg, h)
        state = integrate_velocities(state, integrator_cfg, h)

        world_ii = state.world_inv_inertia()
        i7 = _inertia7(state, world_ii)
        v6 = _vel_to6(state)

        kerns = []
        kerns_j = []
        for ci in range(n_cbanks):
            ia, ib = gather_inertia_pair(i7, ci, False)
            kerns.append(
                jax.lax.optimization_barrier(
                    contact_mod.prepare(presteps_l[ci], ia, ib, h, inv_h)
                )
            )
            ia_j, ib_j = gather_inertia_pair(i7, ci, True)
            kerns_j.append(
                jax.lax.optimization_barrier(
                    contact_mod.prepare(presteps_l[ci], ia_j, ib_j, h, inv_h)
                )
            )

        dv = jnp.zeros_like(v6)
        for ci in range(n_cbanks):
            idx2 = cbank_idx2[ci]
            dva, dvb = contact_mod.warm_start_kern(kerns[ci], imps_l[ci])
            p2 = jnp.concatenate([_pack_dv(dva), _pack_dv(dvb)])
            dv = dv.at[idx2].add(p2)
        for name in bank_names:
            dv = joint_warm_start(v6, dv, i7, state, name, joint_banks[name], jimps[name])
        v6 = apply_dv(v6, dv)

        def color_pass(c, sc):
            # Within a color no two constraints (across banks or shards) share a body, so
            # all banks accumulate one conflict-free delta applied with a single psum.
            v6, imps_l, jimps = sc
            dv = jnp.zeros_like(v6)
            new_imps = list(imps_l)
            for ci in range(n_cbanks):
                mask_c = presteps_l[ci].valid & (colors[f"__contacts{ci}__"] == c)
                dv, new_imps[ci] = contact_pass_kern(
                    v6, dv, ci, kerns[ci], imps_l[ci], mask_c, False
                )
            new_jimps = dict(jimps)
            for name in bank_names:
                mask_j = bank_valid[name] & (colors[name] == c)
                dv, new_jimps[name] = joint_pass(
                    v6, dv, i7, state, name, joint_banks[name], jimps[name], mask_j, False
                )
            return apply_dv(v6, dv), tuple(new_imps), new_jimps

        def iteration(_, sc):
            sc = jax.lax.fori_loop(0, C, color_pass, sc)
            v6, imps_l, jimps = sc
            dv = jnp.zeros_like(v6)
            new_imps = list(imps_l)
            for ci in range(n_cbanks):
                dv, new_imps[ci] = contact_pass_kern(
                    v6, dv, ci, kerns_j[ci], imps_l[ci], cbank_in_jacobi[ci], True
                )
            new_jimps = dict(jimps)
            for name in bank_names:
                mask_j = bank_valid[name] & (colors[name] == C)
                dv, new_jimps[name] = joint_pass(
                    v6, dv, i7, state, name, joint_banks[name], jimps[name], mask_j, True
                )
            return apply_dv(v6, dv), tuple(new_imps), new_jimps

        v6, imps_l, jimps = jax.lax.fori_loop(
            0, n_iters, iteration, (v6, imps_l, jimps)
        )
        state = _vel_from6(state, v6)
        return state, presteps_l, imps_l, jimps, _ju_unused

    # ---- Run the substep loop ----------------------------------------------------------
    def _finalize(state, imps_final, jimps_final, ju_imp_final):
        return _solve_finalize_bucketed(
            state, imps_final, jimps_final, ju_imp_final, buckets, contact_banks,
            n_cbanks, ju, tb_names, joint_banks, joint_imps, overflow,
            persist_c, persist_j, jnp.stack([jac_demand, wide_demand]),
            inv_perm_pages,
        )

    # Contact-only scenes on the Pallas backend take the whole-solve mega kernel: ONE
    # pallas_call covers every substep's incremental depth update, pose/velocity
    # integration, world-inertia refresh, warm start, and velocity iterations with the
    # body state VMEM-resident throughout (ops/sweep.py solve_substeps_contacts).
    mega_ok = (
        use_pallas
        and not bank_names
        and cfg.iteration_schedule is None
        and integrator_cfg.velocity_callback is None
        and any(bk.get("p_nsl") for bk in buckets)
    )
    mega = mega_ok and not use_win
    # (The former in-line mega_win path is unreachable: every store-only windowed
    # scene is intercepted by _solve_store_fast above.)
    if mega:
        active = [ci for ci in range(len(buckets)) if buckets[ci]["p_nsl"]]
        ps_t_all = jnp.concatenate(
            [
                psweep.pack_contact_prestep(
                    buckets[ci]["ps"], buckets[ci]["p_spring"]
                )
                for ci in active
            ],
            axis=1,
        )
        imp_t_all = jnp.concatenate(
            [psweep.pack_contact_impulses(buckets[ci]["imp"]) for ci in active], axis=1
        )
        idx2_all = jnp.concatenate([buckets[ci]["p_idx2"] for ci in active])
        scale_all = jnp.concatenate([buckets[ci]["p_scale"] for ci in active])
        lin_scale = (
            (1.0 - integrator_cfg.linear_damping) ** h
            if integrator_cfg.linear_damping
            else 1.0
        )
        ang_scale = (
            (1.0 - integrator_cfg.angular_damping) ** h
            if integrator_cfg.angular_damping
            else 1.0
        )
        gmask = (state.kind == KIND_DYNAMIC) & state.awake
        v6n, pos_n, orn_n, imp_out = psweep.solve_substeps_contacts(
            _vel_to6(state), state.pos, state.orn, state.inv_mass, state.inv_inertia,
            gmask, state.integrable,
            ps_t_all, imp_t_all, idx2_all, scale_all,
            h, inv_h, lin_scale, ang_scale,
            nch=p_nch, sb=sb_global, n_substeps=cfg.substeps,
            n_iters=cfg.velocity_iterations,
            angular_mode=integrator_cfg.angular_mode,
            gravity=integrator_cfg.gravity,
            interpret=pallas_interpret,
        )
        state = _vel_from6(state._replace(pos=pos_n, orn=orn_n), v6n)
        imps_list = []
        off_b = 0
        for ci in range(len(buckets)):
            bk = buckets[ci]
            if not bk["p_nsl"]:
                imps_list.append(bk["imp"])
                continue
            Bi = bk["idx2"].shape[0] // 2
            imps_list.append(
                psweep.unpack_contact_impulses(
                    jax.lax.dynamic_slice_in_dim(imp_out, off_b, Bi, axis=1), bk["imp"]
                )
            )
            off_b += Bi
        imps_final = tuple(imps_list)
        jimps_final = {}
        ju_imp_final = jnp.zeros((0, _U_IMPULSE), jnp.float32)
        state = integrate_poses(state, integrator_cfg, h)
        return _finalize(state, imps_final, jimps_final, ju_imp_final)
    substep = substep_bucketed if bucketed else substep_masked
    if bucketed:
        presteps0 = tuple(bk["ps"] for bk in buckets)
        imps0 = tuple(bk["imp"] for bk in buckets)
        jimps0 = {name: joint_imps[name] for name in mb_names}
        ju_imp0 = ju["imp0"] if ju is not None else jnp.zeros((0, _U_IMPULSE), jnp.float32)
    else:
        presteps0 = tuple(ps for ps, _ in contact_banks)
        imps0 = tuple(im for _, im in contact_banks)
        jimps0 = joint_imps
        ju_imp0 = jnp.zeros((0, _U_IMPULSE), jnp.float32)
    carry0 = (state, presteps0, imps0, jimps0, ju_imp0)
    if cfg.iteration_schedule is not None:
        # Per-substep velocity-iteration counts (reference VelocityIterationScheduler,
        # SolveDescription.cs:17): static per-substep loop lengths force an unrolled
        # substep chain instead of the scanned one.
        carry = substep(carry0, first=True, n_iters=cfg.iterations_for(0))
        for s in range(1, cfg.substeps):
            carry = substep(carry, first=False, n_iters=cfg.iterations_for(s))
    else:
        carry = substep(carry0, first=True)
        if cfg.substeps > 1:
            carry, _ = jax.lax.scan(
                lambda c, _: (substep(c, first=False), None), carry, None,
                length=cfg.substeps - 1,
            )
    state, _, imps_final, jimps_final, ju_imp_final = carry

    state = integrate_poses(state, integrator_cfg, h)

    if bucketed:
        return _finalize(state, imps_final, jimps_final, ju_imp_final)
    return (
        state, list(imps_final), jimps_final, overflow, persist_c, persist_j,
        jnp.stack([jac_demand, wide_demand]),
    )


def _solve_finalize_bucketed(
    state, imps_final, jimps_final, ju_imp_final, buckets, contact_banks, n_cbanks,
    ju, tb_names, joint_banks, joint_imps, overflow, persist_c, persist_j,
    solver_demand, inv_perm_pages=None,
):
    """Bucket-order impulses → original bank order (warm-start persistence).

    Each bank's ``pos`` (original row → bucket position, sentinel B = dropped) is already
    known from bucket construction, so the unbucketing is ONE row gather per bank — the
    previous sort-based inverse cost two 16k-element sorts per step (~0.9 ms at 4k).
    Store buckets return SLOT-order impulses (inverse page gather applied here), so the
    caller persists them in place with no layout knowledge."""
    if True:
        def _ipg(x):
            # page-exec order → slot order (page-granular inverse permutation).
            P = inv_perm_pages.shape[0]
            page = x.shape[0] // P
            return x.reshape((P, page) + x.shape[1:])[inv_perm_pages].reshape(x.shape)

        imps_out = []
        n_store = sum(1 for bk in buckets if bk.get("pages") or bk.get("win"))
        for ci in range(len(buckets)):
            bk = buckets[ci]
            if bk.get("pages"):
                imps_out.append(jax.tree_util.tree_map(_ipg, imps_final[ci]))
                continue
            if bk.get("win"):
                # Windowed store bank: back to page-exec order via the dest gather,
                # then to slot order. Wide-overflow rows (dest == sink) keep their
                # incoming (warm-start) impulses — retained, not zeroed.
                w = bk["win"]
                bp = w["bp"]
                placed = w["dest"] < bp
                dest_c = jnp.minimum(w["dest"], bp - 1)
                imps_out.append(
                    jax.tree_util.tree_map(
                        lambda orig_leaf, w_leaf: _ipg(jnp.where(
                            _bcast(placed, orig_leaf), w_leaf[dest_c], orig_leaf
                        )),
                        bk["imp_orig"], imps_final[ci],
                    )
                )
                continue
            B = bk["order"].shape[0]
            pos = bk["pos"]
            in_bucket = pos < B
            pos_c = jnp.minimum(pos, B - 1)
            imps_out.append(
                jax.tree_util.tree_map(
                    lambda orig_leaf, b_leaf: jnp.where(
                        _bcast(in_bucket, orig_leaf), b_leaf[pos_c], orig_leaf
                    ),
                    contact_banks[ci - n_store][1], imps_final[ci],
                )
            )
        joint_imps_out = dict(jimps_final)  # multibody types
        if ju is not None:
            BU = ju["order"].shape[0]
            in_b = ju["pos"] < BU
            pos_c = jnp.minimum(ju["pos"], BU - 1)
            u_imp_out = jnp.where(in_b[:, None], ju_imp_final[pos_c], 0.0)
            off_u = 0
            for name in tb_names:
                m_n = joint_banks[name]["bodies"].shape[0]
                q_n = JOINT_TYPES[name].N_IMPULSE
                joint_imps_out[name] = jax.lax.dynamic_slice_in_dim(
                    u_imp_out, off_u, m_n
                )[:, :q_n]
                off_u += m_n
        else:
            for name in tb_names:
                joint_imps_out[name] = joint_imps[name]
        return state, imps_out, joint_imps_out, overflow, persist_c, persist_j, solver_demand


def solve_contacts(state, prestep, imp, integrator_cfg, cfg, dt):
    """Single-contact-bank entry (kept for tests / minimal configs)."""
    state, imps, _, _, _, _, _ = solve_all(
        state, [(prestep, imp)], {}, integrator_cfg, cfg, dt
    )
    return state, imps[0]
