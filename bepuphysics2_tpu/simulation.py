"""Simulation facade — construction, body/static management, and the jitted timestep.

Mirrors the reference's orchestration (reference: Simulation.cs:106 Create,
Simulation.cs:316 Timestep, DefaultTimestepper.cs:28 stage order Sleep →
PredictBoundingBoxes → CollisionDetection → Solve → IncrementallyOptimize). On TPU the
whole frame is ONE jitted function over a fixed-capacity pytree:

    bounds → broad phase → narrow phase (+warm start carry) → colored TGS solve → sleep

Topology mutation (add/remove bodies/statics/shapes) happens host-side between steps and
marks the device state dirty; the next timestep pushes the merged state. Determinism:
every step is a deterministic XLA program over fixed shapes — the reference's
``Deterministic`` flag machinery (Simulation.cs:93) is free here (SURVEY §2.9 P7).
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bodies import BodyBuffer, BodyDescription, BodyState, StaticDescription, KIND_DYNAMIC
from .collision import broadphase as bp
from .collision.narrowphase import (
    PairCache,
    narrow_phase,
    narrow_phase_compound,
    update_cache,
    update_cache_keyed,
)
from .collision.raycast import ray_cast_all
from .sleep import update_sleep, wake_touched
from .constraints.joints import JOINT_TYPES, JointTypeStore, make_description
from .integrator import IntegratorConfig
from .shapes import ShapeRegistry, compute_body_bounds
from .solver.solve import SolveConfig, solve_all
from .utils.vec import Vec3


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static (trace-time) configuration. Frozen → hashable → usable as a jit static arg."""

    body_capacity: int = 1024
    max_pairs: int = 4096
    shape_capacity: int = 256
    substeps: int = 8
    velocity_iterations: int = 1
    num_colors: int = 8
    # Per-color contact bucket capacity factor (solver/solve.py SolveConfig): buckets hold
    # color_cap_factor·max_pairs/num_colors rows each; capacity-aware coloring defers
    # over-cap rows to later colors instead of dropping them.
    color_cap_factor: float = 1.5
    # Jacobi-slice capacity fraction of the contact bank (solver/solve.py).
    jacobi_cap_factor: float = 0.3
    # Incremental-coloring conflict-resolution rounds per frame (solver/coloring.py).
    color_rounds: int = 3
    broadphase: str = "auto"  # 'brute' | 'sweep' | 'grid' | 'grid2' | 'auto'
    joint_capacity: int = 256  # per-type bank capacity
    # Compound/mesh expansion (collision/compound.py):
    max_compound_pairs: int = 256
    children_per_pair: int = 8
    child_window: int = 128
    # Compound-vs-compound/mesh pairs: each expands into cc_children² child records
    # (0 disables; such pairs then raise the overflow diagnostic).
    max_cc_pairs: int = 0
    cc_children_per_side: int = 4
    sweep_window: int = 64
    # Grid cell size: 0 = adaptive (1.3 × median live AABB extent per frame; bodies
    # beyond it go to the 'large' set). Fixed positive values pin it.
    grid_cell_size: float = 0.0
    grid_cell_capacity: int = 16
    # 'Large' set capacity: statics (ground slabs, meshes) plus any body whose
    # velocity/spin-expanded AABB exceeds the cell this frame.
    grid_max_large: int = 256
    # grid2 (replicated-cell-entry) parameters: sorted-entry capacity factor (entries =
    # entry_factor·N) and adaptive cell size factor (cell = cell_factor × median extent).
    grid_entry_factor: int = 7
    grid_cell_factor: float = 1.2
    # grid2 per-cell comparison window (entries in one cell beyond this overflow) and
    # per-entry emitted-pair budget; both grown geometrically by autosize when their
    # overflow flags report (demand[D_WINHIT]/[D_ROWKHIT]).
    grid_pair_k: int = 8
    integrator: IntegratorConfig = IntegratorConfig()
    # Sleeping (reference IslandSleeper velocity/timer heuristic, IslandSleeper.cs:28):
    enable_sleep: bool = True
    sleep_time: float = 0.75
    # Continuous collision detection: max pairs swept to TOI per step (0 = CCD off;
    # bodies opt in with BodyDescription(continuity=1); reference ContinuousDetection).
    max_ccd_pairs: int = 0
    # Solver velocity-iteration backend (solver/solve.py SolveConfig.backend):
    # "auto" = Pallas sweep kernel on TPU, XLA elsewhere; "xla"/"pallas" force.
    solver_backend: str = "auto"
    # Persistent slot-stable pair store (collision/pairstore.py): pairs keep one slot,
    # color, and warm-start record for their whole life; per-frame cost is churn-bounded.
    # The reference's incremental PairCache/ConstraintBatch model (PairCache.cs:102,
    # Solver.cs:984). Off → the legacy per-frame join/recolor/pack pipeline.
    use_pair_store: bool = True
    # Rows per store page (one solver slice). 0 = auto: 512 when the pair capacity is
    # TPU-scale, small for tiny test scenes. Must divide the store capacity.
    store_page: int = 0
    # Churn caps (0 = auto): new-pair admissions, retirements, and Jacobi color retries
    # processed per frame; spill defers to the next frame (admission spill raises the
    # overflow diagnostic).
    store_churn: int = 0
    store_dead: int = 0
    store_repair: int = 0
    # Windowed-solver wide-row capacity (solver/solve.py SolveConfig.wide_cap_rows);
    # 0 = auto (bank/8). Derived from measured demand by Simulation.autosize.
    wide_cap_rows: int = 0

    def store_layout(self):
        """(capacity, page) for the pair store — capacity = max_pairs rounded to pages."""
        page = self.store_page
        if page == 0:
            page = 512 if self.max_pairs >= 8192 else (128 if self.max_pairs >= 1024 else 32)
        cap = -(-self.max_pairs // page) * page
        return cap, page

    def store_caps(self):
        cap, _ = self.store_layout()
        churn = self.store_churn or max(128, cap // 8)
        dead = self.store_dead or max(128, cap // 8)
        repair = self.store_repair or max(64, cap // 16)
        return churn, dead, repair

    def solve_config(self) -> SolveConfig:
        return SolveConfig(
            substeps=self.substeps,
            velocity_iterations=self.velocity_iterations,
            num_colors=self.num_colors,
            color_cap_factor=self.color_cap_factor,
            jacobi_cap_factor=self.jacobi_cap_factor,
            color_rounds=self.color_rounds,
            backend=self.solver_backend,
            wide_cap_rows=self.wide_cap_rows,
        )


class SimState(NamedTuple):
    """Full device-side simulation state (a pytree; checkpointable wholesale)."""

    bodies: BodyState
    cache: PairCache  # convex body-pair contact records
    ccache: PairCache  # compound/mesh child contact records
    joint_impulses: dict
    # Per-joint persisted solver colors (reference: constraints keep their
    # ConstraintBatch across frames; see solver/coloring.py). -1 = unassigned.
    joint_colors: dict
    # Sleeping-pair retention banks (reference PairCache_Activity: sleeping islands keep
    # their contact records, so wakes warm-start instead of re-settling).
    sleep_cache: PairCache
    sleep_ccache: PairCache
    # Persistent slot-stable pair store (collision/pairstore.py) — the convex contact
    # world when config.use_pair_store. None only in legacy configs.
    store: object = None


class StepDiagnostics(NamedTuple):
    pair_count: jnp.ndarray
    contact_count: jnp.ndarray
    overflow: jnp.ndarray
    # Which capacity tripped (bitmask): 1=broad phase, 2=solver buckets, 4=pair store,
    # 8=compound children, 16=sleep retention, 32=compound sleep retention. Lets a
    # sizing pass (bench.py, tests) report WHAT to grow instead of a bare bool.
    overflow_src: jnp.ndarray = 0
    # (12,) int32 TRUE demand counters (pre-clamp) — the measured inputs of
    # demand-driven capacity derivation (Simulation.autosize; the reference sizes
    # everything from live counts, SimulationAllocationSizes.cs):
    # [0 broad-phase candidate pairs, 1 grid entries, 2 grid large set,
    #  3 store admissions this frame, 4 store live rows, 5 solver Jacobi rows,
    #  6 windowed wide rows, 7 store retirements, 8 max per-row candidates,
    #  9 grid cell-window overflow flag, 10 grid per-row-k overflow flag,
    #  11 reserved].
    demand: jnp.ndarray = None


# Named indices into StepDiagnostics.demand.
(D_PAIRS, D_ENTRIES, D_LARGE, D_ADMIT, D_LIVE, D_JACOBI, D_WIDE, D_DEAD,
 D_MAXROW, D_WINHIT, D_ROWKHIT, _D_RSVD) = range(12)
DEMAND_LEN = 12


# Donate the SimState buffers into step()/step_n(): the previous state is dead after the
# call, so XLA reuses its HBM in place (halves steady-state memory for the state and
# removes a full state copy of HBM traffic per step). Opt out with BEPUPHYSICS2_TPU_DONATE=0.
_DONATE = ("state",) if os.environ.get("BEPUPHYSICS2_TPU_DONATE", "1") == "1" else ()


def _dedupe_donated(state):
    """Return ``state`` with any buffer-aliased leaves copied apart.

    Donation requires every leaf of the donated pytree to own a distinct buffer; XLA's CSE
    can legally return one buffer for two identical outputs (and user code could alias
    leaves), which would make the *next* donated call fail with "donate the same buffer
    twice". Scanning ~50 leaf pointers per step is free compared to the step itself.
    """
    if not _DONATE:
        return state
    leaves, treedef = jax.tree_util.tree_flatten(state)
    seen = set()
    changed = False
    for i, leaf in enumerate(leaves):
        try:
            key = leaf.unsafe_buffer_pointer()
        except Exception:  # sharded / committed-elsewhere arrays: pointer unavailable
            key = id(leaf)
        if key in seen:
            leaves[i] = jnp.asarray(leaf).copy()
            changed = True
        else:
            seen.add(key)
    return jax.tree_util.tree_unflatten(treedef, leaves) if changed else state


def _step_impl(state: SimState, shapes, joint_banks, dt, config: SimConfig, present_types=None):
    """One full timestep. Pure function: (state, shapes, joints, dt) → (state', diagnostics).

    Public ``step`` (below) never donates — callers may keep using their input state.
    ``Simulation.timestep``/``run`` go through the donating wrappers instead, where the
    previous state is provably dead, so XLA reuses its buffers in place."""
    bodies = state.bodies

    # --- Predict bounding boxes (speculative AABBs).
    aabb_min, aabb_max = compute_body_bounds(
        bodies.pos, bodies.orn, bodies.vel, bodies.omega, bodies.shape, shapes, dt,
        spec_min=bodies.spec_margin_min,
    )
    # Bodies without collidables never overlap.
    has_shape = bodies.shape >= 0
    big = jnp.float32(3.0e38)
    aabb_min = aabb_min.where(has_shape, Vec3.full(has_shape.shape, big, big, big))
    aabb_max = aabb_max.where(has_shape, Vec3.full(has_shape.shape, -big, -big, -big))

    # --- Broad phase.
    method = config.broadphase
    if method == "auto":
        # With top_k row compaction the exact N² mask is the fastest structure on TPU up
        # to several thousand bodies (measured 62ms/step full pipeline at 4k incl. solve);
        # past that the sorted grid bounds memory at O(N·stencil) and stays pair-exact
        # (size grid_cell_size ≥ the largest velocity-expanded AABB extent).
        method = "brute" if config.body_capacity <= 8192 else "grid2"
    if method == "brute":
        pairs = bp.brute_force(
            aabb_min, aabb_max, bodies.kind, bodies.awake, bodies.collision_group,
            config.max_pairs,
        )
    elif method == "grid2":
        pairs = bp.grid2(
            aabb_min, aabb_max, bodies.kind, bodies.awake, bodies.collision_group,
            config.max_pairs,
            config.grid_cell_size, config.grid_cell_capacity, config.grid_max_large,
            config.grid_entry_factor, config.grid_cell_factor, config.grid_pair_k,
        )
    elif method == "grid":
        pairs = bp.grid(
            aabb_min, aabb_max, bodies.kind, bodies.awake, bodies.collision_group,
            config.max_pairs,
            config.grid_cell_size, config.grid_cell_capacity, config.grid_max_large,
        )
    else:
        pairs = bp.sweep(
            aabb_min, aabb_max, bodies.kind, bodies.awake, bodies.collision_group,
            config.max_pairs, config.sweep_window,
        )

    # --- Narrow phase. Default: persistent slot-stable pair store (incremental
    # membership + in-place manifolds + row-local warm-start carry — the reference's
    # PairCache/TypeBatch incrementality, collision/pairstore.py). Legacy path: per-frame
    # candidate records with a sorted-join carry against last frame's cache.
    use_store = config.use_pair_store
    store = state.store
    sovfl = jnp.bool_(False)
    if use_store:
        from .collision import pairstore
        from .collision.narrowphase import narrow_phase_store
        from .shapes.registry import CONVEX_HULL as _HULL
        from .shapes.custom import CUSTOM_SUPPORTS as _CUSTOM

        # Candidate insertability: only convex-capable pairs live in the store;
        # compound/mesh-endpoint pairs flow to the child-expansion path below.
        sa_ = jnp.maximum(bodies.shape[pairs.a], 0)
        sb_ = jnp.maximum(bodies.shape[pairs.b], 0)
        ta_ = jnp.where(bodies.shape[pairs.a] >= 0, shapes.type[sa_], -1)
        tb_ = jnp.where(bodies.shape[pairs.b] >= 0, shapes.type[sb_], -1)

        def _convex_t(t):
            m = (t >= 0) & (t <= _HULL)
            for tid in _CUSTOM:
                m = m | (t == tid)
            return m

        insertable = _convex_t(ta_) & _convex_t(tb_)

        # Color claims held by the other banks (joints + compound child records): the
        # store must not admit a pair into a (body, color) slot one of them holds.
        nb_cap = config.body_capacity
        ext_used = jnp.zeros(nb_cap + 1, jnp.int32)
        for name in joint_banks:
            bank = joint_banks[name]
            ext_used = ext_used | pairstore.store_claims(
                bank["bodies"], state.joint_colors[name], bank["valid"],
                nb_cap, config.num_colors,
            )
        ext_used = ext_used | pairstore.store_claims(
            jnp.stack([state.ccache.body_a, state.ccache.body_b], -1),
            state.ccache.color, state.ccache.valid, nb_cap, config.num_colors,
        )

        churn_cap, dead_cap, repair_cap = config.store_caps()
        store, sovfl, store_demand, active = pairstore.update(
            store, bodies.kind, bodies.awake, bodies.collision_group,
            aabb_min, aabb_max, pairs.a, pairs.b, pairs.valid, insertable,
            config.num_colors, ext_used, churn_cap, dead_cap, repair_cap,
        )
        prestep, imp, t_eval = narrow_phase_store(
            bodies, shapes, store, active, dt, present_types=present_types,
            max_ccd=config.max_ccd_pairs,
        )
        # t_eval above is STORE-SLOT aligned; the compound expansion consumes the
        # broad-phase candidate list, so its CCD times come from a candidate pass.
        if config.max_ccd_pairs > 0:
            from .collision.narrowphase import ccd_eval_times

            t_eval = ccd_eval_times(
                bodies, shapes, pairs.a, pairs.b, pairs.valid, dt,
                config.max_ccd_pairs,
            )
        pcolor = None
    else:
        store_demand = jnp.zeros(3, jnp.int32)
        prestep, imp, pcolor, t_eval = narrow_phase(
            bodies, shapes, pairs, state.cache, dt, present_types=present_types,
            max_ccd=config.max_ccd_pairs, pairs_sorted=(method == "brute"),
            sleep_bank=state.sleep_cache if config.enable_sleep else None,
        )
    from .shapes.registry import COMPOUND as _COMPOUND, MESH as _MESH

    has_compounds = present_types is None or (
        _COMPOUND in present_types or _MESH in present_types
    )
    if has_compounds:
        cprestep, cimp, cpcolor, ckey, covfl = narrow_phase_compound(
            bodies, shapes, pairs, state.ccache, dt,
            config.max_compound_pairs, config.children_per_pair, config.child_window,
            present_types=present_types,
            max_cc_pairs=config.max_cc_pairs,
            cc_children_per_side=config.cc_children_per_side,
            sleep_bank=state.sleep_ccache if config.enable_sleep else None,
            pair_t=t_eval,
        )

    # --- Wake sleeping bodies touched by awake dynamics (whole stored islands).
    if config.enable_sleep:
        bodies = wake_touched(bodies, prestep)
        if has_compounds:
            bodies = wake_touched(bodies, cprestep)

    # --- Solve (substepped TGS; includes all pose/velocity integration).
    banks = {
        name: dict(
            joint_banks[name],
            impulse=state.joint_impulses[name],
            color=state.joint_colors[name],
        )
        for name in joint_banks
    }
    if use_store:
        # Raw slot-order store bank; the solver owns the execution layout (page-exec
        # trees for the general paths, ONE packed move for the windowed fast path —
        # solver/solve.py _solve_store_win_fast). Impulses come back in slot order.
        store_bank = dict(store=store, ps=prestep, imp=imp, active=active)
        base_used = store.used
        contact_banks = []
    else:
        store_bank = None
        base_used = None
        contact_banks = [(prestep, imp, pcolor)]
    if has_compounds:
        contact_banks.append((cprestep, cimp, cpcolor))
    bodies, imps, joint_imps, solver_overflow, ccolors, jcolors, solver_demand = solve_all(
        bodies, contact_banks, banks, config.integrator, config.solve_config(), dt,
        store_bank=store_bank, base_used=base_used,
    )
    if use_store:
        # Impulses return in SLOT order; persist in place (next frame's warm start
        # is row-local).
        imp_slot = imps[0]
        sleeping_row = store.live & ~active
        # Solver output persists only for rows that SOLVED this frame; sleeping rows
        # keep their banked impulses in place (they solved as invalid → zeros).
        store = store._replace(
            imp_pen=jnp.where(active[:, None], imp_slot.penetration, store.imp_pen),
            imp_tx=jnp.where(active, imp_slot.tangent.x, store.imp_tx),
            imp_ty=jnp.where(active, imp_slot.tangent.y, store.imp_ty),
            imp_tw=jnp.where(active, imp_slot.twist, store.imp_tw),
            # Features persist for active rows with contacts; sleeping rows keep their
            # pre-sleep features (wake warm start); contact-less rows reset (no carry
            # across a contact gap — matches the legacy join semantics).
            feature=jnp.where(
                prestep.valid[:, None],
                prestep.feature,
                jnp.where(sleeping_row[:, None], store.feature, -1),
            ),
            active_prev=jnp.where(active, prestep.valid, store.active_prev),
        )
        imp = imp_slot
    else:
        imp = imps[0]

    # --- Island sleeping (velocity/timer candidacy + whole-island decision).
    if config.enable_sleep:
        sleep_presteps = [prestep] + ([cprestep] if has_compounds else [])
        bodies = update_sleep(bodies, sleep_presteps, banks, dt, config.sleep_time)

    # --- Persist warm-start data (impulses + solver colors).
    def _src(flag, bit):
        return jnp.where(flag, jnp.int32(bit), jnp.int32(0))

    ovfl_src = _src(pairs.overflow, 1) | _src(solver_overflow, 2)
    if use_store:
        cache = state.cache  # unused by the store path
        overflow = pairs.overflow | solver_overflow | sovfl
        ovfl_src = ovfl_src | _src(sovfl, 4)
    else:
        cache = update_cache(
            prestep, imp, config.body_capacity, ccolors[0], slot_live=pairs.valid
        )
        overflow = pairs.overflow | solver_overflow
    contact_count = jnp.sum(prestep.contact_mask & prestep.valid[:, None])
    if has_compounds:
        cidx = 1 if not use_store else len(imps) - 1
        ccache = update_cache_keyed(cprestep, imps[cidx], ckey, ccolors[0 if use_store else 1])
        overflow = overflow | covfl
        ovfl_src = ovfl_src | _src(covfl, 8)
        contact_count = contact_count + jnp.sum(
            cprestep.contact_mask & cprestep.valid[:, None]
        )
    else:
        ccache = state.ccache

    # --- Sleeping-pair retention (reference PairCache_Activity): records of pairs whose
    # bodies slept this step migrate into the sleep banks; woken pairs were re-matched
    # into the active caches above and leave the banks.
    sleep_cache, sleep_ccache = state.sleep_cache, state.sleep_ccache
    if config.enable_sleep:
        from .collision.narrowphase import retain_sleeping

        # The bank merge (sort + join over the cache) only matters when something is
        # actually asleep or the bank holds rows — fully-awake scenes skip it behind a
        # runtime cond (reference PairCache_Activity only runs on sleep/wake events).
        sleep_active = jnp.any((bodies.kind == KIND_DYNAMIC) & ~bodies.awake) | jnp.any(
            state.sleep_cache.valid
        )
        if not use_store:  # the store retains sleeping pairs in place
            sleep_cache, rovfl = jax.lax.cond(
                sleep_active,
                lambda _: retain_sleeping(
                    state.sleep_cache, cache, bodies.kind, bodies.awake,
                    config.body_capacity,
                ),
                lambda _: (state.sleep_cache, jnp.bool_(False)),
                None,
            )
            overflow = overflow | rovfl
            ovfl_src = ovfl_src | _src(rovfl, 16)
        if has_compounds:
            sub_cap = config.children_per_pair + (
                config.cc_children_per_side ** 2 if config.max_cc_pairs > 0 else 0
            )
            csleep_active = jnp.any((bodies.kind == KIND_DYNAMIC) & ~bodies.awake) | jnp.any(
                state.sleep_ccache.valid
            )
            sleep_ccache, scovfl = jax.lax.cond(
                csleep_active,
                lambda _: retain_sleeping(
                    state.sleep_ccache, ccache, bodies.kind, bodies.awake,
                    config.body_capacity, sub_cap=sub_cap,
                ),
                lambda _: (state.sleep_ccache, jnp.bool_(False)),
                None,
            )
            overflow = overflow | scovfl
            ovfl_src = ovfl_src | _src(scovfl, 32)

    bp_demand = (
        pairs.demand
        if pairs.demand is not None
        else jnp.zeros(6, jnp.int32)
    )
    diag = StepDiagnostics(
        pair_count=jnp.sum(store.live) if use_store else jnp.sum(pairs.valid),
        contact_count=contact_count,
        overflow=overflow,
        overflow_src=ovfl_src,
        demand=jnp.concatenate([
            bp_demand[:3],  # 0-2: candidate pairs, grid entries, grid large
            store_demand[0:1],  # 3: store admissions
            store_demand[2:3],  # 4: store live rows
            solver_demand,  # 5-6: jacobi rows, windowed wide rows
            store_demand[1:2],  # 7: store retirements
            bp_demand[3:6],  # 8-10: max per-row, window-overflow, row-k-overflow
            jnp.zeros(1, jnp.int32),  # 11: reserved
        ]),
    )
    return (
        SimState(
            bodies, cache, ccache, joint_imps, jcolors, sleep_cache, sleep_ccache,
            store,
        ),
        diag,
    )


# Public step: value semantics, no donation — safe to keep using the input state.
step = functools.partial(jax.jit, static_argnames=("config", "present_types"))(_step_impl)

# Internal step for Simulation.timestep: donates the (dead) previous state.
_step_donated = functools.partial(
    jax.jit, static_argnames=("config", "present_types"), donate_argnames=_DONATE
)(_step_impl)


@functools.partial(
    jax.jit, static_argnames=("config", "present_types", "n"), donate_argnames=_DONATE
)
def step_n(state: SimState, shapes, joint_banks, dt, config: SimConfig, present_types, n: int):
    """Scan ``n`` timesteps in ONE dispatch. Amortizes per-dispatch latency (important
    when the device sits behind a network tunnel) and lets XLA pipeline across steps.
    Returns (state', diagnostics-of-last-step with sticky overflow)."""

    def body(carry, _):
        st, overflow, src, peak = carry
        st, diag = _step_impl(st, shapes, joint_banks, dt, config, present_types)
        return (
            st, overflow | diag.overflow, src | diag.overflow_src,
            jnp.maximum(peak, diag.demand),
        ), diag

    (state, overflow, src, peak), diags = jax.lax.scan(
        body,
        (state, jnp.bool_(False), jnp.int32(0), jnp.zeros(DEMAND_LEN, jnp.int32)),
        None, length=n,
    )
    last = jax.tree_util.tree_map(lambda x: x[-1], diags)
    # Overflow flags are sticky; demand reports the PEAK over the window (sizing input).
    return state, last._replace(overflow=overflow, overflow_src=src, demand=peak)


class Simulation:
    """Host-side facade (reference Simulation.Create; Simulation.cs:106)."""

    def __init__(self, config: SimConfig = SimConfig()):
        self.config = config
        self.shapes = ShapeRegistry(config.shape_capacity)
        self._host = BodyBuffer(config.body_capacity)
        self.joints: dict = {}  # name -> JointTypeStore
        self._state: Optional[SimState] = None
        self._colors_stale = False
        self._dirty = True
        self.last_diag: Optional[StepDiagnostics] = None
        self._next_collision_group = 1

    def reconfigure(self, **overrides) -> None:
        """Change static configuration in place (reference Simulation.EnsureCapacity /
        Resize, Simulation.cs:332-415). Capacity-bearing device banks (pair caches and
        their sleeping counterparts) are resized with warm-start records preserved; the
        next step recompiles for the new shapes. ``body_capacity`` is NOT resizable here
        — pair-cache keys encode it (pair_key = b·NB + a), so changing it requires a
        fresh simulation.

        Right-sizing pair capacity to live demand is THE first-order cost lever on TPU:
        every fixed-shape stage (coloring, bucket reorder, solver banks, cache joins)
        scales with capacity, not live count."""
        if "body_capacity" in overrides and overrides["body_capacity"] != self.config.body_capacity:
            raise ValueError("body_capacity is not resizable (pair keys encode it)")
        self._sync_from_device()
        self.config = dataclasses.replace(self.config, **overrides)
        cfg = self.config
        cc_cap = (
            cfg.max_compound_pairs * cfg.children_per_pair
            + cfg.max_cc_pairs * cfg.cc_children_per_side ** 2
        )
        if self._state is not None:
            new_store = self._state.store
            if cfg.use_pair_store:
                from .collision.pairstore import PairStore

                store_cap, store_page = cfg.store_layout()
                if (
                    new_store is None
                    or new_store.capacity != store_cap
                    or new_store.page != store_page
                ):
                    if new_store is None:
                        new_store = PairStore.empty(
                            store_cap, cfg.body_capacity, store_page
                        )
                    else:
                        # Capacity change MIGRATES the store host-side, carrying every
                        # live pair's color/features/accumulated impulses (reference
                        # Resize moves its caches). Rebuilding empty instead cost the
                        # whole scene its warm starts at once: a settled colosseum
                        # never fully re-slept across an autosize (measured).
                        from .collision import pairstore as _pairstore

                        new_store = _pairstore.migrate(
                            new_store, store_cap, cfg.body_capacity, store_page,
                            cfg.num_colors, kind=self._host.kind,
                        )
            self._state = self._state._replace(
                cache=self._state.cache.resized(cfg.max_pairs),
                sleep_cache=self._state.sleep_cache.resized(cfg.max_pairs),
                ccache=self._state.ccache.resized(cc_cap),
                sleep_ccache=self._state.sleep_ccache.resized(cc_cap),
                store=new_store,
            )
        self._dirty = True

    def autosize(self, dt: float = 1.0 / 60.0, probe_steps: int = 16,
                 headroom: float = 2.0, max_rounds: int = 3,
                 pairs_headroom: float = None) -> dict:
        """Demand-driven capacity derivation (the reference sizes every structure from
        live counts — SimulationAllocationSizes.cs, Solver TypeBatch growth). Probe-runs
        the scene under the CURRENT config, reads the peak demand counters
        (StepDiagnostics.demand), and reconfigures capacities to measured demand ×
        ``headroom``. Repeats (growing) while any overflow bit is still set — deferred
        work during an under-capacity probe is bounded, never wrong, so probing small is
        safe. Returns {"demand": peak_vector, "overflow": bool, "rounds": n}.

        This replaces per-scene hand tuning of max_pairs / store churn caps / grid
        entry factors / windowed wide capacity; every fixed-shape stage costs capacity,
        not live count, so right-sizing is the first-order cost lever on TPU."""
        import numpy as _np

        d = None
        rounds = 0
        resized_store = False
        for rounds in range(1, max_rounds + 1):
            if resized_store:
                # A max_pairs change rebuilds the store empty; the refill wave
                # (~live/churn frames of mass admissions) would read as absurd churn
                # demand — settle it out before measuring.
                self.run(probe_steps, dt, chunk=probe_steps)
                resized_store = False
            self.run(probe_steps, dt, chunk=probe_steps)
            diag = self.last_diag
            d = _np.asarray(diag.demand)
            src = int(diag.overflow_src)
            n = self.config.body_capacity

            def up(x, mult=256, floor=512):
                want = int(int(x) * headroom)
                return max(floor, ((want + mult - 1) // mult) * mult)

            new = {}
            # Pair world (broad-phase candidates AND store slots share max_pairs).
            # Every fixed-shape stage costs CAPACITY, so the pair bank gets its own
            # (typically tighter) headroom; overflow flags keep under-sizing honest.
            ph = pairs_headroom if pairs_headroom is not None else headroom
            # Page-fragmentation slack: store pages are color-homogeneous, so each
            # color class wastes up to one partial page — demand x headroom alone
            # tripped store overflow at 1.17x live with 16 colors (measured at 4k).
            _pg = 512 if max(d[D_PAIRS], d[D_LIVE]) * ph >= 8192 else 128
            frag = (self.config.num_colors + 1) * _pg
            want_pairs = max(
                1024,
                ((int(max(d[D_PAIRS], d[D_LIVE]) * ph) + frag + 511) // 512) * 512,
            )
            if want_pairs != self.config.max_pairs:
                new["max_pairs"] = want_pairs
            # Store churn caps from measured admissions/retirements/Jacobi rows.
            # Churn is bounded by a quarter of the pair world: the admission pipeline
            # costs churn x pages in its page-allocation tables, and steady-state
            # admissions beyond B/4 per frame only occur in rebuild/refill waves.
            if self.config.use_pair_store:
                bank = new.get("max_pairs", self.config.max_pairs)
                new["store_churn"] = min(up(d[D_ADMIT], 128, 256), max(256, bank // 4))
                new["store_dead"] = min(up(d[D_DEAD], 128, 256), max(256, bank // 4))
                new["store_repair"] = min(
                    up(d[D_JACOBI], 64, 128), max(128, bank // 8)
                )
            # Windowed wide rows (Morton-seam crossings).
            new["wide_cap_rows"] = up(d[D_WIDE], 256, 256)
            # Grid structures (only meaningful when the grid broad phase runs).
            if d[D_ENTRIES] > 0:
                new["grid_entry_factor"] = max(
                    2, -(-int(d[D_ENTRIES] * headroom) // max(n, 1))
                )
            if d[D_LARGE] > 0:
                new["grid_max_large"] = up(d[D_LARGE], 64, 64)
            # Structural grid caps without cheap exact counts grow geometrically on
            # their overflow flags (converges in <= log2 rounds).
            if d[D_WINHIT]:
                new["grid_cell_capacity"] = 2 * self.config.grid_cell_capacity
            if d[D_ROWKHIT]:
                new["grid_pair_k"] = min(
                    2 * self.config.grid_pair_k,
                    new.get("grid_cell_capacity", self.config.grid_cell_capacity),
                )
            # Overflow with no measured headroom to grow into → double the tripped
            # capacity (bit 8 = compound children, not demand-counted).
            if src & 8:
                new["max_compound_pairs"] = 2 * self.config.max_compound_pairs
            changed = {
                k: v for k, v in new.items() if v != getattr(self.config, k)
            }
            if changed:
                self.reconfigure(**changed)
                resized_store = "max_pairs" in changed
            if not int(diag.overflow) or not changed:
                break
        return {"demand": d, "overflow": bool(int(self.last_diag.overflow)),
                "rounds": rounds}

    def new_collision_group(self) -> int:
        """Fresh collision-group id: bodies sharing a nonzero group generate no contacts
        with each other (vehicle/ragdoll self-collision suppression; reference
        INarrowPhaseCallbacks.AllowContactGeneration + demo SubgroupCollisionFilter)."""
        g = self._next_collision_group
        self._next_collision_group += 1
        return g

    # --- shape / body management -------------------------------------------------------
    def add_shape(self, shape) -> int:
        return self.shapes.add(shape)

    def add_body(self, desc: BodyDescription) -> int:
        self._sync_from_device()
        self._dirty = True
        return self._host.add(desc)

    def add_static(self, desc: StaticDescription) -> int:
        self._sync_from_device()
        self._dirty = True
        return self._host.add(desc)

    def remove_body(self, handle: int) -> None:
        self._sync_from_device()
        self._dirty = True
        # The slot may be recycled with a different kind → carried colors invalid.
        self._colors_stale = True
        self._host.remove(handle)

    @property
    def body_count(self) -> int:
        return self._host.count

    # --- constraints -------------------------------------------------------------------
    def add_constraint(self, type_name: str, bodies, **params):
        """Add a joint constraint (reference Solver.Add, Solver.cs:1208). ``bodies`` is a
        body handle or a list of 1-4 handles; ``params`` are the type's description fields
        (see constraints/joints/*). Returns an opaque handle (type_name, slot)."""
        if type_name not in JOINT_TYPES:
            raise KeyError(f"unknown constraint type '{type_name}'")
        self._sync_from_device()
        self._dirty = True
        if type_name not in self.joints:
            self.joints[type_name] = JointTypeStore(
                JOINT_TYPES[type_name], self.config.joint_capacity
            )
        desc = make_description(type_name, **params)
        idx = self.joints[type_name].add(bodies, desc)
        # New constraints wake their bodies (reference Solver.Add awakens islands).
        import numpy as _np

        for h in _np.atleast_1d(bodies):
            if self._host.kind[int(h)] == 1:  # dynamic
                self._host.awake[int(h)] = True
                self._host.sleep_timer[int(h)] = 0.0
        return (type_name, idx)

    def remove_constraint(self, handle) -> None:
        name, idx = handle
        self._sync_from_device()
        self._dirty = True
        self.joints[name].remove(idx)

    def update_constraint(self, handle, **params) -> None:
        name, idx = handle
        self._sync_from_device()
        self._dirty = True
        self.joints[name].update_description(idx, make_description(name, **params))

    def get_constraint(self, handle):
        """Read back a constraint's description + body references + accumulated impulses
        from storage (reference Solver.GetDescription, Solver.cs:1413, and
        EnumerateAccumulatedImpulses, Solver.cs:1535). Returns
        (bodies: list[int], params: dict, impulses: np.ndarray)."""
        import numpy as _np

        from .constraints.joints import ONE_BODY_NAMES as _OB
        from .constraints.joints.base import unpack_fields

        name, idx = handle
        store = self.joints[name]
        if not store.valid[idx]:
            raise KeyError(f"constraint {handle} was removed")
        self._sync_from_device()
        nb = 1 if name in _OB else store.n_bodies
        bodies = [int(b) for b in store.bodies[idx, :nb]]
        params = unpack_fields(store.cls, store.prestep[idx])
        return bodies, params, _np.array(store.impulse[idx])

    @property
    def constraint_count(self) -> int:
        return sum(s.count for s in self.joints.values())

    # --- state access ------------------------------------------------------------------
    def _sync_from_device(self) -> None:
        if self._state is not None and not self._dirty:
            self._host.load(self._state.bodies)
            for name, imps in self._state.joint_impulses.items():
                self.joints[name].load_impulses(imps)
                if name in self._state.joint_colors:
                    self.joints[name].load_colors(self._state.joint_colors[name])
            self._dirty = True  # host is now the source of truth

    def _push(self) -> None:
        cache = self._state.cache if self._state is not None else PairCache.empty(self.config.max_pairs)
        cc_extra = self.config.max_cc_pairs * self.config.cc_children_per_side ** 2
        ccache = (
            self._state.ccache
            if self._state is not None
            else PairCache.empty(
                self.config.max_compound_pairs * self.config.children_per_pair + cc_extra
            )
        )
        joint_imps = {
            name: jnp.asarray(store.impulse)
            for name, store in self.joints.items()
            if store.count > 0
        }
        from .collision.pairstore import PairStore

        store_cap, store_page = self.config.store_layout()
        pstore = self._state.store if self._state is not None else None
        if pstore is None and self.config.use_pair_store:
            pstore = PairStore.empty(store_cap, self.config.body_capacity, store_page)
        stale = self._colors_stale
        if stale:
            # A body's dynamic/kinematic kind changed (or a slot was recycled): the
            # carried-color conflict structure is invalid — forget all persisted colors;
            # constraints re-propose over the next frames (Jacobi-solved meanwhile).
            # The pair store resets wholesale: its colors, claims, and hash all key off
            # body slots (one settle-frame of warm-start loss; correctness preserved).
            cache = cache._replace(color=jnp.full_like(cache.color, -1))
            ccache = ccache._replace(color=jnp.full_like(ccache.color, -1))
            if self.config.use_pair_store:
                pstore = PairStore.empty(
                    store_cap, self.config.body_capacity, store_page
                )
            for store in self.joints.values():
                store.color[:] = -1
            self._colors_stale = False
        joint_colors = {
            name: jnp.asarray(store.color)
            for name, store in self.joints.items()
            if store.count > 0
        }
        sleep_cache = (
            self._state.sleep_cache
            if self._state is not None and not stale
            else PairCache.empty(self.config.max_pairs)
        )
        sleep_ccache = (
            self._state.sleep_ccache
            if self._state is not None and not stale
            else PairCache.empty(
                self.config.max_compound_pairs * self.config.children_per_pair + cc_extra
            )
        )
        self._state = SimState(
            self._host.device(), cache, ccache, joint_imps, joint_colors,
            sleep_cache, sleep_ccache, pstore,
        )
        self._dirty = False

    @property
    def state(self) -> SimState:
        if self._dirty:
            self._push()
        return self._state

    def get_body(self, handle: int):
        """Host view of one body: (position, orientation, velocity, angular velocity)."""
        self._sync_from_device()
        h = self._host
        return (
            np.array([h.px[handle], h.py[handle], h.pz[handle]]),
            np.array([h.qx[handle], h.qy[handle], h.qz[handle], h.qw[handle]]),
            np.array([h.vx[handle], h.vy[handle], h.vz[handle]]),
            np.array([h.wx[handle], h.wy[handle], h.wz[handle]]),
        )

    def set_pose(self, handle: int, position=None, orientation=None) -> None:
        """Teleport a body (reference BodyReference.Pose set; wakes it)."""
        self._sync_from_device()
        self._dirty = True
        if position is not None:
            self._host.px[handle], self._host.py[handle], self._host.pz[handle] = position
        if orientation is not None:
            (self._host.qx[handle], self._host.qy[handle], self._host.qz[handle],
             self._host.qw[handle]) = orientation
        if self._host.kind[handle] == 1:
            self._host.awake[handle] = True
            self._host.sleep_timer[handle] = 0.0

    def set_local_inertia(self, handle: int, inv_mass: float, inv_inertia) -> None:
        """Update a body's inverse mass/inertia (reference BodyReference.SetLocalInertia;
        zero inverse mass+inertia makes the body kinematic-behaving). Wakes the body."""
        self._sync_from_device()
        self._dirty = True
        h = self._host
        h.inv_mass[handle] = inv_mass
        (h.ixx[handle], h.iyx[handle], h.iyy[handle],
         h.izx[handle], h.izy[handle], h.izz[handle]) = inv_inertia
        if h.kind[handle] == 1:
            h.awake[handle] = True
            h.sleep_timer[handle] = 0.0

    def set_body_kind(self, handle: int, kind: int) -> None:
        """Kinematic ↔ dynamic transition (reference Bodies.SetShape/BecomeKinematic
        pathways, Bodies.cs:504). Becoming kinematic zeroes the inverse inertia; becoming
        dynamic requires a following set_local_inertia."""
        from .bodies import KIND_DYNAMIC, KIND_KINEMATIC

        if kind not in (KIND_DYNAMIC, KIND_KINEMATIC):
            raise ValueError("set_body_kind supports dynamic/kinematic only")
        self._sync_from_device()
        self._dirty = True
        self._colors_stale = True  # kind flips conflict structure; drop carried colors
        h = self._host
        h.kind[handle] = kind
        if kind == KIND_KINEMATIC:
            h.inv_mass[handle] = 0.0
            h.ixx[handle] = h.iyx[handle] = h.iyy[handle] = 0.0
            h.izx[handle] = h.izy[handle] = h.izz[handle] = 0.0
        h.awake[handle] = True
        h.sleep_timer[handle] = 0.0

    def wake_body(self, handle: int) -> None:
        """Explicit user wake (reference Bodies.Awaken)."""
        self._sync_from_device()
        self._dirty = True
        if self._host.kind[handle] == 1:
            self._host.awake[handle] = True
            self._host.sleep_timer[handle] = 0.0

    def set_velocity(self, handle: int, linear=None, angular=None) -> None:
        self._sync_from_device()
        self._dirty = True
        if self._host.kind[handle] == 1:
            self._host.awake[handle] = True
            self._host.sleep_timer[handle] = 0.0
        if linear is not None:
            self._host.vx[handle], self._host.vy[handle], self._host.vz[handle] = linear
        if angular is not None:
            self._host.wx[handle], self._host.wy[handle], self._host.wz[handle] = angular

    # --- queries -----------------------------------------------------------------------
    def ray_cast(self, origin, direction, max_t: float = 1.0e30, exclude: int = None,
                 prune_k: int = 0):
        """Scene ray cast (reference Simulation.RayCast, Simulation_Queries.cs:167).
        ``origin``/``direction``: 3-tuples or (R,3) arrays for batched rays.
        ``exclude``: body handle to skip (self-cast filter; reference
        IRayHitHandler.AllowTest). ``prune_k``: batched rays only — test only the K
        bounding-sphere candidates with the earliest conservative entry along each ray
        instead of all N bodies (the BVH-descent analogue, Trees/Tree_RayCast.cs:137;
        exact unless >K candidates precede the true hit). 0 = exact full pass.
        Returns RayHit(hit, t, body, normal, saturated); in prune_k mode
        ``saturated[r]`` flags rays whose K-budget filled with candidates entering
        before the returned t — such results MAY not be the true closest hit; re-cast
        those rays with prune_k=0 (or larger K) when exactness matters."""
        import numpy as _np

        if self._dirty:
            self._push()
        o = _np.asarray(origin, _np.float32)
        d = _np.asarray(direction, _np.float32)
        if o.ndim == 1:
            ov = Vec3(jnp.float32(o[0]), jnp.float32(o[1]), jnp.float32(o[2]))
            dv = Vec3(jnp.float32(d[0]), jnp.float32(d[1]), jnp.float32(d[2]))
        else:
            ov = Vec3(jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2]))
            dv = Vec3(jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2]))
        # Compound/mesh collidables need the child-pool pass (window sized to the
        # largest registered child count, rounded up for jit reuse).
        import numpy as _np2

        max_children = int(_np2.max(self.shapes.child_count)) if hasattr(
            self.shapes, "child_count"
        ) else 0
        # Window = the largest registered child count (pow2-rounded for jit reuse).
        # Capping at config.child_window would silently skip triangles of larger meshes —
        # queries must be exact (config.child_window only budgets the contact pipeline's
        # cluster-accelerated candidate pick, collision/compound.py).
        cw = 0 if max_children == 0 else 1 << (max_children - 1).bit_length()
        return ray_cast_all(
            self._state.bodies, self.shapes.device(), ov, dv, jnp.float32(max_t),
            exclude=None if exclude is None else jnp.int32(exclude),
            children_window=cw, prune_k=prune_k,
        )

    def state_hash(self) -> int:
        """Deterministic hash of the full device state (reference
        InvasiveHashDiagnostics.cs:10 — cross-run divergence bisection)."""
        import hashlib

        import numpy as _np

        if self._dirty:
            self._push()
        h = hashlib.sha256()
        for leaf in jax.tree_util.tree_leaves(self._state):
            h.update(_np.asarray(leaf).tobytes())
        return int.from_bytes(h.digest()[:8], "little")

    def save_checkpoint(self) -> bytes:
        """Serialize full device state (incl. accumulated impulses for warm-start
        preservation; reference parity: Solver.GetDescription/EnumerateAccumulatedImpulses)."""
        from .checkpoint import state_to_bytes

        if self._dirty:
            self._push()
        return state_to_bytes(self._state)

    def load_checkpoint(self, data: bytes) -> None:
        from .checkpoint import state_from_bytes

        if self._dirty:
            self._push()
        self._state = state_from_bytes(self._state, data)
        self._dirty = False
        self._host.load(self._state.bodies)

    def box_query(self, box_min, box_max):
        """All bodies whose AABB overlaps the query box (reference Tree_VolumeQuery /
        BroadPhase volume queries) — one fused device pass over exact per-shape AABBs.
        Returns a list of handles."""
        import numpy as _np

        if self._dirty:
            self._push()
        b = self._state.bodies
        lo = _np.asarray(box_min, _np.float32)
        hi = _np.asarray(box_max, _np.float32)

        @jax.jit
        def overlaps(bodies, shapes, lo, hi):
            amin, amax = compute_body_bounds(
                bodies.pos, bodies.orn, bodies.vel, bodies.omega, bodies.shape, shapes,
                jnp.float32(0.0),
            )
            ok = (
                bodies.exists & (bodies.shape >= 0)
                & (amax.x >= lo[0]) & (amin.x <= hi[0])
                & (amax.y >= lo[1]) & (amin.y <= hi[1])
                & (amax.z >= lo[2]) & (amin.z <= hi[2])
            )
            return ok

        ok = _np.asarray(overlaps(b, self.shapes.device(), jnp.asarray(lo), jnp.asarray(hi)))
        return _np.nonzero(ok)[0].tolist()

    def contacts(self):
        """Current contact records (reference ContactEventsDemo capability): list of
        dicts with bodies, normal, depths for every live contact after the last step."""
        import numpy as _np

        if self._state is None:
            return []
        out = []
        if self.config.use_pair_store and self._state.store is not None:
            st = self._state.store
            valid = _np.asarray(st.live & st.active_prev)
            a = _np.asarray(st.body_a)
            b = _np.asarray(st.body_b)
            pen = _np.asarray(st.imp_pen)
            for i in _np.nonzero(valid)[0]:
                out.append(
                    dict(body_a=int(a[i]), body_b=int(b[i]), impulses=pen[i].tolist())
                )
        else:
            for cache_ps in [self._state.cache]:
                valid = _np.asarray(cache_ps.valid)
                keys = _np.asarray(cache_ps.key)
                pen = _np.asarray(cache_ps.penetration)
                nb = self.config.body_capacity
                for i in _np.nonzero(valid)[0]:
                    # b-major keys (collision/narrowphase.py pair_key): key = b*nb + a.
                    out.append(
                        dict(
                            body_a=int(keys[i]) % nb,
                            body_b=int(keys[i]) // nb,
                            impulses=pen[i].tolist(),
                        )
                    )
        return out

    def live_contact_pairs(self) -> set:
        """Set of (body_a, body_b) pairs with live contact records after the last step."""
        import numpy as _np

        cur = set()
        if self._state is None:
            return cur
        nb = self.config.body_capacity
        if self.config.use_pair_store and self._state.store is not None:
            st = self._state.store
            valid = _np.asarray(st.live & st.active_prev)
            aa = _np.asarray(st.body_a)
            bb = _np.asarray(st.body_b)
            for i in _np.nonzero(valid)[0]:
                cur.add((int(aa[i]), int(bb[i])))
        else:
            # b-major keys (collision/narrowphase.py pair_key): key = b * nb + a.
            valid = _np.asarray(self._state.cache.valid)
            keys = _np.asarray(self._state.cache.key)
            for k in keys[valid]:
                cur.add((int(k) % nb, int(k) // nb))
        cvalid = _np.asarray(self._state.ccache.valid)
        ckeys = _np.asarray(self._state.ccache.key)
        sub_cap = self.config.children_per_pair + (
            self.config.cc_children_per_side ** 2 if self.config.max_cc_pairs > 0 else 0
        )
        for k in ckeys[cvalid]:
            pk = int(k) // sub_cap
            cur.add((pk % nb, pk // nb))
        return cur

    def contact_events(self):
        """Contact begin/persist/end events since the previous call (the reference's
        ContactEventsDemo capability, built on persistent pair tracking): returns a dict
        {'began': set, 'persisted': set, 'ended': set} of (body_a, body_b) pairs.

        Pairs whose bodies fell asleep keep their contacts alive (the reference moves
        sleeping pairs into inactive PairCache sets rather than ending them,
        PairCache_Activity.cs) — a sleeping stack does not emit 'ended' events."""
        import numpy as _np

        cur = self.live_contact_pairs()
        prev = getattr(self, "_prev_contact_pairs", set())
        # Retain pairs frozen by sleeping: ended only if some endpoint is awake/gone.
        self._sync_from_device()
        h = self._host
        for p in prev - cur:
            a, b = p
            live = h.kind[a] != 0 and h.kind[b] != 0
            asleep_a = (h.kind[a] != 1) or not h.awake[a]
            asleep_b = (h.kind[b] != 1) or not h.awake[b]
            if live and asleep_a and asleep_b:
                cur.add(p)
        self._prev_contact_pairs = cur
        return {
            "began": cur - prev,
            "persisted": cur & prev,
            "ended": prev - cur,
        }

    def _sweep_child_targets(self):
        """Host-enumerated (owner, child-row) targets for every compound/mesh body —
        sweeps test children exactly (collision/sweeps.py unified targets). Padded to
        pow2 (-1 owners) for jit reuse; (0,) arrays when no compounds exist."""
        import numpy as _np

        from .shapes.registry import BIG_COMPOUND as _BC, COMPOUND as _CO, MESH as _ME

        self._sync_from_device()
        owners, rows = [], []
        for b in range(self.config.body_capacity):
            s = int(self._host.shape[b])
            if s < 0 or self._host.kind[b] == 0:
                continue
            t = int(self.shapes.types[s])
            if t in (_CO, _ME, _BC):
                st = int(self.shapes.child_start[s])
                c = int(self.shapes.child_count[s])
                owners.extend([b] * c)
                rows.extend(range(st, st + c))
        if not owners:
            return jnp.zeros((0,), jnp.int32), jnp.zeros((0,), jnp.int32)
        k = len(owners)
        kp = 1 << (k - 1).bit_length()
        owners.extend([-1] * (kp - k))
        rows.extend([0] * (kp - k))
        return (
            jnp.asarray(_np.asarray(owners, _np.int32)),
            jnp.asarray(_np.asarray(rows, _np.int32)),
        )

    def sweep_shape(self, shape_obj, position, velocity, max_t: float = 10.0,
                    orientation=(0, 0, 0, 1), angular_velocity=(0, 0, 0),
                    prune_k: int = 0):
        """Narrow shape sweep to time-of-impact via conservative advancement including
        angular velocity (reference Simulation.Sweep, Simulation_Queries.cs:267 +
        ConvexSweepTaskCommon.cs). Returns SweepHit(hit, t, body)."""
        import numpy as _np

        from .collision.sweeps import sweep_shape_all
        from .utils.vec import Quat as _Q, Vec3 as _V

        if self._dirty:
            self._push()
        type_id, packed = shape_obj.pack()
        params = _np.zeros(12, _np.float32)
        params[: len(packed)] = packed
        # Hull shapes must be registered to have pooled points; find a matching row.
        row = -1
        for r, s in enumerate(self.shapes.shapes):
            if s is shape_obj:
                row = r
                break
        v3 = lambda t: _V(jnp.float32(t[0]), jnp.float32(t[1]), jnp.float32(t[2]))
        q = _Q(*(jnp.float32(c) for c in orientation))
        co, crw = self._sweep_child_targets()
        return sweep_shape_all(
            self._state.bodies, self.shapes.device(), type_id, jnp.asarray(params),
            jnp.int32(row), v3(position), q, v3(velocity), v3(angular_velocity),
            jnp.float32(shape_obj.maximum_radius()), jnp.float32(max_t),
            child_owner=co, child_rows=crw, prune_k=prune_k,
        )

    def sweep_shape_batch(self, shape_obj, positions, velocities, max_t: float = 10.0,
                          orientations=None, angular_velocities=None,
                          prune_k: int = 0):
        """Batched exact sweeps: R shape casts against the whole scene in ONE fused
        dispatch (the reference's ray BATCHING idea applied to sweeps —
        Trees/RayBatcher.cs:125 collects queries and traverses once; here vmap fuses all
        sweeps into a single conservative-advancement program). Arguments are (R, 3)
        position/velocity arrays (+ optional (R, 4)/(R, 3) orientation/angular arrays);
        returns SweepHit with (R,) leaves. ``prune_k``: test only the K
        bounding-sphere candidates with the earliest conservative entry per sweep
        (the raycast prune applied to sweeps — Trees/RayBatcher.cs:125 analogue);
        0 = exact full pass; SweepHit.saturated flags possibly-inexact sweeps."""
        import numpy as _np

        from .collision.sweeps import sweep_shape_all
        from .utils.vec import Quat as _Q, Vec3 as _V

        if self._dirty:
            self._push()
        type_id, packed = shape_obj.pack()
        params = _np.zeros(12, _np.float32)
        params[: len(packed)] = packed
        row = -1
        for r, s in enumerate(self.shapes.shapes):
            if s is shape_obj:
                row = r
                break
        P = _np.asarray(positions, _np.float32)
        V = _np.asarray(velocities, _np.float32)
        R = P.shape[0]
        O = (
            _np.asarray(orientations, _np.float32)
            if orientations is not None
            else _np.tile(_np.array([0, 0, 0, 1], _np.float32), (R, 1))
        )
        W = (
            _np.asarray(angular_velocities, _np.float32)
            if angular_velocities is not None
            else _np.zeros((R, 3), _np.float32)
        )
        bodies = self._state.bodies
        shapes_d = self.shapes.device()
        co, crw = self._sweep_child_targets()

        def one(p, q, v, w):
            return sweep_shape_all(
                bodies, shapes_d, type_id, jnp.asarray(params), jnp.int32(row),
                p, q, v, w,
                jnp.float32(shape_obj.maximum_radius()), jnp.float32(max_t),
                child_owner=co, child_rows=crw, prune_k=prune_k,
            )

        return jax.vmap(one)(
            _V(jnp.asarray(P[:, 0]), jnp.asarray(P[:, 1]), jnp.asarray(P[:, 2])),
            _Q(jnp.asarray(O[:, 0]), jnp.asarray(O[:, 1]), jnp.asarray(O[:, 2]),
               jnp.asarray(O[:, 3])),
            _V(jnp.asarray(V[:, 0]), jnp.asarray(V[:, 1]), jnp.asarray(V[:, 2])),
            _V(jnp.asarray(W[:, 0]), jnp.asarray(W[:, 1]), jnp.asarray(W[:, 2])),
        )

    def sweep(self, shape_obj, position, direction, max_t: float = 100.0, samples: int = 64):
        """Coarse bounding-sphere sweep (fast path; use ``sweep_shape`` for exact TOI).
        Returns (hit, t, body)."""
        import numpy as _np

        if self._dirty:
            self._push()
        self._sync_from_device()
        pos = _np.asarray(position, _np.float64)
        d = _np.asarray(direction, _np.float64)
        d = d / max(_np.linalg.norm(d), 1e-12)
        r = shape_obj.maximum_radius()
        h = self._host
        exists = (h.kind != 0) & (h.shape >= 0)
        centers = _np.stack([h.px, h.py, h.pz], -1)
        radii = _np.array([
            self.shapes.max_radius[h.shape[i]] if h.shape[i] >= 0 else 0.0
            for i in range(len(h.shape))
        ])
        best_t, best_b = float("inf"), -1
        for i in _np.nonzero(exists)[0]:
            rel = centers[i] - pos
            proj = float(rel @ d)
            perp2 = float(rel @ rel) - proj * proj
            rr = (r + radii[i]) ** 2
            if perp2 > rr:
                continue
            dt_ = _np.sqrt(max(rr - perp2, 0.0))
            t_hit = proj - dt_
            if 0.0 <= t_hit <= max_t and t_hit < best_t:
                best_t, best_b = t_hit, int(i)
        return (best_b >= 0, best_t if best_b >= 0 else max_t, best_b)

    # --- stepping ----------------------------------------------------------------------
    def timestep(self, dt: float = 1.0 / 60.0) -> None:
        if self._dirty:
            self._push()
        banks = {
            name: {
                k: v for k, v in store.device().items() if k != "impulse"
            }
            for name, store in self.joints.items()
            if store.count > 0
        }
        present = tuple(sorted({int(t) for t in self.shapes.types if t >= 0}))
        self._state, self.last_diag = _step_donated(
            _dedupe_donated(self._state), self.shapes.device(), banks, jnp.float32(dt),
            self.config, present,
        )

    def run(self, steps: int, dt: float = 1.0 / 60.0, chunk: Optional[int] = None) -> None:
        """Step many frames efficiently: scanned multi-step dispatches of ``chunk``
        frames (one device round-trip per chunk), remainder via single steps.
        ``chunk=None`` uses BEPUPHYSICS2_TPU_RUN_CHUNK (default 32); 0 disables the
        scan entirely (per-step dispatch — used by the CPU test suite to avoid the
        large scan-program compile)."""
        if chunk is None:
            import os as _os

            chunk = int(_os.environ.get("BEPUPHYSICS2_TPU_RUN_CHUNK", "32"))
        if chunk <= 1:
            for _ in range(steps):
                self.timestep(dt)
            return
        if self._dirty:
            self._push()
        banks = {
            name: {k: v for k, v in store.device().items() if k != "impulse"}
            for name, store in self.joints.items()
            if store.count > 0
        }
        present = tuple(sorted({int(t) for t in self.shapes.types if t >= 0}))
        remaining = steps
        while remaining >= chunk:
            self._state, self.last_diag = step_n(
                _dedupe_donated(self._state), self.shapes.device(), banks, jnp.float32(dt),
                self.config, present, chunk,
            )
            remaining -= chunk
        for _ in range(remaining):
            self.timestep(dt)
