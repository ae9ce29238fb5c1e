"""Substepped TGS solver — the reference's Solver_Solve loop as one XLA program.

Semantics follow reference Solver<T>.Solve (Solver_Solve.cs:1415):

    for substep in 0..S-1:
        if substep > 0:
            incremental contact depth update (vs. velocities)   [IncrementallyUpdateForSubstep]
            integrate poses (h = dt/S)                          [warm start AllowPoseIntegration]
        integrate velocities (gravity/damping callback)         [GatherAndIntegrate]
        warm start: re-apply accumulated (per-substep) impulses — contacts + all joints
        for iteration in 0..V-1:
            for color in colors: solve color (contacts then joint banks, Gauss-Seidel)
            Jacobi bucket with mass splitting
    final pose integration (h)                                  [IntegrateAfterSubstepping]

Constraints = one contact array + one fixed-capacity bank per registered joint type (the
reference's TypeBatches, Constraints/TypeBatch.cs:10). All constraints share ONE device-side
graph coloring (reference ConstraintBatch color classes, Solver.cs:984) computed per step
over the K-ary body-reference table; the leftover Jacobi bucket uses per-body mass
splitting (reference SequentialFallbackBatch.cs:37).

TPU memory-op shape: body velocity lives in a packed (NB, 6) array and world inertia in a
packed (NB, 7) array for the duration of the solve, so every constraint pass costs ONE
gather and ONE scatter-add per body side instead of 12 scalar-component ops — scatters
serialize on TPU and dominate the solver otherwise (this is the packed-row analogue of the
reference's 256-bit BodyDynamics cache-line layout, BodyProperties.cs:319).
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
from .coloring import color_constraints_kary, jacobi_valence_kary


@dataclasses.dataclass(frozen=True)
class SolveConfig:
    """reference SolveDescription (SolveDescription.cs:17)."""

    substeps: int = 8
    velocity_iterations: int = 1
    num_colors: int = 8  # Jacobi fallback beyond this (reference default 64 is CPU-motivated)
    # Compact per-color contact buckets (gather ~M/colors rows per color pass instead of
    # masked full-bank passes). Wins when max_pairs is large (fewer elements touched);
    # loses below ~10k pairs where TPU gathers cost more than vectorized masked sweeps.
    compact_colors: bool = False


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


def _build_color_buckets(color, valid, num_colors: int, cap: int):
    """Compact per-color index buckets: bucket[c] lists the original row ids of color c
    (padded with the sentinel M). A color pass then gathers ~M/colors rows instead of
    masking the full bank — the compact-TypeBatch analogue of the reference's per-batch
    storage (ConstraintBatch.cs). Rows whose color bucket overflows ``cap`` are DEMOTED to
    the Jacobi bucket (mass-split solve handles arbitrary sharing), never dropped.
    Returns (bucket (num_colors, cap) int32, demoted (M,) bool)."""
    m = color.shape[0]
    key = jnp.where(valid & (color < num_colors), color, num_colors)
    order = jnp.argsort(key, stable=True).astype(jnp.int32)
    sk = key[order]
    starts = jnp.searchsorted(sk, jnp.arange(num_colors), side="left").astype(jnp.int32)
    rank = jnp.arange(m, dtype=jnp.int32) - starts[jnp.minimum(sk, num_colors - 1)]
    in_color = sk < num_colors
    keep = in_color & (rank < cap)
    pos = jnp.where(keep, sk * cap + rank, num_colors * cap)
    bucket = (
        jnp.full(num_colors * cap + 1, m, jnp.int32).at[pos].set(order)[: num_colors * cap]
    )
    demoted = jnp.zeros(m, bool).at[order].set(in_color & (rank >= cap))
    return bucket.reshape(num_colors, cap), demoted


def _pad_refs(bodies, dyn_cols, m):
    """Pad body refs / dynamic masks to 4 columns (K-ary coloring table)."""
    refs = jnp.zeros((m, 4), jnp.int32)
    dyn = jnp.zeros((m, 4), bool)
    for j, (r, d) in enumerate(zip(bodies, dyn_cols)):
        refs = refs.at[:, j].set(r)
        dyn = dyn.at[:, j].set(d)
    return refs, dyn


def solve_all(
    state: BodyState,
    contact_banks,
    joint_banks: dict,
    integrator_cfg: IntegratorConfig,
    cfg: SolveConfig,
    dt,
    axis_name: str = None,
):
    """Run the full substepped solve over contact banks + joint banks.
    ``contact_banks``: list of (ContactPrestep, ContactImpulses) — e.g. the body-pair bank
    and the compound-child bank. Returns (state, [contact_impulses...], {name: jimps}).

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
    bank_names = sorted(joint_banks.keys())
    n_cbanks = len(contact_banks)

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
    for ci, (ps, _) in enumerate(contact_banks):
        c_refs, c_dyn = _pad_refs(
            [ps.body_a, ps.body_b],
            [dyn_of(ps.body_a), dyn_of(ps.body_b)],
            ps.body_a.shape[0],
        )
        groups.append((f"__contacts{ci}__", c_refs, c_dyn, ps.valid))
    bank_valid = {}
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

    # Global constraint table: identical on every device under sharding, so the greedy
    # coloring result is identical too — the invariant that makes per-color psum exact.
    g_refs = [gather_global(g[1]) for g in groups]
    all_refs = jnp.concatenate(g_refs, axis=0)
    all_dyn = jnp.concatenate([gather_global(g[2]) for g in groups], axis=0)
    all_valid = jnp.concatenate([gather_global(g[3]) for g in groups], axis=0)
    all_color = color_constraints_kary(all_refs, all_dyn, all_valid, n_bodies, cfg.num_colors)

    dev = jax.lax.axis_index(axis_name) if axis_name else 0
    colors = {}
    off = 0
    for gi, (key, refs, dyn, v) in enumerate(groups):
        m = refs.shape[0]  # local size
        m_g = g_refs[gi].shape[0]  # global size
        local = jax.lax.dynamic_slice_in_dim(all_color[off : off + m_g], dev * m, m)
        colors[key] = local
        off += m_g

    # Per-color index buckets for contact banks (the dominant bank): each color pass
    # gathers only its own rows. Bucket overflow demotes rows to the Jacobi pass.
    cbank_buckets = []
    cbank_jacobi = []
    for ci, (ps, _) in enumerate(contact_banks):
        if not cfg.compact_colors:
            cbank_jacobi.append(ps.valid & (colors[f"__contacts{ci}__"] == cfg.num_colors))
            continue
        mi = ps.body_a.shape[0]
        cap = min(mi, max(1, (2 * mi + cfg.num_colors - 1) // cfg.num_colors))
        bucket, demoted = _build_color_buckets(
            colors[f"__contacts{ci}__"], ps.valid, cfg.num_colors, cap
        )
        cbank_buckets.append(bucket)
        cbank_jacobi.append(
            (ps.valid & (colors[f"__contacts{ci}__"] == cfg.num_colors)) | demoted
        )

    # Jacobi membership per group (contacts include bucket-overflow demotions) → global
    # per-body valence for mass splitting.
    jacobi_groups = list(cbank_jacobi) + [
        bank_valid[name] & (colors[name] == cfg.num_colors) for name in bank_names
    ]
    in_jacobi_all = jnp.concatenate([gather_global(f) for f in jacobi_groups])
    valence = jacobi_valence_kary(all_refs, all_dyn, in_jacobi_all, n_bodies)

    # ---- Contact pass (packed v6/i7) ---------------------------------------------------
    cbank_refs = [(ps.body_a, ps.body_b) for ps, _ in contact_banks]
    cbank_val = [(valence[a_], valence[b_]) for a_, b_ in cbank_refs]

    # Fused A+B memory ops: ONE gather and ONE scatter-add per pass over the
    # concatenated [a; b] index vector (halves the serialized-scatter count).
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
        """Light per-iteration pass: gather velocities, apply the precomputed kernel,
        scatter deltas. All jacobian/effective-mass setup lives in the kernel."""
        idx2 = cbank_idx2[ci]
        m = idx2.shape[0] // 2
        g = v6[idx2]
        va = BodyVel(Vec3(g[:m, 0], g[:m, 1], g[:m, 2]), Vec3(g[:m, 3], g[:m, 4], g[:m, 5]))
        vb = BodyVel(Vec3(g[m:, 0], g[m:, 1], g[m:, 2]), Vec3(g[m:, 3], g[m:, 4], g[m:, 5]))
        new_imp, nva, nvb = contact_mod.apply_iteration(kern, imp_l, va, vb, mask)
        p2 = jnp.concatenate([_pack_dv(_delta(nva, va)), _pack_dv(_delta(nvb, vb))])
        if jacobi:
            p2 = p2 / cbank_val2[ci][:, None]
        dv = dv.at[idx2].add(p2)
        return dv, new_imp

    # ---- Joint passes ------------------------------------------------------------------
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

    def contact_color_pass(v6, dv, i7, ci, c, prestep_l, imp_l):
        """Solve ONE color's contact rows via its compact bucket: gather (cap,) rows,
        solve, scatter impulses back to the bank and velocity deltas to dv."""
        mi = prestep_l.body_a.shape[0]
        idx = cbank_buckets[ci][c]  # (cap,) original row ids; mi = padding sentinel
        ok = idx < mi
        idxc = jnp.minimum(idx, mi - 1)
        ps = jax.tree_util.tree_map(lambda x: x[idxc], prestep_l)
        ps = ps._replace(valid=ok & ps.valid)
        im = jax.tree_util.tree_map(lambda x: x[idxc], imp_l)
        a = ps.body_a
        b = ps.body_b
        idx2 = jnp.concatenate([a, b])
        cap = idx.shape[0]
        g = v6[idx2]
        va = BodyVel(Vec3(g[:cap, 0], g[:cap, 1], g[:cap, 2]), Vec3(g[:cap, 3], g[:cap, 4], g[:cap, 5]))
        vb = BodyVel(Vec3(g[cap:, 0], g[cap:, 1], g[cap:, 2]), Vec3(g[cap:, 3], g[cap:, 4], g[cap:, 5]))
        gi = i7[idx2]
        ia = GatheredInertia(gi[:cap, 0], Sym3(*(gi[:cap, k] for k in range(1, 7))))
        ib = GatheredInertia(gi[cap:, 0], Sym3(*(gi[cap:, k] for k in range(1, 7))))
        new_im, nva, nvb = contact_mod.solve(ps, im, ia, ib, va, vb, h, inv_h)
        p2 = jnp.concatenate([_pack_dv(_delta(nva, va)), _pack_dv(_delta(nvb, vb))])
        dv = dv.at[idx2].add(p2)
        iw = jnp.where(ok, idx, mi)
        imp_l = jax.tree_util.tree_map(
            lambda full, rows: full.at[iw].set(rows, mode="drop"), imp_l, new_im
        )
        return dv, imp_l

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

    # Joint impulses must be zero for inactive records before warm start.
    joint_imps = {
        name: joint_banks[name]["impulse"] * bank_valid[name][:, None].astype(jnp.float32)
        for name in bank_names
    }

    # ---- Substep loop ------------------------------------------------------------------
    def substep(carry, first: bool):
        state, presteps_l, imps_l, jimps = carry
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

        # Per-substep contact kernels: ALL velocity-independent jacobian/effective-mass
        # setup hoisted out of the iteration passes (contact.prepare docstring). The
        # Jacobi variant bakes in mass-splitting-scaled inertia.
        kerns = []
        kerns_j = []
        for ci in range(n_cbanks):
            ia, ib = gather_inertia_pair(i7, ci, False)
            kerns.append(contact_mod.prepare(presteps_l[ci], ia, ib, h, inv_h))
            ia_j, ib_j = gather_inertia_pair(i7, ci, True)
            kerns_j.append(contact_mod.prepare(presteps_l[ci], ia_j, ib_j, h, inv_h))

        # Warm start (pure accumulation: deltas don't read velocities, so all banks
        # accumulate into one delta array applied — and psum'd — once).
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
            # Contacts use compact per-color buckets (gather ~M/colors rows); joint banks
            # are small and stay masked-full-bank.
            v6, imps_l, jimps = sc
            dv = jnp.zeros_like(v6)
            new_imps = list(imps_l)
            for ci in range(n_cbanks):
                if cfg.compact_colors:
                    dv, new_imps[ci] = contact_color_pass(
                        v6, dv, i7, ci, c, presteps_l[ci], imps_l[ci]
                    )
                else:
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
            sc = jax.lax.fori_loop(0, cfg.num_colors, color_pass, sc)
            v6, imps_l, jimps = sc
            # Jacobi bucket: constraints here MAY share bodies (including bucket-overflow
            # demotions); mass splitting by global valence makes the single accumulated
            # application the intended Jacobi step.
            dv = jnp.zeros_like(v6)
            new_imps = list(imps_l)
            for ci in range(n_cbanks):
                dv, new_imps[ci] = contact_pass_kern(
                    v6, dv, ci, kerns_j[ci], imps_l[ci], cbank_jacobi[ci], True
                )
            new_jimps = dict(jimps)
            for name in bank_names:
                mask_j = bank_valid[name] & (colors[name] == cfg.num_colors)
                dv, new_jimps[name] = joint_pass(
                    v6, dv, i7, state, name, joint_banks[name], jimps[name], mask_j, True
                )
            return apply_dv(v6, dv), tuple(new_imps), new_jimps

        v6, imps_l, jimps = jax.lax.fori_loop(
            0, cfg.velocity_iterations, iteration, (v6, imps_l, jimps)
        )
        state = _vel_from6(state, v6)
        return state, presteps_l, imps_l, jimps

    presteps0 = tuple(ps for ps, _ in contact_banks)
    imps0 = tuple(im for _, im in contact_banks)
    carry = substep((state, presteps0, imps0, joint_imps), first=True)
    if cfg.substeps > 1:
        carry, _ = jax.lax.scan(
            lambda c, _: (substep(c, first=False), None), carry, None, length=cfg.substeps - 1
        )
    state, presteps0, imps0, joint_imps = carry

    state = integrate_poses(state, integrator_cfg, h)
    return state, list(imps0), joint_imps


def solve_contacts(state, prestep, imp, integrator_cfg, cfg, dt):
    """Single-contact-bank entry (kept for tests / minimal configs)."""
    state, imps, _ = solve_all(state, [(prestep, imp)], {}, integrator_cfg, cfg, dt)
    return state, imps[0]
