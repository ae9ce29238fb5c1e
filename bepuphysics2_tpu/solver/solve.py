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

The reference's multithreaded claim/sync machinery (Solver_Solve.cs:297-654) disappears:
program order within the fused XLA program provides every synchronization point. Warm
start needs no coloring at all (pure accumulation is order-independent). Solve passes
process full constraint arrays per color with the color mask gating impulse updates — all
gathers/scatters stay fixed-shape.
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
from ..utils.vec import Sym3, Vec3
from .coloring import color_constraints_kary, jacobi_valence_kary


@dataclasses.dataclass(frozen=True)
class SolveConfig:
    """reference SolveDescription (SolveDescription.cs:17)."""

    substeps: int = 8
    velocity_iterations: int = 1
    num_colors: int = 8  # Jacobi fallback beyond this (reference default 64 is CPU-motivated)


def _gather_vel(state: BodyState, idx) -> BodyVel:
    return BodyVel(state.vel[idx], state.omega[idx])


def _gather_inertia(world_inv_inertia: Sym3, state: BodyState, idx) -> GatheredInertia:
    return GatheredInertia(state.inv_mass[idx], world_inv_inertia[idx])


def _delta(new: BodyVel, old: BodyVel) -> BodyVel:
    return BodyVel(new.linear - old.linear, new.angular - old.angular)


def _scale_vel(v: BodyVel, s) -> BodyVel:
    return BodyVel(v.linear * s, v.angular * s)


def _scatter(state: BodyState, idx, dv: BodyVel) -> BodyState:
    return state._replace(
        vel=state.vel.at_add(idx, dv.linear),
        omega=state.omega.at_add(idx, dv.angular),
    )


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
    prestep: ContactPrestep,
    imp: ContactImpulses,
    joint_banks: dict,
    integrator_cfg: IntegratorConfig,
    cfg: SolveConfig,
    dt,
):
    """Run the full substepped solve over contacts + joint banks.
    Returns (state, contact_impulses, {name: joint_impulses})."""
    h = dt / cfg.substeps
    inv_h = cfg.substeps / dt
    n_bodies = state.pos.x.shape[0]
    bank_names = sorted(joint_banks.keys())

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
    groups = []  # (key, refs, dyn, valid)
    c_refs, c_dyn = _pad_refs(
        [prestep.body_a, prestep.body_b],
        [dyn_of(prestep.body_a), dyn_of(prestep.body_b)],
        prestep.body_a.shape[0],
    )
    groups.append(("__contacts__", c_refs, c_dyn, prestep.valid))
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

    all_refs = jnp.concatenate([g[1] for g in groups], axis=0)
    all_dyn = jnp.concatenate([g[2] for g in groups], axis=0)
    all_valid = jnp.concatenate([g[3] for g in groups], axis=0)
    all_color = color_constraints_kary(all_refs, all_dyn, all_valid, n_bodies, cfg.num_colors)
    in_jacobi_all = all_valid & (all_color == cfg.num_colors)
    valence = jacobi_valence_kary(all_refs, all_dyn, in_jacobi_all, n_bodies)

    # Split colors back per group.
    colors = {}
    off = 0
    for key, refs, dyn, v in groups:
        m = refs.shape[0]
        colors[key] = all_color[off : off + m]
        off += m

    # ---- Contact pass ------------------------------------------------------------------
    ca, cb = prestep.body_a, prestep.body_b
    val_ca = valence[ca]
    val_cb = valence[cb]

    def contact_pass(state, prestep_l, imp_l, world_ii, mask, jacobi: bool):
        va = _gather_vel(state, ca)
        vb = _gather_vel(state, cb)
        ia = _gather_inertia(world_ii, state, ca)
        ib = _gather_inertia(world_ii, state, cb)
        if jacobi:
            ia = GatheredInertia(ia.inv_mass * val_ca, ia.inv_inertia * val_ca)
            ib = GatheredInertia(ib.inv_mass * val_cb, ib.inv_inertia * val_cb)
        ps = prestep_l._replace(valid=mask)
        new_imp, nva, nvb = contact_mod.solve(ps, imp_l, ia, ib, va, vb, h, inv_h)
        da = _delta(nva, va)
        db = _delta(nvb, vb)
        if jacobi:
            da = _scale_vel(da, 1.0 / val_ca)
            db = _scale_vel(db, 1.0 / val_cb)
        state = _scatter(_scatter(state, ca, da), cb, db)
        return state, new_imp

    # ---- Joint passes ------------------------------------------------------------------
    def two_body_ctx(state, bank, world_ii, active, jacobi):
        a = bank["bodies"][:, 0]
        b = bank["bodies"][:, 1]
        ia = _gather_inertia(world_ii, state, a)
        ib = _gather_inertia(world_ii, state, b)
        if jacobi:
            sa = valence[a]
            sb = valence[b]
            ia = GatheredInertia(ia.inv_mass * sa, ia.inv_inertia * sa)
            ib = GatheredInertia(ib.inv_mass * sb, ib.inv_inertia * sb)
        return JointContext(
            pos_a=state.pos[a], orn_a=state.orn[a], inertia_a=ia, vel_a=_gather_vel(state, a),
            pos_b=state.pos[b], orn_b=state.orn[b], inertia_b=ib, vel_b=_gather_vel(state, b),
            active=active,
        )

    def joint_pass(state, name, bank, imp_l, world_ii, mask, jacobi: bool):
        cls = JOINT_TYPES[name]
        nb = getattr(cls, "N_BODIES", 2)
        if nb <= 2:
            a = bank["bodies"][:, 0]
            b = bank["bodies"][:, 1]
            ctx = two_body_ctx(state, bank, world_ii, mask, jacobi)
            new_imp, dva, dvb = cls.solve(bank["prestep"], imp_l, ctx, h, inv_h)
            if jacobi:
                dva = _scale_vel(dva, 1.0 / valence[a])
                dvb = _scale_vel(dvb, 1.0 / valence[b])
            state = _scatter(_scatter(state, a, dva), b, dvb)
            return state, new_imp
        # Multi-body (3-4): linear-jacobian constraints; gather per column.
        idxs = [bank["bodies"][:, j] for j in range(nb)]
        ctx = MultiBodyContext(
            pos=[state.pos[i] for i in idxs],
            vel=[_gather_vel(state, i) for i in idxs],
            inv_mass=[
                state.inv_mass[i] * (valence[i] if jacobi else 1.0) for i in idxs
            ],
            active=mask,
        )
        new_imp, dvs = cls.solve(bank["prestep"], imp_l, ctx, h, inv_h)
        for j, i in enumerate(idxs):
            dv = dvs[j]
            if jacobi:
                dv = _scale_vel(dv, 1.0 / valence[i])
            state = _scatter(state, i, dv)
        return state, new_imp

    def joint_warm_start(state, name, bank, imp_l, world_ii):
        cls = JOINT_TYPES[name]
        nb = getattr(cls, "N_BODIES", 2)
        if nb <= 2:
            a = bank["bodies"][:, 0]
            b = bank["bodies"][:, 1]
            ctx = two_body_ctx(state, bank, world_ii, bank_valid[name], False)
            dva, dvb = cls.warm_start(bank["prestep"], imp_l, ctx)
            return _scatter(_scatter(state, a, dva), b, dvb)
        idxs = [bank["bodies"][:, j] for j in range(nb)]
        ctx = MultiBodyContext(
            pos=[state.pos[i] for i in idxs],
            vel=[_gather_vel(state, i) for i in idxs],
            inv_mass=[state.inv_mass[i] for i in idxs],
            active=bank_valid[name],
        )
        dvs = cls.warm_start(bank["prestep"], imp_l, ctx)
        for j, i in enumerate(idxs):
            state = _scatter(state, i, dvs[j])
        return state

    # Joint impulses must be zero for inactive records before warm start.
    joint_imps = {
        name: joint_banks[name]["impulse"] * bank_valid[name][:, None].astype(jnp.float32)
        for name in bank_names
    }

    # ---- Substep loop ------------------------------------------------------------------
    def substep(carry, first: bool):
        state, prestep_l, imp_l, jimps = carry
        if not first:
            va = _gather_vel(state, ca)
            vb = _gather_vel(state, cb)
            prestep_l = contact_mod.incremental_depth_update(prestep_l, va, vb, h)
            state = integrate_poses(state, integrator_cfg, h)
        state = integrate_velocities(state, integrator_cfg, h)

        world_ii = state.world_inv_inertia()

        # Warm start (pure accumulation).
        va = _gather_vel(state, ca)
        vb = _gather_vel(state, cb)
        ia = _gather_inertia(world_ii, state, ca)
        ib = _gather_inertia(world_ii, state, cb)
        nva, nvb = contact_mod.warm_start(prestep_l, imp_l, ia, ib, va, vb)
        state = _scatter(_scatter(state, ca, _delta(nva, va)), cb, _delta(nvb, vb))
        for name in bank_names:
            state = joint_warm_start(state, name, joint_banks[name], jimps[name], world_ii)

        def color_pass(c, sc):
            state, imp_l, jimps = sc
            mask_c = prestep_l.valid & (colors["__contacts__"] == c)
            state, imp_l = contact_pass(state, prestep_l, imp_l, world_ii, mask_c, False)
            new_jimps = dict(jimps)
            for name in bank_names:
                mask_j = bank_valid[name] & (colors[name] == c)
                state, new_jimps[name] = joint_pass(
                    state, name, joint_banks[name], jimps[name], world_ii, mask_j, False
                )
            return state, imp_l, new_jimps

        def iteration(_, sc):
            sc = jax.lax.fori_loop(0, cfg.num_colors, color_pass, sc)
            state, imp_l, jimps = sc
            mask_c = prestep_l.valid & (colors["__contacts__"] == cfg.num_colors)
            state, imp_l = contact_pass(state, prestep_l, imp_l, world_ii, mask_c, True)
            new_jimps = dict(jimps)
            for name in bank_names:
                mask_j = bank_valid[name] & (colors[name] == cfg.num_colors)
                state, new_jimps[name] = joint_pass(
                    state, name, joint_banks[name], jimps[name], world_ii, mask_j, True
                )
            return state, imp_l, new_jimps

        state, imp_l, jimps = jax.lax.fori_loop(
            0, cfg.velocity_iterations, iteration, (state, imp_l, jimps)
        )
        return state, prestep_l, imp_l, jimps

    carry = substep((state, prestep, imp, joint_imps), first=True)
    if cfg.substeps > 1:
        carry, _ = jax.lax.scan(
            lambda c, _: (substep(c, first=False), None), carry, None, length=cfg.substeps - 1
        )
    state, prestep, imp, joint_imps = carry

    state = integrate_poses(state, integrator_cfg, h)
    return state, imp, joint_imps


def solve_contacts(state, prestep, imp, integrator_cfg, cfg, dt):
    """Contacts-only entry (kept for tests / minimal configs)."""
    state, imp, _ = solve_all(state, prestep, imp, {}, integrator_cfg, cfg, dt)
    return state, imp
