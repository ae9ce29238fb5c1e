"""Convex contact manifold constraint: one masked kernel for all of Contact1-4{,OneBody}.

The reference generates 14 contact constraint types (Contact1-4 × {two-body, one-body} +
nonconvex variants) via T4 templates (reference: Constraints/Contact/ContactConvexTypes.cs,
DefaultTypes.cs:50-66). On TPU a single vectorized kernel with a per-contact mask covers
every convex manifold: inactive contact slots contribute zero impulse, and a static/
kinematic partner's zero inverse inertia reproduces the one-body specializations exactly.

Math follows the reference exactly:
- penetration: Constraints/Contact/PenetrationLimit.cs (speculative bias =
  min(depth/dt, depth·errToVel, maxRecovery); accumulated impulse clamped ≥ 0)
- tangent friction: 2-DOF block solve at the depth-weighted manifold center with maximum
  impulse μ·ΣP/n (Constraints/Contact/TangentFriction.cs, FrictionHelpers.ComputeFrictionCenter
  ContactConvexTypes.cs:124-196)
- twist friction around the normal with lever-arm-scaled maximum
  (Constraints/Contact/TwistFriction.cs)
- incremental per-substep depth update from relative contact velocity
  (PenetrationLimit.UpdatePenetrationDepth)

Solve order matches the reference (penetration first, then friction: ContactConvexTypes
comment "friction constraints more authoritative, since they happen last").

Data layout: each contact-constraint record is a row in fixed-capacity SoA arrays; the
4-contact dimension is a trailing axis of size 4 (arrays shaped (MP, 4)).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.spring import SpringSettings, compute_springiness
from ..utils.vec import Sym2, Sym3, Vec2, Vec3, build_orthonormal_basis

# Fault-injection hook for the parity harness (parity/run_parity.py): negates the
# tangent-friction constraint-space velocity, the classic jacobian sign bug. The
# harness flips this, clears the jit caches, reruns the sliding-sphere scene, and
# asserts the friction envelopes FAIL — proving the oracle can catch a sign error.
# Never set outside tests/parity.
DEBUG_NEGATE_TANGENT_CSV = False


class ContactPrestep(NamedTuple):
    """Per-record prestep data (reference Contact{N}PrestepData)."""

    body_a: jnp.ndarray  # (MP,) int32 body slot
    body_b: jnp.ndarray  # (MP,) int32 body slot (may be static/kinematic slot)
    normal: Vec3  # (MP,) unit, calibrated to point from B to A
    offset_a: Vec3  # (MP, 4) contact offset from A's center (world)
    offset_b: Vec3  # (MP,) B's center relative to A's center (world): posB - posA
    depth: jnp.ndarray  # (MP, 4) penetration depth (negative = speculative)
    contact_mask: jnp.ndarray  # (MP, 4) bool — which contact slots are live
    valid: jnp.ndarray  # (MP,) bool — whole record live
    friction: jnp.ndarray  # (MP,)
    spring: SpringSettings  # (MP,)
    max_recovery_velocity: jnp.ndarray  # (MP,)
    feature: jnp.ndarray  # (MP, 4) int32 — warm-start redistribution ids (PairCache.cs:78)


class ContactImpulses(NamedTuple):
    """Accumulated impulses (reference Contact{N}AccumulatedImpulses)."""

    penetration: jnp.ndarray  # (MP, 4)
    tangent: Vec2  # (MP,) xy in tangent basis
    twist: jnp.ndarray  # (MP,)

    @staticmethod
    def zeros(capacity: int) -> "ContactImpulses":
        return ContactImpulses(
            jnp.zeros((capacity, 4), jnp.float32),
            Vec2.zeros(capacity),
            jnp.zeros(capacity, jnp.float32),
        )


class BodyVel(NamedTuple):
    linear: Vec3
    angular: Vec3


class GatheredInertia(NamedTuple):
    inv_mass: jnp.ndarray
    inv_inertia: Sym3  # world-frame


def _friction_center(offset_a: Vec3, depth, contact_mask):
    """Depth-weighted manifold center (reference ContactConvexTypes.cs:124-196): active
    (depth ≥ 0) contacts weigh 1, speculative weigh 0; fallback = mean of live contacts."""
    live = contact_mask.astype(jnp.float32)
    w = jnp.where(depth < 0.0, 0.0, 1.0) * live
    wsum = jnp.sum(w, axis=-1)
    fallback = wsum == 0.0
    live_count = jnp.maximum(jnp.sum(live, axis=-1), 1.0)
    w = jnp.where(fallback[:, None], live / live_count[:, None], w / jnp.maximum(wsum, 1.0)[:, None])
    return Vec3(
        jnp.sum(offset_a.x * w, axis=-1),
        jnp.sum(offset_a.y * w, axis=-1),
        jnp.sum(offset_a.z * w, axis=-1),
    )


def _apply_pair_impulse(
    lin_impulse_a: Vec3,
    ang_impulse_a: Vec3,
    ang_impulse_b: Vec3,
    ia: GatheredInertia,
    ib: GatheredInertia,
    va: BodyVel,
    vb: BodyVel,
):
    """Apply world-space impulse (linear impulse on A; −same on B) to gathered velocities."""
    new_va = BodyVel(
        va.linear + lin_impulse_a * ia.inv_mass,
        va.angular + ia.inv_inertia.transform(ang_impulse_a),
    )
    new_vb = BodyVel(
        vb.linear - lin_impulse_a * ib.inv_mass,
        vb.angular + ib.inv_inertia.transform(ang_impulse_b),
    )
    return new_va, new_vb


def warm_start(
    prestep: ContactPrestep,
    imp: ContactImpulses,
    ia: GatheredInertia,
    ib: GatheredInertia,
    va: BodyVel,
    vb: BodyVel,
):
    """Apply accumulated impulses (per-substep estimates) to gathered velocities.
    reference: Contact{N}Functions.WarmStart."""
    n = prestep.normal
    t1, t2 = build_orthonormal_basis(n)
    center_a = _friction_center(prestep.offset_a, prestep.depth, prestep.contact_mask)
    center_b = center_a - prestep.offset_b

    # Tangent friction impulse at manifold center.
    tangent_w = t1 * imp.tangent.x + t2 * imp.tangent.y
    lin = tangent_w
    ang_a = center_a.cross(tangent_w)
    ang_b = tangent_w.cross(center_b)

    # Penetration impulses per contact (sum of per-contact wrenches).
    pen = imp.penetration * prestep.contact_mask  # (MP,4)
    pen_total = jnp.sum(pen, axis=-1)
    lin = lin + n * pen_total
    # angular terms: Σ pen_i * (offset_i × n) on A; Σ pen_i * (n × offset_b_i) on B
    off = prestep.offset_a  # (MP,4) components
    n4 = Vec3(n.x[:, None], n.y[:, None], n.z[:, None])
    ang_a_pen = off.cross(n4)  # (MP,4)
    ang_a = ang_a + Vec3(
        jnp.sum(ang_a_pen.x * pen, -1), jnp.sum(ang_a_pen.y * pen, -1), jnp.sum(ang_a_pen.z * pen, -1)
    )
    off_b = Vec3(
        off.x - prestep.offset_b.x[:, None],
        off.y - prestep.offset_b.y[:, None],
        off.z - prestep.offset_b.z[:, None],
    )
    ang_b_pen = n4.cross(off_b)
    ang_b = ang_b + Vec3(
        jnp.sum(ang_b_pen.x * pen, -1), jnp.sum(ang_b_pen.y * pen, -1), jnp.sum(ang_b_pen.z * pen, -1)
    )

    # Twist friction: angular-only, jacobian = ±normal.
    ang_a = ang_a + n * imp.twist
    ang_b = ang_b - n * imp.twist

    return _apply_pair_impulse(lin, ang_a, ang_b, ia, ib, va, vb)


def solve(
    prestep: ContactPrestep,
    imp: ContactImpulses,
    ia: GatheredInertia,
    ib: GatheredInertia,
    va: BodyVel,
    vb: BodyVel,
    dt,
    inv_dt,
):
    """One velocity iteration for all records (masked). Returns (imp', va', vb')."""
    n = prestep.normal
    err_to_vel, cfm_scale, softness = compute_springiness(prestep.spring, dt)

    # ---- Penetration constraints (4 sequential per-contact solves; they share bodies so
    # within-record sequencing matters and is kept, matching the reference order).
    pen = imp.penetration
    for k in range(4):
        off_k = Vec3(prestep.offset_a.x[:, k], prestep.offset_a.y[:, k], prestep.offset_a.z[:, k])
        off_bk = off_k - prestep.offset_b
        ang_a = off_k.cross(n)
        ang_b = n.cross(off_bk)
        ang_a_contrib = ia.inv_inertia.vector_sandwich(ang_a)
        ang_b_contrib = ib.inv_inertia.vector_sandwich(ang_b)
        linear = ia.inv_mass + ib.inv_mass
        inv_eff = linear + ang_a_contrib + ang_b_contrib
        # Guard zero total inverse mass (two locked-inertia bodies) — see prepare().
        effective_mass = jnp.where(
            inv_eff > 0.0, cfm_scale / jnp.maximum(inv_eff, 1e-30), 0.0
        )

        depth_k = prestep.depth[:, k]
        bias = jnp.minimum(
            depth_k * inv_dt, jnp.minimum(depth_k * err_to_vel, prestep.max_recovery_velocity)
        )

        csv = (
            va.linear.dot(n)
            - vb.linear.dot(n)
            + va.angular.dot(ang_a)
            + vb.angular.dot(ang_b)
        )
        acc_k = pen[:, k]
        negated_csi = acc_k * softness + (csv - bias) * effective_mass
        new_acc = jnp.maximum(0.0, acc_k - negated_csi)
        live = prestep.contact_mask[:, k] & prestep.valid
        new_acc = jnp.where(live, new_acc, acc_k)
        corrective = jnp.where(live, new_acc - acc_k, 0.0)
        pen = pen.at[:, k].set(new_acc)
        va, vb = _apply_pair_impulse(
            n * corrective, ang_a * corrective, ang_b * corrective, ia, ib, va, vb
        )

    # ---- Tangent friction (2-DOF block at manifold center).
    t1, t2 = build_orthonormal_basis(n)
    center_a = _friction_center(prestep.offset_a, prestep.depth, prestep.contact_mask)
    center_b = center_a - prestep.offset_b
    ang_a1 = center_a.cross(t1)
    ang_a2 = center_a.cross(t2)
    ang_b1 = t1.cross(center_b)
    ang_b2 = t2.cross(center_b)

    imass = ia.inv_mass + ib.inv_mass
    # inverse effective mass (symmetric 2x2): linear part = (ti·tj) * imass = I*imass
    # angular parts: sandwich of jacobian rows with the inverse inertia tensors.
    m11 = (
        imass
        + ia.inv_inertia.vector_sandwich(ang_a1)
        + ib.inv_inertia.vector_sandwich(ang_b1)
    )
    m22 = (
        imass
        + ia.inv_inertia.vector_sandwich(ang_a2)
        + ib.inv_inertia.vector_sandwich(ang_b2)
    )
    m12 = (
        ia.inv_inertia.transform(ang_a1).dot(ang_a2)
        + ib.inv_inertia.transform(ang_b1).dot(ang_b2)
    )
    eff = Sym2(m11, m12, m22).inverse()

    # constraint-space *violating* velocity (reference TangentFriction.ComputeCorrectiveImpulse)
    csv1 = vb.linear.dot(t1) - va.linear.dot(t1) - va.angular.dot(ang_a1) - vb.angular.dot(ang_b1)
    csv2 = vb.linear.dot(t2) - va.linear.dot(t2) - va.angular.dot(ang_a2) - vb.angular.dot(ang_b2)
    if DEBUG_NEGATE_TANGENT_CSV:  # parity fault injection — see module header
        csv1, csv2 = -csv1, -csv2
    csi = eff.transform(Vec2(csv1, csv2))

    contact_count = jnp.maximum(jnp.sum(prestep.contact_mask.astype(jnp.float32), -1), 1.0)
    premul_friction = prestep.friction / contact_count
    pen_masked = pen * prestep.contact_mask
    max_tangent = premul_friction * jnp.sum(pen_masked, -1)

    prev_t = imp.tangent
    new_t = Vec2(prev_t.x + csi.x, prev_t.y + csi.y)
    mag = new_t.length()
    scale = jnp.minimum(1.0, max_tangent / jnp.maximum(1e-16, mag))
    new_t = new_t * scale
    rec_live = prestep.valid
    new_t = Vec2(jnp.where(rec_live, new_t.x, prev_t.x), jnp.where(rec_live, new_t.y, prev_t.y))
    corr_t = Vec2(new_t.x - prev_t.x, new_t.y - prev_t.y)
    tangent_w = t1 * corr_t.x + t2 * corr_t.y
    va, vb = _apply_pair_impulse(
        tangent_w,
        center_a.cross(tangent_w),
        tangent_w.cross(center_b),
        ia,
        ib,
        va,
        vb,
    )

    # ---- Twist friction: lever = Σ pen_i · |offset_i − center| (depth lever for 1-contact
    # manifolds, reference ContactConvexTypes Contact1 Solve).
    dist = Vec3(
        prestep.offset_a.x - center_a.x[:, None],
        prestep.offset_a.y - center_a.y[:, None],
        prestep.offset_a.z - center_a.z[:, None],
    ).length()
    single = contact_count <= 1.0
    lever0 = jnp.maximum(0.0, prestep.depth[:, 0])
    twist_cap = jnp.where(
        single,
        premul_friction * pen_masked[:, 0] * lever0,
        premul_friction * jnp.sum(pen_masked * dist, -1),
    )
    ang_a_tw = ia.inv_inertia.vector_sandwich(n)
    ang_b_tw = ib.inv_inertia.vector_sandwich(n)
    inv_eff_tw = ang_a_tw + ang_b_tw
    eff_tw = jnp.where(inv_eff_tw == 0.0, 0.0, 1.0 / jnp.maximum(inv_eff_tw, 1e-30))
    csv_tw = va.angular.dot(n) - vb.angular.dot(n)
    csi_tw = -csv_tw * eff_tw
    prev_tw = imp.twist
    new_tw = jnp.clip(prev_tw + csi_tw, -twist_cap, twist_cap)
    new_tw = jnp.where(rec_live, new_tw, prev_tw)
    corr_tw = new_tw - prev_tw
    va, vb = _apply_pair_impulse(
        Vec3.zeros(corr_tw.shape), n * corr_tw, -(n * corr_tw), ia, ib, va, vb
    )

    return ContactImpulses(pen, new_t, new_tw), va, vb


class ContactKernel(NamedTuple):
    """Velocity-independent solve data, hoisted out of the per-color iteration passes
    (computed ONCE per substep by ``prepare``). The reference recomputes jacobians every
    iteration to save CPU memory bandwidth (TypeProcessor comment); on TPU the iteration
    passes are op-count-bound, so precomputing effective masses / premultiplied jacobians
    cuts each color pass to a light gather→dot→clamp→scatter kernel."""

    # Penetration, per contact slot (M, 4):
    ang_a: Vec3  # r_a × n
    ang_b: Vec3  # n × r_b
    ang_a_im: Vec3  # I_a⁻¹ (r_a × n)
    ang_b_im: Vec3  # I_b⁻¹ (n × r_b)
    eff: jnp.ndarray  # effective mass (incl. cfm scale)
    bias: jnp.ndarray
    live: jnp.ndarray  # bool
    # Shared (M,):
    normal: Vec3
    softness: jnp.ndarray
    inv_mass_a: jnp.ndarray
    inv_mass_b: jnp.ndarray
    # Tangent friction (M,):
    t1: Vec3
    t2: Vec3
    ang_a1: Vec3
    ang_a2: Vec3
    ang_b1: Vec3
    ang_b2: Vec3
    ang_a1_im: Vec3
    ang_a2_im: Vec3
    ang_b1_im: Vec3
    ang_b2_im: Vec3
    eff_t: Sym2
    premul_friction: jnp.ndarray
    # Twist (M,):
    n_im_a: Vec3  # I_a⁻¹ n
    n_im_b: Vec3  # I_b⁻¹ n
    eff_tw: jnp.ndarray
    twist_lever: jnp.ndarray  # Σ-weighted lever arm; cap = μ·(Σpen weighted)
    twist_single: jnp.ndarray  # bool: 1-contact manifold (lever = depth)
    lever0: jnp.ndarray
    valid: jnp.ndarray


def _sym3_cols(s: Sym3) -> Sym3:
    """Broadcast a (M,) symmetric tensor against (M, 4) per-contact vectors."""
    return Sym3(
        s.xx[:, None], s.yx[:, None], s.yy[:, None],
        s.zx[:, None], s.zy[:, None], s.zz[:, None],
    )


def prepare(
    prestep: ContactPrestep,
    ia: GatheredInertia,
    ib: GatheredInertia,
    dt,
    inv_dt,
) -> ContactKernel:
    """Build the per-substep ContactKernel (all velocity-independent terms of ``solve``)."""
    n = prestep.normal
    err_to_vel, cfm_scale, softness = compute_springiness(prestep.spring, dt)

    n4 = Vec3(n.x[:, None], n.y[:, None], n.z[:, None])
    off = prestep.offset_a  # (M,4)
    off_b = Vec3(
        off.x - prestep.offset_b.x[:, None],
        off.y - prestep.offset_b.y[:, None],
        off.z - prestep.offset_b.z[:, None],
    )
    ang_a = off.cross(n4)
    ang_b = n4.cross(off_b)
    ia4 = _sym3_cols(ia.inv_inertia)
    ib4 = _sym3_cols(ib.inv_inertia)
    ang_a_im = ia4.transform(ang_a)
    ang_b_im = ib4.transform(ang_b)
    linear = (ia.inv_mass + ib.inv_mass)[:, None]
    inv_eff = linear + ang_a.dot(ang_a_im) + ang_b.dot(ang_b_im)
    # Zero total inverse mass (two locked-inertia 'dynamic' bodies — the reference's
    # definition of kinematic is exactly zero inverse inertia, Bodies.IsKinematic):
    # the constraint can't move anything; a raw division would make eff=inf → NaN.
    eff = jnp.where(inv_eff > 0.0, cfm_scale[:, None] / jnp.maximum(inv_eff, 1e-30), 0.0)
    bias = jnp.minimum(
        prestep.depth * inv_dt,
        jnp.minimum(prestep.depth * err_to_vel[:, None], prestep.max_recovery_velocity[:, None]),
    )
    live = prestep.contact_mask & prestep.valid[:, None]

    # Tangent friction.
    t1, t2 = build_orthonormal_basis(n)
    center_a = _friction_center(prestep.offset_a, prestep.depth, prestep.contact_mask)
    center_b = center_a - prestep.offset_b
    ang_a1 = center_a.cross(t1)
    ang_a2 = center_a.cross(t2)
    ang_b1 = t1.cross(center_b)
    ang_b2 = t2.cross(center_b)
    ang_a1_im = ia.inv_inertia.transform(ang_a1)
    ang_a2_im = ia.inv_inertia.transform(ang_a2)
    ang_b1_im = ib.inv_inertia.transform(ang_b1)
    ang_b2_im = ib.inv_inertia.transform(ang_b2)
    imass = ia.inv_mass + ib.inv_mass
    m11 = imass + ang_a1.dot(ang_a1_im) + ang_b1.dot(ang_b1_im)
    m22 = imass + ang_a2.dot(ang_a2_im) + ang_b2.dot(ang_b2_im)
    m12 = ang_a1_im.dot(ang_a2) + ang_b1_im.dot(ang_b2)
    eff_t = Sym2(m11, m12, m22).inverse()
    contact_count = jnp.maximum(jnp.sum(prestep.contact_mask.astype(jnp.float32), -1), 1.0)
    premul_friction = prestep.friction / contact_count

    # Twist.
    n_im_a = ia.inv_inertia.transform(n)
    n_im_b = ib.inv_inertia.transform(n)
    inv_eff_tw = n.dot(n_im_a) + n.dot(n_im_b)
    eff_tw = jnp.where(inv_eff_tw == 0.0, 0.0, 1.0 / jnp.maximum(inv_eff_tw, 1e-30))
    dist = Vec3(
        off.x - center_a.x[:, None], off.y - center_a.y[:, None], off.z - center_a.z[:, None]
    ).length()
    return ContactKernel(
        ang_a=ang_a, ang_b=ang_b, ang_a_im=ang_a_im, ang_b_im=ang_b_im, eff=eff, bias=bias,
        live=live, normal=n, softness=softness,
        inv_mass_a=ia.inv_mass, inv_mass_b=ib.inv_mass,
        t1=t1, t2=t2, ang_a1=ang_a1, ang_a2=ang_a2, ang_b1=ang_b1, ang_b2=ang_b2,
        ang_a1_im=ang_a1_im, ang_a2_im=ang_a2_im, ang_b1_im=ang_b1_im, ang_b2_im=ang_b2_im,
        eff_t=eff_t, premul_friction=premul_friction,
        n_im_a=n_im_a, n_im_b=n_im_b, eff_tw=eff_tw,
        twist_lever=dist, twist_single=contact_count <= 1.0,
        lever0=jnp.maximum(0.0, prestep.depth[:, 0]),
        valid=prestep.valid,
    )


def apply_iteration(kern: ContactKernel, imp: ContactImpulses, va: BodyVel, vb: BodyVel, mask):
    """One velocity iteration using the precomputed kernel; only the rows in ``mask``
    update impulses/velocities. Numerically identical math to ``solve``.

    The four per-contact penetration solves are sequential within a record (each updates
    the body velocities the next reads — reference solve order). They run as a
    ``lax.scan`` over the contact axis: the loop boundary materializes each stage's
    velocities, which XLA's CPU elemental emitter needs — inlined, the 4-deep velocity
    chain re-expands exponentially per output element (measured 400ms for a 512-row pass
    vs <1ms scanned; TPU cost of the length-4 loop is negligible)."""
    import jax

    n = kern.normal
    live_all = kern.live & mask[:, None]

    def t4(x):  # (m, 4) → (4, m) scan-major
        return jnp.moveaxis(x, -1, 0)

    stage_xs = (
        jax.tree_util.tree_map(t4, kern.ang_a),
        jax.tree_util.tree_map(t4, kern.ang_b),
        jax.tree_util.tree_map(t4, kern.ang_a_im),
        jax.tree_util.tree_map(t4, kern.ang_b_im),
        t4(kern.eff), t4(kern.bias), t4(live_all), t4(imp.penetration),
    )

    def stage(carry, xs):
        va, vb = carry
        ang_a, ang_b, ang_a_im, ang_b_im, eff, bias, live, acc_k = xs
        csv = (
            va.linear.dot(n) - vb.linear.dot(n) + va.angular.dot(ang_a) + vb.angular.dot(ang_b)
        )
        negated_csi = acc_k * kern.softness + (csv - bias) * eff
        new_acc = jnp.maximum(0.0, acc_k - negated_csi)
        new_acc = jnp.where(live, new_acc, acc_k)
        corrective = jnp.where(live, new_acc - acc_k, 0.0)
        lin = n * corrective
        va = BodyVel(va.linear + lin * kern.inv_mass_a, va.angular + ang_a_im * corrective)
        vb = BodyVel(vb.linear - lin * kern.inv_mass_b, vb.angular + ang_b_im * corrective)
        return (va, vb), new_acc

    # CPU: keep the loop boundary (the elemental emitter needs it — see docstring).
    # TPU: the vectorized emitter CSEs properly; unrolling avoids 4 while-loop trips
    # per pass. Backend is fixed at trace time, so this is a static choice.
    unroll = 4 if jax.default_backend() == "tpu" else 1
    (va, vb), pen_t = jax.lax.scan(stage, (va, vb), stage_xs, unroll=unroll)
    pen = jnp.moveaxis(pen_t, 0, -1)

    # Tangent friction.
    csv1 = (
        vb.linear.dot(kern.t1) - va.linear.dot(kern.t1)
        - va.angular.dot(kern.ang_a1) - vb.angular.dot(kern.ang_b1)
    )
    csv2 = (
        vb.linear.dot(kern.t2) - va.linear.dot(kern.t2)
        - va.angular.dot(kern.ang_a2) - vb.angular.dot(kern.ang_b2)
    )
    if DEBUG_NEGATE_TANGENT_CSV:  # parity fault injection — see module header
        csv1, csv2 = -csv1, -csv2
    csi = kern.eff_t.transform(Vec2(csv1, csv2))
    pen_masked = pen * kern.live
    max_tangent = kern.premul_friction * jnp.sum(pen_masked, -1)
    prev_t = imp.tangent
    new_t = Vec2(prev_t.x + csi.x, prev_t.y + csi.y)
    mag = new_t.length()
    scale = jnp.minimum(1.0, max_tangent / jnp.maximum(1e-16, mag))
    new_t = new_t * scale
    rec_live = kern.valid & mask
    new_t = Vec2(jnp.where(rec_live, new_t.x, prev_t.x), jnp.where(rec_live, new_t.y, prev_t.y))
    cx = new_t.x - prev_t.x
    cy = new_t.y - prev_t.y
    lin_t = kern.t1 * cx + kern.t2 * cy
    va = BodyVel(
        va.linear + lin_t * kern.inv_mass_a,
        va.angular + kern.ang_a1_im * cx + kern.ang_a2_im * cy,
    )
    vb = BodyVel(
        vb.linear - lin_t * kern.inv_mass_b,
        vb.angular + kern.ang_b1_im * cx + kern.ang_b2_im * cy,
    )

    # Twist friction.
    twist_cap = jnp.where(
        kern.twist_single,
        kern.premul_friction * pen_masked[:, 0] * kern.lever0,
        kern.premul_friction * jnp.sum(pen_masked * kern.twist_lever, -1),
    )
    csv_tw = va.angular.dot(n) - vb.angular.dot(n)
    csi_tw = -csv_tw * kern.eff_tw
    prev_tw = imp.twist
    new_tw = jnp.clip(prev_tw + csi_tw, -twist_cap, twist_cap)
    new_tw = jnp.where(rec_live, new_tw, prev_tw)
    corr_tw = new_tw - prev_tw
    va = BodyVel(va.linear, va.angular + kern.n_im_a * corr_tw)
    vb = BodyVel(vb.linear, vb.angular - kern.n_im_b * corr_tw)

    return ContactImpulses(pen, new_t, new_tw), va, vb


def warm_start_kern(kern: ContactKernel, imp: ContactImpulses):
    """Warm-start velocity DELTAS from the precomputed kernel (pure accumulation — no
    velocity gather needed). Identical math to ``warm_start``."""
    pen = imp.penetration * kern.live  # (M,4)
    pen_total = jnp.sum(pen, -1)
    tx = jnp.where(kern.valid, imp.tangent.x, 0.0)
    ty = jnp.where(kern.valid, imp.tangent.y, 0.0)
    tw = jnp.where(kern.valid, imp.twist, 0.0)
    lin = kern.t1 * tx + kern.t2 * ty + kern.normal * pen_total
    sum4 = lambda v, w: Vec3(jnp.sum(v.x * w, -1), jnp.sum(v.y * w, -1), jnp.sum(v.z * w, -1))
    dva = BodyVel(
        lin * kern.inv_mass_a,
        kern.ang_a1_im * tx + kern.ang_a2_im * ty + sum4(kern.ang_a_im, pen)
        + kern.n_im_a * tw,
    )
    dvb = BodyVel(
        -1.0 * lin * kern.inv_mass_b,
        kern.ang_b1_im * tx + kern.ang_b2_im * ty + sum4(kern.ang_b_im, pen)
        - kern.n_im_b * tw,
    )
    return dva, dvb


def incremental_depth_update(prestep: ContactPrestep, va: BodyVel, vb: BodyVel, dt) -> ContactPrestep:
    """Per-substep depth update from relative contact velocity
    (reference PenetrationLimit.UpdatePenetrationDepth)."""
    off = prestep.offset_a  # (MP,4)
    wa = Vec3(va.angular.x[:, None], va.angular.y[:, None], va.angular.z[:, None])
    la = Vec3(va.linear.x[:, None], va.linear.y[:, None], va.linear.z[:, None])
    contact_vel_a = wa.cross(off) + la
    off_b = Vec3(
        off.x - prestep.offset_b.x[:, None],
        off.y - prestep.offset_b.y[:, None],
        off.z - prestep.offset_b.z[:, None],
    )
    wb = Vec3(vb.angular.x[:, None], vb.angular.y[:, None], vb.angular.z[:, None])
    lb = Vec3(vb.linear.x[:, None], vb.linear.y[:, None], vb.linear.z[:, None])
    contact_vel_b = wb.cross(off_b) + lb
    dv = contact_vel_a - contact_vel_b
    n4 = Vec3(
        prestep.normal.x[:, None], prestep.normal.y[:, None], prestep.normal.z[:, None]
    )
    depth_change = n4.dot(dv) * dt
    return prestep._replace(depth=prestep.depth - depth_change)
