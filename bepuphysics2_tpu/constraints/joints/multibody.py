"""Three- and four-body constraints: AreaConstraint, VolumeConstraint (reference
Constraints/AreaConstraint.cs, VolumeConstraint.cs) — cloth/softbody volume preservation.

Bank convention: these use the 4-body bank (body_c/body_d columns); AreaConstraint sets
body_d = body_a with dynamic_d = False."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...utils.spring import compute_springiness
from ...utils.vec import Vec3
from ..contact import BodyVel
from .base import JointContext, get_spring, spring_cols, zero_dv


def _safe_eff(cfm, inv_eff):
    """cfm / inv_eff guarded for zero total inverse mass (locked-inertia pairs) —
    see angular._safe_eff; raw division yields inf → NaN velocities."""
    return jnp.where(inv_eff > 0.0, cfm / jnp.maximum(inv_eff, 1e-30), 0.0)




class MultiBodyContext:
    """Gathered state for 4-body banks (A, B, C, D)."""

    def __init__(self, pos, vel, inv_mass, active):
        self.pos = pos  # list[Vec3] × 4
        self.vel = vel  # list[BodyVel] × 4
        self.inv_mass = inv_mass  # list × 4
        self.active = active


class AreaConstraint:
    """Maintains 2× the area of triangle ABC (reference Constraints/AreaConstraint.cs).
    prestep: target_scaled_area(1), spring(2). impulse: 1. Linear jacobians only."""

    name = "area"
    # Description layout (generic unpack_fields — reference GetDescription).
    FIELDS = (("target_scaled_area", "scalar"), ("spring", "spring"))
    N_PRESTEP = 3
    N_IMPULSE = 1
    N_BODIES = 3

    @staticmethod
    def pack(d) -> np.ndarray:
        return np.array(
            [d.target_scaled_area, *spring_cols(d.spring_frequency, d.spring_damping)],
            np.float32,
        )

    @staticmethod
    def _jacobians(ctx: MultiBodyContext):
        pa, pb, pc = ctx.pos[0], ctx.pos[1], ctx.pos[2]
        ab = pb - pa
        ac = pc - pa
        abxac = ab.cross(ac)
        normal_length = abxac.length()
        normal = abxac * jnp.where(normal_length > 1e-10, 1.0 / jnp.maximum(normal_length, 1e-10), 0.0)
        jac_b = ac.cross(normal)
        jac_c = normal.cross(ab)
        neg_jac_a = jac_b + jac_c
        ca = neg_jac_a.length_squared()
        cb = jac_b.length_squared()
        cc = jac_c.length_squared()
        j2 = jnp.maximum(1e-14, ca + cb + cc)
        inv_jlen = 1.0 / jnp.sqrt(j2)
        return normal_length, neg_jac_a, jac_b, jac_c, ca, cb, cc, inv_jlen

    @staticmethod
    def _apply(ctx, neg_jac_a, jac_b, jac_c, scaled_csi):
        dv = [
            BodyVel(-1.0 * neg_jac_a * (scaled_csi * ctx.inv_mass[0]), Vec3.zeros(scaled_csi.shape)),
            BodyVel(jac_b * (scaled_csi * ctx.inv_mass[1]), Vec3.zeros(scaled_csi.shape)),
            BodyVel(jac_c * (scaled_csi * ctx.inv_mass[2]), Vec3.zeros(scaled_csi.shape)),
            zero_dv(scaled_csi.shape),
        ]
        return dv

    @staticmethod
    def warm_start(p, imp, ctx: MultiBodyContext):
        _, nja, jb, jc, *_rest, inv_jlen = AreaConstraint._jacobians(ctx)
        return AreaConstraint._apply(ctx, nja, jb, jc, inv_jlen * imp[:, 0])

    @staticmethod
    def solve(p, imp, ctx: MultiBodyContext, dt, inv_dt):
        normal_length, nja, jb, jc, ca, cb, cc, inv_jlen = AreaConstraint._jacobians(ctx)
        err_to_vel, cfm, softness = compute_springiness(get_spring(p, 1), dt)
        inv_eff = jnp.maximum(
            1e-14,
            inv_jlen * inv_jlen * (ca * ctx.inv_mass[0] + cb * ctx.inv_mass[1] + cc * ctx.inv_mass[2]),
        )
        eff = _safe_eff(cfm, inv_eff)
        bias = (p[:, 0] - normal_length) * inv_jlen * err_to_vel
        csv = inv_jlen * (
            ctx.vel[1].linear.dot(jb) + ctx.vel[2].linear.dot(jc) - ctx.vel[0].linear.dot(nja)
        )
        csi = (bias - csv) * eff - imp[:, 0] * softness
        csi = jnp.where(ctx.active, csi, 0.0)
        new_acc = imp[:, 0] + csi
        dv = AreaConstraint._apply(ctx, nja, jb, jc, inv_jlen * csi)
        return new_acc[:, None], dv


class VolumeConstraint:
    """Maintains 6× the volume of tetrahedron ABCD (reference
    Constraints/VolumeConstraint.cs). prestep: target_scaled_volume(1), spring(2).
    impulse: 1. Linear jacobians only."""

    name = "volume"
    # Description layout (generic unpack_fields — reference GetDescription).
    FIELDS = (("target_scaled_volume", "scalar"), ("spring", "spring"))
    N_PRESTEP = 3
    N_IMPULSE = 1
    N_BODIES = 4

    @staticmethod
    def pack(d) -> np.ndarray:
        return np.array(
            [d.target_scaled_volume, *spring_cols(d.spring_frequency, d.spring_damping)],
            np.float32,
        )

    @staticmethod
    def _jacobians(ctx: MultiBodyContext):
        pa, pb, pc, pd = ctx.pos
        ab = pb - pa
        ac = pc - pa
        ad = pd - pa
        jac_b = ac.cross(ad)
        jac_c = ad.cross(ab)
        jac_d = ab.cross(ac)
        neg_jac_a = jac_b + jac_c + jac_d
        ca = neg_jac_a.length_squared()
        cb = jac_b.length_squared()
        cc = jac_c.length_squared()
        cd = jac_d.length_squared()
        j2 = jnp.maximum(1e-14, ca + cb + cc + cd)
        inv_jlen = 1.0 / jnp.sqrt(j2)
        return ad, neg_jac_a, jac_b, jac_c, jac_d, ca, cb, cc, cd, inv_jlen

    @staticmethod
    def _apply(ctx, nja, jb, jc, jd, scaled_csi):
        return [
            BodyVel(-1.0 * nja * (scaled_csi * ctx.inv_mass[0]), Vec3.zeros(scaled_csi.shape)),
            BodyVel(jb * (scaled_csi * ctx.inv_mass[1]), Vec3.zeros(scaled_csi.shape)),
            BodyVel(jc * (scaled_csi * ctx.inv_mass[2]), Vec3.zeros(scaled_csi.shape)),
            BodyVel(jd * (scaled_csi * ctx.inv_mass[3]), Vec3.zeros(scaled_csi.shape)),
        ]

    @staticmethod
    def warm_start(p, imp, ctx: MultiBodyContext):
        _, nja, jb, jc, jd, *_rest, inv_jlen = VolumeConstraint._jacobians(ctx)
        return VolumeConstraint._apply(ctx, nja, jb, jc, jd, inv_jlen * imp[:, 0])

    @staticmethod
    def solve(p, imp, ctx: MultiBodyContext, dt, inv_dt):
        ad, nja, jb, jc, jd, ca, cb, cc, cd, inv_jlen = VolumeConstraint._jacobians(ctx)
        err_to_vel, cfm, softness = compute_springiness(get_spring(p, 1), dt)
        inv_eff = jnp.maximum(
            1e-14,
            inv_jlen
            * inv_jlen
            * (
                ca * ctx.inv_mass[0]
                + cb * ctx.inv_mass[1]
                + cc * ctx.inv_mass[2]
                + cd * ctx.inv_mass[3]
            ),
        )
        eff = _safe_eff(cfm, inv_eff)
        volume = jd.dot(ad)
        bias = (p[:, 0] - volume) * inv_jlen * err_to_vel
        csv = inv_jlen * (
            ctx.vel[1].linear.dot(jb)
            + ctx.vel[2].linear.dot(jc)
            + ctx.vel[3].linear.dot(jd)
            - ctx.vel[0].linear.dot(nja)
        )
        csi = (bias - csv) * eff - imp[:, 0] * softness
        csi = jnp.where(ctx.active, csi, 0.0)
        new_acc = imp[:, 0] + csi
        dv = VolumeConstraint._apply(ctx, nja, jb, jc, jd, inv_jlen * csi)
        return new_acc[:, None], dv
