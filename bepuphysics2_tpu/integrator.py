"""Pose/velocity integration — vectorized over all bodies, all three angular modes.

The reference embeds body integration inside the solver's first warm start per substep to
save bandwidth on CPUs (reference: Solver_Solve.cs, TwoBodyTypeProcessor.cs:168
``GatherAndIntegrate``). On TPU divergence is costlier than FLOPs, so integration is a
separate fully-vectorized pass per substep over *all* integrable bodies with identical TGS
semantics: velocities integrate (user callback: gravity/damping) at the start of every
substep; poses integrate between substeps and once after the final substep
(reference: PoseIntegrator.cs:424,707; angular modes PoseIntegrator.cs:23,122-255).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from .bodies import BodyState
from .utils.vec import Mat3, Quat, Sym3, Vec3, integrate_orientation

# Angular integration modes (reference PoseIntegrator.cs:23 AngularIntegrationMode).
ANGULAR_NONCONSERVING = 0
ANGULAR_CONSERVE_MOMENTUM = 1
ANGULAR_CONSERVE_WITH_GYROSCOPIC = 2


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    """Pose-integrator callbacks equivalent (reference IPoseIntegratorCallbacks,
    PoseIntegrator.cs:42). ``velocity_callback`` may override the default
    gravity+damping rule; it is traced into the jitted step (static policy, like the
    reference's compile-time callback structs)."""

    gravity: tuple = (0.0, -10.0, 0.0)
    linear_damping: float = 0.0
    angular_damping: float = 0.0
    angular_mode: int = ANGULAR_NONCONSERVING
    # fn(state: BodyState, dt) -> (vel: Vec3, omega: Vec3); None = gravity+damping default
    velocity_callback: Optional[Callable] = None


def _fallback_if_incompatible(prev: Vec3, new: Vec3) -> Vec3:
    """Keep previous angular velocity when momentum conservation produced non-finite values
    (kinematic / locked-inertia bodies; reference PoseIntegrator.cs:184)."""
    ok = (
        (jnp.abs(new.x) < jnp.inf) & (jnp.abs(new.y) < jnp.inf) & (jnp.abs(new.z) < jnp.inf)
    )
    return new.where(ok, prev)


def integrate_angular_conserve_momentum(
    prev_orn: Quat, local_inv_inertia: Sym3, world_inv_inertia: Sym3, omega: Vec3
) -> Vec3:
    """L = R_prev^T I_local R_prev ω kept constant; ω' = I_world^-1 L
    (reference PoseIntegrator.cs:195-209)."""
    r_prev = prev_orn.to_matrix()
    local_omega = r_prev.transform_transpose(omega)
    local_inertia = local_inv_inertia.inverse()
    local_momentum = local_inertia.transform(local_omega)
    momentum = r_prev.transform(local_momentum)
    new_omega = world_inv_inertia.transform(momentum)
    return _fallback_if_incompatible(omega, new_omega)


def integrate_angular_gyroscopic(orn: Quat, local_inv_inertia: Sym3, omega: Vec3, dt) -> Vec3:
    """Implicit gyroscopic torque via one Newton step in local frame
    (reference PoseIntegrator.cs:211-255)."""
    r = orn.to_matrix()
    local_omega = r.transform_transpose(omega)
    local_inertia = local_inv_inertia.inverse()
    local_momentum = local_inertia.transform(local_omega)
    residual = local_momentum.cross(local_omega) * dt

    skew_momentum = Mat3.cross_matrix(local_momentum)
    skew_velocity = Mat3.cross_matrix(local_omega)
    # local_inertia as dense Mat3 for the jacobian
    inertia_m = Mat3(
        Vec3(local_inertia.xx, local_inertia.yx, local_inertia.zx),
        Vec3(local_inertia.yx, local_inertia.yy, local_inertia.zy),
        Vec3(local_inertia.zx, local_inertia.zy, local_inertia.zz),
    )
    change = (skew_velocity.matmul(inertia_m) - skew_momentum) * dt
    jacobian = inertia_m + change
    newton_step = jacobian.inverse().transform(residual)
    local_omega = local_omega - newton_step
    new_omega = r.transform(local_omega)
    return _fallback_if_incompatible(omega, new_omega)


def integrate_velocities(state: BodyState, cfg: IntegratorConfig, dt) -> BodyState:
    """One substep of velocity integration for dynamic awake bodies (gravity, damping,
    optional angular momentum handling). Kinematics/statics/sleepers untouched."""
    mask = (state.kind == 1) & state.awake  # dynamic & awake

    if cfg.velocity_callback is not None:
        new_vel, new_omega = cfg.velocity_callback(state, dt)
    else:
        g = Vec3(
            jnp.full_like(state.vel.x, cfg.gravity[0]),
            jnp.full_like(state.vel.x, cfg.gravity[1]),
            jnp.full_like(state.vel.x, cfg.gravity[2]),
        )
        lin_scale = (1.0 - cfg.linear_damping) ** dt if cfg.linear_damping else 1.0
        ang_scale = (1.0 - cfg.angular_damping) ** dt if cfg.angular_damping else 1.0
        new_vel = (state.vel + g * dt) * lin_scale
        new_omega = state.omega * ang_scale

    return state._replace(
        vel=new_vel.where(mask, state.vel),
        omega=new_omega.where(mask, state.omega),
    )


def integrate_poses(state: BodyState, cfg: IntegratorConfig, dt) -> BodyState:
    """One substep of pose integration for integrable bodies (dynamic + kinematic, awake).
    Angular-mode velocity adjustments run AFTER the orientation update, matching the
    reference's ordering (PoseIntegrator.cs:652-666): ConserveMomentum recomputes ω from
    the conserved L; the gyroscopic mode applies the implicit local-frame Newton step."""
    mask = state.integrable
    new_pos = state.pos + state.vel * dt
    new_orn = integrate_orientation(state.orn, state.omega, dt)

    omega = state.omega
    if cfg.angular_mode == ANGULAR_CONSERVE_MOMENTUM:
        world_inv_inertia = state.inv_inertia.rotation_sandwich(new_orn.to_matrix())
        omega_c = integrate_angular_conserve_momentum(
            state.orn, state.inv_inertia, world_inv_inertia, state.omega
        )
        omega = omega_c.where(mask & (state.kind == 1), state.omega)
    elif cfg.angular_mode == ANGULAR_CONSERVE_WITH_GYROSCOPIC:
        omega_c = integrate_angular_gyroscopic(new_orn, state.inv_inertia, state.omega, dt)
        omega = omega_c.where(mask & (state.kind == 1), state.omega)

    return state._replace(
        pos=new_pos.where(mask, state.pos),
        orn=new_orn.where(mask, state.orn),
        omega=omega,
    )
