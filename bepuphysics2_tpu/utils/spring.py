"""Spring settings → TGS softness constants.

Mirrors the semantics of the reference's ``SpringSettingsWide.ComputeSpringiness``
(reference: BepuPhysics/Constraints/SpringSettings.cs:37-57): a constraint parameterized by
(angular frequency ω, twice damping ratio 2ζ) yields, for a substep of duration dt:

- ``position_error_to_velocity`` = ω / (ω·dt + 2ζ)   (ERP / dt)
- ``effective_mass_cfm_scale``   = 1 / (1 + extra),   extra = 1 / (ω·dt·(ω·dt + 2ζ))
- ``softness_impulse_scale``     = extra · effective_mass_cfm_scale
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class SpringSettings(NamedTuple):
    """Per-constraint spring parameters. ``angular_frequency`` = 2π × frequency;
    ``twice_damping_ratio`` = 2 × damping ratio (storage matches the reference layout)."""

    angular_frequency: jnp.ndarray
    twice_damping_ratio: jnp.ndarray

    @staticmethod
    def make(frequency, damping_ratio) -> "SpringSettings":
        return SpringSettings(
            jnp.asarray(frequency, jnp.float32) * (2.0 * jnp.pi),
            jnp.asarray(damping_ratio, jnp.float32) * 2.0,
        )


def compute_springiness(settings: SpringSettings, dt):
    """Returns (position_error_to_velocity, effective_mass_cfm_scale, softness_impulse_scale)."""
    w_dt = settings.angular_frequency * dt
    position_error_to_velocity = settings.angular_frequency / (w_dt + settings.twice_damping_ratio)
    extra = 1.0 / (w_dt * (w_dt + settings.twice_damping_ratio))
    effective_mass_cfm_scale = 1.0 / (1.0 + extra)
    softness_impulse_scale = extra * effective_mass_cfm_scale
    return position_error_to_velocity, effective_mass_cfm_scale, softness_impulse_scale
