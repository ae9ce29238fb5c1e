"""Integrator tests: ballistic motion, angular modes, gyroscopic precession
(mirrors reference gyroscope demos & InertiaTensorTests intent)."""
import numpy as np
import jax.numpy as jnp

from bepuphysics2_tpu.bodies import BodyBuffer, BodyDescription, KIND_DYNAMIC
from bepuphysics2_tpu.integrator import (
    ANGULAR_CONSERVE_MOMENTUM,
    ANGULAR_CONSERVE_WITH_GYROSCOPIC,
    IntegratorConfig,
    integrate_poses,
    integrate_velocities,
)


def make_single_body(inv_inertia=(1.0, 0.0, 1.0, 0.0, 0.0, 1.0), omega=(0, 0, 0), vel=(0, 0, 0)):
    buf = BodyBuffer(4)
    h = buf.add(
        BodyDescription(
            position=(0, 10.0, 0), velocity=vel, angular_velocity=omega,
            inv_mass=1.0, inv_inertia=inv_inertia, kind=KIND_DYNAMIC,
        )
    )
    return buf.device(), h


def run_steps(state, cfg, dt, steps, collect=None):
    """jit+scan driver: integrate velocities then poses for `steps` steps."""
    import jax

    def body(state, _):
        state = integrate_velocities(state, cfg, dt)
        state = integrate_poses(state, cfg, dt)
        out = collect(state) if collect else 0
        return state, out

    state, outs = jax.jit(lambda s: jax.lax.scan(body, s, None, length=steps))(state)
    return state, outs


def test_ballistic_trajectory():
    state, h = make_single_body(vel=(2.0, 5.0, 0.0))
    cfg = IntegratorConfig(gravity=(0.0, -10.0, 0.0))
    dt = 1.0 / 240.0
    state, _ = run_steps(state, cfg, dt, 240)
    t = 1.0
    # semi-implicit Euler: y = y0 + v0 t - g (t(t+dt))/2 ; x exact
    x = float(state.pos.x[h])
    y = float(state.pos.y[h])
    assert abs(x - 2.0) < 1e-3
    y_expected = 10.0 + 5.0 * t - 0.5 * 10.0 * t * (t + dt)
    assert abs(y - y_expected) < 1e-2


def test_kinematic_and_static_do_not_fall():
    buf = BodyBuffer(4)
    hk = buf.add(BodyDescription.kinematic((0, 5.0, 0)))
    from bepuphysics2_tpu.bodies import StaticDescription

    hs = buf.add(StaticDescription(position=(0, 1.0, 0)))
    state = buf.device()
    cfg = IntegratorConfig()
    state, _ = run_steps(state, cfg, 0.01, 10)
    assert float(state.pos.y[hk]) == 5.0
    assert float(state.pos.y[hs]) == 1.0
    assert float(state.vel.y[hk]) == 0.0


def test_momentum_conservation_mode():
    """Asymmetric body tumbling: |L| should stay ~constant in conserve mode."""
    inv_i = (1.0, 0.0, 0.5, 0.0, 0.0, 0.2)  # asymmetric diag
    state, h = make_single_body(inv_inertia=inv_i, omega=(3.0, 0.1, 0.0))
    cfg = IntegratorConfig(gravity=(0, 0, 0), angular_mode=ANGULAR_CONSERVE_MOMENTUM)

    def momentum(state):
        ii = state.world_inv_inertia()
        inertia = ii.inverse()
        L = inertia.transform(state.omega)
        return np.array([float(L.x[h]), float(L.y[h]), float(L.z[h])])

    L0 = momentum(state)
    state, _ = run_steps(state, cfg, 1 / 120.0, 200)
    L1 = momentum(state)
    np.testing.assert_allclose(L1, L0, rtol=2e-2, atol=1e-4)


def test_gyroscopic_dzhanibekov_instability():
    """Intermediate-axis spin must wobble under the gyroscopic mode (the reference's
    Dzhanibekov demo behavior) — the off-axis components grow from a tiny perturbation."""
    inv_i = (1.0 / 1.0, 0.0, 1.0 / 2.0, 0.0, 0.0, 1.0 / 3.0)  # I = diag(1, 2, 3)
    state, h = make_single_body(inv_inertia=inv_i, omega=(0.001, 5.0, 0.0))
    cfg = IntegratorConfig(gravity=(0, 0, 0), angular_mode=ANGULAR_CONSERVE_WITH_GYROSCOPIC)
    state, wx = run_steps(state, cfg, 1 / 120.0, 2000, collect=lambda s: s.omega.x[h])
    max_wx = float(abs(wx).max())
    assert max_wx > 0.5, f"intermediate axis flip did not develop (max |wx| = {max_wx})"


def test_nonconserving_keeps_omega():
    state, h = make_single_body(omega=(1.0, 2.0, 3.0))
    cfg = IntegratorConfig(gravity=(0, 0, 0))
    state, _ = run_steps(state, cfg, 0.01, 50)
    np.testing.assert_allclose(
        [float(state.omega.x[h]), float(state.omega.y[h]), float(state.omega.z[h])],
        [1.0, 2.0, 3.0],
        atol=1e-5,
    )
