"""Simulation observability metrics — energy/momentum/constraint health.

The reference exposes runtime health through invasive hash diagnostics and the
per-stage profiler (reference SimulationProfiler.cs:10, Demos/SimulationTimeSamples.cs);
its demos additionally track energy drift by summing body state. Here the whole body
state is a device pytree, so the same observability is a handful of fused reductions —
one jitted call returns every scalar at once (a single device round trip).

Intended uses: regression thresholds in tests (energy must not grow for a resting
pile), drift dashboards for long-running simulations, and capacity tuning (bank
utilization vs overflow diagnostics in StepDiagnostics).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .bodies import BodyState, KIND_DYNAMIC


class SimMetrics(NamedTuple):
    """All-scalar device pytree; ``float(...)`` any field to sync."""

    kinetic_energy: jnp.ndarray  # Σ ½(m·v² + ω·I·ω) over awake dynamics
    potential_energy: jnp.ndarray  # Σ m·(-g·p) over awake dynamics (0 where m=0)
    linear_momentum: jnp.ndarray  # (3,) Σ m·v
    angular_momentum_origin: jnp.ndarray  # (3,) Σ (p × m·v + I·ω) about the origin
    max_speed: jnp.ndarray  # max |v| over awake dynamics
    max_angular_speed: jnp.ndarray  # max |ω|
    max_penetration: jnp.ndarray  # deepest contact (m); 0 when separated
    contact_impulse_total: jnp.ndarray  # Σ accumulated normal impulses (solver load)
    awake_dynamic_count: jnp.ndarray  # int32
    sleeping_count: jnp.ndarray  # int32 sleeping dynamics (statics are never 'awake')
    contact_count: jnp.ndarray  # int32 live contact points
    pair_utilization: jnp.ndarray  # live cache records / capacity (capacity tuning)


def _body_terms(state: BodyState, gravity):
    dyn = (state.kind == KIND_DYNAMIC) & state.awake
    m = jnp.where(dyn & (state.inv_mass > 0), 1.0 / jnp.maximum(state.inv_mass, 1e-30), 0.0)
    v2 = state.vel.dot(state.vel)
    # World-frame inertia: I = (I_world^-1)^-1 applied to ω; avoid the explicit inverse by
    # solving I^-1 · L = ω for L (Sym3 inverse is closed-form and cheap).
    ii = state.world_inv_inertia()
    inertia = ii.inverse(eps=1e-30)
    l_ang = inertia.transform(state.omega)  # I·ω
    rot_ke = 0.5 * state.omega.dot(l_ang)
    ke = jnp.sum(jnp.where(dyn, 0.5 * m * v2 + rot_ke, 0.0))

    g = jnp.asarray(gravity, jnp.float32)
    p_dot_g = state.pos.x * g[0] + state.pos.y * g[1] + state.pos.z * g[2]
    pe = jnp.sum(jnp.where(dyn, -m * p_dot_g, 0.0))

    mv = jnp.stack(
        [
            jnp.sum(jnp.where(dyn, m * state.vel.x, 0.0)),
            jnp.sum(jnp.where(dyn, m * state.vel.y, 0.0)),
            jnp.sum(jnp.where(dyn, m * state.vel.z, 0.0)),
        ]
    )
    # p × mv + I·ω
    cx = state.pos.y * m * state.vel.z - state.pos.z * m * state.vel.y
    cy = state.pos.z * m * state.vel.x - state.pos.x * m * state.vel.z
    cz = state.pos.x * m * state.vel.y - state.pos.y * m * state.vel.x
    lm = jnp.stack(
        [
            jnp.sum(jnp.where(dyn, cx + l_ang.x, 0.0)),
            jnp.sum(jnp.where(dyn, cy + l_ang.y, 0.0)),
            jnp.sum(jnp.where(dyn, cz + l_ang.z, 0.0)),
        ]
    )
    speed = jnp.sqrt(jnp.maximum(v2, 0.0))
    wspeed = jnp.sqrt(jnp.maximum(state.omega.dot(state.omega), 0.0))
    return dyn, ke, pe, mv, lm, speed, wspeed


def compute_metrics(state, shapes, config) -> SimMetrics:
    """Jit-compatible: reduce a SimState (+ caches) to SimMetrics scalars."""
    bodies = state.bodies
    dyn, ke, pe, mv, lm, speed, wspeed = _body_terms(
        bodies, config.integrator.gravity
    )
    # Sleeping pairs keep their records in the retention banks (simulation.py SimState),
    # so a fully-settled scene still reports its support impulses.
    caches = [state.cache, state.ccache, state.sleep_cache, state.sleep_ccache]
    live = [c.valid for c in caches]
    # PairCache.penetration holds accumulated normal impulses per contact (warm-start
    # payload); depth comes from the narrow phase during the step, so expose the cached
    # impulse sum (solver load) and count.
    imp_total = sum(jnp.sum(jnp.where(lv[:, None], c.penetration, 0.0)) for c, lv in zip(caches, live))
    n_contacts = sum(
        jnp.sum(jnp.where(lv[:, None], (c.feature >= 0) & (c.penetration != 0.0), False).astype(jnp.int32))
        for c, lv in zip(caches, live)
    )
    util_live = sum(jnp.sum(lv.astype(jnp.int32)) for lv in live)
    util_cap = sum(lv.shape[0] for lv in live)
    # Persistent pair store (simulation.py use_pair_store): convex records + impulses
    # live in slot-stable store rows, not the per-frame caches.
    if getattr(state, "store", None) is not None:
        st = state.store
        imp_total = imp_total + jnp.sum(
            jnp.where(st.live[:, None], st.imp_pen, 0.0)
        )
        n_contacts = n_contacts + jnp.sum(
            jnp.where(
                st.live[:, None], (st.feature >= 0) & (st.imp_pen != 0.0), False
            ).astype(jnp.int32)
        )
        util_live = util_live + jnp.sum(st.live.astype(jnp.int32))
        util_cap = util_cap + st.live.shape[0]
    util = util_live / float(util_cap)
    dyn_all = bodies.kind == KIND_DYNAMIC
    return SimMetrics(
        kinetic_energy=ke,
        potential_energy=pe,
        linear_momentum=mv,
        angular_momentum_origin=lm,
        max_speed=jnp.max(jnp.where(dyn, speed, 0.0)),
        max_angular_speed=jnp.max(jnp.where(dyn, wspeed, 0.0)),
        max_penetration=jnp.max(
            jnp.where(live[0][:, None], jnp.abs(caches[0].penetration), 0.0)
        ),
        contact_impulse_total=imp_total,
        awake_dynamic_count=jnp.sum(dyn.astype(jnp.int32)),
        sleeping_count=jnp.sum((dyn_all & ~bodies.awake).astype(jnp.int32)),
        contact_count=n_contacts,
        pair_utilization=util,
    )


def simulation_metrics(sim) -> SimMetrics:
    """Host entry point: ``metrics = simulation_metrics(sim)`` (one fused device call).

    All fields are device scalars; convert with float()/np.asarray() as needed.
    """
    if sim._dirty:
        sim._push()
    if not hasattr(sim, "_metrics_fn"):
        sim._metrics_fn = {}
    key = sim.config
    fn = sim._metrics_fn.get(key)
    if fn is None:
        fn = jax.jit(lambda st, sh: compute_metrics(st, sh, key))
        sim._metrics_fn[key] = fn
    return fn(sim._state, sim.shapes.device())


class TraceSession:
    """jax.profiler integration — the reference's invasive tracing equivalent
    (SURVEY §5 tracing/profiling). Captures a TensorBoard-loadable device trace:

        with TraceSession("/tmp/trace"):
            sim.run(100, dt)

    Pair with ``profiling.profile_stages`` for per-stage wall times.
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False
