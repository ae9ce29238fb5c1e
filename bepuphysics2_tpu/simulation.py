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
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .bodies import BodyBuffer, BodyDescription, BodyState, StaticDescription
from .collision import broadphase as bp
from .collision.narrowphase import PairCache, narrow_phase, update_cache
from .collision.raycast import ray_cast_all
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
    broadphase: str = "auto"  # 'brute' | 'sweep' | 'auto'
    joint_capacity: int = 256  # per-type bank capacity
    sweep_window: int = 64
    integrator: IntegratorConfig = IntegratorConfig()
    # Sleeping (reference IslandSleeper velocity/timer heuristic, IslandSleeper.cs:28):
    enable_sleep: bool = False  # round 1 default off; island logic lands with the sleeper
    sleep_time: float = 1.0

    def solve_config(self) -> SolveConfig:
        return SolveConfig(
            substeps=self.substeps,
            velocity_iterations=self.velocity_iterations,
            num_colors=self.num_colors,
        )


class SimState(NamedTuple):
    """Full device-side simulation state (a pytree; checkpointable wholesale)."""

    bodies: BodyState
    cache: PairCache
    joint_impulses: dict


class StepDiagnostics(NamedTuple):
    pair_count: jnp.ndarray
    contact_count: jnp.ndarray
    overflow: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("config",))
def step(state: SimState, shapes, joint_banks, dt, config: SimConfig):
    """One full timestep. Pure function: (state, shapes, joints, dt) → (state', diagnostics)."""
    bodies = state.bodies

    # --- Predict bounding boxes (speculative AABBs).
    aabb_min, aabb_max = compute_body_bounds(
        bodies.pos, bodies.orn, bodies.vel, bodies.omega, bodies.shape, shapes, dt
    )
    # Bodies without collidables never overlap.
    has_shape = bodies.shape >= 0
    big = jnp.float32(3.0e38)
    aabb_min = aabb_min.where(has_shape, Vec3.full(has_shape.shape, big, big, big))
    aabb_max = aabb_max.where(has_shape, Vec3.full(has_shape.shape, -big, -big, -big))

    # --- Broad phase.
    method = config.broadphase
    if method == "auto":
        method = "brute" if config.body_capacity <= 2048 else "sweep"
    if method == "brute":
        pairs = bp.brute_force(aabb_min, aabb_max, bodies.kind, bodies.awake, config.max_pairs)
    else:
        pairs = bp.sweep(
            aabb_min, aabb_max, bodies.kind, bodies.awake, config.max_pairs, config.sweep_window
        )

    # --- Narrow phase (manifolds + constraint records + warm-start carry).
    prestep, imp = narrow_phase(bodies, shapes, pairs, state.cache, dt)

    # --- Solve (substepped TGS; includes all pose/velocity integration).
    banks = {
        name: dict(joint_banks[name], impulse=state.joint_impulses[name])
        for name in joint_banks
    }
    bodies, imp, joint_imps = solve_all(
        bodies, prestep, imp, banks, config.integrator, config.solve_config(), dt
    )

    # --- Persist warm-start data.
    cache = update_cache(prestep, imp, config.body_capacity)

    diag = StepDiagnostics(
        pair_count=jnp.sum(pairs.valid),
        contact_count=jnp.sum(prestep.contact_mask & prestep.valid[:, None]),
        overflow=pairs.overflow,
    )
    return SimState(bodies, cache, joint_imps), diag


class Simulation:
    """Host-side facade (reference Simulation.Create; Simulation.cs:106)."""

    def __init__(self, config: SimConfig = SimConfig()):
        self.config = config
        self.shapes = ShapeRegistry(config.shape_capacity)
        self._host = BodyBuffer(config.body_capacity)
        self.joints: dict = {}  # name -> JointTypeStore
        self._state: Optional[SimState] = None
        self._dirty = True
        self.last_diag: Optional[StepDiagnostics] = None

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

    @property
    def constraint_count(self) -> int:
        return sum(s.count for s in self.joints.values())

    # --- state access ------------------------------------------------------------------
    def _sync_from_device(self) -> None:
        if self._state is not None and not self._dirty:
            self._host.load(self._state.bodies)
            for name, imps in self._state.joint_impulses.items():
                self.joints[name].load_impulses(imps)
            self._dirty = True  # host is now the source of truth

    def _push(self) -> None:
        cache = self._state.cache if self._state is not None else PairCache.empty(self.config.max_pairs)
        joint_imps = {
            name: jnp.asarray(store.impulse)
            for name, store in self.joints.items()
            if store.count > 0
        }
        self._state = SimState(self._host.device(), cache, joint_imps)
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

    def set_velocity(self, handle: int, linear=None, angular=None) -> None:
        self._sync_from_device()
        if linear is not None:
            self._host.vx[handle], self._host.vy[handle], self._host.vz[handle] = linear
        if angular is not None:
            self._host.wx[handle], self._host.wy[handle], self._host.wz[handle] = angular

    # --- queries -----------------------------------------------------------------------
    def ray_cast(self, origin, direction, max_t: float = 1.0e30):
        """Scene ray cast (reference Simulation.RayCast, Simulation_Queries.cs:167).
        ``origin``/``direction``: 3-tuples or (R,3) arrays for batched rays.
        Returns RayHit(hit, t, body, normal)."""
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
        return ray_cast_all(
            self._state.bodies, self.shapes.device(), ov, dv, jnp.float32(max_t)
        )

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
        self._state, self.last_diag = step(
            self._state, self.shapes.device(), banks, jnp.float32(dt), self.config
        )

    def run(self, steps: int, dt: float = 1.0 / 60.0) -> None:
        for _ in range(steps):
            self.timestep(dt)
