"""Body state: fixed-capacity SoA pytree + host-side description API.

The reference splits body storage into active/sleeping ``BodySet``s with AoS rows gathered
into AoSoA bundles for the solver (reference: BepuPhysics/Bodies.cs:32, BodySet.cs:21,
BodyProperties.cs:319, Bodies_GatherScatter.cs:267). The TPU design instead keeps ONE
fixed-capacity struct-of-arrays pytree for *all* collidables — dynamic, kinematic, and
static alike — with per-body kind/mask fields:

- statics are body slots with zero inverse mass/inertia that never integrate; this unifies
  the reference's one-body/two-body constraint specializations into a single masked kernel
  (a static partner contributes nothing through its zero inverse inertia).
- sleeping is a mask (``awake``), not a set move — the island sleeper flips bits instead of
  copying memory (SURVEY §5.7 equivalence).

All mutation (add/remove/apply description) happens host-side between jitted steps, exactly
like the reference confines topology changes to well-defined stages.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .utils.vec import Quat, Sym3, Vec3

# Body kinds.
KIND_EMPTY = 0
KIND_DYNAMIC = 1
KIND_KINEMATIC = 2
KIND_STATIC = 3


class BodyState(NamedTuple):
    """Device pytree of all body state. Every leaf has leading dim = capacity NB."""

    pos: Vec3
    orn: Quat
    vel: Vec3
    omega: Vec3
    inv_mass: jnp.ndarray  # (NB,) 0 for kinematic/static
    inv_inertia: Sym3  # local-frame inverse inertia tensor
    kind: jnp.ndarray  # (NB,) int32 KIND_*
    awake: jnp.ndarray  # (NB,) bool — sleeping bodies don't integrate or collide vs sleeping
    shape: jnp.ndarray  # (NB,) int32 shape registry row, -1 = no collidable
    # Material (used to build contact constraints; reference PairMaterialProperties):
    friction: jnp.ndarray  # (NB,)
    spring_frequency: jnp.ndarray  # (NB,) Hz, combined per-pair
    spring_damping: jnp.ndarray  # (NB,) damping ratio
    max_recovery_velocity: jnp.ndarray  # (NB,)
    # Activity (sleep candidacy, reference BodyActivity):
    sleep_threshold: jnp.ndarray  # (NB,) velocity-squared heuristic threshold; <0 = never sleep
    sleep_timer: jnp.ndarray  # (NB,) accumulated time below threshold
    sleep_island: jnp.ndarray  # (NB,) int32 — island label stored at sleep time (for wake)
    # Collision filtering (reference INarrowPhaseCallbacks.AllowContactGeneration + the
    # demos' SubgroupCollisionFilter): two bodies sharing the same NONZERO group generate
    # no contacts (vehicles/ragdolls suppress self-collision this way). 0 = collide with all.
    collision_group: jnp.ndarray  # (NB,) int32
    # Continuous collision detection mode (reference ContinuousDetectionMode,
    # Collidables/Collidable.cs:9): 0 = Discrete/Passive (speculative margins only),
    # 1 = Continuous (fast pairs swept to time-of-impact in the narrow phase).
    continuity: jnp.ndarray  # (NB,) int32
    # Speculative margin bounds (reference Collidable.MinimumSpeculativeMargin /
    # MaximumSpeculativeMargin, Collidables/Collidable.cs:131,139): the velocity-based
    # pair margin in the narrow phase is floored by the larger endpoint minimum and
    # capped by the smaller endpoint maximum. The resting default (0.1) is the baseline
    # speculative band that keeps stacks stable without contact chatter.
    spec_margin_min: jnp.ndarray  # (NB,)
    spec_margin_max: jnp.ndarray  # (NB,)

    @property
    def exists(self):
        return self.kind != KIND_EMPTY

    @property
    def is_dynamic(self):
        return self.kind == KIND_DYNAMIC

    @property
    def integrable(self):
        """Bodies whose pose/velocity integrate: awake dynamics and kinematics."""
        return ((self.kind == KIND_DYNAMIC) | (self.kind == KIND_KINEMATIC)) & self.awake

    def world_inv_inertia(self) -> Sym3:
        """I_world^-1 = R^T I_local^-1 R (reference PoseIntegrator.RotateInverseInertia)."""
        return self.inv_inertia.rotation_sandwich(self.orn.to_matrix())

    @staticmethod
    def empty(capacity: int) -> "BodyState":
        def z():
            # Fresh array per leaf: donated pytrees must not alias buffers.
            return jnp.zeros(capacity, jnp.float32)

        return BodyState(
            pos=Vec3.zeros(capacity),
            orn=Quat.identity(capacity),
            vel=Vec3.zeros(capacity),
            omega=Vec3.zeros(capacity),
            inv_mass=z(),
            inv_inertia=Sym3.zeros(capacity),
            kind=jnp.zeros(capacity, jnp.int32),
            awake=jnp.zeros(capacity, bool),
            shape=jnp.full(capacity, -1, jnp.int32),
            friction=z(),
            spring_frequency=z(),
            spring_damping=z(),
            max_recovery_velocity=z(),
            sleep_threshold=z(),
            sleep_timer=z(),
            sleep_island=jnp.zeros(capacity, jnp.int32),
            collision_group=jnp.zeros(capacity, jnp.int32),
            continuity=jnp.zeros(capacity, jnp.int32),
            spec_margin_min=jnp.full(capacity, 0.1, jnp.float32),
            spec_margin_max=jnp.full(capacity, 3.0e38, jnp.float32),
        )


@dataclasses.dataclass
class BodyDescription:
    """Mirror of reference BodyDescription (BepuPhysics/BodyDescription.cs). Pose+velocity
    +inertia+collidable+activity in one host-side object."""

    position: tuple = (0.0, 0.0, 0.0)
    orientation: tuple = (0.0, 0.0, 0.0, 1.0)
    velocity: tuple = (0.0, 0.0, 0.0)
    angular_velocity: tuple = (0.0, 0.0, 0.0)
    inv_mass: float = 0.0
    inv_inertia: tuple = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)  # xx, yx, yy, zx, zy, zz
    shape: int = -1
    kind: int = KIND_DYNAMIC
    friction: float = 1.0
    spring_frequency: float = 30.0
    spring_damping: float = 1.0
    max_recovery_velocity: float = 2.0
    sleep_threshold: float = 0.01
    # Minimum speculative margin: the resting-contact speculative band (reference
    # Collidable.MinimumSpeculativeMargin, Collidables/Collidable.cs:131).
    speculative_margin: float = 0.1
    # Maximum speculative margin: caps the velocity-based margin — lower it on fast
    # bodies to filter ghost collisions (Collidable.MaximumSpeculativeMargin, :139).
    speculative_margin_max: float = 3.0e38
    collision_group: int = 0  # same nonzero group → no contacts (self-collision filter)
    continuity: int = 0  # 0 = Discrete/Passive; 1 = Continuous (swept CCD)

    @staticmethod
    def dynamic(position, shape, mass, shape_obj=None, **kw) -> "BodyDescription":
        """Convenience: compute inertia from the shape object (host registry entry)."""
        if shape_obj is not None:
            res = shape_obj.compute_inertia(mass)
            if len(res) == 3:  # hull: full symmetric inverse inertia
                inv_mass, _diag, inv = res
                inv_inertia = (
                    float(inv[0, 0]), float(inv[1, 0]), float(inv[1, 1]),
                    float(inv[2, 0]), float(inv[2, 1]), float(inv[2, 2]),
                )
            else:
                inv_mass, diag = res
                inv_inertia = (diag[0], 0.0, diag[1], 0.0, 0.0, diag[2])
        else:
            inv_mass = 1.0 / mass
            inv_inertia = (inv_mass, 0.0, inv_mass, 0.0, 0.0, inv_mass)
        return BodyDescription(
            position=position, shape=shape, inv_mass=inv_mass, inv_inertia=inv_inertia,
            kind=KIND_DYNAMIC, **kw,
        )

    @staticmethod
    def kinematic(position, shape=-1, **kw) -> "BodyDescription":
        return BodyDescription(position=position, shape=shape, kind=KIND_KINEMATIC, **kw)


@dataclasses.dataclass
class StaticDescription:
    """Mirror of reference StaticDescription (BepuPhysics/Statics.cs:61)."""

    position: tuple = (0.0, 0.0, 0.0)
    orientation: tuple = (0.0, 0.0, 0.0, 1.0)
    shape: int = -1
    friction: float = 1.0
    spring_frequency: float = 30.0
    spring_damping: float = 1.0
    max_recovery_velocity: float = 2.0
    collision_group: int = 0
    speculative_margin: float = 0.1
    speculative_margin_max: float = 3.0e38


class BodyBuffer:
    """Host-side numpy staging for body state with handle (=slot) recycling. Mirrors the
    handle→slot bookkeeping of reference Bodies.Add/RemoveAt (Bodies.cs:183,267), minus the
    memory compaction — fixed capacity + masks replaces swap-removal."""

    FIELDS_F32 = [
        "px", "py", "pz", "qx", "qy", "qz", "qw", "vx", "vy", "vz", "wx", "wy", "wz",
        "inv_mass", "ixx", "iyx", "iyy", "izx", "izy", "izz",
        "friction", "spring_frequency", "spring_damping", "max_recovery_velocity",
        "sleep_threshold", "sleep_timer", "spec_margin_min", "spec_margin_max",
    ]

    def __init__(self, capacity: int):
        self.capacity = capacity
        for f in self.FIELDS_F32:
            setattr(self, f, np.zeros(capacity, np.float32))
        self.qw[:] = 1.0
        self.spec_margin_min[:] = 0.1
        self.spec_margin_max[:] = 3.0e38
        self.kind = np.zeros(capacity, np.int32)
        self.awake = np.zeros(capacity, bool)
        self.shape = np.full(capacity, -1, np.int32)
        self.sleep_island = np.zeros(capacity, np.int32)
        self.collision_group = np.zeros(capacity, np.int32)
        self.continuity = np.zeros(capacity, np.int32)
        self._free = list(range(capacity - 1, -1, -1))

    def add(self, d) -> int:
        if not self._free:
            raise RuntimeError("body buffer full; raise capacity")
        i = self._free.pop()
        is_static = isinstance(d, StaticDescription)
        self.px[i], self.py[i], self.pz[i] = d.position
        self.qx[i], self.qy[i], self.qz[i], self.qw[i] = d.orientation
        if is_static:
            self.vx[i] = self.vy[i] = self.vz[i] = 0
            self.wx[i] = self.wy[i] = self.wz[i] = 0
            self.inv_mass[i] = 0
            self.ixx[i] = self.iyx[i] = self.iyy[i] = 0
            self.izx[i] = self.izy[i] = self.izz[i] = 0
            self.kind[i] = KIND_STATIC
            self.awake[i] = False
            self.sleep_threshold[i] = 0
        else:
            self.vx[i], self.vy[i], self.vz[i] = d.velocity
            self.wx[i], self.wy[i], self.wz[i] = d.angular_velocity
            self.inv_mass[i] = d.inv_mass if d.kind == KIND_DYNAMIC else 0.0
            ii = d.inv_inertia if d.kind == KIND_DYNAMIC else (0.0,) * 6
            self.ixx[i], self.iyx[i], self.iyy[i] = ii[0], ii[1], ii[2]
            self.izx[i], self.izy[i], self.izz[i] = ii[3], ii[4], ii[5]
            self.kind[i] = d.kind
            self.awake[i] = True
            self.sleep_threshold[i] = d.sleep_threshold
        self.shape[i] = d.shape
        self.friction[i] = d.friction
        self.spring_frequency[i] = d.spring_frequency
        self.spring_damping[i] = d.spring_damping
        self.max_recovery_velocity[i] = d.max_recovery_velocity
        self.collision_group[i] = getattr(d, "collision_group", 0)
        self.continuity[i] = getattr(d, "continuity", 0)
        self.spec_margin_min[i] = getattr(d, "speculative_margin", 0.1)
        self.spec_margin_max[i] = getattr(d, "speculative_margin_max", 3.0e38)
        self.sleep_timer[i] = 0.0
        return i

    def remove(self, handle: int) -> None:
        self.kind[handle] = KIND_EMPTY
        self.awake[handle] = False
        self.shape[handle] = -1
        self._free.append(handle)

    @property
    def count(self) -> int:
        return self.capacity - len(self._free)

    def device(self) -> BodyState:
        return BodyState(
            pos=Vec3(jnp.asarray(self.px), jnp.asarray(self.py), jnp.asarray(self.pz)),
            orn=Quat(jnp.asarray(self.qx), jnp.asarray(self.qy), jnp.asarray(self.qz), jnp.asarray(self.qw)),
            vel=Vec3(jnp.asarray(self.vx), jnp.asarray(self.vy), jnp.asarray(self.vz)),
            omega=Vec3(jnp.asarray(self.wx), jnp.asarray(self.wy), jnp.asarray(self.wz)),
            inv_mass=jnp.asarray(self.inv_mass),
            inv_inertia=Sym3(
                jnp.asarray(self.ixx), jnp.asarray(self.iyx), jnp.asarray(self.iyy),
                jnp.asarray(self.izx), jnp.asarray(self.izy), jnp.asarray(self.izz),
            ),
            kind=jnp.asarray(self.kind),
            awake=jnp.asarray(self.awake),
            shape=jnp.asarray(self.shape),
            friction=jnp.asarray(self.friction),
            spring_frequency=jnp.asarray(self.spring_frequency),
            spring_damping=jnp.asarray(self.spring_damping),
            max_recovery_velocity=jnp.asarray(self.max_recovery_velocity),
            sleep_threshold=jnp.asarray(self.sleep_threshold),
            sleep_timer=jnp.asarray(self.sleep_timer),
            sleep_island=jnp.asarray(self.sleep_island),
            collision_group=jnp.asarray(self.collision_group),
            continuity=jnp.asarray(self.continuity),
            spec_margin_min=jnp.asarray(self.spec_margin_min),
            spec_margin_max=jnp.asarray(self.spec_margin_max),
        )

    def load(self, state: BodyState) -> None:
        """Pull device state back to host arrays (after stepping). Copies — the host
        arrays must stay writable for subsequent add/remove/set mutations."""
        self.px, self.py, self.pz = (np.array(c) for c in state.pos)
        self.qx, self.qy, self.qz, self.qw = (np.array(c) for c in state.orn)
        self.vx, self.vy, self.vz = (np.array(c) for c in state.vel)
        self.wx, self.wy, self.wz = (np.array(c) for c in state.omega)
        self.awake = np.array(state.awake)
        self.sleep_timer = np.array(state.sleep_timer)
        self.sleep_island = np.array(state.sleep_island)
