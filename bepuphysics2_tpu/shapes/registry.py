"""Shape registry: fixed-capacity packed shape parameter arrays.

The reference stores shapes in per-type ``ShapeBatch``es managed by a ``Shapes`` registry
(reference: BepuPhysics/Collidables/Shapes.cs:402, type ids Sphere=0 … Mesh=8 in each
``Collidables/*.cs``). On TPU, shape data must live in fixed-shape device arrays so a
collidable's shape is a (type, row) pair resolved by gather inside kernels. The registry is
a *host-side* builder (shape add/remove happens between steps, like all topology mutation);
its ``device()`` snapshot is a small pytree the jitted step closes over.

Packed parameter layout (``params`` row, float32 × 12):
- SPHERE   (id 0): [radius]
- CAPSULE  (id 1): [radius, half_length]           (axis = local Y, as in the reference)
- BOX      (id 2): [half_width, half_height, half_length]
- TRIANGLE (id 3): [ax, ay, az, bx, by, bz, cx, cy, cz]
- CYLINDER (id 4): [radius, half_length]           (axis = local Y)
- CONVEX_HULL (5), COMPOUND (6), BIG_COMPOUND (7), MESH (8): indices into auxiliary pools
  (points/children/triangles), introduced by later build phases.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils.vec import Sym3

SHAPE_NONE = -1
SPHERE = 0
CAPSULE = 1
BOX = 2
TRIANGLE = 3
CYLINDER = 4
CONVEX_HULL = 5
COMPOUND = 6
BIG_COMPOUND = 7
MESH = 8

N_PARAMS = 12


@dataclasses.dataclass(frozen=True)
class Sphere:
    radius: float

    def pack(self):
        return SPHERE, [self.radius]

    def compute_inertia(self, mass: float):
        """reference: Collidables/Sphere.cs:95."""
        inv_mass = 1.0 / mass
        inv_i = inv_mass / (0.4 * self.radius * self.radius)
        return inv_mass, (inv_i, inv_i, inv_i)

    def maximum_radius(self):
        return self.radius


@dataclasses.dataclass(frozen=True)
class Capsule:
    radius: float
    half_length: float

    def pack(self):
        return CAPSULE, [self.radius, self.half_length]

    def compute_inertia(self, mass: float):
        """reference: Collidables/Capsule.cs:159 (cylinder + sphere-caps volume blend)."""
        inv_mass = 1.0 / mass
        r2 = self.radius * self.radius
        h2 = self.half_length * self.half_length
        cyl_vol = 2 * self.half_length * r2 * np.pi
        sph_vol = (4.0 / 3.0) * r2 * self.radius * np.pi
        inv_total = 1.0 / (cyl_vol + sph_vol)
        cyl_vol *= inv_total
        sph_vol *= inv_total
        ixx = inv_mass / (
            cyl_vol * ((3.0 / 12.0) * r2 + (4.0 / 12.0) * h2)
            + sph_vol * ((2.0 / 5.0) * r2 + (6.0 / 8.0) * self.radius * self.half_length + h2)
        )
        iyy = inv_mass / (cyl_vol * 0.5 * r2 + sph_vol * (2.0 / 5.0) * r2)
        return inv_mass, (ixx, iyy, ixx)

    def maximum_radius(self):
        return self.radius + self.half_length


@dataclasses.dataclass(frozen=True)
class Box:
    half_width: float
    half_height: float
    half_length: float

    @staticmethod
    def from_dimensions(width, height, length) -> "Box":
        return Box(width * 0.5, height * 0.5, length * 0.5)

    def pack(self):
        return BOX, [self.half_width, self.half_height, self.half_length]

    def compute_inertia(self, mass: float):
        """reference: Collidables/Box.cs:149."""
        inv_mass = 1.0 / mass
        x2 = self.half_width**2
        y2 = self.half_height**2
        z2 = self.half_length**2
        return inv_mass, (
            inv_mass * 3 / (y2 + z2),
            inv_mass * 3 / (x2 + z2),
            inv_mass * 3 / (x2 + y2),
        )

    def maximum_radius(self):
        return float(np.sqrt(self.half_width**2 + self.half_height**2 + self.half_length**2))


@dataclasses.dataclass(frozen=True)
class Cylinder:
    radius: float
    half_length: float

    def pack(self):
        return CYLINDER, [self.radius, self.half_length]

    def compute_inertia(self, mass: float):
        """reference: Collidables/Cylinder.cs:166."""
        inv_mass = 1.0 / mass
        diag = inv_mass / ((4 * 0.0833333333) * self.half_length**2 + 0.25 * self.radius**2)
        return inv_mass, (diag, 2.0 * inv_mass / (self.radius**2), diag)

    def maximum_radius(self):
        return float(np.sqrt(self.radius**2 + self.half_length**2))


@dataclasses.dataclass(frozen=True)
class Triangle:
    a: tuple
    b: tuple
    c: tuple

    def pack(self):
        return TRIANGLE, [*self.a, *self.b, *self.c]

    def compute_inertia(self, mass: float):
        raise NotImplementedError("triangles are intended as static/mesh geometry")

    def maximum_radius(self):
        return float(max(np.linalg.norm(self.a), np.linalg.norm(self.b), np.linalg.norm(self.c)))


class ShapeData(NamedTuple):
    """Device snapshot of the registry (closed over by the jitted step)."""

    type: jnp.ndarray  # (MS,) int32, SHAPE_NONE for empty rows
    params: jnp.ndarray  # (MS, N_PARAMS) float32
    max_radius: jnp.ndarray  # (MS,) float32 — bounding sphere radius, for angular AABB expansion


class ShapeRegistry:
    """Host-side shape storage with recycled rows (analogue of reference Shapes registry)."""

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self.types = np.full(capacity, SHAPE_NONE, np.int32)
        self.params = np.zeros((capacity, N_PARAMS), np.float32)
        self.max_radius = np.zeros(capacity, np.float32)
        self.shapes = [None] * capacity
        self._free = list(range(capacity - 1, -1, -1))
        self._dirty = True
        self._device = None

    def add(self, shape) -> int:
        if not self._free:
            raise RuntimeError("shape registry full; raise capacity")
        idx = self._free.pop()
        type_id, packed = shape.pack()
        self.types[idx] = type_id
        self.params[idx, : len(packed)] = np.asarray(packed, np.float32)
        self.params[idx, len(packed):] = 0
        self.max_radius[idx] = shape.maximum_radius()
        self.shapes[idx] = shape
        self._dirty = True
        return idx

    def remove(self, idx: int) -> None:
        self.types[idx] = SHAPE_NONE
        self.shapes[idx] = None
        self._free.append(idx)
        self._dirty = True

    def __getitem__(self, idx: int):
        return self.shapes[idx]

    def device(self) -> ShapeData:
        if self._dirty or self._device is None:
            self._device = ShapeData(
                jnp.asarray(self.types),
                jnp.asarray(self.params),
                jnp.asarray(self.max_radius),
            )
            self._dirty = False
        return self._device


def inertia_from_diag(inv_mass, diag) -> tuple:
    """Helper: (inv_mass, Sym3 diag inverse inertia)."""
    return inv_mass, Sym3.diag(diag[0], diag[1], diag[2])
