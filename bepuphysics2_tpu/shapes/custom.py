"""Custom convex collidable registration — the reference's user-extensible shape system
(reference: IShape/ShapeBatch registration Collidables/Shapes.cs:402 + the
CustomVoxelCollidableDemo capability proof).

A custom convex shape supplies ONE function — its support map — and the engine's generic
GJK/MPR narrow phase (collision/convex.py), sweeps, and CCD all work with it against
every other convex shape, with zero per-pair-tester code. This is strictly more
TPU-native than the reference's per-pair registration matrix: support evaluation is a
masked branch in the shared vectorized kernel.

    EGG = register_custom_shape(
        lambda params, d: (Vec3(...), margin),   # support point of the CORE + margin
        name="egg",
    )
    sim.add_shape(CustomShape(EGG, params=[...], max_radius=..., inv_inertia=(...)))
"""
from __future__ import annotations

import dataclasses

import numpy as np

# type_id -> support fn(params (..., 12), d: Vec3) -> (point: Vec3, margin)
CUSTOM_SUPPORTS: dict = {}
CUSTOM_NAMES: dict = {}
_NEXT_CUSTOM_ID = 16  # ids 0-8 are built-in; leave headroom


def register_custom_shape(support_fn, name: str = None) -> int:
    """Register a convex support function; returns the new shape type id. The function
    must be traceable jnp code over batched inputs: params (..., 12) packed shape data
    and direction d (Vec3 with (...,) components, not necessarily unit), returning the
    support point of the shape's core in its local frame plus a spherical margin."""
    global _NEXT_CUSTOM_ID
    tid = _NEXT_CUSTOM_ID
    _NEXT_CUSTOM_ID += 1
    CUSTOM_SUPPORTS[tid] = support_fn
    CUSTOM_NAMES[tid] = name or f"custom{tid}"
    return tid


def is_custom(type_id: int) -> bool:
    return type_id in CUSTOM_SUPPORTS


@dataclasses.dataclass(frozen=True)
class CustomShape:
    """Instance of a registered custom shape type: packed params + host metadata."""

    type_id: int
    params: tuple = ()
    max_radius: float = 1.0
    inertia_diag: tuple = (1.0, 1.0, 1.0)  # unit-mass inertia diagonal

    def pack(self):
        return self.type_id, list(self.params)

    def maximum_radius(self):
        return float(self.max_radius)

    def compute_inertia(self, mass: float):
        d = np.asarray(self.inertia_diag, np.float64) * mass
        return 1.0 / mass, tuple((1.0 / d).tolist())
