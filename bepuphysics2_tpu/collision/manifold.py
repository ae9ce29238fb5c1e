"""Contact manifold container shared by all pair testers."""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.vec import Vec3


class Manifold(NamedTuple):
    """Convex manifold per pair record: ≤4 contacts sharing one normal (reference
    ConvexContactManifold, CollisionDetection/ContactManifold.cs:341). The normal is
    calibrated to point from B to A; contact offsets are world-space from A's center."""

    normal: Vec3  # (MP,)
    offset_a: Vec3  # (MP, 4)
    depth: jnp.ndarray  # (MP, 4)
    feature: jnp.ndarray  # (MP, 4) int32
    contact_mask: jnp.ndarray  # (MP, 4) bool

    @staticmethod
    def empty(capacity: int) -> "Manifold":
        return Manifold(
            normal=Vec3.zeros(capacity),
            offset_a=Vec3.zeros((capacity, 4)),
            depth=jnp.zeros((capacity, 4), jnp.float32),
            feature=jnp.zeros((capacity, 4), jnp.int32),
            contact_mask=jnp.zeros((capacity, 4), bool),
        )

    def where(self, mask, other: "Manifold") -> "Manifold":
        """Select records from self where mask (shape (MP,)) else other."""
        m1 = mask[:, None]
        return Manifold(
            normal=self.normal.where(mask, other.normal),
            offset_a=self.offset_a.where(m1, other.offset_a),
            depth=jnp.where(m1, self.depth, other.depth),
            feature=jnp.where(m1, self.feature, other.feature),
            contact_mask=jnp.where(m1, self.contact_mask, other.contact_mask),
        )

    def flipped(self, offset_ab: Vec3) -> "Manifold":
        """Re-express the manifold with the pair's roles swapped: the tester treated body j
        as its A, but the constraint wants offsets relative to body i. ``offset_ab`` =
        pos_testerA − pos_sceneA (i.e. the vector from the scene A to the tester A)."""
        return self._replace(
            normal=-self.normal,
            offset_a=Vec3(
                self.offset_a.x + offset_ab.x[:, None],
                self.offset_a.y + offset_ab.y[:, None],
                self.offset_a.z + offset_ab.z[:, None],
            ),
        )
