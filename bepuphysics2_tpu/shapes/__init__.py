from .registry import (
    ConvexHull,
    Compound,
    Mesh,
    SHAPE_NONE,
    SPHERE,
    CAPSULE,
    BOX,
    TRIANGLE,
    CYLINDER,
    CONVEX_HULL,
    COMPOUND,
    BIG_COMPOUND,
    MESH,
    ShapeData,
    ShapeRegistry,
    Sphere,
    Capsule,
    Box,
    Cylinder,
    Triangle,
)
from .bounds import compute_body_bounds

__all__ = [
    "SHAPE_NONE", "SPHERE", "CAPSULE", "BOX", "TRIANGLE", "CYLINDER", "CONVEX_HULL",
    "COMPOUND", "BIG_COMPOUND", "MESH", "ShapeData", "ShapeRegistry",
    "Sphere", "Capsule", "Box", "Cylinder", "Triangle", "ConvexHull", "Compound", "Mesh", "compute_body_bounds",
]
