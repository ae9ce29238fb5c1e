"""bepuphysics2_tpu — a TPU-native rigid-body physics engine (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of bepuphysics2 (C#/CPU-SIMD) for TPU:
simulation state is a fixed-capacity pytree, each timestep is one fused XLA program, and
the substepped TGS solver runs over graph-colored constraint sets computed on device.
"""

__version__ = "0.1.0"

from .utils.vec import Vec3, Quat, Mat3, Sym3, v3
from .bodies import (
    BodyDescription,
    StaticDescription,
    KIND_DYNAMIC,
    KIND_KINEMATIC,
    KIND_STATIC,
)
from .shapes import Sphere, Capsule, Box, Cylinder, Triangle
from .simulation import Simulation, SimConfig

__all__ = [
    "Vec3", "Quat", "Mat3", "Sym3", "v3",
    "BodyDescription", "StaticDescription",
    "KIND_DYNAMIC", "KIND_KINEMATIC", "KIND_STATIC",
    "Sphere", "Capsule", "Box", "Cylinder", "Triangle",
    "Simulation", "SimConfig",
]
