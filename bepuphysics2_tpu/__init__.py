"""bepuphysics2_tpu — a TPU-native rigid-body physics engine (JAX/XLA/Pallas).

A from-scratch re-design of the capabilities of bepuphysics2 (C#/CPU-SIMD) for TPU:
simulation state is a fixed-capacity pytree, each timestep is one fused XLA program, and
the substepped TGS solver runs over graph-colored constraint sets computed on device.
"""

__version__ = "0.1.0"

# Persistent compilation cache: a physics engine recompiles its step for every new scene
# configuration; caching compiled XLA programs across processes turns minutes of warmup
# into milliseconds. Opt out with BEPUPHYSICS2_TPU_NO_CACHE=1 or by pre-setting the dir.
import os as _os

if not _os.environ.get("BEPUPHYSICS2_TPU_NO_CACHE"):
    import jax as _jax

    _cache_dir = _os.environ.get("JAX_COMPILATION_CACHE_DIR", "/dev/shm/bepu_tpu_jax_cache")
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache flags unavailable on some backends — never fatal
        pass

from .utils.vec import Vec3, Quat, Mat3, Sym3, v3
from .bodies import (
    BodyDescription,
    StaticDescription,
    KIND_DYNAMIC,
    KIND_KINEMATIC,
    KIND_STATIC,
)
from .shapes import Sphere, Capsule, Box, Cylinder, Triangle, ConvexHull, Compound, Mesh
from .shapes.builder import CompoundBuilder
from .shapes.custom import CustomShape, register_custom_shape
from .simulation import Simulation, SimConfig
from .validation import validate
from .metrics import SimMetrics, simulation_metrics, TraceSession

__all__ = [
    "Vec3", "Quat", "Mat3", "Sym3", "v3",
    "BodyDescription", "StaticDescription",
    "KIND_DYNAMIC", "KIND_KINEMATIC", "KIND_STATIC",
    "Sphere", "Capsule", "Box", "Cylinder", "Triangle", "ConvexHull", "Compound", "Mesh",
    "CompoundBuilder", "CustomShape", "register_custom_shape",
    "Simulation", "SimConfig", "validate",
    "SimMetrics", "simulation_metrics", "TraceSession",
]
