"""Native host runtime — C++ components of the engine's host-side pipeline.

The reference's lowest-level host machinery is C# with unsafe pointers and hardware
intrinsics (SURVEY §2 note); for the TPU build the device compute path is XLA/Pallas and
the performance-critical HOST pipeline (shape preprocessing) is native C++:

- quickhull convex hull builder + solid inertia (reference
  BepuPhysics/Collidables/ConvexHullHelper.cs:87 ComputeHull, MeshInertiaHelper.cs) —
  the engine builds its own hulls rather than depending on external geometry packages.

Compiled lazily with g++ into ``_bepu_native.so`` next to this file; all entry points
fall back to pure-Python/scipy implementations when a toolchain is unavailable, so the
package works (slower) without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src")
_LIB_PATH = os.path.join(_HERE, "_bepu_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _sources():
    return sorted(
        os.path.join(_SRC, f) for f in os.listdir(_SRC) if f.endswith(".cpp")
    )


def _needs_build() -> bool:
    if not os.path.exists(_LIB_PATH):
        return True
    lib_m = os.path.getmtime(_LIB_PATH)
    return any(os.path.getmtime(s) > lib_m for s in _sources())


def load():
    """The loaded native library, building it on first use. None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if _needs_build():
                cmd = [
                    "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                    "-o", _LIB_PATH, *_sources(),
                ]
                subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.bepu_quickhull.restype = ctypes.c_int
            lib.bepu_quickhull.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ]
            lib.bepu_hull_inertia.restype = ctypes.c_int
            lib.bepu_hull_inertia.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def quickhull(points):
    """(vertex_ids, triangles, centroid, volume) of the convex hull of ``points``.

    triangles index into the ORIGINAL point array with outward (CCW) winding.
    Returns None when the native library is unavailable or the input is degenerate
    (caller falls back to the scipy path).
    """
    lib = load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float64)
    n = pts.shape[0]
    if n < 4:
        return None
    vert_ids = np.empty(n, np.int32)
    tris = np.empty((2 * n, 3), np.int32)
    nverts = ctypes.c_int(0)
    ntris = ctypes.c_int(0)
    centroid = np.empty(3, np.float64)
    volume = ctypes.c_double(0)
    rc = lib.bepu_quickhull(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n,
        vert_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), ctypes.byref(nverts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), ctypes.byref(ntris),
        centroid.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), ctypes.byref(volume),
    )
    if rc != 0:
        return None
    return (
        vert_ids[: nverts.value].copy(),
        tris[: ntris.value].copy(),
        centroid,
        float(volume.value),
    )


def hull_inertia(points, triangles, mass: float):
    """(inv_inertia 6-tuple xx yx yy zx zy zz, inv_mass) of the uniform solid bounded by
    ``triangles`` (outward winding, indices into ``points``), about the origin.
    None on failure (caller falls back)."""
    lib = load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float64)
    tris = np.ascontiguousarray(triangles, np.int32)
    inv_inertia = np.empty(6, np.float64)
    inv_mass = ctypes.c_double(0)
    rc = lib.bepu_hull_inertia(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), pts.shape[0],
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), tris.shape[0],
        ctypes.c_double(mass),
        inv_inertia.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.byref(inv_mass),
    )
    if rc != 0:
        return None
    return tuple(inv_inertia.tolist()), float(inv_mass.value)
