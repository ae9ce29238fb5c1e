"""Native C++ quickhull + inertia (bepuphysics2_tpu/native; reference
ConvexHullHelper.ComputeHull Collidables/ConvexHullHelper.cs:87, MeshInertiaHelper.cs).

Skipped when no toolchain is available (the engine then uses the scipy fallback)."""
import numpy as np
import pytest

from bepuphysics2_tpu import native
from bepuphysics2_tpu.shapes.registry import ConvexHull

pytestmark = pytest.mark.skipif(native.load() is None, reason="no native toolchain")


def test_quickhull_matches_scipy_vertices_volume():
    from scipy.spatial import ConvexHull as QHull

    rng = np.random.default_rng(0)
    for _ in range(10):
        n = int(rng.integers(4, 120))
        pts = rng.standard_normal((n, 3)) * rng.uniform(0.5, 3.0, 3)
        res = native.quickhull(pts)
        assert res is not None
        vert_ids, tris, centroid, volume = res
        sci = QHull(pts)
        assert set(vert_ids.tolist()) == set(sci.vertices.tolist())
        assert abs(volume - sci.volume) < 1e-9 * max(1.0, sci.volume)
        # Outward winding: every face normal points away from the centroid.
        for t in tris:
            a, b, c = pts[t]
            assert np.dot(np.cross(b - a, c - a), a - centroid) > -1e-9


def test_cube_inertia_analytic():
    cube = np.array(
        [[x, y, z] for x in (-0.5, 0.5) for y in (-0.5, 0.5) for z in (-0.5, 0.5)]
    )
    vert_ids, tris, centroid, volume = native.quickhull(cube)
    assert abs(volume - 1.0) < 1e-12
    inv6, inv_m = native.hull_inertia(cube, tris, 2.0)
    # Solid unit cube, mass 2: I = m/12 * (1^2 + 1^2) = 1/3 per axis → inverse 3.
    assert np.allclose([inv6[0], inv6[2], inv6[5]], 3.0, rtol=1e-9)
    assert np.allclose([inv6[1], inv6[3], inv6[4]], 0.0, atol=1e-9)
    assert inv_m == pytest.approx(0.5)


def test_convexhull_class_native_scipy_equivalence():
    rng = np.random.default_rng(1)
    for _ in range(4):
        pts = rng.standard_normal((int(rng.integers(8, 60)), 3))
        h_native = ConvexHull.from_points(pts)
        saved = (native._lib, native._tried)
        try:
            native._lib, native._tried = None, True  # force scipy fallback
            h_scipy = ConvexHull.from_points(pts)
            r_scipy = h_scipy.compute_inertia(2.5)
        finally:
            native._lib, native._tried = saved
        r_native = h_native.compute_inertia(2.5)
        assert np.allclose(
            np.asarray(h_native.center_offset), np.asarray(h_scipy.center_offset),
            atol=1e-9,
        )
        assert np.allclose(
            np.asarray(sorted(h_native.points)), np.asarray(sorted(h_scipy.points)),
            atol=1e-9,
        )
        assert np.allclose(r_native[2], r_scipy[2], rtol=1e-6, atol=1e-9)
