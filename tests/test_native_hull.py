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


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_large_hull_support_and_simulation():
    """Hulls above 64 vertices register and collide faithfully (reference ConvexHull is
    unbounded, ConvexHullHelper.cs:87): the windowed support scan must pick the true
    argmax across windows, and a 128-vert hull must rest on the ground without
    penetration drift."""
    import jax
    import jax.numpy as jnp

    from bepuphysics2_tpu import (
        BodyDescription, Box, SimConfig, Simulation, StaticDescription,
    )
    from bepuphysics2_tpu.collision.convex import SupportCtx, support_core
    from bepuphysics2_tpu.shapes.registry import CONVEX_HULL
    from bepuphysics2_tpu.utils.vec import Vec3

    # 128 points on a unit sphere (Fibonacci lattice): every point is a hull vertex.
    n = 128
    k = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * k / n)
    theta = np.pi * (1 + 5**0.5) * k
    pts = np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], -1
    )
    hull = ConvexHull.from_points(pts)
    assert len(hull.points) > 64, "test needs a >64-vert hull"

    sim = Simulation(SimConfig(body_capacity=16, max_pairs=64, substeps=4, num_colors=4))
    ground = sim.add_shape(Box(20.0, 0.5, 20.0))
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=ground))
    hid = sim.add_shape(hull)
    body = sim.add_body(BodyDescription.dynamic((0, 1.5, 0), hid, 1.0, hull))
    shapes = sim.shapes.device()
    assert int(shapes.hull_count[hid]) == len(hull.points)
    assert shapes.hull_win.shape[0] == 2  # 128 verts -> 2 windows

    # Support oracle: dense argmax over the actual vertices, 64 random directions.
    rng = np.random.default_rng(5)
    dirs = rng.normal(size=(64, 3)).astype(np.float32)
    verts = np.asarray(hull.points, np.float32)
    row = np.full(64, hid, np.int32)
    pt, _ = support_core(
        jnp.full(64, CONVEX_HULL, jnp.int32),
        jnp.asarray(shapes.params)[row],
        Vec3(shapes.hull_x, shapes.hull_y, shapes.hull_z),
        shapes.hull_start[row],
        shapes.hull_count[row],
        Vec3(*(jnp.asarray(dirs[:, i]) for i in range(3))),
        n_win=shapes.hull_win.shape[0],
    )
    got = np.stack([np.asarray(pt.x), np.asarray(pt.y), np.asarray(pt.z)], -1)
    want = verts[np.argmax(dirs @ verts.T, axis=1)]
    assert np.allclose(
        np.sum(got * dirs, -1), np.sum(want * dirs, -1), atol=1e-5
    ), "windowed hull support must equal the dense argmax"

    # Settle on the ground: rests near its bounding radius with small penetration.
    sim.run(120, 1 / 60.0)
    sim._sync_from_device()
    y = float(sim._host.py[body])
    assert 0.9 < y < 1.05, f"128-vert hull failed to rest on the ground: y={y}"
