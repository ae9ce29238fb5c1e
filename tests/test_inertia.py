"""Inertia tensor tests (reference DemoTests/InertiaTensorTests.cs): each shape's
analytic inertia must match a Monte-Carlo volume-sampled tensor. Pure host numpy."""
import numpy as np
import pytest

from bepuphysics2_tpu import Box, Capsule, ConvexHull, Cylinder, Sphere

RNG = np.random.default_rng(11)
N_SAMPLES = 200_000


def sampled_inertia_diag(contains, bound, mass):
    """Monte-Carlo unit-density inertia diagonal about the origin."""
    pts = RNG.uniform(-bound, bound, size=(N_SAMPLES, 3))
    inside = contains(pts)
    p = pts[inside]
    m_per = mass / len(p)
    x2, y2, z2 = p[:, 0] ** 2, p[:, 1] ** 2, p[:, 2] ** 2
    return np.array(
        [m_per * np.sum(y2 + z2), m_per * np.sum(x2 + z2), m_per * np.sum(x2 + y2)]
    )


def check(shape, contains, bound, rtol=0.03):
    mass = 2.5
    res = shape.compute_inertia(mass)
    inv_mass, inv_diag = res[0], np.asarray(res[1])
    assert abs(inv_mass - 1.0 / mass) < 1e-6
    analytic = 1.0 / inv_diag
    sampled = sampled_inertia_diag(contains, bound, mass)
    np.testing.assert_allclose(analytic, sampled, rtol=rtol)


def test_sphere_inertia():
    r = 0.7
    check(Sphere(r), lambda p: np.sum(p * p, -1) <= r * r, r)


def test_box_inertia():
    hx, hy, hz = 0.4, 0.7, 0.25
    check(
        Box(hx, hy, hz),
        lambda p: (np.abs(p[:, 0]) <= hx) & (np.abs(p[:, 1]) <= hy) & (np.abs(p[:, 2]) <= hz),
        0.8,
    )


def test_cylinder_inertia():
    r, hl = 0.5, 0.6
    check(
        Cylinder(r, hl),
        lambda p: (p[:, 0] ** 2 + p[:, 2] ** 2 <= r * r) & (np.abs(p[:, 1]) <= hl),
        0.8,
    )


def test_capsule_inertia():
    r, hl = 0.4, 0.5

    def contains(p):
        yc = np.clip(p[:, 1], -hl, hl)
        return p[:, 0] ** 2 + (p[:, 1] - yc) ** 2 + p[:, 2] ** 2 <= r * r

    check(Capsule(r, hl), contains, 1.0)


def test_hull_inertia_matches_box():
    """A hull built from box corners must produce the box's inertia."""
    hx, hy, hz = 0.4, 0.6, 0.3
    corners = [
        (sx * hx, sy * hy, sz * hz)
        for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)
    ]
    hull = ConvexHull.from_points(corners)
    mass = 2.0
    res = hull.compute_inertia(mass)
    inv_full = np.asarray(res[2])
    analytic = np.linalg.inv(inv_full)
    box = Box(hx, hy, hz)
    _, box_inv_diag = box.compute_inertia(mass)
    np.testing.assert_allclose(
        np.diag(analytic), 1.0 / np.asarray(box_inv_diag), rtol=1e-3
    )
    # Off-diagonals vanish for a symmetric solid.
    off = analytic - np.diag(np.diag(analytic))
    assert np.abs(off).max() < 1e-3 * np.diag(analytic).max()


# ---- Mesh + triangle inertia (reference MeshInertiaHelper.cs, Triangle.cs) -----------

def _box_mesh(hx, hy, hz, offset=(0.0, 0.0, 0.0)):
    """12-triangle closed box mesh with outward winding."""
    o = np.asarray(offset)
    v = np.array(
        [[sx * hx, sy * hy, sz * hz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    ) + o
    # faces as vertex-index quads (outward when wound CCW viewed from outside)
    quads = [
        (0, 1, 3, 2),  # -x
        (4, 6, 7, 5),  # +x
        (0, 4, 5, 1),  # -y
        (2, 3, 7, 6),  # +y
        (0, 2, 6, 4),  # -z
        (1, 5, 7, 3),  # +z
    ]
    tris = []
    for a, b, c, d in quads:
        tris.append((tuple(v[a]), tuple(v[b]), tuple(v[c])))
        tris.append((tuple(v[a]), tuple(v[c]), tuple(v[d])))
    return tris


def test_closed_mesh_inertia_matches_box():
    from bepuphysics2_tpu.shapes.registry import Mesh

    hx, hy, hz = 0.7, 0.4, 1.1
    mesh = Mesh.build(_box_mesh(hx, hy, hz))
    mass = 3.0
    inv_mass, diag, inv = mesh.compute_inertia(mass)
    box_inv_mass, box_diag = Box(hx, hy, hz).compute_inertia(mass)
    assert abs(inv_mass - box_inv_mass) < 1e-9
    np.testing.assert_allclose(np.asarray(diag), np.asarray(box_diag), rtol=1e-6)
    # off-diagonals vanish for an axis-aligned box
    assert abs(inv[0, 1]) < 1e-9 and abs(inv[0, 2]) < 1e-9 and abs(inv[1, 2]) < 1e-9


def test_closed_mesh_inertia_origin_independent():
    """Signed-tetra integration must not care where the local origin sits."""
    from bepuphysics2_tpu.shapes.registry import Mesh

    mass = 2.0
    centered = Mesh.build(_box_mesh(0.5, 0.3, 0.8))
    shifted = Mesh.build(_box_mesh(0.5, 0.3, 0.8, offset=(2.0, -1.0, 0.5)))
    _, inv_c, center_c = centered.compute_inertia_with_center(mass)
    _, inv_s, center_s = shifted.compute_inertia_with_center(mass)
    np.testing.assert_allclose(center_s, [2.0, -1.0, 0.5], atol=1e-9)
    np.testing.assert_allclose(inv_s, inv_c, rtol=1e-6, atol=1e-9)


def test_closed_mesh_inertia_tetrahedron_sampled():
    """Irregular closed mesh (a random tetrahedron) vs Monte-Carlo volume sampling."""
    from bepuphysics2_tpu.shapes.registry import mesh_closed_second_moment

    verts = np.array(
        [[0.1, 0.0, 0.2], [1.3, 0.1, -0.2], [0.2, 1.1, 0.3], [-0.1, 0.2, 1.4]]
    )
    # outward winding for tetra (v0,v1,v2,v3)
    tris = [
        (verts[0], verts[2], verts[1]),
        (verts[0], verts[1], verts[3]),
        (verts[0], verts[3], verts[2]),
        (verts[1], verts[2], verts[3]),
    ]
    mass = 1.7
    volume, inertia, center = mesh_closed_second_moment(tris, mass)
    # Monte-Carlo: sample inside bounding box, barycentric containment
    lo, hi = verts.min(0) - 0.01, verts.max(0) + 0.01
    pts = RNG.uniform(lo, hi, size=(400_000, 3))
    mat = np.stack([verts[1] - verts[0], verts[2] - verts[0], verts[3] - verts[0]], axis=1)
    bary = np.linalg.solve(mat[None], (pts - verts[0])[:, :, None])[:, :, 0]
    inside = (bary >= 0).all(1) & (bary.sum(1) <= 1.0)
    p = pts[inside]
    m_per = mass / len(p)
    c2_mc = m_per * np.einsum("ni,nj->ij", p, p)
    inertia_mc = np.trace(c2_mc) * np.eye(3) - c2_mc
    vol_mc = np.prod(hi - lo) * inside.mean()
    assert abs(volume - vol_mc) / vol_mc < 0.02
    np.testing.assert_allclose(inertia, inertia_mc, rtol=0.04, atol=1e-3)
    np.testing.assert_allclose(center, p.mean(0), atol=5e-3)


def test_triangle_lamina_inertia_sampled():
    from bepuphysics2_tpu.shapes.registry import Triangle

    a, b, c = (0.0, 0.0, 0.0), (1.2, 0.1, 0.0), (0.3, 0.9, 0.4)
    mass = 2.0
    inv_mass, diag, inv = Triangle(a, b, c).compute_inertia(mass)
    # Monte-Carlo surface sampling via barycentric coordinates
    u = RNG.uniform(0, 1, size=(300_000, 2))
    flip = u.sum(1) > 1.0
    u[flip] = 1.0 - u[flip]
    p = (
        np.asarray(a)[None]
        + u[:, :1] * (np.asarray(b) - np.asarray(a))[None]
        + u[:, 1:] * (np.asarray(c) - np.asarray(a))[None]
    )
    m_per = mass / len(p)
    c2 = m_per * np.einsum("ni,nj->ij", p, p)
    inertia_mc = np.trace(c2) * np.eye(3) - c2
    np.testing.assert_allclose(np.linalg.inv(inv), inertia_mc, rtol=0.02, atol=1e-4)
