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
