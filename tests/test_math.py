"""Math type tests (mirrors reference BepuUtilitiesTests: Matrix3x3Tests, SymmetricTests)."""
import numpy as np
import jax.numpy as jnp
import pytest

from bepuphysics2_tpu.utils.vec import (
    Mat3,
    Quat,
    Sym2,
    Sym3,
    Vec2,
    Vec3,
    build_orthonormal_basis,
    integrate_orientation,
    v3,
)


def rand_quat(rng, n=()):
    q = rng.normal(size=(4,) + ((n,) if isinstance(n, int) else n))
    q /= np.linalg.norm(q, axis=0)
    return Quat(*(jnp.asarray(c, jnp.float32) for c in q))


def test_vec3_basics():
    a = v3(1.0, 2.0, 3.0)
    b = v3(-4.0, 5.0, 0.5)
    assert np.allclose((a + b).to_array(), [-3, 7, 3.5])
    assert np.allclose(a.dot(b), -4 + 10 + 1.5)
    assert np.allclose(a.cross(b).to_array(), np.cross([1, 2, 3], [-4, 5, 0.5]))
    assert np.allclose(a.normalize().length(), 1.0)


def test_quat_rotate_matches_matrix():
    rng = np.random.default_rng(0)
    q = rand_quat(rng, 64)
    v = Vec3(*(jnp.asarray(rng.normal(size=64), jnp.float32) for _ in range(3)))
    rv = q.rotate(v)
    mv = q.to_matrix().transform(v)
    np.testing.assert_allclose(rv.to_array(), mv.to_array(), atol=1e-5)
    # inverse rotation via transpose
    back = q.to_matrix().transform_transpose(rv)
    np.testing.assert_allclose(back.to_array(), v.to_array(), atol=1e-5)


def test_quat_mul_composition():
    rng = np.random.default_rng(1)
    qa = rand_quat(rng, 16)
    qb = rand_quat(rng, 16)
    v = Vec3(*(jnp.asarray(rng.normal(size=16), jnp.float32) for _ in range(3)))
    # rotate by a then b == rotate by (b * a)
    expected = qb.rotate(qa.rotate(v))
    combined = qb.mul(qa).rotate(v)
    np.testing.assert_allclose(expected.to_array(), combined.to_array(), atol=1e-5)


def test_mat3_inverse():
    rng = np.random.default_rng(2)
    m_np = rng.normal(size=(3, 3)).astype(np.float32)
    m = Mat3(
        Vec3(*(jnp.float32(x) for x in m_np[0])),
        Vec3(*(jnp.float32(x) for x in m_np[1])),
        Vec3(*(jnp.float32(x) for x in m_np[2])),
    )
    inv = m.inverse()
    prod = m.matmul(inv)
    ident = np.eye(3)
    got = np.stack([prod.rx.to_array(), prod.ry.to_array(), prod.rz.to_array()])
    np.testing.assert_allclose(got, ident, atol=1e-4)


def test_mat3_cross_matrix():
    rng = np.random.default_rng(3)
    a = Vec3(*(jnp.float32(x) for x in rng.normal(size=3)))
    w = Vec3(*(jnp.float32(x) for x in rng.normal(size=3)))
    m = Mat3.cross_matrix(a)
    np.testing.assert_allclose(
        m.transform(w).to_array(), a.cross(w).to_array(), atol=1e-5
    )


def test_sym3_inverse_and_transform():
    rng = np.random.default_rng(4)
    a_np = rng.normal(size=(3, 3))
    spd = (a_np @ a_np.T + 3 * np.eye(3)).astype(np.float32)
    s = Sym3(
        jnp.float32(spd[0, 0]), jnp.float32(spd[1, 0]), jnp.float32(spd[1, 1]),
        jnp.float32(spd[2, 0]), jnp.float32(spd[2, 1]), jnp.float32(spd[2, 2]),
    )
    v = Vec3(*(jnp.float32(x) for x in rng.normal(size=3)))
    np.testing.assert_allclose(s.transform(v).to_array(), spd @ v.to_array(), rtol=1e-5)
    inv = s.inverse()
    np.testing.assert_allclose(inv.to_matrix(), np.linalg.inv(spd), atol=1e-4)
    # sandwich
    np.testing.assert_allclose(
        s.vector_sandwich(v), v.to_array() @ spd @ v.to_array(), rtol=1e-5
    )


def test_sym3_rotation_sandwich():
    """R^T S R in the row convention == rotating a local tensor to world frame."""
    rng = np.random.default_rng(5)
    q = rand_quat(rng)
    s_diag = np.abs(rng.normal(size=3)).astype(np.float32) + 0.5
    s = Sym3.diag(*s_diag)
    world = s.rotation_sandwich(q.to_matrix())
    # Dense check: world tensor should satisfy world·(R v_local) = R·(S v_local)
    v_local = Vec3(*(jnp.float32(x) for x in rng.normal(size=3)))
    v_world = q.rotate(v_local)
    lhs = world.transform(v_world)
    rhs = q.rotate(s.transform(v_local))
    np.testing.assert_allclose(lhs.to_array(), rhs.to_array(), atol=1e-4)


def test_sym2_inverse():
    s = Sym2(jnp.float32(4.0), jnp.float32(1.0), jnp.float32(3.0))
    inv = s.inverse()
    m = np.array([[4, 1], [1, 3]], np.float32)
    got = np.array([[inv.xx, inv.yx], [inv.yx, inv.yy]])
    np.testing.assert_allclose(got, np.linalg.inv(m), atol=1e-6)


def test_orthonormal_basis():
    rng = np.random.default_rng(6)
    n_np = rng.normal(size=(3, 256)).astype(np.float32)
    n_np /= np.linalg.norm(n_np, axis=0)
    n = Vec3(*(jnp.asarray(c) for c in n_np))
    t1, t2 = build_orthonormal_basis(n)
    np.testing.assert_allclose(t1.dot(n), 0.0, atol=1e-5)
    np.testing.assert_allclose(t2.dot(n), 0.0, atol=1e-5)
    np.testing.assert_allclose(t1.dot(t2), 0.0, atol=1e-5)
    np.testing.assert_allclose(t1.length(), 1.0, atol=1e-5)
    np.testing.assert_allclose(t2.length(), 1.0, atol=1e-5)


def test_integrate_orientation():
    # Rotate at pi/2 rad/s about z for 1s (40 steps): x-axis should map to ~y-axis.
    q = Quat.identity()
    omega = v3(0.0, 0.0, np.pi / 2)
    for _ in range(40):
        q = integrate_orientation(q, omega, 1.0 / 40.0)
    x_world = q.rotate(v3(1.0, 0.0, 0.0))
    np.testing.assert_allclose(x_world.to_array(), [0, 1, 0], atol=1e-3)
    # zero angular velocity: unchanged
    q2 = integrate_orientation(q, v3(0.0, 0.0, 0.0), 0.1)
    np.testing.assert_allclose(q2.to_array(), q.to_array(), atol=1e-7)
