"""Analytic pair tester unit tests (reference capability oracle: the dedicated
CollisionTasks testers; cross-checked against the generic GJK/MPR kernel which the
engine previously used for these pairs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from bepuphysics2_tpu.utils.vec import Quat, Vec3
from bepuphysics2_tpu.collision import testers


def _quat_axis_angle(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    s = np.sin(angle / 2.0)
    return (axis[0] * s, axis[1] * s, axis[2] * s, np.cos(angle / 2.0))


def _capsule_box(pos_a, orn_a, pos_b, orn_b, r, hl, hb):
    n = 1
    pos_ab = Vec3(
        jnp.asarray([pos_b[0] - pos_a[0]], jnp.float32),
        jnp.asarray([pos_b[1] - pos_a[1]], jnp.float32),
        jnp.asarray([pos_b[2] - pos_a[2]], jnp.float32),
    )
    qa = Quat(*(jnp.asarray([c], jnp.float32) for c in orn_a))
    qb = Quat(*(jnp.asarray([c], jnp.float32) for c in orn_b))
    pa = jnp.asarray([[r, hl, 0.0]], jnp.float32)
    pb = jnp.asarray([[hb[0], hb[1], hb[2]]], jnp.float32)
    return testers.capsule_box(pos_ab, qa, qb, pa, pb)


def test_capsule_box_resting_on_face():
    # Horizontal capsule (axis along x -> rotate local y to x) resting on a box top face.
    q = _quat_axis_angle((0, 0, 1), -np.pi / 2)  # y -> x
    m = _capsule_box(
        pos_a=(0.0, 1.45, 0.0), orn_a=q,
        pos_b=(0.0, 0.0, 0.0), orn_b=(0, 0, 0, 1),
        r=0.5, hl=1.0, hb=(2.0, 1.0, 2.0),
    )
    # Two contacts, depth ~= 0.05, normal = +y (box -> capsule).
    mask = np.asarray(m.contact_mask[0])
    assert mask[0] and mask[1]
    d = np.asarray(m.depth[0])
    assert abs(d[0] - 0.05) < 1e-3 and abs(d[1] - 0.05) < 1e-3
    nrm = (float(m.normal.x[0]), float(m.normal.y[0]), float(m.normal.z[0]))
    assert abs(nrm[1] - 1.0) < 1e-4
    # Contacts near the two ends of the segment, at the capsule's lower surface.
    ox = np.asarray(m.offset_a.x[0])
    assert abs(abs(ox[0]) - 1.0) < 0.05 and abs(abs(ox[1]) - 1.0) < 0.05


def test_capsule_box_separated_speculative():
    q = _quat_axis_angle((0, 0, 1), -np.pi / 2)
    m = _capsule_box(
        pos_a=(0.0, 2.0, 0.0), orn_a=q,
        pos_b=(0.0, 0.0, 0.0), orn_b=(0, 0, 0, 1),
        r=0.5, hl=1.0, hb=(2.0, 1.0, 2.0),
    )
    d = np.asarray(m.depth[0])
    # gap = 2.0 - 1.0 - 0.5 = 0.5 -> depth -0.5
    assert abs(d[0] + 0.5) < 1e-3
    assert float(m.normal.y[0]) > 0.999


def test_capsule_box_vertical_on_face():
    # Vertical capsule standing on the box: single effective contact (end cap).
    m = _capsule_box(
        pos_a=(0.5, 2.4, -0.3), orn_a=(0, 0, 0, 1),
        pos_b=(0.0, 0.0, 0.0), orn_b=(0, 0, 0, 1),
        r=0.5, hl=1.0, hb=(2.0, 1.0, 2.0),
    )
    d = np.asarray(m.depth[0])
    mask = np.asarray(m.contact_mask[0])
    assert mask[0]
    # Deepest contact ~ 1.0 + 1.5 - 2.4 = 0.1
    assert abs(d[0] - 0.1) < 1e-3
    assert float(m.normal.y[0]) > 0.999
    # Second contact (top end of capsule) must be far shallower or absent.
    if mask[1]:
        assert d[1] < d[0] - 1.0


def test_capsule_box_edge_contact():
    # Capsule axis along z, pressed onto the +x/+y box edge diagonally.
    m = _capsule_box(
        pos_a=(2.2, 1.2, 0.0), orn_a=_quat_axis_angle((1, 0, 0), np.pi / 2),
        pos_b=(0.0, 0.0, 0.0), orn_b=(0, 0, 0, 1),
        r=0.5, hl=1.0, hb=(2.0, 1.0, 2.0),
    )
    nrm = np.array([float(m.normal.x[0]), float(m.normal.y[0]), float(m.normal.z[0])])
    # Normal points away from the edge, in the +x/+y quadrant, no z component.
    assert nrm[0] > 0.1 and nrm[1] > 0.1 and abs(nrm[2]) < 1e-4
    d = np.asarray(m.depth[0])
    # Edge at (2,1): offset from edge = (0.2, 0.2), dist = 0.283 -> depth = 0.5 - 0.283
    assert abs(d[0] - (0.5 - np.hypot(0.2, 0.2))) < 2e-3


def test_capsule_box_matches_generic_kernel():
    """Cross-check depth/normal against the generic GJK/MPR path on random shallow
    configurations (the regime where both are valid)."""
    from bepuphysics2_tpu.collision.convex import SupportCtx, generic_convex_manifold
    from bepuphysics2_tpu.shapes.registry import BOX, CAPSULE

    rng = np.random.default_rng(7)
    K = 64
    r = 0.4
    hl = 0.8
    hb = np.array([1.5, 0.75, 1.0], np.float32)
    # Random capsule poses near the box surface.
    axes = rng.normal(size=(K, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angs = rng.uniform(0, np.pi, K)
    orn = np.stack(
        [
            np.concatenate([a * np.sin(t / 2), [np.cos(t / 2)]])
            for a, t in zip(axes, angs)
        ]
    ).astype(np.float32)
    # Place capsule centers above the +y face with small penetration or gap.
    pos = np.stack(
        [
            rng.uniform(-1.0, 1.0, K),
            hb[1] + r + rng.uniform(-0.15, 0.3, K),
            rng.uniform(-0.6, 0.6, K),
        ],
        -1,
    ).astype(np.float32)

    pos_ab = Vec3(*(jnp.asarray(-pos[:, i]) for i in range(3)))  # box at origin
    qa = Quat(*(jnp.asarray(orn[:, i]) for i in range(4)))
    qb = Quat(
        jnp.zeros(K), jnp.zeros(K), jnp.zeros(K), jnp.ones(K)
    )
    pa = jnp.tile(jnp.asarray([[r, hl, 0.0]], jnp.float32), (K, 1))
    pb = jnp.tile(jnp.asarray([[hb[0], hb[1], hb[2]]], jnp.float32), (K, 1))

    m = testers.capsule_box(pos_ab, qa, qb, pa, pb)

    ctx = SupportCtx(
        type_a=jnp.full(K, CAPSULE, jnp.int32),
        params_a=pa,
        type_b=jnp.full(K, BOX, jnp.int32),
        params_b=pb,
        orn_ab=qa.conjugate().mul(qb),
        pos_ab=qa.rotate_inverse(pos_ab),
        hull_points=None,
        hull_start_a=jnp.zeros(K, jnp.int32),
        hull_count_a=jnp.zeros(K, jnp.int32),
        hull_start_b=jnp.zeros(K, jnp.int32),
        hull_count_b=jnp.zeros(K, jnp.int32),
    )
    gm = generic_convex_manifold(ctx, qa)

    d_a = np.asarray(m.depth[:, 0])
    d_g = np.asarray(gm.depth[:, 0])
    n_a = np.stack(
        [np.asarray(m.normal.x), np.asarray(m.normal.y), np.asarray(m.normal.z)], -1
    )
    n_g = np.stack(
        [np.asarray(gm.normal.x), np.asarray(gm.normal.y), np.asarray(gm.normal.z)], -1
    )
    # Deepest-contact depth agreement (generic kernel tolerance ~ a few mm at this
    # scale) and normal alignment.
    d_best_a = np.max(np.where(np.asarray(m.contact_mask), np.asarray(m.depth), -1e9), -1)
    d_best_g = np.max(
        np.where(np.asarray(gm.contact_mask), np.asarray(gm.depth), -1e9), -1
    )
    assert np.median(np.abs(d_best_a - d_best_g)) < 0.02
    cos = np.sum(n_a * n_g, -1)
    assert np.median(cos) > 0.99


# --------------------------------------------------------------------------------------
# Triangle-family analytic testers (sphere/capsule/box vs triangle) — the mesh/terrain
# hot path. Direct geometric cases + random-configuration cross-checks against the
# generic GJK/MPR kernel (same A/B scheme as capsule-box above).


def _tri_params(va, vb, vc, K=1):
    row = np.concatenate([np.asarray(va), np.asarray(vb), np.asarray(vc)]).astype(
        np.float32
    )
    return jnp.tile(jnp.asarray(row)[None, :], (K, 1))


def _vec(*xyz, K=1):
    return Vec3(*(jnp.full((K,), float(c), jnp.float32) for c in xyz))


def _ident(K=1):
    return Quat(jnp.zeros(K), jnp.zeros(K), jnp.zeros(K), jnp.ones(K))


def test_sphere_triangle_face():
    # Sphere hovering 0.1 over the face interior of a big CCW (+y) triangle.
    pb = _tri_params((-4, 0, -4), (4, 0, -4), (0, 0, 6))
    # sphere at (0, 0.55, 0), triangle at origin: pos_ab = pos_b - pos_a.
    m = testers.sphere_triangle(_vec(0, -0.55, 0), _ident(), jnp.asarray([[0.5]]), pb)
    assert bool(m.contact_mask[0, 0])
    assert abs(float(m.depth[0, 0]) + 0.05) < 1e-4  # gap 0.05 -> depth -0.05
    assert float(m.normal.y[0]) > 0.9999  # B->A = up
    # Contact sits on the sphere surface toward the triangle.
    assert abs(float(m.offset_a.y[0, 0]) + (0.5 - 0.5 * -0.05)) < 1e-3


def test_sphere_triangle_vertex_and_edge_regions():
    pb = _tri_params((0, 0, 0), (2, 0, 0), (0, 0, 2))
    # Beyond vertex A (origin): sphere at (-1, 0, -1), closest point is the vertex,
    # normal along vertex→center. pos_ab = pos_b − pos_a = (1, 0, 1).
    m = testers.sphere_triangle(
        _vec(1.0, 0.0, 1.0), _ident(), jnp.asarray([[0.5]]), pb
    )
    d = float(m.depth[0, 0])
    expect = 0.5 - np.sqrt(2.0)
    assert abs(d - expect) < 1e-4
    # Edge AB (y=0 segment along x): sphere above the midpoint, off to -z.
    m2 = testers.sphere_triangle(
        _vec(1.0, 0.3, -0.4) * -1.0, _ident(), jnp.asarray([[0.6]]), pb
    )
    d2 = float(m2.depth[0, 0])
    assert abs(d2 - (0.6 - 0.5)) < 1e-4
    n = np.array([float(m2.normal.x[0]), float(m2.normal.y[0]), float(m2.normal.z[0])])
    assert np.allclose(n, [0.0, 0.6, -0.8], atol=1e-4)


def test_sphere_triangle_behind_face_is_backfacing():
    """A sphere behind the winding face must produce a BACK-facing normal (the mesh
    one-sided cull then drops it) — never front-face expulsion."""
    pb = _tri_params((-4, 0, -4), (4, 0, -4), (0, 0, 6))
    m = testers.sphere_triangle(_vec(0, 0.3, 0), _ident(), jnp.asarray([[0.5]]), pb)
    assert float(m.normal.y[0]) < -0.999  # B->A points down: back-facing


def test_capsule_triangle_parallel_face_two_contacts():
    # Horizontal capsule (axis x) resting 0.05 deep on a big triangle.
    q = _quat_axis_angle((0, 0, 1), -np.pi / 2)
    qa = Quat(*(jnp.asarray([c], jnp.float32) for c in q))
    pb = _tri_params((-5, 0, -5), (5, 0, -5), (0, 0, 7))
    m = testers.capsule_triangle(
        _vec(0, -0.45, 0), qa, _ident(), jnp.asarray([[0.5, 1.0, 0.0]]), pb
    )
    mask = np.asarray(m.contact_mask[0])
    assert mask[0] and mask[1], "near-parallel face contact must emit 2 contacts"
    d = np.asarray(m.depth[0])
    assert abs(d[0] - 0.05) < 1e-3 and abs(d[1] - 0.05) < 1e-3
    assert float(m.normal.y[0]) > 0.999
    ox = np.asarray(m.offset_a.x[0])
    assert abs(abs(ox[0]) - 1.0) < 0.05 and abs(abs(ox[1]) - 1.0) < 0.05


def test_capsule_triangle_edge_contact():
    # Capsule axis along x, crossing over the edge AB (along x at z=-5): closest
    # feature is the triangle edge.
    q = _quat_axis_angle((0, 0, 1), -np.pi / 2)
    qa = Quat(*(jnp.asarray([c], jnp.float32) for c in q))
    pb = _tri_params((-5, 0, -5), (5, 0, -5), (0, 0, 7))
    # Center beyond the edge (z=-5.3), 0.4 above: closest distance to edge =
    # sqrt(0.3^2+0.4^2)=0.5, depth = r-0.5 = 0.0 with r=0.5.
    m = testers.capsule_triangle(
        _vec(0, -0.4, 5.3), qa, _ident(), jnp.asarray([[0.5, 1.0, 0.0]]), pb
    )
    d = float(m.depth[0, 0])
    assert abs(d) < 1e-3
    n = np.array([float(m.normal.x[0]), float(m.normal.y[0]), float(m.normal.z[0])])
    assert np.allclose(n, [0.0, 0.8, -0.6], atol=1e-3)


def test_box_triangle_face_rest():
    # Unit box resting 0.05 deep on a big triangle: 4 face contacts, normal +y.
    pb = _tri_params((-6, 0, -6), (6, 0, -6), (0, 0, 8))
    m = testers.box_triangle(
        _vec(0, -0.45, 0), _ident(), _ident(),
        jnp.asarray([[0.5, 0.5, 0.5]]), pb,
    )
    mask = np.asarray(m.contact_mask[0])
    assert mask.sum() == 4, f"expected 4 rectangle-corner contacts, got {mask.sum()}"
    d = np.asarray(m.depth[0])
    assert np.allclose(d[mask], 0.05, atol=2e-3)
    assert float(m.normal.y[0]) > 0.999
    # Contacts at the four bottom corners (|x|=|z|=0.5 up to reduction ordering).
    ox = np.asarray(m.offset_a.x[0])[mask]
    oz = np.asarray(m.offset_a.z[0])[mask]
    assert np.allclose(np.sort(np.abs(ox)), 0.5, atol=1e-3)
    assert np.allclose(np.sort(np.abs(oz)), 0.5, atol=1e-3)


def test_box_triangle_small_triangle_face():
    # Triangle smaller than the box face: contacts are the 3 triangle verts.
    pb = _tri_params((-0.3, 0, -0.3), (0.3, 0, -0.3), (0, 0, 0.4))
    m = testers.box_triangle(
        _vec(0, -0.48, 0), _ident(), _ident(),
        jnp.asarray([[1.0, 0.5, 1.0]]), pb,
    )
    mask = np.asarray(m.contact_mask[0])
    assert mask.sum() == 3
    d = np.asarray(m.depth[0])
    assert np.allclose(d[mask], 0.02, atol=2e-3)
    assert float(m.normal.y[0]) > 0.999


def _random_tri_ab(tester_id, K=96, seed=11):
    """Random shallow configurations of shape A over a CCW triangle; returns analytic
    and generic manifolds for cross-checking."""
    from bepuphysics2_tpu.collision.convex import SupportCtx, generic_convex_manifold
    from bepuphysics2_tpu.shapes.registry import BOX, CAPSULE, SPHERE, TRIANGLE

    rng = np.random.default_rng(seed)
    tri = np.array([[-1.5, 0, -1.2], [1.6, 0, -1.0], [0.1, 0, 1.8]], np.float32)
    pb = jnp.tile(jnp.asarray(tri.reshape(-1))[None, :], (K, 1))

    if tester_id == 0:
        ta, pa_row = SPHERE, [0.45, 0.0, 0.0]
    elif tester_id == 1:
        ta, pa_row = CAPSULE, [0.35, 0.7, 0.0]
    else:
        ta, pa_row = BOX, [0.5, 0.35, 0.45]
    pa = jnp.tile(jnp.asarray([pa_row], jnp.float32), (K, 1))

    axes = rng.normal(size=(K, 3))
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    angs = rng.uniform(0, np.pi, K)
    orn = np.stack(
        [np.concatenate([a * np.sin(t / 2), [np.cos(t / 2)]]) for a, t in zip(axes, angs)]
    ).astype(np.float32)
    y_lo, y_hi = (0.3, 0.62) if tester_id == 0 else (0.42, 0.85)
    pos = np.stack(
        [
            rng.uniform(-0.8, 0.8, K),
            rng.uniform(y_lo, y_hi, K),
            rng.uniform(-0.6, 0.8, K),
        ],
        -1,
    ).astype(np.float32)

    pos_ab = Vec3(*(jnp.asarray(-pos[:, i]) for i in range(3)))
    qa = Quat(*(jnp.asarray(orn[:, i]) for i in range(4)))
    qb = _ident(K)

    if tester_id == 0:
        m = testers.sphere_triangle(pos_ab, qb, pa, pb)
        qa = qb  # sphere pose is orientation-free; match the generic ctx
    elif tester_id == 1:
        m = testers.capsule_triangle(pos_ab, qa, qb, pa, pb)
    else:
        m = testers.box_triangle(pos_ab, qa, qb, pa, pb)

    ctx = SupportCtx(
        type_a=jnp.full(K, ta, jnp.int32),
        params_a=pa,
        type_b=jnp.full(K, TRIANGLE, jnp.int32),
        params_b=pb,
        orn_ab=qa.conjugate().mul(qb),
        pos_ab=qa.rotate_inverse(pos_ab),
        hull_points=None,
        hull_start_a=jnp.zeros(K, jnp.int32),
        hull_count_a=jnp.zeros(K, jnp.int32),
        hull_start_b=jnp.zeros(K, jnp.int32),
        hull_count_b=jnp.zeros(K, jnp.int32),
    )
    gm = generic_convex_manifold(ctx, qa)
    return m, gm


@pytest.mark.parametrize("tester_id", [0, 1, 2])
def test_triangle_testers_match_generic_kernel(tester_id):
    m, gm = _random_tri_ab(tester_id)
    d_best_a = np.max(
        np.where(np.asarray(m.contact_mask), np.asarray(m.depth), -1e9), -1
    )
    d_best_g = np.max(
        np.where(np.asarray(gm.contact_mask), np.asarray(gm.depth), -1e9), -1
    )
    # Compare only where both see proximity (deep separation exactness differs by
    # construction: the generic kernel's support distance is exact, the analytic
    # testers report candidate-set distances).
    near = (d_best_g > -0.2) & (d_best_a > -1e8)
    assert near.sum() > 20
    err = np.abs(d_best_a - d_best_g)[near]
    assert np.median(err) < 0.01, f"median depth err {np.median(err)}"
    assert np.quantile(err, 0.9) < 0.05, f"p90 depth err {np.quantile(err, 0.9)}"
    n_a = np.stack(
        [np.asarray(m.normal.x), np.asarray(m.normal.y), np.asarray(m.normal.z)], -1
    )
    n_g = np.stack(
        [np.asarray(gm.normal.x), np.asarray(gm.normal.y), np.asarray(gm.normal.z)], -1
    )
    # Normals compared only on touching configs (separated closest-feature normals
    # legitimately differ between candidate sets).
    touch = near & (d_best_g > 0.0)
    if touch.sum() > 5:
        cos = np.sum(n_a * n_g, -1)[touch]
        assert np.median(cos) > 0.98, f"median normal cos {np.median(cos)}"
