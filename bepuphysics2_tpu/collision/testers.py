"""Vectorized convex pair testers — speculative contact manifold generation.

Each tester processes ALL pair records at once (shapes gathered per record), mirroring the
reference's SIMD-batched `*PairTester` structs (reference:
CollisionDetection/CollisionTasks/SpherePairTester.cs:10, BoxPairTester.cs,
CapsulePairTester.cs...) with lanes = the full pair array instead of a CPU SIMD bundle.
Testers always produce a manifold (speculative contacts with negative depth when
separated); the caller masks records by type-pair and acceptance (depth > −margin).

Conventions (match the reference):
- normal points from B to A;
- contact offsets are world-space relative to A's center;
- each tester receives A = first shape of its canonical type pair; the dispatcher flips
  pair order as needed and un-flips the resulting manifold.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.packing import select_col, select_cols
from ..utils.vec import Quat, Vec3
from .manifold import Manifold

_EPS = 1e-10


def _single_contact(offset: Vec3, depth, normal: Vec3, feature=0) -> Manifold:
    n = offset.x.shape[0]
    zero3 = Vec3.zeros((n, 4))
    return Manifold(
        normal=normal,
        offset_a=Vec3(
            zero3.x.at[:, 0].set(offset.x),
            zero3.y.at[:, 0].set(offset.y),
            zero3.z.at[:, 0].set(offset.z),
        ),
        depth=jnp.zeros((n, 4), jnp.float32).at[:, 0].set(depth),
        feature=jnp.full((n, 4), feature, jnp.int32),
        contact_mask=jnp.zeros((n, 4), bool).at[:, 0].set(True),
    )


def sphere_sphere(pos_ab: Vec3, params_a, params_b) -> Manifold:
    """reference: CollisionTasks/SpherePairTester.cs:25."""
    ra = params_a[:, 0]
    rb = params_b[:, 0]
    d2 = pos_ab.length_squared()
    d = jnp.sqrt(d2)
    inv_d = jnp.where(d > _EPS, 1.0 / jnp.maximum(d, _EPS), 0.0)
    dir_ab = pos_ab * inv_d  # A → B
    # Degenerate co-centered: arbitrary up normal.
    dir_ab = dir_ab.where(d > _EPS, Vec3.full(d.shape, 0.0, 1.0, 0.0))
    depth = ra + rb - d
    normal = -dir_ab  # B → A
    contact = dir_ab * (ra - 0.5 * depth)
    return _single_contact(contact, depth, normal)


def sphere_box(pos_ab: Vec3, orn_b: Quat, params_a, params_b) -> Manifold:
    """Sphere A vs box B: clamp the sphere center (expressed in B's frame) to the box,
    with interior fallback to the nearest face (reference: CollisionTasks/SphereBoxTester.cs)."""
    r = params_a[:, 0]
    h = Vec3(params_b[:, 0], params_b[:, 1], params_b[:, 2])
    # Sphere center in B's local frame.
    local_center = orn_b.rotate_inverse(-pos_ab)  # (posA - posB) in B frame
    clamped = local_center.max(-1.0 * h).min(h)
    offset = local_center - clamped
    dist2 = offset.length_squared()
    outside = dist2 > _EPS
    dist = jnp.sqrt(jnp.maximum(dist2, _EPS))

    # Interior: push out through nearest face.
    face_dist = Vec3(h.x - jnp.abs(local_center.x), h.y - jnp.abs(local_center.y), h.z - jnp.abs(local_center.z))
    min_fd = jnp.minimum(face_dist.x, jnp.minimum(face_dist.y, face_dist.z))
    sel_x = face_dist.x == min_fd
    sel_y = (~sel_x) & (face_dist.y == min_fd)
    sgn = lambda c: jnp.where(c >= 0, 1.0, -1.0)
    interior_normal = Vec3(
        jnp.where(sel_x, sgn(local_center.x), 0.0),
        jnp.where(sel_y, sgn(local_center.y), 0.0),
        jnp.where(~(sel_x | sel_y), sgn(local_center.z), 0.0),
    )
    local_normal = (offset * (1.0 / dist)).where(outside, interior_normal)
    depth = jnp.where(outside, r - dist, r + min_fd)

    # Surface point on the box (world), then offset from sphere center A.
    surface_local = clamped.where(
        outside,
        Vec3(
            jnp.where(sel_x, sgn(local_center.x) * h.x, local_center.x),
            jnp.where(sel_y, sgn(local_center.y) * h.y, local_center.y),
            jnp.where(~(sel_x | sel_y), sgn(local_center.z) * h.z, local_center.z),
        ),
    )
    normal = orn_b.rotate(local_normal)  # points from box surface toward sphere = B→A ✓
    contact_world_rel_a = orn_b.rotate(surface_local) + pos_ab  # from A center
    # Place the contact at the sphere surface toward the box (midpoint of overlap):
    contact = normal * -(r - 0.5 * jnp.maximum(depth, 0.0))
    contact = contact.where(depth < r, contact_world_rel_a)  # deep case: use surface point
    return _single_contact(contact, depth, normal)


def _closest_on_segment(p: Vec3, half_length, axis: Vec3):
    """t of closest point on segment {t·axis, |t|≤hl} to point p."""
    t = p.dot(axis)
    return jnp.clip(t, -half_length, half_length)


def sphere_capsule(pos_ab: Vec3, orn_b: Quat, params_a, params_b) -> Manifold:
    """Sphere A vs capsule B (reference: CollisionTasks/SphereCapsuleTester.cs)."""
    ra = params_a[:, 0]
    rb = params_b[:, 0]
    hl = params_b[:, 1]
    axis = orn_b.rotate(Vec3.full(ra.shape, 0.0, 1.0, 0.0))
    # Closest point on B's segment to A's center: segment center at posB = A + pos_ab.
    rel = -pos_ab  # A center relative to B center
    t = _closest_on_segment(rel, hl, axis)
    closest = pos_ab + axis * t  # from A center to closest segment point
    d = closest.length()
    inv_d = jnp.where(d > _EPS, 1.0 / jnp.maximum(d, _EPS), 0.0)
    dir_ab = (closest * inv_d).where(d > _EPS, Vec3.full(d.shape, 0.0, 1.0, 0.0))
    depth = ra + rb - d
    normal = -dir_ab
    contact = dir_ab * (ra - 0.5 * depth)
    return _single_contact(contact, depth, normal)


def capsule_capsule(pos_ab: Vec3, orn_a: Quat, orn_b: Quat, params_a, params_b) -> Manifold:
    """Capsule-capsule via segment-segment closest points; 2-contact manifold when the
    segments are near-parallel (reference: CollisionTasks/CapsulePairTester.cs:16)."""
    ra, hla = params_a[:, 0], params_a[:, 1]
    rb, hlb = params_b[:, 0], params_b[:, 1]
    da = orn_a.rotate(Vec3.full(ra.shape, 0.0, 1.0, 0.0))
    db = orn_b.rotate(Vec3.full(ra.shape, 0.0, 1.0, 0.0))
    r = pos_ab  # B center - A center

    # Segment-segment closest points (clamped, standard quadratic).
    a_dot_b = da.dot(db)
    da_r = da.dot(r)
    db_r = db.dot(r)
    denom = 1.0 - a_dot_b * a_dot_b
    ta = jnp.where(denom > 1e-7, jnp.clip((da_r - a_dot_b * db_r) / jnp.maximum(denom, 1e-7), -hla, hla), 0.0)
    tb = jnp.clip(db.dot(da * ta - r), -hlb, hlb)
    ta = jnp.clip(da.dot(r + db * tb), -hla, hla)

    pa = da * ta  # on A's segment, rel A
    pb = r + db * tb  # on B's segment, rel A
    d_vec = pb - pa
    d = d_vec.length()
    inv_d = jnp.where(d > _EPS, 1.0 / jnp.maximum(d, _EPS), 0.0)
    dir_ab = (d_vec * inv_d).where(d > _EPS, da.cross(Vec3.full(d.shape, 0.0, 1.0, 0.0)).normalize())
    normal = -dir_ab
    depth0 = ra + rb - d
    contact0 = pa + dir_ab * (ra - 0.5 * depth0)

    # Parallel case: add a second contact from the overlapping interval of the segments.
    parallel = denom <= 1e-3
    # Project B's endpoints onto A's axis, intersect intervals.
    e0 = db_r - a_dot_b * hlb
    e1 = db_r + a_dot_b * hlb
    lo = jnp.maximum(-hla, jnp.minimum(e0, e1))
    hi = jnp.minimum(hla, jnp.maximum(e0, e1))
    t0 = lo
    t1 = hi
    pa1 = da * t1
    # Closest point on B to pa1:
    tb1 = jnp.clip(db.dot(pa1 - r), -hlb, hlb)
    pb1 = r + db * tb1
    d1_vec = pb1 - pa1
    d1 = d1_vec.length()
    depth1 = ra + rb - d1
    contact1 = pa1 + dir_ab * (ra - 0.5 * depth1)
    # First contact uses t0 end in parallel case:
    pa0 = da * t0
    tb0 = jnp.clip(db.dot(pa0 - r), -hlb, hlb)
    pb0 = r + db * tb0
    d0 = (pb0 - pa0).length()
    depth0p = ra + rb - d0
    contact0p = pa0 + dir_ab * (ra - 0.5 * depth0p)

    use0 = contact0p.where(parallel, contact0)
    dep0 = jnp.where(parallel, depth0p, depth0)

    n = ra.shape[0]
    z4 = jnp.zeros((n, 4), jnp.float32)
    return Manifold(
        normal=normal,
        offset_a=Vec3(
            z4.at[:, 0].set(use0.x).at[:, 1].set(contact1.x),
            z4.at[:, 0].set(use0.y).at[:, 1].set(contact1.y),
            z4.at[:, 0].set(use0.z).at[:, 1].set(contact1.z),
        ),
        depth=z4.at[:, 0].set(dep0).at[:, 1].set(depth1),
        feature=jnp.zeros((n, 4), jnp.int32).at[:, 1].set(1),
        contact_mask=jnp.zeros((n, 4), bool).at[:, 0].set(True).at[:, 1].set(parallel & (hi > lo)),
    )


def _capsule_box_edge(au, av, aw, du, dv, dw, hl, eu, ev, hu, hv, hw):
    """Closest-approach candidate between the capsule segment and ONE representative box
    edge, expressed in a (u, v, w) permutation of the box frame where the edge runs along
    w through (eu, ev, 0). Returns (ta, depth_core, nu, nv, nw) with the normal unit and
    calibrated toward the capsule center (B→A). reference capability:
    CollisionTasks/CapsuleBoxTester.cs TestAndRefineBoxEdge (own derivation).

    Segment: p(t) = a + t·d (|t| ≤ hl); edge line: q(s) = (eu, ev, s).
    Unclamped closest approach: ta = (d·(b−a) + a_w·d_w) / (1 − d_w²) with
    b = (eu, ev, 0); then both params clamp to their segments via the mutual
    interval projections (cheap conservative clamp that agrees with the exact
    clamped solution in the non-degenerate cases that matter for manifolds)."""
    ab_u = eu - au
    ab_v = ev - av
    d_dot_ab = du * ab_u + dv * ab_v - dw * aw
    denom = jnp.maximum(1e-15, 1.0 - dw * dw)
    ta = (d_dot_ab + aw * dw) / denom
    tb = ta * dw + aw

    # Mutual clamped intervals: project each segment onto the other's axis.
    absdadb = jnp.abs(dw)
    b_onto_a = hw * absdadb
    a_onto_b = hl * absdadb
    ta_min = jnp.maximum(-hl, jnp.minimum(hl, d_dot_ab - b_onto_a))
    ta_max = jnp.minimum(hl, jnp.maximum(-hl, d_dot_ab + b_onto_a))
    tb_min = jnp.maximum(-hw, jnp.minimum(hw, aw - a_onto_b))
    tb_max = jnp.minimum(hw, jnp.maximum(-hw, aw + a_onto_b))
    ta = jnp.clip(ta, ta_min, ta_max)
    tb = jnp.clip(tb, tb_min, tb_max)

    cu = au + ta * du
    cv = av + ta * dv
    cw = aw + ta * dw
    nu = cu - eu
    nv = cv - ev
    nw = cw - tb
    len2 = nu * nu + nv * nv + nw * nw
    # Degenerate (segment intersects edge): fall back to cross(d, edge_w) = (dv, -du, 0);
    # doubly degenerate (parallel): (1, 0, 0).
    fb2 = du * du + dv * dv
    use_fb = len2 < 1e-10
    use_fb2 = use_fb & (fb2 < 1e-10)
    len2 = jnp.where(use_fb2, 1.0, jnp.where(use_fb, fb2, len2))
    nu = jnp.where(use_fb2, 1.0, jnp.where(use_fb, dv, nu))
    nv = jnp.where(use_fb2, 0.0, jnp.where(use_fb, -du, nv))
    nw = jnp.where(use_fb2, 0.0, jnp.where(use_fb, 0.0, nw))
    # Calibrate toward the capsule center (B→A) and normalize.
    calib = nu * au + nv * av + nw * aw
    sgn = jnp.where(calib < 0.0, -1.0, 1.0)
    inv_len = sgn / jnp.sqrt(len2)
    nu, nv, nw = nu * inv_len, nv * inv_len, nw * inv_len
    # Core depth along the candidate normal: box support minus capsule-segment support.
    box_extreme = jnp.abs(nu) * hu + jnp.abs(nv) * hv + jnp.abs(nw) * hw
    cap_extreme = nu * cu + nv * cv + nw * cw
    return ta, box_extreme - cap_extreme, nu, nv, nw


def capsule_box(pos_ab: Vec3, orn_a: Quat, orn_b: Quat, params_a, params_b) -> Manifold:
    """Capsule A vs box B: 3 representative-edge + 3 face candidates, then a 2-contact
    manifold by clipping the capsule axis against the representative face in its tangent
    plane (reference capability: CollisionTasks/CapsuleBoxTester.cs — own derivation).
    Per-contact depths come from the unprojection separation, so a tilted capsule on a
    face gets distinct endpoint depths."""
    r, hl = params_a[:, 0], params_a[:, 1]
    hb = Vec3(params_b[:, 0], params_b[:, 1], params_b[:, 2])
    N = r.shape[0]

    # Everything in the box's local frame.
    a = orn_b.rotate_inverse(-1.0 * pos_ab)  # capsule center
    d = orn_b.rotate_inverse(orn_a.rotate(Vec3.full((N,), 0.0, 1.0, 0.0)))  # capsule axis

    # Representative edge per box axis: the edge of the sign-quadrant containing the
    # closest point of the capsule segment to the box center.
    t_star = jnp.clip(-a.dot(d), -hl, hl)
    p_star = a + d * t_star
    ex = jnp.where(p_star.x < 0.0, -hb.x, hb.x)
    ey = jnp.where(p_star.y < 0.0, -hb.y, hb.y)
    ez = jnp.where(p_star.z < 0.0, -hb.z, hb.z)

    # Edge candidates (w = edge direction axis).
    ta_z, dep_z, nzx, nzy, nzz = _capsule_box_edge(
        a.x, a.y, a.z, d.x, d.y, d.z, hl, ex, ey, hb.x, hb.y, hb.z
    )
    ta_x, dep_x, nxy, nxz, nxx = _capsule_box_edge(
        a.y, a.z, a.x, d.y, d.z, d.x, hl, ey, ez, hb.y, hb.z, hb.x
    )
    ta_y, dep_y, nyz, nyx, nyy = _capsule_box_edge(
        a.z, a.x, a.y, d.z, d.x, d.y, hl, ez, ex, hb.z, hb.x, hb.y
    )

    depth = dep_x
    ta = ta_x
    n = Vec3(nxx, nxy, nxz)

    def pick(dep_c, ta_c, n_c, depth, ta, n):
        better = dep_c < depth
        return (
            jnp.where(better, dep_c, depth),
            jnp.where(better, ta_c, ta),
            n_c.where(better, n),
        )

    depth, ta, n = pick(dep_y, ta_y, Vec3(nyx, nyy, nyz), depth, ta, n)
    depth, ta, n = pick(dep_z, ta_z, Vec3(nzx, nzy, nzz), depth, ta, n)

    # Face candidates.
    fsx = jnp.where(a.x > 0.0, 1.0, -1.0)
    fsy = jnp.where(a.y > 0.0, 1.0, -1.0)
    fsz = jnp.where(a.z > 0.0, 1.0, -1.0)
    zero = jnp.zeros((N,), jnp.float32)
    fdx = hb.x + jnp.abs(d.x) * hl - fsx * a.x
    fdy = hb.y + jnp.abs(d.y) * hl - fsy * a.y
    fdz = hb.z + jnp.abs(d.z) * hl - fsz * a.z
    depth, ta, n = pick(fdx, ta, Vec3(fsx, zero, zero), depth, ta, n)
    depth, ta, n = pick(fdy, ta, Vec3(zero, fsy, zero), depth, ta, n)
    depth, ta, n = pick(fdz, ta, Vec3(zero, zero, fsz), depth, ta, n)

    # Representative face = the face whose outward normal best matches the winning
    # normal; build the capsule-axis interval by unprojecting onto that face plane
    # along n and clipping in the face's tangent plane.
    xd = n.x * fsx
    yd = n.y * fsy
    zd = n.z * fsz
    use_x = xd > jnp.maximum(yd, zd)
    use_y = (~use_x) & (yd > zd)
    use_z = ~(use_x | use_y)

    fn_dot_n = jnp.where(use_x, xd, jnp.where(use_y, yd, zd))
    inv_fn_dot_n = 1.0 / jnp.maximum(1e-15, fn_dot_n)
    axis_dot_fn = jnp.where(use_x, d.x * fsx, jnp.where(use_y, d.y * fsy, d.z * fsz))
    center_dot_fn = jnp.where(use_x, a.x * fsx, jnp.where(use_y, a.y * fsy, a.z * fsz))
    face_offset = jnp.where(use_x, hb.x, jnp.where(use_y, hb.y, hb.z))
    t_axis = axis_dot_fn * inv_fn_dot_n
    t_center = (center_dot_fn - face_offset) * inv_fn_dot_n

    unproj_axis = d - n * t_axis
    unproj_center = a - n * t_center
    # Tangent coordinates: face X → (y, z); face Y → (x, z); face Z → (x, y).
    ts_ax = jnp.where(use_x, unproj_axis.y, unproj_axis.x)
    ts_ay = jnp.where(use_z, unproj_axis.y, unproj_axis.z)
    ts_cx = jnp.where(use_x, unproj_center.y, unproj_center.x)
    ts_cy = jnp.where(use_z, unproj_center.y, unproj_center.z)
    eps_scale = jnp.minimum(
        jnp.maximum(hb.x, jnp.maximum(hb.y, hb.z)), jnp.maximum(hl, r)
    )
    eps = eps_scale * 1e-3
    half_u = eps + jnp.where(use_x, hb.y, hb.x)
    half_v = eps + jnp.where(use_z, hb.y, hb.z)

    inv_ax = -1.0 / jnp.where(jnp.abs(ts_ax) < 1e-15, 1e-15, ts_ax)
    inv_ay = -1.0 / jnp.where(jnp.abs(ts_ay) < 1e-15, 1e-15, ts_ay)
    tx0 = (ts_cx - half_u) * inv_ax
    tx1 = (ts_cx + half_u) * inv_ax
    ty0 = (ts_cy - half_v) * inv_ay
    ty1 = (ts_cy + half_v) * inv_ay
    min_x = jnp.minimum(tx0, tx1)
    max_x = jnp.maximum(tx0, tx1)
    min_y = jnp.minimum(ty0, ty1)
    max_y = jnp.maximum(ty0, ty1)
    big = 3.0e38
    fb_x = jnp.abs(ts_ax) < 1e-15
    fb_y = jnp.abs(ts_ay) < 1e-15
    in_x = jnp.abs(ts_cx) <= half_u
    in_y = jnp.abs(ts_cy) <= half_v
    min_x = jnp.where(fb_x, jnp.where(in_x, -big, big), min_x)
    max_x = jnp.where(fb_x, jnp.where(in_x, big, -big), max_x)
    min_y = jnp.where(fb_y, jnp.where(in_y, -big, big), min_y)
    max_y = jnp.where(fb_y, jnp.where(in_y, big, -big), max_y)
    face_min = jnp.maximum(min_x, min_y)
    face_max = jnp.minimum(max_x, max_y)
    t_min = jnp.clip(face_min, -hl, hl)
    t_max = jnp.clip(face_max, -hl, hl)
    has_interval = face_max >= face_min
    t_min = jnp.where(has_interval, jnp.minimum(t_min, ta), ta)
    t_max = jnp.where(has_interval, jnp.maximum(t_max, ta), ta)

    # Per-contact depths from the unprojection separation.
    sep_min = t_center + t_axis * t_min
    sep_max = t_center + t_axis * t_max
    depth0 = r - sep_min
    depth1 = r - sep_max

    normal = orn_b.rotate(n)
    p0 = orn_b.rotate(d * t_min)
    p1 = orn_b.rotate(d * t_max)
    # Push contacts from the axis to the capsule surface / midpoint of overlap.
    p0 = p0 + normal * (depth0 * 0.5 - r)
    p1 = p1 + normal * (depth1 * 0.5 - r)

    z4 = jnp.zeros((N, 4), jnp.float32)
    return Manifold(
        normal=normal,
        offset_a=Vec3(
            z4.at[:, 0].set(p0.x).at[:, 1].set(p1.x),
            z4.at[:, 0].set(p0.y).at[:, 1].set(p1.y),
            z4.at[:, 0].set(p0.z).at[:, 1].set(p1.z),
        ),
        depth=z4.at[:, 0].set(depth0).at[:, 1].set(depth1),
        feature=jnp.zeros((N, 4), jnp.int32).at[:, 1].set(1),
        contact_mask=jnp.zeros((N, 4), bool)
        .at[:, 0]
        .set(True)
        .at[:, 1]
        .set(t_max - t_min > 1e-7 * hl),
    )


def _box_vertices(h: Vec3):
    """(N, 8) local vertices of a box with half extents h."""
    signs = jnp.array(
        [[-1, -1, -1], [1, -1, -1], [-1, 1, -1], [1, 1, -1],
         [-1, -1, 1], [1, -1, 1], [-1, 1, 1], [1, 1, 1]],
        jnp.float32,
    )
    return Vec3(
        h.x[:, None] * signs[None, :, 0],
        h.y[:, None] * signs[None, :, 1],
        h.z[:, None] * signs[None, :, 2],
    )

def box_box(pos_ab: Vec3, orn_a: Quat, orn_b: Quat, params_a, params_b) -> Manifold:
    """Box-box: SAT over 15 axes, then a fixed-candidate face manifold (reference:
    CollisionTasks/BoxPairTester.cs — same capability; formulated scatter-free for XLA).

    Face manifolds are built from 24 masked candidates in the reference face's 2D frame:
    4 incident-face vertices (inside the face rectangle), 16 incident-edge × rectangle-slab
    intersections, and 4 rectangle corners (inside the incident quad) — the exact convex
    polygon intersection without Sutherland-Hodgman compaction. Candidates reduce to ≤4 by
    deepest/extremal selection (reference ManifoldCandidateHelper capability). Edge-edge
    axes produce a single closest-point contact.
    """
    N = params_a.shape[0]
    ha = Vec3(params_a[:, 0], params_a[:, 1], params_a[:, 2])
    hb = Vec3(params_b[:, 0], params_b[:, 1], params_b[:, 2])

    # Orientation of B in A's frame; B center offset t in A's frame.
    q_ab = orn_a.conjugate().mul(orn_b)
    rb = q_ab.to_matrix()  # rows = images of B's local axes, in A frame
    t = orn_a.rotate_inverse(pos_ab)

    b_axes = [rb.rx, rb.ry, rb.rz]
    ha_arr = [ha.x, ha.y, ha.z]
    hb_arr = [hb.x, hb.y, hb.z]
    ones = jnp.ones((N,), jnp.float32)
    zeros = jnp.zeros((N,), jnp.float32)
    a_axes = [Vec3(ones, zeros, zeros), Vec3(zeros, ones, zeros), Vec3(zeros, zeros, ones)]

    def project_b(axis: Vec3):
        return (
            jnp.abs(axis.dot(b_axes[0])) * hb_arr[0]
            + jnp.abs(axis.dot(b_axes[1])) * hb_arr[1]
            + jnp.abs(axis.dot(b_axes[2])) * hb_arr[2]
        )

    def project_a(axis: Vec3):
        return jnp.abs(axis.x) * ha_arr[0] + jnp.abs(axis.y) * ha_arr[1] + jnp.abs(axis.z) * ha_arr[2]

    big = jnp.full((N,), 3.0e38, jnp.float32)
    best_depth = big
    best_axis = Vec3.full((N,), 0.0, 1.0, 0.0)
    best_id = jnp.zeros((N,), jnp.int32)

    # Characteristic contact scale for tie-break penalties (works for negative/speculative
    # depths too, where a multiplicative bias would invert its meaning).
    min_ext = jnp.minimum(
        jnp.minimum(jnp.minimum(ha.x, ha.y), ha.z),
        jnp.minimum(jnp.minimum(hb.x, hb.y), hb.z),
    )

    def consider(depth, axis, axis_id, best_depth, best_axis, best_id, bias=1.0):
        # Calibrate the axis to point from B to A (axis·t < 0; t = A→B in A frame).
        flip = axis.dot(t) > 0.0
        axis = axis.where(~flip, -1.0 * axis)
        penalty = (bias - 1.0) * (0.05 * min_ext + jnp.abs(depth))
        better = depth + penalty < best_depth
        return (
            jnp.where(better, depth, best_depth),
            axis.where(better, best_axis),
            jnp.where(better, axis_id, best_id),
        )

    # Axis-preference biases: near-degenerate stacking makes face and edge depths equal
    # to float noise, and any frame-to-frame winner flip changes the manifold's feature
    # ids (losing warm starts) or collapses 4 contacts to 1 (edge) — the classic box-stack
    # jitter. Deterministic tie-breaks: B faces must be clearly shallower than A faces,
    # and edge axes clearly shallower than any face (same idea as the reference's
    # BoxPairTester margins / Bullet's SAT relative tolerance).
    FACE_B_BIAS = 1.0 + 1e-3
    EDGE_BIAS = 1.05
    for i in range(3):  # face axes of A (ids 0-2)
        axis = a_axes[i]
        depth = ha_arr[i] + project_b(axis) - jnp.abs(axis.dot(t))
        best_depth, best_axis, best_id = consider(depth, axis, i, best_depth, best_axis, best_id)
    for j in range(3):  # face axes of B (ids 3-5)
        axis = b_axes[j]
        depth = project_a(axis) + hb_arr[j] - jnp.abs(axis.dot(t))
        best_depth, best_axis, best_id = consider(
            depth, axis, 3 + j, best_depth, best_axis, best_id, bias=FACE_B_BIAS
        )
    for i in range(3):  # edge-edge axes (ids 6-14); strong bias prefers face manifolds
        for j in range(3):
            raw = a_axes[i].cross(b_axes[j])
            ln = raw.length()
            ok = ln > 1e-6
            axis = raw * jnp.where(ok, 1.0 / jnp.maximum(ln, 1e-6), 0.0)
            depth = jnp.where(ok, project_a(axis) + project_b(axis) - jnp.abs(axis.dot(t)), big)
            best_depth, best_axis, best_id = consider(
                depth, axis, 6 + i * 3 + j, best_depth, best_axis, best_id, bias=EDGE_BIAS
            )

    face_contact = best_id < 6
    a_is_ref = best_id < 3
    n_local = best_axis  # B→A in A frame

    # ---- Shared face-manifold builder in the reference face's (u, v) frame. ------------
    def face_candidates(n_ref_out: Vec3, h_ref: Vec3, ref_axes, inc_axes, h_inc, t_inc: Vec3):
        """``n_ref_out``: unit normal of the reference box pointing toward the incident
        box (in the working frame). ``ref_axes``: the reference box's axes in the working
        frame. ``t_inc``: incident box center. Returns candidate (points_3d Vec3 (N,24),
        mask (N,24), feature (N,24), and the reference face plane offset s_ref)."""
        # Pick the reference face dim = argmax |n_ref_out·ref_axis|, and its two tangents.
        dots = jnp.stack([jnp.abs(n_ref_out.dot(ax)) for ax in ref_axes], -1)
        rdim = jnp.argmax(dots, -1)

        def pick(vecs, k):
            return Vec3(
                jnp.where(k == 0, vecs[0].x, jnp.where(k == 1, vecs[1].x, vecs[2].x)),
                jnp.where(k == 0, vecs[0].y, jnp.where(k == 1, vecs[1].y, vecs[2].y)),
                jnp.where(k == 0, vecs[0].z, jnp.where(k == 1, vecs[1].z, vecs[2].z)),
            )

        def pick_h(h3, k):
            hs = [h3.x, h3.y, h3.z]
            return jnp.where(k == 0, hs[0], jnp.where(k == 1, hs[1], hs[2]))

        u_ax = pick(ref_axes, (rdim + 1) % 3)
        v_ax = pick(ref_axes, (rdim + 2) % 3)
        h_u = pick_h(h_ref, (rdim + 1) % 3)
        h_v = pick_h(h_ref, (rdim + 2) % 3)

        # Incident face: the incident box face most anti-parallel to n_ref_out.
        inc_dots = jnp.stack([n_ref_out.dot(ax) for ax in inc_axes], -1)
        k_inc = jnp.argmax(jnp.abs(inc_dots), -1)
        s_inc = -jnp.sign(select_col(inc_dots, k_inc))
        s_inc = jnp.where(s_inc == 0, 1.0, s_inc)
        inc_n_ax = pick(inc_axes, k_inc)
        inc_u_ax = pick(inc_axes, (k_inc + 1) % 3)
        inc_v_ax = pick(inc_axes, (k_inc + 2) % 3)
        inc_h_n = pick_h(h_inc, k_inc)
        inc_h_u = pick_h(h_inc, (k_inc + 1) % 3)
        inc_h_v = pick_h(h_inc, (k_inc + 2) % 3)
        face_center = t_inc + inc_n_ax * (s_inc * inc_h_n)
        signs = [(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]
        verts = [face_center + inc_u_ax * (su * inc_h_u) + inc_v_ax * (sv * inc_h_v) for su, sv in signs]

        # 2D coords of incident verts in the reference face frame.
        vu = [u_ax.dot(p) for p in verts]
        vv = [v_ax.dot(p) for p in verts]

        cand_pts = []
        cand_mask = []
        cand_feat = []
        eps = 1e-6
        # (a) incident verts inside the rectangle.
        for m in range(4):
            inside = (jnp.abs(vu[m]) <= h_u + eps) & (jnp.abs(vv[m]) <= h_v + eps)
            cand_pts.append(verts[m])
            cand_mask.append(inside)
            cand_feat.append(jnp.full((N,), m, jnp.int32))
        # (b) incident edge × slab-plane intersections.
        for m in range(4):
            p0 = verts[m]
            p1 = verts[(m + 1) % 4]
            u0, u1 = vu[m], vu[(m + 1) % 4]
            v0, v1 = vv[m], vv[(m + 1) % 4]
            for p_idx, (c0, c1, lim, other0, other1, other_lim) in enumerate(
                [
                    (u0, u1, h_u, v0, v1, h_v),  # u = +h_u
                    (u0, u1, -1.0, v0, v1, h_v),  # placeholder sign handled below
                    (v0, v1, h_v, u0, u1, h_u),
                    (v0, v1, -1.0, u0, u1, h_u),
                ]
            ):
                if p_idx == 1:
                    lim = -h_u
                elif p_idx == 3:
                    lim = -h_v
                denom = c1 - c0
                frac = (lim - c0) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
                valid = (jnp.abs(denom) > 1e-9) & (frac >= 0.0) & (frac <= 1.0)
                other = other0 + (other1 - other0) * frac
                valid = valid & (jnp.abs(other) <= other_lim + eps)
                pt = p0 + (p1 - p0) * frac
                cand_pts.append(pt)
                cand_mask.append(valid)
                cand_feat.append(jnp.full((N,), 16 + m * 4 + p_idx, jnp.int32))
        # (c) rectangle corners inside the incident quad (2D convex test) — lifted onto
        # the incident face plane along the face normal direction.
        inc_n = inc_n_ax * s_inc  # outward incident-face normal (points toward reference)
        n_dim = pick(ref_axes, rdim)
        plane_d = inc_n.dot(verts[0])
        denom_w = inc_n.dot(n_dim)
        for ci, (su, sv) in enumerate(signs):
            cu = su * h_u
            cv = sv * h_v
            # inside incident quad: consistent cross signs in (u, v)
            inside = jnp.ones((N,), bool)
            for m in range(4):
                eu = vu[(m + 1) % 4] - vu[m]
                ev = vv[(m + 1) % 4] - vv[m]
                cross = eu * (cv - vv[m]) - ev * (cu - vu[m])
                # winding sign per record: use the quad's own signed area
                inside = inside & (cross * _quad_winding(vu, vv) >= -eps)
            base = u_ax * cu + v_ax * cv  # point in the u,v plane through origin
            w = (plane_d - inc_n.dot(base)) / jnp.where(jnp.abs(denom_w) > 1e-9, denom_w, 1e-9)
            pt = base + n_dim * w
            cand_pts.append(pt)
            cand_mask.append(inside & (jnp.abs(denom_w) > 1e-9))
            cand_feat.append(jnp.full((N,), 64 + ci, jnp.int32))

        pts = Vec3(
            jnp.stack([p.x for p in cand_pts], -1),
            jnp.stack([p.y for p in cand_pts], -1),
            jnp.stack([p.z for p in cand_pts], -1),
        )
        mask = jnp.stack(cand_mask, -1)
        feat = jnp.stack(cand_feat, -1)
        return pts, mask, feat

    def _quad_winding(vu, vv):
        # 2x signed area of incident quad in (u, v); sign gives winding.
        area = jnp.zeros_like(vu[0])
        for m in range(4):
            area = area + vu[m] * vv[(m + 1) % 4] - vu[(m + 1) % 4] * vv[m]
        return jnp.sign(jnp.where(area == 0, 1.0, area))

    # A as reference (work in A frame).
    n_ref_a = -1.0 * n_local  # from A toward B
    pts_a, mask_a, feat_a = face_candidates(n_ref_a, ha, a_axes, b_axes, hb, t)
    # B as reference (work in B frame): transform n_local and A's pose into B frame.
    rb_t_rows = [
        Vec3(rb.rx.x, rb.ry.x, rb.rz.x),
        Vec3(rb.rx.y, rb.ry.y, rb.rz.y),
        Vec3(rb.rx.z, rb.ry.z, rb.rz.z),
    ]  # rows of rb^T = A's axes expressed in B frame? (columns of rb)

    def to_b_frame(v: Vec3) -> Vec3:
        return Vec3(rb.rx.dot(v), rb.ry.dot(v), rb.rz.dot(v))

    n_local_b = to_b_frame(n_local)
    t_b = to_b_frame(-1.0 * t)  # A center in B frame
    ones_b = jnp.ones((N,), jnp.float32)
    b_frame_axes = [Vec3(ones_b, zeros, zeros), Vec3(zeros, ones_b, zeros), Vec3(zeros, zeros, ones_b)]
    a_axes_in_b = rb_t_rows  # images of A's axes in B frame
    pts_b, mask_b, feat_b = face_candidates(
        1.0 * n_local_b, hb, b_frame_axes, a_axes_in_b, ha, t_b
    )
    # Transform B-frame candidate points into A frame: p_a = t + R p_b (R rows = b_axes).
    def from_b_frame(p: Vec3) -> Vec3:
        return Vec3(
            t.x[:, None] + rb.rx.x[:, None] * p.x + rb.ry.x[:, None] * p.y + rb.rz.x[:, None] * p.z,
            t.y[:, None] + rb.rx.y[:, None] * p.x + rb.ry.y[:, None] * p.y + rb.rz.y[:, None] * p.z,
            t.z[:, None] + rb.rx.z[:, None] * p.x + rb.ry.z[:, None] * p.y + rb.rz.z[:, None] * p.z,
        )

    pts_b_in_a = from_b_frame(pts_b)

    am = a_is_ref[:, None]
    pts = Vec3(
        jnp.where(am, pts_a.x, pts_b_in_a.x),
        jnp.where(am, pts_a.y, pts_b_in_a.y),
        jnp.where(am, pts_a.z, pts_b_in_a.z),
    )
    cmask = jnp.where(am, mask_a, mask_b)
    cfeat = jnp.where(am, feat_a, feat_b + 4096)

    # Per-candidate depth along n (n points B→A): A's face toward B at n·x = −s_a ⇒
    # depth = s_a + n·p ; B's face toward A at n·(x−t) = +s_b ⇒ depth = s_b + n·t − n·p.
    s_a = project_a(n_local)
    s_b = project_b(n_local)
    np_dot = n_local.x[:, None] * pts.x + n_local.y[:, None] * pts.y + n_local.z[:, None] * pts.z
    depth_a_ref = s_a[:, None] + np_dot
    depth_b_ref = (s_b + n_local.dot(t))[:, None] - np_dot
    depth_pts = jnp.where(am, depth_a_ref, depth_b_ref)
    neg_big = -3.0e38
    depth_masked = jnp.where(cmask, depth_pts, neg_big)

    # ---- Reduce ≤24 candidates to ≤4: deepest, farthest, then two extremal sides.
    K = depth_masked.shape[1]
    kk = jnp.arange(K)[None, :]

    def pick_max(scores, taken):
        return jnp.argmax(jnp.where(taken, neg_big, scores), -1)

    g = lambda arr, i: select_col(arr, i)
    taken = ~cmask
    i0 = pick_max(depth_masked, taken)
    p0 = Vec3(g(pts.x, i0), g(pts.y, i0), g(pts.z, i0))
    taken = taken | (kk == i0[:, None])
    d0 = Vec3(pts.x - p0.x[:, None], pts.y - p0.y[:, None], pts.z - p0.z[:, None])
    d0sq = d0.length_squared()
    i1 = pick_max(d0sq, taken)
    p1 = Vec3(g(pts.x, i1), g(pts.y, i1), g(pts.z, i1))
    taken = taken | (kk == i1[:, None])
    edge = p1 - p0
    cr = Vec3(
        edge.y[:, None] * d0.z - edge.z[:, None] * d0.y,
        edge.z[:, None] * d0.x - edge.x[:, None] * d0.z,
        edge.x[:, None] * d0.y - edge.y[:, None] * d0.x,
    )
    side = cr.x * n_local.x[:, None] + cr.y * n_local.y[:, None] + cr.z * n_local.z[:, None]
    i2 = pick_max(side, taken)
    taken = taken | (kk == i2[:, None])
    i3 = pick_max(-side, taken)

    sel = jnp.stack([i0, i1, i2, i3], -1)
    valid_sel = select_cols(cmask, sel)
    for a_i in range(1, 4):
        dup = jnp.zeros(N, bool)
        for b_i in range(a_i):
            dup = dup | (sel[:, a_i] == sel[:, b_i])
        valid_sel = valid_sel.at[:, a_i].set(valid_sel[:, a_i] & ~dup)

    c_pts = Vec3(
        select_cols(pts.x, sel),
        select_cols(pts.y, sel),
        select_cols(pts.z, sel),
    )
    c_depth = select_cols(jnp.where(cmask, depth_pts, 0.0), sel)
    c_feat = select_cols(cfeat, sel)

    # ---- Edge-edge: single contact at closest point between support edges.
    ei = (best_id - 6) // 3
    ej = (best_id - 6) % 3

    def pick_abs(vecs, k):
        return Vec3(
            jnp.where(k == 0, vecs[0].x, jnp.where(k == 1, vecs[1].x, vecs[2].x)),
            jnp.where(k == 0, vecs[0].y, jnp.where(k == 1, vecs[1].y, vecs[2].y)),
            jnp.where(k == 0, vecs[0].z, jnp.where(k == 1, vecs[1].z, vecs[2].z)),
        )

    a_dir = pick_abs(a_axes, ei)
    b_dir = pick_abs(b_axes, ej)
    to_b = -1.0 * n_local
    corner_a = Vec3(
        jnp.where(ei == 0, 0.0, jnp.sign(to_b.x) * ha.x),
        jnp.where(ei == 1, 0.0, jnp.sign(to_b.y) * ha.y),
        jnp.where(ei == 2, 0.0, jnp.sign(to_b.z) * ha.z),
    )
    to_a_b = Vec3(b_axes[0].dot(n_local), b_axes[1].dot(n_local), b_axes[2].dot(n_local))
    corner_b_local = Vec3(
        jnp.where(ej == 0, 0.0, jnp.sign(to_a_b.x) * hb.x),
        jnp.where(ej == 1, 0.0, jnp.sign(to_a_b.y) * hb.y),
        jnp.where(ej == 2, 0.0, jnp.sign(to_a_b.z) * hb.z),
    )
    corner_b = t + Vec3(
        rb.rx.x * corner_b_local.x + rb.ry.x * corner_b_local.y + rb.rz.x * corner_b_local.z,
        rb.rx.y * corner_b_local.x + rb.ry.y * corner_b_local.y + rb.rz.y * corner_b_local.z,
        rb.rx.z * corner_b_local.x + rb.ry.z * corner_b_local.y + rb.rz.z * corner_b_local.z,
    )
    w0 = corner_a - corner_b
    b_ = a_dir.dot(b_dir)
    d_ = a_dir.dot(w0)
    e_ = b_dir.dot(w0)
    den = 1.0 - b_ * b_
    s_par = jnp.where(jnp.abs(den) > 1e-9, (b_ * e_ - d_) / jnp.where(jnp.abs(den) > 1e-9, den, 1.0), 0.0)
    edge_pt = corner_a + a_dir * s_par

    fm = face_contact[:, None]
    z4 = jnp.zeros((N, 4), jnp.float32)
    out_pts = Vec3(
        jnp.where(fm, c_pts.x, z4.at[:, 0].set(edge_pt.x)),
        jnp.where(fm, c_pts.y, z4.at[:, 0].set(edge_pt.y)),
        jnp.where(fm, c_pts.z, z4.at[:, 0].set(edge_pt.z)),
    )
    out_depth = jnp.where(fm, c_depth, z4.at[:, 0].set(best_depth))
    out_feat = jnp.where(fm, c_feat, jnp.full((N, 4), 8192, jnp.int32) + best_id[:, None])
    out_mask = jnp.where(fm, valid_sel, jnp.zeros((N, 4), bool).at[:, 0].set(True))

    # Rotate back to world (contact offsets from A's center).
    ma = orn_a.to_matrix()
    world_pts = Vec3(
        ma.rx.x[:, None] * out_pts.x + ma.ry.x[:, None] * out_pts.y + ma.rz.x[:, None] * out_pts.z,
        ma.rx.y[:, None] * out_pts.x + ma.ry.y[:, None] * out_pts.y + ma.rz.y[:, None] * out_pts.z,
        ma.rx.z[:, None] * out_pts.x + ma.ry.z[:, None] * out_pts.y + ma.rz.z[:, None] * out_pts.z,
    )
    world_normal = orn_a.rotate(n_local)

    return Manifold(
        normal=world_normal,
        offset_a=world_pts,
        depth=out_depth,
        feature=out_feat,
        contact_mask=out_mask,
    )

# --------------------------------------------------------------------------------------
# Triangle-family analytic testers (reference capability:
# CollisionTasks/SphereTriangleTester.cs, CapsuleTriangleTester.cs, BoxTriangleTester.cs
# — own derivations; the mesh/terrain hot path that previously funneled through the
# generic GJK/MPR kernel). Triangles are always the B side (type id ordering), verts in
# B's local frame; one-sidedness/boundary smoothing is applied downstream by the
# compound/mesh narrow phase.


def _closest_on_triangle(p: Vec3, a: Vec3, b: Vec3, c: Vec3):
    """Closest point on triangle (a, b, c) to point p, fully masked (Ericson 5.1.5).
    Returns (point, region) with region ∈ {0:A, 1:B, 2:C, 3:AB, 4:AC, 5:BC, 6:face}."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = ab.dot(ap)
    d2 = ac.dot(ap)
    bp = p - b
    d3 = ab.dot(bp)
    d4 = ac.dot(bp)
    cp = p - c
    d5 = ab.dot(cp)
    d6 = ac.dot(cp)
    vc = d1 * d4 - d3 * d2
    vb = d5 * d2 - d1 * d6
    va = d3 * d6 - d5 * d4

    safe = lambda x: jnp.where(jnp.abs(x) > 1e-30, x, 1e-30)
    in_a = (d1 <= 0.0) & (d2 <= 0.0)
    in_b = (d3 >= 0.0) & (d4 <= d3)
    in_c = (d6 >= 0.0) & (d5 <= d6)
    on_ab = (vc <= 0.0) & (d1 >= 0.0) & (d3 <= 0.0)
    on_ac = (vb <= 0.0) & (d2 >= 0.0) & (d6 <= 0.0)
    on_bc = (va <= 0.0) & (d4 - d3 >= 0.0) & (d5 - d6 >= 0.0)

    t_ab = d1 / safe(d1 - d3)
    t_ac = d2 / safe(d2 - d6)
    t_bc = (d4 - d3) / safe((d4 - d3) + (d5 - d6))
    inv_face = 1.0 / safe(va + vb + vc)
    v_f = vb * inv_face
    w_f = vc * inv_face

    # Priority select (first hit wins; face is the fallback region).
    pt = a + ab * v_f + ac * w_f
    region = jnp.full(p.x.shape, 6, jnp.int32)

    def put(cond, point, rid, pt, region):
        return pt.where(~cond, point), jnp.where(cond, rid, region)

    pt, region = put(on_bc, b + (c - b) * t_bc, 5, pt, region)
    pt, region = put(on_ac, a + ac * t_ac, 4, pt, region)
    pt, region = put(on_ab, a + ab * t_ab, 3, pt, region)
    pt, region = put(in_c, c, 2, pt, region)
    pt, region = put(in_b, b, 1, pt, region)
    pt, region = put(in_a, a, 0, pt, region)
    return pt, region


def _tri_verts_local(params_b):
    return (
        Vec3(params_b[:, 0], params_b[:, 1], params_b[:, 2]),
        Vec3(params_b[:, 3], params_b[:, 4], params_b[:, 5]),
        Vec3(params_b[:, 6], params_b[:, 7], params_b[:, 8]),
    )


def sphere_triangle(pos_ab: Vec3, orn_b: Quat, params_a, params_b) -> Manifold:
    """Sphere A vs triangle B (reference capability:
    CollisionTasks/SphereTriangleTester.cs — own derivation). Closest point on the
    triangle to the sphere center; the normal is geometric (side-sensitive), so
    behind-the-face manifolds are back-facing and the downstream one-sided cull
    removes them (a sphere approaching a mesh from behind passes through)."""
    r = params_a[:, 0]
    va, vb, vc = _tri_verts_local(params_b)
    lc = orn_b.rotate_inverse(-1.0 * pos_ab)  # sphere center in B frame
    cp, region = _closest_on_triangle(lc, va, vb, vc)
    diff = lc - cp
    dist2 = diff.length_squared()
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-30))
    fn = (vb - va).cross(vc - va).normalize()  # winding (front) normal, B local
    n_local = (diff * (1.0 / dist)).where(dist2 > 1e-20, fn)
    depth = r - dist
    normal = orn_b.rotate(n_local)  # B→A
    contact = normal * -(r - 0.5 * depth)  # sphere surface toward triangle, rel A
    return _single_contact(contact, depth, normal, feature=0)._replace(
        feature=jnp.zeros((r.shape[0], 4), jnp.int32).at[:, 0].set(region)
    )


def _seg_seg_closest(pa: Vec3, da: Vec3, hla, pb: Vec3, db_u: Vec3, hlb):
    """Closest points between segments {pa + t·da, |t|≤hla} and {pb + s·db_u, |s|≤hlb}
    (da, db_u unit). Returns (t, s). Standard clamped quadratic with mutual
    re-projection (same scheme as capsule_capsule)."""
    r = pb - pa
    a_dot_b = da.dot(db_u)
    da_r = da.dot(r)
    db_r = db_u.dot(r)
    denom = 1.0 - a_dot_b * a_dot_b
    t = jnp.where(
        denom > 1e-7,
        jnp.clip((da_r - a_dot_b * db_r) / jnp.maximum(denom, 1e-7), -hla, hla),
        0.0,
    )
    s = jnp.clip(db_u.dot(pa + da * t - pb), -hlb, hlb)
    t = jnp.clip(da.dot(pb + db_u * s - pa), -hla, hla)
    return t, s


def capsule_triangle(pos_ab: Vec3, orn_a: Quat, orn_b: Quat, params_a, params_b) -> Manifold:
    """Capsule A vs triangle B (reference capability:
    CollisionTasks/CapsuleTriangleTester.cs — own derivation). Candidates: the prism
    clip of the capsule axis against the triangle's edge planes (face contact, signed
    depth — handles penetration), plus 3 edge-segment and 2 endpoint-vertex-region
    closest pairs. Near-parallel face contact emits 2 contacts at the clip interval
    ends with independent depths."""
    r, hl = params_a[:, 0], params_a[:, 1]
    N = r.shape[0]
    la, lb, lc_ = _tri_verts_local(params_b)
    v0 = pos_ab + orn_b.rotate(la)  # rel A center, world orientation
    v1 = pos_ab + orn_b.rotate(lb)
    v2 = pos_ab + orn_b.rotate(lc_)
    d = orn_a.rotate(Vec3.full((N,), 0.0, 1.0, 0.0))  # capsule axis (unit)

    fn = (v1 - v0).cross(v2 - v0)
    fn = fn.normalize()  # winding/front normal

    # ---- face candidate: clip the axis segment to the triangle's edge-plane prism.
    big = 3.0e38
    t_lo = jnp.full((N,), -big, jnp.float32)
    t_hi = jnp.full((N,), big, jnp.float32)
    for (ea, eb) in ((v0, v1), (v1, v2), (v2, v0)):
        en = fn.cross(eb - ea)  # inward edge-plane normal (perp to fn)
        c0 = en.dot(-1.0 * ea)  # plane value at segment center (origin = A center)
        slope = en.dot(d)
        # points with c0 + slope·t >= 0 are inside this plane.
        t_cross = -c0 / jnp.where(jnp.abs(slope) > 1e-12, slope, 1e-12)
        par = jnp.abs(slope) <= 1e-12
        lo_k = jnp.where(par, jnp.where(c0 >= 0, -big, big), jnp.where(slope > 0, t_cross, -big))
        hi_k = jnp.where(par, jnp.where(c0 >= 0, big, -big), jnp.where(slope > 0, big, t_cross))
        t_lo = jnp.maximum(t_lo, lo_k)
        t_hi = jnp.minimum(t_hi, hi_k)
    t_lo_c = jnp.clip(t_lo, -hl, hl)
    t_hi_c = jnp.clip(t_hi, -hl, hl)
    face_valid = (t_hi >= t_lo) & (t_hi_c >= t_lo_c)
    # Geometric face normal: the winding normal signed by the capsule center's side of
    # the plane — behind-the-face manifolds stay back-facing so the downstream
    # one-sided cull removes them (no front-face expulsion for behind approaches).
    plane_off = fn.dot(v0)
    fside = jnp.where(plane_off <= 0.0, 1.0, -1.0)  # center at origin: sign(−plane_off)
    nf = fn * fside
    # Signed separation above the (signed) face plane at the clip ends.
    sep_lo = nf.dot(d) * t_lo_c - nf.dot(v0)
    sep_hi = nf.dot(d) * t_hi_c - nf.dot(v0)
    # Deepest end defines the face candidate's depth.
    sep_face = jnp.minimum(sep_lo, sep_hi)
    depth_face = jnp.where(face_valid, r - sep_face, -big)

    # ---- edge / endpoint candidates (unsigned closest pairs).
    def edge_candidate(ea, eb):
        mid = (ea + eb) * 0.5
        ed = eb - ea
        el = ed.length()
        eu = ed * (1.0 / jnp.maximum(el, 1e-12))
        t, s = _seg_seg_closest(Vec3.zeros((N,)), d, hl, mid, eu, el * 0.5)
        pa_ = d * t
        pb_ = mid + eu * s
        dv = pa_ - pb_
        dist = dv.length()
        n_ = dv * (1.0 / jnp.maximum(dist, 1e-12))
        # Degenerate (axis intersects edge): push out along fn.
        n_ = n_.where(dist > 1e-9, fn)
        return r - dist, n_, pb_, t

    de0, ne0, pe0, te0 = edge_candidate(v0, v1)
    de1, ne1, pe1, te1 = edge_candidate(v1, v2)
    de2, ne2, pe2, te2 = edge_candidate(v2, v0)

    # Pick the best candidate: face if valid (it dominates when the axis overlaps the
    # prism), else the deepest edge pair.
    depth = de0
    n = ne0
    ppt = pe0
    tpar = te0
    fid = jnp.full((N,), 4, jnp.int32)

    def pick(dc, nc, pc, tc, idc, depth, n, ppt, tpar, fid):
        better = dc > depth
        return (
            jnp.where(better, dc, depth),
            nc.where(better, n),
            pc.where(better, ppt),
            jnp.where(better, tc, tpar),
            jnp.where(better, idc, fid),
        )

    depth, n, ppt, tpar, fid = pick(de1, ne1, pe1, te1, jnp.full((N,), 5, jnp.int32), depth, n, ppt, tpar, fid)
    depth, n, ppt, tpar, fid = pick(de2, ne2, pe2, te2, jnp.full((N,), 6, jnp.int32), depth, n, ppt, tpar, fid)
    use_face = face_valid & (depth_face >= depth)
    depth = jnp.where(use_face, depth_face, depth)
    n = nf.where(use_face, n)
    fid = jnp.where(use_face, 0, fid)
    t_deep = jnp.where(sep_lo <= sep_hi, t_lo_c, t_hi_c)
    tpar = jnp.where(use_face, t_deep, tpar)

    # ---- contacts. Two when the face contact is near-parallel (axis ⊥ n).
    axis_dot_n = d.dot(n)
    two = use_face & (jnp.abs(axis_dot_n) < 0.3) & (t_hi_c - t_lo_c > 1e-6 * jnp.maximum(hl, 1.0))
    dep0 = jnp.where(two, r - sep_lo, depth)
    dep1 = r - sep_hi
    t0 = jnp.where(two, t_lo_c, tpar)
    p0 = d * t0 + n * -(r - 0.5 * dep0)
    p1 = d * t_hi_c + n * -(r - 0.5 * dep1)

    z4 = jnp.zeros((N, 4), jnp.float32)
    return Manifold(
        normal=n,
        offset_a=Vec3(
            z4.at[:, 0].set(p0.x).at[:, 1].set(p1.x),
            z4.at[:, 0].set(p0.y).at[:, 1].set(p1.y),
            z4.at[:, 0].set(p0.z).at[:, 1].set(p1.z),
        ),
        depth=z4.at[:, 0].set(dep0).at[:, 1].set(dep1),
        feature=jnp.zeros((N, 4), jnp.int32).at[:, 0].set(jnp.where(two, 0, fid)).at[:, 1].set(1),
        contact_mask=jnp.zeros((N, 4), bool).at[:, 0].set(True).at[:, 1].set(two),
    )


def box_triangle(pos_ab: Vec3, orn_a: Quat, orn_b: Quat, params_a, params_b) -> Manifold:
    """Box A vs triangle B (reference capability: CollisionTasks/BoxTriangleTester.cs —
    own derivation). SAT over 3 box faces + triangle face + 9 edge crosses; face
    manifolds from masked candidates in the box contact face's 2D frame (triangle verts
    inside the rectangle, triangle edges × rectangle slabs, rectangle corners inside the
    triangle lifted onto the triangle plane), reduced to ≤4 by the deepest/extremal
    rule; edge winners emit the single closest-point contact."""
    N = params_a.shape[0]
    ha = Vec3(params_a[:, 0], params_a[:, 1], params_a[:, 2])
    # Triangle verts in the box (A) frame.
    q_ab = orn_a.conjugate().mul(orn_b)
    t_off = orn_a.rotate_inverse(pos_ab)
    la, lb, lc_ = _tri_verts_local(params_b)
    t0 = t_off + q_ab.rotate(la)
    t1 = t_off + q_ab.rotate(lb)
    t2 = t_off + q_ab.rotate(lc_)
    centroid = (t0 + t1 + t2) * (1.0 / 3.0)

    fn_raw = (t1 - t0).cross(t2 - t0)
    fn_len = fn_raw.length()
    fn = fn_raw * (1.0 / jnp.maximum(fn_len, 1e-12))  # winding normal, A frame

    ones = jnp.ones((N,), jnp.float32)
    zeros = jnp.zeros((N,), jnp.float32)
    a_axes = [Vec3(ones, zeros, zeros), Vec3(zeros, ones, zeros), Vec3(zeros, zeros, ones)]
    ha_arr = [ha.x, ha.y, ha.z]

    def tri_max(axis: Vec3):
        return jnp.maximum(axis.dot(t0), jnp.maximum(axis.dot(t1), axis.dot(t2)))

    def box_ext(axis: Vec3):
        return jnp.abs(axis.x) * ha.x + jnp.abs(axis.y) * ha.y + jnp.abs(axis.z) * ha.z

    big = jnp.full((N,), 3.0e38, jnp.float32)
    min_ext = jnp.minimum(jnp.minimum(ha.x, ha.y), ha.z)
    best_depth = big
    best_axis = Vec3.full((N,), 0.0, 1.0, 0.0)
    best_id = jnp.zeros((N,), jnp.int32)

    def consider(depth, axis, axis_id, best_depth, best_axis, best_id, bias=1.0):
        # Calibrate B→A: away from the triangle centroid (centroid is B-side in A frame).
        flip = axis.dot(centroid) > 0.0
        axis = axis.where(~flip, -1.0 * axis)
        penalty = (bias - 1.0) * (0.05 * min_ext + jnp.abs(depth))
        better = depth + penalty < best_depth
        return (
            jnp.where(better, depth, best_depth),
            axis.where(better, best_axis),
            jnp.where(better, axis_id, best_id),
        )

    # Triangle face first (id 0, preferred on ties: flat mesh ground stability —
    # downstream boundary smoothing assumes face-aligned normals).
    # depth along unit n (B→A) = max_B(n·p) − min_A(n·p) = max_k n·t_k + Σ|n_i|h_i.
    n_tri = fn.where(fn.dot(centroid) < 0.0, -1.0 * fn)
    depth_tri = tri_max(n_tri) + box_ext(n_tri)
    best_depth, best_axis, best_id = consider(depth_tri, n_tri, 0, best_depth, best_axis, best_id)
    FACE_BOX_BIAS = 1.0 + 1e-3
    EDGE_BIAS = 1.05
    for i in range(3):  # box face axes (ids 1-3)
        axis = a_axes[i]
        depth = tri_max(axis.where(axis.dot(centroid) <= 0, -1.0 * axis))
        # tri_max already uses the calibrated sign; add the box extent.
        depth = depth + ha_arr[i]
        best_depth, best_axis, best_id = consider(
            depth, axis, 1 + i, best_depth, best_axis, best_id, bias=FACE_BOX_BIAS
        )
    edges = [(t0, t1), (t1, t2), (t2, t0)]
    for i in range(3):  # edge crosses (ids 4-12)
        for j, (ea, eb) in enumerate(edges):
            raw = a_axes[i].cross(eb - ea)
            ln = raw.length()
            ok = ln > 1e-7
            axis = raw * jnp.where(ok, 1.0 / jnp.maximum(ln, 1e-7), 0.0)
            cal = axis.where(axis.dot(centroid) <= 0, -1.0 * axis)
            depth = jnp.where(ok, tri_max(cal) + box_ext(cal), big)
            best_depth, best_axis, best_id = consider(
                depth, cal, 4 + i * 3 + j, best_depth, best_axis, best_id, bias=EDGE_BIAS
            )

    n_local = best_axis  # B→A, A frame
    face_contact = best_id < 4

    # ---- face manifold in the box contact face's (u, v) frame. The contact face is the
    # box face most aligned with −n (outward normal toward the triangle).
    andot = jnp.stack([jnp.abs(n_local.x), jnp.abs(n_local.y), jnp.abs(n_local.z)], -1)
    rdim = jnp.argmax(andot, -1)

    def pick(vecs, k):
        return Vec3(
            jnp.where(k == 0, vecs[0].x, jnp.where(k == 1, vecs[1].x, vecs[2].x)),
            jnp.where(k == 0, vecs[0].y, jnp.where(k == 1, vecs[1].y, vecs[2].y)),
            jnp.where(k == 0, vecs[0].z, jnp.where(k == 1, vecs[1].z, vecs[2].z)),
        )

    def pick_h(k):
        return jnp.where(k == 0, ha.x, jnp.where(k == 1, ha.y, ha.z))

    u_ax = pick(a_axes, (rdim + 1) % 3)
    v_ax = pick(a_axes, (rdim + 2) % 3)
    h_u = pick_h((rdim + 1) % 3)
    h_v = pick_h((rdim + 2) % 3)

    tri_pts = [t0, t1, t2]
    vu = [u_ax.dot(p) for p in tri_pts]
    vv = [v_ax.dot(p) for p in tri_pts]

    eps = 1e-6
    cand_pts = []
    cand_mask = []
    cand_feat = []
    # (a) triangle verts inside the rectangle.
    for m in range(3):
        inside = (jnp.abs(vu[m]) <= h_u + eps) & (jnp.abs(vv[m]) <= h_v + eps)
        cand_pts.append(tri_pts[m])
        cand_mask.append(inside)
        cand_feat.append(jnp.full((N,), m, jnp.int32))
    # (b) triangle edge × rectangle slab intersections (3 × 4).
    for m in range(3):
        p0 = tri_pts[m]
        p1 = tri_pts[(m + 1) % 3]
        u0, u1 = vu[m], vu[(m + 1) % 3]
        v0_, v1_ = vv[m], vv[(m + 1) % 3]
        for p_idx in range(4):
            if p_idx == 0:
                c0, c1, lim, o0, o1, olim = u0, u1, h_u, v0_, v1_, h_v
            elif p_idx == 1:
                c0, c1, lim, o0, o1, olim = u0, u1, -h_u, v0_, v1_, h_v
            elif p_idx == 2:
                c0, c1, lim, o0, o1, olim = v0_, v1_, h_v, u0, u1, h_u
            else:
                c0, c1, lim, o0, o1, olim = v0_, v1_, -h_v, u0, u1, h_u
            denom = c1 - c0
            frac = (lim - c0) / jnp.where(jnp.abs(denom) > 1e-9, denom, 1e-9)
            valid = (jnp.abs(denom) > 1e-9) & (frac >= 0.0) & (frac <= 1.0)
            other = o0 + (o1 - o0) * frac
            valid = valid & (jnp.abs(other) <= olim + eps)
            cand_pts.append(p0 + (p1 - p0) * frac)
            cand_mask.append(valid)
            cand_feat.append(jnp.full((N,), 8 + m * 4 + p_idx, jnp.int32))
    # (c) rectangle corners inside the triangle (2D), lifted onto the triangle plane.
    n_dim = pick(a_axes, rdim)
    plane_d = fn.dot(t0)
    denom_w = fn.dot(n_dim)
    # 2D winding of the triangle in (u, v).
    area2 = (vu[1] - vu[0]) * (vv[2] - vv[0]) - (vu[2] - vu[0]) * (vv[1] - vv[0])
    winding = jnp.sign(jnp.where(area2 == 0, 1.0, area2))
    for ci, (su, sv) in enumerate([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)]):
        cu = su * h_u
        cv = sv * h_v
        inside = jnp.ones((N,), bool)
        for m in range(3):
            eu = vu[(m + 1) % 3] - vu[m]
            ev = vv[(m + 1) % 3] - vv[m]
            cross = eu * (cv - vv[m]) - ev * (cu - vu[m])
            inside = inside & (cross * winding >= -eps)
        base = u_ax * cu + v_ax * cv
        w = (plane_d - fn.dot(base)) / jnp.where(jnp.abs(denom_w) > 1e-9, denom_w, 1e-9)
        cand_pts.append(base + n_dim * w)
        cand_mask.append(inside & (jnp.abs(denom_w) > 1e-9))
        cand_feat.append(jnp.full((N,), 24 + ci, jnp.int32))

    pts = Vec3(
        jnp.stack([p.x for p in cand_pts], -1),
        jnp.stack([p.y for p in cand_pts], -1),
        jnp.stack([p.z for p in cand_pts], -1),
    )
    cmask = jnp.stack(cand_mask, -1)
    cfeat = jnp.stack(cand_feat, -1)

    # Depth per candidate (candidates lie on the triangle): depth = Σ|n_i|h_i + n·p.
    s_a = box_ext(n_local)
    np_dot = (
        n_local.x[:, None] * pts.x + n_local.y[:, None] * pts.y + n_local.z[:, None] * pts.z
    )
    depth_pts = s_a[:, None] + np_dot
    neg_big = -3.0e38
    depth_masked = jnp.where(cmask, depth_pts, neg_big)

    K = depth_masked.shape[1]
    kk = jnp.arange(K)[None, :]

    def pick_max(scores, taken):
        return jnp.argmax(jnp.where(taken, neg_big, scores), -1)

    g = lambda arr, i: select_col(arr, i)
    taken = ~cmask
    i0 = pick_max(depth_masked, taken)
    p0 = Vec3(g(pts.x, i0), g(pts.y, i0), g(pts.z, i0))
    taken = taken | (kk == i0[:, None])
    d0 = Vec3(pts.x - p0.x[:, None], pts.y - p0.y[:, None], pts.z - p0.z[:, None])
    i1 = pick_max(d0.length_squared(), taken)
    p1 = Vec3(g(pts.x, i1), g(pts.y, i1), g(pts.z, i1))
    taken = taken | (kk == i1[:, None])
    edge_v = p1 - p0
    cr = Vec3(
        edge_v.y[:, None] * d0.z - edge_v.z[:, None] * d0.y,
        edge_v.z[:, None] * d0.x - edge_v.x[:, None] * d0.z,
        edge_v.x[:, None] * d0.y - edge_v.y[:, None] * d0.x,
    )
    side = cr.x * n_local.x[:, None] + cr.y * n_local.y[:, None] + cr.z * n_local.z[:, None]
    i2 = pick_max(side, taken)
    taken = taken | (kk == i2[:, None])
    i3 = pick_max(-side, taken)

    sel = jnp.stack([i0, i1, i2, i3], -1)
    valid_sel = select_cols(cmask, sel)
    for a_i in range(1, 4):
        dup = jnp.zeros(N, bool)
        for b_i in range(a_i):
            dup = dup | (sel[:, a_i] == sel[:, b_i])
        valid_sel = valid_sel.at[:, a_i].set(valid_sel[:, a_i] & ~dup)

    c_pts = Vec3(select_cols(pts.x, sel), select_cols(pts.y, sel), select_cols(pts.z, sel))
    c_depth = select_cols(jnp.where(cmask, depth_pts, 0.0), sel)
    c_feat = select_cols(cfeat, sel)

    # ---- edge-edge winner: single closest-point contact.
    ei = (best_id - 4) // 3
    ej = (best_id - 4) % 3
    a_dir = pick(a_axes, jnp.maximum(ei, 0))
    to_b = -1.0 * n_local
    corner_a = Vec3(
        jnp.where(ei == 0, 0.0, jnp.sign(to_b.x) * ha.x),
        jnp.where(ei == 1, 0.0, jnp.sign(to_b.y) * ha.y),
        jnp.where(ei == 2, 0.0, jnp.sign(to_b.z) * ha.z),
    )
    e_sel = jnp.clip(ej, 0, 2)
    ea = Vec3(
        jnp.where(e_sel == 0, t0.x, jnp.where(e_sel == 1, t1.x, t2.x)),
        jnp.where(e_sel == 0, t0.y, jnp.where(e_sel == 1, t1.y, t2.y)),
        jnp.where(e_sel == 0, t0.z, jnp.where(e_sel == 1, t1.z, t2.z)),
    )
    eb = Vec3(
        jnp.where(e_sel == 0, t1.x, jnp.where(e_sel == 1, t2.x, t0.x)),
        jnp.where(e_sel == 0, t1.y, jnp.where(e_sel == 1, t2.y, t0.y)),
        jnp.where(e_sel == 0, t1.z, jnp.where(e_sel == 1, t2.z, t0.z)),
    )
    emid = (ea + eb) * 0.5
    ed = eb - ea
    el = ed.length()
    eu_ = ed * (1.0 / jnp.maximum(el, 1e-12))
    # Box edge has length 2·h[ei]; clamp via the shared segment-segment helper.
    h_edge = jnp.where(ei == 0, ha.x, jnp.where(ei == 1, ha.y, ha.z))
    t_par, s_par = _seg_seg_closest(corner_a, a_dir, h_edge, emid, eu_, el * 0.5)
    edge_pt = corner_a + a_dir * t_par

    fm = face_contact[:, None]
    z4 = jnp.zeros((N, 4), jnp.float32)
    out_pts = Vec3(
        jnp.where(fm, c_pts.x, z4.at[:, 0].set(edge_pt.x)),
        jnp.where(fm, c_pts.y, z4.at[:, 0].set(edge_pt.y)),
        jnp.where(fm, c_pts.z, z4.at[:, 0].set(edge_pt.z)),
    )
    out_depth = jnp.where(fm, c_depth, z4.at[:, 0].set(best_depth))
    out_feat = jnp.where(fm, c_feat, jnp.full((N, 4), 64, jnp.int32) + best_id[:, None])
    out_mask = jnp.where(fm, valid_sel, jnp.zeros((N, 4), bool).at[:, 0].set(True))

    ma = orn_a.to_matrix()
    world_pts = Vec3(
        ma.rx.x[:, None] * out_pts.x + ma.ry.x[:, None] * out_pts.y + ma.rz.x[:, None] * out_pts.z,
        ma.rx.y[:, None] * out_pts.x + ma.ry.y[:, None] * out_pts.y + ma.rz.y[:, None] * out_pts.z,
        ma.rx.z[:, None] * out_pts.x + ma.ry.z[:, None] * out_pts.y + ma.rz.z[:, None] * out_pts.z,
    )
    world_normal = orn_a.rotate(n_local)
    return Manifold(
        normal=world_normal,
        offset_a=world_pts,
        depth=out_depth,
        feature=out_feat,
        contact_mask=out_mask,
    )
