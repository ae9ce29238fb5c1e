"""Vectorized AABB computation for all collidables, with speculative velocity expansion.

The reference batches bounding-box prediction per shape type through ``BoundingBoxBatcher``
(reference: BepuPhysics/Collidables/BoundingBoxBatcher.cs, PoseIntegrator.cs:424). Here all
bodies are processed in one masked pass: every shape type's bounds are computed for every
body and selected by type mask — branch-free, fully vectorized, XLA-fusable. With ≤5 cheap
formulas this costs less than a gather-heavy per-type regroup would.

Bounds are expanded by per-step velocity displacement (linear directional + angular worst
case) as in the reference's speculative AABB prediction, so the broad phase sees where the
body *will* be during the step.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.vec import Vec3
from .registry import BOX, CAPSULE, CYLINDER, SPHERE, TRIANGLE, ShapeData


def compute_shape_bounds(shape_type, params, max_radius, orn):
    """Local AABB half-extents (center at body position) for each body.

    Args:
      shape_type: (N,) int32 per-body shape type id.
      params: (N, N_PARAMS) gathered shape params per body.
      max_radius: (N,) bounding-sphere radius per body.
      orn: Quat per body.
    Returns:
      (extent: Vec3, center_offset: Vec3) — AABB = pos + center_offset ± extent.
    """
    m = orn.to_matrix()  # rows = world images of local axes
    zero = jnp.zeros_like(params[:, 0])

    # Sphere: radius in every direction.
    r = params[:, 0]
    sphere_ext = Vec3(r, r, r)

    # Capsule: segment along local Y, endpoints ±half_length * ry, plus radius.
    hl = params[:, 1]
    seg = Vec3(jnp.abs(m.ry.x), jnp.abs(m.ry.y), jnp.abs(m.ry.z)) * hl
    capsule_ext = Vec3(seg.x + r, seg.y + r, seg.z + r)

    # Box: sum over local axes of |axis image| * half extent.
    hx, hy, hz = params[:, 0], params[:, 1], params[:, 2]
    box_ext = Vec3(
        jnp.abs(m.rx.x) * hx + jnp.abs(m.ry.x) * hy + jnp.abs(m.rz.x) * hz,
        jnp.abs(m.rx.y) * hx + jnp.abs(m.ry.y) * hy + jnp.abs(m.rz.y) * hz,
        jnp.abs(m.rx.z) * hx + jnp.abs(m.ry.z) * hy + jnp.abs(m.rz.z) * hz,
    )

    # Cylinder: half_length along |ry| plus disc radius along sqrt(1 - ry_i^2) per axis.
    disc = Vec3(
        jnp.sqrt(jnp.maximum(0.0, 1.0 - m.ry.x * m.ry.x)),
        jnp.sqrt(jnp.maximum(0.0, 1.0 - m.ry.y * m.ry.y)),
        jnp.sqrt(jnp.maximum(0.0, 1.0 - m.ry.z * m.ry.z)),
    )
    cyl_ext = Vec3(
        jnp.abs(m.ry.x) * hl + disc.x * r,
        jnp.abs(m.ry.y) * hl + disc.y * r,
        jnp.abs(m.ry.z) * hl + disc.z * r,
    )

    # Triangle: min/max over the three rotated vertices (offset AABB, not centered).
    va = orn.rotate(Vec3(params[:, 0], params[:, 1], params[:, 2]))
    vb = orn.rotate(Vec3(params[:, 3], params[:, 4], params[:, 5]))
    vc = orn.rotate(Vec3(params[:, 6], params[:, 7], params[:, 8]))
    tri_min = va.min(vb).min(vc)
    tri_max = va.max(vb).max(vc)
    tri_center = (tri_min + tri_max) * 0.5
    tri_ext = (tri_max - tri_min) * 0.5

    # Fallback for hull/compound/mesh until their pools land: bounding sphere.
    fallback_ext = Vec3(max_radius, max_radius, max_radius)

    ext = fallback_ext
    ext = box_ext.where(shape_type == BOX, ext)
    ext = sphere_ext.where(shape_type == SPHERE, ext)
    ext = capsule_ext.where(shape_type == CAPSULE, ext)
    ext = cyl_ext.where(shape_type == CYLINDER, ext)
    ext = tri_ext.where(shape_type == TRIANGLE, ext)
    center = tri_center.where(shape_type == TRIANGLE, Vec3(zero, zero, zero))
    return ext, center


def compute_body_bounds(pos, orn, vel, omega, shape_id, shapes: ShapeData, dt,
                        spec_min=None):
    """Speculative (velocity-expanded) world AABBs for all bodies.

    Returns (aabb_min: Vec3, aabb_max: Vec3) of shape (N,).
    reference: PoseIntegrator.PredictBoundingBoxes (PoseIntegrator.cs:424) +
    BoundingBoxHelpers.ExpandBoundingBoxes.

    ``spec_min``: per-body minimum speculative margin (reference
    Collidable.MinimumSpeculativeMargin, Collidables/Collidable.cs:131). Each AABB
    expands by half its body's minimum so any pair within the resting speculative band
    (narrow-phase floor = (min_a+min_b)/2) overlaps in the broad phase. None = no
    margin expansion (legacy behavior).
    """
    shape_id_c = jnp.maximum(shape_id, 0)
    stype = shapes.type[shape_id_c]
    stype = jnp.where(shape_id >= 0, stype, -1)
    params = shapes.params[shape_id_c]
    max_radius = shapes.max_radius[shape_id_c]

    ext, center = compute_shape_bounds(stype, params, max_radius, orn)
    lo = pos + center - ext
    hi = pos + center + ext

    # Angular worst case: a point at max radius moves at most |w|*dt*r (chord upper
    # bound). Two exact tightenings that keep spinning bodies out of the broad phase's
    # 'large' set: spheres are rotation-invariant (zero expansion), and NO rotation can
    # carry the shape outside its bounding sphere — clamp the expanded box to
    # pos ± max_radius (the reference's BoundingBoxHelpers uses the same
    # min(angular expansion, maximumRadius) style bound).
    ang = jnp.where(
        stype == SPHERE, 0.0, jnp.minimum(omega.length() * dt, jnp.pi) * max_radius
    )
    ang_v = Vec3(ang, ang, ang)
    r_v = Vec3(max_radius, max_radius, max_radius)
    lo = (lo - ang_v).max(pos - r_v)
    hi = (hi + ang_v).min(pos + r_v)

    # Linear sweep: expand toward the displacement direction.
    disp = vel * dt
    lo = lo + disp.min(Vec3.zeros(disp.x.shape))
    hi = hi + disp.max(Vec3.zeros(disp.x.shape))

    if spec_min is not None:
        m = 0.5 * spec_min
        mv = Vec3(m, m, m)
        lo = lo - mv
        hi = hi + mv
    return lo, hi
