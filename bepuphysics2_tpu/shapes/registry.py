"""Shape registry: fixed-capacity packed shape parameter arrays.

The reference stores shapes in per-type ``ShapeBatch``es managed by a ``Shapes`` registry
(reference: BepuPhysics/Collidables/Shapes.cs:402, type ids Sphere=0 … Mesh=8 in each
``Collidables/*.cs``). On TPU, shape data must live in fixed-shape device arrays so a
collidable's shape is a (type, row) pair resolved by gather inside kernels. The registry is
a *host-side* builder (shape add/remove happens between steps, like all topology mutation);
its ``device()`` snapshot is a small pytree the jitted step closes over.

Packed parameter layout (``params`` row, float32 × 12):
- SPHERE   (id 0): [radius]
- CAPSULE  (id 1): [radius, half_length]           (axis = local Y, as in the reference)
- BOX      (id 2): [half_width, half_height, half_length]
- TRIANGLE (id 3): [ax, ay, az, bx, by, bz, cx, cy, cz]
- CYLINDER (id 4): [radius, half_length]           (axis = local Y)
- CONVEX_HULL (5), COMPOUND (6), BIG_COMPOUND (7), MESH (8): indices into auxiliary pools
  (points/children/triangles), introduced by later build phases.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..utils.vec import Sym3

SHAPE_NONE = -1
SPHERE = 0
CAPSULE = 1
BOX = 2
TRIANGLE = 3
CYLINDER = 4
CONVEX_HULL = 5
COMPOUND = 6
BIG_COMPOUND = 7
MESH = 8

N_PARAMS = 12


@dataclasses.dataclass(frozen=True)
class Sphere:
    radius: float

    def pack(self):
        return SPHERE, [self.radius]

    def compute_inertia(self, mass: float):
        """reference: Collidables/Sphere.cs:95."""
        inv_mass = 1.0 / mass
        inv_i = inv_mass / (0.4 * self.radius * self.radius)
        return inv_mass, (inv_i, inv_i, inv_i)

    def maximum_radius(self):
        return self.radius


@dataclasses.dataclass(frozen=True)
class Capsule:
    radius: float
    half_length: float

    def pack(self):
        return CAPSULE, [self.radius, self.half_length]

    def compute_inertia(self, mass: float):
        """reference: Collidables/Capsule.cs:159 (cylinder + sphere-caps volume blend)."""
        inv_mass = 1.0 / mass
        r2 = self.radius * self.radius
        h2 = self.half_length * self.half_length
        cyl_vol = 2 * self.half_length * r2 * np.pi
        sph_vol = (4.0 / 3.0) * r2 * self.radius * np.pi
        inv_total = 1.0 / (cyl_vol + sph_vol)
        cyl_vol *= inv_total
        sph_vol *= inv_total
        ixx = inv_mass / (
            cyl_vol * ((3.0 / 12.0) * r2 + (4.0 / 12.0) * h2)
            + sph_vol * ((2.0 / 5.0) * r2 + (6.0 / 8.0) * self.radius * self.half_length + h2)
        )
        iyy = inv_mass / (cyl_vol * 0.5 * r2 + sph_vol * (2.0 / 5.0) * r2)
        return inv_mass, (ixx, iyy, ixx)

    def maximum_radius(self):
        return self.radius + self.half_length


@dataclasses.dataclass(frozen=True)
class Box:
    half_width: float
    half_height: float
    half_length: float

    @staticmethod
    def from_dimensions(width, height, length) -> "Box":
        return Box(width * 0.5, height * 0.5, length * 0.5)

    def pack(self):
        return BOX, [self.half_width, self.half_height, self.half_length]

    def compute_inertia(self, mass: float):
        """reference: Collidables/Box.cs:149."""
        inv_mass = 1.0 / mass
        x2 = self.half_width**2
        y2 = self.half_height**2
        z2 = self.half_length**2
        return inv_mass, (
            inv_mass * 3 / (y2 + z2),
            inv_mass * 3 / (x2 + z2),
            inv_mass * 3 / (x2 + y2),
        )

    def maximum_radius(self):
        return float(np.sqrt(self.half_width**2 + self.half_height**2 + self.half_length**2))


@dataclasses.dataclass(frozen=True)
class Cylinder:
    radius: float
    half_length: float

    def pack(self):
        return CYLINDER, [self.radius, self.half_length]

    def compute_inertia(self, mass: float):
        """reference: Collidables/Cylinder.cs:166."""
        inv_mass = 1.0 / mass
        diag = inv_mass / ((4 * 0.0833333333) * self.half_length**2 + 0.25 * self.radius**2)
        return inv_mass, (diag, 2.0 * inv_mass / (self.radius**2), diag)

    def maximum_radius(self):
        return float(np.sqrt(self.radius**2 + self.half_length**2))


@dataclasses.dataclass(frozen=True)
class Triangle:
    a: tuple
    b: tuple
    c: tuple

    def pack(self):
        return TRIANGLE, [*self.a, *self.b, *self.c]

    def compute_inertia(self, mass: float):
        """Uniform thin-lamina triangle inertia about the shape-local origin
        (reference Triangle.ComputeInertia → MeshInertiaHelper.ComputeTriangleContribution,
        Collidables/Triangle.cs:112, MeshInertiaHelper.cs). Second moment of a uniform
        triangle lamina: C = (A/12)·(Σᵢ vᵢvᵢᵀ + s sᵀ), s = Σᵢ vᵢ; I = σ(tr C·𝟙 − C)."""
        verts = np.asarray([self.a, self.b, self.c], np.float64)
        area = 0.5 * np.linalg.norm(np.cross(verts[1] - verts[0], verts[2] - verts[0]))
        s = verts.sum(axis=0)
        c2 = (verts[:, :, None] * verts[:, None, :]).sum(axis=0) + np.outer(s, s)
        c2 *= area / 12.0
        inertia = (mass / max(area, 1e-30)) * (np.trace(c2) * np.eye(3) - c2)
        inv = np.linalg.inv(inertia)
        inv_mass = 1.0 / mass
        return inv_mass, (inv[0, 0], inv[1, 1], inv[2, 2]), inv

    def maximum_radius(self):
        return float(max(np.linalg.norm(self.a), np.linalg.norm(self.b), np.linalg.norm(self.c)))


@dataclasses.dataclass(frozen=True)
class ConvexHull:
    """Convex hull of a point cloud. Host-side construction runs qhull (the analogue of
    the reference's quickhull builder, Collidables/ConvexHullHelper.cs:87) and recenters
    the vertices on the volume centroid; the device keeps only the hull vertices in the
    shared point pool (support-mapping collision needs vertices only)."""

    points: tuple  # hull vertices (recentered), as a tuple of (x, y, z) tuples
    center_offset: tuple = (0.0, 0.0, 0.0)  # original-space centroid (for user reference)

    @staticmethod
    def from_points(points) -> "ConvexHull":
        """Native C++ quickhull (bepuphysics2_tpu/native — the engine's own builder,
        reference ConvexHullHelper.ComputeHull, Collidables/ConvexHullHelper.cs:87);
        scipy qhull fallback when no toolchain is available."""
        from .. import native

        pts = np.asarray(points, np.float64)
        res = native.quickhull(pts)
        if res is not None:
            vert_ids, _tris, centroid, _volume = res
            verts = pts[vert_ids] - centroid
            return ConvexHull(tuple(map(tuple, verts.tolist())), tuple(centroid.tolist()))

        from scipy.spatial import ConvexHull as QHull

        hull = QHull(pts)
        verts = pts[hull.vertices]
        # Volume centroid via signed tetrahedra against the hull triangulation. qhull
        # simplices carry no consistent winding — orient each against its outward
        # facet normal (hull.equations) first.
        total_v = 0.0
        centroid = np.zeros(3)
        for simplex, eq in zip(hull.simplices, hull.equations):
            a, b, c = pts[simplex]
            if np.dot(np.cross(b - a, c - a), eq[:3]) < 0:
                b, c = c, b
            v = np.dot(a, np.cross(b, c)) / 6.0
            total_v += v
            centroid += v * (a + b + c) / 4.0
        centroid = centroid / total_v if abs(total_v) > 1e-12 else verts.mean(0)
        verts = verts - centroid
        return ConvexHull(tuple(map(tuple, verts.tolist())), tuple(centroid.tolist()))

    def pack(self):
        return CONVEX_HULL, []

    def compute_inertia(self, mass: float):
        """Hull inertia via tetrahedron decomposition against the centroid (reference
        MeshInertiaHelper / ConvexHull.ComputeInertia semantics). Native C++ path with
        scipy fallback (matched to 1e-6 relative by tests)."""
        from .. import native

        pts_np = np.asarray(self.points, np.float64)
        res = native.quickhull(pts_np)
        if res is not None:
            _vert_ids, tris, _centroid, _volume = res
            # About the origin, exactly like the fallback below (hull points are
            # volume-centroid-recentered by from_points already).
            out = native.hull_inertia(pts_np, tris, mass)
            if out is not None:
                inv6, inv_mass = out
                inv = np.array(
                    [[inv6[0], inv6[1], inv6[3]],
                     [inv6[1], inv6[2], inv6[4]],
                     [inv6[3], inv6[4], inv6[5]]]
                )
                return inv_mass, (inv[0, 0], inv[1, 1], inv[2, 2]), inv

        from scipy.spatial import ConvexHull as QHull

        pts = np.asarray(self.points, np.float64)
        hull = QHull(pts)
        covariance = np.zeros((3, 3))
        total_v = 0.0
        # Canonical tetrahedron covariance (unit tet at origin).
        canonical = np.array(
            [[1 / 60.0, 1 / 120.0, 1 / 120.0],
             [1 / 120.0, 1 / 60.0, 1 / 120.0],
             [1 / 120.0, 1 / 120.0, 1 / 60.0]]
        )
        for simplex, eq in zip(hull.simplices, hull.equations):
            a, b, c = pts[simplex]
            if np.dot(np.cross(b - a, c - a), eq[:3]) < 0:
                b, c = c, b
            m = np.stack([a, b, c])
            det = np.dot(a, np.cross(b, c))
            covariance += det * (m.T @ canonical @ m)
            total_v += det / 6.0
        if abs(total_v) < 1e-12:
            raise ValueError("degenerate hull: zero volume")
        density = mass / abs(total_v)
        covariance *= density
        trace = np.trace(covariance)
        inertia = np.eye(3) * trace - covariance
        inv = np.linalg.inv(inertia)
        inv_mass = 1.0 / mass
        return inv_mass, (inv[0, 0], inv[1, 1], inv[2, 2]), inv

    def maximum_radius(self):
        return float(np.linalg.norm(np.asarray(self.points), axis=1).max())


@dataclasses.dataclass(frozen=True)
class Compound:
    """A rigid collection of posed convex children (reference Collidables/Compound.cs:
    children as (shape, local pose) pairs; BigCompound.cs adds an internal BVH, which the
    TPU build replaces with Morton-ordered bounding-sphere clusters tested per pair —
    see ShapeData.cl_*). ``children`` is a tuple of
    (shape_id, local_position(3), local_orientation(4))."""

    children: tuple

    @staticmethod
    def build(children) -> "Compound":
        norm = []
        for c in children:
            shape_id, pos = c[0], tuple(c[1])
            orn = tuple(c[2]) if len(c) > 2 else (0.0, 0.0, 0.0, 1.0)
            norm.append((int(shape_id), pos, orn))
        return Compound(tuple(norm))

    def pack(self):
        return COMPOUND, []

    def maximum_radius(self):
        # Registry recomputes with child radii; placeholder uses child offsets only.
        return max((np.linalg.norm(c[1]) for c in self.children), default=0.0)


@dataclasses.dataclass(frozen=True)
class Mesh:
    """Triangle soup collidable (reference Collidables/Mesh.cs:36 — triangles + embedded
    Tree + scale). The TPU build stores triangles Morton-ordered in the shared child pool
    and groups them into bounding-sphere clusters (ShapeData.cl_*) — the embedded-BVH
    replacement: per-pair narrow phase tests cluster spheres first, then only the
    children of overlapping clusters (collision/compound.py _select_children_clustered)."""

    triangles: tuple  # tuple of ((ax,ay,az),(bx,by,bz),(cx,cy,cz))
    scale: tuple = (1.0, 1.0, 1.0)

    @staticmethod
    def build(triangles, scale=(1.0, 1.0, 1.0)) -> "Mesh":
        s = np.asarray(scale, np.float64)
        tris = tuple(
            tuple(tuple((np.asarray(v, np.float64) * s).tolist()) for v in t) for t in triangles
        )
        return Mesh(tris, tuple(np.asarray(scale).tolist()))

    def pack(self):
        return MESH, []

    def compute_inertia(self, mass: float):
        """Closed-mesh inertia about the volume centroid (reference
        MeshInertiaHelper.ComputeClosedInertia, Collidables/MeshInertiaHelper.cs:160):
        signed-tetrahedron decomposition against the local origin, recentered to the
        center of mass with the parallel-axis offset (GetInertiaOffset,
        MeshInertiaHelper.cs:344). Valid for CLOSED, consistently-wound meshes; a
        dynamic concave mesh now tumbles with its true mass distribution instead of a
        hull proxy. Use ``compute_inertia_with_center`` when the mesh is not modeled
        with its center of mass at the local origin."""
        inv_mass, inv, _center = self.compute_inertia_with_center(mass)
        return inv_mass, (inv[0, 0], inv[1, 1], inv[2, 2]), inv

    def compute_inertia_with_center(self, mass: float):
        """Returns (inv_mass, inverse inertia 3x3 about the center of mass, center)."""
        volume, inertia_origin, center = mesh_closed_second_moment(self.triangles, mass)
        # Parallel-axis recentering: I_com = I_origin − m·((c·c)𝟙 − c cᵀ).
        inertia = inertia_origin - mass * (
            np.dot(center, center) * np.eye(3) - np.outer(center, center)
        )
        return 1.0 / mass, np.linalg.inv(inertia), center

    def maximum_radius(self):
        return float(
            max(
                (np.linalg.norm(v) for t in self.triangles for v in t),
                default=0.0,
            )
        )


def mesh_closed_second_moment(triangles, mass: float):
    """Signed-tetra integration over a closed triangle list (reference
    MeshInertiaHelper.ComputeClosedInertia/ComputeTetrahedronContribution,
    Collidables/MeshInertiaHelper.cs:122,160): each triangle forms a tetrahedron with
    the origin; signed volumes make the sum exact for any closed, consistently-wound
    surface regardless of where the origin lies. Second moment of a tetra (0,a,b,c):
    C = (V/20)·(Σᵢ vᵢvᵢᵀ + s sᵀ), s = a+b+c (v₀ = 0 contributes nothing).

    Returns (volume, inertia about the origin for total ``mass``, center of mass)."""
    tris = np.asarray(triangles, np.float64)  # (T, 3, 3)
    if tris.size == 0:
        raise ValueError("mesh has no triangles")
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    vols = np.einsum("ij,ij->i", a, np.cross(b, c)) / 6.0  # (T,) signed
    volume = float(vols.sum())
    if abs(volume) < 1e-30:
        raise ValueError("mesh encloses no volume (open or degenerate)")
    s = a + b + c
    vvt = (
        np.einsum("ti,tj->tij", a, a)
        + np.einsum("ti,tj->tij", b, b)
        + np.einsum("ti,tj->tij", c, c)
        + np.einsum("ti,tj->tij", s, s)
    )
    c2 = np.einsum("t,tij->ij", vols / 20.0, vvt)
    density = mass / volume
    inertia = density * (np.trace(c2) * np.eye(3) - c2)
    center = np.einsum("t,ti->i", vols, s / 4.0) / volume
    return volume, inertia, center


def mesh_open_inertia(triangles, mass: float):
    """Surface-lamina inertia for OPEN meshes about the origin (reference
    MeshInertiaHelper.ComputeOpenInertia, MeshInertiaHelper.cs:280): area-weighted sum
    of thin-triangle second moments. Returns (inverse inertia 3x3, center of area)."""
    tris = np.asarray(triangles, np.float64)
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
    areas = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=1)
    total = float(areas.sum())
    if total < 1e-30:
        raise ValueError("mesh has no area")
    s = a + b + c
    vvt = (
        np.einsum("ti,tj->tij", a, a)
        + np.einsum("ti,tj->tij", b, b)
        + np.einsum("ti,tj->tij", c, c)
        + np.einsum("ti,tj->tij", s, s)
    )
    c2 = np.einsum("t,tij->ij", areas / 12.0, vvt)
    inertia = (mass / total) * (np.trace(c2) * np.eye(3) - c2)
    center = np.einsum("t,ti->i", areas, s / 3.0) / total
    return np.linalg.inv(inertia), center


class ShapeData(NamedTuple):
    """Device snapshot of the registry (closed over by the jitted step)."""

    type: jnp.ndarray  # (MS,) int32, SHAPE_NONE for empty rows
    params: jnp.ndarray  # (MS, N_PARAMS) float32
    max_radius: jnp.ndarray  # (MS,) float32 — bounding sphere radius, for angular AABB expansion
    hull_x: jnp.ndarray  # (HULL_POOL,) flat hull vertex pool
    hull_y: jnp.ndarray
    hull_z: jnp.ndarray
    hull_start: jnp.ndarray  # (MS,) int32 — row's slice into the pool
    hull_count: jnp.ndarray  # (MS,) int32
    # Compound/mesh child pool: per child a shape row reference + local pose. Mesh
    # triangles are children whose shape row is -1 and whose geometry lives in tri_*.
    child_shape: jnp.ndarray  # (CHILD_POOL,) int32 shape row, or -1 for mesh triangle
    child_pos: jnp.ndarray  # (CHILD_POOL, 3) local position
    child_orn: jnp.ndarray  # (CHILD_POOL, 4) local orientation
    child_tri: jnp.ndarray  # (CHILD_POOL, 9) triangle vertices for mesh children
    child_start: jnp.ndarray  # (MS,) int32
    child_count: jnp.ndarray  # (MS,) int32
    # Per-child conservative AABB in the COMPOUND/MESH local frame (host-precomputed at
    # registration; rotated child extents for posed children, vertex bounds for
    # triangles). Much tighter than bounding spheres for long thin children (tube
    # panels, wall slabs) — the prefilter tests sphere-vs-AABB.
    child_aabb_min: jnp.ndarray  # (CHILD_POOL, 3)
    child_aabb_max: jnp.ndarray  # (CHILD_POOL, 3)
    # Two-level child acceleration (the TPU replacement for the reference's per-shape
    # child BVH, BigCompound.cs / Mesh.cs embedded Tree): children are Morton-ordered at
    # registration and grouped into bounding-sphere clusters of CLUSTER_SIZE. Pair
    # expansion first tests the other body against a shape's cluster spheres, then only
    # the children of overlapping clusters — O(clusters + picked·CLUSTER_SIZE) instead of
    # O(child_count) per pair. Arrays are (NCOMP, CW[, 3]) — NCOMP = compound/mesh shape
    # slots, CW = max clusters of any registered shape (both pow2-rounded; their SHAPES
    # are the trace-time window bounds, so no extra static plumbing is needed).
    cl_min: jnp.ndarray  # (NCOMP, CW, 3) cluster AABB min (shape-local)
    cl_max: jnp.ndarray  # (NCOMP, CW, 3) cluster AABB max
    cl_first: jnp.ndarray  # (NCOMP, CW) int32 first child-pool row
    cl_count: jnp.ndarray  # (NCOMP, CW) int32 children in cluster (0 = dead)
    shape_cluster_row: jnp.ndarray  # (MS,) int32 row into cl_* (-1 = not compound/mesh)
    # Static hull support-window count, encoded in the SHAPE (same trick as cl_*): the
    # support kernel scans ceil(max registered hull verts / 64) 64-point windows, so
    # hulls of ANY size register faithfully (reference ConvexHull is unbounded,
    # ConvexHullHelper.cs:87) while ≤64-vert scenes pay exactly the old single window.
    hull_win: jnp.ndarray  # (n_win,) int32 dummy content


def _morton_order(centroids: np.ndarray) -> np.ndarray:
    """Stable Morton-code ordering of points over their bounding box (10 bits/axis).
    Space-filling locality makes consecutive chunks spatially tight clusters — the same
    packing idea as the reference's binned BVH builds (Trees/Tree_BinnedBuilder.cs),
    reduced to one sort because clusters here are fixed-size, not adaptive."""
    lo = centroids.min(axis=0)
    span = np.maximum(centroids.max(axis=0) - lo, 1e-9)
    q = np.clip(((centroids - lo) / span) * 1023.0, 0, 1023).astype(np.uint64)

    def spread(x):
        x = (x | (x << np.uint64(16))) & np.uint64(0x0000FF0000FF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00F00F00F00F)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0C30C30C30C3)
        x = (x | (x << np.uint64(2))) & np.uint64(0x249249249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )
    return np.argsort(code, kind="stable")


def _round_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _local_half_extents(type_id: int, params, max_radius: float) -> np.ndarray:
    """Axis-aligned half extents of a shape in ITS OWN frame (host helper for the
    per-child AABB precompute; falls back to the bounding sphere for generic shapes)."""
    if type_id == BOX:
        return np.asarray(params[:3], np.float64)
    if type_id == CAPSULE:
        r, hl = float(params[0]), float(params[1])
        return np.array([r, hl + r, r])
    if type_id == CYLINDER:
        r, hl = float(params[0]), float(params[1])
        return np.array([r, hl, r])
    if type_id == SPHERE:
        r = float(params[0])
        return np.array([r, r, r])
    return np.array([max_radius] * 3, np.float64)


def _quat_abs_rot(q) -> np.ndarray:
    """|R(q)| — elementwise absolute rotation matrix (conservative AABB rotation)."""
    x, y, z, w = (float(v) for v in q)
    r = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )
    return np.abs(r)


class ShapeRegistry:
    """Host-side shape storage with recycled rows (analogue of reference Shapes registry)."""

    HULL_POOL = 4096  # total hull vertices across all hull shapes (the only hull limit;
    # per-shape vertex counts are unbounded — the support kernel scans 64-point windows)
    CHILD_POOL = 8192  # total compound children / mesh triangles across all shapes
    CLUSTER_SIZE = 16  # children per acceleration cluster (see ShapeData.cl_*)

    def __init__(self, capacity: int = 256):
        self.capacity = capacity
        self.types = np.full(capacity, SHAPE_NONE, np.int32)
        self.params = np.zeros((capacity, N_PARAMS), np.float32)
        self.max_radius = np.zeros(capacity, np.float32)
        self.hull_pool = np.zeros((self.HULL_POOL, 3), np.float32)
        self.hull_start = np.zeros(capacity, np.int32)
        self.hull_count = np.zeros(capacity, np.int32)
        self._hull_used = 0
        self.child_shape = np.full(self.CHILD_POOL, -1, np.int32)
        self.child_pos = np.zeros((self.CHILD_POOL, 3), np.float32)
        self.child_orn = np.zeros((self.CHILD_POOL, 4), np.float32)
        self.child_orn[:, 3] = 1.0
        self.child_tri = np.zeros((self.CHILD_POOL, 9), np.float32)
        self.child_aabb_min = np.zeros((self.CHILD_POOL, 3), np.float32)
        self.child_aabb_max = np.zeros((self.CHILD_POOL, 3), np.float32)
        self.child_start = np.zeros(capacity, np.int32)
        self.child_count = np.zeros(capacity, np.int32)
        self._child_used = 0
        # Per-shape child clusters (host lists; padded to 2D in device()).
        self._clusters = {}  # shape row -> (centers (k,3), radii (k,), first (k,), count (k,))
        self.shapes = [None] * capacity
        self._free = list(range(capacity - 1, -1, -1))
        self._dirty = True
        self._device = None

    def add(self, shape) -> int:
        if not self._free:
            raise RuntimeError("shape registry full; raise capacity")
        idx = self._free.pop()
        type_id, packed = shape.pack()
        self.types[idx] = type_id
        self.params[idx, : len(packed)] = np.asarray(packed, np.float32)
        self.params[idx, len(packed):] = 0
        self.max_radius[idx] = shape.maximum_radius()
        if type_id == CONVEX_HULL:
            pts = np.asarray(shape.points, np.float32)
            if self._hull_used + len(pts) > self.HULL_POOL:
                raise RuntimeError("hull vertex pool full")
            self.hull_start[idx] = self._hull_used
            self.hull_count[idx] = len(pts)
            self.hull_pool[self._hull_used : self._hull_used + len(pts)] = pts
            self._hull_used += len(pts)
        elif type_id == COMPOUND:
            n = len(shape.children)
            if self._child_used + n > self.CHILD_POOL:
                raise RuntimeError("child pool full")
            self.child_start[idx] = self._child_used
            self.child_count[idx] = n
            cent = np.array([c[1] for c in shape.children], np.float64).reshape(n, 3)
            order = _morton_order(cent)
            radius = 0.0
            mins = np.zeros((n, 3))
            maxs = np.zeros((n, 3))
            for k, src in enumerate(order):
                cs, cpos, corn = shape.children[src]
                row = self._child_used + k
                self.child_shape[row] = cs
                self.child_pos[row] = cpos
                self.child_orn[row] = corn
                # Conservative local AABB: rotated child extents + offset.
                e = _quat_abs_rot(corn) @ _local_half_extents(
                    int(self.types[cs]), self.params[cs], float(self.max_radius[cs])
                )
                mins[k] = np.asarray(cpos) - e
                maxs[k] = np.asarray(cpos) + e
                self.child_aabb_min[row] = mins[k]
                self.child_aabb_max[row] = maxs[k]
                radius = max(radius, float(np.linalg.norm(cpos)) + float(self.max_radius[cs]))
            self.max_radius[idx] = radius
            self._build_clusters(idx, cent[order], mins, maxs)
            self._child_used += n
        elif type_id == MESH:
            n = len(shape.triangles)
            if self._child_used + n > self.CHILD_POOL:
                raise RuntimeError("child pool full (mesh triangles)")
            self.child_start[idx] = self._child_used
            self.child_count[idx] = n
            tris = np.asarray(shape.triangles, np.float64).reshape(n, 3, 3)
            cent = tris.mean(axis=1)
            order = _morton_order(cent)
            mins = tris[order].min(axis=1)
            maxs = tris[order].max(axis=1)
            for k, src in enumerate(order):
                row = self._child_used + k
                self.child_shape[row] = -1
                self.child_tri[row] = tris[src].astype(np.float32).reshape(9)
                self.child_aabb_min[row] = mins[k]
                self.child_aabb_max[row] = maxs[k]
            self._build_clusters(idx, cent[order], mins, maxs)
            self._child_used += n
        self.shapes[idx] = shape
        self._dirty = True
        return idx

    def _build_clusters(self, idx: int, cent: np.ndarray, mins: np.ndarray,
                        maxs: np.ndarray) -> None:
        """Group the (Morton-ordered) children written for shape ``idx`` into
        CLUSTER_SIZE-sized AABBs (union of member child AABBs, shape-local frame)."""
        cs = self.CLUSTER_SIZE
        n = cent.shape[0]
        cl_min, cl_max, firsts, counts = [], [], [], []
        for lo in range(0, n, cs):
            hi = min(lo + cs, n)
            cl_min.append(mins[lo:hi].min(axis=0))
            cl_max.append(maxs[lo:hi].max(axis=0))
            firsts.append(self._child_used + lo)
            counts.append(hi - lo)
        self._clusters[idx] = (
            np.asarray(cl_min, np.float32).reshape(-1, 3),
            np.asarray(cl_max, np.float32).reshape(-1, 3),
            np.asarray(firsts, np.int32),
            np.asarray(counts, np.int32),
        )

    def remove(self, idx: int) -> None:
        self.types[idx] = SHAPE_NONE
        self.shapes[idx] = None
        self._clusters.pop(idx, None)
        self._free.append(idx)
        self._dirty = True

    def __getitem__(self, idx: int):
        return self.shapes[idx]

    def device(self) -> ShapeData:
        if self._dirty or self._device is None:
            # Pad per-shape clusters to (NCOMP, CW): pow2-rounded so adding shapes of
            # similar size reuses the jit cache (array SHAPES are the trace statics).
            rows = sorted(self._clusters.keys())
            ncomp = _round_pow2(max(1, len(rows)))
            cw = _round_pow2(max(1, max((len(self._clusters[r][2]) for r in rows), default=1)))
            cl_min = np.zeros((ncomp, cw, 3), np.float32)
            cl_max = np.full((ncomp, cw, 3), -1.0, np.float32)  # dead: max < min
            cl_first = np.zeros((ncomp, cw), np.int32)
            cl_count = np.zeros((ncomp, cw), np.int32)
            shape_cluster_row = np.full(self.capacity, -1, np.int32)
            for slot, r in enumerate(rows):
                mn, mx, fi, cnt = self._clusters[r]
                k = len(fi)
                cl_min[slot, :k] = mn
                cl_max[slot, :k] = mx
                cl_first[slot, :k] = fi
                cl_count[slot, :k] = cnt
                shape_cluster_row[r] = slot
            self._device = ShapeData(
                jnp.asarray(self.types),
                jnp.asarray(self.params),
                jnp.asarray(self.max_radius),
                jnp.asarray(self.hull_pool[:, 0]),
                jnp.asarray(self.hull_pool[:, 1]),
                jnp.asarray(self.hull_pool[:, 2]),
                jnp.asarray(self.hull_start),
                jnp.asarray(self.hull_count),
                jnp.asarray(self.child_shape),
                jnp.asarray(self.child_pos),
                jnp.asarray(self.child_orn),
                jnp.asarray(self.child_tri),
                jnp.asarray(self.child_start),
                jnp.asarray(self.child_count),
                jnp.asarray(self.child_aabb_min),
                jnp.asarray(self.child_aabb_max),
                jnp.asarray(cl_min),
                jnp.asarray(cl_max),
                jnp.asarray(cl_first),
                jnp.asarray(cl_count),
                jnp.asarray(shape_cluster_row),
                jnp.zeros(
                    max(1, -(-int(self.hull_count.max(initial=0)) // 64)), jnp.int32
                ),
            )
            self._dirty = False
        return self._device


def inertia_from_diag(inv_mass, diag) -> tuple:
    """Helper: (inv_mass, Sym3 diag inverse inertia)."""
    return inv_mass, Sym3.diag(diag[0], diag[1], diag[2])
