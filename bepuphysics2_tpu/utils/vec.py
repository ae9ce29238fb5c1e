"""Component-wise SoA math types: the TPU-native analogue of the reference's AoSoA wide types.

The reference engine (bepuphysics2) performs all solver and narrow-phase math over
``Vector3Wide``/``QuaternionWide``/``Symmetric3x3Wide`` bundles — structs of SIMD registers
holding N independent lanes (reference: BepuUtilities/Vector3Wide.cs:10,
BepuUtilities/Symmetric3x3Wide.cs, BepuUtilities/QuaternionWide.cs). On TPU the same idea
maps to *struct-of-flat-arrays*: each component is a plain ``(N, ...)`` float32 array that
tiles perfectly onto the (8, 128) VPU lanes, and "lane count" is simply N (all constraints /
bodies / pairs at once). All ops broadcast, so the same types work for scalars, per-body
arrays, and per-contact ``(N, 4)`` arrays.

These are registered pytrees (NamedTuples), so they flow through jit/vmap/scan untouched.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Vec3(NamedTuple):
    """3-vector with each component an arbitrary-shape array (SoA layout)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # --- construction -------------------------------------------------------------------
    @staticmethod
    def zeros(shape=(), dtype=jnp.float32) -> "Vec3":
        # Distinct arrays per component: donated pytrees must not alias leaves
        # (XLA rejects the same buffer donated twice).
        return Vec3(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @staticmethod
    def full(shape, vx, vy, vz, dtype=jnp.float32) -> "Vec3":
        return Vec3(
            jnp.full(shape, vx, dtype), jnp.full(shape, vy, dtype), jnp.full(shape, vz, dtype)
        )

    @staticmethod
    def from_array(a) -> "Vec3":
        """From trailing-dim-3 array ``(..., 3)``."""
        a = jnp.asarray(a, jnp.float32)
        return Vec3(a[..., 0], a[..., 1], a[..., 2])

    def to_array(self) -> jnp.ndarray:
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    # --- arithmetic ---------------------------------------------------------------------
    def __add__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x + o.x, self.y + o.y, self.z + o.z)

    def __sub__(self, o: "Vec3") -> "Vec3":
        return Vec3(self.x - o.x, self.y - o.y, self.z - o.z)

    def __neg__(self) -> "Vec3":
        return Vec3(-self.x, -self.y, -self.z)

    def __mul__(self, s) -> "Vec3":
        return Vec3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def dot(self, o: "Vec3") -> jnp.ndarray:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def cross(self, o: "Vec3") -> "Vec3":
        return Vec3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def length_squared(self) -> jnp.ndarray:
        return self.dot(self)

    def length(self) -> jnp.ndarray:
        return jnp.sqrt(self.dot(self))

    def distance(self, o: "Vec3") -> jnp.ndarray:
        return (self - o).length()

    def normalize(self, eps: float = 1e-15) -> "Vec3":
        inv = jnp.where(self.length() > eps, 1.0 / jnp.maximum(self.length(), eps), 0.0)
        return self * inv

    def min(self, o: "Vec3") -> "Vec3":
        return Vec3(jnp.minimum(self.x, o.x), jnp.minimum(self.y, o.y), jnp.minimum(self.z, o.z))

    def max(self, o: "Vec3") -> "Vec3":
        return Vec3(jnp.maximum(self.x, o.x), jnp.maximum(self.y, o.y), jnp.maximum(self.z, o.z))

    def abs(self) -> "Vec3":
        return Vec3(jnp.abs(self.x), jnp.abs(self.y), jnp.abs(self.z))

    def where(self, mask, other: "Vec3") -> "Vec3":
        """Select self where mask else other (component-wise broadcast)."""
        return Vec3(
            jnp.where(mask, self.x, other.x),
            jnp.where(mask, self.y, other.y),
            jnp.where(mask, self.z, other.z),
        )

    def __getitem__(self, idx) -> "Vec3":
        # NamedTuple defines __getitem__ for field access by int; we want array indexing.
        # Integer field access is still available via .x/.y/.z; this slices arrays.
        return Vec3(self.x[idx], self.y[idx], self.z[idx])

    def sum(self, axis=None) -> "Vec3":
        return Vec3(
            jnp.sum(self.x, axis=axis), jnp.sum(self.y, axis=axis), jnp.sum(self.z, axis=axis)
        )

    def at_set(self, idx, v: "Vec3") -> "Vec3":
        return Vec3(self.x.at[idx].set(v.x), self.y.at[idx].set(v.y), self.z.at[idx].set(v.z))

    def at_add(self, idx, v: "Vec3", **kw) -> "Vec3":
        return Vec3(
            self.x.at[idx].add(v.x, **kw),
            self.y.at[idx].add(v.y, **kw),
            self.z.at[idx].add(v.z, **kw),
        )

    def astype(self, dtype) -> "Vec3":
        return Vec3(self.x.astype(dtype), self.y.astype(dtype), self.z.astype(dtype))


def v3(x, y, z) -> Vec3:
    """Literal Vec3 of scalars/arrays."""
    return Vec3(jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32), jnp.asarray(z, jnp.float32))


class Vec2(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray

    @staticmethod
    def zeros(shape=(), dtype=jnp.float32) -> "Vec2":
        return Vec2(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    def __add__(self, o):
        return Vec2(self.x + o.x, self.y + o.y)

    def __sub__(self, o):
        return Vec2(self.x - o.x, self.y - o.y)

    def __mul__(self, s):
        return Vec2(self.x * s, self.y * s)

    __rmul__ = __mul__

    def dot(self, o):
        return self.x * o.x + self.y * o.y

    def length(self):
        return jnp.sqrt(self.dot(self))


class Mat3(NamedTuple):
    """Row-major 3x3 matrix as three Vec3 rows (matches reference Matrix3x3.cs convention:
    ``transform(v) = v.x * row_x + v.y * row_y + v.z * row_z`` i.e. v treated as a row vector).
    For a rotation matrix created from a quaternion, ``transform`` rotates the vector by the
    quaternion and ``transform_transpose`` applies the inverse rotation."""

    rx: Vec3
    ry: Vec3
    rz: Vec3

    def transform(self, v: Vec3) -> Vec3:
        return Vec3(
            v.x * self.rx.x + v.y * self.ry.x + v.z * self.rz.x,
            v.x * self.rx.y + v.y * self.ry.y + v.z * self.rz.y,
            v.x * self.rx.z + v.y * self.ry.z + v.z * self.rz.z,
        )

    def transform_transpose(self, v: Vec3) -> Vec3:
        return Vec3(self.rx.dot(v), self.ry.dot(v), self.rz.dot(v))

    def transpose(self) -> "Mat3":
        return Mat3(
            Vec3(self.rx.x, self.ry.x, self.rz.x),
            Vec3(self.rx.y, self.ry.y, self.rz.y),
            Vec3(self.rx.z, self.ry.z, self.rz.z),
        )

    def matmul(self, o: "Mat3") -> "Mat3":
        return Mat3(o.transform(self.rx), o.transform(self.ry), o.transform(self.rz))

    def __add__(self, o: "Mat3") -> "Mat3":
        return Mat3(self.rx + o.rx, self.ry + o.ry, self.rz + o.rz)

    def __sub__(self, o: "Mat3") -> "Mat3":
        return Mat3(self.rx - o.rx, self.ry - o.ry, self.rz - o.rz)

    def __mul__(self, s) -> "Mat3":
        return Mat3(self.rx * s, self.ry * s, self.rz * s)

    __rmul__ = __mul__

    def determinant(self) -> jnp.ndarray:
        return self.rx.dot(self.ry.cross(self.rz))

    def inverse(self, eps: float = 0.0) -> "Mat3":
        """Inverse via adjugate. Rows of result computed so that transform() semantics hold."""
        # For row-vector convention v' = v M, the inverse satisfies v = v' M^-1.
        # M^-1 = adj(M)^T / det in this convention (standard matrix inverse, same layout).
        c0 = self.ry.cross(self.rz)
        c1 = self.rz.cross(self.rx)
        c2 = self.rx.cross(self.ry)
        det = self.rx.dot(c0)
        inv_det = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
        # inverse rows: columns of cofactor matrix scaled
        return Mat3(
            Vec3(c0.x, c1.x, c2.x) * inv_det,
            Vec3(c0.y, c1.y, c2.y) * inv_det,
            Vec3(c0.z, c1.z, c2.z) * inv_det,
        )

    @staticmethod
    def identity(shape=()) -> "Mat3":
        one = jnp.ones(shape, jnp.float32)
        zero = jnp.zeros(shape, jnp.float32)
        return Mat3(Vec3(one, zero, zero), Vec3(zero, one, zero), Vec3(zero, zero, one))

    @staticmethod
    def cross_matrix(v: Vec3) -> "Mat3":
        """Skew matrix S such that ``S.transform(w) == v × w``? Note row convention:
        transform(u) = u S; we construct S so that ``S.transform(w) = v.cross(w)`` does NOT
        hold directly — instead this matches reference Matrix3x3.CreateCrossProduct: the
        matrix M with ``w M == v × w`` under the row convention."""
        zero = jnp.zeros_like(v.x)
        # reference CreateCrossProduct(v): rows: (0, v.z, -v.y; -v.z, 0, v.x; v.y, -v.x, 0)
        # then Transform(w, M) = w M = v x w ... verify: (w M).x = w.x*0 + w.y*(-v.z) + w.z*v.y
        # = v.y*w.z - v.z*w.y = (v × w).x  ✓
        return Mat3(
            Vec3(zero, v.z, -v.y),
            Vec3(-v.z, zero, v.x),
            Vec3(v.y, -v.x, zero),
        )


class Sym3(NamedTuple):
    """Symmetric 3x3 matrix (lower-triangle storage: xx, yx, yy, zx, zy, zz) — the layout of
    the reference's Symmetric3x3Wide (BepuUtilities/Symmetric3x3Wide.cs). Used for inverse
    inertia tensors and effective mass matrices."""

    xx: jnp.ndarray
    yx: jnp.ndarray
    yy: jnp.ndarray
    zx: jnp.ndarray
    zy: jnp.ndarray
    zz: jnp.ndarray

    @staticmethod
    def zeros(shape=(), dtype=jnp.float32) -> "Sym3":
        return Sym3(*(jnp.zeros(shape, dtype) for _ in range(6)))

    @staticmethod
    def diag(x, y, z) -> "Sym3":
        x = jnp.asarray(x, jnp.float32)
        zero = jnp.zeros_like(x)
        return Sym3(x, zero, jnp.asarray(y, jnp.float32), zero, zero, jnp.asarray(z, jnp.float32))

    @staticmethod
    def identity(shape=()) -> "Sym3":
        one = jnp.ones(shape, jnp.float32)
        return Sym3.diag(one, one, one)

    def __add__(self, o: "Sym3") -> "Sym3":
        return Sym3(
            self.xx + o.xx, self.yx + o.yx, self.yy + o.yy,
            self.zx + o.zx, self.zy + o.zy, self.zz + o.zz,
        )

    def __mul__(self, s) -> "Sym3":
        return Sym3(self.xx * s, self.yx * s, self.yy * s, self.zx * s, self.zy * s, self.zz * s)

    __rmul__ = __mul__

    def transform(self, v: Vec3) -> Vec3:
        """S · v (symmetric, so row/column convention is irrelevant)."""
        return Vec3(
            v.x * self.xx + v.y * self.yx + v.z * self.zx,
            v.x * self.yx + v.y * self.yy + v.z * self.zy,
            v.x * self.zx + v.y * self.zy + v.z * self.zz,
        )

    def vector_sandwich(self, v: Vec3) -> jnp.ndarray:
        """v · S · v."""
        return v.dot(self.transform(v))

    def determinant(self) -> jnp.ndarray:
        m11 = self.yy * self.zz - self.zy * self.zy
        m21 = self.zy * self.zx - self.zz * self.yx
        m31 = self.yx * self.zy - self.zx * self.yy
        return m11 * self.xx + m21 * self.yx + m31 * self.zx

    def inverse(self, eps: float = 0.0) -> "Sym3":
        """Inverse of a symmetric matrix (symmetric again). Zero (within eps) determinant
        yields zeros — matching the engine's convention that fully locked inertia inverts
        to zero inverse inertia."""
        m11 = self.yy * self.zz - self.zy * self.zy
        m21 = self.zy * self.zx - self.zz * self.yx
        m31 = self.yx * self.zy - self.zx * self.yy
        det = m11 * self.xx + m21 * self.yx + m31 * self.zx
        inv = jnp.where(jnp.abs(det) > eps, 1.0 / det, 0.0)
        m22 = self.zz * self.xx - self.zx * self.zx
        m32 = self.zx * self.yx - self.xx * self.zy
        m33 = self.xx * self.yy - self.yx * self.yx
        return Sym3(m11 * inv, m21 * inv, m22 * inv, m31 * inv, m32 * inv, m33 * inv)

    def rotation_sandwich(self, r: Mat3) -> "Sym3":
        """R^T · S · R under the reference row convention (Symmetric3x3.RotationSandwich),
        which rotates a local-frame tensor to world frame when R = rotation matrix of the
        body orientation: I_world^-1 = R^T I_local^-1 R (reference PoseIntegrator.cs:109)."""
        # i = R^T * S   (i has rows = R columns dotted with S)
        ixx = r.rx.x * self.xx + r.ry.x * self.yx + r.rz.x * self.zx
        ixy = r.rx.x * self.yx + r.ry.x * self.yy + r.rz.x * self.zy
        ixz = r.rx.x * self.zx + r.ry.x * self.zy + r.rz.x * self.zz
        iyx = r.rx.y * self.xx + r.ry.y * self.yx + r.rz.y * self.zx
        iyy = r.rx.y * self.yx + r.ry.y * self.yy + r.rz.y * self.zy
        iyz = r.rx.y * self.zx + r.ry.y * self.zy + r.rz.y * self.zz
        izx = r.rx.z * self.xx + r.ry.z * self.yx + r.rz.z * self.zx
        izy = r.rx.z * self.yx + r.ry.z * self.yy + r.rz.z * self.zy
        izz = r.rx.z * self.zx + r.ry.z * self.zy + r.rz.z * self.zz
        # result = i * R  (result[a,b] = sum_c i[a,c] * R[c,b])
        return Sym3(
            ixx * r.rx.x + ixy * r.ry.x + ixz * r.rz.x,
            iyx * r.rx.x + iyy * r.ry.x + iyz * r.rz.x,
            iyx * r.rx.y + iyy * r.ry.y + iyz * r.rz.y,
            izx * r.rx.x + izy * r.ry.x + izz * r.rz.x,
            izx * r.rx.y + izy * r.ry.y + izz * r.rz.y,
            izx * r.rx.z + izy * r.ry.z + izz * r.rz.z,
        )

    def skew_sandwich(self, r: Vec3) -> "Sym3":
        """K = skew(r) · S · skew(r)^T (reference Symmetric3x3Wide.SkewSandwichWithoutOverlap)
        — the angular contribution of an offset-r point constraint to an inverse effective
        mass. K_ij = (e_i × r) · S · (e_j × r)."""
        ux = Vec3(jnp.zeros_like(r.x), -r.z, r.y)  # e_x × r
        uy = Vec3(r.z, jnp.zeros_like(r.x), -r.x)  # e_y × r
        uz = Vec3(-r.y, r.x, jnp.zeros_like(r.x))  # e_z × r
        sux = self.transform(ux)
        suy = self.transform(uy)
        suz = self.transform(uz)
        return Sym3(ux.dot(sux), uy.dot(sux), uy.dot(suy), uz.dot(sux), uz.dot(suy), uz.dot(suz))

    def where(self, mask, other: "Sym3") -> "Sym3":
        return Sym3(*(jnp.where(mask, a, b) for a, b in zip(self, other)))

    def __getitem__(self, idx) -> "Sym3":
        return Sym3(*(c[idx] for c in (self.xx, self.yx, self.yy, self.zx, self.zy, self.zz)))

    def to_matrix(self) -> jnp.ndarray:
        """Dense (..., 3, 3) array (for tests / interop)."""
        row0 = jnp.stack([self.xx, self.yx, self.zx], -1)
        row1 = jnp.stack([self.yx, self.yy, self.zy], -1)
        row2 = jnp.stack([self.zx, self.zy, self.zz], -1)
        return jnp.stack([row0, row1, row2], -2)


class Sym2(NamedTuple):
    """Symmetric 2x2 (xx, yx, yy) for the tangent-friction effective mass
    (reference Symmetric2x2Wide.cs)."""

    xx: jnp.ndarray
    yx: jnp.ndarray
    yy: jnp.ndarray

    def __add__(self, o: "Sym2") -> "Sym2":
        return Sym2(self.xx + o.xx, self.yx + o.yx, self.yy + o.yy)

    def transform(self, v: Vec2) -> Vec2:
        return Vec2(v.x * self.xx + v.y * self.yx, v.x * self.yx + v.y * self.yy)

    def inverse(self) -> "Sym2":
        det = self.xx * self.yy - self.yx * self.yx
        inv = jnp.where(jnp.abs(det) > 0, 1.0 / det, 0.0)
        return Sym2(self.yy * inv, -self.yx * inv, self.xx * inv)


class Quat(NamedTuple):
    """Quaternion (x, y, z, w) — same component order as the reference (System.Numerics)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    w: jnp.ndarray

    @staticmethod
    def identity(shape=()) -> "Quat":
        # Distinct arrays per component (donation-safe; see Vec3.zeros).
        return Quat(
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.ones(shape, jnp.float32),
        )

    @staticmethod
    def from_array(a) -> "Quat":
        a = jnp.asarray(a, jnp.float32)
        return Quat(a[..., 0], a[..., 1], a[..., 2], a[..., 3])

    def to_array(self) -> jnp.ndarray:
        return jnp.stack([self.x, self.y, self.z, self.w], axis=-1)

    @staticmethod
    def from_axis_angle(axis: Vec3, angle) -> "Quat":
        half = jnp.asarray(angle, jnp.float32) * 0.5
        s = jnp.sin(half)
        return Quat(axis.x * s, axis.y * s, axis.z * s, jnp.cos(half))

    def mul(self, b: "Quat") -> "Quat":
        """Hamilton product self * b: applying rotation ``self`` then ``b`` is
        ``concatenate(self, b) = b.mul? `` — note the reference's QuaternionEx.Concatenate(a, b)
        returns the rotation equivalent to applying a first, then b; with this ``mul`` as the
        standard quaternion product q = a*b meaning rotate-by-b-then-a, Concatenate(a, b)
        == b.mul(a)."""
        a = self
        return Quat(
            a.w * b.x + a.x * b.w + a.y * b.z - a.z * b.y,
            a.w * b.y - a.x * b.z + a.y * b.w + a.z * b.x,
            a.w * b.z + a.x * b.y - a.y * b.x + a.z * b.w,
            a.w * b.w - a.x * b.x - a.y * b.y - a.z * b.z,
        )

    def conjugate(self) -> "Quat":
        return Quat(-self.x, -self.y, -self.z, self.w)

    def normalize(self) -> "Quat":
        inv = 1.0 / jnp.sqrt(self.x**2 + self.y**2 + self.z**2 + self.w**2)
        return Quat(self.x * inv, self.y * inv, self.z * inv, self.w * inv)

    def rotate(self, v: Vec3) -> Vec3:
        """Rotate vector by quaternion: q v q*."""
        # t = 2 * (q.xyz × v); v' = v + q.w * t + q.xyz × t
        qv = Vec3(self.x, self.y, self.z)
        t = qv.cross(v) * 2.0
        return v + t * self.w + qv.cross(t)

    def rotate_inverse(self, v: Vec3) -> Vec3:
        return self.conjugate().rotate(v)

    def to_matrix(self) -> Mat3:
        """Rotation matrix in the row convention such that ``m.transform(v) == self.rotate(v)``
        (reference Matrix3x3.CreateFromQuaternion)."""
        x2 = self.x + self.x
        y2 = self.y + self.y
        z2 = self.z + self.z
        xx2 = self.x * x2
        yy2 = self.y * y2
        zz2 = self.z * z2
        xy2 = self.x * y2
        xz2 = self.x * z2
        yz2 = self.y * z2
        wx2 = self.w * x2
        wy2 = self.w * y2
        wz2 = self.w * z2
        return Mat3(
            Vec3(1.0 - yy2 - zz2, xy2 + wz2, xz2 - wy2),
            Vec3(xy2 - wz2, 1.0 - xx2 - zz2, yz2 + wx2),
            Vec3(xz2 + wy2, yz2 - wx2, 1.0 - xx2 - yy2),
        )

    def where(self, mask, other: "Quat") -> "Quat":
        return Quat(
            jnp.where(mask, self.x, other.x),
            jnp.where(mask, self.y, other.y),
            jnp.where(mask, self.z, other.z),
            jnp.where(mask, self.w, other.w),
        )

    def __getitem__(self, idx) -> "Quat":
        return Quat(self.x[idx], self.y[idx], self.z[idx], self.w[idx])


def integrate_orientation(orn: Quat, omega: Vec3, dt) -> Quat:
    """Piecewise-linear orientation integration (reference PoseIntegrator.cs:122-143):
    q' = normalize(q ⊗ axis_angle(ω̂, |ω| dt)), identity when |ω| ~ 0."""
    speed = omega.length()
    half_angle = speed * dt * 0.5
    scale = jnp.where(speed > 1e-15, jnp.sin(half_angle) / jnp.maximum(speed, 1e-15), 0.0)
    dq = Quat(omega.x * scale, omega.y * scale, omega.z * scale, jnp.cos(half_angle))
    # Concatenate(orientation, dq): apply orientation first, then dq => standard product dq*orn
    integrated = dq.mul(orn).normalize()
    return integrated.where(speed > 1e-15, orn)


def build_orthonormal_basis(normal: Vec3):
    """Branch-free tangent basis from a unit normal (reference Helpers.cs:21-35, revised
    Frisvad). Returns (t1, t2) with (t1, normal?, t2) ... (t1, t2) ⟂ normal and each other."""
    sign = jnp.where(normal.z < 0.0, -1.0, 1.0)
    scale = -1.0 / (sign + normal.z)
    t1 = Vec3(normal.x * normal.y * scale, sign + normal.y * normal.y * scale, -normal.y)
    t2 = Vec3(1.0 + sign * normal.x * normal.x * scale, sign * t1.x, -sign * normal.x)
    return t1, t2
