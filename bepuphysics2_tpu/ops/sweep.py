"""Pallas TPU color-sweep kernel: the solver's per-substep velocity-iteration interior.

The reference's entire performance identity is the multithreaded per-batch solve loop
(reference Solver_Solve.cs:297-654, TwoBodyTypeProcessor.cs:205). The XLA formulation of
that loop — one fused gather→prepare→iterate→scatter program per color slice — pays two
HBM round-trips of the full (NB, 6) velocity array per pass plus per-fusion launch
overheads, which dominates the solver at every scene size. This kernel keeps the body
state **VMEM-resident across every color slice and velocity iteration of a substep** and
routes constraint-row gathers/scatters through the MXU:

- Body state lives in a transposed layout ``S[(comp·L + l), chunk]`` (L = 8 bodies per
  chunk column): component rows, bodies split (chunk, lane-in-chunk). A slice's row
  gather is then ``W = S @ OH_chunk`` (one-hot chunk-selection matmul) followed by an
  8-way lane-in-chunk select — and the scatter is the transposed matmul. One-hot
  operands are exact in bfloat16, and the f32 data is split into three bfloat16
  components (``bf16x3``) whose partial products are each exact (every output element
  has exactly one nonzero term), so the routing reproduces f32 gathers bit-exactly
  (measured: 0 ulp vs XLA gather, ~3 µs per 1k-row pass on v5e).
- The Jacobi fallback bucket becomes trailing pseudo-color slices with a per-row
  mass-splitting scale (reference SequentialFallbackBatch.cs:37): the matmul scatter
  accumulates duplicate-body contributions exactly like a segment-sum.
- Jacobians / effective masses are recomputed in-kernel per visit from the streamed
  prestep block + the gathered body context, matching the reference's
  recompute-per-solve structure.

Grid = (velocity_iterations, num_slices); slices stream their prestep block from HBM
(double-buffered by Pallas) while velocities and accumulated impulses persist in VMEM
scratch. Gauss-Seidel ordering holds because TPU grid steps execute sequentially.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constraints.contact import BodyVel
from ..utils.vec import (
    Quat,
    Sym2,
    Sym3,
    Vec2,
    Vec3,
    build_orthonormal_basis,
    integrate_orientation,
)

L = 8  # bodies per chunk column of the transposed state

# --- packed contact prestep rows (component-major, (PS, B)) ---------------------------
PS_N = 0  # 0-2 normal xyz
PS_AX = 3  # 3-6 offset_a.x[k]
PS_AY = 7  # 7-10 offset_a.y[k]
PS_AZ = 11  # 11-14 offset_a.z[k]
PS_B = 15  # 15-17 offset_b xyz
PS_DEPTH = 18  # 18-21 depth[k]
PS_MASK = 22  # 22-25 contact mask[k] (0/1)
PS_FRICTION = 26
PS_ERRVEL = 27
PS_CFM = 28
PS_SOFT = 29
PS_MAXREC = 30
PS_VALID = 31
PS_ROWS = 32

IMP_ROWS = 8  # 0-3 pen[k], 4 tx, 5 ty, 6 twist, 7 pad

# state rows: 8 velocity comps then 16 body-context comps, each spread over L lanes
NVC = 8  # vx vy vz wx wy wz pad pad
NTC = 16  # px py pz qx qy qz qw | im ixx iyx iyy izx izy izz pad pad
SROWS = (NVC + NTC) * L  # 192


def _bf16x3(x):
    b1 = x.astype(jnp.bfloat16)
    r = x - b1.astype(jnp.float32)
    b2 = r.astype(jnp.bfloat16)
    b3 = (r - b2.astype(jnp.float32)).astype(jnp.bfloat16)
    return b1, b2, b3


def _mm3(x, oh):
    """Exact f32 matmul against a one-hot bf16 operand via 3-way bf16 split."""
    b1, b2, b3 = _bf16x3(x)
    return (
        jnp.dot(b1, oh, preferred_element_type=jnp.float32)
        + jnp.dot(b2, oh, preferred_element_type=jnp.float32)
        + jnp.dot(b3, oh, preferred_element_type=jnp.float32)
    )


def _friction_center_rows(ps, dep):
    """Depth-weighted manifold center (component-row port of
    constraints/contact.py::_friction_center). Returns (center_a, live_f list)."""
    live_f = [ps[PS_MASK + k] for k in range(4)]
    w_raw = [jnp.where(dep[k] < 0.0, 0.0, 1.0) * live_f[k] for k in range(4)]
    wsum = w_raw[0] + w_raw[1] + w_raw[2] + w_raw[3]
    live_count = jnp.maximum(live_f[0] + live_f[1] + live_f[2] + live_f[3], 1.0)
    fallback = wsum == 0.0
    w = [
        jnp.where(fallback, live_f[k] / live_count, w_raw[k] / jnp.maximum(wsum, 1.0))
        for k in range(4)
    ]
    center_a = Vec3.zeros(ps[PS_N].shape)
    for k in range(4):
        off_k = Vec3(ps[PS_AX + k], ps[PS_AY + k], ps[PS_AZ + k])
        center_a = center_a + off_k * w[k]
    return center_a, live_f


def _solve_contact_rows(ps, dep, imp, ia_im, ia_ii, ib_im, ib_ii, va, vb, inv_h):
    """One velocity iteration over a slice, all rows masked. Component-row port of
    constraints/contact.py::solve (same math & update order; see that module for the
    reference citations). ``ps``/``imp``: (rows, SB) blocks; ``dep``: 4 depth rows
    (VMEM-resident, updated per substep); sides' inertias gathered and
    mass-split-scaled. Returns (new_imp rows, dva, dvb)."""
    n = Vec3(ps[PS_N], ps[PS_N + 1], ps[PS_N + 2])
    err_vel = ps[PS_ERRVEL]
    cfm = ps[PS_CFM]
    softness = ps[PS_SOFT]
    valid = ps[PS_VALID] > 0.5
    off_b = Vec3(ps[PS_B], ps[PS_B + 1], ps[PS_B + 2])
    im_a, im_b = ia_im, ib_im

    dva_l = Vec3.zeros(n.x.shape)
    dva_a = Vec3.zeros(n.x.shape)
    dvb_l = Vec3.zeros(n.x.shape)
    dvb_a = Vec3.zeros(n.x.shape)

    pen_new = []
    pen_masked_sum = None
    pen_lever_sum = None

    # Friction center (depth-weighted; fallback = mean of live) — needed by tangent
    # solve below; per-contact penetration solves run first, mutating va/vb.
    center_a, live_f = _friction_center_rows(ps, dep)
    center_b = center_a - off_b

    for k in range(4):
        off_k = Vec3(ps[PS_AX + k], ps[PS_AY + k], ps[PS_AZ + k])
        off_bk = off_k - off_b
        ang_a = off_k.cross(n)
        ang_b = n.cross(off_bk)
        ang_a_im = ia_ii.transform(ang_a)
        ang_b_im = ib_ii.transform(ang_b)
        inv_eff = im_a + im_b + ang_a.dot(ang_a_im) + ang_b.dot(ang_b_im)
        eff = jnp.where(inv_eff > 0.0, cfm / jnp.maximum(inv_eff, 1e-30), 0.0)
        depth_k = dep[k]
        bias = jnp.minimum(
            depth_k * inv_h, jnp.minimum(depth_k * err_vel, ps[PS_MAXREC])
        )
        csv = (
            (va.linear + dva_l).dot(n)
            - (vb.linear + dvb_l).dot(n)
            + (va.angular + dva_a).dot(ang_a)
            + (vb.angular + dvb_a).dot(ang_b)
        )
        acc_k = imp[k]
        negated_csi = acc_k * softness + (csv - bias) * eff
        new_acc = jnp.maximum(0.0, acc_k - negated_csi)
        live = (live_f[k] > 0.5) & valid
        new_acc = jnp.where(live, new_acc, acc_k)
        corrective = jnp.where(live, new_acc - acc_k, 0.0)
        pen_new.append(new_acc)
        lin = n * corrective
        dva_l = dva_l + lin * im_a
        dva_a = dva_a + ang_a_im * corrective
        dvb_l = dvb_l - lin * im_b
        dvb_a = dvb_a + ang_b_im * corrective
        pm = new_acc * live_f[k]
        pen_masked_sum = pm if pen_masked_sum is None else pen_masked_sum + pm
        dist_k = (off_k - center_a).length()
        pl_ = pm * dist_k
        pen_lever_sum = pl_ if pen_lever_sum is None else pen_lever_sum + pl_

    # Tangent friction (2-DOF block at the manifold center).
    t1, t2 = build_orthonormal_basis(n)
    ang_a1 = center_a.cross(t1)
    ang_a2 = center_a.cross(t2)
    ang_b1 = t1.cross(center_b)
    ang_b2 = t2.cross(center_b)
    ang_a1_im = ia_ii.transform(ang_a1)
    ang_a2_im = ia_ii.transform(ang_a2)
    ang_b1_im = ib_ii.transform(ang_b1)
    ang_b2_im = ib_ii.transform(ang_b2)
    imass = im_a + im_b
    m11 = imass + ang_a1.dot(ang_a1_im) + ang_b1.dot(ang_b1_im)
    m22 = imass + ang_a2.dot(ang_a2_im) + ang_b2.dot(ang_b2_im)
    m12 = ang_a1_im.dot(ang_a2) + ang_b1_im.dot(ang_b2)
    eff_t = Sym2(m11, m12, m22).inverse()

    va_l = va.linear + dva_l
    va_a = va.angular + dva_a
    vb_l = vb.linear + dvb_l
    vb_a = vb.angular + dvb_a
    csv1 = vb_l.dot(t1) - va_l.dot(t1) - va_a.dot(ang_a1) - vb_a.dot(ang_b1)
    csv2 = vb_l.dot(t2) - va_l.dot(t2) - va_a.dot(ang_a2) - vb_a.dot(ang_b2)
    csi = eff_t.transform(Vec2(csv1, csv2))

    contact_count = jnp.maximum(live_f[0] + live_f[1] + live_f[2] + live_f[3], 1.0)
    premul_friction = ps[PS_FRICTION] / contact_count
    max_tangent = premul_friction * pen_masked_sum
    prev_tx, prev_ty = imp[4], imp[5]
    new_tx = prev_tx + csi.x
    new_ty = prev_ty + csi.y
    mag = jnp.sqrt(new_tx * new_tx + new_ty * new_ty)
    sc = jnp.minimum(1.0, max_tangent / jnp.maximum(1e-16, mag))
    new_tx = new_tx * sc
    new_ty = new_ty * sc
    new_tx = jnp.where(valid, new_tx, prev_tx)
    new_ty = jnp.where(valid, new_ty, prev_ty)
    cx = new_tx - prev_tx
    cy = new_ty - prev_ty
    lin_t = t1 * cx + t2 * cy
    dva_l = dva_l + lin_t * im_a
    dva_a = dva_a + ang_a1_im * cx + ang_a2_im * cy
    dvb_l = dvb_l - lin_t * im_b
    dvb_a = dvb_a + ang_b1_im * cx + ang_b2_im * cy

    # Twist friction.
    single = contact_count <= 1.0
    lever0 = jnp.maximum(0.0, dep[0])
    twist_cap = jnp.where(
        single,
        premul_friction * pen_new[0] * live_f[0] * lever0,
        premul_friction * pen_lever_sum,
    )
    n_im_a = ia_ii.transform(n)
    n_im_b = ib_ii.transform(n)
    inv_eff_tw = n.dot(n_im_a) + n.dot(n_im_b)
    eff_tw = jnp.where(inv_eff_tw == 0.0, 0.0, 1.0 / jnp.maximum(inv_eff_tw, 1e-30))
    csv_tw = (va.angular + dva_a).dot(n) - (vb.angular + dvb_a).dot(n)
    csi_tw = -csv_tw * eff_tw
    prev_tw = imp[6]
    new_tw = jnp.clip(prev_tw + csi_tw, -twist_cap, twist_cap)
    new_tw = jnp.where(valid, new_tw, prev_tw)
    corr_tw = new_tw - prev_tw
    dva_a = dva_a + n_im_a * corr_tw
    dvb_a = dvb_a - n_im_b * corr_tw

    new_imp = pen_new + [new_tx, new_ty, new_tw, jnp.zeros_like(new_tw)]
    return new_imp, (dva_l, dva_a), (dvb_l, dvb_a)


def _warm_start_rows(ps, dep, imp, ia_im, ia_ii, ib_im, ib_ii):
    """Warm-start velocity deltas (component-row port of constraints/contact.py::
    warm_start — pure accumulation, velocity-independent). Invalid rows contribute
    zero (impulses are pre-zeroed for invalid records)."""
    n = Vec3(ps[PS_N], ps[PS_N + 1], ps[PS_N + 2])
    off_b = Vec3(ps[PS_B], ps[PS_B + 1], ps[PS_B + 2])
    valid = ps[PS_VALID] > 0.5
    center_a, live_f = _friction_center_rows(ps, dep)
    center_b = center_a - off_b
    t1, t2 = build_orthonormal_basis(n)

    tx = jnp.where(valid, imp[4], 0.0)
    ty = jnp.where(valid, imp[5], 0.0)
    tw = jnp.where(valid, imp[6], 0.0)
    tangent_w = t1 * tx + t2 * ty
    lin = tangent_w
    ang_a = center_a.cross(tangent_w)
    ang_b = tangent_w.cross(center_b)
    for k in range(4):
        pen_k = imp[k] * live_f[k] * jnp.where(valid, 1.0, 0.0)
        off_k = Vec3(ps[PS_AX + k], ps[PS_AY + k], ps[PS_AZ + k])
        off_bk = off_k - off_b
        lin = lin + n * pen_k
        ang_a = ang_a + off_k.cross(n) * pen_k
        ang_b = ang_b + n.cross(off_bk) * pen_k
    ang_a = ang_a + n * tw
    ang_b = ang_b - n * tw
    dva = (lin * ia_im, ia_ii.transform(ang_a))
    dvb = (-1.0 * lin * ib_im, ib_ii.transform(ang_b))
    return dva, dvb


def _inc_depth_rows(ps, dep, va, vb, h):
    """Per-substep incremental depth update (component-row port of
    constraints/contact.py::incremental_depth_update)."""
    n = Vec3(ps[PS_N], ps[PS_N + 1], ps[PS_N + 2])
    off_b = Vec3(ps[PS_B], ps[PS_B + 1], ps[PS_B + 2])
    out = []
    for k in range(4):
        off_k = Vec3(ps[PS_AX + k], ps[PS_AY + k], ps[PS_AZ + k])
        off_bk = off_k - off_b
        cv_a = va.angular.cross(off_k) + va.linear
        cv_b = vb.angular.cross(off_bk) + vb.linear
        out.append(dep[k] - n.dot(cv_a - cv_b) * h)
    return out


def _contact_sweep_kernel(
    hscal_ref,  # (1, 2) SMEM: h, inv_h  (unused h kept for symmetry/extension)
    hi_lane_ref,  # (1, 2SB) int32 block
    lo_lane_ref,  # (1, 2SB) int32 block
    hi_sub_ref,  # (2SB, 1) int32 block
    scale_ref,  # (1, 2SB) f32 block
    ps_ref,  # (PS_ROWS, SB) f32 block
    v_in_ref,  # (NVC*L, NCH) f32 full
    t_in_ref,  # (NTC*L, NCH) f32 full
    imp_in_ref,  # (IMP_ROWS, B) f32 full
    v_out_ref,  # (NVC*L, NCH) f32 full
    imp_out_ref,  # (IMP_ROWS, B) f32 full
    s_scratch,  # (SROWS, NCH) f32
    imp_scratch,  # (IMP_ROWS, B) f32
    *,
    n_slices,
    n_iters,
    sb,
):
    it = pl.program_id(0)
    s = pl.program_id(1)
    first = (it == 0) & (s == 0)
    last = (it == n_iters - 1) & (s == n_slices - 1)

    @pl.when(first)
    def _():
        s_scratch[0 : NVC * L, :] = v_in_ref[:]
        s_scratch[NVC * L :, :] = t_in_ref[:]
        imp_scratch[:] = imp_in_ref[:]

    nch = s_scratch.shape[1]
    m2 = 2 * sb
    inv_h = hscal_ref[0, 1]

    hi_lane = hi_lane_ref[0]  # (1, 2SB)
    lo_lane = lo_lane_ref[0]
    hi_sub = hi_sub_ref[0]  # (2SB, 1)
    scale2 = scale_ref[0, 0]  # (2SB,)

    oh_g = (
        jax.lax.broadcasted_iota(jnp.int32, (nch, m2), 0) == hi_lane
    ).astype(jnp.bfloat16)
    oh_s = (
        jax.lax.broadcasted_iota(jnp.int32, (m2, nch), 1) == hi_sub
    ).astype(jnp.bfloat16)
    oh_lo = (
        jax.lax.broadcasted_iota(jnp.int32, (L, m2), 0) == lo_lane
    ).astype(jnp.float32)

    # Gather: route all 24 body components for both sides in one matmul family.
    W = _mm3(s_scratch[:], oh_g)  # (SROWS, 2SB)
    W3 = W.reshape(NVC + NTC, L, m2)
    G = jnp.sum(W3 * oh_lo[None, :, :], axis=1)  # (24, 2SB)

    ga = G[:, :sb]
    gb = G[:, sb:]
    sa = scale2[:sb]
    sb_ = scale2[sb:]

    va = (Vec3(ga[0], ga[1], ga[2]), Vec3(ga[3], ga[4], ga[5]))
    vb = (Vec3(gb[0], gb[1], gb[2]), Vec3(gb[3], gb[4], gb[5]))
    ia_im = ga[NVC + 7] * sa
    ia_ii = Sym3(*(ga[NVC + 8 + j] * sa for j in range(6)))
    ib_im = gb[NVC + 7] * sb_
    ib_ii = Sym3(*(gb[NVC + 8 + j] * sb_ for j in range(6)))

    ps = ps_ref[:]  # (PS_ROWS, SB)
    imp_blk = imp_scratch[:, pl.ds(s * sb, sb)]  # (IMP_ROWS, SB)
    imp_rows = [imp_blk[r] for r in range(IMP_ROWS)]

    new_imp, (dva_l, dva_a), (dvb_l, dvb_a) = _solve_contact_rows(
        ps,
        [ps[PS_DEPTH + k] for k in range(4)],
        imp_rows,
        ia_im,
        ia_ii,
        ib_im,
        ib_ii,
        BodyVel(va[0], va[1]),
        BodyVel(vb[0], vb[1]),
        inv_h,
    )

    imp_scratch[:, pl.ds(s * sb, sb)] = jnp.stack(new_imp)

    # Scatter: mass-split scaling divides the deltas (Jacobi pseudo-colors).
    # (2-D lane concat at the SB tile boundary — Mosaic rejects 1-D concatenation.)
    za = jnp.zeros_like(dva_l.x)
    zb = jnp.zeros_like(dvb_l.x)
    d_a = jnp.stack([dva_l.x, dva_l.y, dva_l.z, dva_a.x, dva_a.y, dva_a.z, za, za])
    d_b = jnp.stack([dvb_l.x, dvb_l.y, dvb_l.z, dvb_a.x, dvb_a.y, dvb_a.z, zb, zb])
    d_rows = jnp.concatenate([d_a, d_b], axis=1)  # (8, 2SB)
    # Mass splitting: inertia was scaled UP by the valence, the applied deltas divide
    # back down (reference SequentialFallbackBatch semantics; scale == 1 in GS colors).
    d_rows = d_rows / scale2[None, :]
    dexp = (d_rows[:, None, :] * oh_lo[None, :, :]).reshape(NVC * L, m2)
    dV = _mm3(dexp, oh_s)  # (NVC*L, NCH)
    s_scratch[0 : NVC * L, :] = s_scratch[0 : NVC * L, :] + dV

    @pl.when(last)
    def _():
        v_out_ref[:] = s_scratch[0 : NVC * L, :]
        imp_out_ref[:] = imp_scratch[:]


def contact_sweep(
    vt,  # (NVC*L, NCH) f32 transposed velocities
    tt,  # (NTC*L, NCH) f32 transposed body context
    ps_t,  # (PS_ROWS, B) f32 transposed prestep (B = n_slices*SB)
    imp_t,  # (IMP_ROWS, B) f32 transposed impulses
    idx2,  # (B2 = n_slices*2SB,) int32 body index per row side (a rows then b rows per slice)
    scale,  # (B2,) f32 jacobi scale per row side (1.0 in GS colors)
    h,
    inv_h,
    *,
    sb: int,
    n_iters: int,
    interpret: bool = False,
):
    """Run ``n_iters`` Gauss-Seidel sweeps over all slices. ``idx2``/``scale`` are laid
    out per slice: slice s occupies rows [s*2SB, (s+1)*2SB) with the A sides first.
    Returns (vt', imp_t')."""
    srows, nch = vt.shape[0] + tt.shape[0], vt.shape[1]
    B = ps_t.shape[1]
    n_slices = B // sb
    m2 = 2 * sb

    hi = (idx2 // L).astype(jnp.int32).reshape(n_slices, 1, m2)
    lo = (idx2 % L).astype(jnp.int32).reshape(n_slices, 1, m2)
    hi_sub = hi.reshape(n_slices, m2, 1)
    scale_r = scale.astype(jnp.float32).reshape(n_slices, 1, m2)
    hscal = jnp.asarray([h, inv_h], jnp.float32).reshape(1, 2)

    kernel = functools.partial(
        _contact_sweep_kernel, n_slices=n_slices, n_iters=n_iters, sb=sb
    )

    grid = (n_iters, n_slices)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m2), lambda it, s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m2), lambda it, s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m2, 1), lambda it, s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m2), lambda it, s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (PS_ROWS, sb), lambda it, s: (0, s), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((NVC * L, nch), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((NTC * L, nch), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IMP_ROWS, B), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NVC * L, nch), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IMP_ROWS, B), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NVC * L, nch), jnp.float32),
            jax.ShapeDtypeStruct((IMP_ROWS, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((srows, nch), jnp.float32),
            pltpu.VMEM((IMP_ROWS, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        hscal,
        hi,
        lo,
        hi_sub,
        scale_r,
        ps_t,
        vt,
        tt,
        imp_t,
    )


# --------------------------------------------------------------------------------------
# Whole-solve mega kernel: one pallas_call per step for contact-only scenes.

NGC = 16  # gatherable comps: v6 (8) + [im, world inertia 6, pad] (8)
SG_ROWS = NGC * L  # 128
SP_ROWS = 8 * L  # pose: px py pz qx qy qz qw pad
AUX_ROWS = 8 * L  # im, local inertia 6, mask code


def _substeps_kernel(
    hscal_ref,  # (1, 4) SMEM: h, inv_h, lin_scale, ang_scale
    hi_lane_ref, lo_lane_ref, hi_sub_ref, scale_ref,  # per-slice routing blocks
    ps_ref,  # (PS_ROWS, SB) block
    sg_in_ref,  # (SG_ROWS, NCH)
    sp_in_ref,  # (SP_ROWS, NCH)
    aux_ref,  # (AUX_ROWS, NCH)
    imp_in_ref,  # (IMP_ROWS, B)
    v_out_ref,  # (SG_ROWS? no: 8*L, NCH) velocity rows out
    p_out_ref,  # (SP_ROWS, NCH)
    imp_out_ref,  # (IMP_ROWS, B)
    SG, SP, IMP, DEP,  # scratch
    *,
    n_substeps, n_iters, n_slices, sb, angular_mode, gravity,
):
    s = pl.program_id(0)
    p = pl.program_id(1)
    sl = pl.program_id(2)
    PH = 2 + n_iters
    m2 = 2 * sb
    nch = SG.shape[1]
    h = hscal_ref[0, 0]
    inv_h = hscal_ref[0, 1]
    lin_scale = hscal_ref[0, 2]
    ang_scale = hscal_ref[0, 3]

    @pl.when((s == 0) & (p == 0) & (sl == 0))
    def _():
        SG[:] = sg_in_ref[:]
        SP[:] = sp_in_ref[:]
        IMP[:] = imp_in_ref[:]

    def t_of(ref, c):
        return ref[c * L : (c + 1) * L, :]

    # ---- substep boundary: pose integration (s>0), gravity, world-inertia refresh.
    @pl.when((p == 1) & (sl == 0))
    def _():
        _pose_vel_inertia_block(
            SG, SP, aux_ref, h, lin_scale, ang_scale, gravity, angular_mode, s
        )

    # ---- per-slice routing masks
    hi_lane = hi_lane_ref[0]
    lo_lane = lo_lane_ref[0]
    hi_sub = hi_sub_ref[0]
    scale2 = scale_ref[0, 0]
    oh_g = (jax.lax.broadcasted_iota(jnp.int32, (nch, m2), 0) == hi_lane).astype(
        jnp.bfloat16
    )
    oh_s = (jax.lax.broadcasted_iota(jnp.int32, (m2, nch), 1) == hi_sub).astype(
        jnp.bfloat16
    )
    oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (L, m2), 0) == lo_lane).astype(
        jnp.float32
    )
    ps = ps_ref[:]

    def gather(rows):
        W = _mm3(rows, oh_g)
        W3 = W.reshape(rows.shape[0] // L, L, m2)
        return jnp.sum(W3 * oh_lo[None, :, :], axis=1)

    def scatter_deltas(dva_l, dva_a, dvb_l, dvb_a):
        za = jnp.zeros_like(dva_l.x)
        zb = jnp.zeros_like(dvb_l.x)
        d_a = jnp.stack([dva_l.x, dva_l.y, dva_l.z, dva_a.x, dva_a.y, dva_a.z, za, za])
        d_b = jnp.stack([dvb_l.x, dvb_l.y, dvb_l.z, dvb_a.x, dvb_a.y, dvb_a.z, zb, zb])
        d_rows = jnp.concatenate([d_a, d_b], axis=1) / scale2[None, :]
        dexp = (d_rows[:, None, :] * oh_lo[None, :, :]).reshape(8 * L, m2)
        dV = _mm3(dexp, oh_s)
        SG[0 : 8 * L, :] = SG[0 : 8 * L, :] + dV

    def dep_rows():
        blk = DEP[:, pl.ds(sl * sb, sb)]
        return [blk[k] for k in range(4)]

    def sides16():
        G = gather(SG[:])
        ga = G[:, :sb]
        gb = G[:, sb:]
        sa = scale2[:sb]
        sb_ = scale2[sb:]
        va = BodyVel(Vec3(ga[0], ga[1], ga[2]), Vec3(ga[3], ga[4], ga[5]))
        vb = BodyVel(Vec3(gb[0], gb[1], gb[2]), Vec3(gb[3], gb[4], gb[5]))
        ia_im = ga[8] * sa
        ia_ii = Sym3(*(ga[9 + j] * sa for j in range(6)))
        ib_im = gb[8] * sb_
        ib_ii = Sym3(*(gb[9 + j] * sb_ for j in range(6)))
        return va, vb, ia_im, ia_ii, ib_im, ib_ii

    # ---- phase 0: incremental depth update (substeps > 0)
    @pl.when((p == 0) & (s > 0))
    def _():
        Gv = gather(SG[0 : 8 * L, :])
        va = BodyVel(Vec3(Gv[0, :sb], Gv[1, :sb], Gv[2, :sb]),
                     Vec3(Gv[3, :sb], Gv[4, :sb], Gv[5, :sb]))
        vb = BodyVel(Vec3(Gv[0, sb:], Gv[1, sb:], Gv[2, sb:]),
                     Vec3(Gv[3, sb:], Gv[4, sb:], Gv[5, sb:]))
        new_dep = _inc_depth_rows(ps, dep_rows(), va, vb, h)
        DEP[:, pl.ds(sl * sb, sb)] = jnp.stack(new_dep)

    # ---- phase 1 at substep 0: initialize the depth scratch from the prestep rows.
    @pl.when((p == 1) & (s == 0))
    def _():
        DEP[:, pl.ds(sl * sb, sb)] = jnp.stack([ps[PS_DEPTH + k] for k in range(4)])

    # ---- phase 1: warm start
    @pl.when(p == 1)
    def _():
        va, vb, ia_im, ia_ii, ib_im, ib_ii = sides16()
        imp_blk = IMP[:, pl.ds(sl * sb, sb)]
        imp_rows = [imp_blk[r] for r in range(IMP_ROWS)]
        dva, dvb = _warm_start_rows(ps, dep_rows(), imp_rows, ia_im, ia_ii, ib_im, ib_ii)
        scatter_deltas(dva[0], dva[1], dvb[0], dvb[1])

    # ---- phases 2+: velocity iterations
    @pl.when(p >= 2)
    def _():
        va, vb, ia_im, ia_ii, ib_im, ib_ii = sides16()
        imp_blk = IMP[:, pl.ds(sl * sb, sb)]
        imp_rows = [imp_blk[r] for r in range(IMP_ROWS)]
        new_imp, dva, dvb = _solve_contact_rows(
            ps, dep_rows(), imp_rows, ia_im, ia_ii, ib_im, ib_ii, va, vb, inv_h
        )
        IMP[:, pl.ds(sl * sb, sb)] = jnp.stack(new_imp)
        scatter_deltas(dva[0], dva[1], dvb[0], dvb[1])

    @pl.when((s == n_substeps - 1) & (p == PH - 1) & (sl == n_slices - 1))
    def _():
        v_out_ref[:] = SG[0 : 8 * L, :]
        p_out_ref[:] = SP[:]
        imp_out_ref[:] = IMP[:]


def solve_substeps_contacts(
    v6,  # (NB, 6)
    pos, orn,  # Vec3, Quat of (NB,)
    inv_mass,  # (NB,)
    local_inv_inertia,  # Sym3 of (NB,)
    grav_mask,  # (NB,) bool: dynamic & awake
    integ_mask,  # (NB,) bool: integrable
    ps_t,  # (PS_ROWS, B)
    imp_t,  # (IMP_ROWS, B)
    idx2,  # (n_slices*2SB,)
    scale,  # (n_slices*2SB,)
    h, inv_h, lin_scale, ang_scale,
    *,
    nch: int,
    sb: int,
    n_substeps: int,
    n_iters: int,
    angular_mode: int,
    gravity: tuple,
    interpret: bool = False,
):
    """Run the ENTIRE substepped contact solve (incremental depth update, pose/velocity
    integration, warm start, velocity iterations) as one Pallas program. Returns
    (v6', pos', orn', imp_t')."""
    B = ps_t.shape[1]
    n_slices = B // sb
    m2 = 2 * sb
    nb = v6.shape[0]

    hi = (idx2 // L).astype(jnp.int32).reshape(n_slices, 1, m2)
    lo = (idx2 % L).astype(jnp.int32).reshape(n_slices, 1, m2)
    hi_sub = hi.reshape(n_slices, m2, 1)
    scale_r = scale.astype(jnp.float32).reshape(n_slices, 1, m2)
    hscal = jnp.stack(
        [
            jnp.asarray(h, jnp.float32),
            jnp.asarray(inv_h, jnp.float32),
            jnp.asarray(lin_scale, jnp.float32),
            jnp.asarray(ang_scale, jnp.float32),
        ]
    ).reshape(1, 4)

    sg_in = jnp.zeros((SG_ROWS, nch), jnp.float32)
    sg_in = sg_in.at[0 : 8 * L, :].set(pack_state_v(v6, nch))
    pose14 = jnp.stack([pos.x, pos.y, pos.z, orn.x, orn.y, orn.z, orn.w], -1)
    sp_in = _pack_rows8(pose14, nch)
    mcode = grav_mask.astype(jnp.float32) + 2.0 * integ_mask.astype(jnp.float32)
    aux14 = jnp.stack(
        [
            inv_mass,
            local_inv_inertia.xx, local_inv_inertia.yx, local_inv_inertia.yy,
            local_inv_inertia.zx, local_inv_inertia.zy, local_inv_inertia.zz,
            mcode,
        ],
        -1,
    )
    aux_in = _pack_rows8(aux14, nch)

    kernel = functools.partial(
        _substeps_kernel,
        n_substeps=n_substeps,
        n_iters=n_iters,
        n_slices=n_slices,
        sb=sb,
        angular_mode=angular_mode,
        gravity=gravity,
    )
    grid = (n_substeps, 2 + n_iters, n_slices)
    v_out, p_out, imp_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m2), lambda s, p, q: (q, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m2), lambda s, p, q: (q, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m2, 1), lambda s, p, q: (q, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m2), lambda s, p, q: (q, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PS_ROWS, sb), lambda s, p, q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((SG_ROWS, nch), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SP_ROWS, nch), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AUX_ROWS, nch), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IMP_ROWS, B), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8 * L, nch), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SP_ROWS, nch), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IMP_ROWS, B), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8 * L, nch), jnp.float32),
            jax.ShapeDtypeStruct((SP_ROWS, nch), jnp.float32),
            jax.ShapeDtypeStruct((IMP_ROWS, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SG_ROWS, nch), jnp.float32),
            pltpu.VMEM((SP_ROWS, nch), jnp.float32),
            pltpu.VMEM((IMP_ROWS, B), jnp.float32),
            pltpu.VMEM((4, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(hscal, hi, lo, hi_sub, scale_r, ps_t, sg_in, sp_in, aux_in, imp_t)

    v6_new = unpack_state_v(v_out, nb)
    pose_out = _unpack_rows8(p_out, nb)
    pos_new = Vec3(pose_out[:, 0], pose_out[:, 1], pose_out[:, 2])
    orn_new = Quat(pose_out[:, 3], pose_out[:, 4], pose_out[:, 5], pose_out[:, 6])
    return v6_new, pos_new, orn_new, imp_out


def _pack_rows8(cols, nch):
    """(NB, <=8) columns -> (8*L, NCH) transposed rows."""
    nb = cols.shape[0]
    c8 = jnp.pad(cols, ((0, nch * L - nb), (0, 8 - cols.shape[1])))
    return c8.reshape(nch, L, 8).transpose(2, 1, 0).reshape(8 * L, nch)


def _unpack_rows8(rows, nb):
    """(8*L, NCH) -> (NB, 8)."""
    nch = rows.shape[1]
    return rows.reshape(8, L, nch).transpose(2, 1, 0).reshape(nch * L, 8)[:nb]


# --------------------------------------------------------------------------------------
# transposed-layout helpers (XLA side)

def pack_state_v(v6, nch):
    """(NB, 6) velocities -> (NVC*L, NCH) transposed state (pad comps to 8)."""
    nb = v6.shape[0]
    v8 = jnp.pad(v6, ((0, nch * L - nb), (0, NVC - v6.shape[1])))
    return v8.reshape(nch, L, NVC).transpose(2, 1, 0).reshape(NVC * L, nch)


def unpack_state_v(vt, nb):
    """(NVC*L, NCH) -> (NB, 6)."""
    nch = vt.shape[1]
    v8 = vt.reshape(NVC, L, nch).transpose(2, 1, 0).reshape(nch * L, NVC)
    return v8[:nb, :6]


def pack_state_t(table14, nch):
    """(NB, 14) body context -> (NTC*L, NCH)."""
    nb = table14.shape[0]
    t16 = jnp.pad(table14, ((0, nch * L - nb), (0, NTC - table14.shape[1])))
    return t16.reshape(nch, L, NTC).transpose(2, 1, 0).reshape(NTC * L, nch)


def pack_contact_prestep(ps, springiness):
    """Bucketed row-major ContactPrestep (+precomputed springiness triple) ->
    (PS_ROWS, B) component-major block."""
    err_vel, cfm, soft = springiness
    rows = [
        ps.normal.x, ps.normal.y, ps.normal.z,
        ps.offset_a.x[:, 0], ps.offset_a.x[:, 1], ps.offset_a.x[:, 2], ps.offset_a.x[:, 3],
        ps.offset_a.y[:, 0], ps.offset_a.y[:, 1], ps.offset_a.y[:, 2], ps.offset_a.y[:, 3],
        ps.offset_a.z[:, 0], ps.offset_a.z[:, 1], ps.offset_a.z[:, 2], ps.offset_a.z[:, 3],
        ps.offset_b.x, ps.offset_b.y, ps.offset_b.z,
        ps.depth[:, 0], ps.depth[:, 1], ps.depth[:, 2], ps.depth[:, 3],
        ps.contact_mask[:, 0].astype(jnp.float32),
        ps.contact_mask[:, 1].astype(jnp.float32),
        ps.contact_mask[:, 2].astype(jnp.float32),
        ps.contact_mask[:, 3].astype(jnp.float32),
        ps.friction,
        err_vel, cfm, soft,
        ps.max_recovery_velocity,
        ps.valid.astype(jnp.float32),
    ]
    return jnp.stack(rows)


def pack_contact_prestep_cols(ps, springiness):
    """Column-stacked (B, PS_ROWS) variant of pack_contact_prestep.

    Row-major packing exists so the WHOLE prestep can ride one wide row
    gather/scatter through the per-step relayouts (page-exec permutation, windowed
    scatter) instead of ~30 separate capacity-sized passes — at 16k bodies those
    passes WERE the step (profiled ~1.2-1.6 ms each on v5e). ``matrix.T`` of the
    final layout yields exactly pack_contact_prestep's (PS_ROWS, B) kernel feed."""
    err_vel, cfm, soft = springiness
    cols = [
        ps.normal.x, ps.normal.y, ps.normal.z,
        ps.offset_a.x[:, 0], ps.offset_a.x[:, 1], ps.offset_a.x[:, 2], ps.offset_a.x[:, 3],
        ps.offset_a.y[:, 0], ps.offset_a.y[:, 1], ps.offset_a.y[:, 2], ps.offset_a.y[:, 3],
        ps.offset_a.z[:, 0], ps.offset_a.z[:, 1], ps.offset_a.z[:, 2], ps.offset_a.z[:, 3],
        ps.offset_b.x, ps.offset_b.y, ps.offset_b.z,
        ps.depth[:, 0], ps.depth[:, 1], ps.depth[:, 2], ps.depth[:, 3],
        ps.contact_mask[:, 0].astype(jnp.float32),
        ps.contact_mask[:, 1].astype(jnp.float32),
        ps.contact_mask[:, 2].astype(jnp.float32),
        ps.contact_mask[:, 3].astype(jnp.float32),
        ps.friction,
        err_vel, cfm, soft,
        ps.max_recovery_velocity,
        ps.valid.astype(jnp.float32),
    ]
    return jnp.stack(cols, axis=-1)


def pack_contact_impulses_cols(imp):
    """Column-stacked (B, IMP_ROWS) variant of pack_contact_impulses."""
    z = jnp.zeros_like(imp.twist)
    return jnp.stack(
        [
            imp.penetration[:, 0], imp.penetration[:, 1],
            imp.penetration[:, 2], imp.penetration[:, 3],
            imp.tangent.x, imp.tangent.y, imp.twist, z,
        ],
        axis=-1,
    )


def pack_contact_impulses(imp):
    """Row-major ContactImpulses -> (IMP_ROWS, B)."""
    z = jnp.zeros_like(imp.twist)
    return jnp.stack(
        [
            imp.penetration[:, 0], imp.penetration[:, 1],
            imp.penetration[:, 2], imp.penetration[:, 3],
            imp.tangent.x, imp.tangent.y, imp.twist, z,
        ]
    )


def unpack_contact_impulses(imp_t, imp_like):
    """(IMP_ROWS, B) -> ContactImpulses matching ``imp_like``'s structure."""
    pen = jnp.stack([imp_t[0], imp_t[1], imp_t[2], imp_t[3]], -1)
    return imp_like._replace(
        penetration=pen,
        tangent=imp_like.tangent._replace(x=imp_t[4], y=imp_t[5]),
        twist=imp_t[6],
    )



# --------------------------------------------------------------------------------------
# Windowed-state kernels: the >8k-body variants. The full-width one-hot routing costs
# rows × bodies MACs (every slice routes against every chunk column), which dies above
# ~8k bodies. Here each slice routes only against a WINDOW of the permuted velocity
# state: FOUR 128-column segments (solver/windowing.py — appendix + three Morton blocks
# for narrow slices; appendix + blockA + blockB for wide Morton-seam slices), so the
# per-slice routing cost is constant at any body count. Replicating non-dynamic state
# into the appendix is sound: the solver never writes it (zero inverse mass/inertia ⇒
# zero deltas). Reference identity: the solve loop has no size cliff
# (Solver_Solve.cs:297-654).

IT_ROWS = 16  # A: im ixx iyx iyy izx izy izz pad | B: same — jacobi-prescaled
IMPD_ROWS = 16  # mega-win per-slice state: 8 impulse rows + 4 depth rows + 4 pad
WSEG = 4  # window segments per slice
WSEG_COLS = 128  # columns per segment (= windowing.GCOLS = windowing.BLK // L)
NWIN = WSEG * WSEG_COLS  # window columns per slice


def _win_view(ref, seg_refs, s, nrows):
    """Concatenate the slice's four 128-col window segments of ref, shape (rows, NCH).
    The reads go THROUGH the ref with a dynamic lane start: Mosaic has no value-level
    dynamic_slice lowering inside cond branches on TPU (measured: NotImplementedError
    at 16k bodies), but aligned dynamic-start ref loads lower fine — pl.multiple_of
    supplies the 128-lane alignment proof."""
    parts = []
    for k in range(WSEG):
        ws = pl.multiple_of(jnp.maximum(seg_refs[k][s], 0), 128)
        parts.append(ref[0:nrows, pl.ds(ws, WSEG_COLS)])
    return jnp.concatenate(parts, axis=1)


def _win_scatter_add(V, seg_refs, s, dV):
    """Add dV (rows, NWIN) back into the first dV.shape[0] rows of ref V through the
    slice's segments. Duplicate segments are safe: rows index exactly one segment
    position, so a duplicated segment's dV region is identically zero."""
    nr = dV.shape[0]
    for k in range(WSEG):
        ws = pl.multiple_of(jnp.maximum(seg_refs[k][s], 0), 128)
        cur = V[0:nr, pl.ds(ws, WSEG_COLS)]
        V[0:nr, pl.ds(ws, WSEG_COLS)] = (
            cur + dV[:, k * WSEG_COLS : (k + 1) * WSEG_COLS]
        )


def _contact_sweep_win_kernel(
    hscal_ref,  # (1, 2) SMEM: h, inv_h
    seg0_ref,  # (n_slices,) SMEM int32 segment start columns; seg0 == -1 = dead slice
    seg1_ref,
    seg2_ref,
    seg3_ref,
    hi_lane_ref,  # (1, 2SB) int32 block — WINDOW-relative chunk column per row side
    lo_lane_ref,  # (1, 2SB) int32 block
    hi_sub_ref,  # (2SB, 1) int32 block
    scale_ref,  # (1, 2SB) f32 block
    ps_ref,  # (PS_ROWS, SB) f32 block
    it_ref,  # (IT_ROWS, SB) f32 block — per-row streamed inertia context
    v_in_ref,  # (NVC*L, NCH) f32 full
    imp_in_ref,  # (IMP_ROWS, B) f32 full
    v_out_ref,  # (NVC*L, NCH) f32 full
    imp_out_ref,  # (IMP_ROWS, B) f32 full
    v_scratch,  # (NVC*L, NCH) f32
    imp_scratch,  # (IMP_ROWS, B) f32
    *,
    n_slices,
    n_iters,
    sb,
):
    it = pl.program_id(0)
    s = pl.program_id(1)
    first = (it == 0) & (s == 0)
    last = (it == n_iters - 1) & (s == n_slices - 1)
    segs = (seg0_ref, seg1_ref, seg2_ref, seg3_ref)

    @pl.when(first)
    def _():
        v_scratch[:] = v_in_ref[:]
        imp_scratch[:] = imp_in_ref[:]

    @pl.when(seg0_ref[s] >= 0)
    def _():
        m2 = 2 * sb
        inv_h = hscal_ref[0, 1]

        hi_lane = hi_lane_ref[0]  # (1, 2SB) window-relative
        lo_lane = lo_lane_ref[0]
        hi_sub = hi_sub_ref[0]  # (2SB, 1)
        scale2 = scale_ref[0, 0]  # (2SB,)

        oh_g = (
            jax.lax.broadcasted_iota(jnp.int32, (NWIN, m2), 0) == hi_lane
        ).astype(jnp.bfloat16)
        oh_s = (
            jax.lax.broadcasted_iota(jnp.int32, (m2, NWIN), 1) == hi_sub
        ).astype(jnp.bfloat16)
        oh_lo = (
            jax.lax.broadcasted_iota(jnp.int32, (L, m2), 0) == lo_lane
        ).astype(jnp.float32)

        win = _win_view(v_scratch, segs, s, NVC * L)  # (NVC*L, NWIN)
        W = _mm3(win, oh_g)  # (NVC*L, 2SB)
        W3 = W.reshape(NVC, L, m2)
        G = jnp.sum(W3 * oh_lo[None, :, :], axis=1)  # (NVC, 2SB)

        ga = G[:, :sb]
        gb = G[:, sb:]
        va = BodyVel(Vec3(ga[0], ga[1], ga[2]), Vec3(ga[3], ga[4], ga[5]))
        vb = BodyVel(Vec3(gb[0], gb[1], gb[2]), Vec3(gb[3], gb[4], gb[5]))

        itb = it_ref[:]  # (IT_ROWS, SB) — already jacobi-prescaled
        ia_im = itb[0]
        ia_ii = Sym3(*(itb[1 + j] for j in range(6)))
        ib_im = itb[8]
        ib_ii = Sym3(*(itb[9 + j] for j in range(6)))

        ps = ps_ref[:]
        imp_blk = imp_scratch[:, pl.ds(s * sb, sb)]
        imp_rows = [imp_blk[r] for r in range(IMP_ROWS)]

        new_imp, (dva_l, dva_a), (dvb_l, dvb_a) = _solve_contact_rows(
            ps,
            [ps[PS_DEPTH + k] for k in range(4)],
            imp_rows,
            ia_im,
            ia_ii,
            ib_im,
            ib_ii,
            va,
            vb,
            inv_h,
        )

        imp_scratch[:, pl.ds(s * sb, sb)] = jnp.stack(new_imp)

        za = jnp.zeros_like(dva_l.x)
        zb = jnp.zeros_like(dvb_l.x)
        d_a = jnp.stack([dva_l.x, dva_l.y, dva_l.z, dva_a.x, dva_a.y, dva_a.z, za, za])
        d_b = jnp.stack([dvb_l.x, dvb_l.y, dvb_l.z, dvb_a.x, dvb_a.y, dvb_a.z, zb, zb])
        d_rows = jnp.concatenate([d_a, d_b], axis=1)  # (8, 2SB)
        d_rows = d_rows / scale2[None, :]
        dexp = (d_rows[:, None, :] * oh_lo[None, :, :]).reshape(NVC * L, m2)
        dV = _mm3(dexp, oh_s)  # (NVC*L, NWIN)
        _win_scatter_add(v_scratch, segs, s, dV)

    @pl.when(last)
    def _():
        v_out_ref[:] = v_scratch[:]
        imp_out_ref[:] = imp_scratch[:]


def contact_sweep_win(
    vt,  # (NVC*L, NCH) f32 transposed PERMUTED velocities (appendix + morton layout)
    it_t,  # (IT_ROWS, B) f32 jacobi-prescaled per-row inertia, windowed-exec order
    ps_t,  # (PS_ROWS, B) f32 prestep in windowed-exec row order (B = n_slices*SB)
    imp_t,  # (IMP_ROWS, B) f32 impulses, same order
    whi2,  # (B2,) int32 WINDOW-relative chunk column per row side (slice-major, A|B)
    lo2,  # (B2,) int32 lane-in-chunk per row side
    scale,  # (B2,) f32 jacobi scale per row side
    wseg,  # (n_slices, WSEG) int32 segment start columns (128-aligned); [:,0]=-1 dead
    h,
    inv_h,
    *,
    sb: int,
    n_iters: int,
    interpret: bool = False,
):
    """Windowed Gauss-Seidel sweeps: grid (n_iters, n_slices), velocities VMEM-resident
    across all slices/iterations, per-slice routing limited to NWIN window columns."""
    nch = vt.shape[1]
    B = ps_t.shape[1]
    n_slices = B // sb
    m2 = 2 * sb

    hi = whi2.astype(jnp.int32).reshape(n_slices, 1, m2)
    lo = lo2.astype(jnp.int32).reshape(n_slices, 1, m2)
    hi_sub = hi.reshape(n_slices, m2, 1)
    scale_r = scale.astype(jnp.float32).reshape(n_slices, 1, m2)
    hscal = jnp.asarray([h, inv_h], jnp.float32).reshape(1, 2)

    kernel = functools.partial(
        _contact_sweep_win_kernel,
        n_slices=n_slices,
        n_iters=n_iters,
        sb=sb,
    )

    grid = (n_iters, n_slices)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m2), lambda it, s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m2), lambda it, s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m2, 1), lambda it, s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m2), lambda it, s: (s, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (PS_ROWS, sb), lambda it, s: (0, s), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (IT_ROWS, sb), lambda it, s: (0, s), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((NVC * L, nch), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IMP_ROWS, B), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NVC * L, nch), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IMP_ROWS, B), lambda it, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((NVC * L, nch), jnp.float32),
            jax.ShapeDtypeStruct((IMP_ROWS, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((NVC * L, nch), jnp.float32),
            pltpu.VMEM((IMP_ROWS, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        hscal,
        wseg[:, 0].astype(jnp.int32),
        wseg[:, 1].astype(jnp.int32),
        wseg[:, 2].astype(jnp.int32),
        wseg[:, 3].astype(jnp.int32),
        hi,
        lo,
        hi_sub,
        scale_r,
        ps_t,
        it_t,
        vt,
        imp_t,
    )


def pack_inertia_rows(g2a, g2b):
    """Jacobi-prescaled inertia halves (B, 7) [im + world inv inertia 6] ->
    (IT_ROWS, B) streamed inertia block."""
    z = jnp.zeros_like(g2a[:, 0])
    return jnp.stack(
        [g2a[:, 0], g2a[:, 1], g2a[:, 2], g2a[:, 3], g2a[:, 4], g2a[:, 5], g2a[:, 6],
         z,
         g2b[:, 0], g2b[:, 1], g2b[:, 2], g2b[:, 3], g2b[:, 4], g2b[:, 5], g2b[:, 6],
         z]
    )


# --------------------------------------------------------------------------------------
# Windowed whole-solve mega kernel: the entire substepped contact solve (incremental
# depth update, pose/velocity integration, world-inertia refresh, warm start, velocity
# iterations) in ONE pallas_call over the PERMUTED body layout, each slice routing
# through its 4-segment window. This is the full-width _substeps_kernel without the
# size cliff: per-slice cost is constant in the body count.


def _pose_vel_inertia_block(SG, SP, aux_ref, h, lin_scale, ang_scale, gravity,
                            angular_mode, s):
    """Substep-boundary body update on the FULL column set: pose integrate (s>0),
    gravity + damping, world-inverse-inertia refresh into SG rows 8..15. Shared by the
    full-width and windowed mega kernels (same math as integrator.py)."""
    def t_of(ref, c):
        return ref[c * L : (c + 1) * L, :]

    aux = aux_ref[:]
    im_row = aux[0:L, :]
    from ..integrator import (
        ANGULAR_CONSERVE_MOMENTUM,
        ANGULAR_CONSERVE_WITH_GYROSCOPIC,
        integrate_angular_conserve_momentum,
        integrate_angular_gyroscopic,
    )

    loc = Sym3(*(aux[(1 + j) * L : (2 + j) * L, :] for j in range(6)))
    mcode = aux[7 * L : 8 * L, :]
    gmask = jnp.mod(mcode, 2.0) > 0.5
    imask = mcode >= 2.0

    @pl.when(s > 0)
    def _():
        pos = Vec3(t_of(SP, 0), t_of(SP, 1), t_of(SP, 2))
        orn = Quat(t_of(SP, 3), t_of(SP, 4), t_of(SP, 5), t_of(SP, 6))
        vel = Vec3(t_of(SG, 0), t_of(SG, 1), t_of(SG, 2))
        omg = Vec3(t_of(SG, 3), t_of(SG, 4), t_of(SG, 5))
        new_pos = (pos + vel * h).where(imask, pos)
        new_orn_i = integrate_orientation(orn, omg, h)
        new_orn = new_orn_i.where(imask, orn)
        SP[0 * L : 1 * L, :] = new_pos.x
        SP[1 * L : 2 * L, :] = new_pos.y
        SP[2 * L : 3 * L, :] = new_pos.z
        SP[3 * L : 4 * L, :] = new_orn.x
        SP[4 * L : 5 * L, :] = new_orn.y
        SP[5 * L : 6 * L, :] = new_orn.z
        SP[6 * L : 7 * L, :] = new_orn.w
        if angular_mode == ANGULAR_CONSERVE_MOMENTUM:
            world_new = loc.rotation_sandwich(new_orn.to_matrix())
            omg_c = integrate_angular_conserve_momentum(orn, loc, world_new, omg)
            omg_n = omg_c.where(imask & gmask, omg)
            SG[3 * L : 4 * L, :] = omg_n.x
            SG[4 * L : 5 * L, :] = omg_n.y
            SG[5 * L : 6 * L, :] = omg_n.z
        elif angular_mode == ANGULAR_CONSERVE_WITH_GYROSCOPIC:
            omg_c = integrate_angular_gyroscopic(new_orn, loc, omg, h)
            omg_n = omg_c.where(imask & gmask, omg)
            SG[3 * L : 4 * L, :] = omg_n.x
            SG[4 * L : 5 * L, :] = omg_n.y
            SG[5 * L : 6 * L, :] = omg_n.z

    # Gravity + damping (velocity integration; reads re-issued after the pose
    # block's omega writes).
    vel = Vec3(t_of(SG, 0), t_of(SG, 1), t_of(SG, 2))
    omg = Vec3(t_of(SG, 3), t_of(SG, 4), t_of(SG, 5))
    gx, gy, gz = gravity
    new_vel = Vec3(
        (vel.x + gx * h) * lin_scale,
        (vel.y + gy * h) * lin_scale,
        (vel.z + gz * h) * lin_scale,
    ).where(gmask, vel)
    new_omg = (omg * ang_scale).where(gmask, omg)
    SG[0 * L : 1 * L, :] = new_vel.x
    SG[1 * L : 2 * L, :] = new_vel.y
    SG[2 * L : 3 * L, :] = new_vel.z
    SG[3 * L : 4 * L, :] = new_omg.x
    SG[4 * L : 5 * L, :] = new_omg.y
    SG[5 * L : 6 * L, :] = new_omg.z

    # World inverse inertia from the (possibly updated) orientation.
    orn = Quat(t_of(SP, 3), t_of(SP, 4), t_of(SP, 5), t_of(SP, 6))
    w = loc.rotation_sandwich(orn.to_matrix())
    base = 8 * L
    SG[base + 0 * L : base + 1 * L, :] = im_row
    SG[base + 1 * L : base + 2 * L, :] = w.xx
    SG[base + 2 * L : base + 3 * L, :] = w.yx
    SG[base + 3 * L : base + 4 * L, :] = w.yy
    SG[base + 4 * L : base + 5 * L, :] = w.zx
    SG[base + 5 * L : base + 6 * L, :] = w.zy
    SG[base + 6 * L : base + 7 * L, :] = w.zz


def _win_substeps_kernel(
    hscal_ref,  # (1, 4) SMEM: h, inv_h, lin_scale, ang_scale
    seg0_ref, seg1_ref, seg2_ref, seg3_ref,  # (n_slices,) SMEM int32 window segments
    hi_lane_ref, lo_lane_ref, hi_sub_ref, scale_ref,  # per-slice routing blocks
    ps_ref,  # (PS_ROWS, SB) block
    sg_in_ref,  # (SG_ROWS, NCH) — permuted layout
    sp_in_ref,  # (SP_ROWS, NCH)
    aux_ref,  # (AUX_ROWS, NCH)
    impd_in_ref,  # (IMPD_ROWS, SB) BLOCKED per slice:
    # rows 0-7 accumulated impulses, rows 8-11 incremental depths. I/O streams in
    # slice blocks while the LIVE state persists in the IMPD scratch — a single
    # whole-bank resident instead of the former three (in + out + scratch), which is
    # what fits 64k+ banks in v5e's 128 MB VMEM (the old layout wanted 154 MB).
    v_out_ref,  # (8*L, NCH)
    p_out_ref,  # (SP_ROWS, NCH)
    impd_out_ref,  # (IMPD_ROWS, SB) blocked; written from scratch on the final visit
    SG, SP, IMPD,  # scratch (IMPD: (IMPD_ROWS, B) whole-bank state)
    *,
    n_substeps, n_iters, n_slices, sb, angular_mode, gravity,
):
    s = pl.program_id(0)
    p = pl.program_id(1)
    sl = pl.program_id(2)
    PH = 2 + n_iters
    m2 = 2 * sb
    h = hscal_ref[0, 0]
    inv_h = hscal_ref[0, 1]
    lin_scale = hscal_ref[0, 2]
    ang_scale = hscal_ref[0, 3]
    segs = (seg0_ref, seg1_ref, seg2_ref, seg3_ref)

    @pl.when((s == 0) & (p == 0) & (sl == 0))
    def _():
        SG[:] = sg_in_ref[:]
        SP[:] = sp_in_ref[:]

    # First visit of each slice seeds its scratch region from the streamed-in block;
    # the LAST visit flushes it to the streamed-out block (earlier visits write stale
    # windows to the same region, each overwritten by a later visit — the final one
    # is authoritative).
    @pl.when((s == 0) & (p == 0))
    def _():
        IMPD[:, pl.ds(sl * sb, sb)] = impd_in_ref[:]

    # ---- substep boundary: pose integration (s>0), gravity, world-inertia refresh.
    @pl.when((p == 1) & (sl == 0))
    def _():
        _pose_vel_inertia_block(
            SG, SP, aux_ref, h, lin_scale, ang_scale, gravity, angular_mode, s
        )

    live = segs[0][sl] >= 0

    # ---- per-slice routing masks (window-relative)
    hi_lane = hi_lane_ref[0]
    lo_lane = lo_lane_ref[0]
    hi_sub = hi_sub_ref[0]
    scale2 = scale_ref[0, 0]
    oh_g = (jax.lax.broadcasted_iota(jnp.int32, (NWIN, m2), 0) == hi_lane).astype(
        jnp.bfloat16
    )
    oh_s = (jax.lax.broadcasted_iota(jnp.int32, (m2, NWIN), 1) == hi_sub).astype(
        jnp.bfloat16
    )
    oh_lo = (jax.lax.broadcasted_iota(jnp.int32, (L, m2), 0) == lo_lane).astype(
        jnp.float32
    )
    ps = ps_ref[:]

    def gather(nr):
        win = _win_view(SG, segs, sl, nr)
        W = _mm3(win, oh_g)
        W3 = W.reshape(nr // L, L, m2)
        return jnp.sum(W3 * oh_lo[None, :, :], axis=1)

    def scatter_deltas(dva_l, dva_a, dvb_l, dvb_a):
        za = jnp.zeros_like(dva_l.x)
        zb = jnp.zeros_like(dvb_l.x)
        d_a = jnp.stack([dva_l.x, dva_l.y, dva_l.z, dva_a.x, dva_a.y, dva_a.z, za, za])
        d_b = jnp.stack([dvb_l.x, dvb_l.y, dvb_l.z, dvb_a.x, dvb_a.y, dvb_a.z, zb, zb])
        d_rows = jnp.concatenate([d_a, d_b], axis=1) / scale2[None, :]
        dexp = (d_rows[:, None, :] * oh_lo[None, :, :]).reshape(NVC * L, m2)
        dV = _mm3(dexp, oh_s)
        _win_scatter_add(SG, segs, sl, dV)

    def dep_rows():
        blk = IMPD[:, pl.ds(sl * sb, sb)]
        return [blk[8 + k] for k in range(4)]

    def sides16():
        G = gather(SG.shape[0])
        ga = G[:, :sb]
        gb = G[:, sb:]
        sa = scale2[:sb]
        sb_ = scale2[sb:]
        va = BodyVel(Vec3(ga[0], ga[1], ga[2]), Vec3(ga[3], ga[4], ga[5]))
        vb = BodyVel(Vec3(gb[0], gb[1], gb[2]), Vec3(gb[3], gb[4], gb[5]))
        ia_im = ga[8] * sa
        ia_ii = Sym3(*(ga[9 + j] * sa for j in range(6)))
        ib_im = gb[8] * sb_
        ib_ii = Sym3(*(gb[9 + j] * sb_ for j in range(6)))
        return va, vb, ia_im, ia_ii, ib_im, ib_ii

    # ---- phase 0: incremental depth update (substeps > 0). Depth rows were
    # pre-filled from the prestep by the caller, so no s==0 init phase exists.
    @pl.when((p == 0) & (s > 0) & live)
    def _():
        Gv = gather(8 * L)
        va = BodyVel(Vec3(Gv[0, :sb], Gv[1, :sb], Gv[2, :sb]),
                     Vec3(Gv[3, :sb], Gv[4, :sb], Gv[5, :sb]))
        vb = BodyVel(Vec3(Gv[0, sb:], Gv[1, sb:], Gv[2, sb:]),
                     Vec3(Gv[3, sb:], Gv[4, sb:], Gv[5, sb:]))
        new_dep = _inc_depth_rows(ps, dep_rows(), va, vb, h)
        IMPD[8:12, pl.ds(sl * sb, sb)] = jnp.stack(new_dep)

    # ---- phase 1: warm start
    @pl.when((p == 1) & live)
    def _():
        va, vb, ia_im, ia_ii, ib_im, ib_ii = sides16()
        imp_blk = IMPD[:, pl.ds(sl * sb, sb)]
        imp_rows = [imp_blk[r] for r in range(IMP_ROWS)]
        dva, dvb = _warm_start_rows(ps, dep_rows(), imp_rows, ia_im, ia_ii, ib_im, ib_ii)
        scatter_deltas(dva[0], dva[1], dvb[0], dvb[1])

    # ---- phases 2+: velocity iterations
    @pl.when((p >= 2) & live)
    def _():
        va, vb, ia_im, ia_ii, ib_im, ib_ii = sides16()
        imp_blk = IMPD[:, pl.ds(sl * sb, sb)]
        imp_rows = [imp_blk[r] for r in range(IMP_ROWS)]
        new_imp, dva, dvb = _solve_contact_rows(
            ps, dep_rows(), imp_rows, ia_im, ia_ii, ib_im, ib_ii, va, vb, inv_h
        )
        IMPD[0:IMP_ROWS, pl.ds(sl * sb, sb)] = jnp.stack(new_imp)
        scatter_deltas(dva[0], dva[1], dvb[0], dvb[1])

    # Final visit of each slice: flush its state block to the streamed output.
    @pl.when((s == n_substeps - 1) & (p == PH - 1))
    def _():
        impd_out_ref[:] = IMPD[:, pl.ds(sl * sb, sb)]

    @pl.when((s == n_substeps - 1) & (p == PH - 1) & (sl == n_slices - 1))
    def _():
        v_out_ref[:] = SG[0 : 8 * L, :]
        p_out_ref[:] = SP[:]


def solve_substeps_contacts_win(
    v6p,  # (NP, 6) PERMUTED velocities (solver/windowing.py layout)
    pos_p, orn_p,  # Vec3, Quat of (NP,) permuted
    inv_mass_p,  # (NP,)
    local_inv_inertia_p,  # Sym3 of (NP,)
    grav_mask_p,  # (NP,) bool
    integ_mask_p,  # (NP,) bool
    ps_t,  # (PS_ROWS, B) windowed-exec order
    imp_t,  # (IMPD_ROWS, B): rows 0-7 impulses, 8-11 initial depths (= prestep depth)
    whi2,  # (n_slices*2SB,) window-relative chunk columns (slice-major, A|B)
    wlo2,  # lanes
    scale,  # jacobi scales
    wseg,  # (n_slices, WSEG) segment start columns
    h, inv_h, lin_scale, ang_scale,
    *,
    nch: int,
    sb: int,
    n_substeps: int,
    n_iters: int,
    angular_mode: int,
    gravity: tuple,
    interpret: bool = False,
):
    """Windowed variant of solve_substeps_contacts: the ENTIRE substepped contact solve
    as one Pallas program over the permuted body layout. Returns permuted
    (v6', pos', orn', impd_t') — impulse rows are impd_t'[:8]. The impulse+depth state
    streams per-slice (blocked, aliased in/out), so VMEM use is independent of the bank
    size — the whole-bank residents failed to compile at 64k (154 MB vs 128 MB)."""
    B = ps_t.shape[1]
    n_slices = B // sb
    m2 = 2 * sb
    np_ = v6p.shape[0]

    hi = whi2.astype(jnp.int32).reshape(n_slices, 1, m2)
    lo = wlo2.astype(jnp.int32).reshape(n_slices, 1, m2)
    hi_sub = hi.reshape(n_slices, m2, 1)
    scale_r = scale.astype(jnp.float32).reshape(n_slices, 1, m2)
    hscal = jnp.stack(
        [
            jnp.asarray(h, jnp.float32),
            jnp.asarray(inv_h, jnp.float32),
            jnp.asarray(lin_scale, jnp.float32),
            jnp.asarray(ang_scale, jnp.float32),
        ]
    ).reshape(1, 4)

    sg_in = jnp.zeros((SG_ROWS, nch), jnp.float32)
    sg_in = sg_in.at[0 : 8 * L, :].set(pack_state_v(v6p, nch))
    pose14 = jnp.stack(
        [pos_p.x, pos_p.y, pos_p.z, orn_p.x, orn_p.y, orn_p.z, orn_p.w], -1
    )
    sp_in = _pack_rows8(pose14, nch)
    mcode = grav_mask_p.astype(jnp.float32) + 2.0 * integ_mask_p.astype(jnp.float32)
    aux14 = jnp.stack(
        [
            inv_mass_p,
            local_inv_inertia_p.xx, local_inv_inertia_p.yx, local_inv_inertia_p.yy,
            local_inv_inertia_p.zx, local_inv_inertia_p.zy, local_inv_inertia_p.zz,
            mcode,
        ],
        -1,
    )
    aux_in = _pack_rows8(aux14, nch)

    kernel = functools.partial(
        _win_substeps_kernel,
        n_substeps=n_substeps,
        n_iters=n_iters,
        n_slices=n_slices,
        sb=sb,
        angular_mode=angular_mode,
        gravity=gravity,
    )
    grid = (n_substeps, 2 + n_iters, n_slices)
    v_out, p_out, imp_out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, m2), lambda s, p, q: (q, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m2), lambda s, p, q: (q, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m2, 1), lambda s, p, q: (q, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, m2), lambda s, p, q: (q, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((PS_ROWS, sb), lambda s, p, q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((SG_ROWS, nch), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SP_ROWS, nch), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((AUX_ROWS, nch), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IMPD_ROWS, sb), lambda s, p, q: (0, q), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8 * L, nch), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((SP_ROWS, nch), lambda s, p, q: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((IMPD_ROWS, sb), lambda s, p, q: (0, q), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8 * L, nch), jnp.float32),
            jax.ShapeDtypeStruct((SP_ROWS, nch), jnp.float32),
            jax.ShapeDtypeStruct((IMPD_ROWS, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((SG_ROWS, nch), jnp.float32),
            pltpu.VMEM((SP_ROWS, nch), jnp.float32),
            pltpu.VMEM((IMPD_ROWS, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        hscal,
        wseg[:, 0].astype(jnp.int32),
        wseg[:, 1].astype(jnp.int32),
        wseg[:, 2].astype(jnp.int32),
        wseg[:, 3].astype(jnp.int32),
        hi, lo, hi_sub, scale_r, ps_t, sg_in, sp_in, aux_in, imp_t,
    )

    v6_new = unpack_state_v(v_out, np_)
    pose_out = _unpack_rows8(p_out, np_)
    pos_new = Vec3(pose_out[:, 0], pose_out[:, 1], pose_out[:, 2])
    orn_new = Quat(pose_out[:, 3], pose_out[:, 4], pose_out[:, 5], pose_out[:, 6])
    return v6_new, pos_new, orn_new, imp_out
