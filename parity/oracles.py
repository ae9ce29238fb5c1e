"""Independent scalar TGS oracles for trajectory parity.

Each oracle is a from-scratch NumPy implementation of the substepped TGS solve for ONE
scene, written directly from the reference's constraint equations (PenetrationLimit.cs,
TangentFriction.cs, TwistFriction.cs, BallSocketShared.cs, SpringSettings.cs:37,
Solver_Solve.cs substep order). They deliberately share NO code with the JAX engine —
different basis choices, different state layout, scalar loops — so a jacobian sign,
effective-mass, or ordering error in either implementation breaks the envelope instead
of cancelling out.

Conventions (mirroring the physical setup, not the engine's internal pair order):
- the dynamic body is "A"; the static ground/anchor is "B" (zero inverse mass/inertia),
  so only A's velocities evolve;
- contact normal n = +y (plane → sphere), contact offset r_c = contact − center_A;
- friction tangent basis t1=(1,0,0), t2=(0,0,1) — friction outcomes are basis-invariant,
  so the oracle's basis need not match the engine's build_orthonormal_basis.
"""
from __future__ import annotations

import numpy as np

DT = 1.0 / 60.0
GRAVITY = -10.0


def springiness(freq_hz, damping, h):
    """SpringSettings.ComputeSpringiness (reference SpringSettings.cs:37-57)."""
    w = 2.0 * np.pi * freq_hz
    two_zeta = 2.0 * damping
    w_h = w * h
    err_to_vel = w / (w_h + two_zeta)
    extra = 1.0 / (w_h * (w_h + two_zeta))
    cfm = 1.0 / (1.0 + extra)
    softness = extra * cfm
    return err_to_vel, cfm, softness


def _cross(a, b):
    return np.array([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


def sliding_sphere_oracle(
    v0x,
    spin0y,
    mu,
    radius=0.5,
    y0=None,
    steps=1000,
    substeps=8,
    iters=1,
    freq_hz=30.0,
    damping=1.0,
    max_recovery=2.0,
):
    """Sphere sliding+spinning on the plane y=0: penetration + 2-DOF tangent friction +
    twist friction, substepped TGS. Returns per-step arrays (pos(3), vel(3), omega(3)).

    Physics checks this enables (independent of either implementation):
    - sliding → rolling: v_x settles at 5/7·v0x for a solid sphere (angular momentum
      about the contact line), independent of μ;
    - twist: ω_y decays toward 0 under the twist-friction cap, never flips sign.
    """
    h = DT / substeps
    inv_h = 1.0 / h
    err_to_vel, cfm, softness = springiness(freq_hz, damping, h)

    m = 1.0
    inv_m = 1.0 / m
    i_loc = 0.4 * m * radius * radius  # solid sphere
    inv_i = 1.0 / i_loc  # isotropic → world == local at any orientation

    if y0 is None:
        y0 = radius
    pos = np.array([0.0, y0, 0.0])
    vel = np.array([v0x, 0.0, 0.0])
    omg = np.array([0.0, spin0y, 0.0])

    n = np.array([0.0, 1.0, 0.0])
    t1 = np.array([1.0, 0.0, 0.0])
    t2 = np.array([0.0, 0.0, 1.0])

    # Accumulated impulses persist across frames (pair-cache warm start carry).
    pen = 0.0
    tan = np.zeros(2)
    twist = 0.0

    out_p = np.zeros((steps, 3))
    out_v = np.zeros((steps, 3))
    out_w = np.zeros((steps, 3))
    for step in range(steps):
        # ---- narrow phase (per frame): single contact below the center.
        depth = radius - pos[1]
        margin = max(abs(vel[1]) * DT, 0.05)
        live = depth > -margin
        if not live:
            pen = 0.0
            tan[:] = 0.0
            twist = 0.0
        r_c = np.array([0.0, -radius, 0.0])  # contact offset from center (fixed per frame)
        ang_pen = _cross(r_c, n)  # rA × n (pen jacobian, angular row on A)
        ang_t1 = _cross(r_c, t1)
        ang_t2 = _cross(r_c, t2)

        for s in range(substeps):
            if s > 0:
                # incremental depth update: d -= n·(vA + ωA×rA)·h, then pose integrate.
                cv = vel + _cross(omg, r_c)
                depth -= float(np.dot(n, cv)) * h
                pos = pos + vel * h
                # orientation not tracked: sphere inertia is isotropic.
            vel = vel + np.array([0.0, GRAVITY, 0.0]) * h

            if live:
                # ---- warm start: re-apply accumulated (pen, tangent, twist).
                tw_w = t1 * tan[0] + t2 * tan[1]
                lin = tw_w + n * pen
                ang = _cross(r_c, tw_w) + ang_pen * pen + n * twist
                vel = vel + lin * inv_m
                omg = omg + ang * inv_i

                for _ in range(iters):
                    # ---- penetration (PenetrationLimit solve).
                    inv_eff = inv_m + inv_i * float(np.dot(ang_pen, ang_pen))
                    eff = cfm / inv_eff
                    bias = min(depth * inv_h, depth * err_to_vel, max_recovery)
                    csv = float(np.dot(n, vel) + np.dot(ang_pen, omg))
                    negated_csi = pen * softness + (csv - bias) * eff
                    new_pen = max(0.0, pen - negated_csi)
                    corr = new_pen - pen
                    pen = new_pen
                    vel = vel + n * (corr * inv_m)
                    omg = omg + ang_pen * (corr * inv_i)

                    # ---- tangent friction (2x2 block at the contact).
                    m11 = inv_m + inv_i * float(np.dot(ang_t1, ang_t1))
                    m22 = inv_m + inv_i * float(np.dot(ang_t2, ang_t2))
                    m12 = inv_i * float(np.dot(ang_t1, ang_t2))
                    det = m11 * m22 - m12 * m12
                    # violating velocity: −(vA·t + ωA·(rA×t)) (B static)
                    csv1 = -(float(np.dot(vel, t1)) + float(np.dot(omg, ang_t1)))
                    csv2 = -(float(np.dot(vel, t2)) + float(np.dot(omg, ang_t2)))
                    ci1 = (m22 * csv1 - m12 * csv2) / det
                    ci2 = (m11 * csv2 - m12 * csv1) / det
                    cand = tan + np.array([ci1, ci2])
                    cap = mu * pen
                    mag = float(np.linalg.norm(cand))
                    if mag > cap:
                        cand *= cap / max(mag, 1e-16)
                    corr_t = cand - tan
                    tan = cand
                    tw_w = t1 * corr_t[0] + t2 * corr_t[1]
                    vel = vel + tw_w * inv_m
                    omg = omg + _cross(r_c, tw_w) * inv_i

                    # ---- twist friction (angular about n); single-contact lever =
                    # pen · max(depth, 0) (ContactConvexTypes Contact1 solve).
                    inv_eff_tw = inv_i  # n·I⁻¹·n, isotropic
                    eff_tw = 1.0 / inv_eff_tw
                    cap_tw = mu * pen * max(0.0, depth)
                    csv_tw = float(np.dot(omg, n))
                    cand_tw = np.clip(twist - csv_tw * eff_tw, -cap_tw, cap_tw)
                    corr_tw = cand_tw - twist
                    twist = cand_tw
                    omg = omg + n * (corr_tw * inv_i)

        pos = pos + vel * h
        out_p[step] = pos
        out_v[step] = vel
        out_w[step] = omg
    return out_p, out_v, out_w


def pendulum_oracle(
    length=1.0,
    radius=0.2,
    steps=1000,
    substeps=8,
    iters=1,
    freq_hz=30.0,
    damping=1.0,
):
    """Ball-socket pendulum: dynamic sphere bob, static anchor at the origin, bob starts
    at (L, 0, 0) with the socket at the origin. Scalar TGS of the 3-DOF ball socket
    (BallSocketShared.Solve): csv = −(vB + ωB×rB) with A static; bias = error·err_to_vel,
    error = posB + rB − anchor; impulse applied as ΔvB = −i/m, ΔωB = I⁻¹(i×rB).

    The bob's local offset (−L,0,0) rotates with its orientation, so the oracle tracks
    the quaternion (sphere inertia is isotropic; orientation only steers the arm)."""
    h = DT / substeps
    err_to_vel, cfm, softness = springiness(freq_hz, damping, h)

    m = 1.0
    inv_m = 1.0 / m
    i_loc = 0.4 * m * radius * radius
    inv_i = 1.0 / i_loc

    pos = np.array([length, 0.0, 0.0])
    orn = np.array([0.0, 0.0, 0.0, 1.0])  # x y z w
    vel = np.zeros(3)
    omg = np.zeros(3)
    local_off = np.array([-length, 0.0, 0.0])
    acc = np.zeros(3)

    def rotate(q, v):
        x, y, z, w = q
        u = np.array([x, y, z])
        return 2.0 * np.dot(u, v) * u + (w * w - np.dot(u, u)) * v + 2.0 * w * _cross(u, v)

    def integrate_orn(q, w_vec, dt):
        wx, wy, wz = w_vec * (dt * 0.5)
        dq = np.array([
            wx * q[3] + wy * q[2] - wz * q[1],
            -wx * q[2] + wy * q[3] + wz * q[0],
            wx * q[1] - wy * q[0] + wz * q[3],
            -wx * q[0] - wy * q[1] - wz * q[2],
        ])
        q = q + dq
        return q / np.linalg.norm(q)

    out_p = np.zeros((steps, 3))
    out_v = np.zeros((steps, 3))
    for step in range(steps):
        for s in range(substeps):
            if s > 0:
                pos = pos + vel * h
                orn = integrate_orn(orn, omg, h)
            vel = vel + np.array([0.0, GRAVITY, 0.0]) * h

            r_b = rotate(orn, local_off)
            # warm start
            vel = vel - acc * inv_m
            omg = omg + _cross(acc, r_b) * inv_i

            for _ in range(iters):
                # inverse effective mass: invM·I + skew(rB)·I⁻¹·skew(rB)ᵀ (isotropic I⁻¹):
                # skew_sandwich(r) with isotropic inv_i = inv_i·(|r|²·I − r rᵀ)
                rr = np.outer(r_b, r_b)
                inv_eff = inv_m * np.eye(3) + inv_i * (np.dot(r_b, r_b) * np.eye(3) - rr)
                eff = cfm * np.linalg.inv(inv_eff)
                error = pos + r_b  # anchor at origin with zero offset
                bias = error * err_to_vel
                csv = -(vel + _cross(omg, r_b))
                corrective = eff @ (bias - csv) - acc * softness
                acc = acc + corrective
                vel = vel - corrective * inv_m
                omg = omg + _cross(corrective, r_b) * inv_i
        pos = pos + vel * h
        orn = integrate_orn(orn, omg, h)
        out_p[step] = pos
        out_v[step] = vel
    return out_p, out_v
