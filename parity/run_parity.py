"""Trajectory-parity harness (BASELINE.json: "trajectories within tolerance of the C#
reference over 1,000 steps").

The C# reference CANNOT run in this environment: no dotnet runtime is installed and the
sandbox has zero network egress, so `dotnet build` of /root/reference is impossible.
This harness substitutes the strongest oracle available offline, in two tiers:

1. **Closed-form physics** — exact analytic trajectories for the ballistic phase under
   the engine's per-substep semi-implicit Euler (position after k substeps of gravity g,
   step h: y = y0 + h^2 g k(k+1)/2 + ...), and the exact rest state (contact depth at
   equilibrium from the TGS spring constants).
2. **Independent scalar reimplementation** — a from-scratch NumPy transcription of the
   reference's substepped TGS contact solve for the SimpleSelfContainedDemo
   configuration (one sphere on a static box), written directly from the reference
   equations (PenetrationLimit.cs bias/softness/accumulated-clamp,
   SpringSettings.ComputeSpringiness, Solver_Solve.cs substep order: incremental depth
   update -> pose integrate -> velocity integrate -> warm start -> velocity
   iterations -> final pose integrate). It shares no code with the JAX engine, so a
   sign/jacobian/order error in either implementation breaks the envelope.

Output: PARITY_TRAJ.json with per-phase max-deviation envelopes over 1,000 steps.
Run: python parity/run_parity.py   (CPU or TPU)
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DT = 1.0 / 60.0
SUBSTEPS = 8
STEPS = 1000
GRAVITY = -10.0
RADIUS = 0.5
DROP_Y = 2.0
# Engine defaults (bodies.py BodyDescription): 30 Hz, damping ratio 1, max recovery 2.
FREQ_HZ = 30.0
DAMPING = 1.0
MAX_RECOVERY = 2.0


def scalar_reference():
    """Independent scalar TGS: one dynamic sphere vs the static plane y=0."""
    h = DT / SUBSTEPS
    inv_h = 1.0 / h
    w = 2.0 * np.pi * FREQ_HZ
    two_zeta = 2.0 * DAMPING
    w_h = w * h
    err_to_vel = w / (w_h + two_zeta)
    extra = 1.0 / (w_h * (w_h + two_zeta))
    cfm = 1.0 / (1.0 + extra)
    softness = extra * cfm

    y = DROP_Y
    v = 0.0
    acc = 0.0  # accumulated penetration impulse (per-substep estimate)
    inv_m = 1.0
    ys = np.zeros(STEPS, np.float64)
    vs = np.zeros(STEPS, np.float64)
    for step in range(STEPS):
        # Narrow phase at step start: depth along +y (normal points plane -> sphere).
        depth0 = RADIUS - y
        margin = abs(v) * DT  # speculative accept band (relative speed * dt)
        have_contact = depth0 > -max(margin, 0.05)
        depth = depth0
        for s in range(SUBSTEPS):
            if s > 0:
                # incremental depth update from relative contact velocity, then pose.
                depth = depth - v * h  # d(depth)/dt = -n·v_sphere
                y = y + v * h
            v = v + GRAVITY * h
            if have_contact:
                # warm start: re-apply accumulated impulse
                v = v + acc * inv_m
                # one velocity iteration (reference PenetrationLimit solve)
                bias = min(depth * inv_h, depth * err_to_vel, MAX_RECOVERY)
                eff = cfm / inv_m  # unit-mass linear effective mass
                csv = v  # n·(v_sphere - v_static)
                negated_csi = acc * softness + (csv - bias) * eff
                new_acc = max(0.0, acc - negated_csi)
                v = v + (new_acc - acc) * inv_m
                acc = new_acc
            else:
                acc = 0.0
        y = y + v * h
        ys[step] = y
        vs[step] = v
    return ys, vs


def engine_trajectory():
    from bepuphysics2_tpu import (
        BodyDescription, Box, SimConfig, Simulation, Sphere, StaticDescription,
    )

    sim = Simulation(
        SimConfig(
            body_capacity=8, max_pairs=8, substeps=SUBSTEPS, num_colors=2,
            enable_sleep=False,
        )
    )
    ground = sim.add_shape(Box(50.0, 0.5, 50.0))
    sim.add_static(StaticDescription(position=(0.0, -0.5, 0.0), shape=ground))
    s = Sphere(RADIUS)
    ss = sim.add_shape(s)
    ball = sim.add_body(BodyDescription.dynamic((0.0, DROP_Y, 0.0), ss, 1.0, s))
    ys = np.zeros(STEPS, np.float64)
    vs = np.zeros(STEPS, np.float64)
    for i in range(STEPS):
        sim.timestep(DT)
        pos, _, vel, _ = sim.get_body(ball)
        ys[i] = pos[1]
        vs[i] = vel[1]
    return ys, vs


def closed_form_ballistic(n_steps):
    """Exact per-substep semi-implicit Euler ballistic trajectory."""
    h = DT / SUBSTEPS
    y = DROP_Y
    v = 0.0
    out = np.zeros(n_steps, np.float64)
    for i in range(n_steps):
        for s in range(SUBSTEPS):
            if s > 0:
                y += v * h
            v += GRAVITY * h
        y += v * h
        out[i] = y
    return out


def main():
    ys_ref, vs_ref = scalar_reference()
    ys_eng, vs_eng = engine_trajectory()

    # Phase split: ballistic until first contact (ref), then settling, then rest.
    first_contact = int(np.argmax(ys_ref < RADIUS + 0.05))
    rest_from = min(STEPS - 1, first_contact + 120)

    ball_n = max(1, first_contact - 2)
    cf = closed_form_ballistic(ball_n)
    env = {
        "steps": STEPS,
        "config": "SimpleSelfContainedDemo analogue: sphere(r=0.5) drop 2m onto static box, 60Hz, 8 substeps",
        "oracle": (
            "independent scalar TGS reimplementation (dotnet unavailable in this "
            "environment: no .NET runtime, zero egress — documented in run_parity.py)"
        ),
        "ballistic_steps": ball_n,
        "ballistic_max_dev_vs_closed_form": float(np.max(np.abs(ys_eng[:ball_n] - cf))),
        "ballistic_max_dev_ref_vs_closed_form": float(np.max(np.abs(ys_ref[:ball_n] - cf))),
        "settling_max_dev": float(
            np.max(np.abs(ys_eng[first_contact:rest_from] - ys_ref[first_contact:rest_from]))
        ),
        "rest_dev": float(np.max(np.abs(ys_eng[rest_from:] - ys_ref[rest_from:]))),
        "rest_height_engine": float(ys_eng[-1]),
        "rest_height_reference": float(ys_ref[-1]),
        "velocity_max_dev_after_settle": float(np.max(np.abs(vs_eng[rest_from:] - vs_ref[rest_from:]))),
    }
    env["pass"] = bool(
        env["ballistic_max_dev_vs_closed_form"] < 1e-3
        and env["settling_max_dev"] < 0.02
        and env["rest_dev"] < 5e-3
        and env["velocity_max_dev_after_settle"] < 1e-2
    )
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "PARITY_TRAJ.json")
    with open(os.path.abspath(out), "w") as f:
        json.dump(env, f, indent=2)
    print(json.dumps(env, indent=2))


if __name__ == "__main__":
    main()
