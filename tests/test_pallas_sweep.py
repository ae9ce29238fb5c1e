"""Pallas color-sweep kernel equivalence vs the XLA solver path.

The kernel (ops/sweep.py) must reproduce the XLA bucketed solve: same color layout,
same math, routing exact by construction (bf16x3 one-hot). Run the same scene through
both backends (kernel in interpreter mode on CPU) and compare trajectories."""
import numpy as np
import pytest

import bepuphysics2_tpu as bp


def _pile_sim(backend):
    sim = bp.Simulation(
        bp.SimConfig(
            body_capacity=64,
            max_pairs=256,
            substeps=2,
            num_colors=4,
            velocity_iterations=2,
            solver_backend=backend,
            enable_sleep=False,
        )
    )
    ground = sim.add_shape(bp.Box(20.0, 0.5, 20.0))
    sim.add_static(bp.StaticDescription(position=(0, -0.5, 0), shape=ground))
    s = bp.Sphere(0.5)
    ss = sim.add_shape(s)
    b = bp.Box(0.4, 0.4, 0.4)
    bs = sim.add_shape(b)
    rng = np.random.default_rng(11)
    for i in range(24):
        x, z = rng.uniform(-1.2, 1.2, 2)
        y = 0.6 + 0.85 * (i // 8)
        if i % 2 == 0:
            sim.add_body(bp.BodyDescription.dynamic((x, y, z), ss, 1.0, s))
        else:
            sim.add_body(bp.BodyDescription.dynamic((x, y, z), bs, 1.0, b))
    return sim


def _states(sim):
    sim._sync_from_device()
    h = sim._host
    return np.stack([h.px, h.py, h.pz]), np.stack([h.vx, h.vy, h.vz])


def test_pallas_matches_xla_pile():
    sim_x = _pile_sim("xla")
    sim_p = _pile_sim("pallas")
    dt = 1 / 60.0
    sim_x.run(20, dt)
    sim_p.run(20, dt)
    px, vx = _states(sim_x)
    pp, vp = _states(sim_p)
    # Math is identical; only f32 op ordering differs inside the kernel. After 20
    # frames of stacked contact, positions must agree tightly.
    assert np.max(np.abs(px - pp)) < 5e-3, np.max(np.abs(px - pp))
    assert np.median(np.abs(px - pp)) < 1e-4
    # No NaNs, bodies settled onto/near the ground plane.
    assert np.isfinite(pp).all() and np.isfinite(vp).all()
    # Dynamic bodies (slot 0 is the static ground) stay above the ground plane.
    assert (pp[1][1:25] > -0.2).all()
