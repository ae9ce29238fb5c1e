"""Simulation scrambling — randomized add/remove/kind-change chaos while stepping
(reference Demos/SpecializedTests/SimulationScrambling.cs: shake out bookkeeping bugs in
slot recycling, constraint maps, wake propagation). After every burst the full validation
battery must pass (validation.validate — the reference's Debug assert walls)."""
import numpy as np
import pytest

from bepuphysics2_tpu import (
    BodyDescription, Box, SimConfig, Simulation, Sphere, StaticDescription, validate,
)

pytestmark = pytest.mark.slow  # see pytest.ini: extra full-step compiles



def test_scrambled_bookkeeping_survives():
    rng = np.random.default_rng(42)
    sim = Simulation(
        SimConfig(body_capacity=24, max_pairs=96, substeps=2, num_colors=2,
                  sleep_time=0.3, joint_capacity=16)
    )
    g = sim.add_shape(Box(20.0, 0.5, 20.0))
    s = Sphere(0.4)
    ss = sim.add_shape(s)
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))

    live_bodies = []
    live_joints = []

    def add_body():
        if len(live_bodies) >= 16:
            return
        p = (rng.uniform(-3, 3), rng.uniform(0.5, 4.0), rng.uniform(-3, 3))
        h = sim.add_body(BodyDescription.dynamic(p, ss, 1.0, s))
        live_bodies.append(h)

    def remove_body():
        if not live_bodies:
            return
        h = live_bodies.pop(rng.integers(len(live_bodies)))
        # Constraints referencing the body must go first (reference requires the same).
        for j in [j for j in live_joints if h in j[1]]:
            sim.remove_constraint(j[0])
            live_joints.remove(j)
        sim.remove_body(h)

    def add_joint():
        if len(live_bodies) < 2 or len(live_joints) >= 8:
            return
        a, b = rng.choice(live_bodies, size=2, replace=False)
        hj = sim.add_constraint(
            "ball_socket", [int(a), int(b)],
            local_offset_a=(0.0, 0.3, 0.0), local_offset_b=(0.0, -0.3, 0.0),
        )
        live_joints.append((hj, (int(a), int(b))))

    def remove_joint():
        if not live_joints:
            return
        j = live_joints.pop(rng.integers(len(live_joints)))
        sim.remove_constraint(j[0])

    def flip_kind():
        if not live_bodies:
            return
        h = int(rng.choice(live_bodies))
        sim.set_body_kind(h, 2)  # kinematic
        sim.set_body_kind(h, 1)  # back to dynamic

    def kick():
        if not live_bodies:
            return
        h = int(rng.choice(live_bodies))
        sim.set_velocity(h, linear=tuple(rng.normal(size=3) * 2.0))

    ops = [add_body, add_body, remove_body, add_joint, remove_joint, flip_kind, kick]
    for round_i in range(12):
        for _ in range(4):
            ops[rng.integers(len(ops))]()
        sim.run(6, 1 / 60.0)
        validate(sim)  # full invariant battery every burst

    # End state is still steppable and deterministic-resumable.
    blob = sim.save_checkpoint()
    sim.run(12, 1 / 60.0)
    sim._sync_from_device()
    after1 = np.stack([sim._host.px, sim._host.py, sim._host.pz])
    sim.load_checkpoint(blob)
    sim.run(12, 1 / 60.0)
    sim._sync_from_device()
    after2 = np.stack([sim._host.px, sim._host.py, sim._host.pz])
    np.testing.assert_array_equal(after1, after2)
