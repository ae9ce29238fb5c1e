"""Compound & mesh collidable tests (reference Compound/Mesh demos; NewtDemo intent)."""
import numpy as np

from bepuphysics2_tpu import (
    BodyDescription,
    Box,
    KIND_DYNAMIC,
    Mesh,
    SimConfig,
    Simulation,
    Sphere,
    StaticDescription,
)
from bepuphysics2_tpu.shapes import Compound


def test_compound_dumbbell_rests():
    sim = Simulation(
        SimConfig(
            body_capacity=32, max_pairs=64, substeps=4, num_colors=4,
            max_compound_pairs=16, children_per_pair=8, child_window=16,
        )
    )
    g = sim.add_shape(Box(20.0, 0.5, 20.0))
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    s = Sphere(0.4)
    ss = sim.add_shape(s)
    bar = Box(0.5, 0.1, 0.1)
    bars = sim.add_shape(bar)
    comp = Compound.build([(ss, (-0.6, 0, 0)), (ss, (0.6, 0, 0)), (bars, (0, 0, 0))])
    cs = sim.add_shape(comp)
    d = sim.add_body(
        BodyDescription(
            position=(0, 2.0, 0), shape=cs, inv_mass=1.0,
            inv_inertia=(2.0, 0.0, 2.0, 0.0, 0.0, 2.0), kind=KIND_DYNAMIC,
        )
    )
    sim.run(200, 1 / 60.0)
    pos, orn, vel, om = sim.get_body(d)
    assert 0.3 < pos[1] < 0.55, f"dumbbell rest height wrong: {pos}"
    assert np.linalg.norm(vel) < 0.1, f"dumbbell still moving: {vel}"


def test_mesh_ramp_rolls_ball():
    sim = Simulation(
        SimConfig(
            body_capacity=32, max_pairs=64, substeps=4, num_colors=4,
            max_compound_pairs=16, children_per_pair=8, child_window=16,
        )
    )
    s = Sphere(0.4)
    ss = sim.add_shape(s)
    ramp = Mesh.build([
        ((-3, 0, -3), (3, 1.0, -3), (3, 1.0, 3)),
        ((-3, 0, -3), (3, 1.0, 3), (-3, 0, 3)),
    ])
    rs = sim.add_shape(ramp)
    sim.add_static(StaticDescription(position=(0.0, 0.0, 0), shape=rs))
    ball = sim.add_body(BodyDescription.dynamic((2.0, 2.5, 0), ss, 1.0, s))
    sim.run(120, 1 / 60.0)
    pos, _, vel, _ = sim.get_body(ball)
    assert pos[0] < 2.0, f"ball should roll down the ramp (-x): {pos}"
    assert pos[1] > 0.0, f"ball fell through the mesh: {pos}"
