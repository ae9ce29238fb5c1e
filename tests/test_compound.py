"""Compound & mesh collidable tests (reference Compound/Mesh demos; NewtDemo intent)."""
import numpy as np
import pytest

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


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
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


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_mesh_ramp_rolls_ball():
    sim = Simulation(
        SimConfig(
            body_capacity=32, max_pairs=64, substeps=4, num_colors=4,
            max_compound_pairs=16, children_per_pair=8, child_window=16,
        )
    )
    s = Sphere(0.4)
    ss = sim.add_shape(s)
    # Winding matters: mesh triangles are one-sided (contacts only on the side the
    # winding normal faces, reference Triangle semantics); these wind upward.
    ramp = Mesh.build([
        ((-3, 0, -3), (3, 1.0, 3), (3, 1.0, -3)),
        ((-3, 0, -3), (-3, 0, 3), (3, 1.0, 3)),
    ])
    rs = sim.add_shape(ramp)
    sim.add_static(StaticDescription(position=(0.0, 0.0, 0), shape=rs))
    ball = sim.add_body(BodyDescription.dynamic((2.0, 2.5, 0), ss, 1.0, s))
    sim.run(120, 1 / 60.0)
    pos, _, vel, _ = sim.get_body(ball)
    assert pos[0] < 2.0, f"ball should roll down the ramp (-x): {pos}"
    assert pos[1] > 0.0, f"ball fell through the mesh: {pos}"


def test_compound_builder_inertia():
    """CompoundBuilder parallel-axis inertia: two point-ish spheres at ±d on x behave
    like the analytic dumbbell (reference CompoundBuilder.cs + InertiaTensorTests)."""
    from bepuphysics2_tpu.shapes.builder import CompoundBuilder

    sim = Simulation(SimConfig(body_capacity=8, max_pairs=8, substeps=2, num_colors=2))
    r, m, d = 0.1, 1.0, 0.5
    b = CompoundBuilder(sim)
    b.add(Sphere(r), (-d, 0, 0), m)
    b.add(Sphere(r), (d, 0, 0), m)
    children, inv_mass, inv6, com = b.build()
    assert abs(inv_mass - 0.5) < 1e-6
    assert np.allclose(com, (0, 0, 0), atol=1e-9)
    # About y/z: I = 2(2/5 m r² + m d²); about x: I = 2·2/5 m r².
    i_sphere = 0.4 * m * r * r
    iy = 2 * (i_sphere + m * d * d)
    ix = 2 * i_sphere
    assert abs(inv6[0] - 1.0 / ix) / (1.0 / ix) < 1e-4, inv6
    assert abs(inv6[2] - 1.0 / iy) / (1.0 / iy) < 1e-4, inv6
    assert abs(inv6[5] - 1.0 / iy) / (1.0 / iy) < 1e-4, inv6


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_mesh_one_sided():
    """Mesh triangles are one-sided: a ball flung up at a floor mesh from BELOW passes
    through (back face), while one dropped from above rests on it."""
    sim = Simulation(
        SimConfig(
            body_capacity=32, max_pairs=64, substeps=4, num_colors=4,
            max_compound_pairs=16, children_per_pair=8, child_window=16,
            enable_sleep=False,
        )
    )
    s = Sphere(0.3)
    ss = sim.add_shape(s)
    floor = Mesh.build([
        ((-3, 2, -3), (3, 2, 3), (3, 2, -3)),   # upward winding, plane y=2
        ((-3, 2, -3), (-3, 2, 3), (3, 2, 3)),
    ])
    fs = sim.add_shape(floor)
    sim.add_static(StaticDescription(position=(0, 0, 0), shape=fs))
    above = sim.add_body(BodyDescription.dynamic((0.5, 4.0, 0.5), ss, 1.0, s))
    below = sim.add_body(
        BodyDescription.dynamic((-0.5, 0.0, -0.5), ss, 1.0, s, velocity=(0, 9.0, 0))
    )
    sim.run(60, 1 / 60.0)
    pa, _, _, _ = sim.get_body(above)
    pb, _, _, _ = sim.get_body(below)
    assert pa[1] > 2.2, f"ball from above fell through the mesh: {pa}"
    assert pb[1] > 2.31 or pb[1] < 2.0, f"ball from below was stopped by a back face: {pb}"


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_compound_vs_compound():
    """Two compound dumbbells stack on each other (reference CompoundPairCollisionTask)."""
    sim = Simulation(
        SimConfig(
            body_capacity=32, max_pairs=64, substeps=4, num_colors=4,
            max_compound_pairs=16, children_per_pair=8, child_window=16,
            max_cc_pairs=4, cc_children_per_side=4,
        )
    )
    g = sim.add_shape(Box(20.0, 0.5, 20.0))
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    bx = Box(0.4, 0.4, 0.4)
    bs = sim.add_shape(bx)
    comp = Compound.build([(bs, (-0.5, 0, 0)), (bs, (0.5, 0, 0))])
    cs = sim.add_shape(comp)
    ii = (1.0, 0.0, 1.0, 0.0, 0.0, 1.0)
    lo = sim.add_body(BodyDescription(position=(0, 0.5, 0), shape=cs, inv_mass=0.5,
                                      inv_inertia=ii, kind=KIND_DYNAMIC))
    hi = sim.add_body(BodyDescription(position=(0.05, 1.5, 0.0), shape=cs, inv_mass=0.5,
                                      inv_inertia=ii, kind=KIND_DYNAMIC))
    sim.run(240, 1 / 60.0)
    plo, _, vlo, _ = sim.get_body(lo)
    phi, _, vhi, _ = sim.get_body(hi)
    assert not bool(sim.last_diag.overflow), "cc expansion overflowed"
    assert 0.3 < plo[1] < 0.5, f"bottom dumbbell rest height wrong: {plo}"
    assert 1.0 < phi[1] < 1.4, f"top dumbbell should rest on the bottom one: {phi}"
    assert np.linalg.norm(vhi) < 0.2, f"top dumbbell still moving: {vhi}"


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_big_mesh_cluster_acceleration():
    """800-triangle mesh floor: the clustered child prefilter (ShapeData.cl_* — the
    reference's embedded mesh BVH analogue) must find the supporting triangles anywhere
    on the mesh without overflow, with children_per_pair far below the triangle count."""
    import jax.numpy as jnp

    tris = []
    for i in range(20):
        for j in range(20):
            x0, z0 = i - 10.0, j - 10.0
            tris.append(((x0, 0, z0), (x0, 0, z0 + 1), (x0 + 1, 0, z0)))
            tris.append(((x0 + 1, 0, z0), (x0, 0, z0 + 1), (x0 + 1, 0, z0 + 1)))
    sim = Simulation(
        SimConfig(body_capacity=16, max_pairs=32, substeps=4, num_colors=4,
                  max_compound_pairs=8, children_per_pair=16)
    )
    mesh = sim.add_shape(Mesh.build(tris))
    s = Sphere(0.5)
    ss = sim.add_shape(s)
    sim.add_static(StaticDescription(position=(0, 0, 0), shape=mesh))
    b = sim.add_body(BodyDescription.dynamic((7.3, 2.0, -6.2), ss, 1.0, s))
    ovf = False
    for _ in range(120):
        sim.timestep(1 / 60.0)
        ovf = ovf or bool(sim.last_diag.overflow)
    pos = sim.get_body(b)[0]
    assert abs(pos[1] - 0.5) < 0.03, f"ball fell through the far corner: y={pos[1]}"
    assert not ovf
