"""Scene query tests: ray casts (single + batched), volume query, sweep, checkpointing."""
import numpy as np
import pytest

from bepuphysics2_tpu import (
    BodyDescription,
    Box,
    Capsule,
    Cylinder,
    SimConfig,
    Simulation,
    Sphere,
    StaticDescription,
)


def make_scene():
    sim = Simulation(SimConfig(body_capacity=32, max_pairs=64, substeps=2, num_colors=2))
    shapes = {
        "sphere": (sim.add_shape(Sphere(0.5)), Sphere(0.5)),
        "box": (sim.add_shape(Box(0.5, 0.5, 0.5)), Box(0.5, 0.5, 0.5)),
        "capsule": (sim.add_shape(Capsule(0.3, 0.5)), Capsule(0.3, 0.5)),
        "cylinder": (sim.add_shape(Cylinder(0.4, 0.5)), Cylinder(0.4, 0.5)),
    }
    handles = {}
    handles["sphere"] = sim.add_body(BodyDescription.dynamic((0, 1, 0), shapes["sphere"][0], 1.0, shapes["sphere"][1]))
    handles["box"] = sim.add_body(BodyDescription.dynamic((3, 1, 0), shapes["box"][0], 1.0, shapes["box"][1]))
    handles["capsule"] = sim.add_body(BodyDescription.dynamic((6, 1, 0), shapes["capsule"][0], 1.0, shapes["capsule"][1]))
    handles["cylinder"] = sim.add_body(BodyDescription.dynamic((9, 1, 0), shapes["cylinder"][0], 1.0, shapes["cylinder"][1]))
    return sim, handles


def test_ray_hits_each_shape():
    sim, handles = make_scene()
    for name, x in [("sphere", 0.0), ("box", 3.0), ("capsule", 6.0), ("cylinder", 9.0)]:
        hit = sim.ray_cast((x, 5.0, 0.0), (0.0, -1.0, 0.0), 10.0)
        assert bool(hit.hit), f"ray missed {name}"
        assert int(hit.body) == handles[name], f"ray hit wrong body for {name}"
        # Top surface: normal points up.
        assert float(hit.normal.y) > 0.7, f"bad normal for {name}: {hit.normal}"
    # Miss case.
    miss = sim.ray_cast((50.0, 5.0, 0.0), (0.0, -1.0, 0.0), 10.0)
    assert not bool(miss.hit)


def test_batched_rays():
    sim, handles = make_scene()
    origins = np.array([[0, 5, 0], [3, 5, 0], [50, 5, 0]], np.float32)
    dirs = np.tile(np.array([[0, -1, 0]], np.float32), (3, 1))
    hit = sim.ray_cast(origins, dirs, 10.0)
    assert list(np.asarray(hit.hit)) == [True, True, False]
    assert int(np.asarray(hit.body)[0]) == handles["sphere"]
    assert int(np.asarray(hit.body)[1]) == handles["box"]


def test_pruned_raycast_matches_full():
    """prune_k (top-K bounding-sphere candidate pass, the BVH-descent analogue —
    reference Trees/Tree_RayCast.cs:137) must agree with the exact full pass whenever
    K covers the ray corridor: same hit body, t, and normal."""
    sim, handles = make_scene()
    origins = np.array(
        [[0, 5, 0], [3, 5, 0], [6, 5, 0], [9, 5, 0], [50, 5, 0]], np.float32
    )
    dirs = np.tile(np.array([[0, -1, 0]], np.float32), (5, 1))
    full = sim.ray_cast(origins, dirs, 10.0)
    pruned = sim.ray_cast(origins, dirs, 10.0, prune_k=3)
    assert list(np.asarray(full.hit)) == list(np.asarray(pruned.hit))
    assert list(np.asarray(full.body)) == list(np.asarray(pruned.body))
    np.testing.assert_allclose(np.asarray(full.t), np.asarray(pruned.t), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(full.normal.y), np.asarray(pruned.normal.y), rtol=1e-5
    )


def test_box_query_and_sweep():
    sim, handles = make_scene()
    found = sim.box_query((-1, 0, -1), (4, 2, 1))
    assert handles["sphere"] in found and handles["box"] in found
    assert handles["cylinder"] not in found

    hit, t, body = sim.sweep(Sphere(0.2), (0, 1, -5), (0, 0, 1), 20.0)
    assert hit and body == handles["sphere"]
    assert 3.0 < t < 5.0


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_checkpoint_roundtrip():
    sim, handles = make_scene()
    sim.run(30, 1 / 60.0)
    blob = sim.save_checkpoint()
    p_ref, _, v_ref, _ = sim.get_body(handles["sphere"])
    sim.run(30, 1 / 60.0)
    p_late, _, _, _ = sim.get_body(handles["sphere"])
    assert not np.allclose(p_ref, p_late)  # state moved on
    sim.load_checkpoint(blob)
    p_back, _, v_back, _ = sim.get_body(handles["sphere"])
    np.testing.assert_array_equal(p_ref, p_back)
    np.testing.assert_array_equal(v_ref, v_back)
    # Resumed trajectory matches the original continuation bit-exactly (warm starts kept).
    sim.run(30, 1 / 60.0)
    p_resumed, _, _, _ = sim.get_body(handles["sphere"])
    np.testing.assert_array_equal(p_late, p_resumed)


def test_contact_events():
    """began/persisted/ended pair tracking (reference ContactEventsDemo)."""
    sim = Simulation(SimConfig(body_capacity=32, max_pairs=64, substeps=2, num_colors=2))
    ground = sim.add_shape(Box(30.0, 0.5, 30.0))
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=ground))
    ball_shape = sim.add_shape(Sphere(0.4))
    ball = sim.add_body(BodyDescription.dynamic((8.0, 1.8, 0.0), ball_shape, 1.0, Sphere(0.4)))
    ev = sim.contact_events()
    sim.run(60, 1 / 60.0)  # ball lands on the ground (still awake at this snapshot)
    ev = sim.contact_events()
    landed = any(ball in p for p in ev["began"])
    assert landed, f"no began event for the ball landing: {ev}"
    # Even after the island sleeps, the contact persists (sleeping pairs retained).
    sim.run(90, 1 / 60.0)
    ev = sim.contact_events()
    assert any(ball in p for p in ev["persisted"]), f"ball contact should persist: {ev}"
    sim.set_velocity(ball, linear=(0, 20.0, 0))  # launch it up (wakes the body)
    sim.run(30, 1 / 60.0)
    ev = sim.contact_events()
    assert any(ball in p for p in ev["ended"]), f"ball contact should end after launch: {ev}"


def test_ray_hits_mesh_and_compound():
    """Scene rays must hit compound children and mesh triangles (reference: RayTest
    recursion into compound/mesh Trees, Simulation_Queries.cs:146)."""
    from bepuphysics2_tpu.shapes import Compound, Mesh

    sim = Simulation(SimConfig(body_capacity=16, max_pairs=32, substeps=2, num_colors=2))
    ss = sim.add_shape(Sphere(0.5))
    comp = Compound.build([(ss, (0, 0, -2)), (ss, (0, 0, 2))])
    cs = sim.add_shape(comp)
    sim.add_body(BodyDescription.kinematic((0, 0, 0), shape=cs))
    floor = Mesh.build([
        ((-3, 0, -3), (3, 0, 3), (3, 0, -3)),
        ((-3, 0, -3), (-3, 0, 3), (3, 0, 3)),
    ])
    fs = sim.add_shape(floor)
    sim.add_static(StaticDescription(position=(10, 0, 0), shape=fs))

    hit = sim.ray_cast((0, 5, 2), (0, -1, 0), 10.0)  # down at the +z compound child
    assert bool(hit.hit) and abs(float(hit.t) - 4.5) < 1e-2, (hit.hit, float(hit.t))
    hit = sim.ray_cast((10, 5, 0), (0, -1, 0), 10.0)  # down at the mesh floor
    assert bool(hit.hit) and abs(float(hit.t) - 5.0) < 1e-2, (hit.hit, float(hit.t))
    hit = sim.ray_cast((0, 5, 0), (0, -1, 0), 10.0)  # between the compound children
    assert not bool(hit.hit), "ray between compound children must miss"


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_sweep_shape_batch_matches_single():
    """Batched sweeps (one fused dispatch over R casts — reference RayBatcher idea
    applied to Simulation.Sweep) must agree with per-call exact sweeps."""
    import numpy as np

    from bepuphysics2_tpu import (BodyDescription, Box, SimConfig, Simulation, Sphere,
                                  StaticDescription)

    sim = Simulation(SimConfig(body_capacity=16, max_pairs=32, substeps=2, num_colors=2))
    g = sim.add_shape(Box(20.0, 0.5, 20.0))
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    s = Sphere(0.5)
    ss = sim.add_shape(s)
    sim.add_body(BodyDescription.dynamic((0, 3.0, 0), ss, 1.0, s))
    sim.timestep(1 / 60.0)

    probe = Sphere(0.2)
    positions = np.array([[0, 8.0, 0], [5.0, 8.0, 0], [0, 8.0, 5.0]], np.float32)
    velocities = np.tile(np.array([0, -10.0, 0], np.float32), (3, 1))
    batch = sim.sweep_shape_batch(probe, positions, velocities, max_t=3.0)
    for i in range(3):
        single = sim.sweep_shape(probe, tuple(positions[i]), tuple(velocities[i]), max_t=3.0)
        assert bool(batch.hit[i]) == bool(single.hit)
        if bool(single.hit):
            assert abs(float(batch.t[i]) - float(single.t)) < 1e-5
            assert int(batch.body[i]) == int(single.body)
    # The central ray hits the dynamic sphere first; the offset ones hit the ground.
    assert bool(batch.hit[0]) and int(batch.body[0]) == 1
    assert bool(batch.hit[1]) and int(batch.body[1]) == 0


def test_raycast_big_mesh_far_triangle():
    """Rays must hit triangles beyond the first config.child_window child slots — the
    query window sizes to the real max child count (simulation.py ray_cast), unlike the
    contact pipeline's budgeted candidate pick."""
    from bepuphysics2_tpu import Mesh

    tris = []
    for i in range(20):
        for j in range(20):
            x0, z0 = i - 10.0, j - 10.0
            tris.append(((x0, 0, z0), (x0, 0, z0 + 1), (x0 + 1, 0, z0)))
            tris.append(((x0 + 1, 0, z0), (x0, 0, z0 + 1), (x0 + 1, 0, z0 + 1)))
    sim = Simulation(SimConfig(body_capacity=8, max_pairs=8, substeps=2, num_colors=2))
    mesh = sim.add_shape(Mesh.build(tris))
    sim.add_static(StaticDescription(position=(0, 0, 0), shape=mesh))
    # Morton order puts low-coordinate cells first; aim at the far +x/+z corner so the
    # hit triangle is deep in the pool (beyond slot 128).
    hit = sim.ray_cast(origin=(9.5, 5.0, 9.5), direction=(0.0, -1.0, 0.0))
    assert bool(hit.hit), "ray missed the far corner of the mesh"
    t = float(np.asarray(hit.t).reshape(()))
    assert abs(t - 5.0) < 1e-3, f"expected t=5 to the mesh plane, got {t}"


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_sweep_against_mesh_and_compound_children():
    """Sweeps must resolve TOI against compound/mesh CHILDREN (unified sweep targets,
    collision/sweeps.py) — previously compound targets degenerated to a point at the
    body origin."""
    from bepuphysics2_tpu import Compound, Mesh

    tris = []
    for i in range(4):
        for j in range(4):
            x0, z0 = i - 2.0, j - 2.0
            tris.append(((x0, 0, z0), (x0, 0, z0 + 1), (x0 + 1, 0, z0)))
            tris.append(((x0 + 1, 0, z0), (x0, 0, z0 + 1), (x0 + 1, 0, z0 + 1)))
    sim = Simulation(SimConfig(body_capacity=8, max_pairs=8, substeps=2, num_colors=2))
    mesh = sim.add_shape(Mesh.build(tris))
    sim.add_static(StaticDescription(position=(0, 0, 0), shape=mesh))
    bid = sim.add_shape(Box(0.5, 0.5, 0.5))
    comp = sim.add_shape(Compound.build([(bid, (3.0, 1.0, 0.0)), (bid, (3.0, 2.5, 0.0))]))
    sim.add_body(BodyDescription.kinematic((0.0, 0.0, 0.0), comp))

    hit = sim.sweep_shape(Sphere(0.5), (0.5, 5.0, 0.5), (0, -1, 0), max_t=10.0)
    assert bool(hit.hit) and abs(float(hit.t) - 4.5) < 0.02, float(hit.t)
    # Top box of the compound: top face y=3.0 → sphere bottom impacts after 2.5.
    hit2 = sim.sweep_shape(Sphere(0.5), (3.0, 6.0, 0.0), (0, -1, 0), max_t=10.0)
    assert bool(hit2.hit) and abs(float(hit2.t) - 2.5) < 0.02, float(hit2.t)
    assert int(hit2.body) == 1


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_pruned_sweep_matches_full():
    """prune_k sweeps must agree with the exact full pass (hit, body, t) on a scene
    where candidates are sparse along each cast; saturated must report False there."""
    sim, _handles = make_scene()
    s = Sphere(0.3)
    sim.add_shape(s)

    R = 8
    rng = np.random.default_rng(4)
    P = np.stack([rng.uniform(-4, 4, R), np.full(R, 6.0), rng.uniform(-4, 4, R)], -1)
    V = np.tile(np.array([0.0, -6.0, 0.0]), (R, 1))
    full = sim.sweep_shape_batch(s, P, V, max_t=3.0)
    pruned = sim.sweep_shape_batch(s, P, V, max_t=3.0, prune_k=8)
    assert (np.asarray(full.hit) == np.asarray(pruned.hit)).all()
    assert (np.asarray(full.body) == np.asarray(pruned.body)).all()
    assert np.allclose(np.asarray(full.t), np.asarray(pruned.t), atol=1e-5)
    assert pruned.saturated is not None
