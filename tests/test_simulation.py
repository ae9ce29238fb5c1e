"""End-to-end simulation tests — the reference's SimpleSelfContainedDemo equivalent
(reference: Demos/Demos/SimpleSelfContainedDemo.cs; headless CI model HeadlessDemo.cs)."""
import numpy as np
import pytest

from bepuphysics2_tpu import (
    BodyDescription,
    Box,
    Capsule,
    SimConfig,
    Simulation,
    Sphere,
    StaticDescription,
)


def make_sim(**kw):
    defaults = dict(body_capacity=64, max_pairs=256, substeps=8, velocity_iterations=1)
    defaults.update(kw)
    return Simulation(SimConfig(**defaults))


def test_sphere_rests_on_ground_box():
    sim = make_sim()
    ground_shape = sim.add_shape(Box(50.0, 0.5, 50.0))
    ball_shape = sim.add_shape(Sphere(0.5))
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=ground_shape))
    ball = sim.add_body(
        BodyDescription.dynamic((0, 2.0, 0), ball_shape, mass=1.0, shape_obj=Sphere(0.5))
    )
    sim.run(180, dt=1 / 60.0)  # 3 seconds
    pos, orn, vel, omega = sim.get_body(ball)
    # Ball should rest with center ~0.5 above ground top (y=0).
    assert abs(pos[1] - 0.5) < 0.05, f"ball rest height {pos[1]}"
    assert np.linalg.norm(vel) < 0.05, f"ball residual velocity {vel}"


def test_sphere_bounces_not_through_ground():
    """Even from high drop, speculative contacts must prevent tunneling."""
    sim = make_sim()
    ground_shape = sim.add_shape(Box(50.0, 0.5, 50.0))
    ball_shape = sim.add_shape(Sphere(0.25))
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=ground_shape))
    ball = sim.add_body(
        BodyDescription.dynamic((0, 30.0, 0), ball_shape, mass=1.0, shape_obj=Sphere(0.25))
    )
    for _ in range(240):
        sim.timestep(1 / 60.0)
        pos, _, _, _ = sim.get_body(ball)
        assert pos[1] > 0.0, f"ball tunneled through ground: y={pos[1]}"


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_box_stack_stable():
    """Small box stack must remain standing (warm start + friction + TGS stability)."""
    sim = make_sim(substeps=8)
    ground_shape = sim.add_shape(Box(50.0, 0.5, 50.0))
    box = Box(0.5, 0.5, 0.5)
    box_shape = sim.add_shape(box)
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=ground_shape))
    handles = []
    for i in range(3):
        handles.append(
            sim.add_body(
                BodyDescription.dynamic((0, 0.5 + i * 1.0, 0), box_shape, mass=1.0, shape_obj=box)
            )
        )
    sim.run(240, dt=1 / 60.0)
    for i, h in enumerate(handles):
        pos, orn, vel, omega = sim.get_body(h)
        expected_y = 0.5 + i * 1.0
        assert abs(pos[1] - expected_y) < 0.1, f"box {i} at y={pos[1]} expected {expected_y}"
        assert abs(pos[0]) < 0.2 and abs(pos[2]) < 0.2, f"box {i} drifted to {pos}"


def test_two_spheres_collide_and_separate():
    """Head-on equal-mass collision: momentum transfer (frictionless-ish, inelastic)."""
    sim = make_sim(integrator=__import__("bepuphysics2_tpu.integrator", fromlist=["IntegratorConfig"]).IntegratorConfig(gravity=(0, 0, 0)))
    s = Sphere(0.5)
    shape = sim.add_shape(s)
    a = sim.add_body(BodyDescription.dynamic((-2, 0, 0), shape, 1.0, s, velocity=(4, 0, 0)))
    b = sim.add_body(BodyDescription.dynamic((2, 0, 0), shape, 1.0, s))
    sim.run(90, dt=1 / 60.0)
    pa, _, va, _ = sim.get_body(a)
    pb, _, vb, _ = sim.get_body(b)
    # Total momentum conserved: 4 = va + vb
    assert abs((va[0] + vb[0]) - 4.0) < 0.05
    # B should have been pushed to the right.
    assert vb[0] > 1.0
    assert pb[0] > 2.1


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_sphere_rolls_on_capsule_free_space():
    """Capsule testers smoke test: sphere resting on a horizontal capsule (no crash,
    contact generated)."""
    import math

    sim = make_sim()
    ground_shape = sim.add_shape(Box(50.0, 0.5, 50.0))
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=ground_shape))
    cap = Capsule(0.5, 1.0)
    cap_shape = sim.add_shape(cap)
    # capsule lying along Y would stand up; rotate to lie along X: rotate local Y to world X
    q = (0.0, 0.0, -math.sin(math.pi / 4), math.cos(math.pi / 4))
    c = sim.add_body(
        BodyDescription.dynamic((0, 0.6, 0), cap_shape, 1.0, cap, orientation=q)
    )
    sim.run(120, dt=1 / 60.0)
    pos, _, vel, _ = sim.get_body(c)
    assert abs(pos[1] - 0.5) < 0.1, f"capsule rest height {pos[1]}"
    assert np.linalg.norm(vel) < 0.1


def test_determinism():
    """Identical runs must produce bit-identical trajectories (reference DeterminismTest)."""

    def run():
        sim = make_sim()
        ground_shape = sim.add_shape(Box(10.0, 0.5, 10.0))
        s = Sphere(0.4)
        shape = sim.add_shape(s)
        sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=ground_shape))
        rng = np.random.default_rng(42)
        for i in range(10):
            p = rng.uniform(-2, 2, 3)
            p[1] = 1.0 + i * 0.9
            sim.add_body(BodyDescription.dynamic(tuple(p), shape, 1.0, s))
        sim.run(120, dt=1 / 60.0)
        sim._sync_from_device()
        return np.stack([sim._host.px, sim._host.py, sim._host.pz, sim._host.qx])

    r1 = run()
    r2 = run()
    np.testing.assert_array_equal(r1, r2)


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_scanned_run_matches_per_step():
    """The scanned multi-step dispatch (step_n / lax.scan) must be bit-identical to
    per-step dispatch — the TPU production path vs the debug path."""

    def run(chunk):
        sim = make_sim(body_capacity=16, max_pairs=32, substeps=2, velocity_iterations=1)
        ground_shape = sim.add_shape(Box(10.0, 0.5, 10.0))
        s = Sphere(0.4)
        shape = sim.add_shape(s)
        sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=ground_shape))
        for i in range(4):
            sim.add_body(BodyDescription.dynamic((0.1 * i, 1.0 + 0.9 * i, 0), shape, 1.0, s))
        sim.run(16, dt=1 / 60.0, chunk=chunk)
        sim._sync_from_device()
        return np.stack([sim._host.px, sim._host.py, sim._host.pz, sim._host.qw])

    np.testing.assert_array_equal(run(chunk=0), run(chunk=8))


def test_collision_group_filtering():
    """Bodies sharing a nonzero collision group generate no contacts with each other but
    still collide with everything else (reference AllowContactGeneration filtering)."""
    sim = make_sim()
    ground_shape = sim.add_shape(Box(50.0, 0.5, 50.0))
    s = Sphere(0.5)
    shape = sim.add_shape(s)
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=ground_shape))
    g = sim.new_collision_group()
    # Two same-group spheres dropped overlapping: they must NOT push each other apart,
    # and both must still rest on the (group 0) ground.
    a = sim.add_body(BodyDescription.dynamic((0, 1.0, 0), shape, 1.0, s, collision_group=g))
    b = sim.add_body(BodyDescription.dynamic((0.1, 1.8, 0), shape, 1.0, s, collision_group=g))
    # A different-group control pair at x=10 with the same initial layout DOES separate.
    c = sim.add_body(BodyDescription.dynamic((10, 1.0, 0), shape, 1.0, s))
    d = sim.add_body(BodyDescription.dynamic((10.1, 1.8, 0), shape, 1.0, s))
    sim.run(180, 1 / 60.0)
    pa, _, _, _ = sim.get_body(a)
    pb, _, _, _ = sim.get_body(b)
    pc, _, _, _ = sim.get_body(c)
    pd, _, _, _ = sim.get_body(d)
    # Filtered pair: both rest ON the ground, fully overlapping (distance << diameter).
    assert abs(pa[1] - 0.5) < 0.05 and abs(pb[1] - 0.5) < 0.05, (pa, pb)
    assert np.linalg.norm(pa - pb) < 0.5, f"filtered pair pushed apart: {pa} {pb}"
    # Control pair: separated by about a diameter.
    assert np.linalg.norm(pc - pd) > 0.8, f"control pair failed to collide: {pc} {pd}"


def test_validation_checker():
    """validate() passes on a healthy sim and catches injected corruption
    (reference MathChecker/Solver validators under Debug builds)."""
    import pytest
    from bepuphysics2_tpu.validation import ValidationError, validate

    sim = make_sim()
    g = sim.add_shape(Box(10.0, 0.5, 10.0))
    s = Sphere(0.4)
    ss = sim.add_shape(s)
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    h = sim.add_body(BodyDescription.dynamic((0, 1.0, 0), ss, 1.0, s))
    sim.run(30, 1 / 60.0)
    validate(sim)  # healthy

    sim._sync_from_device()
    sim._host.px[h] = float("nan")
    with pytest.raises(ValidationError, match="non-finite"):
        validate(sim)


def test_kinematic_dynamic_transition():
    """set_body_kind / set_local_inertia (reference Bodies kinematic<->dynamic paths)."""
    from bepuphysics2_tpu import KIND_DYNAMIC, KIND_KINEMATIC

    sim = make_sim()
    g = sim.add_shape(Box(10.0, 0.5, 10.0))
    s = Sphere(0.4)
    ss = sim.add_shape(s)
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    h = sim.add_body(BodyDescription.dynamic((0, 3.0, 0), ss, 1.0, s))
    # Freeze it mid-air: kinematic bodies ignore gravity.
    sim.set_body_kind(h, KIND_KINEMATIC)
    sim.run(30, 1 / 60.0)
    p1, _, _, _ = sim.get_body(h)
    assert abs(p1[1] - 3.0) < 1e-3, f"kinematic body moved: {p1}"
    # Back to dynamic: it falls and rests on the ground.
    sim.set_body_kind(h, KIND_DYNAMIC)
    sim.set_local_inertia(h, 1.0, (2.5, 0, 2.5, 0, 0, 2.5))
    sim.run(150, 1 / 60.0)
    p2, _, v2, _ = sim.get_body(h)
    assert abs(p2[1] - 0.4) < 0.05, f"re-dynamicized body rest height wrong: {p2}"
    assert np.linalg.norm(v2) < 0.1
