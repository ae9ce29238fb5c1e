"""Joint constraint tests — the ConstraintTestDemo equivalent
(reference: Demos/SpecializedTests/ConstraintTestDemo.cs exercises every joint type)."""
import numpy as np
import pytest

from bepuphysics2_tpu import BodyDescription, SimConfig, Simulation, Sphere
from bepuphysics2_tpu.integrator import IntegratorConfig


def make_sim(**kw):
    defaults = dict(
        body_capacity=16, max_pairs=16, substeps=4, velocity_iterations=2, num_colors=4,
        joint_capacity=8,
    )
    defaults.update(kw)
    return Simulation(SimConfig(**defaults))


def add_ball(sim, pos, vel=(0, 0, 0)):
    s = Sphere(0.1)
    shape = -1  # no collidable — pure constraint tests
    return sim.add_body(
        BodyDescription.dynamic(pos, shape, mass=1.0, shape_obj=s, velocity=vel)
    )


def test_ball_socket_pendulum():
    """Pendulum anchored to a kinematic body: rod length stays fixed; bob swings."""
    sim = make_sim()
    anchor = sim.add_body(BodyDescription.kinematic((0, 2.0, 0)))
    bob = add_ball(sim, (1.0, 2.0, 0))
    sim.add_constraint(
        "ball_socket", [anchor, bob], local_offset_a=(0, 0, 0), local_offset_b=(-1.0, 0, 0),
        spring_frequency=60.0,
    )
    for _ in range(4):
        sim.run(30, dt=1 / 60.0)
        pos, _, _, _ = sim.get_body(bob)
        length = np.linalg.norm(pos - np.array([0, 2.0, 0]))
        assert abs(length - 1.0) < 0.05, f"pendulum length drifted: {length}"
    # After 2 seconds the bob must have swung well below its start height.
    pos, _, vel, _ = sim.get_body(bob)
    assert pos[1] < 1.9


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_distance_limit_rope():
    """Body falls until the rope (distance limit) goes taut."""
    sim = make_sim()
    anchor = sim.add_body(BodyDescription.kinematic((0, 5.0, 0)))
    bob = add_ball(sim, (0, 4.5, 0))
    sim.add_constraint(
        "distance_limit", [anchor, bob], local_offset_a=(0, 0, 0), local_offset_b=(0, 0, 0),
        minimum_distance=0.0, maximum_distance=2.0, spring_frequency=60.0,
    )
    sim.run(180, dt=1 / 60.0)
    pos, _, vel, _ = sim.get_body(bob)
    dist = np.linalg.norm(pos - np.array([0, 5.0, 0]))
    assert dist < 2.15, f"rope stretched to {dist}"
    assert pos[1] < 3.5  # actually fell


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_hinge_keeps_axis():
    """Hinged body: relative rotation stays about the hinge axis; anchor stays attached."""
    sim = make_sim()
    anchor = sim.add_body(BodyDescription.kinematic((0, 2.0, 0)))
    door = add_ball(sim, (1.0, 2.0, 0))
    sim.add_constraint(
        "hinge", [anchor, door],
        local_offset_a=(0, 0, 0), local_hinge_axis_a=(0, 1, 0),
        local_offset_b=(-1.0, 0, 0), local_hinge_axis_b=(0, 1, 0),
        spring_frequency=60.0,
    )
    sim.set_velocity(door, angular=(0, 2.0, 0))
    sim.run(120, dt=1 / 60.0)
    pos, orn, vel, omega = sim.get_body(door)
    # Door must stay in the y=2 plane at distance 1 from the anchor.
    assert abs(pos[1] - 2.0) < 0.05
    r = np.linalg.norm(pos[[0, 2]])
    assert abs(r - 1.0) < 0.05
    # Orientation axis: rotation should remain about y — x,z quat components ~0.
    assert abs(orn[0]) < 0.05 and abs(orn[2]) < 0.05, f"hinge axis violated: {orn}"


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_angular_axis_motor_spins():
    sim = make_sim(integrator=IntegratorConfig(gravity=(0, 0, 0)))
    a = sim.add_body(BodyDescription.kinematic((0, 0, 0)))
    b = add_ball(sim, (0, 1.0, 0))
    sim.add_constraint(
        "angular_axis_motor", [a, b], local_axis_a=(0, 1, 0), target_velocity=-3.0,
    )
    sim.run(60, dt=1 / 60.0)
    _, _, _, omega = sim.get_body(b)
    # csv = (wA−wB)·axis → target −3 means wB·axis = +3.
    assert abs(omega[1] - 3.0) < 0.1, f"motor did not reach speed: {omega}"


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_weld_locks_relative_pose():
    sim = make_sim()
    a = add_ball(sim, (0, 5.0, 0))
    b = add_ball(sim, (1.0, 5.0, 0))
    sim.add_constraint(
        "weld", [a, b], local_offset=(1.0, 0, 0), local_orientation=(0, 0, 0, 1),
        spring_frequency=60.0,
    )
    sim.set_velocity(a, angular=(0, 0, 1.0))
    sim.run(90, dt=1 / 60.0)
    pa, qa, va, wa = sim.get_body(a)
    pb, qb, vb, wb = sim.get_body(b)
    # Rigidly connected: relative distance 1, same orientation.
    assert abs(np.linalg.norm(pb - pa) - 1.0) < 0.05
    dq = np.abs(np.dot(qa, qb))
    assert dq > 0.999, f"weld orientations diverged: {qa} vs {qb}"


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_one_body_linear_servo_holds_position():
    sim = make_sim()
    b = add_ball(sim, (0, 1.0, 0))
    sim.add_constraint(
        "one_body_linear_servo", [b], local_offset=(0, 0, 0), target=(2.0, 3.0, 0),
        spring_frequency=15.0, spring_damping=1.0,
    )
    sim.run(240, dt=1 / 60.0)
    pos, _, vel, _ = sim.get_body(b)
    # Servo fights gravity; should hover near the target (some droop allowed).
    assert np.linalg.norm(pos - np.array([2.0, 3.0, 0])) < 0.35, f"servo missed target: {pos}"


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_swing_limit_clamps_angle():
    sim = make_sim()
    anchor = sim.add_body(BodyDescription.kinematic((0, 3.0, 0)))
    bob = add_ball(sim, (0, 2.0, 0))
    sim.add_constraint(
        "ball_socket", [anchor, bob], local_offset_a=(0, 0, 0), local_offset_b=(0, 1.0, 0),
        spring_frequency=60.0,
    )
    # Limit swing of bob's -y axis from anchor's -y axis to 30 degrees.
    sim.add_constraint(
        "swing_limit", [anchor, bob], axis_local_a=(0, -1, 0), axis_local_b=(0, -1, 0),
        minimum_dot=float(np.cos(np.radians(30.0))), spring_frequency=60.0,
    )
    sim.set_velocity(bob, linear=(3.0, 0, 0))
    max_angle = 0.0
    for _ in range(120):
        sim.timestep(1 / 60.0)
        pos, _, _, _ = sim.get_body(bob)
        d = np.array([0, 3.0, 0]) - pos
        d /= np.linalg.norm(d)
        angle = np.degrees(np.arccos(np.clip(d[1], -1, 1)))
        max_angle = max(max_angle, angle)
    assert max_angle < 40.0, f"swing limit exceeded: {max_angle} deg"
    assert max_angle > 15.0, "pendulum barely swung; test setup wrong"
