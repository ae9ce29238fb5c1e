"""Model-layer tests: ragdoll, cloth, vehicle, character — the extension-point proofs
(reference Demos: RagdollDemo, ClothDemo, SimpleCarDemo, CharacterDemo)."""
import numpy as np
import pytest

from bepuphysics2_tpu import BodyDescription, Box, SimConfig, Simulation, StaticDescription
from bepuphysics2_tpu.models import Character, SimpleCar, add_cloth, add_ragdoll

pytestmark = pytest.mark.slow  # see pytest.ini: extra full-step compiles



def ground_sim(**kw):
    defaults = dict(
        body_capacity=64, max_pairs=512, substeps=4, velocity_iterations=2, num_colors=8,
        joint_capacity=128, max_compound_pairs=16, children_per_pair=4, child_window=16,
    )
    defaults.update(kw)
    sim = Simulation(SimConfig(**defaults))
    g = sim.add_shape(Box(50.0, 0.5, 50.0))
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    return sim


def test_ragdoll_drops_and_holds_together():
    sim = ground_sim()
    bodies = add_ragdoll(sim, position=(0, 0.5, 0))
    sim.run(240, 1 / 60.0)
    pos = {k: sim.get_body(h)[0] for k, h in bodies.items()}
    # Everything should land above the ground and stay connected (head near torso).
    for k, p in pos.items():
        assert p[1] > -0.2, f"{k} fell through the ground: {p}"
    head_torso = np.linalg.norm(pos["head"] - pos["torso"])
    assert head_torso < 1.2, f"ragdoll came apart: head-torso {head_torso}"


def test_cloth_hangs_from_pins():
    sim = ground_sim(joint_capacity=512)
    grid = add_cloth(sim, origin=(-1.0, 3.0, 0.0), width=6, length=6, spacing=0.3)
    sim.run(180, 1 / 60.0)
    # Pinned corners stay; center sags below the pin row.
    p_pin, _, _, _ = sim.get_body(int(grid[0, 0]))
    p_mid, _, _, _ = sim.get_body(int(grid[3, 3]))
    assert abs(p_pin[1] - 3.0) < 1e-5
    assert p_mid[1] < 2.9, f"cloth did not sag: {p_mid}"
    # Structural links keep the lattice from stretching wildly.
    p_n, _, _, _ = sim.get_body(int(grid[3, 4]))
    assert np.linalg.norm(p_mid - p_n) < 0.6


def test_car_drives_forward():
    sim = ground_sim(body_capacity=32)
    car = SimpleCar(sim, position=(0, 0.8, 0))
    sim.run(60, 1 / 60.0)  # settle on suspension
    p0, _, _, _ = sim.get_body(car.body)
    car.set_drive(8.0)
    sim.run(180, 1 / 60.0)
    p1, _, v1, _ = sim.get_body(car.body)
    assert p1[1] > 0.2, f"car collapsed: {p1}"
    dist = np.linalg.norm((p1 - p0)[[0, 2]])
    assert dist > 1.0, f"car did not drive: moved {dist}"


def test_character_walks_and_jumps():
    sim = ground_sim(body_capacity=16)
    ch = Character(sim, position=(0, 1.2, 0))
    sim.run(60, 1 / 60.0)  # land
    assert ch.supported(), "character should stand on the ground"
    for _ in range(120):
        ch.move((2.0, 0.0))
        sim.timestep(1 / 60.0)
    pos, _, _, _ = sim.get_body(ch.body)
    assert pos[0] > 1.0, f"character did not walk: {pos}"
    # Jump.
    ch.move((0.0, 0.0), jump_speed=5.0)
    max_y = pos[1]
    for _ in range(30):
        sim.timestep(1 / 60.0)
        p, _, _, _ = sim.get_body(ch.body)
        max_y = max(max_y, p[1])
    assert max_y > pos[1] + 0.5, f"character did not jump: {max_y} vs {pos[1]}"


def test_ragdoll_tube_scenario():
    """RagdollTubeBenchmark analogue (__graft_entry__._build_ragdoll_tube_sim):
    ragdolls must stay inside the spinning kinematic tube without capacity overflow —
    exercises compound child AABB prefilter + joint-heavy solve."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _build_ragdoll_tube_sim

    sim, _ = _build_ragdoll_tube_sim(2, substeps=2, num_colors=4)
    ovf = False
    for _ in range(60):
        sim.timestep(1 / 60.0)
        ovf = ovf or bool(sim.last_diag.overflow)
    assert not ovf, "capacity overflow in the ragdoll tube scene"
    sim._sync_from_device()
    ys = sim._host.py[sim._host.kind == 1]
    assert ys.min() > 0.0, "ragdolls escaped the tube"
    assert int(sim.last_diag.contact_count) > 0


def test_tank_drives_turns_and_fires():
    """Tank capability proof (reference Demos/Demos/Tanks/): tracked skid-steer drive,
    turret swivel servo aiming, and a CCD projectile fired from the barrel."""
    import numpy as np
    import bepuphysics2_tpu as bp
    from bepuphysics2_tpu.models import Tank

    sim = bp.Simulation(
        bp.SimConfig(
            body_capacity=64, max_pairs=1024, substeps=4, num_colors=8,
            joint_capacity=64, max_ccd_pairs=4, enable_sleep=False,
        )
    )
    ground = sim.add_shape(bp.Box(120.0, 0.5, 120.0))
    sim.add_static(bp.StaticDescription(position=(0, -0.25, 0), shape=ground))
    tank = Tank(sim, position=(0.0, 1.0, 0.0), wheels_per_tread=3)
    dt = 1 / 60.0
    sim.run(30, dt)  # settle onto suspension

    # Drive straight: both tracks forward.
    tank.set_track_speeds(8.0, 8.0)
    p0, _, _, _ = sim.get_body(tank.body)
    sim.run(90, dt)
    p1, _, _, _ = sim.get_body(tank.body)
    fwd = p1 - p0
    assert abs(fwd[2]) > 0.8, f"tank did not drive: {fwd}"
    assert abs(fwd[2]) > 3 * abs(fwd[0]), f"straight drive veered: {fwd}"

    # Skid steer: opposite track speeds must yaw the hull.
    _, q0, _, _ = sim.get_body(tank.body)
    tank.set_track_speeds(6.0, -6.0)
    sim.run(90, dt)
    _, q1, _, _ = sim.get_body(tank.body)

    def yaw(q):
        x, y, z, w = q
        return np.arctan2(2 * (w * y + x * z), 1 - 2 * (y * y + z * z))

    dyaw = abs((yaw(q1) - yaw(q0) + np.pi) % (2 * np.pi) - np.pi)
    assert dyaw > 0.15, f"skid steer produced no yaw: {dyaw}"

    # Aim the turret 90 degrees and check the barrel follows.
    tank.set_track_speeds(0.0, 0.0)
    tank.set_aim(np.pi / 2, 0.0)
    sim.run(120, dt)
    d = tank.barrel_direction()
    # Barrel local -Z starts pointing world -Z; a +pi/2 swivel about +Y moves it
    # toward +/-X (sign fixed by the servo measurement basis).
    assert abs(d[0]) > 0.6, f"turret did not swivel: {d}"

    # Fire: projectile leaves along the barrel direction at projectile_speed.
    proj = tank.fire()
    _, _, v, _ = sim.get_body(proj)
    assert np.linalg.norm(v) > 0.8 * tank.projectile_speed
    sim.run(10, dt)
    p, _, _, _ = sim.get_body(proj)
    assert np.isfinite(p).all()
