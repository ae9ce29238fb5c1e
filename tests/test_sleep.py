"""Island sleeping/waking tests (reference IslandSleeper/IslandAwakener behavior,
PyramidAwakenerTestDemo intent)."""
import numpy as np

from bepuphysics2_tpu import BodyDescription, Box, SimConfig, Simulation, StaticDescription


def test_sleep_wake_cycle():
    sim = Simulation(
        SimConfig(body_capacity=32, max_pairs=64, substeps=4, num_colors=4, sleep_time=0.5)
    )
    g = sim.add_shape(Box(20.0, 0.5, 20.0))
    box = Box(0.5, 0.5, 0.5)
    bs = sim.add_shape(box)
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    a = sim.add_body(BodyDescription.dynamic((0, 0.5, 0), bs, 1.0, box))
    b = sim.add_body(BodyDescription.dynamic((0, 1.5, 0), bs, 1.0, box))

    # Settle: the stack must fall asleep.
    sim.run(150, 1 / 60.0)
    sim._sync_from_device()
    assert not sim._host.awake[a] and not sim._host.awake[b], "stack failed to sleep"
    pa_sleep, _, va, _ = sim.get_body(a)
    assert np.linalg.norm(va) == 0.0, "sleeping body must have zero velocity"

    # Sleeping bodies must not move.
    sim.run(60, 1 / 60.0)
    pa_after, _, _, _ = sim.get_body(a)
    np.testing.assert_array_equal(pa_sleep, pa_after)

    # Drop a new box on the stack → the whole island must wake.
    c = sim.add_body(BodyDescription.dynamic((0.05, 4.0, 0), bs, 1.0, box))
    woke = False
    for i in range(120):
        sim.timestep(1 / 60.0)
        sim._sync_from_device()
        if sim._host.awake[a] and sim._host.awake[b]:
            woke = True
            break
    assert woke, "island failed to wake on impact"

    # And eventually the taller stack re-sleeps.
    sim.run(300, 1 / 60.0)
    sim._sync_from_device()
    assert not sim._host.awake[c], "stack failed to re-sleep"
    pc, _, _, _ = sim.get_body(c)
    assert pc[1] > 2.0, f"new box should rest atop the stack: {pc}"


def test_never_sleep_threshold():
    sim = Simulation(
        SimConfig(body_capacity=16, max_pairs=32, substeps=4, num_colors=4, sleep_time=0.25)
    )
    g = sim.add_shape(Box(20.0, 0.5, 20.0))
    box = Box(0.5, 0.5, 0.5)
    bs = sim.add_shape(box)
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    a = sim.add_body(
        BodyDescription.dynamic((0, 0.5, 0), bs, 1.0, box, sleep_threshold=-1.0)
    )
    sim.run(120, 1 / 60.0)
    sim._sync_from_device()
    assert sim._host.awake[a], "negative sleep threshold must disable sleeping"
