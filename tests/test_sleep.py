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


def test_sleeping_pair_warm_start_retention():
    """Pairs dropped by the broad phase while their island sleeps keep their accumulated
    impulses in the sleep bank and warm-start on wake (reference PairCache_Activity:
    sleeping islands keep their pairs in inactive cache sets)."""
    import jax.numpy as jnp

    sim = Simulation(
        SimConfig(body_capacity=32, max_pairs=64, substeps=4, num_colors=4, sleep_time=0.4)
    )
    g = sim.add_shape(Box(20.0, 0.5, 20.0))
    box = Box(0.5, 0.5, 0.5)
    bs = sim.add_shape(box)
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    a = sim.add_body(BodyDescription.dynamic((0, 0.5, 0), bs, 1.0, box))
    b = sim.add_body(BodyDescription.dynamic((0, 1.5, 0), bs, 1.0, box))

    sim.run(150, 1 / 60.0)
    sim._sync_from_device()
    assert not sim._host.awake[a] and not sim._host.awake[b], "stack failed to sleep"

    # The b-on-a pair's record must live in the sleep bank with its impulses.
    key_ab = max(a, b) * sim.config.body_capacity + min(a, b)
    bank = sim.state.sleep_cache
    keys = np.asarray(bank.key)
    valid = np.asarray(bank.valid)
    rows = np.nonzero((keys == key_ab) & valid)[0]
    assert len(rows) == 1, "sleeping pair record missing from the sleep bank"
    pen_sleep = float(np.asarray(bank.penetration)[rows[0]].sum())
    # Converged per-substep support impulse ≈ m·g·h = 1 · 9.81 / 240 ≈ 0.041 (the solve
    # accumulates per substep, not per frame).
    assert pen_sleep > 0.5 * (9.81 / 240), (
        f"retained impulse should be near m*g*h: {pen_sleep}"
    )
    # Bank keys stay ascending (the match path searchsorts directly).
    live_keys = keys[valid]
    assert np.all(np.diff(live_keys) > 0)

    # Wake by user action: one step later the active cache holds the pair again with
    # impulses carried from the bank (warm start), not rebuilt from zero.
    sim.wake_body(a)
    sim.wake_body(b)
    sim.timestep(1 / 60.0)
    cache = sim.state.cache
    ckeys = np.asarray(cache.key)
    cvalid = np.asarray(cache.valid)
    crow = np.nonzero((ckeys == key_ab) & cvalid)[0]
    assert len(crow) == 1, "woken pair missing from the active cache"
    pen_wake = float(np.asarray(cache.penetration)[crow[0]].sum())
    # One velocity iteration from zero reaches only a fraction of the converged impulse;
    # a warm-started solve stays near it.
    assert pen_wake > 0.5 * pen_sleep, (
        f"impulses not retained across sleep: {pen_wake} vs {pen_sleep}"
    )
    # The woken pair left the bank (re-absorbed into the active cache).
    bank2 = sim.state.sleep_cache
    keys2 = np.asarray(bank2.key)
    valid2 = np.asarray(bank2.valid)
    assert not np.any((keys2 == key_ab) & valid2), "woken pair must leave the sleep bank"
