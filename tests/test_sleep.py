"""Island sleeping/waking tests (reference IslandSleeper/IslandAwakener behavior,
PyramidAwakenerTestDemo intent)."""
import numpy as np
import pytest

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


def _retention_scene(use_store: bool):
    sim = Simulation(
        SimConfig(body_capacity=32, max_pairs=64, substeps=4, num_colors=4,
                  sleep_time=0.4, use_pair_store=use_store)
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
    return sim, a, b


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_sleeping_pair_warm_start_retention():
    """Pairs whose island sleeps keep their accumulated impulses and warm-start on wake
    (reference PairCache_Activity). Store path: records stay in their slots while
    asleep (collision/pairstore.py liveness keeps overlapping pairs regardless of
    awake state); no bank migration happens at all."""
    sim, a, b = _retention_scene(use_store=True)
    st = sim.state.store
    live = np.asarray(st.live)
    aa = np.asarray(st.body_a)
    bb = np.asarray(st.body_b)
    rows = np.nonzero(live & (aa == min(a, b)) & (bb == max(a, b)))[0]
    assert len(rows) == 1, "sleeping pair record missing from the store"
    pen_sleep = float(np.asarray(st.imp_pen)[rows[0]].sum())
    # Converged per-substep support impulse ≈ m·g·h = 1 · 9.81 / 240 ≈ 0.041 (the solve
    # accumulates per substep, not per frame).
    assert pen_sleep > 0.5 * (9.81 / 240), (
        f"retained impulse should be near m*g*h: {pen_sleep}"
    )

    # Wake by user action: one step later the record still holds warm impulses.
    sim.wake_body(a)
    sim.wake_body(b)
    sim.timestep(1 / 60.0)
    st2 = sim.state.store
    rows2 = np.nonzero(
        np.asarray(st2.live)
        & (np.asarray(st2.body_a) == min(a, b))
        & (np.asarray(st2.body_b) == max(a, b))
    )[0]
    assert len(rows2) == 1, "woken pair missing from the store"
    pen_wake = float(np.asarray(st2.imp_pen)[rows2[0]].sum())
    assert pen_wake > 0.5 * pen_sleep, (
        f"impulses not retained across sleep: {pen_wake} vs {pen_sleep}"
    )


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_sleeping_pair_warm_start_retention_legacy_bank():
    """Legacy (non-store) path: the sleep BANK holds frozen pairs' records and the wake
    frame re-absorbs them into the active cache (this machinery still serves the
    compound child cache under the store path)."""
    sim, a, b = _retention_scene(use_store=False)
    key_ab = max(a, b) * sim.config.body_capacity + min(a, b)
    bank = sim.state.sleep_cache
    keys = np.asarray(bank.key)
    valid = np.asarray(bank.valid)
    rows = np.nonzero((keys == key_ab) & valid)[0]
    assert len(rows) == 1, "sleeping pair record missing from the sleep bank"
    pen_sleep = float(np.asarray(bank.penetration)[rows[0]].sum())
    assert pen_sleep > 0.5 * (9.81 / 240)
    live_keys = keys[valid]
    assert np.all(np.diff(live_keys) > 0)

    sim.wake_body(a)
    sim.wake_body(b)
    sim.timestep(1 / 60.0)
    cache = sim.state.cache
    ckeys = np.asarray(cache.key)
    cvalid = np.asarray(cache.valid)
    crow = np.nonzero((ckeys == key_ab) & cvalid)[0]
    assert len(crow) == 1, "woken pair missing from the active cache"
    pen_wake = float(np.asarray(cache.penetration)[crow[0]].sum())
    assert pen_wake > 0.5 * pen_sleep, (
        f"impulses not retained across sleep: {pen_wake} vs {pen_sleep}"
    )
    bank2 = sim.state.sleep_cache
    keys2 = np.asarray(bank2.key)
    valid2 = np.asarray(bank2.valid)
    assert not np.any((keys2 == key_ab) & valid2), "woken pair must leave the sleep bank"
