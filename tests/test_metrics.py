"""Observability metrics (metrics.py) — energy/momentum/counters sanity."""
import numpy as np
import pytest

from bepuphysics2_tpu import (
    BodyDescription, Box, SimConfig, Simulation, Sphere, StaticDescription,
    simulation_metrics,
)


def test_metrics_free_fall_energy_conservation():
    """A free-falling ball conserves KE+PE (no contacts, no damping)."""
    sim = Simulation(SimConfig(body_capacity=16, max_pairs=16, substeps=4, num_colors=4))
    s = Sphere(0.5)  # IntegratorConfig damping defaults to 0 — no config override needed
    ss = sim.add_shape(s)
    b = sim.add_body(BodyDescription.dynamic((0.0, 100.0, 0.0), ss, 2.0, s))
    m0 = simulation_metrics(sim)
    e0 = float(m0.kinetic_energy) + float(m0.potential_energy)
    sim.run(30, 1 / 60.0)
    m1 = simulation_metrics(sim)
    e1 = float(m1.kinetic_energy) + float(m1.potential_energy)
    # Symplectic Euler drifts ~O(h) per step; half a second of fall stays within 1%.
    assert abs(e1 - e0) < 0.01 * max(abs(e0), 1.0), (e0, e1)
    assert float(m1.max_speed) > 4.0  # ~g*t = 5 m/s after 0.5 s
    assert int(m1.awake_dynamic_count) == 1
    assert int(m1.contact_count) == 0


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_metrics_resting_pile_counts():
    sim = Simulation(
        SimConfig(body_capacity=16, max_pairs=64, substeps=4, num_colors=4,
                  sleep_time=0.3)
    )
    g = sim.add_shape(Box(20.0, 0.5, 20.0))
    s = Sphere(0.5)
    ss = sim.add_shape(s)
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    for i in range(3):
        sim.add_body(BodyDescription.dynamic((i * 1.5, 0.5, 0.0), ss, 1.0, s))
    sim.run(150, 1 / 60.0)
    m = simulation_metrics(sim)
    assert int(m.sleeping_count) == 3, "balls should be asleep"
    assert int(m.awake_dynamic_count) == 0
    assert float(m.kinetic_energy) < 1e-4
    # Resting contacts keep accumulated support impulses in the retained caches.
    assert float(m.contact_impulse_total) > 0.0
    assert 0.0 < float(m.pair_utilization) <= 1.0
