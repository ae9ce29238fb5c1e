"""Per-collidable speculative margin bounds (reference Collidable.Minimum/
MaximumSpeculativeMargin, Collidables/Collidable.cs:131,139): the velocity-based pair
margin is floored by the averaged endpoint minimums and capped by the min-combined
endpoint maximums."""
import pytest
import numpy as np

from bepuphysics2_tpu import (
    BodyDescription,
    Box,
    SimConfig,
    Simulation,
    Sphere,
    StaticDescription,
)


def _one_step_contacts(margin_min=0.1, margin_max=3.0e38, gap=0.5, speed=0.0):
    """One step of a sphere hovering ``gap`` above the ground, moving down at ``speed``.
    Returns whether any contact record was generated."""
    sim = Simulation(
        SimConfig(
            body_capacity=8, max_pairs=16, substeps=2, num_colors=2, enable_sleep=False,
            broadphase="brute",
        )
    )
    ground = sim.add_shape(Box(10.0, 0.5, 10.0))
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=ground))
    s = Sphere(0.5)
    ss = sim.add_shape(s)
    sim.add_body(
        BodyDescription.dynamic(
            (0.0, 0.5 + gap, 0.0), ss, 1.0, s, velocity=(0.0, -speed, 0.0),
            speculative_margin=margin_min, speculative_margin_max=margin_max,
        )
    )
    sim.run(1, 1.0 / 60.0)
    return int(sim.last_diag.contact_count) > 0


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_default_margin_misses_distant_pair():
    # gap 0.5 ≫ default resting band (0.1) and the approach speed covers only
    # 2·dt-ish of it — no speculative contact.
    assert not _one_step_contacts(gap=0.5, speed=3.0)


def test_large_min_margin_generates_speculative_contact():
    # Raising the body's minimum speculative margin makes the same configuration
    # produce a speculative (negative-depth) contact record.
    assert _one_step_contacts(margin_min=1.5, gap=0.5, speed=3.0)


def test_max_margin_filters_fast_pair():
    # A fast approach would normally create a speculative contact across the gap
    # (speed·dt = 0.67 > gap + radius slack); capping the maximum margin filters it.
    assert _one_step_contacts(gap=0.5, speed=40.0)
    assert not _one_step_contacts(margin_max=0.05, gap=0.5, speed=40.0)


def test_resting_stack_unaffected_by_default_margins():
    """Defaults must preserve the resting-contact band: a settled sphere keeps its
    contact, and a sphere well above the ground does not create one."""
    assert _one_step_contacts(gap=0.0, speed=0.0)
    assert not _one_step_contacts(gap=0.5, speed=0.0)
