"""Constraint description mapping tests (reference DemoTests/ConstraintDescriptionMappingTests.cs:15):
for every registered joint type, a randomized description must pack into its bank row with
the declared column count, and update_constraint must rewrite it consistently."""
import numpy as np
import pytest

from bepuphysics2_tpu.constraints.joints import (
    ALL_TYPES,
    JOINT_TYPES,
    MotorSettingsDesc,
    ServoSettingsDesc,
    make_description,
)

RNG = np.random.default_rng(3)


def random_params(name):
    """Plausible random values for each description field the type's pack() reads."""
    v3 = lambda: tuple(RNG.normal(size=3).tolist())
    unit = lambda: tuple((lambda v: v / np.linalg.norm(v))(RNG.normal(size=3)).tolist())
    quat = lambda: tuple((lambda v: v / np.linalg.norm(v))(RNG.normal(size=4)).tolist())
    p = dict(
        local_offset_a=v3(), local_offset_b=v3(), local_offset=v3(),
        local_hinge_axis_a=unit(), local_hinge_axis_b=unit(),
        local_swivel_axis_a=unit(), axis_local_a=unit(), axis_local_b=unit(),
        local_axis_a=unit(), local_axis_b=unit(), local_direction=unit(), local_axis=unit(),
        local_plane_normal=unit(), local_basis_a=quat(), local_basis_b=quat(),
        local_orientation=quat(), target_orientation=quat(),
        target_relative_rotation=quat(),
        target_distance=float(RNG.uniform(0.5, 2)),
        minimum_distance=0.1, maximum_distance=2.0,
        minimum_dot=float(np.cos(0.5)), minimum_angle=-0.5, maximum_angle=0.5,
        minimum_offset=-1.0, maximum_offset=1.0,
        target_angle=0.3, target_offset=0.5, velocity_scale=2.0,
        target_velocity=3.0 if name in (
            "twist_motor", "angular_axis_motor", "linear_axis_motor", "angular_axis_gear_motor"
        ) else v3(),
        target=v3(), target_scaled_area=1.0, target_scaled_volume=1.0,
        spring_frequency=float(RNG.uniform(5, 60)), spring_damping=float(RNG.uniform(0.1, 2)),
        servo=ServoSettingsDesc(maximum_speed=10.0, base_speed=0.1, maximum_force=100.0),
        motor=MotorSettingsDesc(maximum_force=50.0, softness=0.05),
    )
    return p


@pytest.mark.parametrize("cls", ALL_TYPES, ids=[t.name for t in ALL_TYPES])
def test_description_packs_to_declared_width(cls):
    desc = make_description(cls.name, **random_params(cls.name))
    row = cls.pack(desc)
    assert row.shape == (cls.N_PRESTEP,), (
        f"{cls.name}: pack produced {row.shape}, declared N_PRESTEP={cls.N_PRESTEP}"
    )
    assert np.all(np.isfinite(row)), f"{cls.name}: non-finite prestep values"
    # Packing is deterministic.
    row2 = cls.pack(desc)
    np.testing.assert_array_equal(row, row2)


def test_all_30_types_registered():
    assert len(JOINT_TYPES) == 30, sorted(JOINT_TYPES)
