"""Constraint description mapping round trips — the reference's
DemoTests/ConstraintDescriptionMappingTests.cs:15: for every registered constraint type,
write a randomized description into storage, read it back, and require the repacked row
to be BITWISE identical (catches description/lane layout bugs)."""
import numpy as np
import pytest

from bepuphysics2_tpu.constraints.joints import ALL_TYPES, make_description
from bepuphysics2_tpu.constraints.joints.base import (
    MotorSettingsDesc, ServoSettingsDesc, unpack_fields,
)


def _random_desc_kwargs(cls, rng):
    kw = {}
    for name, kind in cls.FIELDS:
        if kind == "vec3":
            kw[name] = tuple(rng.normal(size=3).astype(np.float32).tolist())
        elif kind == "quat":
            q = rng.normal(size=4)
            q = (q / np.linalg.norm(q)).astype(np.float32)
            kw[name] = tuple(q.tolist())
        elif kind == "scalar":
            kw[name] = float(np.float32(rng.normal()))
        elif kind == "spring":
            kw["spring_frequency"] = float(np.float32(rng.uniform(1.0, 60.0)))
            kw["spring_damping"] = float(np.float32(rng.uniform(0.1, 10.0)))
        elif kind == "servo":
            kw["servo"] = ServoSettingsDesc(
                maximum_speed=float(np.float32(rng.uniform(0.1, 100.0))),
                base_speed=float(np.float32(rng.uniform(0.0, 5.0))),
                maximum_force=float(np.float32(rng.uniform(1.0, 1e6))),
            )
        elif kind == "motor":
            kw["motor"] = MotorSettingsDesc(
                maximum_force=float(np.float32(rng.uniform(1.0, 1e6))),
                softness=float(np.float32(rng.uniform(1e-3, 10.0))),
            )
    return kw


@pytest.mark.parametrize("cls", ALL_TYPES, ids=lambda c: c.name)
def test_description_roundtrip(cls):
    rng = np.random.default_rng(hash(cls.name) % (2**32))
    for _ in range(8):
        kw = _random_desc_kwargs(cls, rng)
        desc = make_description(cls.name, **kw)
        row = cls.pack(desc)
        assert row.shape == (cls.N_PRESTEP,), f"{cls.name}: pack width != N_PRESTEP"
        back = unpack_fields(cls, row)
        row2 = cls.pack(make_description(cls.name, **back))
        np.testing.assert_array_equal(
            row, row2, err_msg=f"{cls.name}: description round trip not bit-exact"
        )
        # Plain fields must round trip exactly (float32 storage).
        for name, kind in cls.FIELDS:
            if kind in ("vec3", "quat"):
                np.testing.assert_allclose(
                    back[name], np.float32(kw[name]), rtol=0, atol=0,
                    err_msg=f"{cls.name}.{name}",
                )
            elif kind == "scalar":
                assert back[name] == np.float32(kw[name]), f"{cls.name}.{name}"


def test_get_constraint_api():
    """Simulation.get_constraint reads back what add_constraint stored (reference
    Solver.GetDescription) incl. accumulated impulses after stepping."""
    from bepuphysics2_tpu import (
        BodyDescription, SimConfig, Simulation, Sphere,
    )

    sim = Simulation(SimConfig(body_capacity=8, max_pairs=8, substeps=2, num_colors=2))
    ss = sim.add_shape(Sphere(0.1))
    a = sim.add_body(BodyDescription.kinematic((0, 2.0, 0), ss))
    b = sim.add_body(BodyDescription.dynamic((1.0, 2.0, 0), ss, 1.0, Sphere(0.1)))
    h = sim.add_constraint(
        "ball_socket", [a, b],
        local_offset_a=(0.25, 0.0, 0.0), local_offset_b=(-0.75, 0.0, 0.0),
        spring_frequency=20.0,
    )
    bodies, params, imp = sim.get_constraint(h)
    assert bodies == [a, b]
    np.testing.assert_allclose(params["local_offset_a"], (0.25, 0.0, 0.0))
    np.testing.assert_allclose(params["local_offset_b"], (-0.75, 0.0, 0.0))
    assert abs(params["spring_frequency"] - 20.0) < 1e-5
    assert np.all(imp == 0.0)
    sim.run(30, 1 / 60.0)
    _, _, imp2 = sim.get_constraint(h)
    assert np.any(imp2 != 0.0), "accumulated impulses should be nonzero under load"
