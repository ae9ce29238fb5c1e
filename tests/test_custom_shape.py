"""Custom collidable registration (reference CustomVoxelCollidableDemo capability):
a user-supplied support function plugs into the generic GJK/MPR narrow phase."""
import jax.numpy as jnp
import numpy as np
import pytest

from bepuphysics2_tpu import BodyDescription, Box, SimConfig, Simulation, StaticDescription
from bepuphysics2_tpu.shapes.custom import CustomShape, register_custom_shape
from bepuphysics2_tpu.utils.vec import Vec3


def _ellipsoid_support(params, d):
    """Support of an ellipsoid with semiaxes (a, b, c) = params[..., 0:3]:
    argmax_{x on surface} d·x = (a²dx, b²dy, c²dz) / |(a dx, b dy, c dz)|."""
    a, b, c = params[..., 0], params[..., 1], params[..., 2]
    nx, ny, nz = a * d.x, b * d.y, c * d.z
    inv = 1.0 / jnp.maximum(jnp.sqrt(nx * nx + ny * ny + nz * nz), 1e-12)
    return Vec3(a * a * d.x * inv, b * b * d.y * inv, c * c * d.z * inv), jnp.zeros_like(a)


ELLIPSOID = register_custom_shape(_ellipsoid_support, name="ellipsoid")


@pytest.mark.slow  # full-suite only: compile-heavy; subsystem covered by a faster test
def test_custom_ellipsoid_rests_on_ground():
    a, b, c = 0.6, 0.3, 0.4
    sim = Simulation(SimConfig(body_capacity=16, max_pairs=32, substeps=4, num_colors=2))
    g = sim.add_shape(Box(20.0, 0.5, 20.0))
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    # Unit-mass solid ellipsoid inertia diag: ((b²+c²)/5, (a²+c²)/5, (a²+b²)/5).
    egg = CustomShape(
        ELLIPSOID, params=(a, b, c), max_radius=a,
        inertia_diag=((b * b + c * c) / 5, (a * a + c * c) / 5, (a * a + b * b) / 5),
    )
    es = sim.add_shape(egg)
    h = sim.add_body(BodyDescription.dynamic((0, 1.0, 0), es, 1.0, egg))
    sim.run(240, 1 / 60.0)
    pos, orn, vel, om = sim.get_body(h)
    # It must rest ON the ground on one of its axes: center height in [min, max] semiaxis.
    assert 0.2 < pos[1] < 0.65, f"ellipsoid rest height wrong: {pos}"
    assert np.linalg.norm(vel) < 0.1, f"ellipsoid still moving: {vel}"
