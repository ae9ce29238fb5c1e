"""Multi-chip execution tests on the virtual 8-device CPU mesh: the batched-worlds data
parallel path and the constraint-sharded single-world path (solver psum halo exchange)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bepuphysics2_tpu import (
    BodyDescription,
    Box,
    SimConfig,
    Simulation,
    Sphere,
    StaticDescription,
)

pytestmark = pytest.mark.slow  # see pytest.ini: extra full-step compiles



def build_scene(n_dyn=12):
    config = SimConfig(
        body_capacity=32, max_pairs=64, substeps=2, velocity_iterations=1, num_colors=4,
        broadphase="brute", enable_sleep=False, joint_capacity=8,
    )
    sim = Simulation(config)
    g = sim.add_shape(Box(20.0, 0.5, 20.0))
    s = Sphere(0.4)
    ss = sim.add_shape(s)
    sim.add_static(StaticDescription(position=(0, -0.5, 0), shape=g))
    rng = np.random.default_rng(3)
    for i in range(n_dyn):
        p = rng.uniform(-1.5, 1.5, 3)
        p[1] = 0.6 + 0.9 * i
        sim.add_body(BodyDescription.dynamic(tuple(p), ss, 1.0, s))
    # A couple of joints so the joint banks exercise the sharded path too.
    a = sim.add_body(BodyDescription.kinematic((0, 14.0, 0)))
    b = sim.add_body(BodyDescription.dynamic((0.8, 14.0, 0), -1, 1.0, s))
    sim.add_constraint("ball_socket", [a, b], local_offset_a=(0.4, 0, 0),
                       local_offset_b=(-0.4, 0, 0))
    return sim, config


def body_state_arrays(state):
    b = state.bodies
    return np.stack([np.asarray(c) for c in (b.pos.x, b.pos.y, b.pos.z,
                                             b.vel.x, b.vel.y, b.vel.z)])


def test_sharded_single_world_matches_single_device():
    """Constraint-sharded step over an 8-device mesh must match the unsharded step to
    float tolerance (identical algorithm; only reduction order differs via psum)."""
    from bepuphysics2_tpu.parallel.sharding import make_mesh, shard_state, sharded_step_fn
    from bepuphysics2_tpu.simulation import step

    sim, config = build_scene()
    present = tuple(sorted({int(t) for t in sim.shapes.types if t >= 0}))
    banks = {
        name: {k: v for k, v in store.device().items() if k != "impulse"}
        for name, store in sim.joints.items()
        if store.count > 0
    }
    state0 = sim.state
    shapes = sim.shapes.device()
    dt = jnp.float32(1 / 60.0)

    # Reference: unsharded jitted step, a few frames.
    ref = state0
    for _ in range(5):
        ref, _ = step(ref, shapes, banks, dt, config, present)

    mesh = make_mesh(8)
    fn = sharded_step_fn(config, mesh, present_types=present)(state0, shapes, banks)
    st = shard_state(state0, mesh)
    for _ in range(5):
        st, diag = fn(st, shapes, banks, dt)
    jax.block_until_ready(st)

    np.testing.assert_allclose(
        body_state_arrays(st), body_state_arrays(ref), rtol=2e-4, atol=2e-5
    )


def test_batched_worlds_data_parallel():
    from bepuphysics2_tpu.parallel.sharding import (
        batched_step_fn, make_mesh, replicate_state,
    )

    sim, config = build_scene(n_dyn=4)
    state0 = sim.state
    shapes = sim.shapes.device()
    mesh = make_mesh(8)
    fn = batched_step_fn(config, mesh)
    states = replicate_state(state0, 8)
    new_states, diag = fn(states, shapes, {}, jnp.float32(1 / 60.0))
    jax.block_until_ready(new_states)
    assert new_states.bodies.pos.x.shape[0] == 8
    # All worlds identical input → identical output.
    px = np.asarray(new_states.bodies.pos.x)
    for w in range(1, 8):
        np.testing.assert_array_equal(px[0], px[w])


def test_sharded_sleep_matches_single_device():
    """Sleep/wake inside shard_map: a resting stack must fall asleep identically on
    the 8-device mesh and on one device (labels pmin-combined, wakes pmax-combined)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bepuphysics2_tpu as bp
    from bepuphysics2_tpu.parallel.sharding import (
        make_mesh, shard_state, sharded_step_fn,
    )

    def scene():
        sim = bp.Simulation(
            bp.SimConfig(
                body_capacity=64, max_pairs=256, substeps=2, num_colors=2,
                enable_sleep=True, sleep_time=0.15, use_pair_store=False,
                broadphase="brute",
            )
        )
        g = sim.add_shape(bp.Box(20.0, 0.5, 20.0))
        sim.add_static(bp.StaticDescription(position=(0, -0.5, 0), shape=g))
        s = bp.Sphere(0.5)
        ss = sim.add_shape(s)
        for i in range(8):
            # resting on the ground, slightly separated: sleeps quickly
            sim.add_body(
                bp.BodyDescription.dynamic((i * 1.5 - 5, 0.4995, 0), ss, 1.0, s)
            )
        return sim

    dt = 1.0 / 60.0
    sim1 = scene()
    sim1.run(40, dt, chunk=0)
    sim1._sync_from_device()
    awake_single = np.asarray(sim1._host.awake[:16]).copy()
    assert not awake_single[1:9].any(), "single-device scene failed to sleep"

    sim2 = scene()
    mesh = make_mesh(8)
    present = tuple(sorted({int(t) for t in sim2.shapes.types if t >= 0}))
    sfn = sharded_step_fn(sim2.config, mesh, present_types=present)(
        sim2.state, sim2.shapes.device(), {}
    )
    st = shard_state(sim2.state, mesh)
    for _ in range(40):
        st, diag = sfn(st, sim2.shapes.device(), {}, jnp.float32(dt))
    awake_sharded = np.asarray(st.bodies.awake[:16])
    assert (awake_sharded == awake_single).all(), (awake_sharded, awake_single)
