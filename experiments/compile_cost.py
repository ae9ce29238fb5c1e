"""Bisect step-graph compile cost on CPU (the round-4 dryrun regression).

Times jit lowering + compilation of the full `step` at dryrun size under config
toggles, printing seconds + StableHLO size per variant. Run:
    JAX_PLATFORMS=cpu python experiments/compile_cost.py [variant ...]
"""
import os
import sys
import time

# The axon site hook overrides JAX_PLATFORMS; the config API is the reliable switch
# (see tests/conftest.py). Optionally dial optimization level via XLA_OPT=0/1.
if os.environ.get("XLA_OPT"):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_backend_optimization_level={os.environ['XLA_OPT']}"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _build_pile_sim  # noqa: E402
import dataclasses  # noqa: E402

from bepuphysics2_tpu.simulation import step  # noqa: E402


def build(n_bodies=16, **overrides):
    sim, config = _build_pile_sim(
        body_capacity=64, max_pairs=128, substeps=2, num_colors=2,
        n_bodies=n_bodies, settle=True,
    )
    sim.add_constraint(
        "ball_socket", [1, 2],
        local_offset_a=(0.525, 0.0, 0.0), local_offset_b=(-0.525, 0.0, 0.0),
        spring_frequency=30.0, spring_damping=1.0,
    )
    if overrides:
        sim.reconfigure(**overrides)
    banks = {
        name: {k: v for k, v in store.device().items() if k != "impulse"}
        for name, store in sim.joints.items()
        if store.count > 0
    }
    present = tuple(sorted({int(t) for t in sim.shapes.types if t >= 0}))
    return sim.state, sim.shapes.device(), banks, sim.config, present


VARIANTS = {
    "base": {},
    "no_store": dict(use_pair_store=False),
    "no_sleep": dict(enable_sleep=False),
    "no_store_no_sleep": dict(use_pair_store=False, enable_sleep=False),
    "xla_backend": dict(solver_backend="xla"),
    "store_xla": dict(solver_backend="xla", use_pair_store=True),
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        ov = VARIANTS[name]
        state, shapes, banks, config, present = build(**ov)
        t0 = time.time()
        lowered = jax.jit(
            step, static_argnames=("config", "present_types")
        ).lower(state, shapes, banks, jnp.float32(1 / 60), config, present)
        t1 = time.time()
        hlo = lowered.as_text()
        t2 = time.time()
        compiled = lowered.compile()
        t3 = time.time()
        print(
            f"{name:20s} lower {t1-t0:6.1f}s  hlo {len(hlo)/1e6:6.2f} MB  "
            f"compile {t3-t2:6.1f}s", flush=True,
        )


if __name__ == "__main__":
    main()
