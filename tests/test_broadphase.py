"""Broad-phase structures must be pair-exact: grid (fixed + adaptive cells) and
windowed sweep emit exactly the brute-force pair set whenever they report no
overflow (reference: tree self/intertree overlap enumeration is exact;
Trees/Tree_SelfQueries.cs)."""
import numpy as np
import jax.numpy as jnp
import pytest

from bepuphysics2_tpu.collision import broadphase as bp
from bepuphysics2_tpu.utils.vec import Vec3
from bepuphysics2_tpu.bodies import KIND_DYNAMIC, KIND_EMPTY, KIND_STATIC


def _scene(seed, n=256, n_large=3, spread=14.0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-spread / 2, spread / 2, (n, 3)).astype(np.float32)
    half = rng.uniform(0.3, 0.6, (n, 1)).astype(np.float32)
    amin = c - half
    amax = c + half
    kind = np.full(n, KIND_DYNAMIC, np.int32)
    kind[: n // 8] = KIND_STATIC
    kind[-3:] = KIND_EMPTY
    awake = rng.random(n) > 0.1
    group = np.zeros(n, np.int32)
    group[10:20] = 7  # one shared filter group
    # A few large slabs (ground-like).
    for i in range(n_large):
        amin[i] = (-spread, -1.0 - i, -spread)
        amax[i] = (spread, -i, spread)
    return (
        Vec3(*(jnp.asarray(amin[:, k]) for k in range(3))),
        Vec3(*(jnp.asarray(amax[:, k]) for k in range(3))),
        jnp.asarray(kind), jnp.asarray(awake), jnp.asarray(group),
    )


def _pairs(pl):
    a = np.asarray(pl.a)
    b = np.asarray(pl.b)
    v = np.asarray(pl.valid)
    assert not bool(np.asarray(pl.overflow)), "structure overflowed; raise capacities"
    return {(min(x, y), max(x, y)) for x, y in zip(a[v], b[v])}


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_grid_matches_brute(seed):
    amin, amax, kind, awake, group = _scene(seed)
    ref = _pairs(bp.brute_force(amin, amax, kind, awake, group, 4096))
    for cell in (0.0, 1.4, 2.5):  # 0 = adaptive
        got = _pairs(
            bp.grid(amin, amax, kind, awake, group, 4096, cell,
                    cell_capacity=32, max_large=32)
        )
        assert got == ref, (cell, len(got), len(ref),
                            sorted(got ^ ref)[:5])


@pytest.mark.parametrize("seed", [0, 3])
def test_sweep_matches_brute(seed):
    amin, amax, kind, awake, group = _scene(seed, n=128, n_large=0)
    ref = _pairs(bp.brute_force(amin, amax, kind, awake, group, 4096))
    got = _pairs(bp.sweep(amin, amax, kind, awake, group, 4096, window=127))
    assert got == ref


@pytest.mark.parametrize("seed", [0, 1, 2, 4])
def test_grid2_matches_brute(seed):
    amin, amax, kind, awake, group = _scene(seed)
    ref = _pairs(bp.brute_force(amin, amax, kind, awake, group, 4096))
    for cell in (0.0, 1.4, 2.5):  # 0 = adaptive
        got = _pairs(
            bp.grid2(amin, amax, kind, awake, group, 4096, cell,
                     cell_capacity=32, max_large=32, entry_factor=8)
        )
        assert got == ref, (cell, len(got), len(ref), sorted(got ^ ref)[:5])


def test_grid2_dense_cluster():
    # Dense cluster stressing same-cell windows + boundary crossings.
    rng = np.random.default_rng(11)
    n = 200
    c = rng.uniform(-2.0, 2.0, (n, 3)).astype(np.float32)
    half = rng.uniform(0.2, 0.5, (n, 1)).astype(np.float32)
    amin = Vec3(*(jnp.asarray((c - half)[:, k]) for k in range(3)))
    amax = Vec3(*(jnp.asarray((c + half)[:, k]) for k in range(3)))
    kind = jnp.full(n, KIND_DYNAMIC, jnp.int32)
    awake = jnp.ones(n, bool)
    group = jnp.zeros(n, jnp.int32)
    ref = _pairs(bp.brute_force(amin, amax, kind, awake, group, 8192, row_candidates=128))
    got = _pairs(
        bp.grid2(amin, amax, kind, awake, group, 8192, 0.0,
                 cell_capacity=64, max_large=16, entry_factor=8)
    )
    assert got == ref, (len(got), len(ref), sorted(got ^ ref)[:5])
