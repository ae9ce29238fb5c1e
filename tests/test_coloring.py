"""Incremental constraint graph coloring (reference: persistent ConstraintBatch
membership Solver.cs:984 + BatchCompressor incremental repair; solver/coloring.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from bepuphysics2_tpu.solver.coloring import (
    color_constraints_incremental,
    color_constraints_kary,
)

C = 8
NB, M, LIVE = 100, 400, 300
CAP = int(1.5 * M / C)
SEGMENTS = [(0, M, CAP)]


def _graph(seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, NB, M)
    b = rng.integers(0, NB, M)
    b = np.where(a == b, (b + 1) % NB, b)
    refs = np.zeros((M, 4), np.int32)
    refs[:, 0], refs[:, 1] = a, b
    dyn = np.zeros((M, 4), bool)
    dyn[:, 0] = True
    dyn[:, 1] = rng.random(M) > 0.2
    valid = np.arange(M) < LIVE
    return refs, dyn, valid, rng


def _check_invariants(refs, dyn, valid, color, rank):
    """No two same-color rows share a dynamic body; ranks dense, unique, under cap."""
    color, rank = np.asarray(color), np.asarray(rank)
    for c in range(C):
        rows = np.nonzero(valid & (color == c))[0]
        seen = set()
        for r in rows:
            for j in range(4):
                if dyn[r, j]:
                    assert refs[r, j] not in seen, f"conflict in color {c}"
                    seen.add(refs[r, j])
        rr = rank[rows]
        assert (rr >= 0).all() and (rr < CAP).all()
        assert len(set(rr.tolist())) == len(rr)


def _colorer():
    return jax.jit(
        lambda r, d, v, p: color_constraints_incremental(
            r, d, v, p, NB, C, segments=SEGMENTS
        )
    )


def test_incremental_coloring_invariants_and_convergence():
    refs, dyn, valid, rng = _graph(7)
    prev = np.full(M, -1, np.int32)
    f = _colorer()
    cov = []
    for frame in range(8):
        color, rank = f(
            jnp.asarray(refs), jnp.asarray(dyn), jnp.asarray(valid), jnp.asarray(prev)
        )
        _check_invariants(refs, dyn, valid, color, rank)
        cov.append(float((valid & (np.asarray(color) < C)).sum() / valid.sum()))
        prev = np.where(np.asarray(color) < C, np.asarray(color), -1).astype(np.int32)
        # churn: 3% of rows die, replacements appear
        kill = rng.random(M) < 0.03
        new = (~valid) & (rng.random(M) < 0.1)
        a = rng.integers(0, NB, M)
        b = rng.integers(0, NB, M)
        b = np.where(a == b, (b + 1) % NB, b)
        refs[new, 0], refs[new, 1] = a[new], b[new]
        prev[new] = -1
        prev[kill] = -1
        valid = (valid & ~kill) | new
    assert cov[-1] > cov[0], "coverage must grow as colors persist"
    assert cov[-1] > 0.8, f"converged coverage too low: {cov}"


def test_incremental_beats_or_matches_full_recolor():
    """Converged incremental coverage must be at least the one-shot recolorer's (it is
    substantially better in practice: free-bit proposals vs one color per round)."""
    refs, dyn, valid, _ = _graph(11)
    old_color, _ = jax.jit(
        lambda r, d, v: color_constraints_kary(r, d, v, NB, C, segments=SEGMENTS)
    )(jnp.asarray(refs), jnp.asarray(dyn), jnp.asarray(valid))
    cov_old = float((valid & (np.asarray(old_color) < C)).sum() / valid.sum())

    prev = np.full(M, -1, np.int32)
    f = _colorer()
    for _ in range(8):
        color, _rank = f(
            jnp.asarray(refs), jnp.asarray(dyn), jnp.asarray(valid), jnp.asarray(prev)
        )
        prev = np.where(np.asarray(color) < C, np.asarray(color), -1).astype(np.int32)
    cov_new = float((valid & (np.asarray(color) < C)).sum() / valid.sum())
    assert cov_new >= cov_old - 1e-6, (cov_old, cov_new)


def test_carried_colors_are_kept():
    """A stable graph keeps its assignment bit-identical frame over frame."""
    refs, dyn, valid, _ = _graph(13)
    prev = np.full(M, -1, np.int32)
    f = _colorer()
    for _ in range(6):
        color, _ = f(
            jnp.asarray(refs), jnp.asarray(dyn), jnp.asarray(valid), jnp.asarray(prev)
        )
        prev = np.where(np.asarray(color) < C, np.asarray(color), -1).astype(np.int32)
    color2, _ = f(
        jnp.asarray(refs), jnp.asarray(dyn), jnp.asarray(valid), jnp.asarray(prev)
    )
    carried = prev >= 0
    assert (np.asarray(color2)[carried] == prev[carried]).all()
