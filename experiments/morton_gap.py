"""Measure the Morton-rank gap distribution of live contact pairs in the pile scene.

Decides the window size for the windowed-state Pallas solver (ops/sweep.py): a slice
gathers body state from a contiguous chunk window of the Morton-sorted body array, so a
pair is window-routable iff both bodies land within one window span. Pairs beyond the
span spill (Jacobi or dedicated far slices) — this script quantifies that fraction.

Usage: BENCH_BODIES=65536 python experiments/morton_gap.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BODIES = int(os.environ.get("BENCH_BODIES", 16384))
STEPS = int(os.environ.get("STEPS", 40))


def morton3(x, y, z, bits=10):
    """Interleave 3x bits-bit ints -> 3*bits-bit Morton code (numpy, vectorized)."""
    out = np.zeros_like(x, dtype=np.uint64)
    for b in range(bits):
        out |= ((x >> b) & 1).astype(np.uint64) << np.uint64(3 * b)
        out |= ((y >> b) & 1).astype(np.uint64) << np.uint64(3 * b + 1)
        out |= ((z >> b) & 1).astype(np.uint64) << np.uint64(3 * b + 2)
    return out


def main():
    from __graft_entry__ import _build_pile_sim

    t0 = time.perf_counter()
    sim, config = _build_pile_sim(
        body_capacity=N_BODIES + 64,
        max_pairs=max(4 * N_BODIES, 4096),
        substeps=4,
        num_colors=8,
        n_bodies=N_BODIES,
    )
    dt = 1.0 / 60.0
    sim.run(STEPS, dt)
    st = sim._state
    pos = np.stack(
        [np.asarray(st.bodies.pos.x), np.asarray(st.bodies.pos.y), np.asarray(st.bodies.pos.z)],
        -1,
    )
    kind = np.asarray(st.bodies.kind)
    print(f"built+ran {STEPS} steps in {time.perf_counter()-t0:.1f}s; "
          f"pairs={int(sim.last_diag.pair_count)}")

    cache = st.cache
    valid = np.asarray(cache.valid) if hasattr(cache, "valid") else None
    a = np.asarray(cache.body_a)
    b = np.asarray(cache.body_b)
    if valid is None:
        valid = a >= 0
    a, b = a[valid], b[valid]

    # Morton rank over ALL body slots (statics included — they sort spatially too).
    lo, hi = pos.min(0), pos.max(0)
    q = ((pos - lo) / np.maximum(hi - lo, 1e-6) * 1023).astype(np.uint32)
    code = morton3(q[:, 0], q[:, 1], q[:, 2])
    order = np.argsort(code, kind="stable")
    rank = np.empty_like(order)
    rank[order] = np.arange(len(order))

    gap = np.abs(rank[a].astype(np.int64) - rank[b].astype(np.int64))
    print(f"live pairs: {len(gap)}; bodies: {N_BODIES}")
    for w in (256, 512, 1024, 2048, 4096, 8192):
        frac = float((gap < w).mean())
        print(f"  gap < {w:5d}: {frac*100:6.2f}%")
    # pairs touching the static ground
    stat = (kind[a] != 0) | (kind[b] != 0)  # KIND_DYNAMIC == 0? check
    from bepuphysics2_tpu.bodies import KIND_DYNAMIC
    stat = (kind[a] != KIND_DYNAMIC) | (kind[b] != KIND_DYNAMIC)
    print(f"  pairs touching a non-dynamic body: {float(stat.mean())*100:.2f}%")
    # dyn-dyn gaps only
    gd = gap[~stat]
    for w in (512, 1024, 2048, 4096):
        print(f"  dyn-dyn gap < {w:5d}: {float((gd < w).mean())*100:6.2f}%")


if __name__ == "__main__":
    main()
