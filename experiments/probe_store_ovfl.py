"""Probe which pair-store capacity trips at 4k (churn vs page-alloc) and its timing.

Runs the bench pile in 16-step chunks, printing overflow_src per chunk under
different store sizings. Informs honest bench.py capacity choices.
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _build_pile_sim

N = int(os.environ.get("N", 4096))
CHURN = int(os.environ.get("CHURN", 0))
MAXP = int(os.environ.get("MAXP", 4 * N))

sim, config = _build_pile_sim(
    body_capacity=N + 64, max_pairs=MAXP, substeps=4, num_colors=8, n_bodies=N
)
sim.config = dataclasses.replace(
    sim.config, color_cap_factor=1.0, jacobi_cap_factor=0.3, color_rounds=1,
    store_churn=CHURN,
)
sim._dirty = True
dt = 1.0 / 60.0

print("built, stepping...", flush=True)
for chunk in range(6):
    t0 = time.perf_counter()
    sim.run(32, dt)
    d = sim.last_diag
    print(
        f"chunk {chunk}: pairs={int(d.pair_count)} ovfl={bool(d.overflow)} "
        f"src={int(d.overflow_src)} dt={time.perf_counter()-t0:.2f}s",
        flush=True,
    )
