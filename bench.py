"""Headline benchmark: mixed-shape pile steps/sec (ShapePileBenchmark analogue,
reference DemoBenchmarks/ShapePileBenchmark.cs:17).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
North star (BASELINE.json): 10k steps/sec on a 64k-body pile on one chip.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_BODIES = int(os.environ.get("BENCH_BODIES", 4096))
STEPS = int(os.environ.get("BENCH_STEPS", 96))
# Color budget: dense piles reach per-body contact valence >8, so larger scenes
# default to more colors (fewer mass-split rows, better convergence, same kernel).
N_COLORS = int(os.environ.get("BENCH_COLORS", 16 if N_BODIES > 8192 else 8))
# 'pile' (default headline, ShapePileBenchmark analogue) or 'ragdoll_tube'
# (RagdollTubeBenchmark.cs:17 analogue — joint-heavy; BENCH_RAGDOLLS sizes it).
SCENARIO = os.environ.get("BENCH_SCENARIO", "pile")
N_RAGDOLLS = int(os.environ.get("BENCH_RAGDOLLS", 16))


def main():
    import jax

    from __graft_entry__ import (
        _build_colosseum_sim, _build_pile_sim, _build_ragdoll_tube_sim,
    )

    import dataclasses

    if SCENARIO == "colosseum":
        return colosseum()
    if SCENARIO == "ragdoll_tube":
        sim, config = _build_ragdoll_tube_sim(N_RAGDOLLS, substeps=4, num_colors=8)
        metric = f"steps_per_sec_{N_RAGDOLLS}_ragdoll_tube"
    else:
        # Solver settings match the reference benchmark (ShapePileBenchmark.cs:106 uses
        # SolveDescription(4, 1): 4 substeps, 1 velocity iteration). Initial capacities
        # are a generous N-derived ceiling (the deep-pile collapse peaks >5 pairs/body
        # at 16k); Simulation.autosize below re-derives every capacity from MEASURED
        # demand (the engine's demand counters), replacing per-scene hand knobs.
        sim, config = _build_pile_sim(
            body_capacity=N_BODIES + 64,
            max_pairs=max(8 * N_BODIES, 4096),
            substeps=4,
            num_colors=N_COLORS,
            n_bodies=N_BODIES,
        )
        metric = f"steps_per_sec_{N_BODIES}_body_mixed_pile"

    sim.config = dataclasses.replace(
        sim.config, color_cap_factor=1.0, jacobi_cap_factor=0.3, color_rounds=1,
    )
    sim._dirty = True

    dt = 1.0 / 60.0

    def sync():
        # Force device completion by READING a value. block_until_ready is not a
        # reliable barrier here: under buffer donation the outputs alias donated input
        # buffers, which the tunneled PJRT backend reports as ready immediately
        # (measured: 3 chained 32-step dispatches "completed" in 13 ms that actually
        # take 2.6 s of device time).
        return float(sim.last_diag.contact_count)

    # Warmup: compile both the single-step and scanned-chunk programs (33 = one scan
    # chunk + one single step), then let the pile develop contacts.
    sim.run(33, dt)
    sync()

    # Demand-driven sizing (Simulation.autosize): probe, read the engine's demand
    # counters, reconfigure to demand x headroom, repeat while overflowing. The timed
    # window still grows contacts, so the probe runs deeper into the collapse first
    # and headroom stays generous; `overflow` in the output flags any breach honestly.
    if os.environ.get("BENCH_ADAPTIVE", "1") == "1":
        # Settle the collapse before sizing: a cube pile's drop transient peaks at
        # >2x the steady-state pair demand (fall time scales with the cube side), and
        # sizing to the transient pushes the 64k windowed bank past VMEM feasibility.
        settle = int(os.environ.get(
            "BENCH_SETTLE", max(31, int(6 * N_BODIES ** (1 / 3)))
        ))
        sim.run(settle, dt)
        sync()
        out = sim.autosize(dt, probe_steps=32, headroom=2.0, pairs_headroom=1.4)
        # Compile the resized chunk+single-step programs before the timed window.
        sim.run(33, dt)
        sync()

    t0 = time.perf_counter()
    sim.run(STEPS, dt)
    sync()
    elapsed = time.perf_counter() - t0

    steps_per_sec = STEPS / elapsed
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(steps_per_sec, 2),
                "unit": "steps/sec",
                "vs_baseline": round(steps_per_sec / 10000.0, 4),
                # Honesty flags: capacity breaches degrade the sim (dropped pairs) and
                # would invalidate the number.
                "overflow": bool(sim.last_diag.overflow),
                # Bitmask of WHICH capacity tripped (1=broad phase, 2=solver buckets,
                # 4=pair store, 8=compound children, 16/32=sleep retention).
                "overflow_src": int(getattr(sim.last_diag, "overflow_src", 0)),
                "pairs": int(sim.last_diag.pair_count),
                # Peak demand counters of the timed window (StepDiagnostics.demand):
                # [bp pairs, grid entries, grid large, admits, live, jacobi, wide, dead]
                "demand": [int(x) for x in sim.last_diag.demand]
                if sim.last_diag.demand is not None else None,
                "max_pairs": int(sim.config.max_pairs),
            }
        )
    )


def colosseum():
    """Colosseum sleeping-churn stress (ColosseumDemo.cs / PyramidDemo.cs scale):
    settle a grid of box-ring colosseums until islands sleep, topple one, report
    steps/s plus the awake-fraction curve and wake latency."""
    import numpy as _np

    from __graft_entry__ import _build_colosseum_sim

    sim, config, handles, col_of = _build_colosseum_sim(N_BODIES)
    dt = 1.0 / 60.0
    n = len(handles)

    def awake_frac():
        sim._sync_from_device()
        h = sim._host
        dyn = h.kind == 1
        return float(_np.sum(h.awake & dyn) / max(1, _np.sum(dyn)))

    # Engine-derived capacities (autosize; rings are pre-stacked so demand is
    # steady-state from the start — no collapse transient to settle out).
    sim.run(33, dt)
    if os.environ.get("BENCH_ADAPTIVE", "1") == "1":
        sim.autosize(dt, probe_steps=32, headroom=2.0, pairs_headroom=1.4)
        sim.run(33, dt)  # compile the resized chunk+single-step programs

    # Settle until the sleepers win (bounded); sample the awake fraction curve.
    curve = []
    for _ in range(20):
        sim.run(30, dt)
        curve.append(round(awake_frac(), 4))
        if curve[-1] < 0.05:
            break
    settled_frac = curve[-1]

    # Timed settled window (the sleeping steady state IS the benchmark: fixed-shape
    # pipeline cost at 10^5 capacity with most islands asleep).
    t0 = time.perf_counter()
    sim.run(32, dt)
    float(sim.last_diag.contact_count)
    settled_sps = 32 / (time.perf_counter() - t0)

    # Topple colosseum 0: radial shove on its bodies -> wake cascade.
    sim._sync_from_device()
    h = sim._host
    for hi in _np.asarray(handles)[col_of == 0]:
        i = int(hi)
        h.vx[i] += 4.0
        h.awake[i] = True
        h.sleep_timer[i] = 0.0
    sim._dirty = True

    wake_curve = []
    t0 = time.perf_counter()
    sim.run(32, dt)
    float(sim.last_diag.contact_count)
    churn_sps = 32 / (time.perf_counter() - t0)
    wake_curve.append(round(awake_frac(), 4))

    print(
        json.dumps(
            {
                "metric": f"steps_per_sec_colosseum_{n}",
                "value": round(settled_sps, 2),
                "unit": "steps/sec",
                "vs_baseline": round(settled_sps / 10000.0, 4),
                "overflow": bool(sim.last_diag.overflow),
                "overflow_src": int(getattr(sim.last_diag, "overflow_src", 0)),
                "demand": [int(x) for x in sim.last_diag.demand]
                if sim.last_diag.demand is not None else None,
                "max_pairs": int(sim.config.max_pairs),
                "pairs": int(sim.last_diag.pair_count),
                "bodies": n,
                "awake_frac_curve": curve,
                "awake_frac_settled": settled_frac,
                "awake_frac_post_topple": wake_curve[-1],
                "steps_per_sec_churn": round(churn_sps, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
