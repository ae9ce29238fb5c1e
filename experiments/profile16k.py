"""16k/64k overflow-free profile: generous capacities, op-level XLA trace aggregation.
Usage: BENCH_BODIES=16384 python experiments/profile16k.py
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BODIES = int(os.environ.get("BENCH_BODIES", 16384))
PAIR_FACTOR = int(os.environ.get("BENCH_PAIR_FACTOR", 10))
N_COLORS = int(os.environ.get("BENCH_COLORS", 16 if N_BODIES > 8192 else 8))


def main():
    import dataclasses

    import jax

    from __graft_entry__ import _build_pile_sim

    sim, config = _build_pile_sim(
        body_capacity=N_BODIES + 64,
        max_pairs=PAIR_FACTOR * N_BODIES,
        substeps=4,
        num_colors=N_COLORS,
        n_bodies=N_BODIES,
    )
    sim.config = dataclasses.replace(
        sim.config, color_cap_factor=1.0, jacobi_cap_factor=0.3, color_rounds=1,
        store_churn=16384, store_dead=16384, store_repair=8192,
    )
    sim._dirty = True
    dt = 1.0 / 60.0

    t0 = time.perf_counter()
    sim.run(33, dt)
    if os.environ.get("BENCH_AUTOSIZE", "0") == "1":
        sim.run(31, dt)
        out = sim.autosize(dt, probe_steps=32, headroom=2.0)
        print("autosize:", out, "max_pairs", sim.config.max_pairs, flush=True)
        sim.run(33, dt)  # compile the resized programs before timing
        float(sim.last_diag.contact_count)
    c = float(sim.last_diag.contact_count)
    print(
        f"warmup 33 steps: {time.perf_counter()-t0:.1f}s  pairs="
        f"{int(sim.last_diag.pair_count)} contacts={int(c)} "
        f"overflow={bool(sim.last_diag.overflow)} src={int(sim.last_diag.overflow_src)}",
        flush=True,
    )
    # settle further so the pile is in steady collapse
    t0 = time.perf_counter()
    sim.run(64, dt)
    float(sim.last_diag.contact_count)
    dt64 = time.perf_counter() - t0
    print(
        f"64 steps: {dt64:.2f}s = {64/dt64:.1f} steps/s  pairs="
        f"{int(sim.last_diag.pair_count)} overflow={bool(sim.last_diag.overflow)} "
        f"src={int(sim.last_diag.overflow_src)}",
        flush=True,
    )

    logdir = "/tmp/jaxtrace16k"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        sim.run(8, dt)
        float(sim.last_diag.contact_count)

    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace files", flush=True)
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            if name.startswith("jit_") or name.startswith("_step_impl"):
                continue
            dur = e.get("dur", 0) / 1e3
            op = (e.get("args") or {}).get("long_name") or (e.get("args") or {}).get(
                "name"
            ) or ""
            parts = [p for p in op.split("/") if p and not p.startswith("jit(")]
            key = "/".join(parts[:2]) if parts else name.split(".")[0]
            agg[key] += dur
            total += dur
    print(f"device total {total:.1f} ms over 8 steps = {total/8:.2f} ms/step", flush=True)
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {v/8:8.3f} ms/step  {k}", flush=True)


if __name__ == "__main__":
    main()
