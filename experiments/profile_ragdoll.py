"""Profile the ragdoll_tube scenario by python source line (same method as
profile_step.py + trace_by_source.py). Usage: python experiments/profile_ragdoll.py"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

N_RAGDOLLS = int(os.environ.get("BENCH_RAGDOLLS", 16))


def main():
    from __graft_entry__ import _build_ragdoll_tube_sim

    sim, config = _build_ragdoll_tube_sim(N_RAGDOLLS, substeps=4, num_colors=8)
    dt = 1.0 / 60.0

    sim.run(40, dt)
    float(sim.last_diag.contact_count)  # sync

    logdir = "/tmp/jaxtrace_rag"
    os.system(f"rm -rf {logdir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        sim.run(8, dt)
        float(sim.last_diag.contact_count)
    wall = time.perf_counter() - t0
    print(f"8 steps wall: {wall*1000:.1f} ms ({wall/8*1000:.2f} ms/step)")

    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    by_src = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") == 3 and e.get("tid") == 3:
            args = e.get("args", {})
            dur = e.get("dur", 0) / 1e3
            by_src[args.get("source", "?")] += dur
            total += dur
    print(f"total XLA-op device time: {total:.1f} ms over 8 steps")
    for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:35]:
        print(f"{v:9.2f} ms  {k}")


if __name__ == "__main__":
    main()
