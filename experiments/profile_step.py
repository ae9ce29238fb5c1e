"""Capture an XLA op-level profile of the real bench step and aggregate device time
by op category. Usage: BENCH_BODIES=4096 python experiments/profile_step.py"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

N_BODIES = int(os.environ.get("BENCH_BODIES", 4096))


def main():
    from __graft_entry__ import _build_pile_sim
    import dataclasses

    sim, config = _build_pile_sim(
        body_capacity=N_BODIES + 64,
        max_pairs=max(4 * N_BODIES, 4096),
        substeps=4,
        num_colors=8,
        n_bodies=N_BODIES,
    )
    sim.config = dataclasses.replace(sim.config, color_cap_factor=1.0, jacobi_cap_factor=0.3, color_rounds=1)
    sim._dirty = True
    dt = 1.0 / 60.0

    sim.run(40, dt)
    float(sim.last_diag.contact_count)  # sync

    logdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {logdir}")
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        sim.run(8, dt)
        float(sim.last_diag.contact_count)
    wall = time.perf_counter() - t0
    print(f"8 steps wall: {wall*1000:.1f} ms ({wall/8*1000:.2f} ms/step)")

    # Parse the perfetto trace: aggregate slice durations on device tracks.
    files = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files)
    if not files:
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"] if isinstance(trace, dict) else trace
    # Identify device track pids (names containing TPU / device)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items() if "TPU" in n or "/device" in n.lower()}
    print("tracks:", {p: n for p, n in pid_names.items()})
    agg = defaultdict(float)
    cnt = defaultdict(int)
    # Stage attribution: group leaf device slices by the deepest function name in the
    # op_name metadata path (jit(_step_impl)/jit(main)/<fn>/<fn>/op...).
    stage = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            name = e.get("name", "?")
            if name.startswith("jit_") or name.startswith("_step_impl"):
                continue  # parent span: children carry the time
            dur = e.get("dur", 0) / 1e3  # us -> ms
            agg[name] += dur
            cnt[name] += 1
            total += dur
            op = (e.get("args") or {}).get("long_name") or (e.get("args") or {}).get(
                "name"
            ) or ""
            parts = [p for p in op.split("/") if p and not p.startswith("jit(")]
            key = "/".join(parts[:2]) if parts else name.split(".")[0]
            stage[key] += dur
    print(f"total leaf device time: {total:.1f} ms over 8 steps")
    print("---- by stage (op_name prefix) ----")
    for k, ms in sorted(stage.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{ms/8:9.3f} ms/step  {k[:110]}")
    print("---- by op ----")
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:30]
    for name, ms in top:
        print(f"{ms:9.3f} ms  x{cnt[name]:5d}  {name[:120]}")


if __name__ == "__main__":
    main()
