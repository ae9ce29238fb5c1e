"""Aggregate an XLA device trace by python source line / tf_op scope."""
import gzip, json, glob, sys
from collections import defaultdict

f = sorted(glob.glob('/tmp/jaxtrace/**/*.trace.json.gz', recursive=True))[-1]
with gzip.open(f, 'rt') as fh:
    trace = json.load(fh)
events = trace['traceEvents']

by_src = defaultdict(float)
by_op = defaultdict(float)
total = 0.0
for e in events:
    if e.get('ph') == 'X' and e.get('pid') == 3 and e.get('tid') == 3:  # XLA Ops track
        args = e.get('args', {})
        dur = e.get('dur', 0) / 1e3
        src = args.get('source', '?')
        op = args.get('tf_op', '?')
        # collapse op path to top 3 scope components
        op3 = '/'.join(op.split('/')[:4])
        by_src[src] += dur
        by_op[op3] += dur
        total += dur

print(f"total XLA-op device time: {total:.1f} ms")
print("---- by source line ----")
for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{v:9.2f} ms  {k}")
print("---- by op scope ----")
for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{v:9.2f} ms  {k}")
