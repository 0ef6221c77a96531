#!/usr/bin/env python
"""Full op histogram from a jax.profiler perfetto trace: every XLA-Ops-lane
event, bucketed by duration, plus the cumulative tail — to find where the
student step's 1.6 s of 'fusion/elementwise' actually goes.

  python scripts/trace_histogram.py /tmp/student_trace [nsteps]
"""
import glob
import gzip
import json
import sys

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/student_trace"
nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

path = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path, "rt") as f:
    trace = json.load(f)
events = trace.get("traceEvents", [])
tid_names = {(e.get("pid"), e.get("tid")): str(e.get("args", {}).get("name"))
             for e in events if e.get("ph") == "M"
             and e.get("name") == "thread_name"}
per_op, counts = {}, {}
for e in events:
    if e.get("ph") != "X" or "dur" not in e:
        continue
    lane = tid_names.get((e.get("pid"), e.get("tid")), "")
    if "Ops" not in lane or "Step" in lane:
        continue
    n = e.get("name", "?")
    per_op[n] = per_op.get(n, 0.0) + e["dur"] / 1e6
    counts[n] = counts.get(n, 0) + 1

rows = sorted(per_op.items(), key=lambda kv: -kv[1])
total = sum(per_op.values()) / nsteps
print(f"{len(rows)} distinct ops, {sum(counts.values())} events, "
      f"{total:.3f} s/step total")
cum = 0.0
print(f"{'s/step':>9} {'cum%':>6} {'n':>5}  name")
for n, d in rows[:60]:
    cum += d / nsteps
    print(f"{d / nsteps:9.5f} {100 * cum / total:5.1f}% {counts[n]:5d}  {n}")
# long-tail summary
tail = sum(d for _, d in rows[60:]) / nsteps
print(f"... tail ({len(rows) - 60} ops): {tail:.4f} s/step")
