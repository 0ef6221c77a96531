#!/usr/bin/env python
"""Join a jax.profiler trace with the dumped HLO's per-op metadata to get
time-by-source-line attribution for the student step.

  python scripts/trace_attribute.py /tmp/student_trace /tmp/student_hlo.txt 3
"""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict

trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/student_trace"
hlo_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/student_hlo.txt"
nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

# --- HLO: op name -> (source, op_name) ------------------------------------
meta = {}
pat = re.compile(
    r"%([\w.\-]+) = \S+ ([\w\-]+)\(.*?"
    r"(?:metadata=\{(.*?)\})?$")
src_pat = re.compile(r'source_file="([^"]+)".*?source_line=(\d+)')
op_pat = re.compile(r'op_name="([^"]+)"')
with open(hlo_path) as f:
    for line in f:
        line = line.strip()
        m = re.match(r"%?([\w.\-]+) = ", line)
        if not m:
            continue
        name = m.group(1)
        kind_m = re.search(r"= \S+ ([a-z][\w\-]*)\(", line)
        kind = kind_m.group(1) if kind_m else "?"
        sm = src_pat.search(line)
        om = op_pat.search(line)
        src = f"{sm.group(1).split('/')[-1]}:{sm.group(2)}" if sm else "?"
        op = om.group(1) if om else "?"
        # keep the shortest op_name scope prefix for readability
        meta[name] = (kind, src, op)

# --- trace ----------------------------------------------------------------
path = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path, "rt") as f:
    trace = json.load(f)
events = trace.get("traceEvents", [])
tid_names = {(e.get("pid"), e.get("tid")): str(e.get("args", {}).get("name"))
             for e in events if e.get("ph") == "M"
             and e.get("name") == "thread_name"}
by_src = defaultdict(float)
by_op = defaultdict(float)
unmatched = 0.0
total = 0.0
for e in events:
    if e.get("ph") != "X" or "dur" not in e:
        continue
    lane = tid_names.get((e.get("pid"), e.get("tid")), "")
    if "Ops" not in lane or "Step" in lane:
        continue
    n = e.get("name", "?")
    d = e["dur"] / 1e6
    total += d
    if n in meta:
        kind, src, op = meta[n]
        by_src[src] += d
        # collapse op_name scopes: first two + last path segments
        parts = op.split("/")
        key = "/".join(parts[:2] + parts[-1:]) if len(parts) > 3 else op
        by_op[key] += d
    else:
        unmatched += d

print(f"total {total / nsteps:.3f} s/step; unmatched "
      f"{unmatched / nsteps:.3f} s/step")
print("\n== by source line ==")
for k, v in sorted(by_src.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{v / nsteps:9.4f}s  {k}")
print("\n== by op_name scope ==")
for k, v in sorted(by_op.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{v / nsteps:9.4f}s  {k}")
