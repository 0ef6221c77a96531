"""Run selected bench rows and merge into bench_suite.json.

The full suite (scripts/bench_suite.py) takes ~40 min end-to-end; this
runner fills in individual rows (e.g. after an interrupted suite run)
without re-measuring everything.  Rows come from bench_suite.ROWS — the
single registry both runners share (ADVICE r3: no per-script row drift).
Usage:

    python scripts/bench_student_rows.py [row ...]

with row names from bench_suite.ROWS; no args = the student rows.
"""
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

from bench_suite import ROWS, record  # noqa: E402


def main():
    out = os.path.join(HERE, "bench_suite.json")
    results = {}
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    names = sys.argv[1:] or [n for n in ROWS if n.startswith("student_")]
    unknown = [n for n in names if n not in ROWS]
    if unknown:
        sys.exit(f"unknown rows {unknown}; known: {list(ROWS)}")
    for name in names:
        record(results, out, name, ROWS[name])
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
