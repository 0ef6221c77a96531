"""Run selected student-step bench rows and merge into bench_suite.json.

The full suite (scripts/bench_suite.py) takes ~40 min end-to-end; this
runner fills in individual rows (e.g. after an interrupted suite run)
without re-measuring everything.  Usage:

    python scripts/bench_student_rows.py [row ...]

with row names from ROWS below; no args = all ROWS.
"""
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

from bench_suite import measure_student_train, measure_train  # noqa: E402

ROWS = {
    # round-3 session-2 configs (measured 2026-08-18, rows lost to an
    # interrupted suite run)
    "student_train_320x480_fast_bf16": lambda: measure_student_train(
        warp_impl="pallas_fast", cv_warp_impl="pallas8_fast",
        compute_dtype="bfloat16", fast_decoder=True),
    "student_train_320x480_phase_bf16": lambda: measure_student_train(
        warp_impl="pallas_fast", cv_warp_impl="pallas8_fast",
        compute_dtype="bfloat16", phase_packed_decoder=True),
    # no-remat experiment: bf16 sweep + Pallas warps freed the HBM that
    # forced remat in round 2 — does dropping the ~0.6-forward recompute pay?
    "student_train_320x480_phase_bf16_noremat": lambda: measure_student_train(
        warp_impl="pallas_fast", cv_warp_impl="pallas8_fast",
        compute_dtype="bfloat16", phase_packed_decoder=True, remat=False),
    "student_train_320x480_packed_bf16": lambda: measure_student_train(
        warp_impl="pallas_fast", cv_warp_impl="pallas8_fast",
        compute_dtype="bfloat16", phase_packed_decoder=True,
        photometric_packed=True),
    "train_320x480_bf16_phase_packedloss": lambda: measure_train(
        compute_dtype="bfloat16", phase_packed_decoder=True,
        photometric_packed=True),
}


def main():
    out = os.path.join(HERE, "bench_suite.json")
    results = {}
    if os.path.exists(out):
        with open(out) as f:
            results = json.load(f)
    names = sys.argv[1:] or list(ROWS)
    for name in names:
        t0 = time.time()
        try:
            results[name] = round(ROWS[name](), 2)
            print(f"{name}: {results[name]} fps  ({time.time()-t0:.0f}s)",
                  flush=True)
        except Exception as exc:
            print(f"{name}: FAILED {exc}", flush=True)
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
