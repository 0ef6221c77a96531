#!/usr/bin/env python
"""Is the no-remat student step memory-safe at the published batch 12?
(VERDICT r4 #2a)

Round 2 OOM'd the teacher+student step at 17.1 GB with remat off (f32,
XLA-gather warps).  Since then the step moved to bf16 trunks + banded
Pallas warps, and bench_suite's fastest student row is the NOREMAT one
(27.0 vs 23.6 fps) — but nobody re-established that noremat FITS.  This
AOT-compiles the production student train step (320x480, batch 12, bf16 +
phase-packed + pallas_fast warps) with remat on/off and prints XLA's
compiled memory analysis (peak/temp/argument bytes) for each — no
execution, so an unsafe config cannot wedge the device.

  python scripts/check_student_memory.py [--batch 12]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def analyze(remat: bool, batch: int, h: int, w: int):
    import jax
    import jax.numpy as jnp
    from polardepth_tpu.config import Config
    from polardepth_tpu.data.synthetic import SyntheticHammer
    from polardepth_tpu.train.student import (
        StudentModel, make_student_train_step)
    from polardepth_tpu.train.state import create_train_state

    cfg = Config(height=h, width=w, batch_size=batch, train_student=True,
                 donate_state=False, compute_dtype="bfloat16",
                 warp_impl="pallas_fast", cv_warp_impl="pallas8_fast",
                 phase_packed_decoder=True)
    model = StudentModel.from_config(cfg, remat=remat)
    rng = jax.random.PRNGKey(0)
    nf = len(cfg.frame_ids)
    n_lookup = len(cfg.matching_ids) - 1
    example = {
        "color_frames": jnp.zeros((1, nf, h, w, 3), jnp.float32),
        "pol": jnp.zeros((1, h, w, 4), jnp.float32),
        "lookup_frames": jnp.zeros((1, n_lookup, h, w, 3), jnp.float32),
        "rel_poses": jnp.zeros((1, n_lookup, 4, 4), jnp.float32),
        "K_quarter": jnp.eye(4)[None].astype(jnp.float32),
        "inv_K_quarter": jnp.eye(4)[None].astype(jnp.float32),
        "min_depth_bin": cfg.min_depth, "max_depth_bin": cfg.max_depth,
    }
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    step = jax.jit(make_student_train_step(model, cfg))

    gen = SyntheticHammer(h, w, seed=3)
    b = gen.batch_frames(batch, frame_ids=cfg.frame_ids)
    b["inv_K"] = np.linalg.inv(b["K"]).astype(np.float32)
    dev = {k: jnp.asarray(b[k]) for k in
           ("color_frames", "pol", "depth", "rel_poses", "K", "inv_K")}
    trackers = (jnp.float32(cfg.min_depth), jnp.float32(cfg.max_depth))
    lowered = step.lower(state, trackers, dev, rng)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    gb = 1 << 30
    out = {
        "remat": remat,
        "argument_gb": round(m.argument_size_in_bytes / gb, 3),
        "output_gb": round(m.output_size_in_bytes / gb, 3),
        "temp_gb": round(m.temp_size_in_bytes / gb, 3),
        "peak_gb": round((m.argument_size_in_bytes + m.output_size_in_bytes
                          + m.temp_size_in_bytes) / gb, 3),
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--out",
                    default=os.path.join(HERE, "student_memory.json"))
    a = ap.parse_args()
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    rows = [analyze(remat, a.batch, a.height, a.width)
            for remat in (True, False)]
    hbm_gb = 15.75  # v5e
    for r in rows:
        r["fits_v5e"] = r["peak_gb"] < hbm_gb * 0.95
    with open(a.out, "w") as f:
        json.dump({"batch": a.batch, "geometry": [a.height, a.width],
                   "rows": rows, "hbm_gb": hbm_gb}, f, indent=1)
    print(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
