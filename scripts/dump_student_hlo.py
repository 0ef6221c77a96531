#!/usr/bin/env python
"""Dump the optimized HLO of the student train step (f32, published config)
to /tmp/student_hlo.txt and print op-type statistics, so trace fusion names
can be matched to actual computations.

  python scripts/dump_student_hlo.py
"""
from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# elide huge constants so the text stays manageable
os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from polardepth_tpu.config import Config  # noqa: E402
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from profile_student import build, make_batch, H, W, B  # noqa: E402


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--warp_impl", default="patch")
    p.add_argument("--cv_warp_impl", default="xla")
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--phase_packed_decoder", action="store_true")
    p.add_argument("--photometric_packed", action="store_true")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--out", default="/tmp/student_hlo.txt")
    a = p.parse_args()
    cfg = Config(height=H, width=W, batch_size=B,
                 depth_supervision_only=False, depth_supervision=True,
                 train_student=True, mesh_shape=(1,),
                 warp_impl=a.warp_impl, cv_warp_impl=a.cv_warp_impl,
                 compute_dtype=a.compute_dtype,
                 phase_packed_decoder=a.phase_packed_decoder,
                 photometric_packed=a.photometric_packed)
    model, state, step, rng = build(cfg, remat=not a.no_remat)
    batch = make_batch(cfg, np.random.default_rng(0))
    trackers = (jnp.float32(cfg.min_depth), jnp.float32(cfg.max_depth))
    lowered = step.lower(state, trackers,
                         jax.tree_util.tree_map(jnp.asarray, batch), rng)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = a.out
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {out} ({len(txt) / 1e6:.1f} MB)")

    # op-type histogram over the entry computation lines
    kinds = Counter()
    for m in re.finditer(r"=\s+\w[\w\d\[\],{}<>]*\s+([a-z][a-z\-]+)", txt):
        kinds[m.group(1)] += 1
    print("top op kinds:")
    for k, v in kinds.most_common(25):
        print(f"  {v:7d}  {k}")

    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        print("cost analysis:",
              {k: v for k, v in ca.items()
               if k in ("flops", "bytes accessed", "transcendentals")})
    except Exception as exc:
        print("cost_analysis failed:", exc)


if __name__ == "__main__":
    main()
