#!/usr/bin/env python
"""Mini-repro of the student step's pathological grid_sample layouts.

The full step spends 1.09 s/step in warp.py:66 gathers because XLA layout
assignment picks planar ({0,1}) layouts for the 3-channel warp operands and
outputs inside the loss graph (see PERF.md round 3).  This repro builds just
  conv(disp head) -> generate_images_pred -> reprojection losses -> grad
and times it, so layout fixes iterate in ~1 min instead of ~10.

  python scripts/repro_warp_layout.py
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from polardepth_tpu.config import Config
from polardepth_tpu.train.selfsup import generate_images_pred
from polardepth_tpu.ops.losses import reprojection_loss

H, W, B = 320, 480, 12


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--barrier", action="store_true",
                   help="wrap grid_sample operands+output in "
                        "lax.optimization_barrier to detach the gathers "
                        "from the loss fusion/layout context")
    p.add_argument("--trace", action="store_true",
                   help="dump compiled HLO + jax.profiler trace for "
                        "scripts/trace_attribute.py")
    p.add_argument("--impl", default="flat4",
                   choices=("flat4", "patch", "strip", "band", "band64",
                            "band32_bf16", "band64_bf16"),
                   help="grid_sample gather strategy")
    a = p.parse_args()
    import functools
    import polardepth_tpu.ops.warp as warp_mod
    import polardepth_tpu.train.selfsup as ss
    inner = functools.partial(warp_mod.grid_sample, impl=a.impl)
    ss.grid_sample = inner
    if a.barrier:
        def barriered(img, grid, padding_mode="border",
                      align_corners=True):
            img, grid = jax.lax.optimization_barrier((img, grid))
            out = inner(img, grid, padding_mode, align_corners)
            return jax.lax.optimization_barrier(out)

        ss.grid_sample = barriered
    print(f"impl={a.impl} barrier={a.barrier}", flush=True)

    cfg = Config(height=H, width=W, batch_size=B,
                 depth_supervision_only=False, depth_supervision=True,
                 mesh_shape=(1,))
    rng = np.random.default_rng(0)
    color_frames = jnp.asarray(
        rng.uniform(0, 1, (B, 3, H, W, 3)).astype(np.float32))
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W, 1.92 * H
    K[0, 2], K[1, 2] = 0.5 * W, 0.5 * H
    Kb = jnp.asarray(np.tile(K, (B, 1, 1)))
    invKb = jnp.asarray(np.tile(np.linalg.inv(K).astype(np.float32),
                                (B, 1, 1)))
    # fixed poses: small translation
    T = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    T[:, 0, 3] = 0.05
    poses = {-1: jnp.asarray(T), 1: jnp.asarray(T)}
    params = jnp.asarray(rng.normal(0, 0.01, (3, 3, 3, 4)).astype(np.float32))

    def loss_fn(params, color_frames):
        # tiny conv producing 4 scale disps from the current frame, so the
        # warp grids carry gradients like the real decoder output does
        x = jax.lax.conv_general_dilated(
            color_frames[:, 0], params, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        raw = jax.nn.sigmoid(x)
        disps = {}
        for s in range(4):
            d = raw[:, ::2 ** s, ::2 ** s, s:s + 1]
            disps[("disp", s)] = d
        warped, depths = generate_images_pred(
            cfg, disps, poses, color_frames, Kb, invKb)
        total = 0.0
        for s in range(4):
            for f in (-1, 1):
                r = reprojection_loss(warped[("color", f, s)],
                                      color_frames[:, 0], True)
                total = total + jnp.mean(r)
        return total

    step = jax.jit(jax.grad(loss_fn))
    if a.trace:
        with open("/tmp/repro_hlo.txt", "w") as f:
            f.write(step.lower(params, color_frames)
                    .compile().as_text())
    t0 = time.perf_counter()
    g = step(params, color_frames)
    g.block_until_ready()
    print(f"compile+run: {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        g = step(params, color_frames)
    float(jnp.sum(g))
    dt = (time.perf_counter() - t0) / 5
    print(f"per-iter: {dt * 1e3:.1f} ms  "
          f"(8 warps x 4 corner-gathers of {B * H * W / 1e6:.2f} M rows)",
          flush=True)
    if a.trace:
        with jax.profiler.trace("/tmp/repro_trace"):
            for _ in range(3):
                g = step(params, color_frames)
            float(jnp.sum(g))
        print("trace written to /tmp/repro_trace", flush=True)


if __name__ == "__main__":
    main()
