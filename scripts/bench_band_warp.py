#!/usr/bin/env python
"""Production-shape timing: Pallas band_warp vs the XLA patch gather.

Times the (12, 320, 480, 3) reprojection-warp shape (the self-sup/student
loss graph's hot op, 16 instances per step) with the chained-scan method
(serialized, output-feedback-perturbed) that defeats tunnel result caching.

  python scripts/bench_band_warp.py [--fwd-bwd]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--out", default="bench_band_warp.json")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from polardepth_tpu.ops.pallas.band_warp import band_warp
    from polardepth_tpu.ops.warp import grid_sample

    B, H, W, C = 12, 320, 480, 3
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((B, H, W, C)), jnp.float32)
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    th = 0.02
    gx = np.cos(th) * xs - np.sin(th) * ys + 0.03
    gy = np.sin(th) * xs + np.cos(th) * ys - 0.01
    grid = jnp.asarray(np.stack([gx, gy], -1)[None].repeat(B, 0),
                       jnp.float32)

    results = {}

    ref = grid_sample(img, grid, padding_mode="border", align_corners=True,
                      impl="patch")
    out = band_warp(img, grid, k=32, interpret=False)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"fwd max err vs patch: {err:.2e}", flush=True)
    results["fwd_max_err"] = err

    def chain_fwd(fn, n):
        @jax.jit
        def run(g):
            def body(c, _):
                o = fn(c)
                return c + 1e-12 * jnp.mean(o), ()
            c, _ = jax.lax.scan(body, g, None, length=n)
            return c
        run(grid).block_until_ready()
        t0 = time.time()
        run(grid).block_until_ready()
        return (time.time() - t0) / n

    def chain_grad(fn, n):
        @jax.jit
        def run(g):
            def body(c, _):
                val, gr = jax.value_and_grad(
                    lambda gg: jnp.sum(fn(gg)))(c)
                return c + 1e-12 * val + 1e-12 * gr, ()
            c, _ = jax.lax.scan(body, g, None, length=n)
            return c
        run(grid).block_until_ready()
        t0 = time.time()
        run(grid).block_until_ready()
        return (time.time() - t0) / n

    cases = [
        ("patch_fwd", lambda: chain_fwd(
            lambda g: grid_sample(img, g, padding_mode="border",
                                  align_corners=True, impl="patch"),
            a.reps)),
        ("pallas_k32_fwd", lambda: chain_fwd(
            lambda g: band_warp(img, g, k=32, interpret=False), a.reps)),
        ("pallas_k32_fast_fwd", lambda: chain_fwd(
            lambda g: band_warp(img, g, k=32, fast=True, interpret=False),
            a.reps)),
        ("patch_grad", lambda: chain_grad(
            lambda g: grid_sample(img, g, padding_mode="border",
                                  align_corners=True, impl="patch"),
            a.reps)),
        ("pallas_k32_grad", lambda: chain_grad(
            lambda g: band_warp(img, g, k=32, interpret=False), a.reps)),
        # the PRODUCTION student config (warp_impl="pallas_fast"): one bf16
        # pass per dot in both directions
        ("pallas_k32_fast_grad", lambda: chain_grad(
            lambda g: band_warp(img, g, k=32, fast=True, interpret=False),
            a.reps)),
    ]
    for name, thunk in cases:
        try:
            t = thunk()
            results[name + "_ms"] = round(t * 1e3, 2)
            print(f"{name:22s} {t * 1e3:8.2f} ms/warp", flush=True)
        except Exception as exc:
            results[name] = f"FAILED: {str(exc)[:200]}"
            print(f"{name:22s} FAILED: {str(exc)[:160]}", flush=True)

    with open(a.out, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", a.out, flush=True)


if __name__ == "__main__":
    main()
