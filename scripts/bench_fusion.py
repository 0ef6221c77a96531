#!/usr/bin/env python
"""Why do the shallow modality encoders run 2.5-3.5x above their roofline
floors, and which execution plan fixes it?  (VERDICT r4 #1)

Round 4's grouped-conv fusion (feature_group_count=2 at 128 channels) LOST
on the real graph: infer_512_bf16_phase_fusedenc 218.4 fps vs 268.9 unfused
(bench_suite.json).  This microbench isolates the lowering question on the
exact trunk geometry of a ShallowEncoder pair at 8x512x512 input:

  sep      two independent 64-channel conv chains (the production plan)
  grouped  one 128-channel groups=2 chain (round-4 FusedModalityEncoders)
  dense    one 128-channel DENSE chain whose kernels are block-diagonal
           embeddings of the two 64-channel kernels — 2x the MACs but a
           full-lane-tile layout and half the op count
  *_bn     the same chains with an inference-mode BatchNorm affine
           (f32 scale/bias islands, as in the real model) after every conv
  *_fold   BN folded into the conv weights (eval-only transform)

Prints a JSON table of ms per variant; PERF.md round-5 section interprets.

  python scripts/bench_fusion.py [--out bench_fusion.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

B, H, W = 8, 512, 512


def _setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


# The ShallowEncoder trunk after the stem, at 512-px input geometry
# (models/pre_encoders.py:37-58): resblock(3x3 x2)@256^2, conv5+pool
# ->128^2, resblock@128^2, conv5+pool ->64^2, resblock@64^2.
TRUNK = [
    ("res", 3, 256), ("res", 3, 256),
    ("pool", 5, 256),
    ("res", 3, 128), ("res", 3, 128),
    ("pool", 5, 128),
    ("res", 3, 64), ("res", 3, 64),
]


def make_params(rng, c, dtype):
    """One kernel+bias(+bn affine) per TRUNK conv for ONE chain of width c."""
    import jax.numpy as jnp
    ps = []
    for kind, k, _ in TRUNK:
        w = rng.normal(0, 0.05, (k, k, c, c)).astype(np.float32)
        b = rng.normal(0, 0.01, (c,)).astype(np.float32)
        scale = rng.uniform(0.8, 1.2, (c,)).astype(np.float32)
        bias = rng.normal(0, 0.01, (c,)).astype(np.float32)
        ps.append({"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype),
                   "scale": jnp.asarray(scale), "bias": jnp.asarray(bias)})
    return ps


def chain(x, params, groups, bn):
    """Run the trunk; bn: 'none' | 'affine' (f32 island, eval-mode BN) |
    'folded' (scale/bias folded into w/b — fold done OUTSIDE the timer)."""
    import jax.numpy as jnp
    from jax import lax
    dn = lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))
    for (kind, k, _), p in zip(TRUNK, params):
        pad = k // 2
        y = lax.conv_general_dilated(
            x, p["w"], (1, 1), [(pad, pad)] * 2, dimension_numbers=dn,
            feature_group_count=groups)
        y = y + p["b"]
        if bn == "affine":
            y = (y.astype(jnp.float32) * p["scale"]
                 + p["bias"]).astype(y.dtype)
        y = jnp.maximum(y, 0)
        if kind == "pool":
            y = lax.reduce_window(y, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
            x = y
        else:
            x = x + y if kind == "res" and y.shape == x.shape else y
    return x


def blockdiag(w1, w2):
    import jax.numpy as jnp
    k, _, c, _ = w1.shape
    z = jnp.zeros_like(w1)
    return jnp.concatenate([jnp.concatenate([w1, z], -1),
                            jnp.concatenate([z, w2], -1)], -2)


def fold(params):
    """Fold the BN affine into w/b (per-cout scale)."""
    out = []
    for p in params:
        s = p["scale"].astype(p["w"].dtype)
        out.append({"w": p["w"] * s, "b": p["b"] * s
                    + p["bias"].astype(p["b"].dtype),
                    "scale": p["scale"], "bias": p["bias"]})
    return out


def measure(fn, x, reps=7, chain_n=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(x):
        def body(c, i):
            return c + jnp.sum(fn(x + i.astype(x.dtype))), None
        tot, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(chain_n))
        return tot

    float(many(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(x))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2] / chain_n * 1000.0  # ms per pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "bench_fusion.json"))
    ap.add_argument("--dtype", default="bfloat16")
    a = ap.parse_args()
    jax = _setup_jax()
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x64a = jnp.asarray(rng.normal(0, 1, (B, H // 2, W // 2, 64)), a.dtype)
    x64b = jnp.asarray(rng.normal(0, 1, (B, H // 2, W // 2, 64)), a.dtype)
    x128 = jnp.concatenate([x64a, x64b], -1)
    p1 = make_params(rng, 64, a.dtype)
    p2 = make_params(rng, 64, a.dtype)
    pg = [{"w": jnp.concatenate([q1["w"], q2["w"]], -1),   # (k,k,64,128)
           "b": jnp.concatenate([q1["b"], q2["b"]], -1),
           "scale": jnp.concatenate([q1["scale"], q2["scale"]], -1),
           "bias": jnp.concatenate([q1["bias"], q2["bias"]], -1)}
          for q1, q2 in zip(p1, p2)]
    pd = [{"w": blockdiag(q1["w"], q2["w"]),               # (k,k,128,128)
           "b": jnp.concatenate([q1["b"], q2["b"]], -1),
           "scale": jnp.concatenate([q1["scale"], q2["scale"]], -1),
           "bias": jnp.concatenate([q1["bias"], q2["bias"]], -1)}
          for q1, q2 in zip(p1, p2)]

    res = {}

    def run(name, fn, x):
        res[name] = round(measure(fn, x), 3)
        print(f"{name}: {res[name]} ms", flush=True)
        with open(a.out, "w") as f:
            json.dump(res, f, indent=1)

    for bn in ("none", "affine", "folded"):
        sfx = {"none": "", "affine": "_bn", "folded": "_fold"}[bn]
        q1, q2 = (fold(p1), fold(p2)) if bn == "folded" else (p1, p2)
        qg = fold(pg) if bn == "folded" else pg
        qd = fold(pd) if bn == "folded" else pd
        ebn = "none" if bn == "folded" else bn
        run(f"sep{sfx}",
            lambda x, q1=q1, q2=q2, ebn=ebn: jnp.concatenate(
                [chain(x[..., :64], q1, 1, ebn),
                 chain(x[..., 64:], q2, 1, ebn)], -1), x128)
        run(f"grouped{sfx}",
            lambda x, qg=qg, ebn=ebn: chain(x, qg, 2, ebn), x128)
        run(f"dense{sfx}",
            lambda x, qd=qd, ebn=ebn: chain(x, qd, 1, ebn), x128)

    # numerics: dense block-diag == separate (same math, f32-exact)
    y_sep = np.asarray(jnp.concatenate(
        [chain(x64a, p1, 1, "affine"), chain(x64b, p2, 1, "affine")], -1),
        np.float32)
    y_dense = np.asarray(chain(x128, pd, 1, "affine"), np.float32)
    err = float(np.max(np.abs(y_sep - y_dense))
                / (np.max(np.abs(y_sep)) + 1e-9))
    res["dense_vs_sep_relerr"] = err
    print("dense vs sep max rel err:", err)
    with open(a.out, "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
