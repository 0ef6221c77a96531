#!/usr/bin/env python
"""Physics-chain microbench: XOLP + Fresnel priors at the headline geometry.

The on-TPU roofline (roofline_tpu.json) puts the physics chain at 6.6-8.2x
its bandwidth floor.  Hypotheses probed here:

  1. FusedPiecewiseInterp serializes the compare-matrix contraction into
     P/chunk lax.scan steps (64 at 8x512x512 with the default 32768): the
     fixed per-step cost, not bandwidth, may dominate -> sweep chunk widths.
  2. Knot-count sensitivity: prune_tol 1e-5 keeps 950 knots, 1e-4 keeps 334
     (still well under the f32 evaluation noise vs the scipy oracle?  the
     parity tests pin 1e-5; 1e-4 is measured here for the curve only).

Methodology: bench.py's tunnel-immune chained scan — N iterations inside one
jit with index-dependent inputs, ONE scalar readback (a single dispatch over
the axon tunnel costs ~35 ms, larger than the op under test).

Writes bench_physics.json.  Run on TPU:  python scripts/bench_physics.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def chained_ms(make_body, x, chain=32, reps=5):
    """Median per-iteration ms of body(x + i) scanned `chain` times in one
    dispatch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x0):
        def body(carry, i):
            return carry + make_body(x0 + i.astype(x0.dtype)), None
        tot, _ = jax.lax.scan(body, jnp.float32(0),
                              jnp.arange(chain, dtype=jnp.int32))
        return tot

    float(run(x))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(x))
        ts.append((time.perf_counter() - t0) * 1e3 / chain)
    return sorted(ts)[len(ts) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, nargs=2, default=[512, 512])
    p.add_argument("--out", default=os.path.join(HERE, "bench_physics.json"))
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from polardepth_tpu.ops.xolp import xolp_from_pol
    from polardepth_tpu.ops.fresnel import (
        FusedPiecewiseInterp, normal_priors_from_xolp,
    )

    h, w = a.hw
    b = a.batch
    rng = np.random.default_rng(0)
    pol = jax.device_put(
        rng.integers(0, 255, (b, h, w, 4)).astype(np.float32))
    res = {"device": str(jax.devices()[0]), "geom": f"{b}x{h}x{w}",
           "method": "chained-scan (32 iters/dispatch)"}

    def rec(name, fn, x):
        try:
            res[name] = round(chained_ms(fn, x), 3)
        except Exception as e:
            res[name] = f"FAILED {type(e).__name__}"
        print(name, res[name], flush=True)
        with open(a.out, "w") as f:
            json.dump(res, f, indent=1)

    rec("chain_nhwc_ms",
        lambda px: jnp.sum(normal_priors_from_xolp(xolp_from_pol(px), 1.5))
        + jnp.sum(xolp_from_pol(px)), pol)
    rec("xolp_ms", lambda px: jnp.sum(xolp_from_pol(px)), pol)

    rho_flat = jax.device_put(
        rng.uniform(0, 0.75, (b * h * w,)).astype(np.float32))
    for chunk in (32768, 131072, 524288, b * h * w):
        interp = FusedPiecewiseInterp(1.5, chunk=chunk, prune_tol=1e-5)
        rec(f"fresnel_chunk_{chunk}_ms",
            lambda r, ip=interp: sum(jnp.sum(t) for t in ip(r)), rho_flat)

    for tol in (1e-4,):
        interp = FusedPiecewiseInterp(1.5, chunk=524288, prune_tol=tol)
        rec(f"fresnel_tol_{tol}_chunk524288_ms",
            lambda r, ip=interp: sum(jnp.sum(t) for t in ip(r)), rho_flat)

    # round-4 candidates: two-level hierarchical interp (pure XLA) and the
    # banded/planar fused Pallas kernel
    from polardepth_tpu.ops.fresnel import HierarchicalInterp
    hier = HierarchicalInterp(1.5, prune_tol=1e-5)
    rec("fresnel_hier_ms",
        lambda r: sum(jnp.sum(t) for t in hier(r)), rho_flat)
    rec("chain_hier_ms",
        lambda px: jnp.sum(normal_priors_from_xolp(
            xolp_from_pol(px), 1.5, method="hier"))
        + jnp.sum(xolp_from_pol(px)), pol)
    from polardepth_tpu.ops.pallas.polar_preprocess import (
        fused_polar_preprocess,
    )

    def pallas_chain(px):
        xo, pr = fused_polar_preprocess(px, 1.5)
        return jnp.sum(pr) + jnp.sum(xo)

    rec("chain_pallas_ms", pallas_chain, pol)

    # full chain with a wide-chunk interp (the candidate new default)
    from polardepth_tpu.ops import fresnel as fz
    fz._fused_interp.cache_clear()
    orig = fz.FusedPiecewiseInterp
    try:
        fz.FusedPiecewiseInterp = (
            lambda n, chunk=32768, prune_tol=None:
            orig(n, chunk=524288, prune_tol=prune_tol))
        rec("chain_nhwc_chunk524288_ms",
            lambda px: jnp.sum(normal_priors_from_xolp(
                xolp_from_pol(px), 1.5)) + jnp.sum(xolp_from_pol(px)), pol)
    finally:
        fz.FusedPiecewiseInterp = orig
        fz._fused_interp.cache_clear()

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
