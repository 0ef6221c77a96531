#!/usr/bin/env python
"""Physics-chain microbench: XOLP + Fresnel priors at the headline geometry.

The on-TPU roofline (roofline_tpu.json) puts the physics chain at 6.6-8.2x
its bandwidth floor.  Hypotheses probed here:

  1. FusedPiecewiseInterp serializes the compare-matrix contraction into
     P/chunk lax.scan steps (64 at 8x512x512 with the default 32768): the
     fixed per-step cost, not bandwidth, may dominate -> sweep chunk widths.
  2. The chain's (B,H,W,1)-shaped intermediates may pay TPU tile-padding
     tax when materialized -> compare the production NHWC entry against a
     pre-flattened (P,) evaluation of the same math.

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


def median_ms(fn, reps=7):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return sorted(ts)[len(ts) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--hw", type=int, nargs=2, default=[512, 512])
    p.add_argument("--out", default=os.path.join(HERE, "bench_physics.json"))
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    from polardepth_tpu.ops.xolp import xolp_from_pol
    from polardepth_tpu.ops.fresnel import (
        FusedPiecewiseInterp, prune_knots, FresnelLUT,
        normal_priors_from_xolp,
    )

    h, w = a.hw
    b = a.batch
    rng = np.random.default_rng(0)
    pol = jax.device_put(
        rng.integers(0, 255, (b, h, w, 4)).astype(np.float32))
    res = {"device": str(jax.devices()[0]), "geom": f"{b}x{h}x{w}"}

    # --- full production chain (pol -> xolp -> 9ch priors), NHWC entry ----
    @jax.jit
    def chain(polx):
        x = xolp_from_pol(polx)
        pri = normal_priors_from_xolp(x, 1.5)
        return jnp.sum(x) + jnp.sum(pri)

    res["chain_nhwc_ms"] = round(median_ms(lambda: float(chain(pol))), 3)

    # --- xolp alone --------------------------------------------------------
    @jax.jit
    def xolp_only(polx):
        return jnp.sum(xolp_from_pol(polx))

    res["xolp_ms"] = round(median_ms(lambda: float(xolp_only(pol))), 3)

    # --- fresnel interp alone, chunk sweep ---------------------------------
    rho_flat = jax.device_put(
        rng.uniform(0, 0.75, (b * h * w,)).astype(np.float32))
    for chunk in (32768, 65536, 131072, 262144, 524288, b * h * w):
        interp = FusedPiecewiseInterp(1.5, chunk=chunk, prune_tol=1e-5)

        @jax.jit
        def f(r, interp=interp):
            td, t1, t2 = interp(r)
            return jnp.sum(td) + jnp.sum(t1) + jnp.sum(t2)

        try:
            res[f"fresnel_chunk_{chunk}_ms"] = round(
                median_ms(lambda: float(f(rho_flat))), 3)
        except Exception as e:  # OOM at the widest settings is informative
            res[f"fresnel_chunk_{chunk}_ms"] = f"FAILED {type(e).__name__}"
        print(f"chunk {chunk}: {res[f'fresnel_chunk_{chunk}_ms']}",
              flush=True)

    # knot-count sensitivity at the best-practice chunk
    for tol in (1e-5, 1e-4):
        lut = FresnelLUT(1.5)
        kn = sum(len(prune_knots(*c, tol)[0]) - 2 for c in
                 (lut.diffuse, lut.spec1, lut.spec2))
        interp = FusedPiecewiseInterp(1.5, chunk=262144, prune_tol=tol)

        @jax.jit
        def f2(r, interp=interp):
            td, t1, t2 = interp(r)
            return jnp.sum(td) + jnp.sum(t1) + jnp.sum(t2)

        res[f"fresnel_tol_{tol}_knots"] = kn
        res[f"fresnel_tol_{tol}_ms"] = round(
            median_ms(lambda: float(f2(rho_flat))), 3)

    with open(a.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
