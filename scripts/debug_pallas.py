#!/usr/bin/env python
"""Bisect the Pallas Mosaic numerics bug (phi off by pi on TPU, correct in
interpreter mode — PERF.md round 1/2).

Stage A: a minimal kernel computing only the branch-free _atan2 over a
         sign-quadrant sweep (+ axes, zeros, subnormal-magnitude inputs),
         Mosaic vs interpret vs jnp.arctan2.
Stage B: the same kernel emitting every intermediate of the octant unfold
         (t, poly, r_after_swap, r_after_xneg, r_final) to localize the
         divergent select.
Stage C: the full fused_polar_preprocess on a synthetic pol grid.

Run on TPU only; never kill mid-compile.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax                                           # noqa: E402
import jax.numpy as jnp                              # noqa: E402
from jax.experimental import pallas as pl            # noqa: E402
from jax.experimental.pallas import tpu as pltpu     # noqa: E402

from polardepth_tpu.ops.pallas.polar_preprocess import (  # noqa: E402
    _atan2, fused_polar_preprocess)

TILE = 512


def make_inputs():
    """(N, 2) (y, x) pairs covering octants, axes, zeros, tiny/huge."""
    vals = np.array([0.0, 1e-30, 1e-6, 0.3, 0.9999, 1.0, 1.0001, 7.3, 1e20],
                    np.float32)
    ys, xs = [], []
    for sy in (1.0, -1.0):
        for sx in (1.0, -1.0):
            for vy in vals:
                for vx in vals:
                    ys.append(sy * vy)
                    xs.append(sx * vx)
    y = np.array(ys, np.float32)
    x = np.array(xs, np.float32)
    pad = (-len(y)) % TILE
    y = np.pad(y, (0, pad))
    x = np.pad(x, (0, pad), constant_values=1.0)
    return y.reshape(-1, 1), x.reshape(-1, 1)


def atan2_kernel(y_ref, x_ref, out_ref):
    out_ref[:] = _atan2(y_ref[:], x_ref[:])


def stages_kernel(y_ref, x_ref, out_ref):
    y = y_ref[:]
    x = x_ref[:]
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, jnp.float32(1e-37))
    s = t * t
    from polardepth_tpu.ops.pallas.polar_preprocess import _ATAN_COEF
    poly = jnp.float32(_ATAN_COEF[-1])
    for c in _ATAN_COEF[-2::-1]:
        poly = poly * s + jnp.float32(c)
    r0 = poly * t
    r1 = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r0, r0)
    r2 = jnp.where(x < 0, jnp.float32(np.pi) - r1, r1)
    r3 = jnp.where(y < 0, -r2, r2)
    out_ref[:] = jnp.concatenate(
        [t, r0, r1, r2, r3,
         (ay > ax).astype(jnp.float32), (x < 0).astype(jnp.float32),
         (y < 0).astype(jnp.float32)], axis=1)


def run_kernel(kernel, n_out, y, x, interpret):
    return pl.pallas_call(
        kernel,
        grid=(y.shape[0] // TILE,),
        in_specs=[pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, n_out), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((y.shape[0], n_out), jnp.float32),
        interpret=interpret,
    )(y, x)


def main():
    print("device:", jax.devices()[0], flush=True)
    y, x = make_inputs()
    yj, xj = jnp.asarray(y), jnp.asarray(x)

    print("== stage A: _atan2 kernel ==", flush=True)
    ref = np.arctan2(y[:, 0], x[:, 0])
    got_i = np.asarray(run_kernel(atan2_kernel, 1, yj, xj, True))[:, 0]
    print("interpret vs numpy max err:", np.abs(got_i - ref).max(), flush=True)
    got_m = np.asarray(run_kernel(atan2_kernel, 1, yj, xj, False))[:, 0]
    err = np.abs(got_m - ref)
    print("mosaic   vs numpy max err:", err.max(), flush=True)
    if err.max() > 1e-5:
        bad = np.argsort(-err)[:10]
        for i in bad:
            print(f"  y={y[i,0]:+.3e} x={x[i,0]:+.3e} "
                  f"ref={ref[i]:+.5f} mosaic={got_m[i]:+.5f}")
        print("== stage B: intermediates ==", flush=True)
        si = np.asarray(run_kernel(stages_kernel, 8, yj, xj, True))
        sm = np.asarray(run_kernel(stages_kernel, 8, yj, xj, False))
        names = ["t", "r0", "r1", "r2", "r3", "ay>ax", "x<0", "y<0"]
        for k, nm in enumerate(names):
            d = np.abs(si[:, k] - sm[:, k])
            print(f"  {nm:6s} max interp-vs-mosaic diff: {d.max():.3e} "
                  f"at idx {int(d.argmax())}")
        i = int(np.abs(si[:, 4] - sm[:, 4]).argmax())
        print("  worst row:", {n: (float(si[i, k]), float(sm[i, k]))
                               for k, n in enumerate(names)})

    print("== stage C: full preprocess ==", flush=True)
    rng = np.random.default_rng(0)
    pol = rng.uniform(0, 255, (4, 64, 64, 4)).astype(np.float32)
    xi, pi_ = fused_polar_preprocess(jnp.asarray(pol), interpret=True)
    xm, pm = fused_polar_preprocess(jnp.asarray(pol), interpret=False)
    print("xolp  max err:", np.abs(np.asarray(xi) - np.asarray(xm)).max())
    print("prior max err:", np.abs(np.asarray(pi_) - np.asarray(pm)).max())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
