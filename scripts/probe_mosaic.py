#!/usr/bin/env python
"""Staged Mosaic (Pallas TPU compile path) health probe.

Round 1 found Mosaic on the axon-tunneled v5e unusable: ~245 s compiles,
numerically wrong atan2 octants, and device wedges when killed mid-compile
(ops/pallas/polar_preprocess.py STATUS note).  This probe re-checks, in
escalating stages so a failure pinpoints the layer:

  1. trivial elementwise kernel  (compiles? how long? correct?)
  2. iota/compare + select       (the one-hot machinery the band warp needs)
  3. MXU dot inside the kernel   (jnp.dot on VMEM refs)
  4. the _atan2 octant sweep     (VERDICT r2 #5: Mosaic vs interpret parity
     on a +-x/+-y/0 sign grid)
  5. fused_polar_preprocess      (the full round-1 kernel, Mosaic vs XLA)

Run each stage in a SEPARATE process (python scripts/probe_mosaic.py N) so
a wedged compile doesn't take the later stages down with it; never SIGKILL
mid-compile (round-1 wedged the tunnel for ~45 min that way) — use
`timeout --signal=TERM 600`.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stage1():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, y_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0 + y_ref[:]

    x = np.arange(8 * 128, dtype=np.float32).reshape(8, 128)
    y = np.ones((8, 128), np.float32)
    t0 = time.time()
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(x), jnp.asarray(y))
    out = np.asarray(out)
    dt = time.time() - t0
    err = np.max(np.abs(out - (x * 2 + y)))
    print(f"stage1 elementwise: compile+run {dt:.1f}s  max err {err:.2e}")
    return err < 1e-6


def stage2():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, o_ref):
        cols = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        o_ref[:] = jnp.where(cols == idx_ref[:], 1.0, 0.0)

    idx = np.tile(np.arange(8, dtype=np.int32)[:, None] * 7, (1, 128))
    t0 = time.time()
    out = np.asarray(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(idx)))
    dt = time.time() - t0
    want = (np.arange(128)[None] == idx).astype(np.float32)
    err = np.max(np.abs(out - want))
    print(f"stage2 iota/select: compile+run {dt:.1f}s  max err {err:.2e}")
    return err == 0


def stage3():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)

    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (256, 512)).astype(np.float32)
    b = rng.normal(0, 1, (512, 128)).astype(np.float32)
    t0 = time.time()
    out = np.asarray(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(jnp.asarray(a), jnp.asarray(b)))
    dt = time.time() - t0
    err = np.max(np.abs(out - a @ b)) / np.max(np.abs(a @ b))
    print(f"stage3 MXU dot: compile+run {dt:.1f}s  rel err {err:.2e}")
    return err < 1e-2


def stage4():
    """Mosaic vs interpret parity of the polar kernel's _atan2 on a sign
    grid (the round-2 diagnosed pi-offset octant bug)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from polardepth_tpu.ops.pallas.polar_preprocess import _atan2

    def kernel(y_ref, x_ref, o_ref):
        o_ref[:] = _atan2(y_ref[:], x_ref[:])

    vals = np.array([-2.0, -1.0, -1e-6, -0.0, 0.0, 1e-6, 1.0, 2.0],
                    np.float32)
    yy, xx = np.meshgrid(vals, vals, indexing="ij")
    y = np.tile(yy.reshape(-1, 1), (1, 128)).astype(np.float32)
    x = np.tile(xx.reshape(-1, 1), (1, 128)).astype(np.float32)

    def run(interpret):
        return np.asarray(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(y.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(jnp.asarray(y), jnp.asarray(x)))

    t0 = time.time()
    got = run(False)
    dt = time.time() - t0
    want_interp = run(True)
    want_np = np.arctan2(y, x)
    err_vs_interp = np.max(np.abs(got - want_interp))
    err_vs_np = np.max(np.abs(got - want_np))
    bad = np.argwhere(np.abs(got - want_np) > 1e-5)
    print(f"stage4 atan2: compile+run {dt:.1f}s  "
          f"max|mosaic-interp| {err_vs_interp:.2e}  "
          f"max|mosaic-np| {err_vs_np:.2e}")
    for r, c in bad[:8]:
        if c == 0:
            print(f"  y={y[r,0]:+.1e} x={x[r,0]:+.1e}: "
                  f"mosaic {got[r,0]:+.4f} np {want_np[r,0]:+.4f}")
    return err_vs_np < 1e-5


def stage5():
    import jax.numpy as jnp
    from polardepth_tpu.ops.pallas.polar_preprocess import (
        fused_polar_preprocess)
    from polardepth_tpu.ops.xolp import xolp_from_pol
    from polardepth_tpu.ops.fresnel import normal_priors_from_xolp

    rng = np.random.default_rng(0)
    pol = rng.uniform(0, 255, (2, 64, 128, 4)).astype(np.float32)
    t0 = time.time()
    xolp, priors = fused_polar_preprocess(jnp.asarray(pol))
    xolp, priors = np.asarray(xolp), np.asarray(priors)
    dt = time.time() - t0
    xolp_ref = np.asarray(xolp_from_pol(jnp.asarray(pol)))
    pri_ref = np.asarray(normal_priors_from_xolp(jnp.asarray(xolp_ref), 1.5))
    # f64 oracle for rho/phi: on TPU the XLA path's pinv contraction runs
    # default-precision (bf16 multiplies), so "reference" itself is rounded
    from polardepth_tpu.ops.xolp import _PINV
    abc = pol.astype(np.float64) @ np.asarray(_PINV, np.float64).T
    rho64 = np.hypot(abc[..., 1], abc[..., 2]) / abc[..., 0]
    rho64 = np.where(np.isfinite(rho64), rho64, 0.0)
    d_k = np.max(np.abs(xolp[..., 0] - rho64))
    d_x = np.max(np.abs(xolp_ref[..., 0] - rho64))
    print(f"  rho vs f64 oracle: kernel {d_k:.2e}   xla-path {d_x:.2e}")
    # AoLP comparison must be mod pi: phi = atan2(c, b)/2 sits on a branch
    # cut at c ~= 0, b < 0 where the kernel's FMA-ordered c and the XLA
    # path's dot-ordered c can land on opposite signs, flipping phi by pi
    # (the SAME polarization angle).  rho compares exactly; phi mod pi;
    # the prior normals up to the (x, y) sign that a pi azimuth flip
    # induces (z unchanged).
    e_rho = np.max(np.abs(xolp[..., 0] - xolp_ref[..., 0]))
    dphi = np.abs(xolp[..., 1] - xolp_ref[..., 1])
    e_phi = np.max(np.minimum(dphi, np.pi - dphi))
    e_pri = 0.0
    for ci in range(3):
        n, nr = priors[..., 3 * ci:3 * ci + 3], pri_ref[..., 3 * ci:3 * ci + 3]
        d_same = np.max(np.abs(n - nr), axis=-1)
        flip = np.stack([n[..., 0] + nr[..., 0], n[..., 1] + nr[..., 1],
                         n[..., 2] - nr[..., 2]], -1)
        d_flip = np.max(np.abs(flip), axis=-1)
        e_pri = max(e_pri, float(np.max(np.minimum(d_same, d_flip))))
    print(f"stage5 full kernel: compile+run {dt:.1f}s  rho err {e_rho:.2e}  "
          f"phi err (mod pi) {e_phi:.2e}  priors err (mod flip) {e_pri:.2e}")
    return max(e_rho, e_phi, e_pri) < 1e-4


if __name__ == "__main__":
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    ok = {1: stage1, 2: stage2, 3: stage3, 4: stage4, 5: stage5}[stage]()
    print(f"stage{stage}: {'OK' if ok else 'MISMATCH'}")
    sys.exit(0 if ok else 1)
