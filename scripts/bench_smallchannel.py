#!/usr/bin/env python
"""Probe: are the decoder's small-channel full-res stages paying an XLA
lane-padding tax, and does a phase-packed (space-to-depth) rewrite win?

Theory (PERF.md round-3 roofline): the depth decoder measures ~2x above its
realistic MXU-tiling floor.  Suspected cause: tensors with minor dim 16
(stage-0 activations at full res) occupy (8,128)-tiled HBM layouts padded to
128 lanes — 8x traffic inflation — and the 16-out-channel convs run at
12.5% MXU lane utilization.  A phase-packed rewrite keeps the same math in a
(H/2, W/2, 4C) layout: upsample2x+conv3x3 fuses into ONE 3x3 conv producing
the 4 output phases (kernel = fixed linear transform of the original 3x3
weights, derived in ops/phase_decoder.py), so the full-res 16-channel tensor
is never materialized and the conv runs with 64 output lanes.

Measures (bf16, production fast-decoder geometry, batch 8 @512):
  conv16_full   3x3 conv 16->16 @ (8,512,512,16)      [current stage-0 tail]
  conv64_half   3x3 conv 64->64 @ (8,256,256,64)      [dense phase cost: 4x FLOPs]
  tail_current  upsample2x -> conv3x3(16) -> ELU -> disp conv3x3(1) -> sigmoid
  tail_phase    conv3x3(16->64 phase) -> ELU -> conv3x3(64->4 phase) -> sigmoid
                -> depth_to_space                      [same math, s2d layout]
  copy16 / copy64   x+1 roundtrip at both layouts     [traffic tax probe]

Timing: chained lax.scan (every step depends on the carry) + scalar
readback, immune to the tunnel's non-blocking block_until_ready.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

B, H2, W2, C = 8, 256, 256, 16   # stage-0 pre-upsample activation geometry
CHAIN = 16
REPS = 8


def timed(make_step, x0, chain=CHAIN, reps=REPS):
    """make_step(x) -> y with y reducible; chains `chain` dependent calls."""

    @jax.jit
    def run(x):
        def body(carry, _):
            y = make_step(x * (1.0 + 1e-6 * carry))
            s = jnp.sum(y.astype(jnp.float32))
            return carry + s * 1e-20, s

        carry, _ = lax.scan(body, jnp.float32(0.0), None, length=chain)
        return carry

    out = float(run(x0))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = float(run(x0))
    dt = (time.perf_counter() - t0) / (reps * chain)
    return dt, out


def conv(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x_half = jnp.asarray(rng.normal(0, 1, (B, H2, W2, C)), dtype=dt)
    x_full = jnp.asarray(rng.normal(0, 1, (B, 2 * H2, 2 * W2, C)), dtype=dt)
    x_s2d = jnp.asarray(rng.normal(0, 1, (B, H2, W2, 4 * C)), dtype=dt)

    w16 = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, C)), dtype=dt)
    w64 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 4 * C, 4 * C)), dtype=dt)
    wd16 = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, 1)), dtype=dt)
    wd64 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 4 * C, 4)), dtype=dt)

    from polardepth_tpu.ops.resize import upsample2x

    results = {}

    def rec(name, fn, x):
        t, _ = timed(fn, x)
        results[name] = t * 1e3
        print(f"  {name:14s} {t * 1e3:8.3f} ms", flush=True)

    rec("copy16_full", lambda x: x + jnp.bfloat16(1.0), x_full)
    rec("copy64_half", lambda x: x + jnp.bfloat16(1.0), x_s2d)
    rec("conv16_full", lambda x: conv(x, w16), x_full)
    rec("conv64_half", lambda x: conv(x, w64), x_s2d)

    def tail_current(x):
        u = upsample2x(x)
        y = jax.nn.elu(conv(u, w16))
        return jax.nn.sigmoid(conv(y.astype(jnp.float32),
                                   wd16.astype(jnp.float32)))

    def tail_phase(x):
        # dense stand-ins for the phase-transformed kernels: identical
        # shapes/layouts to the fused rewrite, so identical cost
        y = jax.nn.elu(conv(x, jnp.asarray(
            np.random.default_rng(1).normal(0, 0.1, (3, 3, C, 4 * C)),
            dtype=dt)))
        d = jax.nn.sigmoid(conv(y.astype(jnp.float32),
                                wd64.astype(jnp.float32)))
        b, h, w, c4 = d.shape
        d = d.reshape(b, h, w, 2, 2).transpose(0, 1, 3, 2, 4)
        return d.reshape(b, 2 * h, 2 * w, 1)

    rec("tail_current", tail_current, x_half)
    rec("tail_phase", tail_phase, x_half)

    # stage-1 geometry: up(32ch@256) ++ skip(64ch@256->512?) — no: stage 1 is
    # conv(32)@(128sq for 512 input? use published 512 geometry): x 32ch@H/4,
    # upsample to H/2, concat 64ch skip, conv -> 32.  Phase version: conv
    # 32->128 phase + s2d(skip) 256ch dense conv -> 128.
    x1 = jnp.asarray(rng.normal(0, 1, (B, 128, 128, 32)), dtype=dt)
    skip = jnp.asarray(rng.normal(0, 1, (B, 256, 256, 64)), dtype=dt)
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, 96, 32)), dtype=dt)
    w1p = jnp.asarray(rng.normal(0, 0.1, (3, 3, 32, 128)), dtype=dt)
    w1s = jnp.asarray(rng.normal(0, 0.1, (3, 3, 256, 128)), dtype=dt)

    def stage1_current(x):
        u = upsample2x(x)
        y = jnp.concatenate([u, skip], axis=-1)
        return jax.nn.elu(conv(y, w1))

    def stage1_phase(x):
        s = skip.reshape(B, 128, 2, 128, 2, 64).transpose(0, 1, 3, 2, 4, 5)
        s = s.reshape(B, 128, 128, 256)
        return jax.nn.elu(conv(x, w1p) + conv(s, w1s))

    rec("stage1_current", stage1_current, x1)
    rec("stage1_phase", stage1_phase, x1)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_smallchannel.json")
    with open(out, "w") as f:
        json.dump({"geometry": f"B{B} 512px bf16", "ms": results}, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
