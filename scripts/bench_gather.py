#!/usr/bin/env python
"""Microbenchmark grid_sample gather strategies on TPU.

Variants:
  flat4  — current: 4x take_along_axis on (B, H*W, C), 1x1xC rows
  patch  — ONE lax.gather of (1,2,2,C) patches at clamped (y0,x0) starts,
           then the bilinear lerp from the patch corners (border mode)
  pair2  — 2x lax.gather of (1,1,2,C) row-pairs (y0 and y1)

Shapes: the full-res reprojection warp (B,320,480,3) and the cost-volume
sweep tile (B,80,120,64) with D=96 hypotheses.

  python scripts/bench_gather.py
"""
from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def flat4(img, iy, ix):
    b, h, w, c = img.shape
    x0 = jnp.clip(jnp.floor(ix), 0, w - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(iy), 0, h - 1).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    lx = (ix - x0.astype(ix.dtype))[..., None]
    ly = (iy - y0.astype(iy.dtype))[..., None]
    flat = img.reshape(b, h * w, c)
    n = iy.shape[1]

    def take(yy, xx):
        idx = (yy * w + xx).reshape(b, n, 1)
        return jnp.take_along_axis(flat, idx, axis=1)

    v00 = take(y0, x0)
    v01 = take(y0, x1)
    v10 = take(y1, x0)
    v11 = take(y1, x1)
    return (v00 * (1 - lx) * (1 - ly) + v01 * lx * (1 - ly)
            + v10 * (1 - lx) * ly + v11 * lx * ly)


def patch(img, iy, ix):
    b, h, w, c = img.shape
    n = iy.shape[1]
    x0 = jnp.clip(jnp.floor(ix), 0, w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(iy), 0, h - 2).astype(jnp.int32)
    lx = (jnp.clip(ix, 0, w - 1) - x0.astype(ix.dtype))[..., None]
    ly = (jnp.clip(iy, 0, h - 1) - y0.astype(iy.dtype))[..., None]
    starts = jnp.stack([y0, x0], axis=-1)             # (B, N, 2)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    g = lax.gather(img, starts, dnums, slice_sizes=(1, 2, 2, c),
                   mode=lax.GatherScatterMode.CLIP)   # (B, N, 2, 2, C)
    v00, v01 = g[:, :, 0, 0], g[:, :, 0, 1]
    v10, v11 = g[:, :, 1, 0], g[:, :, 1, 1]
    return (v00 * (1 - lx) * (1 - ly) + v01 * lx * (1 - ly)
            + v10 * (1 - lx) * ly + v11 * lx * ly)


def pair2(img, iy, ix):
    b, h, w, c = img.shape
    x0 = jnp.clip(jnp.floor(ix), 0, w - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(iy), 0, h - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    lx = (jnp.clip(ix, 0, w - 1) - x0.astype(ix.dtype))[..., None]
    ly = (jnp.clip(iy, 0, h - 1) - y0.astype(iy.dtype))[..., None]
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )

    def row(yy):
        starts = jnp.stack([yy, x0], axis=-1)
        g = lax.gather(img, starts, dnums, slice_sizes=(1, 1, 2, c),
                       mode=lax.GatherScatterMode.CLIP)  # (B,N,1,2,C)
        return g[:, :, 0, 0], g[:, :, 0, 1]

    v00, v01 = row(y0)
    v10, v11 = row(y1)
    return (v00 * (1 - lx) * (1 - ly) + v01 * lx * (1 - ly)
            + v10 * (1 - lx) * ly + v11 * lx * ly)


def strip(img, iy, ix):
    """Two lane-packed gathers of contiguous (x0,x0+1) channel pairs with the
    huge N axis MINOR in the output (see ops/warp.py _grid_sample_strip)."""
    b, h, w, c = img.shape
    n = iy.shape[1]
    ix = jnp.clip(ix, 0.0, w - 1)
    iy = jnp.clip(iy, 0.0, h - 1)
    padded = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    flat = padded.reshape(b, (h + 1) * (w + 1) * c)
    x0 = jnp.clip(jnp.floor(ix), 0, w - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(iy), 0, h - 1).astype(jnp.int32)
    start0 = ((y0 * (w + 1) + x0) * c).reshape(b, n, 1)
    row = (w + 1) * c
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(1,),
        operand_batching_dims=(0,), start_indices_batching_dims=(0,))

    def g(starts):
        return lax.gather(flat, starts, dnums, slice_sizes=(1, 2 * c),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    g0, g1 = g(start0), g(start0 + row)                  # (B, 2C, N)
    fx = (ix.reshape(b, n) - x0.reshape(b, n).astype(ix.dtype))[:, None]
    fy = (iy.reshape(b, n) - y0.reshape(b, n).astype(iy.dtype))[:, None]
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(fx)).astype(img.dtype)
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(fx - 1.0)).astype(img.dtype)
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(fy)).astype(img.dtype)
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(fy - 1.0)).astype(img.dtype)
    top = g0[:, :c] * wx0 + g0[:, c:] * wx1
    bot = g1[:, :c] * wx0 + g1[:, c:] * wx1
    out = top * wy0 + bot * wy1                          # (B, C, N)
    return jnp.transpose(out, (0, 2, 1))


def make_bandmm(K=16, mm_dtype=jnp.bfloat16):
    """Gather-free (almost) bilinear warp: per output row, dynamic-slice a
    K-row vertical band (ONE gather of B*H big contiguous (K,W,C) slices —
    bandwidth-bound, not index-bound), then do the horizontal interpolation
    as a one-hot matmul on the MXU and the vertical 2-tap blend as a K-dot.

    EXACT bilinear iff every source y0 for output row r falls in
    [band_base(r), band_base(r)+K-2] with band_base = row-min of y0.
    Requires coords pre-clipped (border mode) and N == H*W coherent layout.
    """

    def bandmm(img, iy, ix):
        b, h, w, c = img.shape
        ix = jnp.clip(ix, 0.0, w - 1).reshape(b, h, w)
        iy = jnp.clip(iy, 0.0, h - 1).reshape(b, h, w)
        x0 = jnp.clip(jnp.floor(ix), 0, w - 1).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(iy), 0, h - 1).astype(jnp.int32)
        base = jnp.clip(jnp.min(y0, axis=2), 0, max(h - K, 0))  # (B,H)
        # ONE gather of (K, W, C) row-bands; pad bottom so base+K<=H+pad
        padded = jnp.pad(img, ((0, 0), (0, K), (0, 1), (0, 0)), mode="edge")
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(2, 3, 4), collapsed_slice_dims=(),
            start_index_map=(1,),
            operand_batching_dims=(0,), start_indices_batching_dims=(0,))
        band = lax.gather(
            padded, base[..., None], dnums, slice_sizes=(1, K, w + 1, c),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)  # (B,H,K,W+1,C)
        band = band.astype(mm_dtype)
        # horizontal one-hot interp as matmul over x (W+1 cols incl. pad)
        fx = ix - x0.astype(ix.dtype)
        cols = jnp.arange(w + 1, dtype=jnp.int32)
        m = ((cols[None, None, None] == x0[..., None]).astype(mm_dtype)
             * (1.0 - fx[..., None]).astype(mm_dtype)
             + (cols[None, None, None] == (x0[..., None] + 1)).astype(mm_dtype)
             * fx[..., None].astype(mm_dtype))            # (B,H,W_out,W+1)
        t = jnp.einsum("brcx,brkxq->brckq", m, band,
                       preferred_element_type=jnp.float32)  # (B,H,W,K,C)
        # vertical 2-tap blend: relu(1-|iy-(base+k)|) over the K taps
        ks = base[:, :, None, None] + jnp.arange(K)[None, None, None, :]
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[..., None]
                                            - ks.astype(iy.dtype)))
        out = jnp.einsum("brck,brckq->brcq", wy.astype(jnp.float32), t)
        return out.reshape(b, h * w, c)

    return bandmm


def bench(fn, img, iy, ix, reps=10):
    f = jax.jit(fn)
    out = f(img, iy, ix)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(img, iy, ix)
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps, out


def run_case(name, b, h, w, c, n, dtype):
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 1, (b, h, w, c)).astype(np.float32)
                      ).astype(dtype)
    # coherent coords: identity + smooth per-batch offset, like a real
    # reprojection warp (neighbouring points hit neighbouring pixels)
    reps = max(1, n // (h * w))
    ys, xs = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    base_y = np.tile(ys.reshape(-1), reps)[:n]
    base_x = np.tile(xs.reshape(-1), reps)[:n]
    off = rng.uniform(-6, 6, (b, 1)).astype(np.float32)
    iy = jnp.asarray(base_y[None] + off + rng.normal(0, .3, (b, n)).astype(np.float32))
    ix = jnp.asarray(base_x[None] + off + rng.normal(0, .3, (b, n)).astype(np.float32))
    print(f"--- {name}: img ({b},{h},{w},{c}) {np.dtype(dtype).name}, "
          f"N={n} pts/batch ---")
    ref = None
    # patch first: it is torch-parity-tested, so it is the numerics oracle
    # here (flat4 skips weight clipping in this microbench and is wrong at
    # out-of-range points)
    variants = [("patch", patch), ("flat4", flat4), ("pair2", pair2),
                ("strip", strip)]
    if n == h * w:   # bandmm needs coherent (H,W) output layout
        variants.append(("bandmm16", make_bandmm(K=16)))
        variants.append(("bandmm32", make_bandmm(K=32)))
        variants.append(("bandmm16f32", make_bandmm(K=16, mm_dtype=jnp.float32)))
        variants.append(("bandmm32f32", make_bandmm(K=32, mm_dtype=jnp.float32)))
    for fname, fn in variants:
        try:
            t, out = bench(fn, img, iy, ix)
            rows = b * n
            print(f"  {fname:12s} {t * 1e3:8.2f} ms   "
                  f"{rows / t / 1e6:8.1f} M rows/s")
            if ref is None:
                ref = np.asarray(out, np.float32).reshape(b, n, c)
            else:
                err = np.max(np.abs(np.asarray(out, np.float32
                                                ).reshape(b, n, c) - ref))
                print(f"         max|diff vs patch| = {err:.2e}")
        except Exception as exc:
            print(f"  {fname:12s} FAILED: {str(exc)[:160]}")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", default="all",
                    choices=("all", "reproj", "reproj16", "sweep"))
    args = ap.parse_args()
    print(jax.devices())
    if args.case in ("all", "reproj"):
        # full-res reprojection warp shape (one (frame,scale) combo)
        run_case("reproj f32", 12, 320, 480, 3, 320 * 480, jnp.float32)
    if args.case in ("reproj16",):
        # all 16 warps batched into one call (NOTE: crashes the axon remote
        # compile service for the lax.gather variants; run explicitly)
        run_case("reproj x16 f32", 12, 320, 480, 3, 16 * 320 * 480,
                 jnp.float32)
    if args.case in ("all", "sweep"):
        # cost-volume chunk (16 bins)
        run_case("sweep f32", 12, 80, 120, 64, 16 * 80 * 120, jnp.float32)
        run_case("sweep bf16", 12, 80, 120, 64, 16 * 80 * 120, jnp.bfloat16)
