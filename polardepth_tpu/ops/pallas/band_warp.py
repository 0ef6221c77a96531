"""Pallas banded bilinear warp: grid_sample for row-coherent grids.

Why this kernel exists (round-3 profile, profile_student_r3f.json): the
reprojection warps dominate the self-sup/student step. XLA lowers every
per-pixel formulation of bilinear sampling to `lax.gather`, and TPU gather
is *index-rate*-bound (~40-50 M rows/s on v5e regardless of row width —
scripts/bench_gather.py), i.e. ~45 ms per (12,320,480,3) warp where the
HBM floor is ~0.1 ms.  The XLA-level "band" rewrite (ops/warp.py
_grid_sample_band) removes the per-pixel gather but XLA lowers its row-band
slice gather into a ~35k-iteration sequential dynamic-slice while-loop, so
it only ties the gather forms.

Here the band fetch is what it should be: ONE pipelined DMA per output row.

Algorithm (per output row r of batch b; grid = (B, OH) programs):
  1. base[b,r] = clip(min_j floor(iy[b,r,j]), 0, H-K) is precomputed on the
     XLA side and scalar-prefetched to SMEM; source y coords are clamped
     into [base, base+K-1] (exact bilinear whenever the row's vertical
     parallax fits the band — true for pose/plane warps; beyond it the warp
     degrades to a border-style vertical clamp, never garbage).
  2. The (K, C, W+1) source band at row base is DMA'd HBM->VMEM as a
     perfectly-tiled (K*C, W+1) tile (the image is pre-reshaped to
     (B, H*C, W+1) channel-planar-per-row on the XLA side, which makes the
     band slice contiguous), double-buffered across grid steps.
  3. Horizontal lerp: one MXU matmul  t = band @ M,  where M[x, j] =
     (x==x0_j)(1-fx_j) + (x==x0_j+1)fx_j is built in-register from a 2-D
     iota (never materialised in HBM).
  4. Vertical lerp: z = t * relu(1 - |iy_j - (base + k(row))|)  (VPU), then
     the K-groups are summed with a tiny (C, K*C) 0/1 selector matmul.

Gradients: a custom VJP computes d/d(ix, iy) with the same banded layout
(dM/dfx is a +-1 one-hot matrix; dwy/diy is a sign mask), so the backward
pass is two more band contractions instead of XLA's scatter.  The source
image gets a symbolic zero cotangent: every caller warps *data* (batch
colors / stop-gradient'ed lookup features), per the reference training
graphs (reference trainer.py:1041-1062, resnet_encoder.py:430-511).

Numerics: matmul operands are split into exact hi/lo bf16 halves and
combined with three default-precision MXU passes (b_hi@m_hi + b_hi@m_lo +
b_lo@m_hi); the dropped b_lo@m_lo term is O(2^-18) relative — f32-rounding
class.  `fast=True` collapses to one bf16 pass (~1e-3 relative) for
photometric-loss warps.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _split_hi_lo(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a32, b32, fast, interpret):
    """MXU product of two f32 operands via exact-bf16 hi/lo splitting.

    Interpret mode uses a plain f32 dot instead: XLA's
    bf16-conversion-folding pass elides f32->bf16 converts feeding a dot on
    CPU/GPU backends, which silently turns the hi half back into the full
    f32 value and makes the lo terms double-count.  Mosaic feeds the MXU
    real bf16 operands, where the decomposition is exact.
    """
    if interpret:
        # HIGHEST: interpret mode executes on whatever backend is live; on
        # TPU the default-precision f32 dot truncates operands to bf16.
        return jnp.dot(a32, b32, preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)
    if fast:
        return jnp.dot(a32.astype(jnp.bfloat16), b32.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    a_hi, a_lo = _split_hi_lo(a32)
    b_hi, b_lo = _split_hi_lo(b32)
    out = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    out += jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    out += jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    return out


def _dot_exact_rhs(a32, b_exact, fast, interpret):
    """a @ b where b is exactly bf16-representable (e.g. the +-1/0 dM
    one-hot): split only a — one fewer MXU pass than _dot3."""
    if interpret:
        return jnp.dot(a32, b_exact, preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)
    b_b = b_exact.astype(jnp.bfloat16)
    if fast:
        return jnp.dot(a32.astype(jnp.bfloat16), b_b,
                       preferred_element_type=jnp.float32)
    a_hi, a_lo = _split_hi_lo(a32)
    return (jnp.dot(a_hi, b_b, preferred_element_type=jnp.float32)
            + jnp.dot(a_lo, b_b, preferred_element_type=jnp.float32))


def _dot_onehot(sel, z, fast, interpret):
    """sel @ z where sel is an exact 0/1 matrix: split only z."""
    if interpret:
        return jnp.dot(sel, z, preferred_element_type=jnp.float32,
                       precision=lax.Precision.HIGHEST)
    sel_b = sel.astype(jnp.bfloat16)
    if fast:
        return jnp.dot(sel_b, z.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    z_hi, z_lo = _split_hi_lo(z)
    return (jnp.dot(sel_b, z_hi, preferred_element_type=jnp.float32)
            + jnp.dot(sel_b, z_lo, preferred_element_type=jnp.float32))


_TX = 128  # output-column tile width for the horizontal window (lane tile)


def _hx_start(t0, tw, hx, wp):
    """Static source-window start for the output tile [t0, t0+tw): centred
    on the tile, clipped into the padded width.  Must match _prep's
    per-column clip exactly (the XLA side pre-clips ix into this window so
    window clamps get exact zero gradients, like the vertical band)."""
    return min(max(t0 + tw // 2 - hx // 2, 0), wp - hx)


def _group_dma_scaffold(base_ref, img_ref, band, sem, *, C, KC, NG):
    """Shared DMA double-buffering over (batch, row-group) programs.
    Returns the VMEM slot holding this program's band."""
    b = pl.program_id(0)
    g = pl.program_id(1)
    idx = b * NG + g
    first = jnp.logical_and(b == 0, g == 0)
    last = idx == pl.num_programs(0) * pl.num_programs(1) - 1

    def dma(slot, i):
        bb = i // NG
        start = pl.multiple_of(base_ref[i] * C, 8)
        return pltpu.make_async_copy(
            img_ref.at[bb, pl.ds(start, KC), :], band.at[slot],
            sem.at[slot])

    slot = lax.rem(idx, jnp.int32(2))

    @pl.when(first)
    def _():
        dma(slot, idx).start()

    @pl.when(jnp.logical_not(last))
    def _():
        dma(1 - slot, idx + 1).start()

    dma(slot, idx).wait()
    return slot, idx


def _fwd_kernel(base_ref, ix_ref, iy_ref, img_ref, out_ref,
                band, sem, *, K, C, H, W, WP, OH, HX, R, fast, interpret):
    KC = K * C
    NG = OH // R
    slot, idx = _group_dma_scaffold(base_ref, img_ref, band, sem,
                                    C=C, KC=KC, NG=NG)
    base_s = base_ref[idx]
    Wp = WP

    ci = lax.broadcasted_iota(jnp.int32, (C, KC), 0)
    col = lax.broadcasted_iota(jnp.int32, (C, KC), 1)
    sel = (lax.rem(col, jnp.int32(C)) == ci).astype(jnp.float32)
    kidx_col = lax.broadcasted_iota(jnp.int32, (KC, 1), 0) // C

    for rr in range(R):
        ix = ix_ref[0, rr, 0, :]                            # (OW,)
        iy = iy_ref[0, rr, 0, :]
        OW = ix.shape[0]

        if HX:
            # Horizontally-windowed form: per static 128-column output
            # tile, contract only an HX-wide source window centred on it
            # (covers |ix - j| <= (HX-_TX)/2; _prep pre-clips ix into the
            # window).  Shrinks the one-hot build and the MXU contraction
            # from WP to HX.
            for t0 in range(0, OW, _TX):
                tw = min(_TX, OW - t0)
                s = _hx_start(t0, tw, HX, Wp)
                ixt = ix[t0:t0 + tw]
                x0 = jnp.floor(ixt)
                fx = ixt - x0
                x0i = x0.astype(jnp.int32) - s
                rows = lax.broadcasted_iota(jnp.int32, (HX, tw), 0)
                m = (jnp.where(rows == x0i[None, :], 1.0 - fx[None, :], 0.0)
                     + jnp.where(rows == x0i[None, :] + 1, fx[None, :], 0.0))
                t = _dot3(band[slot][:, s:s + HX], m, fast, interpret)
                yk = (base_s + kidx_col).astype(jnp.float32)
                wy = jnp.maximum(
                    0.0, 1.0 - jnp.abs(iy[t0:t0 + tw][None, :] - yk))
                out_ref[0, rr, :, t0:t0 + tw] = _dot_onehot(
                    sel, t * wy, fast, interpret)
            continue

        x0 = jnp.floor(jnp.clip(ix, 0.0, W - 1))
        fx = ix - x0
        x0i = x0.astype(jnp.int32)
        rows = lax.broadcasted_iota(jnp.int32, (Wp, OW), 0)
        m = (jnp.where(rows == x0i[None, :], 1.0 - fx[None, :], 0.0)
             + jnp.where(rows == x0i[None, :] + 1, fx[None, :], 0.0))

        t = _dot3(band[slot], m, fast, interpret)           # (KC, OW)

        yk = (base_s + kidx_col).astype(jnp.float32)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[None, :] - yk))
        z = t * wy

        out_ref[0, rr, :, :] = _dot_onehot(sel, z, fast, interpret)


def _bwd_kernel(base_ref, ix_ref, iy_ref, img_ref, g_ref,
                dix_ref, diy_ref, band, sem, *, K, C, H, W, WP, OH, HX, R,
                fast, interpret):
    """d/dix, d/diy for one output row.

    dout/dix[c,j] = sum_k wy * (band @ dM)          (dM = +-1 one-hot)
    dout/diy[c,j] = sum_k dwy * t,  dwy = -sign(iy - yk) on |.|<1
    then dix[j] = sum_c g[c,j] * dout/dix[c,j]  (same for diy).
    """
    KC = K * C
    NG = OH // R
    slot, idx = _group_dma_scaffold(base_ref, img_ref, band, sem,
                                    C=C, KC=KC, NG=NG)
    base_s = base_ref[idx]
    Wp = WP

    # expand g over the K groups via a 0/1 selector matmul:
    # gk[k*C+c, j] = g[c, j]  (per-row dynamic indexing is not
    # Mosaic-friendly; the selector runs one trivial MXU pass)
    selT = (lax.rem(lax.broadcasted_iota(jnp.int32, (KC, C), 0), jnp.int32(C))
            == lax.broadcasted_iota(jnp.int32, (KC, C), 1)
            ).astype(jnp.float32)
    kidx_col = lax.broadcasted_iota(jnp.int32, (KC, 1), 0) // C

    for rr in range(R):
        ix = ix_ref[0, rr, 0, :]
        iy = iy_ref[0, rr, 0, :]
        g = g_ref[0, rr, :, :]                              # (C, OW)
        OW = ix.shape[0]

        if HX:
            for t0 in range(0, OW, _TX):
                tw = min(_TX, OW - t0)
                s = _hx_start(t0, tw, HX, Wp)
                ixt = ix[t0:t0 + tw]
                x0 = jnp.floor(ixt)
                fx = ixt - x0
                x0i = x0.astype(jnp.int32) - s
                rows = lax.broadcasted_iota(jnp.int32, (HX, tw), 0)
                m = (jnp.where(rows == x0i[None, :], 1.0 - fx[None, :], 0.0)
                     + jnp.where(rows == x0i[None, :] + 1, fx[None, :], 0.0))
                dm = (jnp.where(rows == x0i[None, :] + 1, 1.0, 0.0)
                      - jnp.where(rows == x0i[None, :], 1.0, 0.0))
                bandx = band[slot][:, s:s + HX]
                t = _dot3(bandx, m, fast, interpret)
                tx = _dot_exact_rhs(bandx, dm, fast, interpret)
                yk = (base_s + kidx_col).astype(jnp.float32)
                dy = iy[t0:t0 + tw][None, :] - yk
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
                dwy = jnp.where(jnp.abs(dy) < 1.0, -jnp.sign(dy), 0.0)
                gk = _dot_onehot(selT, g[:, t0:t0 + tw], fast, interpret)
                dix_ref[0, rr, 0, t0:t0 + tw] = jnp.sum(gk * wy * tx, axis=0)
                diy_ref[0, rr, 0, t0:t0 + tw] = jnp.sum(gk * dwy * t, axis=0)
            continue

        x0 = jnp.floor(jnp.clip(ix, 0.0, W - 1))
        fx = ix - x0
        x0i = x0.astype(jnp.int32)
        rows = lax.broadcasted_iota(jnp.int32, (Wp, OW), 0)
        m = (jnp.where(rows == x0i[None, :], 1.0 - fx[None, :], 0.0)
             + jnp.where(rows == x0i[None, :] + 1, fx[None, :], 0.0))
        dm = (jnp.where(rows == x0i[None, :] + 1, 1.0, 0.0)
              - jnp.where(rows == x0i[None, :], 1.0, 0.0))

        t = _dot3(band[slot], m, fast, interpret)           # (KC, OW)
        tx = _dot_exact_rhs(band[slot], dm, fast, interpret)  # dM exact

        yk = (base_s + kidx_col).astype(jnp.float32)
        dy = iy[None, :] - yk
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(dy))
        dwy = jnp.where(jnp.abs(dy) < 1.0, -jnp.sign(dy), 0.0)

        gk = _dot_onehot(selT, g, fast, interpret)          # (KC, OW)

        dix_ref[0, rr, 0, :] = jnp.sum(gk * wy * tx, axis=0)
        diy_ref[0, rr, 0, :] = jnp.sum(gk * dwy * t, axis=0)


def _prep(img, grid, k, step, align_corners, wp=0, hx=0, rp=1):
    b, h, w, c = img.shape
    _, oh, ow, _ = grid.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5
    ix = jnp.clip(ix, 0.0, w - 1)
    if hx:
        # pre-clip ix into each output tile's static source window, so the
        # kernel never indexes outside band[:, s:s+HX] and window clamps
        # get exact zero gradients (clip's VJP), mirroring the vertical
        # band's clamp-at-the-XLA-level contract.
        lo = np.zeros((ow,), np.float32)
        for t0 in range(0, ow, _TX):
            tw = min(_TX, ow - t0)
            lo[t0:t0 + tw] = _hx_start(t0, tw, hx, wp)
        lo_j = jnp.asarray(lo)
        ix = jnp.clip(ix, lo_j, lo_j + (hx - 2))
    iy = jnp.clip(iy, 0.0, h - 1)
    base = _base_of(iy, h, k, step, rp)                      # (B, OH//rp)
    base_rows = jnp.repeat(base, rp, axis=1) if rp > 1 else base
    iy = jnp.clip(iy, base_rows[..., None].astype(iy.dtype),
                  (base_rows[..., None] + (k - 1)).astype(iy.dtype))
    return ix, iy, base


def _base_of(iy, h, k, step, rp=1):
    """Per-row-group band start: min of floor(iy) over the rp-row group,
    quantized DOWN to a multiple of `step` so the DMA's sublane start
    (base*C) is provably 8-aligned for Mosaic, clipped into [0, H-K]."""
    y0 = jnp.floor(iy).astype(jnp.int32)
    ymin = jnp.min(y0, axis=2)                               # (B, OH)
    if rp > 1:
        bsz, oh = ymin.shape
        ymin = jnp.min(ymin.reshape(bsz, oh // rp, rp), axis=2)
    base = (ymin // step) * step
    return jnp.clip(base, 0, max(h - k, 0))


def _planar(img, wp):
    """(B, H, W, C) -> (B, H*C, WP) channel-planar rows: one edge-pad
    column at x=W (border semantics for the x0+1 tap), then zero-pad to the
    128-lane multiple WP (Mosaic DMA slices must be lane-aligned; the pad
    columns always carry zero interpolation weight)."""
    b, h, w, c = img.shape
    padded = jnp.pad(img, ((0, 0), (0, 0), (0, 1), (0, 0)), mode="edge")
    padded = jnp.pad(padded, ((0, 0), (0, 0), (0, wp - (w + 1)), (0, 0)))
    return jnp.transpose(padded, (0, 1, 3, 2)).reshape(b, h * c, wp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _band_core(img2, ix, iy, dims, fast, interpret):
    out, _ = _band_fwd(img2, ix, iy, dims, fast, interpret)
    return out


def _pallas_fwd(img2, ix, iy, base, dims, fast, interpret):
    B, H, W, C, OH, OW, K, WP, STEP, HX, RP = dims
    NG = OH // RP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NG),
        in_specs=[
            pl.BlockSpec((1, RP, 1, OW), lambda b, g, base_ref: (b, g, 0, 0)),
            pl.BlockSpec((1, RP, 1, OW), lambda b, g, base_ref: (b, g, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, RP, C, OW),
                               lambda b, g, base_ref: (b, g, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, K * C, WP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(_fwd_kernel, K=K, C=C, H=H, W=W, WP=WP, OH=OH,
                             HX=HX, R=RP, fast=fast, interpret=interpret)
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, OH, C, OW), jnp.float32),
        interpret=interpret,
    )(base.reshape(-1), ix.reshape(B, OH, 1, OW), iy.reshape(B, OH, 1, OW),
      img2)
    return out


def _band_fwd(img2, ix, iy, dims, fast, interpret):
    B, H, W, C, OH, OW, K, WP, STEP, HX, RP = dims
    base = _base_of(iy, H, K, STEP, RP)
    out = _pallas_fwd(img2, ix, iy, base, dims, fast, interpret)
    return out, (img2, ix, iy, base)


def _band_bwd(dims, fast, interpret, res, g):
    B, H, W, C, OH, OW, K, WP, STEP, HX, RP = dims
    img2, ix, iy, base = res
    NG = OH // RP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, NG),
        in_specs=[
            pl.BlockSpec((1, RP, 1, OW), lambda b, g, base_ref: (b, g, 0, 0)),
            pl.BlockSpec((1, RP, 1, OW), lambda b, g, base_ref: (b, g, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, RP, C, OW),
                         lambda b, g, base_ref: (b, g, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, RP, 1, OW), lambda b, g, base_ref: (b, g, 0, 0)),
            pl.BlockSpec((1, RP, 1, OW), lambda b, g, base_ref: (b, g, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K * C, WP), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(_bwd_kernel, K=K, C=C, H=H, W=W, WP=WP, OH=OH,
                             HX=HX, R=RP, fast=fast, interpret=interpret)
    dix, diy = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, OH, 1, OW), jnp.float32),
                   jax.ShapeDtypeStruct((B, OH, 1, OW), jnp.float32)],
        interpret=interpret,
    )(base.reshape(-1), ix.reshape(B, OH, 1, OW), iy.reshape(B, OH, 1, OW),
      img2, g)
    return (jnp.zeros_like(img2), dix.reshape(B, OH, OW),
            diy.reshape(B, OH, OW))


_band_core.defvjp(_band_fwd, _band_bwd)


def band_warp(img: jnp.ndarray, grid: jnp.ndarray, *,
              k: int = 32, align_corners: bool = True,
              fast: bool = False, hx: int = 0, rp: int = 1,
              interpret: bool | None = None) -> jnp.ndarray:
    """grid_sample(padding_mode='border') via the banded Pallas kernel.

    Exact bilinear (to f32 rounding; ~1e-3 rel if fast=True) whenever each
    output row's source rows fit a K-row vertical band; vertical clamp to
    the band edge beyond that.  Differentiable w.r.t. `grid` only.

    hx > 0 additionally windows the horizontal contraction: each static
    128-column output tile samples only an hx-wide source window centred on
    it, exact while |ix - j| <= (hx - 128)/2 (clamp beyond, like the
    vertical band).  Shrinks the per-row one-hot build and MXU contraction
    from the padded image width to hx.

    rp > 1 processes rp consecutive output rows per Pallas program with ONE
    shared band DMA covering the group's union of source rows (k is widened
    by rp-1 to keep the same vertical-coverage margin).  This amortizes the
    per-program fixed cost (DMA issue/wait, grid step), the dominant term
    at small C; requires OH % rp == 0 (silently falls back to rp=1).
    """
    b, h, w, c = img.shape
    _, oh, ow, _ = grid.shape
    if rp > 1 and oh % rp != 0:
        rp = 1
    # widen the band so an rp-row group (source y advances ~1 row per
    # output row for pose/plane warps) keeps rp=1's coverage margin
    k = k + (rp - 1)
    if k > h:
        k = h
    # the band tile's sublane dim is K*C: round K up so it is a multiple
    # of the 8-sublane tiling
    import math
    step = 8 // math.gcd(c, 8)
    k = min(((k + step - 1) // step) * step, (h // step) * step)
    wp = ((w + 1 + 127) // 128) * 128
    if hx:
        hx = max(((hx + 127) // 128) * 128, 256)
        if hx >= wp:
            hx = 0  # window would be the whole width: use the plain form
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    ix, iy, _ = _prep(img, grid, k, step, align_corners, wp, hx, rp)
    img2 = _planar(img.astype(jnp.float32), wp)
    dims = (b, h, w, c, oh, ow, k, wp, step, hx, rp)
    out = _band_core(img2, ix, iy, dims, fast, interpret)
    return jnp.transpose(out, (0, 1, 3, 2)).astype(img.dtype)
