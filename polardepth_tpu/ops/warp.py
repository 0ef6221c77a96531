"""Differentiable bilinear grid sampling (torch F.grid_sample semantics).

Used by the reprojection/self-supervised path (reference: trainer.py:1041-1062
samples with padding_mode="border", align_corners=True) and by the cost-volume
feature matching (resnet_encoder.py:480-488, padding_mode="zeros").

One flat gather per corner; the four corner reads share a single take() on a
flattened (B*H*W) index so XLA emits one gather kernel per corner rather than
per-pixel scalar loads.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def resolve_warp_impl(impl: str, cv: bool = False) -> str:
    """Resolve the "auto" sampler choice at trace time (VERDICT r4 #2b).

    On TPU, "auto" picks the banded Pallas kernels in their fast single-pass
    bf16 form — the production choice measured fastest in bench_suite:
      * photometric path -> "pallas_fast": ~1e-3 relative error, an order
        of magnitude below the ~4e-3 uint8 quantization already present in
        the photometric targets, and the backward pass (grads of a
        min-reduced robust loss) tolerates far more;
      * plane-sweep (cv=True) -> "pallas8_fast": the cost volume is
        stop-gradient'ed and interior-masked, so the fast kernel is exact
        on every surviving pixel (tested in tests/test_cost_volume.py).
    Off TPU, "auto" keeps the exact XLA forms ("patch" / "xla").  Any
    explicit impl string passes through untouched.
    """
    if impl != "auto":
        return impl
    import jax
    if jax.default_backend() == "tpu":
        return "pallas8_fast" if cv else "pallas_fast"
    return "xla" if cv else "patch"


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                padding_mode: str = "border",
                align_corners: bool = True,
                impl: str = "flat4") -> jnp.ndarray:
    """Sample NHWC ``img`` at normalized coords ``grid`` (B, Ho, Wo, 2).

    grid[..., 0] = x in [-1, 1] over width, grid[..., 1] = y over height,
    matching torch's convention.

    impl selects the gather strategy (identical numerics):
      flat4 — four take_along_axis corner gathers on (B, H*W, C) rows.
      patch — ONE lax.gather of (2, 2, C) windows from an edge/zero-padded
              copy, with per-patch-position relu weights
              max(0, 1-|ix-x_j|)*max(0, 1-|iy-y_i|) that exactly reproduce
              bilinear incl. every clamp case (the clipped window start
              rebases the weights instead of the indices).  4x fewer, 4x
              wider gather rows — the shape XLA's TPU gather emitter wants.
    """
    if impl == "auto":
        impl = resolve_warp_impl(impl)
    if impl == "patch":
        return _grid_sample_patch(img, grid, padding_mode, align_corners)
    if impl == "strip":
        return _grid_sample_strip(img, grid, padding_mode, align_corners)
    if impl.startswith("pallas"):
        # "pallas" | "pallas16" | "pallas32_fast" | "pallas_fast_hx[384]":
        # the banded Pallas kernel (border mode, row-coherent grids; see
        # ops/pallas/band_warp.py).  "_hx[N]" adds the horizontal source
        # window (default 256): exact while |ix - j| <= (N-128)/2.
        from polardepth_tpu.ops.pallas.band_warp import band_warp
        if padding_mode != "border":
            raise ValueError("impl='pallas*' supports padding_mode='border'")
        spec = impl[len("pallas"):]
        rp = 1
        if "_r" in spec and not spec.rpartition("_r")[2].startswith("hx") \
                and spec.rpartition("_r")[2].isdigit():
            spec, _, rps = spec.rpartition("_r")
            rp = int(rps)
        hx = 0
        if "_hx" in spec:
            spec, _, hxs = spec.rpartition("_hx")
            hx = int(hxs) if hxs else 256
        fast = spec.endswith("_fast")
        spec = spec.removesuffix("_fast")
        k = int(spec) if spec else 32
        return band_warp(img, grid, k=k, align_corners=align_corners,
                         fast=fast, hx=hx, rp=rp)
    if impl.startswith("band"):
        # "band" | "band64" | "band32_bf16" ...
        spec = impl[4:]
        mm_dtype = jnp.bfloat16 if spec.endswith("_bf16") else jnp.float32
        spec = spec.removesuffix("_bf16")
        k = int(spec) if spec else 32
        return _grid_sample_band(img, grid, padding_mode, align_corners,
                                 k=k, mm_dtype=mm_dtype)
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

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1)
        iy = jnp.clip(iy, 0.0, h - 1)
    elif padding_mode != "zeros":
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    lx = ix - x0
    ly = iy - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    if padding_mode == "zeros":
        vx0 = (x0 >= 0) & (x0 <= w - 1)
        vx1 = (x1 >= 0) & (x1 <= w - 1)
        vy0 = (y0 >= 0) & (y0 <= h - 1)
        vy1 = (y1 >= 0) & (y1 <= h - 1)
    x0c = jnp.clip(x0, 0, w - 1)
    x1c = jnp.clip(x1, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    y1c = jnp.clip(y1, 0, h - 1)

    flat = img.reshape(b, h * w, c)

    def gather(yi, xi):
        idx = yi * w + xi  # (B, Ho, Wo)
        return jnp.take_along_axis(
            flat, idx.reshape(b, oh * ow, 1), axis=1
        ).reshape(b, oh, ow, c)

    # weights in the image dtype: a bfloat16 image keeps the whole lerp at
    # half traffic (coordinate math above stays in the grid's precision)
    lx = lx.astype(img.dtype)
    ly = ly.astype(img.dtype)
    w00 = ((1 - lx) * (1 - ly))[..., None]
    w01 = (lx * (1 - ly))[..., None]
    w10 = ((1 - lx) * ly)[..., None]
    w11 = (lx * ly)[..., None]

    if padding_mode == "zeros":
        w00 = w00 * (vx0 & vy0)[..., None]
        w01 = w01 * (vx1 & vy0)[..., None]
        w10 = w10 * (vx0 & vy1)[..., None]
        w11 = w11 * (vx1 & vy1)[..., None]

    return (gather(y0c, x0c) * w00 + gather(y0c, x1c) * w01 +
            gather(y1c, x0c) * w10 + gather(y1c, x1c) * w11)


def _grid_sample_patch(img: jnp.ndarray, grid: jnp.ndarray,
                       padding_mode: str, align_corners: bool) -> jnp.ndarray:
    """One-gather bilinear sampling: fetch a (2, 2, C) window per output
    pixel from an image padded by one row/column, then combine with
    position-rebased weights.

    Why the weights are exact: for candidate column x_j = clip(floor(ix),
    0, W-1) + j (j in {0, 1}), bilinear assigns |1 - |ix - x_j|| when x_j
    is one of the two integers bracketing ix and 0 otherwise, which is
    relu(1 - |ix - x_j|) for ANY ix (incl. out-of-range zeros-mode points,
    whose windows are clipped inside the image and hence get weight 0, and
    the ix = W-1 border edge, whose second column is the replicated pad and
    gets weight 0).  Same along y.
    """
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

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1)
        iy = jnp.clip(iy, 0.0, h - 1)
        pad = ((0, 0), (0, 1), (0, 1), (0, 0))
        padded = jnp.pad(img, pad, mode="edge")
    elif padding_mode == "zeros":
        padded = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)))
    else:
        raise ValueError(f"unsupported padding_mode: {padding_mode}")

    x0 = jnp.clip(jnp.floor(ix), 0, w - 1).astype(jnp.int32)  # window start
    y0 = jnp.clip(jnp.floor(iy), 0, h - 1).astype(jnp.int32)

    starts = jnp.stack([y0.reshape(b, oh * ow),
                        x0.reshape(b, oh * ow)], axis=-1)     # (B, N, 2)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = lax.gather(
        padded, starts, dnums, slice_sizes=(1, 2, 2, c),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )                                                          # (B, N, 2, 2, C)

    fx = ix.reshape(b, oh * ow) - x0.reshape(b, oh * ow).astype(ix.dtype)
    fy = iy.reshape(b, oh * ow) - y0.reshape(b, oh * ow).astype(iy.dtype)
    # relu(1 - |frac - j|) for j = 0, 1; dtype of the image so a bf16 image
    # keeps the whole combine at half traffic
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(fx)).astype(img.dtype)
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(fx - 1.0)).astype(img.dtype)
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(fy)).astype(img.dtype)
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(fy - 1.0)).astype(img.dtype)

    out = (patches[:, :, 0, 0] * (wy0 * wx0)[..., None] +
           patches[:, :, 0, 1] * (wy0 * wx1)[..., None] +
           patches[:, :, 1, 0] * (wy1 * wx0)[..., None] +
           patches[:, :, 1, 1] * (wy1 * wx1)[..., None])
    return out.reshape(b, oh, ow, c)


def _grid_sample_strip(img: jnp.ndarray, grid: jnp.ndarray,
                       padding_mode: str, align_corners: bool) -> jnp.ndarray:
    """Lane-packed bilinear sampling: two lax.gathers of contiguous
    (x0, x0+1) channel pairs whose OUTPUT layout puts the huge pixel axis
    minor.

    Why this exists: a gather emitting (B, N, 2, 2, C) gets an XLA TPU
    layout with the size-C axis padded to the 128-lane tile — a ~128/C
    memory blowup on the write (measured 22 ms per warp gather at
    C=3, N=1.84M; see PERF.md round 3).  Mapping the slice into a MAJOR
    output dim via offset_dims=(1,) yields (B, 2C, N) with N minor:
    fully packed lanes, plain elementwise combines, one final
    planar->interleaved transpose.  Weights use the same position-rebased
    relu formulation as the patch impl (exact bilinear in every clamp
    case, both padding modes).
    """
    b, h, w, c = img.shape
    _, oh, ow, _ = grid.shape
    n = oh * ow
    gx = grid[..., 0]
    gy = grid[..., 1]

    if align_corners:
        ix = (gx + 1.0) * 0.5 * (w - 1)
        iy = (gy + 1.0) * 0.5 * (h - 1)
    else:
        ix = ((gx + 1.0) * w - 1.0) * 0.5
        iy = ((gy + 1.0) * h - 1.0) * 0.5

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, w - 1)
        iy = jnp.clip(iy, 0.0, h - 1)
        padded = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    elif padding_mode == "zeros":
        padded = jnp.pad(img, ((0, 0), (0, 1), (0, 1), (0, 0)))
    else:
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    flat = padded.reshape(b, (h + 1) * (w + 1) * c)

    x0 = jnp.clip(jnp.floor(ix), 0, w - 1).astype(jnp.int32)  # window start
    y0 = jnp.clip(jnp.floor(iy), 0, h - 1).astype(jnp.int32)
    start0 = ((y0 * (w + 1) + x0) * c).reshape(b, n, 1)
    row = (w + 1) * c

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1,),
        collapsed_slice_dims=(),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )

    def strip(starts):
        return lax.gather(
            flat, starts, dnums, slice_sizes=(1, 2 * c),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)    # (B, 2C, N)

    g0 = strip(start0)
    g1 = strip(start0 + row)

    fx = (ix.reshape(b, n) - x0.reshape(b, n).astype(ix.dtype))[:, None]
    fy = (iy.reshape(b, n) - y0.reshape(b, n).astype(iy.dtype))[:, None]
    # relu(1 - |frac - j|): exact bilinear weight of window column/row j
    # for ANY point incl. clamped window starts (see _grid_sample_patch)
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(fx)).astype(img.dtype)
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(fx - 1.0)).astype(img.dtype)
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(fy)).astype(img.dtype)
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(fy - 1.0)).astype(img.dtype)

    top = g0[:, :c] * wx0 + g0[:, c:] * wx1                   # (B, C, N)
    bot = g1[:, :c] * wx0 + g1[:, c:] * wx1
    out = top * wy0 + bot * wy1
    return jnp.transpose(out, (0, 2, 1)).reshape(b, oh, ow, c)


def _grid_sample_band(img: jnp.ndarray, grid: jnp.ndarray,
                      padding_mode: str, align_corners: bool,
                      k: int = 32,
                      mm_dtype=jnp.float32) -> jnp.ndarray:
    """Banded gather-free bilinear warp for ROW-COHERENT grids.

    TPU lax.gather is index-rate-bound (~40-50 M rows/s on v5e regardless of
    row width — see scripts/bench_gather.py), which makes the classic
    4-corner formulation ~400x slower than its HBM-bandwidth floor.  A
    reprojection/plane-sweep warp, however, is row-coherent: for one output
    row, the source rows y0 span a narrow band.  So instead of per-pixel
    gathers:

      1. ONE lax.gather of a contiguous (k, W+1, C) row-band per output row
         at the row's min source row (large contiguous slices: this gather
         IS bandwidth-bound, ~1 ms at (12,320,480,3) k=32);
      2. horizontal lerp as a one-hot matmul over the W+1 columns (MXU);
      3. vertical lerp as a k-tap dot with relu(1-|iy-row|) weights (exact
         2-tap bilinear: all but the two bracketing taps get weight 0).

    Exactness envelope: bit-equal bilinear whenever every source y lands in
    [base_r, base_r + k - 1] where base_r = min over the output row of
    floor(iy) (true for pose/plane warps with bounded vertical parallax —
    asserted per-K in tests/test_resize_warp.py).  Pixels beyond the band
    are vertically CLAMPED to the band edge (graceful, border-like), never
    zeroed.  padding_mode='border' only (the reprojection path's mode,
    reference trainer.py:1041-1062).

    mm_dtype=bfloat16 halves the matmul cost but rounds the lerp weights to
    8-bit mantissa (~1e-2 relative error) — acceptable for photometric-loss
    warps, not for torch-parity.
    """
    if padding_mode != "border":
        raise ValueError("impl='band*' supports padding_mode='border' only")
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
    iy = jnp.clip(iy, 0.0, h - 1)

    y0 = jnp.floor(iy).astype(jnp.int32)                     # (B, OH, OW)
    base = jnp.clip(jnp.min(y0, axis=2), 0, max(h - k, 0))   # (B, OH)
    # graceful vertical clamp into the band (no-op when the row's vertical
    # spread fits the k-2 interior)
    iy = jnp.clip(iy, base[..., None].astype(iy.dtype),
                  (base[..., None] + (k - 1)).astype(iy.dtype))

    # one contiguous (k, W+1, C) slice per output row — bandwidth-bound
    padded = jnp.pad(img, ((0, 0), (0, k), (0, 1), (0, 0)), mode="edge")
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1,),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    band = lax.gather(
        padded, base[..., None], dnums, slice_sizes=(1, k, w + 1, c),
        mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)        # (B,OH,k,W+1,C)
    band = band.astype(mm_dtype)

    # horizontal: one-hot interpolation matrix over the W+1 columns
    x0 = jnp.clip(jnp.floor(ix), 0, w - 1).astype(jnp.int32)
    fx = ix - x0.astype(ix.dtype)
    cols = jnp.arange(w + 1, dtype=jnp.int32)
    m = ((cols[None, None, None] == x0[..., None]).astype(mm_dtype)
         * (1.0 - fx[..., None]).astype(mm_dtype)
         + (cols[None, None, None] == (x0[..., None] + 1)).astype(mm_dtype)
         * fx[..., None].astype(mm_dtype))                   # (B,OH,OW,W+1)
    # TPU's DEFAULT f32 dot truncates operands to bf16 (single pass); the
    # one-hot contraction must run HIGHEST for mm_dtype=f32 to mean "exact
    # bilinear" on device, not just in the CPU tests.
    prec = ("highest" if mm_dtype == jnp.float32 else "default")
    t = jnp.einsum("brcx,brkxq->brckq", m, band, precision=prec,
                   preferred_element_type=jnp.float32)       # (B,OH,OW,k,C)

    # vertical: relu(1-|iy-(base+j)|) is the exact 2-tap bilinear weight
    ks = base[:, :, None, None] + jnp.arange(k, dtype=jnp.int32)
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(iy[..., None] - ks.astype(iy.dtype)))
    out = jnp.einsum("brck,brckq->brcq", wy.astype(jnp.float32), t,
                     precision=prec)
    return out.astype(img.dtype)
