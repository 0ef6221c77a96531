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
    if impl == "patch":
        return _grid_sample_patch(img, grid, padding_mode, align_corners)
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
