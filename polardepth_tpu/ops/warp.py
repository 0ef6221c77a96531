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


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray,
                padding_mode: str = "border",
                align_corners: bool = True) -> jnp.ndarray:
    """Sample NHWC ``img`` at normalized coords ``grid`` (B, Ho, Wo, 2).

    grid[..., 0] = x in [-1, 1] over width, grid[..., 1] = y over height,
    matching torch's convention.
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
