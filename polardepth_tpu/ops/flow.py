"""Optical-flow warping ops (reference layers.py:152-326 — dead code in the
published config, kept for capability parity).

backward_warp_flow: sample an image at grid + flow (warp im2 back to im1).
forward_warp_splat: softsplat-style forward warping via bilinear
scatter-add — the reference's transformerFwd, vectorised with
jax scatter-adds instead of per-corner torch scatter loops.
"""

from __future__ import annotations

import jax.numpy as jnp

from polardepth_tpu.ops.warp import grid_sample


def backward_warp_flow(img: jnp.ndarray, flow: jnp.ndarray,
                       use_mask: bool = False) -> jnp.ndarray:
    """img: (B, H, W, C); flow: (B, H, W, 2) pixel offsets (x, y).

    Matches warp_flow (layers.py:152-188): grid + flow normalized to [-1, 1]
    over (size-1), zeros padding, align_corners=True; optional validity mask
    thresholded at 0.9999.
    """
    b, h, w, _ = img.shape
    xs = jnp.arange(w, dtype=img.dtype)
    ys = jnp.arange(h, dtype=img.dtype)
    gx = (xs[None, None, :] + flow[..., 0]) * 2.0 / max(w - 1, 1) - 1.0
    gy = (ys[None, :, None] + flow[..., 1]) * 2.0 / max(h - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    out = grid_sample(img, grid, padding_mode="zeros", align_corners=True)
    if use_mask:
        ones = jnp.ones_like(img)
        mask = grid_sample(ones, grid, padding_mode="zeros",
                           align_corners=True)
        mask = jnp.where(mask < 0.9999, 0.0, 1.0)
        return out * mask
    return out


def forward_warp_splat(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Forward warping by bilinear scatter-add (reference transformerFwd,
    layers.py:191-326).  img: (B, H, W, C); flow in *normalized* units as in
    the reference (relative to (size-1)/2); returns the splatted image."""
    b, h, w, c = img.shape
    xs = jnp.linspace(-1.0, 1.0, w, dtype=img.dtype)
    ys = jnp.linspace(-1.0, 1.0, h, dtype=img.dtype)
    xt = xs[None, None, :] + flow[..., 0] / ((w - 1.0) / 2.0)
    yt = ys[None, :, None] + flow[..., 1] / ((h - 1.0) / 2.0)
    # to pixel coords
    x = (xt + 1.0) * (w - 1.0) / 2.0
    y = (yt + 1.0) * (h - 1.0) / 2.0
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    lx = x - x0
    ly = y - y0

    out = jnp.zeros((b, h, w, c), img.dtype)

    def splat(out, xi, yi, weight):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        contrib = img * (weight * valid.astype(img.dtype))[..., None]
        return out.at[
            jnp.arange(b)[:, None, None], yi_c, xi_c].add(contrib)

    out = splat(out, x0, y0, (1 - lx) * (1 - ly))
    out = splat(out, x0 + 1, y0, lx * (1 - ly))
    out = splat(out, x0, y0 + 1, (1 - lx) * ly)
    out = splat(out, x0 + 1, y0 + 1, lx * ly)
    return out
