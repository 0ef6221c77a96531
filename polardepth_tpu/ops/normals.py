"""Surface normals from depth — kornia 0.5.11 `depth_to_normals` semantics.

The reference's normals loss calls kornia.geometry.depth.depth_to_normals
twice per scale (trainer.py:1298-1309).  kornia 0.5.x computes:
  1. depth_to_3d: unproject each pixel with the pinhole model
     x = (u - cx)/fx * d,  y = (v - cy)/fy * d,  z = d   (normalize=False)
  2. spatial_gradient(mode='sobel', order=1, normalized=True): 3x3 Sobel
     kernels ([[-1,0,1],[-2,0,2],[-1,0,1]] and transpose) divided by 8
     (sum of |coeffs|), applied per channel with *replicate* padding as
     cross-correlation (kornia's kernel flip is a no-op for the 5-D reshape
     it uses).
  3. normals = cross(grad_x, grad_y) over the xyz channel, then
     F.normalize(p=2, dim=channel) with eps=1e-12 (x / max(||x||, eps)).

Re-derived here channels-last; the Sobel pass is a 3x3 depthwise conv that
XLA fuses with the surrounding elementwise math.  Golden-tested against a
handwritten numpy oracle in tests/test_normals.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_SOBEL_X = np.array([[-1.0, 0.0, 1.0],
                     [-2.0, 0.0, 2.0],
                     [-1.0, 0.0, 1.0]]) / 8.0
_SOBEL_Y = _SOBEL_X.T


def spatial_gradient_sobel(x: jnp.ndarray):
    """Per-channel normalized Sobel gradients with replicate padding.

    Implemented as an explicit 9-point shift-and-add stencil rather than a
    grouped conv: it is pure VPU elementwise work that XLA fuses into the
    surrounding normals math, and it sidesteps grouped-conv channel-ordering
    semantics entirely.

    Args:  x: (B, H, W, C)
    Returns: (gx, gy) each (B, H, W, C).
    """
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    def shifted(dy: int, dx: int):
        h, w = x.shape[1], x.shape[2]
        return jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(xp, dy, h, axis=1), dx, w, axis=2)

    tl, tc, tr = shifted(0, 0), shifted(0, 1), shifted(0, 2)
    ml, mr = shifted(1, 0), shifted(1, 2)
    bl, bc, br = shifted(2, 0), shifted(2, 1), shifted(2, 2)

    gx = ((tr - tl) + 2.0 * (mr - ml) + (br - bl)) * 0.125
    gy = ((bl - tl) + 2.0 * (bc - tc) + (br - tr)) * 0.125
    return gx, gy


def depth_to_3d(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 1) depth + (B, 3, 3) intrinsics -> (B, H, W, 3) cam points."""
    b, h, w, _ = depth.shape
    u = jnp.arange(w, dtype=depth.dtype)[None, None, :, None]
    v = jnp.arange(h, dtype=depth.dtype)[None, :, None, None]
    fx = K[:, 0, 0][:, None, None, None]
    fy = K[:, 1, 1][:, None, None, None]
    cx = K[:, 0, 2][:, None, None, None]
    cy = K[:, 1, 2][:, None, None, None]
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    return jnp.concatenate([x, y, depth], axis=-1)


def depth_to_normals(depth: jnp.ndarray, K: jnp.ndarray,
                     eps: float = 1e-12) -> jnp.ndarray:
    """(B, H, W, 1) depth + (B, 3, 3) K -> (B, H, W, 3) unit normals."""
    xyz = depth_to_3d(depth, K)
    gx, gy = spatial_gradient_sobel(xyz)
    n = jnp.cross(gx, gy)
    # Same forward as kornia's F.normalize (norm clamped from below), but
    # with the max INSIDE the sqrt: at degenerate points (flat depth ->
    # zero cross product) sqrt'(0)*0 = NaN would poison the whole gradient;
    # the saturated max gives a clean zero gradient there instead.
    sq = jnp.sum(n * n, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return n / norm


def _sobel_hw(x: jnp.ndarray):
    """Normalized Sobel gradients over the LAST TWO dims (replicate pad);
    the channels-leading analog of spatial_gradient_sobel (same math)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad, mode="edge")
    tl, tc, tr = xp[..., :-2, :-2], xp[..., :-2, 1:-1], xp[..., :-2, 2:]
    ml, mr = xp[..., 1:-1, :-2], xp[..., 1:-1, 2:]
    bl, bc, br = xp[..., 2:, :-2], xp[..., 2:, 1:-1], xp[..., 2:, 2:]
    gx = ((tr - tl) + 2.0 * (mr - ml) + (br - bl)) * 0.125
    gy = ((bl - tl) + 2.0 * (bc - tc) + (br - tr)) * 0.125
    return gx, gy


def depth_to_normals_hw(depth: jnp.ndarray, K: jnp.ndarray,
                        eps: float = 1e-12) -> jnp.ndarray:
    """Packed variant: (B, N, H, W) depths (N stacked maps sharing one K)
    + (B, 3, 3) K -> (B, N, 3, H, W) unit normals.

    Channels-leading execution plan of depth_to_normals for the TPU: every
    materialized tensor keeps (H, W) as the minor dims instead of a 1- or
    3-wide channel axis that XLA tile-pads to 128 lanes.  Same math
    (parity-tested in tests/test_packed_losses.py)."""
    b, n, h, w = depth.shape
    dt = depth.dtype
    u = jnp.arange(w, dtype=dt)[None, None, None, :]
    v = jnp.arange(h, dtype=dt)[None, None, :, None]
    fx = K[:, 0, 0][:, None, None, None]
    fy = K[:, 1, 1][:, None, None, None]
    cx = K[:, 0, 2][:, None, None, None]
    cy = K[:, 1, 2][:, None, None, None]
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    xyz = jnp.stack([x, y, depth], axis=2)        # (B, N, 3, H, W)
    gx, gy = _sobel_hw(xyz)
    nrm = jnp.cross(gx, gy, axis=2)
    sq = jnp.sum(nrm * nrm, axis=2, keepdims=True)
    return nrm / jnp.sqrt(jnp.maximum(sq, eps * eps))
