"""Pinhole camera geometry: backproject / project / depth warp.

Reference: manydepth/layers.py:383-443 (BackprojectDepth, Project3D) and
:502-535 (DepthWarping).  The reference pre-bakes batch-size-fixed pixel-grid
buffers inside nn.Modules; here the grids are trace-time constants so any
batch shape jits cleanly, and the per-batch matmuls run on the MXU.

Layout: depth maps are NHWC (B, H, W, 1); intrinsics are (B, 4, 4) as in the
dataset dict; point clouds are (B, 4, H*W) homogeneous, matching the
reference's algebra for drop-in loss parity.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _pixel_grid(h: int, w: int) -> np.ndarray:
    """(3, H*W) homogeneous pixel coordinates, x-major like np.meshgrid 'xy'."""
    xs, ys = np.meshgrid(range(w), range(h), indexing="xy")
    ones = np.ones_like(xs)
    return np.stack([xs, ys, ones]).reshape(3, -1).astype(np.float64)


def backproject_depth(depth: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Depth (B,H,W,1) + inv_K (B,4,4) -> homogeneous cam points (B,4,H*W)."""
    b, h, w, _ = depth.shape
    pix = jnp.asarray(_pixel_grid(h, w), dtype=depth.dtype)
    cam = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix)
    cam = depth.reshape(b, 1, h * w) * cam
    ones = jnp.ones((b, 1, h * w), dtype=depth.dtype)
    return jnp.concatenate([cam, ones], axis=1)


def project_3d(points: jnp.ndarray, K: jnp.ndarray, T: jnp.ndarray,
               height: int, width: int, eps: float = 1e-7) -> jnp.ndarray:
    """Cam points (B,4,H*W) + K,T (B,4,4) -> normalized grid coords
    (B,H,W,2) in [-1,1], ready for grid_sample."""
    b = points.shape[0]
    P = (K @ T)[:, :3, :]
    cam = jnp.einsum("bij,bjn->bin", P, points)
    pix = cam[:, :2, :] / (cam[:, 2:3, :] + eps)
    pix = pix.reshape(b, 2, height, width).transpose(0, 2, 3, 1)
    scale = jnp.asarray([width - 1, height - 1], dtype=points.dtype)
    return (pix / scale - 0.5) * 2.0


def scale_intrinsics(K: jnp.ndarray, factor: float) -> jnp.ndarray:
    """Scale pixel intrinsics (B,4,4) to a pyramid level: rows 0 (fx,cx) and
    1 (fy,cy) multiply by `factor` (the dataset's per-scale K construction,
    reference indoor_dataset.py:379-388)."""
    return K.at[:, 0].multiply(factor).at[:, 1].multiply(factor)


def warp_depth(depth: jnp.ndarray, inv_K: jnp.ndarray,
               T: jnp.ndarray) -> jnp.ndarray:
    """Rigidly transform a depth map's point cloud and return the z-buffer in
    the source pixel grid (reference DepthWarping.forward)."""
    b, h, w, _ = depth.shape
    pts = backproject_depth(depth, inv_K)
    moved = jnp.einsum("bij,bjn->bin", T, pts)
    return moved[:, 2, :].reshape(b, h, w, 1)
