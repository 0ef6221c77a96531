"""depth_to_normals golden tests vs a handwritten numpy oracle implementing
kornia 0.5.11 semantics (depth_to_3d -> normalized Sobel spatial_gradient with
replicate pad -> cross product -> L2 normalize), plus camera-geometry tests."""

import numpy as np
import jax.numpy as jnp

from polardepth_tpu.ops.normals import (
    depth_to_normals, depth_to_3d, spatial_gradient_sobel,
)
from polardepth_tpu.ops.camera import backproject_depth, project_3d, warp_depth

SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float64) / 8.0
SOBEL_Y = SOBEL_X.T


def _np_sobel(chan):
    """(H, W) -> (gx, gy) with replicate padding, cross-correlation."""
    p = np.pad(chan, 1, mode="edge")
    h, w = chan.shape
    gx = np.zeros_like(chan)
    gy = np.zeros_like(chan)
    for ky in range(3):
        for kx in range(3):
            win = p[ky:ky + h, kx:kx + w]
            gx += SOBEL_X[ky, kx] * win
            gy += SOBEL_Y[ky, kx] * win
    return gx, gy


def _oracle_depth_to_normals(depth, K):
    """depth: (H, W); K: (3, 3) -> (H, W, 3)."""
    h, w = depth.shape
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    x = (u - K[0, 2]) / K[0, 0] * depth
    y = (v - K[1, 2]) / K[1, 1] * depth
    xyz = np.stack([x, y, depth], axis=-1)
    gx = np.stack([_np_sobel(xyz[..., c])[0] for c in range(3)], axis=-1)
    gy = np.stack([_np_sobel(xyz[..., c])[1] for c in range(3)], axis=-1)
    n = np.cross(gx, gy)
    nn = np.linalg.norm(n, axis=-1, keepdims=True)
    return n / np.maximum(nn, 1e-12)


def _k(fx=340.0, fy=340.0, cx=240.0, cy=160.0):
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)


def test_sobel_gradients_match_oracle():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, 11, 3))
    gx, gy = spatial_gradient_sobel(jnp.asarray(x))
    for b in range(2):
        for c in range(3):
            ox, oy = _np_sobel(x[b, ..., c])
            np.testing.assert_allclose(np.asarray(gx)[b, ..., c], ox, atol=1e-6)
            np.testing.assert_allclose(np.asarray(gy)[b, ..., c], oy, atol=1e-6)


def test_depth_to_3d_pinhole():
    depth = np.full((4, 6), 2.0)
    K = _k(fx=100, fy=100, cx=3.0, cy=2.0)
    pts = np.asarray(depth_to_3d(jnp.asarray(depth)[None, ..., None],
                                 jnp.asarray(K)[None]))[0]
    # pixel at (u=3, v=2) is the principal point -> x=y=0
    np.testing.assert_allclose(pts[2, 3], [0, 0, 2.0], atol=1e-6)
    np.testing.assert_allclose(pts[2, 4], [0.02, 0, 2.0], atol=1e-6)


def test_depth_to_normals_matches_oracle():
    rng = np.random.default_rng(1)
    depth = 1.0 + 0.3 * rng.random((10, 14))
    K = _k()
    got = np.asarray(depth_to_normals(jnp.asarray(depth)[None, ..., None],
                                      jnp.asarray(K)[None]))[0]
    want = _oracle_depth_to_normals(depth, K)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_depth_to_normals_flat_plane_points_along_z():
    depth = np.full((8, 8), 1.5)
    got = np.asarray(depth_to_normals(jnp.asarray(depth)[None, ..., None],
                                      jnp.asarray(_k())[None]))[0]
    # A fronto-parallel plane's normal is +-z everywhere (interior pixels).
    assert np.all(np.abs(got[2:-2, 2:-2, 2]) > 0.99)


def test_backproject_project_roundtrip():
    """project(backproject(depth)) with identity pose == identity grid."""
    h, w = 6, 8
    depth = np.full((1, h, w, 1), 1.3, np.float32)
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 50.0, 55.0, 4.0, 3.0
    inv_K = np.linalg.inv(K)
    pts = backproject_depth(jnp.asarray(depth), jnp.asarray(inv_K)[None])
    grid = np.asarray(project_3d(pts, jnp.asarray(K)[None],
                                 jnp.asarray(np.eye(4, dtype=np.float32))[None],
                                 h, w))
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    want_x = (xs / (w - 1) - 0.5) * 2
    want_y = (ys / (h - 1) - 0.5) * 2
    np.testing.assert_allclose(grid[0, ..., 0], want_x, atol=1e-4)
    np.testing.assert_allclose(grid[0, ..., 1], want_y, atol=1e-4)


def test_warp_depth_translation_shifts_z():
    depth = np.full((1, 4, 5, 1), 2.0, np.float32)
    inv_K = np.eye(4, dtype=np.float32)[None]
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 0.5  # move 0.5 along +z
    out = np.asarray(warp_depth(jnp.asarray(depth), jnp.asarray(inv_K),
                                jnp.asarray(T)[None]))
    np.testing.assert_allclose(out, depth + 0.5, atol=1e-6)
