"""Pallas banded-warp kernel vs the torch-parity `patch` grid_sample.

The `patch` impl is the numerics oracle (torch-semantics tested in
tests/test_resize_warp.py).  The band kernel is exact whenever each output
row's source rows fit its K-row band (after the 8-row base quantization the
usable envelope is K-8 rows of vertical parallax); these tests stay inside
that envelope, plus one test that leaves it deliberately and checks the
graceful vertical clamp.

All tests run the kernel in interpreter mode (CPU); the Mosaic-vs-interpret
TPU parity test lives at the bottom and skips off-TPU, mirroring
tests/test_pallas_preprocess.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polardepth_tpu.ops.pallas.band_warp import band_warp
from polardepth_tpu.ops.warp import grid_sample


def _rot_grid(B, H, W, th=0.03, tx=0.05, ty=-0.02):
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    gx = np.cos(th) * xs - np.sin(th) * ys + tx
    gy = np.sin(th) * xs + np.cos(th) * ys + ty
    return jnp.asarray(np.stack([gx, gy], -1)[None].repeat(B, 0),
                       jnp.float32)


def _img(B, H, W, C, seed=0):
    return jnp.asarray(np.random.default_rng(seed).random((B, H, W, C)),
                       jnp.float32)


@pytest.mark.parametrize("C", [3, 64])
def test_forward_matches_patch(C):
    B, H, W = 2, 40, 48
    img = _img(B, H, W, C)
    grid = _rot_grid(B, H, W)
    ref = grid_sample(img, grid, padding_mode="border",
                      align_corners=True, impl="patch")
    out = band_warp(img, grid, k=16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6)


def test_forward_align_corners_false():
    B, H, W, C = 2, 32, 40, 3
    img = _img(B, H, W, C)
    grid = _rot_grid(B, H, W, th=0.01)
    ref = grid_sample(img, grid, padding_mode="border",
                      align_corners=False, impl="patch")
    out = band_warp(img, grid, k=16, align_corners=False, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6)


def test_integer_coordinates_exact():
    """Identity + integer shifts must reproduce pixels exactly (the relu
    weight formulation's edge case: fx == 0)."""
    B, H, W, C = 1, 24, 32, 3
    img = _img(B, H, W, C)
    jj, ii = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    gx = ii / (W - 1) * 2 - 1
    gy = jj / (H - 1) * 2 - 1
    grid = jnp.asarray(np.stack([gx, gy], -1)[None], jnp.float32)
    out = band_warp(img, grid, k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_grad_matches_patch_autodiff():
    B, H, W, C = 2, 32, 40, 3
    img = _img(B, H, W, C)
    grid = _rot_grid(B, H, W)

    def loss_band(g):
        return jnp.sum(jnp.sin(band_warp(img, g, k=16, interpret=True)))

    def loss_ref(g):
        return jnp.sum(jnp.sin(grid_sample(
            img, g, padding_mode="border", align_corners=True,
            impl="patch")))

    g1 = jax.grad(loss_band)(grid)
    g2 = jax.grad(loss_ref)(grid)
    scale = float(jnp.max(jnp.abs(g2)))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               atol=1e-4 * max(scale, 1.0))


def test_out_of_band_clamps_not_garbage():
    """A grid whose vertical spread exceeds K degrades to a band-edge
    clamp: output stays within the source value range (no zeros, no
    wraparound)."""
    B, H, W, C = 1, 64, 48, 3
    img = _img(B, H, W, C) + 0.5     # values in [0.5, 1.5]
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    # strong shear: source y varies by ~H/2 along one output row
    gy = ys + 0.8 * xs
    grid = jnp.asarray(np.stack([xs, gy], -1)[None], jnp.float32)
    out = np.asarray(band_warp(img, grid, k=8, interpret=True))
    assert out.min() >= 0.5 - 1e-5 and out.max() <= 1.5 + 1e-5


def test_border_column_semantics():
    """x beyond W-1 clamps to the last column (border mode)."""
    B, H, W, C = 1, 16, 24, 3
    img = _img(B, H, W, C)
    ys, xs = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    grid = jnp.asarray(np.stack([xs + 0.9, ys], -1)[None], jnp.float32)
    ref = grid_sample(img, grid, padding_mode="border",
                      align_corners=True, impl="patch")
    out = band_warp(img, grid, k=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


def test_mosaic_matches_interpret_on_tpu():
    """TPU-only: compiled Mosaic kernel vs interpreter mode (fwd + grad)."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs TPU")
    B, H, W, C = 2, 40, 48, 3
    img = _img(B, H, W, C)
    grid = _rot_grid(B, H, W)
    oi = band_warp(img, grid, k=16, interpret=True)
    om = band_warp(img, grid, k=16, interpret=False)
    np.testing.assert_allclose(np.asarray(om), np.asarray(oi), atol=5e-5)

    def loss(g, interp):
        return jnp.sum(jnp.sin(band_warp(img, g, k=16, interpret=interp)))

    gi = jax.grad(lambda g: loss(g, True))(grid)
    gm = jax.grad(lambda g: loss(g, False))(grid)
    scale = float(jnp.max(jnp.abs(gi)))
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gi),
                               atol=1e-3 * max(scale, 1.0))


def test_cost_volume_pallas_sweep_matches_xla():
    """build_cost_volume(warp_impl='pallas8') == the XLA 4-corner gather.

    The sweep's 2 px interior mask makes border-vs-zeros padding immaterial
    (models/cost_volume.py docstring); inside the mask both samplers are
    exact bilinear, so cost and missing must agree to f32 rounding.
    """
    from polardepth_tpu.models.cost_volume import (
        build_cost_volume, compute_depth_bins)

    r = np.random.default_rng(3)
    b, f, h, w, c, d = 2, 2, 24, 32, 8, 8
    cur = jnp.asarray(r.normal(0, 1, (b, h, w, c)), jnp.float32)
    look = jnp.asarray(r.normal(0, 1, (b, f, h, w, c)), jnp.float32)
    # small realistic relative poses: a few-degree rotation + cm translation
    poses = np.tile(np.eye(4, dtype=np.float32), (b, f, 1, 1))
    for i in range(b):
        for j in range(f):
            th = 0.02 * (i + 1) * (-1) ** j
            poses[i, j, :3, :3] = np.array(
                [[np.cos(th), -np.sin(th), 0],
                 [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
            poses[i, j, :3, 3] = [0.03 * (j + 1), -0.02, 0.01]
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = w * 0.9, h * 0.9, w / 2, h / 2
    Kb = jnp.asarray(np.tile(K, (b, 1, 1)))
    inv_Kb = jnp.asarray(np.tile(np.linalg.inv(K), (b, 1, 1)))
    bins = compute_depth_bins(0.5, 2.0, d, "linear")

    cost_x, miss_x = build_cost_volume(cur, look, jnp.asarray(poses), Kb,
                                       inv_Kb, bins, bin_chunk=4,
                                       warp_impl="xla")
    cost_p, miss_p = build_cost_volume(cur, look, jnp.asarray(poses), Kb,
                                       inv_Kb, bins, bin_chunk=4,
                                       warp_impl="pallas8")
    np.testing.assert_allclose(np.asarray(cost_p), np.asarray(cost_x),
                               atol=3e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(miss_p), np.asarray(miss_x))
