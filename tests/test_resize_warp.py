"""Resize and grid_sample parity vs torch (CPU) as the oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from polardepth_tpu.ops.resize import (  # noqa: E402
    resize_bilinear, resize_nearest, upsample2x,
)
from polardepth_tpu.ops.warp import grid_sample  # noqa: E402


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("in_hw,out_hw", [
    ((10, 15), (20, 30)),   # x2 up
    ((40, 60), (320, 480)), # disp -> full res
    ((7, 9), (5, 4)),       # down
    ((8, 8), (8, 8)),       # identity
])
@pytest.mark.parametrize("align", [False, True])
def test_resize_bilinear_matches_torch(in_hw, out_hw, align):
    x = _rand((2, *in_hw, 3))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), out_hw,
                         mode="bilinear", align_corners=align)
    got = np.asarray(resize_bilinear(jnp.asarray(x), out_hw, align))
    # atol covers float32 accumulation-order differences (matmul vs gather)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=5e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((10, 15), (320, 480)),
                                          ((13, 17), (5, 6))])
def test_resize_nearest_matches_torch(in_hw, out_hw):
    x = _rand((2, *in_hw, 1), seed=1)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), out_hw,
                         mode="nearest")
    got = np.asarray(resize_nearest(jnp.asarray(x), out_hw))
    np.testing.assert_array_equal(got, want.permute(0, 2, 3, 1).numpy())


def test_upsample2x_is_reference_layers_upsample():
    x = _rand((1, 6, 7, 2), seed=2)
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         scale_factor=2, mode="bilinear", align_corners=False)
    got = np.asarray(upsample2x(jnp.asarray(x)))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding", ["border", "zeros"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_matches_torch(padding, align):
    img = _rand((2, 9, 11, 3), seed=3)
    # grid partially outside [-1, 1] to exercise padding
    grid = (np.random.default_rng(4).uniform(-1.3, 1.3, (2, 5, 6, 2))
            .astype(np.float32))
    want = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                         torch.from_numpy(grid), mode="bilinear",
                         padding_mode=padding, align_corners=align)
    got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                 padding_mode=padding, align_corners=align))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", ["patch", "strip"])
@pytest.mark.parametrize("padding", ["border", "zeros"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_alt_impls_match_torch(impl, padding, align):
    """The one-gather (2,2,C)-window strategy (impl='patch') and the
    lane-packed two-strip-gather strategy (impl='strip') must keep exact
    torch F.grid_sample semantics, including out-of-range zeros-mode points
    and exact-integer coordinates (relu-weight kinks)."""
    img = _rand((2, 9, 11, 3), seed=3)
    rng = np.random.default_rng(4)
    grid = rng.uniform(-1.3, 1.3, (2, 5, 6, 2)).astype(np.float32)
    # overwrite a few points with exact grid-node coordinates
    grid[0, 0, :3, 0] = np.array([0, 5, 10]) / 10 * 2 - 1
    grid[0, 0, :3, 1] = np.array([0, 4, 8]) / 8 * 2 - 1
    want = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                         torch.from_numpy(grid), mode="bilinear",
                         padding_mode=padding, align_corners=align)
    got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                 padding_mode=padding, align_corners=align,
                                 impl=impl))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def _coherent_grid(b, oh, ow, h, w, max_dy, seed, align=True):
    """Reprojection-like grid: per-pixel offsets whose per-row vertical
    spread stays within ±max_dy (rotation + depth parallax envelope)."""
    rng = np.random.default_rng(seed)
    ys, xs = np.meshgrid(np.arange(oh, dtype=np.float32),
                         np.arange(ow, dtype=np.float32), indexing="ij")
    iy = (ys[None] + rng.uniform(-3, 3, (b, 1, 1)).astype(np.float32)
          + rng.uniform(-max_dy / 2, max_dy / 2,
                        (b, oh, ow)).astype(np.float32))
    ix = (xs[None] + rng.uniform(-8, 8, (b, 1, 1)).astype(np.float32)
          + rng.uniform(-4, 4, (b, oh, ow)).astype(np.float32))
    if align:
        gx = ix / (w - 1) * 2 - 1
        gy = iy / (h - 1) * 2 - 1
    else:
        gx = (2 * ix + 1) / w - 1
        gy = (2 * iy + 1) / h - 1
    return np.stack([gx, gy], -1).astype(np.float32)


@pytest.mark.parametrize("impl,max_dy", [("band8", 5), ("band", 28),
                                         ("band64", 60)])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_band_matches_torch_in_envelope(impl, max_dy, align):
    """impl='band<k>' (banded row-gather + one-hot MXU lerp) is EXACT
    bilinear whenever each output row's source rows span <= k-2 — the
    documented envelope for pose/plane warps.  Verified against torch on
    grids at the envelope edge, including out-of-range border clamping."""
    img = _rand((2, 64, 48, 3), seed=7)
    grid = _coherent_grid(2, 64, 48, 64, 48, max_dy, seed=8, align=align)
    want = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                         torch.from_numpy(grid), mode="bilinear",
                         padding_mode="border", align_corners=align)
    got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                 padding_mode="border", align_corners=align,
                                 impl=impl))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_grid_sample_band_out_of_envelope_clamps_vertically():
    """Beyond the k-row band the banded impl must degrade to a vertical
    clamp onto the band edge (never zeros / garbage)."""
    img = _rand((1, 64, 48, 3), seed=9)
    grid = _coherent_grid(1, 64, 48, 64, 48, max_dy=4, seed=10)
    # blow the vertical spread past the k=8 band on the bottom half only
    wide = _coherent_grid(1, 64, 48, 64, 48, max_dy=40, seed=11)
    grid[:, 32:] = wide[:, 32:]
    got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                 padding_mode="border", impl="band8"))
    # every output pixel must be a convex combination of image values
    assert np.all(got <= img.max() + 1e-5)
    assert np.all(got >= img.min() - 1e-5)
    # and in-envelope rows still match the exact impl
    exact = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid),
                                   padding_mode="border", impl="patch"))
    iy = (grid[..., 1] + 1) * 0.5 * 63
    y0 = np.clip(np.floor(np.clip(iy, 0, 63)), 0, 63)
    spread = y0.max(axis=2) - y0.min(axis=2)          # (B, OH)
    ok_rows = spread <= 6                             # k-2 interior
    assert ok_rows.any(), "fixture must contain in-envelope rows"
    np.testing.assert_allclose(got[0][ok_rows[0]], exact[0][ok_rows[0]],
                               rtol=1e-4, atol=1e-5)
