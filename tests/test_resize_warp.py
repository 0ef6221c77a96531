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


@pytest.mark.parametrize("padding", ["border", "zeros"])
@pytest.mark.parametrize("align", [True, False])
def test_grid_sample_patch_impl_matches_torch(padding, align):
    """The one-gather (2,2,C)-window strategy (impl='patch') must keep exact
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
                                 impl="patch"))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)
