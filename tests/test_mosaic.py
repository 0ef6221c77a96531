"""Quad-mosaic splitter + XOLP statistics + 12-channel input capability."""

import numpy as np
import jax
import jax.numpy as jnp

from polardepth_tpu.data.mosaic import (
    split_pol_mosaic, split_and_save_scene, xolp_statistics,
)


def test_split_pol_mosaic_layout():
    base = np.arange(4 * 6).reshape(4, 6)
    quads = split_pol_mosaic(base)
    np.testing.assert_array_equal(quads["pol00"], base[0::2, 0::2])
    np.testing.assert_array_equal(quads["pol11"], base[1::2, 1::2])
    assert quads["pol00"].shape == (2, 3)


def test_split_and_save_roundtrip(tmp_path):
    import cv2
    src = tmp_path / "raw"
    src.mkdir()
    rng = np.random.default_rng(0)
    mosaic = rng.integers(0, 256, (64, 96), dtype=np.uint8)
    cv2.imwrite(str(src / "000001.png"), mosaic)
    n = split_and_save_scene(str(src), str(tmp_path / "out"))
    assert n == 1
    p00 = cv2.imread(str(tmp_path / "out/pol00/000001.png"),
                     cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(p00, mosaic[0::2, 0::2])


def test_xolp_statistics_known_values():
    # constant unpolarized input: rho = 0, phi = atan2-dependent but finite
    stacks = [np.full((8, 8, 4), 100.0)]
    stats = xolp_statistics(stacks)
    assert abs(stats["mean"]) < 0.5
    assert stats["std"] >= 0.0


def test_network_accepts_12_channel_input():
    """enable_12channels capability (indoor_dataset.py:85-86, 220-256): the
    rgb stem widens automatically because flax infers conv input channels."""
    from polardepth_tpu.models.network import PolarDepthNet
    H, W = 32, 32
    color12 = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (1, H, W, 12)).astype(np.float32))
    m = PolarDepthNet(augment_xolp=False, augment_normals=False,
                      dropout_rate=0.0)
    vars_ = m.init(jax.random.PRNGKey(0), color12)
    out = m.apply(vars_, color12)
    assert out[("disp", 0)].shape == (1, H, W, 1)
