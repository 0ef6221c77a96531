"""Native C++ ingest runtime: build, decode parity vs cv2, batch decode, and
HammerLoader backend equivalence."""

import os
import shutil
import time

import numpy as np
import pytest

from polardepth_tpu.runtime import native

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def lib():
    native.build()
    assert native.available()
    return native.NativePngDecoder(nthreads=4)


@pytest.fixture(scope="module")
def pngs(tmp_path_factory):
    import cv2
    root = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    gray8 = rng.integers(0, 256, (40, 60), dtype=np.uint8)
    rgb8 = rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)
    gray16 = rng.integers(0, 65536, (40, 60), dtype=np.uint16)
    cv2.imwrite(str(root / "gray8.png"), gray8)
    cv2.imwrite(str(root / "rgb8.png"), cv2.cvtColor(rgb8, cv2.COLOR_RGB2BGR))
    cv2.imwrite(str(root / "gray16.png"), gray16)
    return root, gray8, rgb8, gray16


def test_decode_gray8(lib, pngs):
    root, gray8, _, _ = pngs
    out = lib.decode(str(root / "gray8.png"))
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, gray8)


def test_decode_rgb8(lib, pngs):
    root, _, rgb8, _ = pngs
    out = lib.decode(str(root / "rgb8.png"))
    assert out.shape == (40, 60, 3)
    np.testing.assert_array_equal(out, rgb8)


def test_decode_gray16_endianness(lib, pngs):
    root, _, _, gray16 = pngs
    out = lib.decode(str(root / "gray16.png"))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, gray16)


def test_batch_decode_parallel(lib, pngs):
    root, gray8, _, _ = pngs
    paths = [str(root / "gray8.png")] * 12
    out = lib.decode_batch(paths, (40, 60), 1)
    assert out.shape == (12, 40, 60)
    for i in range(12):
        np.testing.assert_array_equal(out[i], gray8)


def test_hammer_loader_native_matches_cv2(lib, tmp_path):
    from polardepth_tpu.data.hammer import HammerIndex, HammerLoader
    from polardepth_tpu.data.synthetic import write_synthetic_scene
    write_synthetic_scene(str(tmp_path), "scene", num_frames=3,
                          height=48, width=64, seed=1)
    idx = HammerIndex(str(tmp_path), ["scene"], frame_ids=(0,), offset=1)
    a = HammerLoader(idx, backend="cv2").load(1)
    b = HammerLoader(idx, backend="native").load(1)
    for k in ("color", "pol", "mask", "depth_gt", "depth"):
        np.testing.assert_array_equal(a[k], b[k]), k
