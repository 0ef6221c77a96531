"""KITTI velodyne projection + flow-warping ops tests."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from polardepth_tpu.data.kitti import (
    velodyne_to_depth, read_calib_file, KITTI_NORMALIZED_K, KittiRawIndex,
)
from polardepth_tpu.ops.flow import backward_warp_flow, forward_warp_splat

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.fixture()
def kitti_calib(tmp_path):
    """Minimal synthetic KITTI calibration + velodyne scan with known
    geometry: identity rectification, velo x->z optical axis."""
    w, h = 40, 30
    fx = fy = 20.0
    cx, cy = w / 2, h / 2
    with open(tmp_path / "calib_cam_to_cam.txt", "w") as f:
        f.write(f"S_rect_02: {w:.1f} {h:.1f}\n")
        f.write("R_rect_00: 1 0 0 0 1 0 0 0 1\n")
        f.write(f"P_rect_02: {fx} 0 {cx} 0 0 {fy} {cy} 0 0 0 1 0\n")
    with open(tmp_path / "calib_velo_to_cam.txt", "w") as f:
        # velo (fwd, left, up) -> cam (right, down, fwd): standard axes swap
        f.write("R: 0 -1 0 0 0 -1 1 0 0\n")
        f.write("T: 0 0 0\n")
    # one point 5 m ahead, slightly left and up
    pts = np.array([[5.0, 0.5, 0.25, 1.0]], dtype=np.float32)
    velo_path = tmp_path / "scan.bin"
    pts.astype(np.float32).tofile(velo_path)
    return str(tmp_path), str(velo_path), (fx, fy, cx, cy)


def test_velodyne_projection_geometry(kitti_calib):
    calib_dir, velo, (fx, fy, cx, cy) = kitti_calib
    depth = velodyne_to_depth(calib_dir, velo)
    ys, xs = np.nonzero(depth)
    assert len(xs) == 1
    # cam coords: x=-0.5 (left->-x), y=-0.25, z=5
    u = fx * (-0.5) / 5.0 + cx
    v = fy * (-0.25) / 5.0 + cy
    assert xs[0] == round(u) - 1 and ys[0] == round(v) - 1
    np.testing.assert_allclose(depth[ys[0], xs[0]], 5.0, rtol=1e-6)


def test_velodyne_collision_keeps_min_depth(tmp_path, kitti_calib):
    calib_dir, _, _ = kitti_calib
    # two points projecting to the same pixel, different depths
    pts = np.array([[5.0, 0.0, 0.0, 1.0], [3.0, 0.0, 0.0, 1.0]],
                   dtype=np.float32)
    velo2 = tmp_path / "scan2.bin"
    pts.tofile(velo2)
    depth = velodyne_to_depth(calib_dir, str(velo2))
    vals = depth[depth > 0]
    assert len(vals) == 1 and vals[0] == 3.0


def test_kitti_index_paths(tmp_path):
    idx = KittiRawIndex(str(tmp_path), ["2011_09_26/drive_0001 7 l"])
    assert idx.image_path(0).endswith("image_02/data/0000000007.png")
    assert idx.velodyne_path(0).endswith("velodyne_points/data/0000000007.bin")
    assert KITTI_NORMALIZED_K[0, 0] == np.float32(0.58)


def test_backward_warp_flow_matches_torch():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (2, 9, 11, 3)).astype(np.float32)
    flow = rng.uniform(-2, 2, (2, 9, 11, 2)).astype(np.float32)
    got = np.asarray(backward_warp_flow(jnp.asarray(img), jnp.asarray(flow)))
    # torch oracle replicating reference warp_flow semantics
    t_img = torch.from_numpy(img).permute(0, 3, 1, 2)
    xx, yy = np.meshgrid(np.arange(11), np.arange(9))
    grid = np.stack([xx, yy], axis=0)[None].repeat(2, 0).astype(np.float32)
    vgrid = grid + flow.transpose(0, 3, 1, 2)
    vgrid[:, 0] = 2.0 * vgrid[:, 0] / 10 - 1.0
    vgrid[:, 1] = 2.0 * vgrid[:, 1] / 8 - 1.0
    want = F.grid_sample(t_img, torch.from_numpy(
        vgrid.transpose(0, 2, 3, 1)), align_corners=True)
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_forward_splat_conserves_mass_with_zero_flow():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (1, 6, 8, 2)).astype(np.float32)
    flow = np.zeros((1, 6, 8, 2), np.float32)
    out = np.asarray(forward_warp_splat(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, img, atol=1e-6)
    # integer shift moves content
    flow2 = np.zeros_like(flow)
    flow2[..., 0] = 1.0  # one pixel right in normalized (w-1)/2 units? no:
    # reference divides by (w-1)/2, so flow=3.5 normalized = 1 px here
    flow2[..., 0] = 1.0
    out2 = np.asarray(forward_warp_splat(jnp.asarray(img),
                                         jnp.asarray(flow2)))
    np.testing.assert_allclose(out2[0, :, 1:], img[0, :, :-1], atol=1e-5)
