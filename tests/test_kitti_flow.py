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


# -- dataset variant loaders (reference kitti_dataset.py:107-160,
#    cityscapes_evaldataset.py:15-102) ----------------------------------------

def test_kitti_odom_paths_and_load(tmp_path):
    import cv2
    from polardepth_tpu.data.kitti import KittiOdomIndex
    img_dir = tmp_path / "sequences" / "05" / "image_2"
    img_dir.mkdir(parents=True)
    img = np.random.default_rng(0).integers(
        0, 255, (12, 16, 3), dtype=np.uint8)
    cv2.imwrite(str(img_dir / "000007.png"), img)
    idx = KittiOdomIndex(str(tmp_path), ["5 7 l"])
    assert idx.image_path(0).endswith("sequences/05/image_2/000007.png")
    out = idx.load(0)
    assert out["color"].shape == (12, 16, 3)
    assert "depth_gt" not in out
    np.testing.assert_array_equal(out["K"], KITTI_NORMALIZED_K)


def test_kitti_depth_gt_uint16_and_resize(tmp_path):
    import cv2
    from polardepth_tpu.data.kitti import KittiDepthIndex, KITTI_FULL_RES
    drive = "2011_09_26/2011_09_26_drive_0002_sync"
    img_dir = tmp_path / drive / "image_02" / "data"
    gt_dir = tmp_path / drive / "proj_depth" / "groundtruth" / "image_02"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    cv2.imwrite(str(img_dir / "0000000010.png"),
                np.zeros((10, 20, 3), np.uint8))
    # uint16 depth png: value 512 -> 2.0 m after /256
    gt = np.full((10, 20), 512, np.uint16)
    gt[0, 0] = 1280  # 5.0 m
    cv2.imwrite(str(gt_dir / "0000000010.png"), gt)
    idx = KittiDepthIndex(str(tmp_path), [f"{drive} 10 l"])
    out = idx.load(0)
    d = out["depth_gt"]
    assert d.shape == (KITTI_FULL_RES[1], KITTI_FULL_RES[0], 1)
    assert set(np.unique(d)) <= {2.0, 5.0}
    assert d[0, 0, 0] == 5.0  # nearest resize keeps the corner value


def test_cityscapes_eval_crop_and_intrinsics(tmp_path):
    import cv2
    import json
    from polardepth_tpu.data.kitti import CityscapesEvalIndex
    city, frame = "aachen", "aachen_000000_000019"
    prev = "aachen_000000_000017"
    for folder, name in (("leftImg8bit", frame),
                         ("leftImg8bit_sequence", prev)):
        d = tmp_path / folder / "test" / city
        d.mkdir(parents=True)
        cv2.imwrite(str(d / f"{name}_leftImg8bit.png"),
                    np.zeros((16, 32, 3), np.uint8))
    cam_dir = tmp_path / "camera_trainvaltest" / "camera" / "test" / city
    cam_dir.mkdir(parents=True)
    with open(cam_dir / f"{frame}_camera.json", "w") as f:
        json.dump({"intrinsic": {"fx": 2262.52, "fy": 2265.30,
                                 "u0": 1096.98, "v0": 513.14}}, f)
    idx = CityscapesEvalIndex(str(tmp_path), [f"{city} {frame}"])
    assert idx.offset_framename(frame, -2) == prev
    out = idx.load(0)
    # hood crop: top 3/4 of the 16-row frame
    assert out["color"].shape == (12, 32, 3)
    assert out["color_prev"].shape == (12, 32, 3)
    K = out["K"]
    np.testing.assert_allclose(K[0, 0], 2262.52 / 2048, rtol=1e-6)
    np.testing.assert_allclose(K[1, 2], 513.14 / (1024 * 0.75), rtol=1e-6)


def test_kitti_raw_depth_resized_to_full_res(kitti_calib, tmp_path):
    import cv2
    from polardepth_tpu.data.kitti import KITTI_FULL_RES
    calib_dir, velo, _ = kitti_calib
    drive = "drive"
    img_dir = tmp_path / drive / "image_02" / "data"
    velo_dir = tmp_path / drive / "velodyne_points" / "data"
    img_dir.mkdir(parents=True)
    velo_dir.mkdir(parents=True)
    cv2.imwrite(str(img_dir / "0000000000.png"),
                np.zeros((30, 40, 3), np.uint8))
    import shutil
    shutil.copy(velo, velo_dir / "0000000000.bin")
    # folder.split('/')[0] == 'drive'; calib files live under data_path/drive
    for f in ("calib_cam_to_cam.txt", "calib_velo_to_cam.txt"):
        shutil.copy(os.path.join(calib_dir, f), tmp_path / drive / f)
    idx = KittiRawIndex(str(tmp_path), [f"{drive} 0 l"])
    out = idx.load(0)
    assert out["depth_gt"].shape == (KITTI_FULL_RES[1], KITTI_FULL_RES[0], 1)
    assert (out["depth_gt"] > 0).sum() >= 1


def test_kitti_cli_data_path(tmp_path):
    """--dataset kitti end-to-end: split file -> loader -> batches the
    supervised RGB-only trainer consumes (mirrors the reference's
    datasets_dict routing, trainer.py:254-267)."""
    import cv2
    from types import SimpleNamespace
    from polardepth_tpu.cli import _make_kitti_data
    from polardepth_tpu.config import Config

    drive = "2011_09_26/2011_09_26_drive_0001_sync"
    img_dir = tmp_path / drive / "image_02" / "data"
    gt_dir = tmp_path / drive / "proj_depth" / "groundtruth" / "image_02"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for idx in range(4):
        cv2.imwrite(str(img_dir / f"{idx:010d}.png"),
                    rng.integers(0, 255, (38, 124, 3), dtype=np.uint8))
        cv2.imwrite(str(gt_dir / f"{idx:010d}.png"),
                    np.full((38, 124), 5 * 256, np.uint16))
    (tmp_path / "eigen_tiny").mkdir()
    with open(tmp_path / "eigen_tiny" / "train_files.txt", "w") as f:
        for idx in range(4):
            f.write(f"{drive} {idx} l\n")

    cfg = Config(data_path=str(tmp_path), dataset="kitti_depth",
                 split=str(tmp_path / "eigen_tiny"), height=32, width=64,
                 batch_size=2, augment_xolp=False, augment_normals=False)
    make, spe = _make_kitti_data(cfg, SimpleNamespace(synthetic=0), "train")
    assert spe == 2
    batch = next(make())
    assert batch["color"].shape == (2, 32, 64, 3)
    assert batch["depth"].shape == (2, 32, 64, 1)
    np.testing.assert_allclose(batch["depth"], 5.0)
    assert batch["K"].shape == (2, 4, 4)
    np.testing.assert_allclose(batch["K"][0, 0, 0], 0.58 * 64, rtol=1e-6)

    # polarization cues cannot be requested on KITTI
    bad = Config(data_path=str(tmp_path), dataset="kitti",
                 split=str(tmp_path / "eigen_tiny"))
    with pytest.raises(ValueError, match="polarization"):
        _make_kitti_data(bad, SimpleNamespace(synthetic=0), "train")


def test_kitti_train_step_runs(tmp_path):
    """One supervised RGB-only train step on a KITTI-style batch (sparse
    depth supervision; the masked-L1 path ignores zero depths)."""
    import jax
    import jax.numpy as jnp
    from polardepth_tpu.config import Config
    from polardepth_tpu.train.state import create_train_state
    from polardepth_tpu.train.trainer import build_model, make_train_step

    h, w = 32, 64
    cfg = Config(height=h, width=w, batch_size=2, augment_xolp=False,
                 augment_normals=False, dropout_rate=0.0, max_depth=80.0,
                 normals_loss_weight=0.0)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    example = {"color": jnp.zeros((1, h, w, 3), jnp.float32), "pol": None}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    rngs = np.random.default_rng(1)
    depth = np.zeros((2, h, w, 1), np.float32)
    depth[:, ::4, ::4] = rngs.uniform(2, 60, (2, h // 4, w // 4, 1))  # sparse
    K = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    K[:, 0, 0], K[:, 1, 1] = 0.58 * w, 1.92 * h
    batch = {"color": rngs.integers(0, 255, (2, h, w, 3), dtype=np.uint8),
             "depth": depth, "K": K}
    step = jax.jit(make_train_step(model, cfg))
    state, logs = step(state, batch, rng)
    assert np.isfinite(float(logs["loss"]))
