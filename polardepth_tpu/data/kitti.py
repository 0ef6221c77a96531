"""KITTI dataset support: calibration parsing, velodyne->depth projection,
and raw/odometry/depth loaders.

Capability parity with the reference's KITTI stack
(manydepth/kitti_utils.py:12-102, manydepth/datasets/kitti_dataset.py).  The
duplicate-point resolution in the projection is vectorised (lexsort +
min-reduce per pixel instead of the reference's Counter loop); pixels keep
the *minimum* depth among collisions, matching the reference/KITTI matlab
semantics.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

# KITTI's standard normalized intrinsics (kitti_dataset.py:28-33)
KITTI_NORMALIZED_K = np.array([[0.58, 0, 0.5, 0],
                               [0, 1.92, 0.5, 0],
                               [0, 0, 1, 0],
                               [0, 0, 0, 1]], dtype=np.float32)
KITTI_FULL_RES = (1242, 375)


def read_calib_file(path: str) -> dict:
    """KITTI calibration text -> {key: float array | str}."""
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            key, value = line.split(":", 1)
            value = value.strip()
            try:
                out[key] = np.array([float(v) for v in value.split()])
            except ValueError:
                out[key] = value
    return out


def load_velodyne_points(path: str) -> np.ndarray:
    pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    pts[:, 3] = 1.0
    return pts


def velodyne_to_depth(calib_dir: str, velo_filename: str, cam: int = 2,
                      vel_depth: bool = False) -> np.ndarray:
    """Sparse depth map from a velodyne scan (reference generate_depth_map).

    Projection: P_rect_0<cam> @ R_rect_00 @ Tr_velo_to_cam; points rounded
    to pixels with the KITTI matlab -1 convention; collisions keep min depth.
    """
    cam2cam = read_calib_file(os.path.join(calib_dir, "calib_cam_to_cam.txt"))
    velo2cam_f = read_calib_file(os.path.join(calib_dir,
                                              "calib_velo_to_cam.txt"))
    velo2cam = np.vstack([
        np.hstack([velo2cam_f["R"].reshape(3, 3),
                   velo2cam_f["T"][:, None]]),
        [0, 0, 0, 1.0]])

    im_shape = cam2cam["S_rect_02"][::-1].astype(np.int32)
    R_rect = np.eye(4)
    R_rect[:3, :3] = cam2cam["R_rect_00"].reshape(3, 3)
    P_rect = cam2cam[f"P_rect_0{cam}"].reshape(3, 4)
    P = P_rect @ R_rect @ velo2cam

    velo = load_velodyne_points(velo_filename)
    velo = velo[velo[:, 0] >= 0]
    proj = (P @ velo.T).T
    proj[:, :2] /= proj[:, 2:3]
    if vel_depth:
        proj[:, 2] = velo[:, 0]

    x = np.round(proj[:, 0]) - 1
    y = np.round(proj[:, 1]) - 1
    valid = (x >= 0) & (y >= 0) & (x < im_shape[1]) & (y < im_shape[0])
    x, y, z = x[valid].astype(np.int64), y[valid].astype(np.int64), \
        proj[valid, 2]

    depth = np.zeros(tuple(im_shape[:2]))
    # min-depth wins per pixel: sort descending by z then write ascending,
    # so the last (smallest) value lands
    order = np.argsort(-z)
    depth[y[order], x[order]] = z[order]
    depth[depth < 0] = 0
    return depth


class KittiRawIndex:
    """Index over split lines '<drive_folder> <frame_index> <side>'
    (the monodepth2/ManyDepth split-file convention)."""

    SIDE_MAP = {"2": 2, "3": 3, "l": 2, "r": 3}

    def __init__(self, data_path: str, split_lines: Sequence[str],
                 img_ext: str = ".png"):
        self.data_path = data_path
        self.img_ext = img_ext
        self.entries = []
        for ln in split_lines:
            parts = ln.split()
            folder = parts[0]
            idx = int(parts[1]) if len(parts) > 1 else 0
            side = parts[2] if len(parts) > 2 else "l"
            self.entries.append((folder, idx, side))

    def __len__(self):
        return len(self.entries)

    def image_path(self, i: int, offset: int = 0) -> str:
        folder, idx, side = self.entries[i]
        return os.path.join(
            self.data_path, folder,
            f"image_0{self.SIDE_MAP[side]}/data",
            f"{idx + offset:010d}{self.img_ext}")

    def velodyne_path(self, i: int) -> str:
        folder, idx, _ = self.entries[i]
        return os.path.join(self.data_path, folder,
                            f"velodyne_points/data/{idx:010d}.bin")

    def load(self, i: int, with_depth: bool = True) -> dict:
        import cv2
        folder, idx, side = self.entries[i]
        img = cv2.imread(self.image_path(i), cv2.IMREAD_COLOR)[..., ::-1]
        out = {"color": np.ascontiguousarray(img),
               "K": KITTI_NORMALIZED_K.copy(),
               "folder": folder, "frame": idx, "side": side}
        if with_depth:
            calib = os.path.join(self.data_path, folder.split("/")[0])
            velo = self.velodyne_path(i)
            if os.path.isfile(velo):
                depth = velodyne_to_depth(calib, velo, self.SIDE_MAP[side])
                # reference nearest-resizes the sparse map to the canonical
                # 1242x375 (kitti_dataset.py:98-100, skimage order=0)
                if depth.shape[:2] != KITTI_FULL_RES[::-1]:
                    depth = _nearest_resize(depth, KITTI_FULL_RES)
                out["depth_gt"] = depth[..., None]
        return out


def _nearest_resize(img: np.ndarray, out_wh: tuple[int, int]) -> np.ndarray:
    """Host-side nearest resize (skimage order=0 / PIL NEAREST semantics:
    sample at the center of each output pixel)."""
    w, h = out_wh
    ih, iw = img.shape[:2]
    ys = np.minimum(((np.arange(h) + 0.5) * ih / h).astype(np.int64), ih - 1)
    xs = np.minimum(((np.arange(w) + 0.5) * iw / w).astype(np.int64), iw - 1)
    return img[ys[:, None], xs[None, :]]


class KittiOdomIndex(KittiRawIndex):
    """KITTI odometry layout (reference KITTIOdomDataset,
    kitti_dataset.py:107-121): images at
    sequences/<seq:02d>/image_<2|3>/<frame:06d>.png, no velodyne depth."""

    def image_path(self, i: int, offset: int = 0) -> str:
        folder, idx, side = self.entries[i]
        return os.path.join(
            self.data_path, f"sequences/{int(folder):02d}",
            f"image_{self.SIDE_MAP[side]}",
            f"{idx + offset:06d}{self.img_ext}")

    def load(self, i: int, with_depth: bool = False) -> dict:
        out = super().load(i, with_depth=False)
        return out


class KittiDepthIndex(KittiRawIndex):
    """KITTI with the improved ground-truth depth maps (reference
    KITTIDepthDataset, kitti_dataset.py:123-160): raw image layout, depth
    from proj_depth/groundtruth/image_0<side>/<frame:010d>.png as
    uint16/256, nearest-resized to the full 1242x375 resolution."""

    def depth_path(self, i: int) -> str:
        folder, idx, side = self.entries[i]
        return os.path.join(
            self.data_path, folder,
            f"proj_depth/groundtruth/image_0{self.SIDE_MAP[side]}",
            f"{idx:010d}.png")

    def load(self, i: int, with_depth: bool = True) -> dict:
        import cv2
        out = super().load(i, with_depth=False)
        if with_depth:
            path = self.depth_path(i)
            if os.path.isfile(path):
                raw = cv2.imread(path, cv2.IMREAD_UNCHANGED)
                depth = _nearest_resize(raw, KITTI_FULL_RES)
                out["depth_gt"] = (depth.astype(np.float32) / 256.0)[..., None]
        return out


class CityscapesPreprocessedIndex:
    """Preprocessed Cityscapes triplets (reference
    cityscapes_preprocessed_dataset.py:13-75): <city>/<frame>.jpg holds the
    -1/0/+1 frames concatenated into one wide image (ego hood pre-cropped,
    RAW 1024x384 per frame), with a per-frame '<frame>_cam.txt'
    comma-separated camera matrix.  K is returned NORMALIZED by the raw
    dimensions (reference load_intrinsics :51-52); callers scale by the
    working (width, height) exactly like the KITTI normalized K."""

    RAW_WIDTH = 1024
    RAW_HEIGHT = 384

    def __init__(self, data_path: str, split_lines: Sequence[str]):
        self.data_path = data_path
        self.entries = [tuple(ln.split()) for ln in split_lines]

    def __len__(self):
        return len(self.entries)

    def load_intrinsics(self, city: str, frame: str) -> np.ndarray:
        cam = np.loadtxt(os.path.join(self.data_path, city,
                                      f"{frame}_cam.txt"), delimiter=",")
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1] = cam[0], cam[4]
        K[0, 2], K[1, 2] = cam[2], cam[5]
        K[0, :] /= self.RAW_WIDTH
        K[1, :] /= self.RAW_HEIGHT
        return K

    def load(self, i: int) -> dict:
        """Center frame + normalized K (single-frame consumers)."""
        s = self.load_triplet(i)
        return {"color": s["frames"][1], "K": s["K"]}

    def load_triplet(self, i: int) -> dict:
        """All three frames [-1, 0, +1] split from the wide image
        (reference get_colors :56-72)."""
        import cv2
        city, frame = self.entries[i][:2]
        img = cv2.imread(os.path.join(self.data_path, city,
                                      f"{frame}.jpg"))[..., ::-1]
        w = img.shape[1] // 3
        frames = [np.ascontiguousarray(img[:, k * w:(k + 1) * w])
                  for k in range(3)]
        return {"frames": frames, "K": self.load_intrinsics(city, frame)}


class CityscapesEvalIndex:
    """Raw-image Cityscapes evaluation loader (reference
    cityscapes_evaldataset.py:15-102): split lines '<city> <frame_name>';
    images from leftImg8bit/test (current) and leftImg8bit_sequence/test
    (the -2 temporal neighbor), cropped to the top 3/4 of the frame (the
    ego-hood crop); intrinsics from camera_trainvaltest camera jsons,
    normalized by RAW_WIDTH x (RAW_HEIGHT * 3/4) to match the crop."""

    RAW_HEIGHT = 1024
    RAW_WIDTH = 2048

    def __init__(self, data_path: str, split_lines: Sequence[str]):
        self.data_path = data_path
        self.entries = [tuple(ln.split()[:2]) for ln in split_lines]

    def __len__(self):
        return len(self.entries)

    def image_path(self, city: str, frame_name: str,
                   is_sequence: bool = False) -> str:
        folder = "leftImg8bit_sequence" if is_sequence else "leftImg8bit"
        return os.path.join(self.data_path, folder, "test", city,
                            f"{frame_name}_leftImg8bit.png")

    def load_intrinsics(self, city: str, frame_name: str) -> np.ndarray:
        import json
        path = os.path.join(self.data_path, "camera_trainvaltest", "camera",
                            "test", city, f"{frame_name}_camera.json")
        with open(path) as f:
            cam = json.load(f)["intrinsic"]
        K = np.array([[cam["fx"], 0, cam["u0"], 0],
                      [0, cam["fy"], cam["v0"], 0],
                      [0, 0, 1, 0],
                      [0, 0, 0, 1]], dtype=np.float32)
        K[0, :] /= self.RAW_WIDTH
        K[1, :] /= self.RAW_HEIGHT * 0.75
        return K

    @staticmethod
    def offset_framename(frame_name: str, offset: int = -2) -> str:
        city, seq, num = frame_name.split("_")
        return f"{city}_{seq}_{int(num) + offset:06d}"

    def _load_cropped(self, path: str) -> np.ndarray:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)[..., ::-1]
        crop_h = img.shape[0] * 3 // 4
        return np.ascontiguousarray(img[:crop_h])

    def load(self, i: int) -> dict:
        """Current + (-2) previous frame, hood-cropped, with normalized K
        (the eval harness feeds the pair to the multi-frame model)."""
        city, frame_name = self.entries[i]
        prev = self.offset_framename(frame_name, -2)
        return {
            "color": self._load_cropped(self.image_path(city, frame_name)),
            "color_prev": self._load_cropped(
                self.image_path(city, prev, is_sequence=True)),
            "K": self.load_intrinsics(city, frame_name),
        }
