"""HAMMER dataset: index scanning and sample loading.

Reproduces the reference's index semantics (IndoorDataset.get_filenames,
indoor_dataset.py:118-190): for every frame of every scene, the frame is
valid iff for each requested frame offset id (0, +-1 in the self-sup config;
just 0 in supervised-only) the rgb image, _pose txt, _gt png and
depth-modality png at frame_index + id*offset all exist.  The reference also
splits scenes at frame-numbering discontinuities; since validity is checked
per-file anyway, filtering on file existence reproduces the same valid set.

The loader returns raw uint8/uint16 arrays at *native* resolution plus
intrinsics; all resizing and float conversion happen on device (see
train/trainer.py:preprocess) — unlike the reference, which resizes with PIL
inside DataLoader workers.  Known deviations (documented, not bugs):
  * The reference's depth resize calls cv2.resize(img, (w, h),
    cv2.INTER_NEAREST) where the third positional arg of cv2.resize is *dst*,
    so it actually uses the INTER_LINEAR default; we use bilinear on device,
    matching the effective reference behaviour.
  * Instance masks are resized with nearest on device; the reference resizes
    them with PIL ANTIALIAS then truncates to int (blended ids at edges).
"""

from __future__ import annotations

import glob
import os
from typing import Sequence

import numpy as np


def _read_png(path: str, flags: int = -1) -> np.ndarray:
    import cv2
    img = cv2.imread(path, flags)
    if img is None:
        raise FileNotFoundError(path)
    return img


class HammerIndex:
    """Scans <data_path>/<scene>/<modality>/ and builds the valid frame list."""

    SUBDIR_RGB = "rgb"
    SUBDIR_POL = ("pol00", "pol01", "pol10", "pol11")  # 0/45/90/135 deg

    def __init__(self, data_path: str, scenes: Sequence[str],
                 frame_ids: Sequence[int] = (0,), offset: int = 10,
                 modality: str = "polarization", depth_modality: str = "_gt"):
        self.data_path = data_path
        self.modality = modality
        self.depth_modality = depth_modality
        self.offset = offset
        self.frame_ids = tuple(frame_ids)
        self.entries: list[tuple[str, int]] = []  # (scene_dir, frame_index)
        for scene in scenes:
            base = os.path.join(data_path, scene, modality)
            rgb_files = sorted(glob.glob(os.path.join(base, self.SUBDIR_RGB,
                                                      "*.png")))
            for f in rgb_files:
                idx = int(os.path.splitext(os.path.basename(f))[0])
                if self._valid(base, idx):
                    self.entries.append((base, idx))

    def _valid(self, base: str, idx: int) -> bool:
        for fid in self.frame_ids:
            j = idx + fid * self.offset
            name = f"{j:06d}"
            checks = [
                os.path.join(base, self.SUBDIR_RGB, name + ".png"),
                os.path.join(base, "_pose", name + ".txt"),
                os.path.join(base, "_gt", name + ".png"),
                os.path.join(base, self.depth_modality, name + ".png"),
            ]
            if not all(os.path.isfile(p) for p in checks):
                return False
        return True

    def __len__(self) -> int:
        return len(self.entries)


class HammerLoader:
    """Loads raw samples by index; host work is PNG decode only.

    backend='native' decodes through the C++ libpng thread pool
    (polardepth_tpu.runtime) — GIL-free batch decode of the 8 per-frame
    PNGs; 'cv2' is the pure-Python fallback; 'auto' (the production default,
    Config.decode_backend) uses native when its shared library builds on
    this host and silently falls back to cv2 otherwise.
    """

    def __init__(self, index: HammerIndex, backend: str = "cv2",
                 nthreads: int = 8):
        self.index = index
        self._intrinsics_cache: dict[str, np.ndarray] = {}
        self._native = None
        if backend == "auto":
            from polardepth_tpu.runtime import native as _rt
            backend = "native" if _rt.available() else "cv2"
        if backend == "native":
            from polardepth_tpu.runtime.native import NativePngDecoder
            self._native = NativePngDecoder(nthreads)
        elif backend != "cv2":
            raise ValueError(f"unknown decode backend {backend!r}")
        self.backend = backend

    def _normalized_intrinsics(self, base: str) -> np.ndarray:
        if base not in self._intrinsics_cache:
            with open(os.path.join(base, "intrinsics.txt")) as f:
                k = np.array(f.read().split(), dtype=np.float64).reshape(3, 3)
            self._intrinsics_cache[base] = k
        return self._intrinsics_cache[base]

    def intrinsics_for(self, base: str, width: int, height: int) -> np.ndarray:
        """Scale-0 4x4 K for a working resolution.  The stored file is
        normalized by native resolution (indoor_dataset.py:262-275)."""
        kn = self._normalized_intrinsics(base).copy()
        K = np.eye(4, dtype=np.float32)
        K[:3, :3] = kn
        K[0, :] *= width
        K[1, :] *= height
        return K

    def load(self, i: int, frame_id: int = 0) -> dict:
        base, idx = self.index.entries[i]
        j = idx + frame_id * self.index.offset
        name = f"{j:06d}.png"
        if self._native is not None:
            nd = self._native
            rgb = nd.decode(os.path.join(base, HammerIndex.SUBDIR_RGB, name))
            pol_paths = [os.path.join(base, d, name)
                         for d in HammerIndex.SUBDIR_POL]
            h, w = rgb.shape[:2]
            pol = np.moveaxis(nd.decode_batch(pol_paths, (h, w), 1), 0, -1)
            mask = nd.decode(os.path.join(base, "_instance",
                                          name)).astype(np.int32)
            depth_gt = nd.decode(os.path.join(base, "_gt", name))
            depth_sup = nd.decode(
                os.path.join(base, self.index.depth_modality, name))
        else:
            import cv2
            rgb = _read_png(os.path.join(base, HammerIndex.SUBDIR_RGB, name),
                            cv2.IMREAD_COLOR)[..., ::-1]  # BGR->RGB
            pol = np.stack([
                _read_png(os.path.join(base, d, name), cv2.IMREAD_GRAYSCALE)
                for d in HammerIndex.SUBDIR_POL], axis=-1)
            mask = _read_png(os.path.join(base, "_instance", name),
                             cv2.IMREAD_GRAYSCALE).astype(np.int32)
            depth_gt = _read_png(os.path.join(base, "_gt", name))
            depth_sup = _read_png(
                os.path.join(base, self.index.depth_modality, name))
        pose = self._pose(base, j)
        return {
            "color": np.ascontiguousarray(rgb),
            "pol": pol,
            "mask": mask[..., None],
            "depth_gt": (depth_gt.astype(np.float32) / 1000.0)[..., None],
            "depth": (depth_sup.astype(np.float32) / 1000.0)[..., None],
            "pose": pose,
            "scene": base,
            "frame": j,
        }

    def _pose(self, base: str, j: int) -> np.ndarray:
        path = os.path.join(base, "_pose", f"{j:06d}.txt")
        with open(path) as f:
            return np.array(f.read().split(), dtype=np.float32).reshape(4, 4)

    def relative_pose(self, base: str, frame: int, center: int) -> np.ndarray:
        """inv(inv(T_center) @ T_side)  (hammer_dataset.py:104-132)."""
        T_c = self._pose(base, center).astype(np.float64)
        T_s = self._pose(base, frame).astype(np.float64)
        return np.linalg.inv(np.linalg.inv(T_c) @ T_s).astype(np.float32)


def read_split(splits_dir: str, split: str, part: str) -> list[str]:
    """Read splits/<split>/<part>_files.txt scene lists (reference splits/)."""
    path = os.path.join(splits_dir, split, f"{part}_files.txt")
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]
