"""2-D visual analysis of predictions (reference L7:
analysis_2d/visual_analysis.ipynb — load saved pred/gt PNGs, diff/RMS
heatmaps, normals visualisation, per-material masking).

Produces the same artifacts as the notebook, as a callable API + CLI-free
functions: signed/absolute error maps, per-material RMS tables, normals
renderings from depth, all colormapped to (H, W, 3) arrays ready for the
metric writer or PNG export.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from polardepth_tpu.eval.evaluation import MATERIAL_THRESHOLDS
from polardepth_tpu.ops.normals import depth_to_normals
from polardepth_tpu.utils.colormap import colormap_plasma, normalize_image


def error_maps(depth_pred: np.ndarray, depth_gt: np.ndarray,
               min_depth: float = 0.1, max_depth: float = 2.0) -> dict:
    """Signed error, absolute error and squared error maps with the valid
    mask applied (invalid pixels zeroed)."""
    pred = np.asarray(depth_pred).squeeze()
    gt = np.asarray(depth_gt).squeeze()
    valid = (gt > min_depth) & (gt < max_depth)
    signed = np.where(valid, pred - gt, 0.0)
    return {
        "signed": signed,
        "abs": np.abs(signed),
        "sq": signed ** 2,
        "valid": valid,
    }


def per_material_rms(depth_pred: np.ndarray, depth_gt: np.ndarray,
                     instance_mask: np.ndarray,
                     min_depth: float = 0.1,
                     max_depth: float = 2.0) -> Dict[str, float]:
    """RMS error per material slice (the notebook's per-material cells)."""
    maps = error_maps(depth_pred, depth_gt, min_depth, max_depth)
    inst = np.asarray(instance_mask).squeeze()
    out = {}
    for name, thr in MATERIAL_THRESHOLDS.items():
        if thr is None:
            m = maps["valid"]
        else:
            m = maps["valid"] & (inst >= thr[0]) & (inst <= thr[1])
        out[name] = float(np.sqrt(maps["sq"][m].mean())) if m.any() else \
            float("nan")
    return out


def render_error_heatmap(depth_pred, depth_gt, min_depth=0.1,
                         max_depth=2.0) -> np.ndarray:
    """(H, W, 3) plasma heatmap of |error| (notebook diff cells)."""
    maps = error_maps(depth_pred, depth_gt, min_depth, max_depth)
    return colormap_plasma(maps["abs"])


def render_normals(depth: np.ndarray, K: np.ndarray) -> np.ndarray:
    """(H, W, 3) normals visualisation (notebook kornia cell): unit normals
    mapped to [0, 1] rgb."""
    d = np.asarray(depth).squeeze()[None, ..., None].astype(np.float32)
    K3 = np.asarray(K, np.float32)[None, :3, :3]
    n = np.asarray(depth_to_normals(jnp.asarray(d), jnp.asarray(K3)))[0]
    return (n + 1.0) * 0.5


def render_disparity(disp: np.ndarray) -> np.ndarray:
    """Colormapped disparity (the reference's TB logging convention:
    plasma over per-image normalized values, trainer.py:1694-1722)."""
    return colormap_plasma(normalize_image(np.asarray(disp).squeeze()),
                           normalize=False)
