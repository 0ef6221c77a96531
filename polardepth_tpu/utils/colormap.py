"""Colormapped depth/disparity rendering for logging.

Reference: Trainer.colormap + normalize_image (trainer.py:1694-1722,
utils.py:normalize_image) — plasma colormap over per-image min/max
normalized values.  Implemented against matplotlib when present, with a
64-entry embedded plasma table fallback so logging works in minimal
environments.
"""

from __future__ import annotations

import numpy as np

_PLASMA_FALLBACK = None


def _plasma_table():
    global _PLASMA_FALLBACK
    if _PLASMA_FALLBACK is None:
        try:
            import matplotlib
            _PLASMA_FALLBACK = matplotlib.colormaps["plasma"](
                np.linspace(0, 1, 256))[:, :3]
        except Exception:
            # coarse plasma approximation (anchor colors, interpolated)
            anchors = np.array([
                [0.050, 0.030, 0.528], [0.294, 0.012, 0.631],
                [0.491, 0.012, 0.658], [0.658, 0.134, 0.588],
                [0.798, 0.280, 0.470], [0.902, 0.425, 0.360],
                [0.973, 0.586, 0.252], [0.993, 0.771, 0.155],
                [0.940, 0.975, 0.131]])
            x = np.linspace(0, 1, len(anchors))
            xi = np.linspace(0, 1, 256)
            _PLASMA_FALLBACK = np.stack(
                [np.interp(xi, x, anchors[:, c]) for c in range(3)], axis=-1)
    return _PLASMA_FALLBACK


def normalize_image(x: np.ndarray) -> np.ndarray:
    """Per-image min/max normalization (reference utils.normalize_image)."""
    ma, mi = float(np.max(x)), float(np.min(x))
    return (x - mi) / (ma - mi + 1e-5)


def colormap_plasma(x: np.ndarray, normalize: bool = True) -> np.ndarray:
    """(H, W) or (H, W, 1) scalar map -> (H, W, 3) float RGB."""
    x = np.asarray(x, np.float64)
    if x.ndim == 3:
        x = x[..., 0]
    if normalize:
        x = normalize_image(x)
    table = _plasma_table()
    idx = np.clip((x * 255).astype(np.int64), 0, 255)
    return table[idx]
