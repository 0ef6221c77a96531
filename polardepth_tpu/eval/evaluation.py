"""Per-material depth evaluation (reference: manydepth/evaluation.py:120-288).

Semantics reproduced:
  * pred = clamp(bilinear-to-full-res(disp_to_depth(disp_0)), min, max)
  * valid mask: min_depth < depth_gt < max_depth (strict)
  * material slice: instance id in [thres1, thres2] — ids are box=20,
    bottle=40, can=60, cup=80, remote=100, teapot=120, cutlery=140,
    glass=160, table=180, wall=200, objects=[20, 160]
  * metrics computed per frame, then averaged over frames
  * NO median scaling (supervised evaluation)

TPU-native change: the reference hauls every prediction to the CPU and loops
per frame per material in numpy (evaluation.py:221-281).  Here all 12 slices
for a whole batch are one vmapped masked-metric computation on device; the
host only accumulates per-frame scalars.  Frames with an empty slice are
excluded from the average (the reference's try/except silently duplicated the
previous frame's metrics — bug not reproduced, deviation documented).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from polardepth_tpu.ops.metrics import compute_depth_errors

MATERIAL_THRESHOLDS = {
    "all": None,
    "objects": (20, 160),
    "box": (20, 20), "bottle": (40, 40), "can": (60, 60), "cup": (80, 80),
    "remote": (100, 100), "teapot": (120, 120), "cutlery": (140, 140),
    "glass": (160, 160), "table": (180, 180), "wall": (200, 200),
}

METRIC_ORDER = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def eval_step_metrics(depth_gt: jnp.ndarray, depth_pred: jnp.ndarray,
                      instance_mask: jnp.ndarray,
                      min_depth: float, max_depth: float) -> Dict[str, dict]:
    """Per-frame metrics for every material slice, on device.

    Args:
      depth_gt, depth_pred: (B, H, W, 1); pred already clamped by caller.
      instance_mask: (B, H, W, 1) int ids.
    Returns: {slice: {metric: (B,) array, "count": (B,) valid-pixel counts}}.
    """
    valid = (depth_gt > min_depth) & (depth_gt < max_depth)

    def per_frame(gt, pred, mask):
        return compute_depth_errors(gt, pred, mask)

    vmetrics = jax.vmap(per_frame)

    out = {}
    for name, thr in MATERIAL_THRESHOLDS.items():
        if thr is None:
            m = valid
        else:
            m = valid & (instance_mask >= thr[0]) & (instance_mask <= thr[1])
        res = vmetrics(depth_gt, depth_pred, m)
        res["count"] = jnp.sum(m, axis=(1, 2, 3))
        out[name] = res
    return out


def empty_accumulator():
    """Device-side accumulator pytree: per-slice metric sums over frames
    with a non-empty slice, plus the frame count."""
    return {name: {**{m: jnp.float32(0) for m in METRIC_ORDER},
                   "frames": jnp.float32(0)}
            for name in MATERIAL_THRESHOLDS}


def accumulate_on_device(acc: dict, step_metrics: dict) -> dict:
    """Fold one batch's per-frame metrics into the accumulator *on device* —
    the whole eval epoch then needs a single host fetch (the reference
    fetches every prediction to the CPU per batch, evaluation.py:160-165;
    through a high-latency link that dominates eval time)."""
    out = {}
    for name, res in step_metrics.items():
        nonempty = (res["count"] > 0).astype(jnp.float32)
        slice_acc = {}
        for m in METRIC_ORDER:
            vals = jnp.where(nonempty > 0, res[m], 0.0)
            slice_acc[m] = acc[name][m] + jnp.sum(vals)
        slice_acc["frames"] = acc[name]["frames"] + jnp.sum(nonempty)
        out[name] = slice_acc
    return out


def accumulator_result(acc: dict) -> Dict[str, Dict[str, float]]:
    """Host-side finalisation of a fetched accumulator."""
    out = {}
    for name in MATERIAL_THRESHOLDS:
        c = max(float(acc[name]["frames"]), 1.0)
        out[name] = {m: float(acc[name][m]) / c for m in METRIC_ORDER}
        out[name]["frames"] = int(acc[name]["frames"])
    return out


class MetricAccumulator:
    """Host-side accumulation of per-frame metrics (mean over frames with a
    non-empty slice, matching the reference's frame-mean)."""

    def __init__(self):
        self.sums = {k: np.zeros(len(METRIC_ORDER)) for k in MATERIAL_THRESHOLDS}
        self.counts = {k: 0 for k in MATERIAL_THRESHOLDS}

    def update(self, step_metrics: Dict[str, dict]) -> None:
        for name, res in step_metrics.items():
            counts = np.asarray(res["count"])
            vals = np.stack([np.asarray(res[m]) for m in METRIC_ORDER], axis=-1)
            nonempty = counts > 0
            if nonempty.any():
                self.sums[name] += vals[nonempty].sum(axis=0)
                self.counts[name] += int(nonempty.sum())

    def result(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name in MATERIAL_THRESHOLDS:
            c = max(self.counts[name], 1)
            out[name] = {m: float(self.sums[name][i] / c)
                         for i, m in enumerate(METRIC_ORDER)}
            out[name]["frames"] = self.counts[name]
        return out


def format_table(results: Dict[str, Dict[str, float]]) -> str:
    """The reference's LaTeX-ready table layout (evaluation.py:284-285)."""
    lines = []
    header = "  " + ("{:>9} | " * 8).format("slice", *METRIC_ORDER)
    lines.append(header)
    for name, row in results.items():
        vals = "".join("&{: 9.5f}  ".format(row[m]) for m in METRIC_ORDER)
        lines.append(f"{name:>10} {vals}\\\\")
    return "\n".join(lines)
