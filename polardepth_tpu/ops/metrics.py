"""The 7 standard depth-error metrics (reference: manydepth/layers.py:539-577).

Unlike the reference (which hauls predictions to the CPU and loops in numpy,
evaluation.py:215-288), these reduce on device and support masked evaluation
so a whole eval batch — including the 10 per-material slices — is one fused
XLA computation; cross-device reduction is a psum when run under a mesh.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_depth_errors(gt: jnp.ndarray, pred: jnp.ndarray,
                         mask: jnp.ndarray | None = None):
    """abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3 over valid pixels.

    Args:
      gt, pred: same-shape positive depths (pre-clamped by the caller, as the
        reference clamps pred to [min_depth, max_depth] before the metrics).
      mask: optional boolean/0-1 validity mask.  With mask=None this is
        numerically identical to compute_depth_errors_numpy on the flattened
        arrays.

    Returns:
      dict of 7 scalars.  With an all-zero mask the results are NaN (the
      reference's try/except-pass would skip such frames; callers filter).
    """
    if mask is None:
        w = jnp.ones_like(gt)
    else:
        w = mask.astype(gt.dtype)
        # Neutralize masked-out pixels *before* log/divide so 0 * inf never
        # poisons the weighted sums (gt=0 outside the valid range is common).
        one = jnp.ones_like(gt)
        gt = jnp.where(w > 0, gt, one)
        pred = jnp.where(w > 0, pred, one)
    denom = jnp.sum(w)

    def wmean(x):
        return jnp.sum(x * w) / denom

    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = wmean((thresh < 1.25).astype(gt.dtype))
    a2 = wmean((thresh < 1.25 ** 2).astype(gt.dtype))
    a3 = wmean((thresh < 1.25 ** 3).astype(gt.dtype))

    diff = gt - pred
    rmse = jnp.sqrt(wmean(diff * diff))
    log_diff = jnp.log(gt) - jnp.log(pred)
    rmse_log = jnp.sqrt(wmean(log_diff * log_diff))
    abs_rel = wmean(jnp.abs(diff) / gt)
    sq_rel = wmean(diff * diff / gt)

    return {"abs_rel": abs_rel, "sq_rel": sq_rel, "rmse": rmse,
            "rmse_log": rmse_log, "a1": a1, "a2": a2, "a3": a3}
