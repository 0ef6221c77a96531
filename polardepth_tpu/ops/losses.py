"""Loss zoo: supervised depth, normals cosine, smoothness, SSIM, BerHu,
reprojection.

Reference locations: masked L1 depth + normals loss assembly
(trainer.py:1241-1252, 1298-1309), edge-aware smoothness
(layers.py:452-465), SSIM (layers.py:468-499), BerHu (layers.py:14-59),
photometric reprojection 0.85*SSIM + 0.15*L1 (trainer.py:1069-1081).

All functions take NHWC tensors and return scalars (or per-pixel maps where
the reference does), fully fused under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

from polardepth_tpu.ops.normals import depth_to_normals


def masked_l1_depth_loss(depth_gt: jnp.ndarray, depth_pred: jnp.ndarray,
                         mask: jnp.ndarray) -> jnp.ndarray:
    """sum(|gt - pred| * mask) / sum(mask)  (trainer.py:1247)."""
    mask = mask.astype(depth_pred.dtype)
    return jnp.sum(jnp.abs(depth_gt - depth_pred) * mask) / jnp.sum(mask)


def supervised_normals_loss(depth_gt: jnp.ndarray, depth_pred: jnp.ndarray,
                            K: jnp.ndarray, mask: jnp.ndarray,
                            eps: float = 1e-8,
                            n_gt: jnp.ndarray | None = None) -> jnp.ndarray:
    """Masked mean of (2 - cos_sim(normals(gt), normals(pred)))
    (trainer.py:1298-1309).  cos_sim uses torch F.cosine_similarity
    semantics: dot / (max(|a|, eps) * max(|b|, eps)).

    n_gt: optionally precomputed normals(depth_gt) — the per-scale supervised
    loss evaluates this term at every scale against the SAME full-res GT, so
    callers hoist the GT normals out of the scale loop (exact same math)."""
    if n_gt is None:
        n_gt = depth_to_normals(depth_gt, K[:, :3, :3])
    n_pred = depth_to_normals(depth_pred, K[:, :3, :3])
    dot = jnp.sum(n_gt * n_pred, axis=-1, keepdims=True)
    # norms computed as sqrt(max(sq, eps^2)): same forward as
    # max(norm, eps) but NaN-free backward at degenerate zero normals
    # (flat-depth regions; see ops/normals.py:depth_to_normals)
    na = jnp.sqrt(jnp.maximum(
        jnp.sum(n_gt * n_gt, axis=-1, keepdims=True), eps * eps))
    nb = jnp.sqrt(jnp.maximum(
        jnp.sum(n_pred * n_pred, axis=-1, keepdims=True), eps * eps))
    cos = dot / (na * nb)
    mask = mask.astype(depth_pred.dtype)
    return jnp.sum((2.0 - cos) * mask) / jnp.sum(mask)


def smooth_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware first-order disparity smoothness (layers.py:452-465).
    disp: (B,H,W,1); img: (B,H,W,3) at the same scale (any storage dtype —
    the arithmetic is float32)."""
    disp = disp.astype(jnp.float32)
    img = img.astype(jnp.float32)
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])
    grad_img_x = jnp.mean(jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]),
                          axis=-1, keepdims=True)
    grad_img_y = jnp.mean(jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]),
                          axis=-1, keepdims=True)
    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


def _avg_pool3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-1 average pool on reflection-padded input == the
    reference's ReflectionPad2d(1) + AvgPool2d(3, 1)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = (xp[:, :-2, :-2] + xp[:, :-2, 1:-1] + xp[:, :-2, 2:] +
           xp[:, 1:-1, :-2] + xp[:, 1:-1, 1:-1] + xp[:, 1:-1, 2:] +
           xp[:, 2:, :-2] + xp[:, 2:, 1:-1] + xp[:, 2:, 2:])
    return out / 9.0


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel (1 - SSIM)/2 clamped to [0, 1] (layers.py:468-499).

    Math runs in float32 regardless of the input storage dtype: the
    variance terms (E[x^2] - mu^2) would cancel catastrophically in bf16
    (texture variances ~1e-3 vs bf16 resolution ~8e-3 at 1.0).  bf16
    INPUTS are still worthwhile — they are what autodiff stores for the
    backward pass (see Config.photometric_dtype)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    mu_x = _avg_pool3(x)
    mu_y = _avg_pool3(y)
    sigma_x = _avg_pool3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3(x * y) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)


def reprojection_loss(pred: jnp.ndarray, target: jnp.ndarray,
                      use_ssim: bool = True) -> jnp.ndarray:
    """Per-pixel photometric loss, channel-averaged to (B,H,W,1)
    (trainer.py:1069-1081).  Inputs may be bf16 storage (see ssim's
    docstring); the arithmetic is always float32."""
    l1 = jnp.mean(jnp.abs(target.astype(jnp.float32)
                          - pred.astype(jnp.float32)),
                  axis=-1, keepdims=True)
    if not use_ssim:
        return l1
    s = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return 0.85 * s + 0.15 * l1


def _avg_pool3_hw(x: jnp.ndarray) -> jnp.ndarray:
    """3x3/stride-1 reflect-padded average pool over the LAST TWO dims of an
    arbitrary-rank tensor (same math as _avg_pool3, which pools dims 1-2 of
    NHWC)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(x, pad, mode="reflect")
    out = (xp[..., :-2, :-2] + xp[..., :-2, 1:-1] + xp[..., :-2, 2:] +
           xp[..., 1:-1, :-2] + xp[..., 1:-1, 1:-1] + xp[..., 1:-1, 2:] +
           xp[..., 2:, :-2] + xp[..., 2:, 1:-1] + xp[..., 2:, 2:])
    return out / 9.0


def ssim_hw(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel (1 - SSIM)/2 with H, W as the LAST TWO dims; x and y may
    have broadcasting leading dims (e.g. y = one target shared by N
    predictions).  Identical math to ssim()."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    mu_x = _avg_pool3_hw(x)
    mu_y = _avg_pool3_hw(y)
    sigma_x = _avg_pool3_hw(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3_hw(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3_hw(x * y) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x ** 2 + mu_y ** 2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)


def photometric_storage_dtype(cfg):
    """Storage dtype for the photometric tensors (warped predictions +
    color pyramids) feeding the reprojection losses, or None for f32.

    cfg.photometric_dtype "auto" follows cfg.compute_dtype: when the trunk
    already runs bf16, the photometric maps quantize at ~4e-3 relative —
    the same scale as the uint8/255 quantization of the images themselves —
    and halve the loss graph's autodiff-residual HBM traffic (the dominant
    trace bucket, profile_student_r4.json).  All loss ARITHMETIC stays f32
    (ssim/reprojection_loss upcast internally)."""
    d = getattr(cfg, "photometric_dtype", "auto")
    if d == "auto":
        d = getattr(cfg, "compute_dtype", "float32")
    return None if d == "float32" else d


def cast_photometric(cfg, tree):
    """Cast every float32 leaf of a photometric tensor tree to the storage
    dtype (no-op when that is f32)."""
    import jax

    sd = photometric_storage_dtype(cfg)
    if sd is None:
        return tree
    return jax.tree_util.tree_map(
        lambda x: x.astype(sd)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)


def reprojection_loss_stacked(preds: jnp.ndarray, target: jnp.ndarray,
                              use_ssim: bool = True) -> jnp.ndarray:
    """Photometric loss of N stacked predictions against one shared target,
    evaluated in a TPU-friendly channels-leading layout.

    Why this exists: the per-(frame, scale) NHWC formulation materializes
    dozens of (B, H, W, 3) and (B, H, W, 1) tensors whose minor dim is 3 or
    1 — XLA's TPU layout tiles the minor dim to 128 lanes, so every one of
    those pays a large HBM padding tax, and the loss shatters into hundreds
    of small fusions (profile_student_r3_trace.json: 0.47 s/step of loss
    elementwise).  Stacking the N photometric maps and transposing to
    (..., H, W) keeps the minor two dims at image size (W tiles at ~94% for
    480) and turns the whole photometric pyramid into a handful of large
    fusions.  Same math as N reprojection_loss calls (tested).

    preds: (B, N, H, W, C); target: (B, H, W, C).
    Returns per-pixel loss (B, N, H, W) — note: no trailing channel dim.
    """
    p = jnp.transpose(preds, (0, 1, 4, 2, 3))          # (B, N, C, H, W)
    t = jnp.transpose(target, (0, 3, 1, 2))[:, None]   # (B, 1, C, H, W)
    l1 = jnp.mean(jnp.abs(t.astype(jnp.float32)
                          - p.astype(jnp.float32)), axis=2)  # (B, N, H, W)
    if not use_ssim:
        return l1
    s = jnp.mean(ssim_hw(p, t), axis=2)
    return 0.85 * s + 0.15 * l1


def berhu_loss(pred: jnp.ndarray, gt: jnp.ndarray,
               threshold: float = 0.2) -> jnp.ndarray:
    """Reverse-Huber loss map (layers.py:14-59; defined but unused in the
    published config — kept for capability parity)."""
    huber_c = threshold * jnp.max(pred - gt)
    diff = jnp.abs(pred - gt)
    diff2 = jnp.where(diff > huber_c, diff, 0.0) ** 2
    return jnp.mean(jnp.concatenate([diff, diff2], axis=-1), axis=-1,
                    keepdims=True)
