"""Supervised loss assembly + the device-side batch preprocessing.

Loss structure reproduces the published configuration's per-scale losses
(reference trainer.py:1126-1296 with depth_supervision_only):

  for each scale s in scales:
    disp_s -> bilinear upsample to full res -> disp_to_depth -> depth_s
    mask   = (min_depth <= depth_sup <= max_depth)
    loss_s = masked-L1(depth_sup, depth_s)
           + normals_loss_weight * masked mean(2 - cos_sim(normals(gt),
                                                           normals(pred)))
           + disparity_smoothness / 2^s * edge-aware-smoothness(
                 disp_s / mean(disp_s), color at scale s)
  total = mean over scales

preprocess_batch is part of the jitted step: uint8 -> float conversion, the
native->working-resolution resizes, and the color pyramid all run on device.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from polardepth_tpu.config import Config
from polardepth_tpu.ops.depth import disp_to_depth
from polardepth_tpu.ops.losses import (
    masked_l1_depth_loss, supervised_normals_loss, smooth_loss,
)
from polardepth_tpu.ops.resize import (
    resize_bilinear, resize_nearest, resize_antialias,
)


def preprocess_batch(batch: dict, cfg: Config, dtype=jnp.float32) -> dict:
    """Raw host batch (uint8/uint16-ish, possibly native resolution) ->
    model-ready device tensors at (cfg.height, cfg.width).

    The reference does all of this in DataLoader workers with PIL/cv2
    (indoor_dataset.py:277-428); here it is fused into the jit graph.
    """
    h, w = cfg.height, cfg.width
    out = dict(batch)

    color = batch["color"].astype(dtype) / 255.0
    if color.shape[1:3] != (h, w):
        color = resize_antialias(color, (h, w))
    out["color"] = color

    if "pol" in batch:  # absent in the RGB-only graph
        pol = batch["pol"].astype(dtype)  # keep the 0..255 scale for XOLP
        if pol.shape[1:3] != (h, w):
            pol = resize_antialias(pol, (h, w))
        out["pol"] = pol

    for k in ("depth", "depth_gt"):
        if k in batch:
            d = batch[k].astype(dtype)
            if d.shape[1:3] != (h, w):
                # effective reference behaviour is bilinear (see data/hammer.py)
                d = resize_bilinear(d, (h, w))
            out[k] = d

    if "mask" in batch:
        m = batch["mask"]
        if m.shape[1:3] != (h, w):
            m = resize_nearest(m, (h, w))
        out["mask"] = m

    return out


def twelve_channel_input(pol: jnp.ndarray) -> jnp.ndarray:
    """4 polarization captures (B, H, W, 4) in 0..255 -> the 12-channel
    encoder input: each capture replicated to 3 channels and concatenated in
    the reference's order pol00/pol10/pol01/pol11 = 0/90/45/135 deg
    (indoor_dataset.py:220-256; our pol channel order is 0/45/90/135)."""
    caps = [pol[..., i:i + 1] / 255.0 for i in (0, 2, 1, 3)]
    return jnp.concatenate([jnp.repeat(c, 3, axis=-1) for c in caps],
                           axis=-1)


def jitter_12ch(key, x12: jnp.ndarray) -> jnp.ndarray:
    """Color-jitter the four 3-channel groups with one factor draw per
    sample (the reference applies the same per-item ColorJitter transform to
    every capture, indoor_dataset.py:231-239)."""
    import jax
    from polardepth_tpu.data.augment import color_jitter
    b, h, w, _ = x12.shape
    groups = x12.reshape(b, h, w, 4, 3)
    out = jax.vmap(lambda g: color_jitter(key, g), in_axes=3,
                   out_axes=3)(groups)
    return out.reshape(b, h, w, 12)


def color_pyramid(color: jnp.ndarray, scales) -> Dict[int, jnp.ndarray]:
    """Clean-color pyramid for the smoothness loss (the reference builds it
    with successive PIL resizes; anti-aliased linear is the device analog)."""
    pyr = {}
    for s in scales:
        if s == 0:
            pyr[s] = color
        else:
            _, h, w, _ = color.shape
            pyr[s] = resize_antialias(color, (h // 2 ** s, w // 2 ** s))
    return pyr


def supervised_scale_terms(cfg: Config, depth, depth_sup, K, scale: int,
                           n_gt=None):
    """Masked-L1 + normals-cosine terms at one scale
    (reference trainer.py:1241-1252).  With v1_multiscale the prediction
    stays at scale resolution, so the GT is downsampled and the valid mask
    recomputed there with scaled intrinsics (documented deviation: the
    reference's v1_multiscale + depth_supervision combination shape-errors;
    this is the semantically consistent completion).

    n_gt: optionally precomputed normals(depth_sup) hoisted out of the
    caller's scale loop (valid only when not v1_multiscale)."""
    from polardepth_tpu.ops.camera import scale_intrinsics
    if cfg.v1_multiscale and scale:
        depth_sup = resize_bilinear(depth_sup, depth.shape[1:3])
        K = scale_intrinsics(K, 2.0 ** -scale)
        n_gt = None
    valid = ((depth_sup >= cfg.min_depth) &
             (depth_sup <= cfg.max_depth)).astype(depth_sup.dtype)
    l_dep = masked_l1_depth_loss(depth_sup, depth, valid)
    l_nrm = supervised_normals_loss(depth_sup, depth, K, valid, n_gt=n_gt)
    return l_dep, l_nrm


def _supervised_losses_packed(cfg: Config, outputs: dict,
                              batch: dict) -> tuple:
    """supervised_losses evaluated over the 4 scales as one stacked
    channels-leading computation (cf. ops.losses.reprojection_loss_stacked
    rationale): the per-scale full-res depth/normals tensors are (B,H,W,1)/
    (B,H,W,3) in the reference plan and pay the TPU minor-dim padding tax
    when materialized.  Same math, parity-tested.  Not v1_multiscale only."""
    from polardepth_tpu.ops.normals import depth_to_normals_hw
    h, w = cfg.height, cfg.width
    depth_sup = batch["depth"][..., 0]                       # (B, H, W)
    pyr = color_pyramid(batch["color"], cfg.scales)

    disp_full = [outputs[("disp", s)] if s == 0 else
                 resize_bilinear(outputs[("disp", s)], (h, w))
                 for s in cfg.scales]
    disp_stack = jnp.stack([d[..., 0] for d in disp_full], 1)  # (B, S, H, W)
    _, depth_stack = disp_to_depth(disp_stack, cfg.min_depth, cfg.max_depth)

    valid = ((depth_sup >= cfg.min_depth) &
             (depth_sup <= cfg.max_depth)).astype(depth_stack.dtype)
    denom = jnp.sum(valid)
    l1 = jnp.sum(jnp.abs(depth_sup[:, None] - depth_stack)
                 * valid[:, None], axis=(0, 2, 3)) / denom    # (S,)

    # always computed (the reference logs the unweighted normals loss even
    # when normals_loss_weight is 0, trainer.py:1248-1252)
    K3 = batch["K"][:, :3, :3]
    n_gt = depth_to_normals_hw(depth_sup[:, None], K3)        # (B,1,3,H,W)
    n_pred = depth_to_normals_hw(depth_stack, K3)             # (B,S,3,H,W)
    eps = 1e-8
    dot = jnp.sum(n_gt * n_pred, axis=2)
    na = jnp.sqrt(jnp.maximum(jnp.sum(n_gt * n_gt, axis=2), eps * eps))
    nb = jnp.sqrt(jnp.maximum(jnp.sum(n_pred * n_pred, axis=2), eps * eps))
    cos = dot / (na * nb)
    l_nrm = jnp.sum((2.0 - cos) * valid[:, None],
                    axis=(0, 2, 3)) / denom                   # (S,)

    logs = {}
    total = 0.0
    for si, s in enumerate(cfg.scales):
        disp = outputs[("disp", s)]
        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        l_smooth = smooth_loss(disp / (mean_disp + 1e-7), pyr[s])
        loss_s = (l1[si] + cfg.normals_loss_weight * l_nrm[si]
                  + cfg.disparity_smoothness * l_smooth / (2 ** s))
        total = total + loss_s
        logs[f"supervised_depth_loss/{s}"] = l1[si]
        logs[f"normals_loss/{s}"] = l_nrm[si]
        logs[f"smooth_loss/{s}"] = l_smooth
        logs[f"loss/{s}"] = loss_s

    total = total / cfg.num_scales
    logs["loss"] = total
    return total, logs


def supervised_losses(cfg: Config, outputs: dict, batch: dict) -> tuple:
    """Returns (total_loss, logs dict).  `outputs` holds ("disp", s) maps;
    `batch` must be preprocessed (working resolution, float)."""
    if cfg.photometric_packed and not cfg.v1_multiscale:
        return _supervised_losses_packed(cfg, outputs, batch)
    h, w = cfg.height, cfg.width
    depth_sup = batch["depth"]
    pyr = color_pyramid(batch["color"], cfg.scales)

    n_gt = None
    if not cfg.v1_multiscale and cfg.normals_loss_weight:
        # GT normals are identical at every scale (full-res supervision):
        # hoist them out of the loop (the reference recomputes them 4x,
        # trainer.py:1298-1309 called per scale)
        from polardepth_tpu.ops.normals import depth_to_normals
        n_gt = depth_to_normals(depth_sup, batch["K"][:, :3, :3])

    logs = {}
    total = 0.0
    for s in cfg.scales:
        disp = outputs[("disp", s)]
        if cfg.v1_multiscale:
            disp_full = disp           # loss at the scale's own resolution
        else:
            disp_full = resize_bilinear(disp, (h, w)) if s else disp
        _, depth = disp_to_depth(disp_full, cfg.min_depth, cfg.max_depth)

        l_depth, l_normals = supervised_scale_terms(
            cfg, depth, depth_sup, batch["K"], s, n_gt=n_gt)

        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        norm_disp = disp / (mean_disp + 1e-7)
        l_smooth = smooth_loss(norm_disp, pyr[s])

        loss_s = (l_depth + cfg.normals_loss_weight * l_normals
                  + cfg.disparity_smoothness * l_smooth / (2 ** s))
        total = total + loss_s
        logs[f"supervised_depth_loss/{s}"] = l_depth
        logs[f"normals_loss/{s}"] = l_normals
        logs[f"smooth_loss/{s}"] = l_smooth
        logs[f"loss/{s}"] = loss_s

    total = total / cfg.num_scales
    logs["loss"] = total
    return total, logs
