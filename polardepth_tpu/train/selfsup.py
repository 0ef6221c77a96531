"""Self-supervised (pose + reprojection) training path.

Capability parity with the reference's flag-off-by-default ManyDepth
machinery: pose prediction from stacked frame pairs
(trainer.py:669-750), differentiable reprojection warping
(generate_images_pred, trainer.py:983-1067) and the Monodepth2 loss with
min-reprojection automasking and random tie-breaking
(trainer.py:1069-1296).  The published HAMMER configuration is
supervised-only; this module provides the self-supervised graph for the
other flag combinations (depth_supervision both on and off).

TPU-native notes: pose pairs for all neighbour frames are evaluated in one
batched pose-net call (the reference loops frames in Python); the tie-break
noise (trainer.py:1192-1194) is PRNG-key-threaded instead of global torch
RNG.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from polardepth_tpu.config import Config
from polardepth_tpu.models.network import PolarDepthNet
from polardepth_tpu.models.resnet import ResNet18Encoder
from polardepth_tpu.models.pose import PoseDecoder
from polardepth_tpu.data.augment import color_jitter
from polardepth_tpu.ops.camera import (
    backproject_depth, project_3d, scale_intrinsics,
)
from polardepth_tpu.ops.depth import disp_to_depth
from polardepth_tpu.ops.losses import (
    cast_photometric, reprojection_loss, reprojection_loss_stacked,
    smooth_loss,
)
from polardepth_tpu.ops.resize import (
    resize_bilinear, resize_antialias,
)
from polardepth_tpu.ops.se3 import (
    transformation_from_parameters, rotmat_to_rotvec,
)
from polardepth_tpu.ops.warp import grid_sample, resolve_warp_impl
from polardepth_tpu.train.losses import color_pyramid


def color_jitter_frames(key: jax.Array, frames: jnp.ndarray,
                        apply_prob: float = 0.5) -> jnp.ndarray:
    """Jitter (B, F, H, W, 3) with ONE factor draw per sample shared across
    its frames — the reference builds a single ColorJitter transform per
    item and applies it to every frame (indoor_dataset.py:402-407)."""
    return jax.vmap(lambda fr: color_jitter(key, fr, apply_prob=apply_prob),
                    in_axes=1, out_axes=1)(frames)


def _resize_frames(frames: jnp.ndarray, hw) -> jnp.ndarray:
    b, f = frames.shape[:2]
    flat = frames.reshape(b * f, *frames.shape[2:])
    out = resize_antialias(flat, hw)
    return out.reshape(b, f, *out.shape[1:])


def preprocess_multiframe(batch: dict, cfg: Config, key: jax.Array,
                          train: bool = True) -> dict:
    """Raw multi-frame host batch (uint8, possibly native resolution) ->
    working-resolution float tensors inside the jit graph, plus the
    color-augmented copy the encoders consume (the reference resizes every
    frame to (H, W) and jitters in DataLoader workers,
    indoor_dataset.py:277-428; trainer.py:497 feeds color_aug to the nets
    and the clean colors to the losses)."""
    h, w = cfg.height, cfg.width
    key_jit, key_flip = jax.random.split(key)
    cf = batch["color_frames"].astype(jnp.float32) / 255.0
    if cf.shape[2:4] != (h, w):
        cf = _resize_frames(cf, (h, w))
    pb = {"color_frames": cf, "K": batch["K"], "inv_K": batch["inv_K"]}

    if "pol" in batch:
        pol = batch["pol"].astype(jnp.float32)  # keep 0..255 scale for XOLP
        if pol.shape[1:3] != (h, w):
            pol = resize_antialias(pol, (h, w))
        pb["pol"] = pol
    if "depth" in batch:
        d = batch["depth"].astype(jnp.float32)
        if d.shape[1:3] != (h, w):
            d = resize_bilinear(d, (h, w))
        pb["depth"] = d
    if train and cfg.random_flip:
        # KITTI-style 50% horizontal flip: all frames + depth flip together,
        # K untouched (reference MonoDataset, mono_dataset.py:152-160).
        from polardepth_tpu.data.augment import random_horizontal_flip
        pb = random_horizontal_flip(key_flip, pb)
    pb["color"] = pb["color_frames"][:, 0]
    pb["color_frames_aug"] = (color_jitter_frames(key_jit, pb["color_frames"])
                              if train else pb["color_frames"])
    if "rel_poses" in batch:
        pb["rel_poses"] = batch["rel_poses"]
    return pb


def frames_pyramid(color_frames: jnp.ndarray, scales,
                   v1_multiscale: bool) -> dict:
    """{scale: (B, F, H/2^s, W/2^s, 3)} source pyramids; only scale 0 unless
    v1_multiscale (reference source_scale logic, trainer.py:1140-1145)."""
    pyr = {0: color_frames}
    if v1_multiscale:
        _, _, h, w, _ = color_frames.shape
        for s in scales:
            if s:
                pyr[s] = _resize_frames(color_frames,
                                        (h // 2 ** s, w // 2 ** s))
    return pyr


class PoseNet(nn.Module):
    """ResNet18 (2-frame input) + PoseDecoder; component names match the
    reference checkpoints (pose_encoder / pose)."""

    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, frame_a, frame_b, train: bool = False):
        x = jnp.concatenate([frame_a, frame_b], axis=-1)
        feats = ResNet18Encoder(2, self.compute_dtype,
                                name="pose_encoder")(x, train)
        aa, t = PoseDecoder(1, 2, name="pose")([feats])
        return aa.astype(jnp.float32), t.astype(jnp.float32)


class SelfSupModel(nn.Module):
    """Depth net + pose net over a (0, -1, +1) frame stack."""

    frame_ids: Sequence[int] = (0, -1, 1)
    augment_xolp: bool = True
    augment_normals: bool = True
    dropout_rate: float = 0.1
    scales: Sequence[int] = (0, 1, 2, 3)
    refraction_index: float = 1.5
    compute_dtype: str = "float32"
    use_pallas: bool = True
    phase_packed_decoder: bool = False  # ops/phase.py packed decoder stages
    decoder_pad_mode: str = "reflect"   # "zero" = fast decoder
    fused_encoders: bool = False  # XOLP+normals as one 128-lane stack
    fused_plan: str = "dense"     # see FusedModalityEncoders.plan

    @classmethod
    def from_config(cls, cfg, **over):
        """Model fields from a Config — the one place the cfg->model
        plumbing lives, so new execution-plan knobs (e.g. fused_encoders)
        reach every entry point (CLI, bench, memory/profile scripts)."""
        kw = dict(
            frame_ids=tuple(cfg.frame_ids), augment_xolp=cfg.augment_xolp,
            augment_normals=cfg.augment_normals,
            dropout_rate=cfg.dropout_rate, scales=tuple(cfg.scales),
            refraction_index=cfg.refraction_index,
            compute_dtype=cfg.compute_dtype, use_pallas=cfg.use_pallas,
            phase_packed_decoder=cfg.phase_packed_decoder,
            decoder_pad_mode="zero" if cfg.fast_decoder else "reflect",
            fused_encoders=(cfg.fused_encoders and cfg.augment_xolp
                            and cfg.augment_normals),
            fused_plan=cfg.fused_plan)
        kw.update(over)
        return cls(**kw)

    @nn.compact
    def __call__(self, color_frames, pol=None, train: bool = False,
                 matching_ids=None):
        """color_frames: (B, F, H, W, 3) in frame_ids order (0 first).

        Returns (disps, poses[, matching_poses]): disps {("disp", s)}, poses
        {frame_id: T (B, 4, 4) cam0 -> cam_frame} (predict_poses semantics:
        temporal ordering of the pair + invert for past frames,
        trainer.py:696-706).

        matching_ids: when given (e.g. (0, -1)), additionally returns chained
        no-grad relative poses for the cost-volume lookup frames, predicted
        by the SAME pose net (the reference's default pose_input=False path,
        trainer.py:708-746), with blank frames masked to zero pose.
        """
        depth_net = PolarDepthNet(
            self.augment_xolp, self.augment_normals, self.dropout_rate,
            tuple(self.scales), self.refraction_index, self.compute_dtype,
            self.use_pallas,
            decoder_pad_mode=self.decoder_pad_mode,
            phase_packed_decoder=self.phase_packed_decoder,
            fused_encoders=(self.fused_encoders and self.augment_xolp
                            and self.augment_normals),
            fused_plan=self.fused_plan, name="mono")
        disps = depth_net(color_frames[:, 0], pol=pol, train=train)

        pose_net = PoseNet(self.compute_dtype, name="pose_net")
        poses = {}
        for i, f in enumerate(self.frame_ids):
            if f == 0:
                continue
            if f < 0:
                aa, t = pose_net(color_frames[:, i], color_frames[:, 0],
                                 train)
            else:
                aa, t = pose_net(color_frames[:, 0], color_frames[:, i],
                                 train)
            poses[f] = transformation_from_parameters(
                aa[:, 0], t[:, 0], invert=(f < 0))
        if matching_ids is None:
            return disps, poses

        idx_of = {f: i for i, f in enumerate(self.frame_ids)}
        matching = {}
        for fi in matching_ids:
            if fi == 0:
                continue
            if fi < 0:
                if fi == -1 and -1 in poses:
                    # identical pose-net pair (frame[-1], frame[0]) with
                    # invert=True was already evaluated for poses[-1];
                    # reuse it instead of a second full-res ResNet18
                    # forward (the reference recomputes under no_grad,
                    # trainer.py:708-746 — same value, wasted compute)
                    pose = poses[-1]
                else:
                    aa, t = pose_net(color_frames[:, idx_of[fi]],
                                     color_frames[:, idx_of[fi + 1]], train)
                    pose = transformation_from_parameters(aa[:, 0], t[:, 0],
                                                          invert=True)
                if fi != -1:
                    pose = jnp.einsum("bij,bjk->bik", pose, matching[fi + 1])
            else:
                aa, t = pose_net(color_frames[:, idx_of[fi - 1]],
                                 color_frames[:, idx_of[fi]], train)
                pose = transformation_from_parameters(aa[:, 0], t[:, 0],
                                                      invert=False)
                if fi != 1:
                    pose = jnp.einsum("bij,bjk->bik", pose, matching[fi - 1])
            valid = (jnp.sum(jnp.abs(color_frames[:, idx_of[fi]]),
                             axis=(1, 2, 3)) > 0).astype(pose.dtype)
            matching[fi] = jax.lax.stop_gradient(pose * valid[:, None, None])
        return disps, poses, matching


class MatchingPoseNet(nn.Module):
    """Chained no-grad pose prediction for the cost-volume lookup frames
    (reference predict_poses matching branch, trainer.py:708-746): poses are
    composed along consecutive pairs (0->-1, -1->-2, ...), blank frames get
    a zero pose (which the cost volume then skips via its validity mask)."""

    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, color_frames, frame_ids, matching_ids,
                 train: bool = False):
        pose_net = PoseNet(self.compute_dtype, name="pose_net")
        idx_of = {f: i for i, f in enumerate(frame_ids)}
        rel = {}
        for fi in matching_ids:
            if fi == 0:
                continue
            if fi < 0:
                a, b = color_frames[:, idx_of[fi]], \
                    color_frames[:, idx_of[fi + 1]]
                aa, t = pose_net(a, b, train)
                pose = transformation_from_parameters(aa[:, 0], t[:, 0],
                                                      invert=True)
                if fi != -1:
                    pose = jnp.einsum("bij,bjk->bik", pose, rel[fi + 1])
            else:
                a, b = color_frames[:, idx_of[fi - 1]], \
                    color_frames[:, idx_of[fi]]
                aa, t = pose_net(a, b, train)
                pose = transformation_from_parameters(aa[:, 0], t[:, 0],
                                                      invert=False)
                if fi != 1:
                    pose = jnp.einsum("bij,bjk->bik", pose, rel[fi - 1])
            # blank-frame masking (trainer.py:740-743)
            valid = (jnp.sum(jnp.abs(color_frames[:, idx_of[fi]]),
                             axis=(1, 2, 3)) > 0).astype(pose.dtype)
            rel[fi] = jax.lax.stop_gradient(pose * valid[:, None, None])
        return rel


def predict_residual_poses(model_apply, variables, cfg: Config,
                           warped: dict, color0: jnp.ndarray,
                           train: bool = False):
    """res_pose refinement (trainer.py:680-707, 548-565): run the pose net
    again on [warped source, target] pairs to estimate residual poses.

    model_apply: a bound PoseNet apply (params shared with the main pose
    net).  Returns {frame_id: residual T}.
    """
    res = {}
    for f in cfg.frame_ids:
        if f == 0:
            continue
        w = warped[("color", f, 0)]
        if f < 0:
            aa, t = model_apply(variables, w, color0, train)
        else:
            aa, t = model_apply(variables, color0, w, train)
        res[f] = transformation_from_parameters(aa[:, 0], t[:, 0],
                                                invert=(f < 0))
    return res


def generate_images_pred(cfg: Config, disps: dict, poses: dict,
                         color_frames: jnp.ndarray, K: jnp.ndarray,
                         inv_K: jnp.ndarray):
    """Warp each source frame into frame 0 through the predicted depth and
    pose at every scale (trainer.py:983-1067; grid_sample border padding,
    align_corners=True).  Returns ({("color", f, s)}, {("depth", 0, s)}).

    color_frames: (B, F, H, W, 3) float in [0, 1] at working resolution
    (clean, non-augmented — reprojection targets must be unjittered).
    v1_multiscale: warping and depth stay at each scale's own resolution
    with scaled intrinsics (reference source_scale = scale branch,
    trainer.py:996-1001)."""
    h, w = cfg.height, cfg.width
    warped = {}
    depths = {}
    colors = color_frames.astype(jnp.float32)
    pyr = frames_pyramid(colors, cfg.scales, cfg.v1_multiscale)
    impl = resolve_warp_impl(getattr(cfg, "warp_impl", "flat4"))
    # NOTE round-3 experiment: concatenating the per-scale grids into ONE
    # gather per frame (4x fewer, 4x larger gathers) forces all four
    # scales' warp temporaries live at once and OOMs a 16 GB v5e at the
    # published batch 12 — per-scale warps let XLA schedule them
    # sequentially.  Kept per-scale.
    for s in cfg.scales:
        disp = disps[("disp", s)]
        if cfg.v1_multiscale:
            hs, ws = h // 2 ** s, w // 2 ** s
            Ks = scale_intrinsics(K, 2.0 ** -s)
            inv_Ks = jnp.linalg.inv(Ks)
            src = pyr[s]
        else:
            hs, ws = h, w
            Ks, inv_Ks = K, inv_K
            disp = resize_bilinear(disp, (h, w)) if s else disp
            src = pyr[0]
        _, depth = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        depths[("depth", 0, s)] = depth
        points = backproject_depth(depth, inv_Ks)
        for i, f in enumerate(cfg.frame_ids):
            if f == 0:
                continue
            grid = project_3d(points, Ks, poses[f], hs, ws)
            warped[("color", f, s)] = grid_sample(
                src[:, i], grid, padding_mode="border",
                align_corners=True, impl=impl)
    return warped, depths


def _reduce_frames(per_frame, avg: bool):
    """Min over source frames (the ManyDepth default) or mean when
    avg_reprojection (reference trainer.py:1176-1186)."""
    stacked = jnp.concatenate(per_frame, axis=-1)
    if avg:
        return jnp.mean(stacked, axis=-1, keepdims=True)
    return jnp.min(stacked, axis=-1, keepdims=True)


def _packed_reduce(maps: jnp.ndarray, avg: bool) -> jnp.ndarray:
    """Min (or mean, avg_reprojection) over the frame axis of stacked
    per-pixel loss maps (..., F, H, W) -> (..., H, W)."""
    return jnp.mean(maps, axis=-3) if avg else jnp.min(maps, axis=-3)


def _selfsup_losses_packed(cfg: Config, rng: jax.Array, disps: dict,
                           warped: dict, depths: dict, batch: dict):
    """selfsup_losses evaluated through ONE stacked channels-leading
    photometric computation (ops.losses.reprojection_loss_stacked) — same
    math as the per-(frame, scale) path (parity-tested), minus the TPU
    lane-padding tax of the (B,H,W,3)/(B,H,W,1) intermediates.  Only valid
    when not v1_multiscale (every reprojection shares the full-res target,
    reference trainer.py:996-1001 source_scale=0 branch)."""
    color0 = batch["color"]
    pyr = color_pyramid(color0, cfg.scales)
    frames = [f for f in cfg.frame_ids if f != 0]
    frame_idx = {f: i for i, f in enumerate(cfg.frame_ids)}
    nf, ns = len(frames), len(cfg.scales)
    target = pyr[0]

    stack = [warped[("color", f, s)] for s in cfg.scales for f in frames]
    if not cfg.disable_automasking:
        src0 = frames_pyramid(batch["color_frames"], cfg.scales,
                              False)[0]
        stack += [src0[:, frame_idx[f]] for f in frames]
    # bf16 storage when the trunk is bf16 (arithmetic stays f32; see
    # ops/losses.photometric_storage_dtype)
    stack, target = cast_photometric(cfg, (stack, target))
    all_loss = reprojection_loss_stacked(
        jnp.stack(stack, axis=1), target, not cfg.no_ssim)  # (B, N, H, W)

    per_scale = _packed_reduce(
        all_loss[:, :ns * nf].reshape(
            (-1, ns, nf) + all_loss.shape[2:]), cfg.avg_reprojection)
    if cfg.disable_automasking:
        identity = None
    else:
        ident = _packed_reduce(all_loss[:, ns * nf:], cfg.avg_reprojection)
        # same tie-break noise stream as identity_at(0) (fold_in(rng, 0);
        # jax.random.normal yields identical values for (B,H,W,1)/(B,H,W))
        identity = ident + jax.random.normal(
            jax.random.fold_in(rng, 0), ident.shape) * 1e-5

    n_gt = None
    if cfg.depth_supervision and cfg.normals_loss_weight:
        from polardepth_tpu.ops.normals import depth_to_normals
        n_gt = depth_to_normals(batch["depth"], batch["K"][:, :3, :3])

    logs = {}
    total = 0.0
    for si, s in enumerate(cfg.scales):
        reproj = per_scale[:, si]
        if identity is None:
            mask = jnp.ones_like(reproj)
        else:
            mask = (reproj < identity).astype(jnp.float32)
        loss_s = jnp.sum(reproj * mask) / (jnp.sum(mask) + 1e-7)
        logs[f"reproj_loss/{s}"] = loss_s

        if cfg.depth_supervision:
            from polardepth_tpu.train.losses import supervised_scale_terms
            l_dep, l_nrm = supervised_scale_terms(
                cfg, depths[("depth", 0, s)], batch["depth"], batch["K"], s,
                n_gt=n_gt)
            logs[f"supervised_depth_loss/{s}"] = l_dep
            loss_s = loss_s + l_dep + cfg.normals_loss_weight * l_nrm

        disp = disps[("disp", s)]
        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        l_sm = smooth_loss(disp / (mean_disp + 1e-7), pyr[s])
        loss_s = loss_s + cfg.disparity_smoothness * l_sm / (2 ** s)

        logs[f"loss/{s}"] = loss_s
        total = total + loss_s

    total = total / cfg.num_scales
    logs["loss"] = total
    return total, logs


def selfsup_losses(cfg: Config, rng: jax.Array, disps: dict, warped: dict,
                   depths: dict, batch: dict):
    """Monodepth2 loss with automasking (trainer.py:1126-1296, is_multi=False
    path), plus optional supervised depth/normals terms when
    cfg.depth_supervision.  Honors avg_reprojection (mean instead of min over
    frames) and v1_multiscale (losses at each scale's own resolution)."""
    if cfg.photometric_packed and not cfg.v1_multiscale:
        return _selfsup_losses_packed(cfg, rng, disps, warped, depths, batch)
    color0 = batch["color"]             # clean (non-aug) frame-0 pyramid src
    # photometric storage dtype (bf16 when compute_dtype is bf16 — see
    # ops/losses.photometric_storage_dtype; arithmetic stays f32)
    pyr = cast_photometric(cfg, color_pyramid(color0, cfg.scales))
    src_pyr = cast_photometric(cfg, frames_pyramid(
        batch["color_frames"], cfg.scales, cfg.v1_multiscale))
    warped = cast_photometric(
        cfg, {k: v for k, v in warped.items() if k[0] == "color"})
    frames = [f for f in cfg.frame_ids if f != 0]
    frame_idx = {f: i for i, f in enumerate(cfg.frame_ids)}

    def identity_at(s: int):
        """Static-scene (identity) reprojection at a source scale, with the
        random tie-break noise (trainer.py:1192-1194)."""
        target = pyr[s]
        per_frame = [reprojection_loss(src_pyr[s][:, frame_idx[f]], target,
                                       not cfg.no_ssim) for f in frames]
        ident = _reduce_frames(per_frame, cfg.avg_reprojection)
        return ident + jax.random.normal(
            jax.random.fold_in(rng, s), ident.shape) * 1e-5

    identity0 = None if cfg.disable_automasking or cfg.v1_multiscale \
        else identity_at(0)

    logs = {}
    total = 0.0
    for s in cfg.scales:
        source_scale = s if cfg.v1_multiscale else 0
        target = pyr[source_scale]
        reproj = _reduce_frames(
            [reprojection_loss(warped[("color", f, s)], target,
                               not cfg.no_ssim) for f in frames],
            cfg.avg_reprojection)
        if cfg.disable_automasking:
            mask = jnp.ones_like(reproj)
        else:
            identity = identity0 if identity0 is not None else identity_at(s)
            mask = (reproj < identity).astype(jnp.float32)
        loss_s = jnp.sum(reproj * mask) / (jnp.sum(mask) + 1e-7)
        logs[f"reproj_loss/{s}"] = loss_s

        if cfg.depth_supervision:
            from polardepth_tpu.train.losses import supervised_scale_terms
            l_dep, l_nrm = supervised_scale_terms(
                cfg, depths[("depth", 0, s)], batch["depth"], batch["K"], s)
            logs[f"supervised_depth_loss/{s}"] = l_dep
            loss_s = loss_s + l_dep + cfg.normals_loss_weight * l_nrm

        disp = disps[("disp", s)]
        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        l_sm = smooth_loss(disp / (mean_disp + 1e-7), pyr[s])
        loss_s = loss_s + cfg.disparity_smoothness * l_sm / (2 ** s)

        logs[f"loss/{s}"] = loss_s
        total = total + loss_s

    total = total / cfg.num_scales
    logs["loss"] = total
    return total, logs


def pose_supervision_loss(poses: dict, rel_poses: jnp.ndarray,
                          frame_ids: Sequence[int]):
    """0.1 * |rotvec diff|^2 + |t diff|^2 vs GT relative poses
    (trainer.py:1267-1285; roma replaced by ops.se3.rotmat_to_rotvec)."""
    r_loss = 0.0
    t_loss = 0.0
    for i, f in enumerate(frame_ids):
        if f == 0:
            continue
        T_pred = poses[f]
        T_gt = rel_poses[:, i]
        r_pred = rotmat_to_rotvec(T_pred[:, :3, :3])
        r_gt = rotmat_to_rotvec(T_gt[:, :3, :3])
        r_loss = r_loss + 0.1 * jnp.mean((r_pred - r_gt) ** 2)
        t_loss = t_loss + jnp.mean((T_pred[:, :3, 3] - T_gt[:, :3, 3]) ** 2)
    return r_loss, t_loss


def residual_reprojection_loss(cfg: Config, rng: jax.Array, pose_params,
                               pose_stats, warped: dict, depths: dict,
                               color0: jnp.ndarray, K, inv_K):
    """res_pose refinement loss (reference trainer.py:548-565, 1158-1165,
    1238-1239): predict residual poses from [warped source, target] pairs
    with the same pose net, re-warp the warped images through them, and add
    min(reproj(re-warped), reproj(identity)+noise), min over frames.

    The residual pose pass runs with eval-mode BN (the reference updates BN
    stats here too; documented deviation to keep the step single-pass on
    batch statistics)."""
    from polardepth_tpu.ops.losses import reprojection_loss as rl
    h, w = cfg.height, cfg.width
    pose_net = PoseNet()
    losses = []
    depth0 = depths[("depth", 0, 0)]
    points = backproject_depth(depth0, inv_K)
    for f in cfg.frame_ids:
        if f == 0:
            continue
        src = warped[("color", f, 0)]
        if f < 0:
            aa, t = pose_net.apply(
                {"params": pose_params, "batch_stats": pose_stats},
                src, color0, False)
        else:
            aa, t = pose_net.apply(
                {"params": pose_params, "batch_stats": pose_stats},
                color0, src, False)
        T_res = transformation_from_parameters(aa[:, 0], t[:, 0],
                                               invert=(f < 0))
        grid = project_3d(points, K, T_res, h, w)
        re_warped = grid_sample(src, grid, padding_mode="border",
                                align_corners=True,
                                impl=resolve_warp_impl(
                                    getattr(cfg, "warp_impl", "flat4")))
        noise = jax.random.normal(
            jax.random.fold_in(rng, f + 128),  # fold_in needs non-negative
            (color0.shape[0], h, w, 1)) * 1e-5
        pair = jnp.concatenate(
            [rl(re_warped, color0, not cfg.no_ssim),
             rl(src, color0, not cfg.no_ssim) + noise], axis=-1)
        losses.append(jnp.min(pair, axis=-1, keepdims=True))
    return jnp.mean(jnp.min(jnp.concatenate(losses, axis=-1), axis=-1))


def make_selfsup_train_step(model: SelfSupModel, cfg: Config):
    """Jitted train step for the self-supervised graph; batch needs
    color_frames (B,F,Hn,Wn,3) uint8 (any resolution — resized to the
    working resolution on device), pol, K, inv_K (+ depth when
    cfg.depth_supervision, rel_poses when cfg.supervise_pose).  The encoders
    see the color-jittered copy; losses use the clean frames
    (reference trainer.py:497)."""
    needs_pol = cfg.augment_xolp or cfg.augment_normals

    def step(state, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        k_jit, k_noise, k_res, k_drop = jax.random.split(rng, 4)
        pb = preprocess_multiframe(batch, cfg, k_jit, train=True)
        if cfg.depth_supervision:
            pb.setdefault("depth", batch["depth"].astype(jnp.float32))

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            (disps, poses), mut = model.apply(
                variables, pb["color_frames_aug"],
                pol=pb["pol"] if needs_pol else None,
                train=True, rngs={"dropout": k_drop},
                mutable=["batch_stats"])
            warped, depths = generate_images_pred(
                cfg, disps, poses, pb["color_frames"], pb["K"],
                batch["inv_K"])
            loss, logs = selfsup_losses(cfg, k_noise, disps, warped, depths,
                                        pb)
            if cfg.res_pose:
                res_loss = residual_reprojection_loss(
                    cfg, k_res, params["pose_net"],
                    state.batch_stats.get("pose_net", {}),
                    warped, depths, pb["color"], batch["K"], batch["inv_K"])
                loss = loss + res_loss
                logs["res_pose_loss"] = res_loss
                logs["loss"] = loss
            if cfg.supervise_pose:
                r_loss, t_loss = pose_supervision_loss(
                    poses, batch["rel_poses"], cfg.frame_ids)
                loss = loss + r_loss + t_loss
                logs["r_loss"] = r_loss
                logs["t_loss"] = t_loss
                logs["loss"] = loss
            return loss, (logs, mut)

        grads, (logs, mut) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads=grads, batch_stats=mut["batch_stats"])
        return new_state, logs

    return step


def make_selfsup_infer_step(model: SelfSupModel, cfg: Config):
    """Depth inference through the mono depth net of the self-supervised
    graph (for eval tables / image logging in the alternative-path loops)."""
    needs_pol = cfg.augment_xolp or cfg.augment_normals

    def step(state, batch: dict):
        key = jax.random.PRNGKey(0)  # train=False: jitter is bypassed
        pb = preprocess_multiframe(batch, cfg, key, train=False)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        disps, _ = model.apply(
            variables, pb["color_frames"],
            pol=pb["pol"] if needs_pol else None, train=False)
        _, depth = disp_to_depth(disps[("disp", 0)], cfg.min_depth,
                                 cfg.max_depth)
        return jnp.clip(depth, cfg.min_depth, cfg.max_depth)

    return step
