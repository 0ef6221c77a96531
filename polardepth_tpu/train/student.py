"""ManyDepth teacher-student training path (--train_student).

Capability parity with the reference's multi-frame pipeline
(trainer.py:569-648 + compute_losses is_multi=True, 1200-1232):

  teacher  : the single-frame PolarDepthNet ("mono") + pose net — trains with
             the self-supervised (or supervised) losses until
             freeze_teacher_epoch, then freezes.
  student  : CostVolumeEncoder + DepthDecoder ("depth") over the current
             frame + lookup frames warped through GT/predicted relative
             poses.
  coupling : consistency loss |student_depth - sg(teacher_depth)| on pixels
             where the cost volume cannot be trusted (motion / augmentation
             masks), reprojection loss elsewhere.
  tricks   : static-camera and zero-cost-volume matching augmentation per
             sample (trainer.py:587-605), adaptive depth-bin EMA trackers
             (trainer.py:650-667) carried as part of the train state.

TPU-native: the augmentations are vectorised bernoulli masks (the reference
loops batch elements with python random); the depth-bin trackers live in the
train-state pytree so checkpoint/resume is exact; teacher freezing is a
stop_gradient switch under lax.cond-free static config (re-jit on freeze,
matching the reference's optimizer rebuild).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
from flax import struct

from polardepth_tpu.config import Config
from polardepth_tpu.models.cost_volume import CostVolumeEncoder
from polardepth_tpu.models.depth_decoder import DepthDecoder
from polardepth_tpu.ops.depth import disp_to_depth
from polardepth_tpu.ops.losses import reprojection_loss, smooth_loss
from polardepth_tpu.ops.resize import resize_bilinear, resize_nearest
from polardepth_tpu.train.losses import color_pyramid
from polardepth_tpu.train.selfsup import (
    SelfSupModel, generate_images_pred, selfsup_losses,
    preprocess_multiframe, _reduce_frames,
)


class StudentModel(nn.Module):
    """Teacher (SelfSupModel) + matching student sharing one param tree."""

    frame_ids: Sequence[int] = (0, -1, 1)
    matching_ids: Sequence[int] = (0, -1)
    augment_xolp: bool = True
    augment_normals: bool = True
    dropout_rate: float = 0.1
    scales: Sequence[int] = (0, 1, 2, 3)
    num_depth_bins: int = 96
    depth_binning: str = "linear"
    compute_dtype: str = "float32"
    bin_chunk: int = 16  # plane-sweep memory bound; see build_cost_volume
    cv_warp_impl: str = "xla"  # plane-sweep sampler; see build_cost_volume
    phase_packed_decoder: bool = False  # ops/phase.py packed decoder stages
    # (applies to both the teacher's mono decoder and the student decoder)
    decoder_pad_mode: str = "reflect"  # "zero" = fast decoder, both decoders
    # Rematerialize the teacher and the student encoder/decoder in the
    # backward pass: the combined teacher+student step at the published
    # batch 12 otherwise holds ~17 GB of 1/2-res encoder residuals (> one
    # chip's 15.75 GB HBM).  Costs ~1 extra forward of recompute.
    remat: bool = True
    fused_encoders: bool = False  # teacher's XOLP+normals as one 128-lane
    # stack (models/pre_encoders.py:FusedModalityEncoders)
    fused_plan: str = "dense"

    @classmethod
    def from_config(cls, cfg, **over):
        """Model fields from a Config (see SelfSupModel.from_config)."""
        kw = dict(
            frame_ids=tuple(cfg.frame_ids), matching_ids=cfg.matching_ids,
            augment_xolp=cfg.augment_xolp,
            augment_normals=cfg.augment_normals,
            dropout_rate=cfg.dropout_rate, scales=tuple(cfg.scales),
            num_depth_bins=cfg.num_depth_bins,
            depth_binning=cfg.depth_binning,
            compute_dtype=cfg.compute_dtype,
            cv_warp_impl=cfg.cv_warp_impl,
            phase_packed_decoder=cfg.phase_packed_decoder,
            decoder_pad_mode="zero" if cfg.fast_decoder else "reflect",
            remat=cfg.student_remat,
            fused_encoders=(cfg.fused_encoders and cfg.augment_xolp
                            and cfg.augment_normals),
            fused_plan=cfg.fused_plan)
        kw.update(over)
        return cls(**kw)

    @nn.compact
    def __call__(self, color_frames, pol, lookup_frames, rel_poses,
                 K_quarter, inv_K_quarter, min_depth_bin, max_depth_bin,
                 train: bool = False, freeze_teacher: bool = False,
                 pose_zero_mask=None):
        """Returns (teacher_out, student_out):
          teacher_out = (mono disps, poses)
          student_out = (student disps, lowest_cost, confidence_mask)
        """
        # flax remat counts `self` as arg 0: train/matching_ids are 3/4
        teacher_cls = (nn.remat(SelfSupModel, static_argnums=(3, 4))
                       if self.remat else SelfSupModel)
        teacher = teacher_cls(
            self.frame_ids, self.augment_xolp, self.augment_normals,
            self.dropout_rate, tuple(self.scales),
            compute_dtype=self.compute_dtype,
            phase_packed_decoder=self.phase_packed_decoder,
            decoder_pad_mode=self.decoder_pad_mode,
            fused_encoders=self.fused_encoders,
            fused_plan=self.fused_plan, name="teacher")
        t_train = train and not freeze_teacher
        if rel_poses is None:
            # pose_input=False (reference default): the lookup-frame poses
            # come from the teacher's own pose net, chained under no-grad
            # (trainer.py:708-746)
            disps, poses, matching = teacher(
                color_frames, pol, t_train, tuple(self.matching_ids))
            rel_poses = jnp.stack(
                [matching[f] for f in self.matching_ids if f != 0], axis=1)
        else:
            disps, poses = teacher(color_frames, pol, t_train, None)
        if freeze_teacher:
            disps = jax.tree_util.tree_map(jax.lax.stop_gradient, disps)
            poses = jax.tree_util.tree_map(jax.lax.stop_gradient, poses)
        if pose_zero_mask is not None:
            # zero-cost-volume matching augmentation applied to predicted
            # poses (the reference zeroes the pose rows, trainer.py:602-603)
            rel_poses = rel_poses * pose_zero_mask[:, None, None, None]

        # remat only the grad-bearing trunk inside the encoder — wrapping
        # the whole module would re-run the stop_gradient'ed plane sweep in
        # the backward pass (measured: the full volume executed twice per
        # step in round 2, ~0.6 s/step of pure recompute)
        encoder = CostVolumeEncoder(
            self.num_depth_bins, self.depth_binning, self.compute_dtype,
            self.bin_chunk, warp_impl=self.cv_warp_impl,
            remat_trunk=self.remat, name="encoder")
        feats, lowest_cost, confidence = encoder(
            color_frames[:, 0], lookup_frames, rel_poses, K_quarter,
            inv_K_quarter, min_depth_bin, max_depth_bin, train)
        decoder_cls = nn.remat(DepthDecoder) if self.remat else DepthDecoder
        student_disps = decoder_cls(
            tuple(self.scales), pad_mode=self.decoder_pad_mode,
            phase_packed=self.phase_packed_decoder,
            name="depth")(feats)
        return (disps, poses), (student_disps, lowest_cost, confidence)


def matching_augmentation(rng: jax.Array, color_frames: jnp.ndarray,
                          lookup_frames: jnp.ndarray,
                          rel_poses: jnp.ndarray):
    """Static-camera / zero-cost-volume augmentation (trainer.py:587-605):
    with p=0.25 replace the lookup frames by the current frame; with p=0.25
    zero the relative poses (cost volume skips them).  Returns
    (lookup_frames, rel_poses, augmentation_mask (B,1,1,1))."""
    b = lookup_frames.shape[0]
    u = jax.random.uniform(rng, (b,))
    static = u < 0.25
    zeroed = (u >= 0.25) & (u < 0.5)
    cur = jnp.broadcast_to(color_frames[:, 0:1], lookup_frames.shape)
    lookup = jnp.where(static[:, None, None, None, None], cur, lookup_frames)
    if rel_poses is not None:
        poses = jnp.where(zeroed[:, None, None, None],
                          jnp.zeros_like(rel_poses), rel_poses)
    else:
        poses = None
    aug_mask = (static | zeroed).astype(jnp.float32)[:, None, None, None]
    return lookup, poses, aug_mask, zeroed


def compute_matching_mask(cfg: Config, lowest_cost: jnp.ndarray,
                          mono_depth0: jnp.ndarray) -> jnp.ndarray:
    """Trust mask: cost-volume argmin depth within 100% of the teacher's
    (trainer.py:1112-1124).  lowest_cost is a *disparity* at 1/4 res."""
    h, w = cfg.height, cfg.width
    matching_depth = 1.0 / resize_nearest(
        lowest_cost[..., None], (h, w))
    mono = jax.lax.stop_gradient(mono_depth0)
    m = ((matching_depth - mono) / mono) < 1.0
    m = m & (((mono - matching_depth) / matching_depth) < 1.0)
    return m.astype(jnp.float32)


def _student_losses_packed(cfg: Config, rng: jax.Array, student_disps: dict,
                           warped: dict, depths: dict, mono_depths: dict,
                           consistency_mask: jnp.ndarray,
                           aug_mask: jnp.ndarray, batch: dict):
    """student_losses through one stacked channels-leading photometric
    computation (see ops.losses.reprojection_loss_stacked) — same math as
    the per-(frame, scale) path, parity-tested.  Valid only when not
    v1_multiscale (single full-res target)."""
    from polardepth_tpu.ops.losses import (
        cast_photometric, reprojection_loss_stacked)
    from polardepth_tpu.train.selfsup import _packed_reduce

    color0 = batch["color"]
    pyr = color_pyramid(color0, cfg.scales)
    frames = [f for f in cfg.frame_ids if f != 0]
    nf, ns = len(frames), len(cfg.scales)

    stack = jnp.stack(cast_photometric(cfg, [
        warped[("color", f, s)] for s in cfg.scales for f in frames]), axis=1)
    all_loss = reprojection_loss_stacked(
        stack, cast_photometric(cfg, pyr[0]), not cfg.no_ssim)
    per_scale = _packed_reduce(
        all_loss.reshape((-1, ns, nf) + all_loss.shape[2:]),
        cfg.avg_reprojection)                       # (B, S, H, W)

    mask = jnp.ones_like(per_scale[:, 0])           # (B, H, W)
    if not cfg.disable_motion_masking:
        mask = mask * consistency_mask[..., 0]
    if not cfg.no_matching_augmentation:
        mask = mask * (1.0 - aug_mask[..., 0])
    cons_mask = 1.0 - mask
    mask_sum = jnp.sum(mask) + 1e-7

    logs = {}
    total = 0.0
    for si, s in enumerate(cfg.scales):
        loss_s = jnp.sum(per_scale[:, si] * mask) / mask_sum
        logs[f"reproj_loss/{s}"] = loss_s

        consistency = jnp.mean(jnp.abs(
            depths[("depth", 0, s)][..., 0]
            - jax.lax.stop_gradient(
                mono_depths[("depth", 0, s)][..., 0])) * cons_mask)
        logs[f"consistency_loss/{s}"] = consistency
        loss_s = loss_s + consistency

        disp = student_disps[("disp", s)]
        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        loss_s = loss_s + cfg.disparity_smoothness * smooth_loss(
            disp / (mean_disp + 1e-7), pyr[s]) / (2 ** s)

        logs[f"loss/{s}"] = loss_s
        total = total + loss_s

    total = total / cfg.num_scales
    logs["loss"] = total
    return total, logs


def student_losses(cfg: Config, rng: jax.Array, student_disps: dict,
                   warped: dict, depths: dict, mono_depths: dict,
                   consistency_mask: jnp.ndarray,
                   aug_mask: jnp.ndarray, batch: dict):
    """is_multi=True loss assembly (trainer.py:1126-1296): reprojection on
    trusted pixels, consistency |multi - sg(mono)| on the rest, smoothness."""
    if cfg.photometric_packed and not cfg.v1_multiscale:
        return _student_losses_packed(
            cfg, rng, student_disps, warped, depths, mono_depths,
            consistency_mask, aug_mask, batch)
    from polardepth_tpu.ops.losses import cast_photometric
    color0 = batch["color"]
    pyr = cast_photometric(cfg, color_pyramid(color0, cfg.scales))
    warped = cast_photometric(
        cfg, {k: v for k, v in warped.items() if k[0] == "color"})
    frames = [f for f in cfg.frame_ids if f != 0]

    logs = {}
    total = 0.0
    for s in cfg.scales:
        source_scale = s if cfg.v1_multiscale else 0
        target = pyr[source_scale]
        reproj = _reduce_frames(
            [reprojection_loss(warped[("color", f, s)], target,
                               not cfg.no_ssim) for f in frames],
            cfg.avg_reprojection)
        mask = jnp.ones_like(reproj)
        if not cfg.disable_motion_masking:
            cmask = consistency_mask
            if cfg.v1_multiscale and s:
                cmask = resize_nearest(cmask, reproj.shape[1:3])
            mask = mask * cmask
        if not cfg.no_matching_augmentation:
            mask = mask * (1.0 - aug_mask)
        cons_mask = 1.0 - mask

        loss_s = jnp.sum(reproj * mask) / (jnp.sum(mask) + 1e-7)
        logs[f"reproj_loss/{s}"] = loss_s

        consistency = jnp.abs(
            depths[("depth", 0, s)]
            - jax.lax.stop_gradient(mono_depths[("depth", 0, s)])) * cons_mask
        consistency = jnp.mean(consistency)
        logs[f"consistency_loss/{s}"] = consistency
        loss_s = loss_s + consistency

        disp = student_disps[("disp", s)]
        mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
        loss_s = loss_s + cfg.disparity_smoothness * smooth_loss(
            disp / (mean_disp + 1e-7), pyr[s]) / (2 ** s)

        logs[f"loss/{s}"] = loss_s
        total = total + loss_s

    total = total / cfg.num_scales
    logs["loss"] = total
    return total, logs


def update_depth_bin_trackers(min_tracker, max_tracker, mono_depth0,
                              floor: float):
    """EMA trackers of the teacher's depth range (trainer.py:650-667)."""
    mn = jnp.mean(jnp.min(mono_depth0, axis=(1, 2, 3)))
    mx = jnp.mean(jnp.max(mono_depth0, axis=(1, 2, 3)))
    mn = jnp.maximum(floor, mn * 0.9)
    mx = mx * 1.1
    return min_tracker * 0.99 + mn * 0.01, max_tracker * 0.99 + mx * 0.01


def make_student_train_step(model: StudentModel, cfg: Config,
                            freeze_teacher: bool = False):
    """Jitted teacher+student step.  Carries (min_bin, max_bin) trackers as
    explicit scalars so they live in the caller's state pytree."""
    needs_pol = cfg.augment_xolp or cfg.augment_normals

    def step(state, trackers, batch: dict, rng: jax.Array):
        min_bin, max_bin = trackers
        rng = jax.random.fold_in(rng, state.step)
        k_jit, k_aug, k_noise, k_drop = jax.random.split(rng, 4)
        pb = preprocess_multiframe(batch, cfg, k_jit, train=True)
        if cfg.depth_supervision:
            pb.setdefault("depth", batch["depth"].astype(jnp.float32))
        color_frames = pb["color_frames"]          # clean, working res
        color_aug = pb["color_frames_aug"]         # encoder/pose input
        matching_idx = [list(cfg.frame_ids).index(f)
                        for f in cfg.matching_ids if f != 0]
        # lookup frames come from the augmented copy (reference
        # trainer.py:491)
        lookup = color_aug[:, matching_idx]
        # pose_input=True: GT relative poses from the dataset; otherwise the
        # teacher's pose net predicts them inside the model (reference
        # default, trainer.py:581-584 vs 708-746)
        rel = batch["rel_poses"][:, matching_idx] if cfg.pose_input else None
        pose_zero_mask = None
        if not cfg.no_matching_augmentation:
            lookup, rel, aug_mask, zeroed = matching_augmentation(
                k_aug, color_frames, lookup, rel)
            if rel is None:
                pose_zero_mask = 1.0 - zeroed.astype(jnp.float32)
        else:
            aug_mask = jnp.zeros((lookup.shape[0], 1, 1, 1), jnp.float32)

        K4 = batch["K"].at[:, 0].multiply(0.25).at[:, 1].multiply(0.25)
        inv_K4 = jnp.linalg.inv(K4)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            ((disps, poses), (sdisps, lowest, conf)), mut = model.apply(
                variables, color_aug,
                pb["pol"] if needs_pol else None,
                lookup, rel, K4, inv_K4, min_bin, max_bin,
                train=True, freeze_teacher=freeze_teacher,
                pose_zero_mask=pose_zero_mask,
                rngs={"dropout": k_drop}, mutable=["batch_stats"])

            # teacher losses (mono path)
            warped_t, depths_t = generate_images_pred(
                cfg, disps, poses, color_frames, batch["K"], batch["inv_K"])
            t_loss, t_logs = selfsup_losses(cfg, k_noise, disps, warped_t,
                                            depths_t, pb)

            # student losses (multi path) — reuses the teacher's poses
            warped_s, depths_s = generate_images_pred(
                cfg, sdisps, poses, color_frames, batch["K"], batch["inv_K"])
            conf_full = resize_nearest(
                conf[..., None], (cfg.height, cfg.width))
            cons_mask = conf_full
            if not cfg.disable_motion_masking:
                cons_mask = cons_mask * compute_matching_mask(
                    cfg, lowest, depths_t[("depth", 0, 0)])
            s_loss, s_logs = student_losses(
                cfg, k_noise, sdisps, warped_s, depths_s, depths_t,
                cons_mask, aug_mask, pb)

            loss = s_loss + (0.0 if freeze_teacher else t_loss)
            logs = {f"mono_{k}": v for k, v in t_logs.items()}
            logs.update(s_logs)
            logs["loss"] = loss
            return loss, (logs, mut, depths_t[("depth", 0, 0)])

        grads, (logs, mut, mono_d0) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads=grads, batch_stats=mut["batch_stats"])
        if not freeze_teacher:
            trackers = update_depth_bin_trackers(
                min_bin, max_bin, mono_d0, cfg.min_depth)
        return new_state, trackers, logs

    return step


def make_student_infer_step(model: StudentModel, cfg: Config):
    """Student (cost-volume) depth inference for eval: lookup frames through
    GT poses when pose_input else the teacher's predicted matching poses
    (the reference's multi-model eval path, trainer.py:825-860)."""
    from polardepth_tpu.ops.depth import disp_to_depth as d2d

    def step(state, trackers, batch: dict):
        min_bin, max_bin = trackers
        pb = preprocess_multiframe(batch, cfg, jax.random.PRNGKey(0),
                                   train=False)
        color_frames = pb["color_frames"]
        matching_idx = [list(cfg.frame_ids).index(f)
                        for f in cfg.matching_ids if f != 0]
        lookup = color_frames[:, matching_idx]
        rel = batch["rel_poses"][:, matching_idx] if cfg.pose_input else None
        K4 = batch["K"].at[:, 0].multiply(0.25).at[:, 1].multiply(0.25)
        inv_K4 = jnp.linalg.inv(K4)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        (_, (sdisps, _, _)) = model.apply(
            variables, color_frames, pb["pol"] if
            (cfg.augment_xolp or cfg.augment_normals) else None,
            lookup, rel, K4, inv_K4, min_bin, max_bin, train=False)
        _, depth = d2d(sdisps[("disp", 0)], cfg.min_depth, cfg.max_depth)
        return jnp.clip(depth, cfg.min_depth, cfg.max_depth)

    return step
