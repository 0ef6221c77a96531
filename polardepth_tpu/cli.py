"""Command-line entry points.

  python -m polardepth_tpu train      [flags]   — supervised training
  python -m polardepth_tpu evaluate   [flags]   — per-material eval tables
  python -m polardepth_tpu pointcloud [flags]   — predict + export PLY cloud
  python -m polardepth_tpu export     [flags]   — StableHLO serving artifact
  python -m polardepth_tpu analyze    [flags]   — 2-D visual analysis report

Flag names mirror the reference's MonodepthOptions (options.py:13-380) so
train_supervised_GT.sh maps 1:1; --synthetic N substitutes N generated
scenes for the HAMMER dataset (smoke runs without data).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from polardepth_tpu.config import Config


def _bool(v) -> bool:
    """Proper boolean flag parsing (argparse's type=bool treats any
    non-empty string as True — the reference inherits that bug from its
    options.py; we don't)."""
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("1", "true", "yes", "y", "t")


def _add_common_flags(p: argparse.ArgumentParser) -> None:
    d = Config()
    p.add_argument("--data_path", type=str, default=d.data_path)
    p.add_argument("--data_path_val", type=str, default=d.data_path_val)
    p.add_argument("--log_dir", type=str, default=d.log_dir)
    p.add_argument("--model_name", type=str, default=d.model_name)
    p.add_argument("--height", type=int, default=d.height)
    p.add_argument("--width", type=int, default=d.width)
    p.add_argument("--min_depth", type=float, default=d.min_depth)
    p.add_argument("--max_depth", type=float, default=d.max_depth)
    p.add_argument("--dataset", type=str, default=d.dataset)
    p.add_argument("--split", type=str, default=d.split)
    p.add_argument("--eval_split", type=str, default=d.eval_split)
    p.add_argument("--offset", type=int, default=d.offset)
    p.add_argument("--modality", type=str, default=d.modality)
    p.add_argument("--depth_modality", type=str, default=d.depth_modality)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--learning_rate", type=float, default=d.learning_rate)
    p.add_argument("--num_epochs", type=int, default=d.num_epochs)
    p.add_argument("--scheduler_step_size", type=int,
                   default=d.scheduler_step_size)
    p.add_argument("--normals_loss_weight", type=float,
                   default=d.normals_loss_weight)
    p.add_argument("--disparity_smoothness", type=float,
                   default=d.disparity_smoothness)
    p.add_argument("--dropout_rate", type=float, default=d.dropout_rate)
    p.add_argument("--augment_xolp", action="store_true",
                   default=d.augment_xolp)
    p.add_argument("--no_augment_xolp", dest="augment_xolp",
                   action="store_false")
    p.add_argument("--augment_normals", action="store_true",
                   default=d.augment_normals)
    p.add_argument("--no_augment_normals", dest="augment_normals",
                   action="store_false")
    p.add_argument("--use_attention", action="store_true",
                   default=d.use_attention)
    p.add_argument("--depth_supervision", type=_bool,
                   default=d.depth_supervision)
    p.add_argument("--depth_supervision_only", type=_bool,
                   default=d.depth_supervision_only)
    p.add_argument("--train_student", action="store_true",
                   default=d.train_student)
    p.add_argument("--train_dpt", action="store_true", default=d.train_dpt)
    p.add_argument("--midas", action="store_true", default=False)
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="Megatron tensor-parallel degree for the DPT/ViT "
                        "family over a ('data','model') mesh "
                        "(parallel/tp.py); must divide the head count")
    p.add_argument("--dpt_backbone", type=str, default=d.dpt_backbone,
                   choices=("vitb_rn50", "vitb16", "vitl16"))
    p.add_argument("--dpt_weights_path", type=str,
                   default=d.dpt_weights_path,
                   help="converted timm/MiDaS .npz "
                        "(scripts/convert_torch_dpt.py)")
    p.add_argument("--num_depth_bins", type=int, default=d.num_depth_bins)
    p.add_argument("--depth_binning", type=str, default=d.depth_binning)
    p.add_argument("--freeze_teacher_epoch", type=int,
                   default=d.freeze_teacher_epoch)
    p.add_argument("--compute_dtype", type=str, default=d.compute_dtype)
    p.add_argument("--checkpoint_dir", type=str, default=d.checkpoint_dir)
    p.add_argument("--overfit", action="store_true", default=False)
    p.add_argument("--overfit_scene", type=str, default="")
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic scenes instead of HAMMER data")
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--save_frequency", type=int, default=d.save_frequency)
    p.add_argument("--log_frequency", type=int, default=d.log_frequency)
    p.add_argument("--weights_init", type=str, default=d.weights_init,
                   choices=("scratch", "pretrained"))
    p.add_argument("--pretrained_weights_path", type=str,
                   default=d.pretrained_weights_path)
    p.add_argument("--avg_reprojection", action="store_true",
                   default=d.avg_reprojection)
    p.add_argument("--v1_multiscale", action="store_true",
                   default=d.v1_multiscale)
    p.add_argument("--no_ssim", action="store_true", default=d.no_ssim)
    p.add_argument("--disable_automasking", action="store_true",
                   default=d.disable_automasking)
    p.add_argument("--disable_motion_masking", action="store_true",
                   default=d.disable_motion_masking)
    p.add_argument("--no_matching_augmentation", action="store_true",
                   default=d.no_matching_augmentation)
    p.add_argument("--num_matching_frames", type=int,
                   default=d.num_matching_frames)
    p.add_argument("--use_future_frame", action="store_true",
                   default=d.use_future_frame)
    p.add_argument("--pose_input", action="store_true", default=d.pose_input)
    p.add_argument("--supervise_pose", action="store_true",
                   default=d.supervise_pose)
    p.add_argument("--res_pose", action="store_true", default=d.res_pose)
    p.add_argument("--use_pallas", action="store_true", default=d.use_pallas)
    p.add_argument("--no_use_pallas", dest="use_pallas", action="store_false")
    p.add_argument("--warp_impl", type=str, default=d.warp_impl,
                   help="full-res reprojection sampler: auto (default: "
                        "pallas_fast on TPU, patch elsewhere) | patch | "
                        "flat4 | pallas[<K>][_fast] (see config.py)")
    p.add_argument("--cv_warp_impl", type=str, default=d.cv_warp_impl,
                   help="plane-sweep sampler: auto (default: pallas8_fast "
                        "on TPU, xla elsewhere) | xla | pallas[<K>][_fast] "
                        "(see models/cost_volume.py)")
    p.add_argument("--fast_decoder", action="store_true",
                   default=d.fast_decoder)
    p.add_argument("--phase_packed_decoder", action="store_true",
                   default=d.phase_packed_decoder,
                   help="space-to-depth packed full-res decoder stages "
                        "(exact; >=64-lane layouts, see ops/phase.py; "
                        "ON by default)")
    p.add_argument("--no_phase_packed_decoder", dest="phase_packed_decoder",
                   action="store_false",
                   help="unpacked (reference-shaped) decoder execution plan")
    p.add_argument("--fused_encoders", action="store_true",
                   default=d.fused_encoders,
                   help="run the XOLP+normals encoders as one 128-lane "
                        "stack (exact; models/pre_encoders.py:"
                        "FusedModalityEncoders; ON by default, dense plan)")
    p.add_argument("--no_fused_encoders", dest="fused_encoders",
                   action="store_false",
                   help="two independent 64-channel modality encoders "
                        "(reference-shaped param tree; needed to load a "
                        "separate-encoder checkpoint unconverted)")
    p.add_argument("--fused_plan", type=str, default=d.fused_plan,
                   choices=("grouped", "dense"),
                   help="execution plan for the fused stack (dense: "
                        "block-diagonal full-lane contraction, the "
                        "measured-fastest — bench_fusion.json)")
    p.add_argument("--student_remat", action="store_true",
                   default=d.student_remat,
                   help="rematerialise teacher/encoder/decoder activations "
                        "in the student backward pass (lower peak HBM; "
                        "default off — the noremat step is faster and fits "
                        "the published geometry, student_memory.json)")
    p.add_argument("--no_student_remat", dest="student_remat",
                   action="store_false")
    p.add_argument("--photometric_dtype", type=str,
                   default=d.photometric_dtype,
                   choices=("auto", "float32", "bfloat16"),
                   help="storage dtype of the photometric loss tensors "
                        "(auto = follow compute_dtype; math is always f32 "
                        "— see ops/losses.py)")
    p.add_argument("--photometric_packed", action="store_true",
                   default=d.photometric_packed,
                   help="stacked channels-leading photometric losses for the "
                        "self-sup/student paths (exact; see ops/losses.py)")
    p.add_argument("--enable_12channels", action="store_true",
                   default=d.enable_12channels)
    p.add_argument("--host_cache_gb", type=float, default=d.host_cache_gb)
    p.add_argument("--decode_backend", type=str, default=d.decode_backend,
                   choices=("auto", "native", "cv2"),
                   help="host PNG decode: C++ libpng thread pool ('native'),"
                        " cv2, or auto-detect")
    p.add_argument("--random_flip", type=_bool, default=None,
                   help="random horizontal flip of training samples "
                        "(default: on for KITTI-family datasets, off for "
                        "HAMMER — reference mono_dataset.py:152-160 vs "
                        "indoor_dataset.py:302)")
    p.add_argument("--mesh_shape", type=lambda s: tuple(
        int(x) for x in s.split(",")), default=d.mesh_shape,
        help="device mesh shape: '-1' (all devices data-parallel), '1', or "
             "'d,s' for a 2-D ('data','spatial') mesh that also splits "
             "image H s-ways (conv halo exchange is handled by XLA)")


def _config_from_args(a) -> Config:
    fields = {f for f in Config.__dataclass_fields__}
    kw = {k: v for k, v in vars(a).items() if k in fields}
    if kw.get("random_flip") is None:
        # Reference default: MonoDataset (KITTI-family) flips 50% of training
        # samples; the HAMMER IndoorDataset hardwires do_flip=False.
        kw["random_flip"] = kw.get("dataset", "HAMMER") != "HAMMER"
    cfg = Config(**kw)
    if cfg.dataset in ("kitti", "kitti_depth") and cfg.normals_loss_weight:
        # Velodyne/groundtruth depth is sparse: Sobel-gradient normals of a
        # mostly-zero map are noise, so the normals term would inject a
        # garbage loss.  The reference never trains supervised on KITTI
        # (its KITTI path is self-supervised), so zeroing is the consistent
        # completion.
        print(f"dataset {cfg.dataset!r} has sparse depth; forcing "
              "normals_loss_weight 0 (was "
              f"{cfg.normals_loss_weight})")
        cfg = cfg.replace(normals_loss_weight=0.0)
    return cfg


def _make_kitti_data(cfg: Config, a, part: str):
    """KITTI / Cityscapes supervised batches (RGB-only: these datasets
    carry no polarization captures, so --augment_xolp/--augment_normals
    must be off).  Mirrors the reference's dataset protocol: images are
    host-resized to the working resolution with area antialiasing (the
    reference's PIL-ANTIALIAS worker resize, mono_dataset.py:40-58), the
    normalized K is scaled by (W, H) (kitti_dataset.py:28-33), and the
    sparse depth is nearest-resized with zeros staying invalid.  Split
    files live in <cfg.split>/ as {train,val,test}_files.txt (the
    reference ships no KITTI splits either; point --split at e.g. an
    eigen_zhou folder)."""
    import cv2
    from polardepth_tpu.data.pipeline import BatchIterator
    from polardepth_tpu.data.kitti import (
        KittiRawIndex, KittiOdomIndex, KittiDepthIndex,
        CityscapesPreprocessedIndex, _nearest_resize)

    if cfg.augment_xolp or cfg.augment_normals:
        raise ValueError(
            f"dataset {cfg.dataset!r} has no polarization captures; run "
            "with --no_augment_xolp --no_augment_normals")
    # Supervised training needs a depth-bearing dataset.  kitti_odom and
    # cityscapes_preprocessed carry no depth (reference check_depth() is
    # False for both) — they train through the self-supervised path
    # (--depth_supervision_only false --depth_supervision false).
    if part == "train" and cfg.depth_supervision and \
            cfg.dataset not in ("kitti", "kitti_depth"):
        raise ValueError(
            f"dataset {cfg.dataset!r} has no depth supervision; train it "
            "self-supervised: --depth_supervision_only false "
            "--depth_supervision false")
    cls = {"kitti": KittiRawIndex, "kitti_odom": KittiOdomIndex,
           "kitti_depth": KittiDepthIndex,
           "cityscapes_preprocessed": CityscapesPreprocessedIndex}[
        cfg.dataset]
    split_dir = cfg.split if os.path.isdir(cfg.split) else \
        os.path.join(cfg.data_path, cfg.split)
    split_file = os.path.join(split_dir, f"{part}_files.txt")
    with open(split_file) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    index = cls(cfg.data_path, lines)
    h, w = cfg.height, cfg.width

    def load(i):
        s = index.load(int(i))
        out = {"color": cv2.resize(s["color"], (w, h),
                                   interpolation=cv2.INTER_AREA)}
        # K is normalized by the raw frame dims for every dataset here
        # (KITTI_NORMALIZED_K / CityscapesPreprocessedIndex), so scale by the
        # working resolution as the reference MonoDataset does.
        K = s["K"].copy()
        K[0, :] *= w
        K[1, :] *= h
        out["K"] = K
        out["inv_K"] = np.linalg.pinv(K).astype(np.float32)
        if "depth_gt" in s:
            d = _nearest_resize(s["depth_gt"][..., 0], (w, h))
            out["depth"] = d[..., None].astype(np.float32)
            out["depth_gt"] = out["depth"]
        out["mask"] = np.zeros((h, w, 1), np.int32)  # no instance ids
        return out

    it = BatchIterator(load, len(index), cfg.batch_size,
                       shuffle=(part == "train"), seed=cfg.seed,
                       cache_bytes=int(cfg.host_cache_gb * 2**30))
    return (lambda: iter(it)), max(len(it), 1)


def _make_data(cfg: Config, a, part: str):
    """Returns (make_batches_fn, steps_per_epoch)."""
    from polardepth_tpu.data.pipeline import BatchIterator
    if not a.synthetic and cfg.dataset != "HAMMER":
        return _make_kitti_data(cfg, a, part)
    if a.synthetic:
        from polardepth_tpu.data.synthetic import SyntheticHammer
        gen = SyntheticHammer(cfg.height, cfg.width, seed=cfg.seed
                              + (0 if part == "train" else 10_000))
        n = a.synthetic

        def load(i):
            return gen.sample(int(i))

        it = BatchIterator(load, n, cfg.batch_size,
                           shuffle=(part == "train"), seed=cfg.seed,
                       cache_bytes=int(cfg.host_cache_gb * 2**30))
        return (lambda: iter(it)), max(len(it), 1)

    from polardepth_tpu.data.hammer import HammerIndex, HammerLoader, read_split
    splits_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "splits")
    if cfg.overfit and cfg.overfit_scene:
        scenes = [cfg.overfit_scene]
    else:
        split = cfg.split if part != "test" else cfg.eval_split
        scenes = read_split(splits_dir, split, part)
    data_path = cfg.data_path if part != "test" else (cfg.data_path_val
                                                      or cfg.data_path)
    frame_ids = (0,) if cfg.depth_supervision_only else tuple(cfg.frame_ids)
    index = HammerIndex(data_path, scenes, frame_ids, cfg.offset,
                        cfg.modality, cfg.depth_modality)
    loader = HammerLoader(index, backend=cfg.decode_backend)

    def load(i):
        s = loader.load(int(i))
        s["K"] = loader.intrinsics_for(index.entries[int(i)][0],
                                       cfg.width, cfg.height)
        s["inv_K"] = np.linalg.pinv(s["K"]).astype(np.float32)
        return s

    it = BatchIterator(load, len(index), cfg.batch_size,
                       shuffle=(part == "train"), seed=cfg.seed,
                       cache_bytes=int(cfg.host_cache_gb * 2**30))
    return (lambda: iter(it)), max(len(it), 1)


def _make_kitti_multiframe_data(cfg: Config, a, part: str):
    """Multi-frame KITTI / Cityscapes batches for the self-supervised path
    (the reference's original monodepth2/ManyDepth use case: MonoDataset
    temporal triplets, poses predicted by the pose net — no rel_poses here).

    Frame spacing is the raw frame index (reference frame_idxs semantics,
    mono_dataset.py; HAMMER's `offset` spacing does not apply).  kitti raw /
    kitti_depth also ship sparse depth for the selfsup+supervised combo and
    for eval metrics; kitti_odom / cityscapes_preprocessed have none, so
    depth_supervision must be off for them.
    """
    import cv2
    from polardepth_tpu.data.pipeline import BatchIterator
    from polardepth_tpu.data.kitti import (
        KittiRawIndex, KittiOdomIndex, KittiDepthIndex,
        CityscapesPreprocessedIndex, _nearest_resize)

    if cfg.augment_xolp or cfg.augment_normals:
        raise ValueError(
            f"dataset {cfg.dataset!r} has no polarization captures; run "
            "with --no_augment_xolp --no_augment_normals")
    has_depth = cfg.dataset in ("kitti", "kitti_depth")
    if cfg.depth_supervision and not has_depth:
        raise ValueError(
            f"dataset {cfg.dataset!r} has no depth; add "
            "--depth_supervision false")
    cls = {"kitti": KittiRawIndex, "kitti_odom": KittiOdomIndex,
           "kitti_depth": KittiDepthIndex,
           "cityscapes_preprocessed": CityscapesPreprocessedIndex}[
        cfg.dataset]
    split_dir = cfg.split if os.path.isdir(cfg.split) else \
        os.path.join(cfg.data_path, cfg.split)
    with open(os.path.join(split_dir, f"{part}_files.txt")) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    index = cls(cfg.data_path, lines)
    h, w = cfg.height, cfg.width
    frame_ids = tuple(cfg.frame_ids)

    def _resize(img):
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_AREA)

    def load(i):
        i = int(i)
        if cfg.dataset == "cityscapes_preprocessed":
            trip = index.load_triplet(i)
            by_id = {-1: trip["frames"][0], 0: trip["frames"][1],
                     1: trip["frames"][2]}
            frames = [_resize(by_id[f]) for f in (0,) + tuple(
                f for f in frame_ids if f)]
            K = trip["K"].copy()
            s = {}
        else:
            s = index.load(i, with_depth=has_depth) \
                if cfg.dataset != "kitti_odom" else index.load(i)
            frames = [_resize(s["color"])]
            for f in frame_ids:
                if f == 0:
                    continue
                img = cv2.imread(index.image_path(i, offset=f),
                                 cv2.IMREAD_COLOR)[..., ::-1]
                frames.append(_resize(np.ascontiguousarray(img)))
            K = s["K"].copy()
        K[0, :] *= w
        K[1, :] *= h
        out = {"color_frames": np.stack(frames),
               "color": frames[0],
               "pol": np.zeros((h, w, 4), np.uint8),
               "K": K.astype(np.float32),
               "inv_K": np.linalg.pinv(K).astype(np.float32),
               "mask": np.zeros((h, w, 1), np.int32)}
        if "depth_gt" in s:
            d = _nearest_resize(s["depth_gt"][..., 0], (w, h))
            out["depth_gt"] = d[..., None].astype(np.float32)
            if cfg.depth_supervision:
                out["depth"] = out["depth_gt"]
        else:
            out["depth_gt"] = np.zeros((h, w, 1), np.float32)
        return out

    it = BatchIterator(load, len(index), cfg.batch_size,
                       shuffle=(part == "train"), seed=cfg.seed,
                       cache_bytes=int(cfg.host_cache_gb * 2**30))
    return (lambda: iter(it)), max(len(it), 1)


def _make_multiframe_data(cfg: Config, a, part: str):
    """Multi-frame batches (color_frames + rel_poses) for the
    self-supervised / teacher-student paths."""
    from polardepth_tpu.data.pipeline import BatchIterator
    frame_ids = tuple(cfg.frame_ids)
    if not a.synthetic and cfg.dataset != "HAMMER":
        return _make_kitti_multiframe_data(cfg, a, part)
    if a.synthetic:
        from polardepth_tpu.data.synthetic import SyntheticHammer
        gen = SyntheticHammer(cfg.height, cfg.width, seed=cfg.seed)
        n_batches = max(a.synthetic // cfg.batch_size, 1)

        def make():
            for b in range(n_batches):
                yield gen.batch_frames(cfg.batch_size, frame_ids,
                                       cfg.offset, start=b * cfg.batch_size)
        return make, n_batches

    from polardepth_tpu.data.hammer import HammerIndex, HammerLoader, read_split
    splits_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "splits")
    scenes = ([cfg.overfit_scene] if cfg.overfit and cfg.overfit_scene
              else read_split(splits_dir, cfg.split, part))
    index = HammerIndex(cfg.data_path, scenes, frame_ids, cfg.offset,
                        cfg.modality, cfg.depth_modality)
    loader = HammerLoader(index, backend=cfg.decode_backend)

    def load(i):
        i = int(i)
        base, center = index.entries[i]
        s0 = loader.load(i, 0)
        frames = [s0["color"]]
        rels = [np.eye(4, dtype=np.float32)]
        for f in frame_ids:
            if f == 0:
                continue
            sf = loader.load(i, f)
            frames.append(sf["color"])
            rels.append(loader.relative_pose(
                base, center + f * cfg.offset, center))
        s0["color_frames"] = np.stack(frames)
        s0["rel_poses"] = np.stack(rels)
        s0["K"] = loader.intrinsics_for(base, cfg.width, cfg.height)
        s0["inv_K"] = np.linalg.pinv(s0["K"]).astype(np.float32)
        return s0

    it = BatchIterator(load, len(index), cfg.batch_size,
                       shuffle=(part == "train"), seed=cfg.seed,
                       cache_bytes=int(cfg.host_cache_gb * 2**30))
    return (lambda: iter(it)), max(len(it), 1)


def _train_alternative_path(cfg: Config, a, writer) -> int:
    """Self-supervised / teacher-student / DPT training loops (the
    reference's flag-selected model graphs, trainer.py:141-236), run through
    the same fit protocol as the published path: eval-before-epoch-0,
    periodic in-epoch val/log, per-epoch eval + Orbax checkpoint with
    auto-resume (reference trainer.py:379-467)."""
    import jax
    import jax.numpy as jnp
    from polardepth_tpu.train.state import create_train_state, step_lr_schedule
    from polardepth_tpu.train.loop import AltTrainer
    from polardepth_tpu.train.pretrained import maybe_apply_pretrained

    rng = jax.random.PRNGKey(cfg.seed)
    h, w = cfg.height, cfg.width
    log_dir = os.path.join(cfg.log_dir, cfg.model_name)
    ckpt_dir = cfg.checkpoint_dir or os.path.join(log_dir, "checkpoints")

    def schedule(spe):
        return step_lr_schedule(cfg.learning_rate, spe,
                                cfg.scheduler_step_size, cfg.scheduler_gamma,
                                cfg.num_epochs)

    if cfg.train_dpt:
        from polardepth_tpu.models.dpt import DPTDepthModel, MidasNet
        from polardepth_tpu.train.dpt_trainer import (
            make_dpt_train_step, make_dpt_infer_step)
        model = MidasNet() if a.midas else \
            DPTDepthModel(backbone=cfg.dpt_backbone)
        data_fn, spe = _make_data(cfg, a, "train")
        eval_fn, _ = _make_data(cfg, a, "val" if not a.synthetic else "train")
        example = {"x": jnp.zeros((1, h, w, 3), jnp.float32)}
        state = create_train_state(
            model, {"params": rng, "dropout": rng}, example, schedule(spe))
        if cfg.weights_init == "pretrained":
            if cfg.dpt_weights_path and a.midas:
                from polardepth_tpu.models.resnext import (
                    load_midas_npz, load_torch_resnext101)
                from polardepth_tpu.utils.torch_pth import load_array_dict
                raw = load_array_dict(cfg.dpt_weights_path)
                if any(k.startswith("pretrained.") for k in raw):
                    # full MiDaS v2.1 checkpoint: trunk + scratch + head
                    p, s = load_midas_npz(dict(state.params),
                                          dict(state.batch_stats), raw)
                    state = state.replace(params=p, batch_stats=s)
                else:           # torchvision/WSL trunk-only dump
                    tp, ts = load_torch_resnext101(raw)
                    p = dict(state.params)
                    s = dict(state.batch_stats)
                    p["trunk"], s["trunk"] = tp, ts
                    state = state.replace(params=p, batch_stats=s)
            elif cfg.dpt_weights_path:
                from polardepth_tpu.models.dpt_weights import load_dpt_npz
                state = state.replace(params=load_dpt_npz(
                    state.params, cfg.dpt_weights_path,
                    grid_hw=(h // 16, w // 16)))
            else:
                print("weights_init=pretrained for the DPT/MiDaS family "
                      "needs --dpt_weights_path (scripts/convert_torch_dpt"
                      ".py); continuing from scratch")
        if a.tensor_parallel > 1:
            if a.midas:
                raise ValueError("--tensor_parallel shards ViT blocks; "
                                 "MidasNet has no transformer trunk")
            from polardepth_tpu.models.dpt import VARIANTS
            from polardepth_tpu.parallel import tp as tp_mod
            spec = VARIANTS[cfg.dpt_backbone]
            tp_mod.validate_tp(spec["dim"], spec["heads"], a.tensor_parallel)
            tmesh = tp_mod.create_tp_mesh(-1, a.tensor_parallel)
            state, sh = tp_mod.shard_train_state(state, tmesh)
            step = tp_mod.make_tp_train_step(model, cfg, tmesh, sh)
        else:
            step = jax.jit(make_dpt_train_step(model, cfg))
        alt = AltTrainer(cfg, state, step,
                         jax.jit(make_dpt_infer_step(model, cfg)), rng)
        alt.fit(data_fn, eval_fn, cfg.num_epochs, ckpt_dir, writer, spe)
        return 0

    if cfg.train_student:
        if not a.synthetic and cfg.dataset != "HAMMER":
            raise ValueError(
                "the teacher-student (cost-volume) path consumes GT relative "
                "poses, which only HAMMER provides; train KITTI-family data "
                "through the self-supervised path instead")
        from polardepth_tpu.train.student import (
            StudentModel, make_student_train_step, make_student_infer_step)
        model = StudentModel.from_config(cfg)
        data_fn, spe = _make_multiframe_data(cfg, a, "train")
        eval_fn, _ = _make_multiframe_data(
            cfg, a, "val" if not a.synthetic else "train")
        nf = len(cfg.frame_ids)
        n_lookup = len(cfg.matching_ids) - 1
        example = {
            "color_frames": jnp.zeros((1, nf, h, w, 3), jnp.float32),
            "pol": jnp.zeros((1, h, w, 4), jnp.float32),
            "lookup_frames": jnp.zeros((1, n_lookup, h, w, 3), jnp.float32),
            "rel_poses": jnp.zeros((1, n_lookup, 4, 4), jnp.float32),
            "K_quarter": jnp.eye(4)[None].astype(jnp.float32),
            "inv_K_quarter": jnp.eye(4)[None].astype(jnp.float32),
            "min_depth_bin": cfg.min_depth, "max_depth_bin": cfg.max_depth,
        }
        state = create_train_state(
            model, {"params": rng, "dropout": rng}, example, schedule(spe))
        state = maybe_apply_pretrained(state, cfg)
        trackers = (jnp.float32(cfg.min_depth), jnp.float32(cfg.max_depth))
        step = jax.jit(make_student_train_step(model, cfg))
        step_frozen = jax.jit(make_student_train_step(model, cfg,
                                                      freeze_teacher=True))
        alt = AltTrainer(cfg, state, step,
                         jax.jit(make_student_infer_step(model, cfg)), rng,
                         trackers=trackers, has_trackers=True)
        alt.step_select = (lambda e: step_frozen
                           if 0 <= cfg.freeze_teacher_epoch <= e else step)
        alt.fit(data_fn, eval_fn, cfg.num_epochs, ckpt_dir, writer, spe)
        return 0

    # self-supervised (optionally + depth supervision) mono path
    from polardepth_tpu.train.selfsup import (
        SelfSupModel, make_selfsup_train_step, make_selfsup_infer_step)
    model = SelfSupModel.from_config(cfg)
    data_fn, spe = _make_multiframe_data(cfg, a, "train")
    eval_fn, _ = _make_multiframe_data(
        cfg, a, "val" if not a.synthetic else "train")
    nf = len(cfg.frame_ids)
    example = {"color_frames": jnp.zeros((1, nf, h, w, 3), jnp.float32),
               "pol": jnp.zeros((1, h, w, 4), jnp.float32)}
    state = create_train_state(
        model, {"params": rng, "dropout": rng}, example, schedule(spe))
    state = maybe_apply_pretrained(state, cfg)
    alt = AltTrainer(cfg, state, jax.jit(make_selfsup_train_step(model, cfg)),
                     jax.jit(make_selfsup_infer_step(model, cfg)), rng)
    alt.fit(data_fn, eval_fn, cfg.num_epochs, ckpt_dir, writer, spe)
    return 0


def cmd_train(argv) -> int:
    p = argparse.ArgumentParser("polardepth train")
    _add_common_flags(p)
    a = p.parse_args(argv)
    cfg = _config_from_args(a)
    from polardepth_tpu.utils.logging import MetricWriter

    log_dir = os.path.join(cfg.log_dir, cfg.model_name)
    writer = MetricWriter(log_dir)

    if cfg.train_dpt or cfg.train_student or not cfg.depth_supervision_only:
        rc = _train_alternative_path(cfg, a, writer)
        writer.close()
        return rc

    from polardepth_tpu.train.trainer import Trainer
    train_fn, spe = _make_data(cfg, a, "train")
    eval_fn, _ = _make_data(cfg, a, "val" if not a.synthetic else "train")
    trainer = Trainer(cfg, steps_per_epoch=spe)
    ckpt_dir = cfg.checkpoint_dir or os.path.join(log_dir, "checkpoints")
    results = trainer.fit(train_fn, eval_fn, cfg.num_epochs, ckpt_dir,
                          writer=writer)
    for tag, table in results.items():
        for slice_name, row in table.items():
            writer.scalars(f"test_{slice_name}", trainer.epoch,
                           {k: v for k, v in row.items() if k != "frames"})
    writer.close()
    return 0


def cmd_evaluate(argv) -> int:
    p = argparse.ArgumentParser("polardepth evaluate")
    _add_common_flags(p)
    p.add_argument("--weights", type=str, required=False, default="",
                   help="checkpoint step dir (orbax) to load")
    p.add_argument("--reference_weights", type=str, default="",
                   help="a reference weights_<epoch>/ dir of per-component "
                        ".pth files (torch-free import; reference "
                        "evaluation.py:290-311)")
    p.add_argument("--post_process", action="store_true", default=False,
                   help="flip-averaged eval (the original Monodepth "
                        "post-processing; reference options.py "
                        "--post_process)")
    p.add_argument("--save_pred_disps", action="store_true", default=False,
                   help="also save predicted scaled disparities as one "
                        ".npy (reference options.py --save_pred_disps)")
    p.add_argument("--eval_out_dir", type=str, default="",
                   help="where --save_pred_disps writes (reference "
                        "options.py --eval_out_dir; default: cwd)")
    a = p.parse_args(argv)
    cfg = _config_from_args(a)
    from polardepth_tpu.train.trainer import Trainer
    from polardepth_tpu.train import checkpoint as ckpt

    eval_fn, spe = _make_data(cfg, a, "test" if not a.synthetic else "train")
    trainer = Trainer(cfg, steps_per_epoch=spe)
    if a.weights:
        trainer.state = ckpt.restore(a.weights, trainer.state)
    if a.reference_weights:
        from polardepth_tpu.models.reference_import import (
            load_reference_components)
        pp, ss, _ = load_reference_components(
            a.reference_weights, trainer.state.params,
            trainer.state.batch_stats)
        trainer.state = trainer.state.replace(params=pp, batch_stats=ss)
    trainer.evaluate(eval_fn())
    if a.save_pred_disps:
        # reference evaluate_depth semantics: one npy of scaled disparities
        # (1/depth) over the whole split, saved to --eval_out_dir
        disps = [1.0 / trainer.predict(b) for b in eval_fn()]
        out_dir = a.eval_out_dir or "."
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(
            out_dir, f"disps_{cfg.dataset}_{a.split or 'test'}_split.npy")
        np.save(path, np.concatenate(disps, axis=0))
        print(f"saved predicted disparities to {path}")
    return 0


def cmd_pointcloud(argv) -> int:
    p = argparse.ArgumentParser("polardepth pointcloud")
    _add_common_flags(p)
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--out", type=str, default="pointclouds")
    a = p.parse_args(argv)
    cfg = _config_from_args(a)
    from polardepth_tpu.train.trainer import Trainer
    from polardepth_tpu.train import checkpoint as ckpt
    from polardepth_tpu.eval.pointcloud import (
        depth_to_pointcloud, write_ply, export_prediction_pngs)

    eval_fn, spe = _make_data(cfg, a, "test" if not a.synthetic else "train")
    trainer = Trainer(cfg, steps_per_epoch=spe)
    if a.weights:
        trainer.state = ckpt.restore(a.weights, trainer.state)
    batch = next(eval_fn())
    depth = trainer.predict(batch)
    K = batch["K"][0]
    for i in range(depth.shape[0]):
        pts, cols = depth_to_pointcloud(
            depth[i], batch["color"][i], fx=K[0, 0], fy=K[1, 1],
            cx=K[0, 2], cy=K[1, 2])
        write_ply(os.path.join(a.out, f"cloud_{i:03d}.ply"), pts, cols)
        export_prediction_pngs(a.out, f"{i:03d}", batch["color"][i],
                               batch["mask"][i], depth[i],
                               batch["depth_gt"][i], cfg.max_depth)
    print(f"wrote {depth.shape[0]} clouds to {a.out}")
    return 0


def cmd_export(argv) -> int:
    """Serialize the fused preprocess+infer graph to a StableHLO artifact
    (see eval/export.py) for Python-free serving."""
    p = argparse.ArgumentParser("polardepth export")
    _add_common_flags(p)
    p.add_argument("--weights", type=str, default="",
                   help="checkpoint step dir (orbax) to load")
    p.add_argument("--out", type=str, default="model.shlo")
    p.add_argument("--batch", type=int, default=0,
                   help="fixed batch size; 0 = symbolic (any batch)")
    p.add_argument("--platforms", type=str, default="",
                   help="comma list, e.g. 'tpu,cpu'; default = current")
    a = p.parse_args(argv)
    cfg = _config_from_args(a)
    from polardepth_tpu.train import checkpoint as ckpt
    from polardepth_tpu.eval.export import make_export, save_artifact

    if cfg.train_dpt:
        import jax
        import jax.numpy as jnp
        from polardepth_tpu.models.dpt import DPTDepthModel, MidasNet
        from polardepth_tpu.train.state import create_train_state

        model = (MidasNet() if a.midas
                 else DPTDepthModel(backbone=cfg.dpt_backbone))
        rng = jax.random.PRNGKey(cfg.seed)
        example = {"x": jnp.zeros((1, cfg.height, cfg.width, 3),
                                  jnp.float32)}
        state = create_train_state(model, {"params": rng, "dropout": rng},
                                   example, cfg.learning_rate)
        if a.weights:
            state = ckpt.restore(a.weights, state)
    else:
        from polardepth_tpu.train.trainer import Trainer

        trainer = Trainer(cfg, steps_per_epoch=1)
        if a.weights:
            trainer.state = ckpt.restore(a.weights, trainer.state)
        state = trainer.state
    platforms = tuple(a.platforms.split(",")) if a.platforms else None
    exp = make_export(cfg, state, batch=a.batch or None,
                      platforms=platforms, midas=a.midas)
    save_artifact(exp, a.out, cfg)
    print(f"wrote {a.out} (+.json) — inputs {[str(s) for s in exp.in_avals]}"
          f" platforms {list(exp.platforms)}")
    return 0


def cmd_analyze(argv) -> int:
    """2-D visual analysis report from saved predictions (the reference's
    analysis_2d/visual_analysis.ipynb as a CLI): per-frame |error| heatmaps
    and masked-error renderings plus a per-material RMS markdown table,
    from the PNGs `polardepth pointcloud` exports
    (<name>_{rgb,mask,depth_pred,depth_gt}.png, depths uint16 mm)."""
    import cv2
    p = argparse.ArgumentParser("polardepth analyze")
    p.add_argument("--pred_dir", type=str, required=True,
                   help="dir of <name>_{rgb,mask,depth_pred,depth_gt}.png")
    p.add_argument("--out", type=str, default="",
                   help="output dir (default: <pred_dir>/analysis)")
    p.add_argument("--min_depth", type=float, default=0.1)
    p.add_argument("--max_depth", type=float, default=2.0)
    a = p.parse_args(argv)
    from polardepth_tpu.eval.analysis import (
        error_maps, per_material_rms, render_error_heatmap)
    from polardepth_tpu.utils.colormap import colormap_plasma

    out_dir = a.out or os.path.join(a.pred_dir, "analysis")
    os.makedirs(out_dir, exist_ok=True)
    names = sorted(f[: -len("_depth_pred.png")]
                   for f in os.listdir(a.pred_dir)
                   if f.endswith("_depth_pred.png"))
    if not names:
        print(f"no *_depth_pred.png in {a.pred_dir}")
        return 1

    rows = []
    agg: dict = {}
    for name in names:
        def _read(tag, flags=cv2.IMREAD_UNCHANGED):
            path = os.path.join(a.pred_dir, f"{name}_{tag}.png")
            img = cv2.imread(path, flags)
            if img is None:
                raise FileNotFoundError(path)
            return img
        pred = _read("depth_pred").astype(np.float32) / 1000.0
        gt = _read("depth_gt").astype(np.float32) / 1000.0
        mask = _read("mask")
        heat = render_error_heatmap(pred, gt, a.min_depth, a.max_depth)
        cv2.imwrite(os.path.join(out_dir, f"{name}_error.png"),
                    (heat[..., ::-1] * 255).astype(np.uint8))
        maps = error_maps(pred, gt, a.min_depth, a.max_depth)
        obj = maps["abs"] * ((mask >= 20) & (mask <= 160))
        cv2.imwrite(os.path.join(out_dir, f"{name}_error_objects.png"),
                    (colormap_plasma(obj)[..., ::-1] * 255).astype(np.uint8))
        rms = per_material_rms(pred, gt, mask, a.min_depth, a.max_depth)
        rows.append((name, rms))
        for k, v in rms.items():
            if np.isfinite(v):
                agg.setdefault(k, []).append(v)

    mats = [k for k in rows[0][1] if k in agg]
    lines = ["# 2-D visual analysis", "",
             f"{len(names)} frames from `{a.pred_dir}`; RMS depth error (m) "
             f"per material slice, valid range "
             f"[{a.min_depth}, {a.max_depth}] m.", "",
             "| frame | " + " | ".join(mats) + " |",
             "|---|" + "---|" * len(mats)]
    for name, rms in rows:
        lines.append("| " + name + " | " + " | ".join(
            f"{rms[m]:.4f}" if np.isfinite(rms.get(m, float('nan')))
            else "-" for m in mats) + " |")
    lines.append("| **mean** | " + " | ".join(
        f"{np.mean(agg[m]):.4f}" for m in mats) + " |")
    lines += ["", "Per-frame artifacts: `<name>_error.png` (|error| "
              "heatmap), `<name>_error_objects.png` (objects-masked)."]
    report = os.path.join(out_dir, "report.md")
    with open(report, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {report} (+{2 * len(names)} heatmaps)")
    return 0


def cmd_ar(argv) -> int:
    """Depth-aware AR occlusion demo (reference ar_visualization/main.py:
    223-237): from the PNGs `polardepth pointcloud` exports, composite a
    logo into the scene at the background depth and sweep it across the
    frame — scene pixels whose *predicted* depth is closer occlude the
    logo, so depth quality is visible as occlusion boundaries.  Writes an
    animated GIF (forward + reversed sweep, like the reference's
    make_ar_gif)."""
    import cv2
    p = argparse.ArgumentParser("polardepth ar")
    p.add_argument("--pred_dir", type=str, required=True,
                   help="dir of <name>_{rgb,mask,depth_pred,depth_gt}.png "
                        "(from `polardepth pointcloud`)")
    p.add_argument("--name", type=str, default="",
                   help="frame name prefix (default: first found)")
    p.add_argument("--logo", type=str, default="",
                   help="RGBA logo PNG (default: a generated placeholder)")
    p.add_argument("--out", type=str, default="",
                   help="output GIF (default: <pred_dir>/ar/depth_check.gif)")
    # reference __main__ sweep parameters (main.py:228-234)
    p.add_argument("--y_start", type=int, default=225)
    p.add_argument("--x_start", type=int, default=260)
    p.add_argument("--num_frames", type=int, default=30)
    p.add_argument("--pixel_movement_y", type=int, default=0)
    p.add_argument("--pixel_movement_x", type=int, default=3)
    p.add_argument("--logo_pixel_height", type=int, default=15)
    a = p.parse_args(argv)
    from polardepth_tpu.apps.ar import render_ar_gif

    name = a.name
    if not name:
        cands = sorted(f[: -len("_depth_pred.png")]
                       for f in os.listdir(a.pred_dir)
                       if f.endswith("_depth_pred.png"))
        if not cands:
            print(f"no *_depth_pred.png in {a.pred_dir}")
            return 1
        name = cands[0]

    def _read(tag):
        path = os.path.join(a.pred_dir, f"{name}_{tag}.png")
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise FileNotFoundError(path)
        return img

    rgb = _read("rgb")[..., ::-1]
    mask = _read("mask")
    pred = _read("depth_pred").astype(np.float32) / 1000.0
    gt = _read("depth_gt").astype(np.float32) / 1000.0
    h, w = pred.shape[:2]
    if a.logo:
        logo = cv2.imread(a.logo, cv2.IMREAD_UNCHANGED)
        if logo is None:
            raise FileNotFoundError(a.logo)
        if logo.shape[-1] == 4:
            logo = np.concatenate([logo[..., 2::-1], logo[..., 3:]], axis=-1)
        else:
            logo = logo[..., ::-1]
    else:
        # placeholder logo: a filled ring with alpha
        s = 64
        yy, xx = np.mgrid[:s, :s]
        r2 = (yy - s / 2) ** 2 + (xx - s / 2) ** 2
        ring = (r2 < (s * 0.45) ** 2) & (r2 > (s * 0.2) ** 2)
        logo = np.zeros((s, s, 4), np.uint8)
        logo[ring] = (40, 90, 220, 255)
    ys = [a.y_start + i * a.pixel_movement_y for i in range(a.num_frames)]
    xs = [a.x_start + i * a.pixel_movement_x for i in range(a.num_frames)]
    positions = [(int(np.clip(y, 0, h - 1)), int(np.clip(x, 0, w - 1)))
                 for y, x in zip(ys, xs)]
    positions = positions + positions[::-1]  # reference's forward+reverse
    out = a.out or os.path.join(a.pred_dir, "ar", "depth_check.gif")
    render_ar_gif(out, rgb, pred, gt, (mask > 0).astype(np.uint8), logo,
                  positions, duration_ms=300,
                  logo_pixel_height=a.logo_pixel_height)
    print(f"wrote {out} ({len(positions)} frames)")
    return 0


COMMANDS = {"train": cmd_train, "evaluate": cmd_evaluate,
            "pointcloud": cmd_pointcloud, "export": cmd_export,
            "analyze": cmd_analyze, "ar": cmd_ar}


def main(argv=None) -> int:
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # Some TPU plugins (axon) register even with the env var set; the
        # config-level pin before first backend use is the reliable opt-out
        # (otherwise a wedged TPU tunnel hangs pure-CPU CLI runs).
        import jax
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialised by an importer
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in COMMANDS:
        print(__doc__)
        print("commands:", ", ".join(COMMANDS))
        return 1
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
