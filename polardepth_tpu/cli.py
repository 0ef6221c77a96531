"""Command-line entry points.

  python -m polardepth_tpu train      [flags]   — supervised training
  python -m polardepth_tpu evaluate   [flags]   — per-material eval tables
  python -m polardepth_tpu pointcloud [flags]   — predict + export PLY cloud

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
    p.add_argument("--depth_supervision", type=bool,
                   default=d.depth_supervision)
    p.add_argument("--depth_supervision_only", type=bool,
                   default=d.depth_supervision_only)
    p.add_argument("--compute_dtype", type=str, default=d.compute_dtype)
    p.add_argument("--checkpoint_dir", type=str, default=d.checkpoint_dir)
    p.add_argument("--overfit", action="store_true", default=False)
    p.add_argument("--overfit_scene", type=str, default="")
    p.add_argument("--synthetic", type=int, default=0,
                   help="use N synthetic scenes instead of HAMMER data")
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--save_frequency", type=int, default=d.save_frequency)


def _config_from_args(a) -> Config:
    fields = {f for f in Config.__dataclass_fields__}
    kw = {k: v for k, v in vars(a).items() if k in fields}
    return Config(**kw)


def _make_data(cfg: Config, a, part: str):
    """Returns (make_batches_fn, steps_per_epoch)."""
    from polardepth_tpu.data.pipeline import BatchIterator
    if a.synthetic:
        from polardepth_tpu.data.synthetic import SyntheticHammer
        gen = SyntheticHammer(cfg.height, cfg.width, seed=cfg.seed
                              + (0 if part == "train" else 10_000))
        n = a.synthetic

        def load(i):
            return gen.sample(int(i))

        it = BatchIterator(load, n, cfg.batch_size,
                           shuffle=(part == "train"), seed=cfg.seed)
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
    loader = HammerLoader(index)

    def load(i):
        s = loader.load(int(i))
        s["K"] = loader.intrinsics_for(index.entries[int(i)][0],
                                       cfg.width, cfg.height)
        s["inv_K"] = np.linalg.pinv(s["K"]).astype(np.float32)
        return s

    it = BatchIterator(load, len(index), cfg.batch_size,
                       shuffle=(part == "train"), seed=cfg.seed)
    return (lambda: iter(it)), max(len(it), 1)


def cmd_train(argv) -> int:
    p = argparse.ArgumentParser("polardepth train")
    _add_common_flags(p)
    a = p.parse_args(argv)
    cfg = _config_from_args(a)
    from polardepth_tpu.train.trainer import Trainer
    from polardepth_tpu.utils.logging import MetricWriter

    train_fn, spe = _make_data(cfg, a, "train")
    eval_fn, _ = _make_data(cfg, a, "val" if not a.synthetic else "train")
    log_dir = os.path.join(cfg.log_dir, cfg.model_name)
    writer = MetricWriter(log_dir)
    trainer = Trainer(cfg, steps_per_epoch=spe)
    ckpt_dir = cfg.checkpoint_dir or os.path.join(log_dir, "checkpoints")
    results = trainer.fit(train_fn, eval_fn, cfg.num_epochs, ckpt_dir)
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
    a = p.parse_args(argv)
    cfg = _config_from_args(a)
    from polardepth_tpu.train.trainer import Trainer
    from polardepth_tpu.train import checkpoint as ckpt

    eval_fn, spe = _make_data(cfg, a, "test" if not a.synthetic else "train")
    trainer = Trainer(cfg, steps_per_epoch=spe)
    if a.weights:
        trainer.state = ckpt.restore(a.weights, trainer.state)
    trainer.evaluate(eval_fn())
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


COMMANDS = {"train": cmd_train, "evaluate": cmd_evaluate,
            "pointcloud": cmd_pointcloud}


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in COMMANDS:
        print(__doc__)
        print("commands:", ", ".join(COMMANDS))
        return 1
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
