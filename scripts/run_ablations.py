#!/usr/bin/env python
"""Accuracy ablations: train the published graph variants to convergence on
an on-disk synthetic HAMMER corpus through the real HammerLoader, evaluate
the per-material table on held-out scenes, and write ACCURACY_r03.md.

Round-3 matrix (reference ablation axes, BASELINE.md slides 31-39 /
options.py:213-230):
  * modality block: RGB / +XOLP / +normals / tri-encoder  (slides 33/35)
  * arch1++ attention                                      (slide 39)
  * 12-channel polarization input                          (indoor_dataset
                                                            enable_12channels)
  * normals loss weight lambda in {0, 0.35, 1}             (slides 31-32)
  * smoothness off, scale-0-only                           (slides 31-32)
Also reports the bf16-vs-f32 inference metric delta on the tri-encoder
model (TPU MXU fast path sanity).

Run on the TPU:
  python scripts/run_ablations.py --root /tmp/ablation_corpus --out ACCURACY_r03.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polardepth_tpu.config import Config  # noqa: E402
from polardepth_tpu.data.hammer import HammerIndex, HammerLoader  # noqa: E402
from polardepth_tpu.data.pipeline import BatchIterator  # noqa: E402
from polardepth_tpu.data.synthetic import write_synthetic_scene  # noqa: E402

ABLATIONS = [
    # modality block (BASELINE slide 33/35)
    ("RGB", dict(augment_xolp=False, augment_normals=False)),
    ("RGB+XOLP", dict(augment_xolp=True, augment_normals=False)),
    ("RGB+normals", dict(augment_xolp=False, augment_normals=True)),
    ("RGB+XOLP+normals", dict(augment_xolp=True, augment_normals=True)),
    # arch1++ attention (BASELINE slide 39 / config 4)
    ("RGB+XOLP+normals+attention", dict(use_attention=True)),
    # 12-channel polarization input (indoor_dataset.py:220-256)
    ("12channel", dict(enable_12channels=True)),
    # normals loss weight sweep (slides 31-32; 0.35 == tri-encoder row)
    ("lambda=0", dict(normals_loss_weight=0.0)),
    ("lambda=1", dict(normals_loss_weight=1.0)),
    # loss-structure rows (slides 31-32)
    ("no-smoothness", dict(disparity_smoothness=0.0)),
    ("scale0-only", dict(scales=(0,))),
]

METRICS = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")


def build_corpus(root, n_train, n_val, frames, h, w, degenerate=(),
                 transmissive=()):
    """degenerate: material names rendered photometrically degenerate
    (specular DoLP, flat gray RGB); transmissive: names additionally
    rendered see-through (RGB shows the background THROUGH the object —
    the misleading-photometry glass regime); see data/synthetic.py."""
    train, val = [], []
    for i in range(n_train):
        scene = f"train_{i:02d}"
        if not os.path.isdir(os.path.join(root, scene)):
            write_synthetic_scene(root, scene, frames, h, w, seed=i,
                                  degenerate_materials=tuple(degenerate),
                                  transmissive_materials=tuple(transmissive))
        train.append(scene)
    for i in range(n_val):
        scene = f"val_{i:02d}"
        if not os.path.isdir(os.path.join(root, scene)):
            write_synthetic_scene(root, scene, frames, h, w, seed=1000 + i,
                                  degenerate_materials=tuple(degenerate),
                                  transmissive_materials=tuple(transmissive))
        val.append(scene)
    return train, val


def make_data(cfg, scenes, part):
    index = HammerIndex(cfg.data_path, scenes, (0,), cfg.offset,
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


def run_one(name, cfg, train_scenes, val_scenes, steps_per_call, log):
    from polardepth_tpu.train.trainer import Trainer
    train_fn, spe = make_data(cfg, train_scenes, "train")
    eval_fn, _ = make_data(cfg, val_scenes, "val")
    trainer = Trainer(cfg, steps_per_epoch=spe, log_fn=log)
    t0 = time.time()
    for e in range(cfg.num_epochs):
        logs = trainer.train_epoch(train_fn(), steps_per_call)
        log(f"[{name}] epoch {e}: loss={logs.get('loss', float('nan')):.5f} "
            f"({logs.get('examples_per_sec', 0):.1f} ex/s)")
    train_time = time.time() - t0
    table = trainer.evaluate(eval_fn())
    return trainer, table, train_time


def bf16_eval(trainer, cfg, val_scenes, log):
    """Evaluate the SAME trained parameters with bfloat16 activations."""
    import jax
    from polardepth_tpu.train.trainer import build_model, make_eval_step
    from polardepth_tpu.eval.evaluation import (
        empty_accumulator, accumulator_result)
    cfg16 = cfg.replace(compute_dtype="bfloat16")
    model16 = build_model(cfg16)
    eval_step = jax.jit(make_eval_step(model16, cfg16), donate_argnums=(2,))
    eval_fn, _ = make_data(cfg16, val_scenes, "val")
    acc = empty_accumulator()
    for batch in eval_fn():
        db = trainer._shard(batch, ("color", "pol", "depth_gt", "mask"))
        acc = eval_step(trainer.state, db, acc)
    return accumulator_result(jax.device_get(acc))


def fmt_row(row):
    return " | ".join(f"{row.get(m, float('nan')):.5f}" for m in METRICS)


def write_report(out_path, results, bf16_delta, meta):
    lines = [
        "# ACCURACY — round 3 ablations (synthetic corpus, real loader)",
        "",
        f"Setup: {meta['n_train']} train / {meta['n_val']} held-out scenes x "
        f"{meta['frames']} frames at {meta['w']}x{meta['h']}, supervised GT "
        f"depth, batch {meta['batch']}, Adam {meta['lr']}, "
        f"StepLR({meta['sched']}, x0.1), {meta['epochs']} epochs, "
        f"dropout 0.1, f32.  Hardware: {meta['device']}.",
        "",
        "The corpus is the physics-consistent synthetic HAMMER stand-in "
        "(data/synthetic.py): DoLP/AoLP follow the diffuse Fresnel curve "
        "the network's priors invert, so the XOLP/normals encoders receive "
        "real signal.  The real HAMMER dataset is not distributable with "
        "the framework; this protocol mirrors the reference ablation axes "
        "(BASELINE.md slides 31-39) on the same loader/eval code paths.  "
        "Rows beyond the modality block train the tri-encoder graph with "
        "one axis varied.",
        "",
    ]
    slices = ["all", "objects", "glass", "cutlery", "can", "bottle",
              "cup", "teapot", "remote", "box", "table"]
    for sl in slices:
        if not any(sl in tbl for _, tbl in results):
            continue
        lines.append(f"## {sl.upper()}")
        lines.append("")
        lines.append("| Config | " + " | ".join(METRICS) + " |")
        lines.append("|---|" + "---|" * len(METRICS))
        for name, tbl in results:
            if sl in tbl:
                lines.append(f"| {name} | {fmt_row(tbl[sl])} |")
        lines.append("")

    by = {n: t for n, t in results}

    lines.append("## Directionality vs BASELINE.md")
    lines.append("")
    for sl in ("glass", "objects", "all"):
        try:
            r = by["RGB"][sl]["abs_rel"]
            x = by["RGB+XOLP"][sl]["abs_rel"]
            verdict = "improves" if x < r else "does NOT improve"
            lines.append(f"- {sl}: RGB+XOLP abs_rel {x:.5f} vs RGB {r:.5f} "
                         f"-> XOLP {verdict} (reference slide 33: improves "
                         "glass)")
        except KeyError:
            pass
    lines.append("")

    # normals-weight ordering (reference slides 31-32: lambda=0.35 best)
    lam = {"0": by.get("lambda=0"), "0.35": by.get("RGB+XOLP+normals"),
           "1": by.get("lambda=1")}
    if all(v is not None for v in lam.values()):
        lines.append("## Normals loss weight sweep (reference slides 31-32)")
        lines.append("")
        lines.append("| lambda | objects abs_rel | objects rmse | "
                     "glass abs_rel | all abs_rel |")
        lines.append("|---|---|---|---|---|")
        for k, tbl in lam.items():
            lines.append(
                f"| {k} | {tbl['objects']['abs_rel']:.5f} | "
                f"{tbl['objects']['rmse']:.5f} | "
                f"{tbl['glass']['abs_rel']:.5f} | "
                f"{tbl['all']['abs_rel']:.5f} |")
        order = sorted(lam, key=lambda k: lam[k]["objects"]["abs_rel"])
        lines.append("")
        lines.append(f"Objects abs_rel ordering (best first): "
                     f"lambda={', '.join(order)} "
                     f"(reference: 0.35 best on objects/glass slices).")
        lines.append("")

    lines.append("## bf16-vs-f32 inference metric delta (tri-encoder)")
    lines.append("")
    lines.append("| slice | metric | f32 | bf16 | delta |")
    lines.append("|---|---|---|---|---|")
    for sl, m, f32v, bf16v in bf16_delta:
        lines.append(f"| {sl} | {m} | {f32v:.6f} | {bf16v:.6f} | "
                     f"{bf16v - f32v:+.6f} |")
    lines.append("")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/ablation_corpus")
    p.add_argument("--out", default="ACCURACY_r03.md")
    p.add_argument("--train_scenes", type=int, default=16)
    p.add_argument("--val_scenes", type=int, default=4)
    p.add_argument("--frames", type=int, default=36)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--num_epochs", type=int, default=16)
    p.add_argument("--scheduler_step_size", type=int, default=6)
    p.add_argument("--steps_per_call", type=int, default=8)
    p.add_argument("--only", default="",
                   help="comma list of ablation names to (re)run")
    p.add_argument("--partial", default="ablation_partial.json")
    a = p.parse_args()

    import jax
    # Persistent compilation cache: per-config jax.clear_caches() (the OOM
    # guard below) would otherwise force full recompiles of the same graphs.
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    device = str(jax.devices()[0])
    log = print

    log(f"building corpus under {a.root} ...")
    train_scenes, val_scenes = build_corpus(
        a.root, a.train_scenes, a.val_scenes, a.frames, a.height, a.width)

    base = Config(
        data_path=a.root, height=a.height, width=a.width,
        batch_size=a.batch_size, num_epochs=a.num_epochs,
        scheduler_step_size=a.scheduler_step_size,
        mesh_shape=(1,) if len(jax.devices()) == 1 else (-1,))

    only = set(a.only.split(",")) if a.only else None
    partial = {}
    if os.path.exists(a.partial):
        with open(a.partial) as f:
            partial = json.load(f)

    results = []
    bf16_delta = list(partial.get("__bf16_delta__", []))
    for name, kw in ABLATIONS:
        cfg = base.replace(**kw)
        if (only and name not in only) or \
                (not only and name in partial and name != "__bf16_delta__"):
            if name in partial:   # reuse completed rows on resume
                results.append((name, partial[name]["table"]))
                log(f"=== {name} === (cached)")
                continue
        log(f"=== {name} ===")
        trainer, table, train_time = run_one(
            name, cfg, train_scenes, val_scenes, a.steps_per_call, log)
        results.append((name, table))
        partial[name] = {"table": table, "train_time_s": train_time}
        if name == "RGB+XOLP+normals":
            f32_tbl = table
            bf16_tbl = bf16_eval(trainer, cfg, val_scenes, log)
            bf16_delta = []
            for sl in ("all", "objects", "glass"):
                for m in ("abs_rel", "rmse", "a1"):
                    if sl in f32_tbl and sl in bf16_tbl:
                        bf16_delta.append((sl, m, f32_tbl[sl][m],
                                           bf16_tbl[sl][m]))
            partial["__bf16_delta__"] = bf16_delta
        with open(a.partial, "w") as f:
            json.dump(partial, f, indent=1, default=float)
        del trainer
        # OOM guard: each config retains ~15 GB of host state (compiled
        # executables + transfer buffers keyed by the per-config jitted
        # closures) — the 10-config matrix OOM-killed a 125 GB host without
        # this.  The persistent compilation cache keeps re-runs cheap.
        import gc
        jax.clear_caches()
        gc.collect()

    meta = dict(n_train=a.train_scenes, n_val=a.val_scenes, frames=a.frames,
                h=a.height, w=a.width, batch=a.batch_size, lr=1e-4,
                sched=a.scheduler_step_size, epochs=a.num_epochs,
                device=device)
    write_report(a.out, results, bf16_delta, meta)
    log(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
