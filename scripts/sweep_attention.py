#!/usr/bin/env python
"""Attention-integration sweep (VERDICT r3 #6).

Round 3's ablation showed the arch1++ attention row REGRESSING vs the
tri-encoder on the synthetic protocol (OBJECTS a1 0.711 < 0.760), the one
ablation whose sign disagrees with the reference's headline (BASELINE.md
slide 39: attention best).  Two integration flaws were found in
models/attention.py round-3 form:
  1. the sinusoidal PE was added to the residual stream, so the features
     handed to JointEncoder carry a unit-magnitude position pattern;
  2. the attention delta was ungated, so the cold-start attention noise
     degrades short training runs.

This sweep trains, on the SAME corpus/protocol as run_ablations.py:
  tri        no attention (the bar to clear)
  legacy     round-3 integration (pe_in_stream=True, no gate)
  pe-clean   PE confined to attention, ungated delta
  gated      PE confined + gamma-gated delta (the new default)

  python scripts/sweep_attention.py --root /tmp/ablation_corpus --out ATTENTION_SWEEP.md
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from polardepth_tpu.config import Config  # noqa: E402


VARIANTS = [
    ("tri", dict(use_attention=False)),
    ("legacy", dict(use_attention=True, attention_pe_in_stream=True,
                    attention_gate=False)),
    ("pe-clean", dict(use_attention=True, attention_pe_in_stream=False,
                      attention_gate=False)),
    ("gated", dict(use_attention=True, attention_pe_in_stream=False,
                   attention_gate=True)),
]

# Modality rows for the degenerate-corpus run (VERDICT r4 #3): on a corpus
# whose glass/cutlery are photometrically degenerate, the headline claim of
# the reference ("polarization rescues glass/metal", BASELINE.md slide
# 33/39) predicts rgb << tri on those slices.
MODALITY_VARIANTS = [
    ("rgb", dict(use_attention=False, augment_xolp=False,
                 augment_normals=False)),
    # single-polarization-branch rows (reference slide 33's decomposition):
    # which of the two derived modalities carries the degenerate-surface
    # signal on its own?
    ("xolp", dict(use_attention=False, augment_xolp=True,
                  augment_normals=False)),
    ("normals", dict(use_attention=False, augment_xolp=False,
                     augment_normals=True)),
]


def main():
    from run_ablations import build_corpus, run_one, METRICS

    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/ablation_corpus")
    p.add_argument("--out", default="ATTENTION_SWEEP.md")
    p.add_argument("--train_scenes", type=int, default=16)
    p.add_argument("--val_scenes", type=int, default=4)
    p.add_argument("--frames", type=int, default=36)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=480)
    p.add_argument("--batch_size", type=int, default=12)
    p.add_argument("--num_epochs", type=int, default=16)
    p.add_argument("--scheduler_step_size", type=int, default=6)
    p.add_argument("--steps_per_call", type=int, default=8)
    p.add_argument("--partial", default="attention_sweep_partial.json")
    p.add_argument("--degenerate", default="",
                   help="comma-separated material names rendered "
                        "photometrically degenerate (e.g. glass,cutlery); "
                        "also adds the rgb-only modality row")
    p.add_argument("--transmissive", default="",
                   help="comma-separated material names additionally "
                        "rendered see-through (RGB shows the background "
                        "through the object; implies degenerate)")
    a = p.parse_args()
    degenerate = tuple(m for m in a.degenerate.split(",") if m)
    transmissive = tuple(m for m in a.transmissive.split(",") if m)
    degenerate = tuple(dict.fromkeys(degenerate + transmissive))
    variants = VARIANTS + (MODALITY_VARIANTS if degenerate else [])

    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log = print

    train_scenes, val_scenes = build_corpus(
        a.root, a.train_scenes, a.val_scenes, a.frames, a.height, a.width,
        degenerate=degenerate, transmissive=transmissive)
    base = Config(
        data_path=a.root, height=a.height, width=a.width,
        batch_size=a.batch_size, num_epochs=a.num_epochs,
        scheduler_step_size=a.scheduler_step_size,
        mesh_shape=(1,) if len(jax.devices()) == 1 else (-1,))

    partial = {}
    if os.path.exists(a.partial):
        with open(a.partial) as f:
            partial = json.load(f)

    results = []
    for name, kw in variants:
        if name in partial:
            results.append((name, partial[name]["table"]))
            log(f"=== {name} === (cached)")
            continue
        log(f"=== {name} ===")
        cfg = base.replace(**kw)
        t0 = time.time()
        trainer, table, train_time = run_one(
            name, cfg, train_scenes, val_scenes, a.steps_per_call, log)
        if kw.get("attention_gate"):
            g = jax.device_get(
                trainer.state.params["cross_modal_attention"]["gamma"])
            table["__gamma__"] = float(g[0])
            log(f"[{name}] learned gamma = {float(g[0]):.4f}")
        results.append((name, table))
        partial[name] = {"table": table,
                         "train_time_s": time.time() - t0}
        with open(a.partial, "w") as f:
            json.dump(partial, f, indent=1)
        del trainer
        jax.clear_caches()

    by = dict(results)
    deg_note = (
        f"  Corpus renders {', '.join(degenerate)} as photometrically "
        "degenerate specular surfaces (flat gray RGB, specular Fresnel "
        "DoLP/AoLP — data/synthetic.py) so the polarization channel carries "
        "UNIQUE depth signal on those slices, matching the reference's "
        "glass/metal regime." if degenerate else "")
    if transmissive:
        deg_note += (
            f"  {', '.join(transmissive)} additionally render TRANSMISSIVE: "
            "RGB shows the background plane through the object (thin-surface "
            "see-through, x0.82 attenuation) while depth_gt stays at the "
            "surface — misleading, not just missing, photometry; only "
            "DoLP/AoLP carry the surface.")
    lines = [
        "# Attention-integration sweep (VERDICT r3 #6)",
        "",
        f"Protocol: run_ablations.py corpus/loader/eval "
        f"({a.train_scenes}+{a.val_scenes} scenes x {a.frames} frames at "
        f"{a.width}x{a.height}, batch {a.batch_size}, {a.num_epochs} "
        "epochs, f32).  The bar: the attention row must AT LEAST match the "
        "tri-encoder (reference slide 39 has attention as its best "
        "OBJECTS row)." + deg_note,
        "",
    ]
    slices = ("objects", "all", "glass") + (("cutlery",) if degenerate
                                            else ())
    for sl in slices:
        lines.append(f"## {sl.upper()}")
        lines.append("")
        lines.append("| variant | " + " | ".join(METRICS) + " |")
        lines.append("|---|" + "---|" * len(METRICS))
        for name, tbl in results:
            if sl in tbl:
                row = " | ".join(f"{tbl[sl].get(m, float('nan')):.5f}"
                                 for m in METRICS)
                lines.append(f"| {name} | {row} |")
        lines.append("")
    g = by.get("gated", {}).get("__gamma__")
    if g is not None:
        lines.append(f"Learned attention gate gamma after training: "
                     f"{g:.4f} (init 0.1).")
        lines.append("")
    try:
        modality_rows = {n for n, _ in MODALITY_VARIANTS}
        tri = by["tri"]["objects"]["a1"]
        best_name, best = max(
            ((n, t["objects"]["a1"]) for n, t in results
             if n != "tri" and n not in modality_rows),
            key=lambda x: x[1])
        verdict = ("CLEARS the tri-encoder bar"
                   if best >= tri else "still below the tri-encoder")
        lines.append(f"**Verdict:** best attention variant `{best_name}` "
                     f"OBJECTS a1 {best:.5f} vs tri {tri:.5f} — {verdict}.")
        if degenerate and "rgb" in by:
            rgb = by["rgb"]["objects"]["a1"]
            rel = "ABOVE" if rgb > tri else "below"
            lines.append(
                f"The rgb-only modality row lands {rel} tri on OBJECTS "
                f"(a1 {rgb:.5f} vs {tri:.5f}) — see the analysis section "
                "for what that says about the corpus.")
    except KeyError:
        pass
    with open(a.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    log(f"wrote {a.out}")


if __name__ == "__main__":
    main()
