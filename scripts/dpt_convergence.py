#!/usr/bin/env python
"""DPT-family convergence demo: overfit DPTDepthModel (scratch vitb16) and
MidasNet on a few synthetic HAMMER frames until the supervised loss drops
>= 10x — evidence that the third graph family *trains*, not just executes
(reference trains DPT via trainer.py:161-167 with the single-scale
supervised branch, dpt/models.py:26-123).

Writes DPT_DEMO.md with the loss curves and the final/initial ratio.

  python scripts/dpt_convergence.py            # on the TPU
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def overfit(tag, model, cfg, batch, steps, log, warmup_div=20):
    import jax
    import jax.numpy as jnp
    import optax
    from polardepth_tpu.train.state import create_train_state
    from polardepth_tpu.train.dpt_trainer import make_dpt_train_step

    rng = jax.random.PRNGKey(0)
    example = {"x": jnp.zeros((1, cfg.height, cfg.width, 3), jnp.float32)}
    # warmup+cosine: a constant lr oscillates near the end of a scratch-ViT
    # overfit; the schedule is demo-only (the trainer keeps torch StepLR).
    sched = optax.warmup_cosine_decay_schedule(
        0.0, cfg.learning_rate, max(steps // warmup_div, 1), steps,
        cfg.learning_rate * 0.01)
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, sched)
    step = jax.jit(make_dpt_train_step(model, cfg), donate_argnums=(0,))
    dbatch = jax.device_put(batch)
    curve = []
    t0 = time.time()
    for i in range(steps):
        state, logs = step(state, dbatch, rng)
        if i % max(steps // 12, 1) == 0 or i == steps - 1:
            loss = float(logs["loss"])
            dep = float(logs["supervised_depth_loss/0"])
            curve.append((i, loss, dep))
            log(f"[{tag}] step {i}: loss={loss:.5f} depth_l1={dep:.5f}")
    dt = time.time() - t0
    return curve, dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=160)
    p.add_argument("--width", type=int, default=224)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--models", default="dpt,midas",
                   help="comma subset of {dpt, midas}; rows for models not "
                        "in this run are merged from a prior dpt_demo.json "
                        "(CPU fallback: MidasNet steps are minutes each at "
                        "full demo size on the 1-core box)")
    p.add_argument("--out", default="DPT_DEMO.md")
    p.add_argument("--lr", type=float, default=3e-4,
                   help="peak LR; MidasNet-from-scratch needs ~5e-5: the "
                        "ResNeXt+BN trunk amplifies a full Adam step into a "
                        "huge coherent head-output swing, and one overshoot "
                        "past zero kills the non_negative ReLU head "
                        "(gradients exactly zero forever after). The "
                        "reference never hits this because MidasNet only "
                        "ever loads pretrained weights (dpt/midas_net.py).")
    p.add_argument("--warmup_div", type=int, default=20,
                   help="warmup length = steps // warmup_div")
    a = p.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        # the axon plugin can register even with the env var set; the
        # config-level pin is the reliable CPU fallback (verify skill notes)
        jax.config.update("jax_platforms", "cpu")
    from polardepth_tpu.config import Config
    from polardepth_tpu.models.dpt import DPTDepthModel, MidasNet
    from polardepth_tpu.data.synthetic import SyntheticHammer

    log = print
    h, w, b = a.height, a.width, a.batch
    cfg = Config(height=h, width=w, batch_size=b, train_dpt=True,
                 learning_rate=a.lr, max_depth=2.0, mesh_shape=(1,))

    gen = SyntheticHammer(h, w, seed=7)
    full = gen.batch(b)
    batch = {k: full[k] for k in ("color", "depth", "K")}

    wanted = set(a.models.split(","))
    # per-model LR: see --lr help (MidasNet scratch dies above ~1e-4)
    zoo = {"dpt": ("DPTDepthModel(vitb16, scratch)",
                   lambda: DPTDepthModel(backbone="vitb16"),
                   a.lr, a.warmup_div),
           "midas": ("MidasNet (ResNeXt101 trunk, scratch)",
                     lambda: MidasNet(),
                     min(a.lr, 5e-5), max(a.warmup_div, 8))}
    prior = {}
    if os.path.exists("dpt_demo.json"):
        with open("dpt_demo.json") as f:
            prior = {r["model"]: r for r in json.load(f)}

    rows = []
    for key, (tag, make, lr_m, wdiv_m) in zoo.items():
        geom = f"{b}x{w}x{h}/{a.steps} steps @ lr {lr_m:g}"
        if key not in wanted:
            if tag in prior:   # merge the earlier run's row
                r = prior[tag]
                rows.append((r["model"], r.get("curve", []), r["first"],
                             r["last"], r["ratio"], r["wall_s"],
                             r.get("geom", geom)))
            continue
        curve, dt = overfit(tag, make(), cfg.replace(learning_rate=lr_m),
                            batch, a.steps, log, wdiv_m)
        first = next(d for _, _, d in curve if np.isfinite(d))
        last = curve[-1][2]
        rows.append((tag, curve, first, last, first / max(last, 1e-9), dt,
                     geom))

    dev = str(jax.devices()[0])
    lines = [
        "# DPT-family convergence demo",
        "",
        f"Overfit on synthetic HAMMER frames (geometry/steps/LR per row), "
        f"Adam warmup+cosine, "
        f"scratch init, supervised single-scale loss (the reference's "
        f"--train_dpt branch, trainer.py:161-167 + 1144-1146).  The gate is "
        f"the masked-L1 depth term: the total loss carries an irreducible "
        f"edge-aware-smoothness floor even at perfect depth.  "
        f"Hardware: {dev}.",
        "",
        "| model | run (BxWxH/steps@lr) | initial depth L1 | "
        "final depth L1 | reduction | wall s |",
        "|---|---|---|---|---|---|",
    ]
    for tag, curve, first, last, ratio, dt, g in rows:
        lines.append(f"| {tag} | {g} | {first:.4f} | {last:.4f} | "
                     f"{ratio:.1f}x | {dt:.0f} |")
    lines += ["", "Curves (step: total loss / depth L1):", ""]
    for tag, curve, *_ in rows:
        pts = ", ".join(f"{i}:{v:.4f}/{d:.4f}" for i, v, d in curve)
        lines.append(f"- **{tag}**: {pts}")
    lines.append("")
    ok = all(r[4] >= 10.0 for r in rows)
    covered = ", ".join(r[0] for r in rows)
    missing = [entry[0] for entry in zoo.values() if entry[0] not in
               {r[0] for r in rows}]
    verdict = "YES" if ok and not missing else ("NO" if not ok else "PARTIAL")
    lines.append(f"Graphs proven to train ({covered}): {verdict} "
                 "(>=10x depth-term reduction target)."
                 + (f"  NOT YET COVERED: {', '.join(missing)}." if missing
                    else ""))
    with open(a.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    with open("dpt_demo.json", "w") as f:
        json.dump([{"model": t, "first": fi, "last": la, "ratio": r,
                    "wall_s": d, "geom": g, "curve": [list(c) for c in cu]}
                   for t, cu, fi, la, r, d, g in rows], f, indent=1)
    log(f"wrote {a.out}; ok={ok}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
