"""Serving export: the full preprocess+inference graph as a serialized
StableHLO artifact (jax.export).

The deployable unit is the same fused graph bench.py measures — uint8
polarizer captures + RGB in, clamped metric depth out, zero host
round-trips — so a serving stack can run the model without Python, flax,
or this package: only a StableHLO runtime (XLA) and the artifact bytes.
The batch dimension is exported symbolically by default, so one artifact
serves any batch size.

No reference counterpart (the reference deploys by unpickling torch
modules inside its own codebase, trainer.py:1650-1691); this is the
TPU-native deployment story.

  python -m polardepth_tpu export --checkpoint_dir <dir> --out model.shlo
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import export as jexport

from polardepth_tpu.config import Config


def make_export(cfg: Config, state, batch: int | None = None,
                platforms=None, midas: bool = False):
    """Export the jitted infer step.  batch=None -> symbolic batch dim.

    cfg.train_dpt exports the DPT/MiDaS graph instead of the flagship
    (midas=True picks MidasNet over DPTDepthModel).

    Returns a jax.export.Exported; .serialize() gives portable bytes."""
    h, w = cfg.height, cfg.width
    if cfg.train_dpt:
        from polardepth_tpu.models.dpt import DPTDepthModel, MidasNet
        from polardepth_tpu.train.dpt_trainer import make_dpt_infer_step

        model = (MidasNet() if midas
                 else DPTDepthModel(backbone=cfg.dpt_backbone))
        infer = make_dpt_infer_step(model, cfg)
        needs_pol = False
        in_ch = 3
    else:
        from polardepth_tpu.train.trainer import build_model, make_infer_step

        model = build_model(cfg)
        infer = make_infer_step(model, cfg)
        needs_pol = cfg.augment_xolp or cfg.augment_normals
        in_ch = 12 if cfg.enable_12channels else 3

    # close over the weights: the artifact is self-contained
    frozen = {"params": state.params, "batch_stats": state.batch_stats}

    def fn(color, pol):
        class _S:  # the infer step only touches .params/.batch_stats
            params = frozen["params"]
            batch_stats = frozen["batch_stats"]
        b = {"color": color}
        if pol is not None:
            b["pol"] = pol
        return infer(_S, b)

    if batch is None:
        (bdim,) = jexport.symbolic_shape("b")
    else:
        bdim = batch
    color_spec = jax.ShapeDtypeStruct((bdim, h, w, in_ch), jnp.uint8)
    pol_spec = (jax.ShapeDtypeStruct((bdim, h, w, 4), jnp.uint8)
                if needs_pol else None)
    return jexport.export(jax.jit(fn), platforms=platforms)(
        color_spec, pol_spec)


def save_artifact(exp, path: str, cfg: Config) -> None:
    """Write <path> (serialized StableHLO) + <path>.json metadata."""
    with open(path, "wb") as f:
        f.write(exp.serialize())
    meta = {
        "height": cfg.height, "width": cfg.width,
        "inputs": [str(s) for s in exp.in_avals],
        "output": [str(s) for s in exp.out_avals],
        "platforms": list(exp.platforms),
        "min_depth": cfg.min_depth, "max_depth": cfg.max_depth,
        "augment_xolp": cfg.augment_xolp,
        "augment_normals": cfg.augment_normals,
    }
    with open(path + ".json", "w") as f:
        json.dump(meta, f, indent=1)


def load_artifact(path: str):
    """Deserialize an artifact; returns an object whose .call(color, pol)
    runs the model under jit on the current backend."""
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
