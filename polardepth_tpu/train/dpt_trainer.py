"""Supervised training step for the DPT / MiDaS backbones (--train_dpt).

The reference routes DPT through the same Trainer with flag branches
(trainer.py:147-171, 499-501, 1144-1146): the network emits depth directly
(single scale); the loss uses the supervised terms on that depth plus
edge-aware smoothness on disp = 1/clamp(depth) (nan_to_num'ed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from polardepth_tpu.config import Config
from polardepth_tpu.ops.losses import (
    masked_l1_depth_loss, supervised_normals_loss, smooth_loss,
)
from polardepth_tpu.train.losses import preprocess_batch


def dpt_supervised_losses(cfg: Config, depth: jnp.ndarray, batch: dict):
    depth_sup = batch["depth"]
    valid = ((depth_sup >= cfg.min_depth) &
             (depth_sup <= cfg.max_depth)).astype(depth.dtype)
    l_dep = masked_l1_depth_loss(depth_sup, depth, valid)
    l_nrm = supervised_normals_loss(depth_sup, depth, batch["K"], valid)
    disp = 1.0 / (jnp.clip(depth, cfg.min_depth, cfg.max_depth) + 1e-7)
    disp = jnp.nan_to_num(disp)
    mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
    l_sm = smooth_loss(disp / (mean_disp + 1e-7), batch["color"])
    loss = (l_dep + cfg.normals_loss_weight * l_nrm
            + cfg.disparity_smoothness * l_sm)
    logs = {"supervised_depth_loss/0": l_dep, "normals_loss/0": l_nrm,
            "smooth_loss/0": l_sm, "loss": loss}
    return loss, logs


def make_dpt_train_step(model, cfg: Config):
    """Works for both DPT (stateless) and MidasNet (BatchNorm stats)."""

    def step(state, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        pb = preprocess_batch(batch, cfg)
        has_bn = bool(state.batch_stats)

        def loss_fn(params):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = state.batch_stats
                depth, mut = model.apply(variables, pb["color"], train=True,
                                         mutable=["batch_stats"])
            else:
                depth = model.apply(variables, pb["color"], train=True)
                mut = {"batch_stats": state.batch_stats}
            loss, logs = dpt_supervised_losses(cfg, depth, pb)
            return loss, (logs, mut)

        grads, (logs, mut) = jax.grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads,
                                     batch_stats=mut["batch_stats"]), logs

    return step


def make_dpt_infer_step(model, cfg: Config):
    def step(state, batch: dict):
        pb = preprocess_batch(batch, cfg)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        depth = model.apply(variables, pb["color"], train=False)
        return jnp.clip(depth, cfg.min_depth, cfg.max_depth)

    return step
