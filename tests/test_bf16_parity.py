"""bf16-vs-f32 inference metric delta (CI guard for the TPU fast path).

The production fast configuration runs the conv trunks in bfloat16 while
physics, BN statistics and disparity heads stay float32 (models/network.py,
PERF.md).  This test evaluates the SAME parameters under both compute
dtypes on a synthetic batch and asserts the depth-metric deltas stay small
— the standing check that the bf16 path cannot silently drift.  The full
trained-model delta table is produced by scripts/run_ablations.py
(ACCURACY_r02.md)."""

import numpy as np
import jax
import jax.numpy as jnp

from polardepth_tpu.config import Config
from polardepth_tpu.data.synthetic import SyntheticHammer
from polardepth_tpu.eval.evaluation import (
    accumulator_result, empty_accumulator)
from polardepth_tpu.train.state import create_train_state
from polardepth_tpu.train.trainer import (
    build_model, make_eval_step, make_train_step)

H, W = 64, 96


def _eval_table(cfg, state, batch):
    model = build_model(cfg)
    step = jax.jit(make_eval_step(model, cfg))
    acc = step(state, batch, empty_accumulator())
    return accumulator_result(jax.device_get(acc))


def test_bf16_metric_delta_small():
    cfg = Config(height=H, width=W, batch_size=2, dropout_rate=0.0)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    example = {"color": jnp.zeros((1, H, W, 3), jnp.float32),
               "pol": jnp.zeros((1, H, W, 4), jnp.float32)}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    # a few real optimization steps so the network is not at init
    gen = SyntheticHammer(H, W, seed=11)
    step = jax.jit(make_train_step(model, cfg))
    for i in range(5):
        state, _ = step(state, gen.batch(2, start=2 * i), rng)

    batch = gen.batch(4, start=100)
    f32 = _eval_table(cfg, state, batch)
    for cfg16 in (cfg.replace(compute_dtype="bfloat16"),
                  cfg.replace(compute_dtype="bfloat16", fast_decoder=True)):
        b16 = _eval_table(cfg16, state, batch)
        for sl in ("all", "objects"):
            if f32[sl]["frames"] == 0:
                continue
            assert abs(f32[sl]["abs_rel"] - b16[sl]["abs_rel"]) < 0.01, \
                (sl, f32[sl], b16[sl])
            assert abs(f32[sl]["a1"] - b16[sl]["a1"]) < 0.02
            assert abs(f32[sl]["rmse"] - b16[sl]["rmse"]) < 0.01
