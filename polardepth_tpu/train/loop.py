"""First-class training loop for the alternative model graphs.

The reference runs every flag-selected graph (self-supervised, teacher-
student, DPT) through the same Trainer.train() protocol — eval before epoch
0, per-epoch train with periodic in-epoch val/log, per-epoch save
(trainer.py:379-467).  Round-1 gave that protocol only to the published
supervised path; this loop extends it to the other graphs: per-material
evaluation through an infer step, Orbax checkpointing with auto-resume
(including auxiliary pytrees like the student's adaptive depth-bin
trackers), and log_frequency-periodic validation.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax

from polardepth_tpu.config import Config
from polardepth_tpu.eval.evaluation import (
    eval_step_metrics, accumulate_on_device, accumulator_result,
    empty_accumulator, format_table,
)
from polardepth_tpu.train import checkpoint as ckpt


class AltTrainer:
    """Train/eval/checkpoint protocol around jitted (step, infer) functions.

    step_fn(state, [trackers,] batch, rng) -> (state, [trackers,] logs)
    infer_fn(state, [trackers,] batch)     -> clipped depth (B, H, W, 1)

    trackers: optional auxiliary pytree threaded through every call and
    checkpointed with the state (student depth-bin EMA trackers).
    """

    def __init__(self, cfg: Config, state, step_fn: Callable,
                 infer_fn: Optional[Callable], rng: jax.Array,
                 trackers=None, has_trackers: bool = False,
                 log_fn=print):
        self.cfg = cfg
        self.state = state
        self.step_fn = step_fn
        self.infer_fn = infer_fn
        self.rng = rng
        self.trackers = trackers
        self.has_trackers = has_trackers
        self.log = log_fn
        self.step_select: Optional[Callable] = None  # epoch -> step_fn

        from polardepth_tpu.ops.resize import resize_bilinear, resize_nearest

        def metrics_acc(gt, mask, pred, acc):
            h, w = pred.shape[1:3]
            gt = gt.astype(jax.numpy.float32)
            if gt.shape[1:3] != (h, w):
                gt = resize_bilinear(gt, (h, w))
                mask = resize_nearest(mask, (h, w))
            m = eval_step_metrics(gt, pred, mask, cfg.min_depth,
                                  cfg.max_depth)
            return accumulate_on_device(acc, m)

        self._metrics_acc = jax.jit(metrics_acc, donate_argnums=(3,))

    def _step(self, batch):
        if self.has_trackers:
            self.state, self.trackers, logs = self._active_step(
                self.state, self.trackers, batch, self.rng)
        else:
            self.state, logs = self._active_step(self.state, batch, self.rng)
        return logs

    def _infer(self, batch):
        if self.has_trackers:
            return self.infer_fn(self.state, self.trackers, batch)
        return self.infer_fn(self.state, batch)

    def evaluate(self, batches) -> dict:
        """Per-material metric table via the infer step; metric sums stay on
        device across the epoch (one host fetch)."""
        acc = empty_accumulator()
        for batch in batches:
            pred = self._infer(batch)
            acc = self._metrics_acc(batch["depth_gt"], batch["mask"],
                                    pred, acc)
        results = accumulator_result(jax.device_get(acc))
        self.log(format_table(results))
        return results

    def fit(self, train_batches_fn, eval_batches_fn=None,
            num_epochs: Optional[int] = None,
            checkpoint_dir: Optional[str] = None, writer=None,
            steps_per_epoch: int = 1) -> dict:
        cfg = self.cfg
        num_epochs = num_epochs or cfg.num_epochs
        if checkpoint_dir:
            latest = ckpt.latest_step_dir(checkpoint_dir)
            if latest:
                if self.has_trackers:
                    self.state, self.trackers = ckpt.restore(
                        latest, self.state, extra=self.trackers)
                else:
                    self.state = ckpt.restore(latest, self.state)
                self.log(f"resumed from {latest} "
                         f"(step {int(self.state.step)})")

        results = {}
        if eval_batches_fn is not None and self.infer_fn is not None:
            results["initial"] = self.evaluate(eval_batches_fn())

        start_epoch = int(self.state.step) // max(steps_per_epoch, 1)
        global_step = int(self.state.step)
        for e in range(start_epoch, num_epochs):
            self._active_step = (self.step_select(e) if self.step_select
                                 else self.step_fn)
            t0 = time.time()
            n = 0
            logs = {}
            for batch in train_batches_fn():
                logs = self._step(batch)
                n += 1
                global_step += 1
                # periodic in-epoch val/log (reference trainer.py:447-461:
                # every log_frequency batches early, every 2000 steps late)
                early = (n % max(cfg.log_frequency, 1) == 0
                         and global_step < 2000)
                late = global_step % 2000 == 0
                if (early or late) and writer is not None:
                    host = {k: float(v) for k, v in logs.items()}
                    writer.scalars("train", global_step, host)
                    if eval_batches_fn is not None and self.infer_fn:
                        val_batch = next(iter(eval_batches_fn()))
                        val = self._val_single(val_batch)
                        writer.scalars("val", global_step, val)
            host_logs = {k: float(v) for k, v in logs.items()} if n else {}
            dt = time.time() - t0
            eps = n * cfg.batch_size / max(dt, 1e-9)
            self.log(f"epoch {e}: loss={host_logs.get('loss', float('nan')):.5f}"
                     f" ({eps:.1f} ex/s)")
            if writer is not None and host_logs:
                writer.scalars("train_epoch", global_step, host_logs)
            if (e + 1) % cfg.save_frequency == 0:
                if eval_batches_fn is not None and self.infer_fn is not None:
                    results[f"epoch_{e}"] = self.evaluate(eval_batches_fn())
                if checkpoint_dir:
                    ckpt.save(checkpoint_dir, self.state, cfg,
                              extra=(jax.device_get(self.trackers)
                                     if self.has_trackers else None))
        return results

    def _val_single(self, batch) -> dict:
        """Single-batch validation metrics (reference val(),
        trainer.py:752-780)."""
        pred = self._infer(batch)
        acc = self._metrics_acc(batch["depth_gt"], batch["mask"], pred,
                                empty_accumulator())
        table = accumulator_result(jax.device_get(acc))
        row = table.get("all", {})
        return {k: float(v) for k, v in row.items() if k != "frames"}
