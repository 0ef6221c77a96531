"""Trainer: jit-compiled, mesh-sharded supervised training loop.

Replaces the reference's god-object Trainer (manydepth/trainer.py:73-1691)
with a thin orchestrator around three pure jitted functions:

  train_step(state, batch, rng) -> (state, logs)     [donated state]
  eval_step(state, batch)       -> per-material metric pytree
  infer_step(state, batch)      -> full-res depth

Parallelism: batches are device_put with the batch axis split over
Mesh('data'); the state is replicated.  XLA partitions the step and inserts
the gradient all-reduce over ICI — no hand-written communication (the
reference is single-device only, SURVEY §2.8).  BatchNorm reduces over the
global batch, reproducing single-device reference semantics exactly at any
device count.
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from polardepth_tpu.config import Config
from polardepth_tpu.data.augment import color_jitter
from polardepth_tpu.eval.evaluation import (
    eval_step_metrics, accumulate_on_device, accumulator_result,
    empty_accumulator, format_table,
)
from polardepth_tpu.models.network import PolarDepthNet
from polardepth_tpu.ops.depth import disp_to_depth
from polardepth_tpu.parallel.mesh import (
    create_mesh, batch_sharding, image_sharding, replicated_sharding,
    global_batch,
)
from polardepth_tpu.train.losses import (
    preprocess_batch, supervised_losses, twelve_channel_input, jitter_12ch,
)
from polardepth_tpu.train.state import (
    TrainState, create_train_state, step_lr_schedule,
)

TRAIN_BATCH_KEYS = ("color", "pol", "depth", "K")
EVAL_BATCH_KEYS = ("color", "pol", "depth_gt", "mask")


def build_model(cfg: Config) -> PolarDepthNet:
    return PolarDepthNet(
        augment_xolp=cfg.augment_xolp,
        augment_normals=cfg.augment_normals,
        dropout_rate=cfg.dropout_rate,
        scales=tuple(cfg.scales),
        refraction_index=cfg.refraction_index,
        compute_dtype=cfg.compute_dtype,
        use_pallas=cfg.use_pallas,
        use_attention=cfg.use_attention,
        attention_pe_in_stream=cfg.attention_pe_in_stream,
        attention_gate=cfg.attention_gate,
        decoder_pad_mode="zero" if cfg.fast_decoder else "reflect",
        phase_packed_decoder=cfg.phase_packed_decoder,
        # fused encoders exist only when both modality encoders do; a
        # True default must not break rgb-only / single-modality configs
        fused_encoders=(cfg.fused_encoders and cfg.augment_xolp
                        and cfg.augment_normals),
        fused_plan=getattr(cfg, "fused_plan", "grouped"),
    )


def _encoder_input(cfg: Config, pb: dict, k_aug=None):
    """The depth-encoder input: the jittered RGB frame, or in 12-channel
    mode the stacked polarization captures (reference
    indoor_dataset.py:220-256).  k_aug=None -> no jitter (eval)."""
    if cfg.enable_12channels:
        x = twelve_channel_input(pb["pol"])
        return jitter_12ch(k_aug, x) if k_aug is not None else x
    return color_jitter(k_aug, pb["color"]) if k_aug is not None \
        else pb["color"]


def make_train_step(model: PolarDepthNet, cfg: Config):
    needs_pol = cfg.augment_xolp or cfg.augment_normals

    def step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        k_aug, k_flip, k_drop = jax.random.split(rng, 3)
        pb = preprocess_batch(batch, cfg)
        if cfg.random_flip:
            # 50% per-sample horizontal flip of all image-likes together
            # (color/pol/depth; K deliberately untouched, matching the
            # reference's MonoDataset flip, mono_dataset.py:152-160).
            from polardepth_tpu.data.augment import random_horizontal_flip
            pb = random_horizontal_flip(k_flip, pb)
        color_aug = _encoder_input(cfg, pb, k_aug)

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            outputs, mut = model.apply(
                variables, color_aug,
                pol=pb["pol"] if needs_pol else None,
                train=True, rngs={"dropout": k_drop},
                mutable=["batch_stats"])
            loss, logs = supervised_losses(cfg, outputs, pb)
            return loss, (logs, mut)

        grads, (logs, mut) = jax.grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(
            grads=grads, batch_stats=mut["batch_stats"])
        return new_state, logs

    return step


def make_multi_train_step(model: PolarDepthNet, cfg: Config):
    """N optimizer steps inside one jit call via lax.scan over a stacked
    batch (N, B, ...).  Numerically identical to N sequential calls (the
    PRNG folds on state.step, which advances inside the scan), but pays the
    host->device dispatch cost once — a large win under high-latency
    dispatch (remote TPU tunnels) and a modest one everywhere.
    """
    step = make_train_step(model, cfg)

    def multi(state: TrainState, batches: dict, rng: jax.Array):
        def body(s, batch):
            s, logs = step(s, batch, rng)
            return s, logs
        state, logs_seq = jax.lax.scan(body, state, batches)
        last_logs = jax.tree_util.tree_map(lambda x: x[-1], logs_seq)
        return state, last_logs

    return multi


def _flip_average_disp(disp: jnp.ndarray, disp_flipped: jnp.ndarray):
    """Monodepth2 batch_post_process_disparity: blend the straight scaled
    disparity with the un-mirrored prediction on the mirrored input, using
    5%-border ramp masks (each side trusts the prediction whose padding
    artifacts are on the far edge).  disp/disp_flipped: (B, H, W, 1);
    disp_flipped is already flipped BACK to input orientation."""
    w = disp.shape[2]
    xs = jnp.linspace(0.0, 1.0, w, dtype=disp.dtype)[None, None, :, None]
    l_mask = 1.0 - jnp.clip(20.0 * (xs - 0.05), 0.0, 1.0)
    r_mask = l_mask[:, :, ::-1]
    mean = 0.5 * (disp + disp_flipped)
    return (r_mask * disp + l_mask * disp_flipped
            + (1.0 - l_mask - r_mask) * mean)


def _forward_depth(model: PolarDepthNet, cfg: Config, state: TrainState,
                   pb: dict) -> jnp.ndarray:
    """Shared eval/infer forward: full-scale disparity -> clipped depth,
    optionally flip-averaged (cfg.post_process; reference options.py
    --post_process, Monodepth2 evaluate_depth semantics: blend the SCALED
    disparities, then invert)."""
    needs_pol = cfg.augment_xolp or cfg.augment_normals
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    def disp_of(pb_):
        outputs = model.apply(
            variables, _encoder_input(cfg, pb_),
            pol=pb_["pol"] if needs_pol else None, train=False)
        scaled, _ = disp_to_depth(outputs[("disp", 0)], cfg.min_depth,
                                  cfg.max_depth)
        return scaled

    scaled = disp_of(pb)
    if cfg.post_process:
        # mirror every image-like input on W; pol captures flip naively,
        # like the reference flips its stacked input channels (AoLP's sign
        # change under mirroring is a physics nicety the reference's
        # post_process never modeled either)
        pb_f = dict(pb)
        pb_f["color"] = pb["color"][:, :, ::-1]
        if needs_pol:
            pb_f["pol"] = pb["pol"][:, :, ::-1]
        scaled = _flip_average_disp(scaled, disp_of(pb_f)[:, :, ::-1])
    return jnp.clip(1.0 / scaled, cfg.min_depth, cfg.max_depth)


def make_eval_step(model: PolarDepthNet, cfg: Config):
    def step(state: TrainState, batch: dict, acc: dict):
        pb = preprocess_batch(batch, cfg)
        pred = _forward_depth(model, cfg, state, pb)
        metrics = eval_step_metrics(pb["depth_gt"], pred, pb["mask"],
                                    cfg.min_depth, cfg.max_depth)
        return accumulate_on_device(acc, metrics)

    return step


def make_multi_eval_step(model: PolarDepthNet, cfg: Config):
    """N eval batches in one jit call via lax.scan over stacked (N, B, ...)
    arrays — identical accumulation to N sequential eval steps, one
    dispatch (the eval analog of make_multi_train_step)."""
    step = make_eval_step(model, cfg)

    def multi(state: TrainState, batches: dict, acc: dict):
        def body(a, batch):
            return step(state, batch, a), None
        acc, _ = jax.lax.scan(body, acc, batches)
        return acc

    return multi


def make_infer_step(model: PolarDepthNet, cfg: Config):
    def step(state: TrainState, batch: dict):
        pb = preprocess_batch(batch, cfg)
        return _forward_depth(model, cfg, state, pb)

    return step


class Trainer:
    def __init__(self, cfg: Config, steps_per_epoch: int,
                 mesh=None, log_fn=print):
        cfg.validate()
        self.cfg = cfg
        self.log = log_fn
        self.mesh = mesh if mesh is not None else create_mesh(cfg.mesh_shape)
        self.model = build_model(cfg)
        self.rng = jax.random.PRNGKey(cfg.seed)
        self.steps_per_epoch = steps_per_epoch

        schedule = step_lr_schedule(
            cfg.learning_rate, steps_per_epoch, cfg.scheduler_step_size,
            cfg.scheduler_gamma, cfg.num_epochs)
        init_rng, self.rng = jax.random.split(self.rng)
        h, w = cfg.height, cfg.width
        in_ch = 12 if cfg.enable_12channels else 3
        example = {
            "color": jnp.zeros((1, h, w, in_ch), jnp.float32),
            "pol": (jnp.zeros((1, h, w, 4), jnp.float32)
                    if (cfg.augment_xolp or cfg.augment_normals) else None),
        }
        self.state = create_train_state(
            self.model, {"params": init_rng, "dropout": init_rng},
            example, schedule)
        if cfg.weights_init == "pretrained":
            from polardepth_tpu.train.pretrained import maybe_apply_pretrained
            self.state = maybe_apply_pretrained(self.state, cfg, self.log)
        # Replicate state over the mesh; batches are split on 'data'.
        repl = replicated_sharding(self.mesh)
        self.state = jax.device_put(self.state, repl)
        self.batch_sharding = batch_sharding(self.mesh)
        self.image_sharding = image_sharding(self.mesh)

        donate = (0,) if cfg.donate_state else ()
        self._train_step = jax.jit(make_train_step(self.model, cfg),
                                   donate_argnums=donate)
        self._multi_train_step = jax.jit(
            make_multi_train_step(self.model, cfg), donate_argnums=donate)
        self._eval_step = jax.jit(make_eval_step(self.model, cfg),
                                  donate_argnums=(2,))
        self._multi_eval_step = jax.jit(make_multi_eval_step(self.model, cfg),
                                        donate_argnums=(2,))
        self._infer_step = jax.jit(make_infer_step(self.model, cfg))
        self.epoch = 0

    # -- data placement -------------------------------------------------------

    def _shard(self, batch: dict, keys) -> dict:
        """Place a (process-local) batch with the batch dim split over the
        mesh — and, on a ('data', 'spatial') mesh, image H split over
        'spatial' (GSPMD inserts the conv halo exchanges); assembles the
        global array from per-process shards on multi-host meshes
        (parallel/mesh.py:global_batch)."""
        out = {}
        for k in keys:
            if k in batch:
                sh = (self.image_sharding if batch[k].ndim >= 4
                      else self.batch_sharding)
                out[k] = global_batch(batch[k], sh)
        return out

    # -- public API -----------------------------------------------------------

    def train_epoch(self, batches: Iterable[dict],
                    steps_per_call: int = 1, periodic_cb=None,
                    flush_cb=None) -> dict:
        """One pass over `batches`; returns the last step's logs.

        steps_per_call > 1 groups that many batches into a single jitted
        lax.scan call (same numerics, one dispatch) — use 8-32 when dispatch
        latency is significant relative to step compute.

        periodic_cb(global_step, logs): invoked on the reference's logging
        cadence — every log_frequency batches while step < 2000, then every
        2000 steps (trainer.py:447-461).

        flush_cb(global_step): invoked after every dispatched step group —
        the hook for mid-epoch checkpointing.
        """
        logs = {}
        t0 = time.time()
        n = 0
        pending: list[dict] = []

        def flush():
            nonlocal logs, n
            if not pending:
                return
            if len(pending) == 1 and steps_per_call == 1:
                db = self._shard(pending[0], TRAIN_BATCH_KEYS)
                self.state, logs = self._train_step(self.state, db, self.rng)
            else:
                stacked = {
                    k: np.stack([b[k] for b in pending])
                    for k in TRAIN_BATCH_KEYS if k in pending[0]}
                db = self._shard_stacked(stacked)
                self.state, logs = self._multi_train_step(self.state, db,
                                                          self.rng)
            n += len(pending)
            pending.clear()
            if periodic_cb is not None:
                step = int(self.state.step)
                early = (n % max(self.cfg.log_frequency, 1) == 0
                         and step < 2000)
                late = step % 2000 == 0
                if early or late:
                    periodic_cb(step, logs)
            if flush_cb is not None:
                flush_cb(int(self.state.step))

        for batch in batches:
            pending.append(batch)
            if len(pending) >= steps_per_call:
                flush()
        flush()
        if n:
            logs = {k: float(v) for k, v in logs.items()}
            dt = time.time() - t0
            logs["examples_per_sec"] = n * self.cfg.batch_size / max(dt, 1e-9)
        self.epoch += 1
        return logs

    def _shard_stacked(self, stacked: dict) -> dict:
        """Place (N, B, ...) stacked batches with B split over the mesh
        (and H over 'spatial' where the mesh has that axis)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P(None, "data"))
        ish = image_sharding(self.mesh, stacked=True)
        return {k: global_batch(v, ish if v.ndim >= 5 else sh)
                for k, v in stacked.items()}

    def evaluate(self, batches: Iterable[dict],
                 batches_per_call: int = 1) -> dict:
        """Full per-material metric table (reference Trainer.test /
        Evaluation.test).  Metric sums accumulate on device across the whole
        epoch; the host fetches one small pytree at the end.

        batches_per_call > 1 folds that many eval batches into one jitted
        lax.scan dispatch (identical accumulation, test-asserted; leftovers
        run through the single-batch step so no frame is dropped).  The
        default stays 1: measured on the axon tunnel, per-batch async
        dispatch already overlaps H2D transfer with compute and beats x8
        grouping (9.8 s vs 15.5 s per 16x12 eval batches at 320x480),
        because grouping serializes an 8-batch host stack + transfer before
        any compute.  Worth >1 only on links where *dispatch latency*
        (not bandwidth) dominates per-batch compute."""
        acc = empty_accumulator()
        pending: list[dict] = []

        def flush_single(batch):
            nonlocal acc
            db = self._shard(batch, EVAL_BATCH_KEYS)
            acc = self._eval_step(self.state, db, acc)

        def flush_group():
            nonlocal acc
            stacked = {k: np.stack([b[k] for b in pending])
                       for k in EVAL_BATCH_KEYS if k in pending[0]}
            db = self._shard_stacked(stacked)
            acc = self._multi_eval_step(self.state, db, acc)
            pending.clear()

        for batch in batches:
            if batches_per_call <= 1:
                flush_single(batch)
                continue
            pending.append(batch)
            if len(pending) == batches_per_call:
                flush_group()
        for batch in pending:
            flush_single(batch)
        results = accumulator_result(jax.device_get(acc))
        self.log(format_table(results))
        return results

    def predict(self, batch: dict) -> np.ndarray:
        db = self._shard(batch, EVAL_BATCH_KEYS)
        return np.asarray(self._infer_step(self.state, db))

    def fit(self, train_batches_fn, eval_batches_fn=None,
            num_epochs: Optional[int] = None,
            checkpoint_dir: Optional[str] = None,
            steps_per_call: int = 1, writer=None,
            save_every_steps: Optional[int] = None) -> dict:
        """Run the reference's train() protocol: evaluate before epoch 0,
        then per-epoch train + periodic eval/save (trainer.py:379-402).

        Auto-resume: if checkpoint_dir already holds step checkpoints, the
        latest is restored before training — step-granular preemption
        recovery the reference lacks (SURVEY §5: its granularity is the
        epoch and there is no auto-resume at all).

        Exact data resume: pass a checkpointable BatchIterator as
        `train_batches_fn` (the bare object, not a lambda).  Its shuffle
        order + cursor are persisted with every checkpoint and re-armed on
        resume, so a killed run continues with the identical batch sequence.
        `save_every_steps` additionally checkpoints mid-epoch on that step
        cadence.
        """
        from polardepth_tpu.train import checkpoint as ckpt
        num_epochs = num_epochs or self.cfg.num_epochs
        data_iter = None
        if not callable(train_batches_fn):
            data_iter = train_batches_fn
            train_batches_fn = lambda: iter(data_iter)  # noqa: E731

        def ckpt_extra():
            return {"data": data_iter.state()} if data_iter is not None \
                else None

        if checkpoint_dir:
            latest = ckpt.latest_step_dir(checkpoint_dir)
            if latest:
                if data_iter is not None:
                    self.state, extra = ckpt.restore(latest, self.state,
                                                     extra=ckpt_extra())
                    data_iter.set_state(extra["data"])
                else:
                    self.state = ckpt.restore(latest, self.state)
                self.log(f"resumed from {latest} (step {int(self.state.step)})")
        results = {}
        if eval_batches_fn is not None:
            results["initial"] = self.evaluate(eval_batches_fn())

        periodic_cb = None
        if writer is not None and eval_batches_fn is not None:
            def periodic_cb(step, logs):
                """log_frequency cadence: train scalars + single-batch val
                (reference trainer.py:447-461)."""
                writer.scalars("train", step,
                               {k: float(v) for k, v in logs.items()})
                batch = next(iter(eval_batches_fn()))
                db = self._shard(batch, EVAL_BATCH_KEYS)
                acc = self._eval_step(self.state, db, empty_accumulator())
                table = accumulator_result(jax.device_get(acc))
                row = table.get("all", {})
                writer.scalars("val", step, {k: float(v) for k, v in
                                             row.items() if k != "frames"})

        flush_cb = None
        if checkpoint_dir and save_every_steps:
            # step advances in steps_per_call increments, so a simple
            # `step % save_every_steps == 0` never fires when the cadence is
            # not a multiple of the call grouping; track the last-saved step
            # instead.
            last_saved = [int(self.state.step)]

            def flush_cb(step):
                if step - last_saved[0] >= save_every_steps:
                    ckpt.save(checkpoint_dir, self.state, self.cfg,
                              extra=ckpt_extra())
                    last_saved[0] = step

        start_epoch = (int(self.state.step) // max(self.steps_per_epoch, 1))
        for e in range(start_epoch, num_epochs):
            logs = self.train_epoch(train_batches_fn(), steps_per_call,
                                    periodic_cb, flush_cb)
            self.log(f"epoch {e}: loss={logs.get('loss', float('nan')):.5f} "
                     f"({logs.get('examples_per_sec', 0):.1f} ex/s)")
            if writer is not None:
                writer.scalars("train", int(self.state.step), logs)
            if (e + 1) % self.cfg.save_frequency == 0:
                if eval_batches_fn is not None:
                    results[f"epoch_{e}"] = self.evaluate(eval_batches_fn())
                    self._log_images(eval_batches_fn, writer)
                if checkpoint_dir:
                    ckpt.save(checkpoint_dir, self.state, self.cfg,
                              extra=ckpt_extra())
        return results

    def _log_images(self, eval_batches_fn, writer) -> None:
        """Colormapped disparity/error renderings for the first eval frame
        (the reference's TB image logging, trainer.py:1449-1585)."""
        if writer is None:
            return
        try:
            from polardepth_tpu.eval.analysis import (
                render_error_heatmap, render_disparity)
            batch = next(iter(eval_batches_fn()))
            depth = self.predict(batch)
            step = int(self.state.step)
            writer.image("val", step, "depth_pred",
                         render_disparity(1.0 / depth[0]))
            if "depth_gt" in batch:
                writer.image("val", step, "error",
                             render_error_heatmap(
                                 depth[0], batch["depth_gt"][0],
                                 self.cfg.min_depth, self.cfg.max_depth))
            if "mask" in batch and "depth_gt" in batch:
                # per-material masked views, one TB mode per material class
                # (reference trainer.py:308-314, 1449-1585: 10 extra mode
                # writers with colormapped depth per instance-mask slice)
                from polardepth_tpu.eval.evaluation import (
                    MATERIAL_THRESHOLDS)
                mask0 = np.asarray(batch["mask"][0]).squeeze()
                for name, thr in MATERIAL_THRESHOLDS.items():
                    if thr is None:
                        continue
                    sel = (mask0 >= thr[0]) & (mask0 <= thr[1])
                    if not sel.any():
                        continue
                    disp = 1.0 / depth[0]
                    writer.image(f"test_{name}", step, "depth_pred",
                                 render_disparity(
                                     disp * sel[..., None]))
        except Exception as exc:  # logging must never kill training
            self.log(f"image logging skipped: {exc}")
