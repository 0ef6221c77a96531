#!/usr/bin/env python
"""Profile the teacher-student (cost-volume) train step at the published
geometry (320x480, batch 12) and break the 5.7 fps round-2 number into
dispatch vs device compute vs component costs.

Measurements:
  1. per-step dispatch+readback timing (round-2 methodology, upper bound)
  2. pipelined async dispatch: N steps queued, one readback (amortizes RPC)
  3. jax.profiler device trace -> top-op table (where the device time goes)
  4. component timings: teacher-only step, cost-volume forward alone,
     student encoder+decoder forward alone
  5. knob sweep: bin_chunk in {16, 32, 96}, compute_dtype f32/bf16

Writes profile_student.json and prints a markdown summary for PERF.md.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W, B = 320, 480, 12


def make_batch(cfg, rng):
    nf = len(cfg.frame_ids)
    n_lookup = len(cfg.matching_ids) - 1
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1] = 0.58 * W, 1.92 * H
    K[0, 2], K[1, 2] = 0.5 * W, 0.5 * H
    batch = {
        "color_frames": rng.integers(0, 255, (B, nf, H, W, 3), np.uint8),
        "pol": rng.integers(0, 255, (B, H, W, 4), np.uint8),
        "rel_poses": np.tile(np.eye(4, dtype=np.float32),
                             (B, n_lookup + 1, 1, 1)),
        "K": np.tile(K, (B, 1, 1)),
        "inv_K": np.tile(np.linalg.inv(K).astype(np.float32), (B, 1, 1)),
        "depth": rng.uniform(0.2, 1.9, (B, H, W, 1)).astype(np.float32),
    }
    return batch


def build(cfg, bin_chunk=None, remat=True):
    import jax
    import jax.numpy as jnp
    from polardepth_tpu.train.student import (
        StudentModel, make_student_train_step)
    from polardepth_tpu.train.state import create_train_state

    model = StudentModel.from_config(
        cfg, remat=remat,
        **({"bin_chunk": bin_chunk} if bin_chunk is not None else {}))
    rng = jax.random.PRNGKey(0)
    nf = len(cfg.frame_ids)
    n_lookup = len(cfg.matching_ids) - 1
    example = {
        "color_frames": jnp.zeros((1, nf, H, W, 3), jnp.float32),
        "pol": jnp.zeros((1, H, W, 4), jnp.float32),
        "lookup_frames": jnp.zeros((1, n_lookup, H, W, 3), jnp.float32),
        "rel_poses": jnp.zeros((1, n_lookup, 4, 4), jnp.float32),
        "K_quarter": jnp.eye(4)[None].astype(jnp.float32),
        "inv_K_quarter": jnp.eye(4)[None].astype(jnp.float32),
        "min_depth_bin": cfg.min_depth, "max_depth_bin": cfg.max_depth,
    }
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    step = jax.jit(make_student_train_step(model, cfg), donate_argnums=(0,))
    return model, state, step, rng


def time_steps(step, state, trackers, dbatch, rng, iters, pipelined):
    """Returns (sec/step, final_state, trackers)."""
    import jax
    # warm
    state, trackers, logs = step(state, trackers, dbatch, rng)
    float(logs["loss"])
    times = []
    if pipelined:
        t0 = time.perf_counter()
        for _ in range(iters):
            state, trackers, logs = step(state, trackers, dbatch, rng)
        float(logs["loss"])  # one readback at the end
        times = [(time.perf_counter() - t0) / iters]
    else:
        for _ in range(iters):
            t0 = time.perf_counter()
            state, trackers, logs = step(state, trackers, dbatch, rng)
            float(logs["loss"])
            times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2], state, trackers


def _op_category(name: str) -> str:
    """Bucket an XLA op name into a coarse category for the breakdown."""
    base = name.split("(")[0].split(".")[0].rstrip("0123456789_")
    if base in ("convolution", "conv", "custom-call"):
        return "convolution"
    if base.startswith("while"):
        return "while(plane-sweep)"
    if "gather" in name or "dynamic-slice" in name:
        return "gather/dyn-slice"
    if "scatter" in name or "dynamic-update" in name:
        return "scatter/dyn-update"
    if base in ("copy", "copy-start", "copy-done", "reshape", "transpose",
                "broadcast", "bitcast"):
        return "layout/copy"
    if base in ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute"):
        return "collective"
    if "fusion" in base or base in ("add", "multiply", "select", "reduce",
                                    "rsqrt", "exponential", "subtract",
                                    "divide", "compare", "maximum",
                                    "minimum", "concatenate", "pad", "slice",
                                    "convert", "log", "tanh", "power"):
        return "fusion/elementwise"
    return "other"


def trace_and_top_ops(step, state, trackers, dbatch, rng, trace_dir,
                      nsteps=3):
    """jax.profiler trace -> lane-aware per-step accounting.

    Perfetto TPU traces expose, per TensorCore pid, separate threads:
    'XLA Modules' (one event per executed module, spans idle gaps),
    'Steps' (one event per step marker) and 'XLA Ops' (the real per-op
    timeline).  Only the Ops lane is summed for the breakdown; the module
    lane gives device wall per step.
    """
    import jax
    state, trackers, logs = step(state, trackers, dbatch, rng)
    float(logs["loss"])
    with jax.profiler.trace(trace_dir):
        for _ in range(nsteps):
            state, trackers, logs = step(state, trackers, dbatch, rng)
        float(logs["loss"])
    candidates = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not candidates:
        return None, []
    with gzip.open(sorted(candidates)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    tid_names = {(e.get("pid"), e.get("tid")):
                 str(e.get("args", {}).get("name", ""))
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"}
    device_pids = {p for p, n in pid_names.items()
                   if any(s in str(n) for s in ("TPU", "Device", "/device:"))}
    per_op: dict = {}
    per_cat: dict = {}
    per_lane: dict = {}
    op_counts: dict = {}
    module_total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        lane = tid_names.get((e.get("pid"), e.get("tid")), "?")
        dur = e["dur"] / 1e6  # us -> s
        per_lane[lane] = per_lane.get(lane, 0.0) + dur
        if "Module" in lane:
            module_total += dur
            continue
        if "Step" in lane or "Ops" not in lane:
            continue
        name = e.get("name", "?")
        per_op[name] = per_op.get(name, 0.0) + dur
        op_counts[name] = op_counts.get(name, 0) + 1
        cat = _op_category(name)
        per_cat[cat] = per_cat.get(cat, 0.0) + dur
    ops_total = sum(per_op.values())
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:25]
    summary = {
        "module_wall_s": round(module_total / nsteps, 4),
        "ops_busy_s": round(ops_total / nsteps, 4),
        "lanes": {k: round(v / nsteps, 4) for k, v in sorted(
            per_lane.items(), key=lambda kv: -kv[1])[:8]},
        "categories": {k: round(v / nsteps, 4) for k, v in sorted(
            per_cat.items(), key=lambda kv: -kv[1])},
        "top_ops": [(n, round(d / nsteps, 5),
                     op_counts[n] // nsteps) for n, d in top],
    }
    return summary, [(n, round(d / nsteps, 5)) for n, d in top]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="profile_student.json")
    p.add_argument("--trace_dir", default="/tmp/student_trace")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--skip_sweep", action="store_true")
    p.add_argument("--skip_trace", action="store_true")
    p.add_argument("--warp_impl", default="patch",
                   help="flat4 | patch | strip | band[<K>][_bf16] | "
                        "pallas[<K>][_fast]")
    p.add_argument("--cv_warp_impl", default="xla",
                   help="plane-sweep sampler: xla | pallas[<K>][_fast]")
    p.add_argument("--compute_dtype", default="float32")
    p.add_argument("--fast_decoder", action="store_true")
    p.add_argument("--phase_packed_decoder", action="store_true")
    p.add_argument("--photometric_packed", action="store_true")
    p.add_argument("--no_remat", action="store_true")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    from polardepth_tpu.config import Config

    results = {"device": str(jax.devices()[0])}
    rngs = np.random.default_rng(0)
    cfg = Config(height=H, width=W, batch_size=B,
                 depth_supervision_only=False, depth_supervision=True,
                 train_student=True, mesh_shape=(1,),
                 warp_impl=a.warp_impl, cv_warp_impl=a.cv_warp_impl,
                 compute_dtype=a.compute_dtype, fast_decoder=a.fast_decoder,
                 phase_packed_decoder=a.phase_packed_decoder,
                 photometric_packed=a.photometric_packed)
    batch = make_batch(cfg, rngs)

    def run_cfg(tag, cfg, pipelined_too=True, trace=False):
        model, state, step, rng = build(cfg, remat=not a.no_remat)
        trackers = (jnp.float32(cfg.min_depth), jnp.float32(cfg.max_depth))
        dbatch = jax.device_put(batch)
        t_seq, state, trackers = time_steps(
            step, state, trackers, dbatch, rng, a.iters, False)
        results[f"{tag}/per_step_readback_s"] = round(t_seq, 4)
        results[f"{tag}/fps_readback"] = round(B / t_seq, 2)
        print(f"[{tag}] per-step+readback: {t_seq:.3f} s  "
              f"({B / t_seq:.1f} fps)")
        if pipelined_too:
            t_pipe, state, trackers = time_steps(
                step, state, trackers, dbatch, rng, a.iters, True)
            results[f"{tag}/pipelined_s"] = round(t_pipe, 4)
            results[f"{tag}/fps_pipelined"] = round(B / t_pipe, 2)
            print(f"[{tag}] pipelined async: {t_pipe:.3f} s "
                  f"({B / t_pipe:.1f} fps)")
        if trace:
            summary, top = trace_and_top_ops(step, state, trackers, dbatch,
                                             rng, a.trace_dir)
            results[f"{tag}/trace"] = summary
            if summary:
                print(f"[{tag}] module wall/step: {summary['module_wall_s']} "
                      f"s; ops busy/step: {summary['ops_busy_s']} s")
                for k, v in summary["categories"].items():
                    print(f"    {v:8.4f}s  {k}")
                for n, d, cnt in summary["top_ops"][:15]:
                    print(f"    {d:8.4f}s x{cnt:<4d} {n}")
        return state

    run_cfg("f32_chunk16", cfg, trace=not a.skip_trace)

    if not a.skip_sweep:
        bf16 = cfg.replace(compute_dtype="bfloat16")
        run_cfg("bf16_chunk16", bf16)
        for chunk in (32, 48, 96):
            try:
                _m, state, step, rng2 = build(bf16, bin_chunk=chunk)
                trackers = (jnp.float32(bf16.min_depth),
                            jnp.float32(bf16.max_depth))
                t, *_ = time_steps(step, state, trackers,
                                   jax.device_put(batch), rng2, a.iters,
                                   False)
                results[f"bf16_chunk{chunk}/per_step_readback_s"] = round(t, 4)
                results[f"bf16_chunk{chunk}/fps_readback"] = round(B / t, 2)
                print(f"[bf16_chunk{chunk}] {t:.3f} s ({B / t:.1f} fps)")
            except Exception as exc:
                results[f"bf16_chunk{chunk}/error"] = str(exc)[:200]
                print(f"[bf16_chunk{chunk}] FAILED: {str(exc)[:120]}")

    with open(a.out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
