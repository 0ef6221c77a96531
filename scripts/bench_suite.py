#!/usr/bin/env python
"""Round-2 performance suite: the PERF.md table on real hardware.

Measures, with bench.py's tunnel-immune methodology (N steps chained inside
one lax.scan with index-dependent inputs + scalar readback):

  * infer fps @8x512x512: f32, bf16, bf16+fast_decoder (zero-pad)
  * supervised train-step fps @8x512x512 and at the published geometry
    (12x320x480), f32 and bf16+fast
  * cost-volume student train-step fps @12x320x480
  * CPU baseline at the SAME batch/geometry as the headline (8x512x512),
    run in a JAX_PLATFORMS=cpu subprocess

Writes bench_suite.json; PERF.md is updated by hand from it.

  python scripts/bench_suite.py [--skip-cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def _setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def _median_time(fn, reps=5):
    fn()  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def measure_infer(batch=8, h=512, w=512, chain=16, reps=5, **cfg_kw):
    jax = _setup_jax()
    import jax.numpy as jnp
    from polardepth_tpu.config import Config
    from polardepth_tpu.train.trainer import build_model, make_infer_step
    from polardepth_tpu.train.state import create_train_state

    cfg = Config(height=h, width=w, batch_size=batch, dropout_rate=0.0,
                 **cfg_kw)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    example = {"color": jnp.zeros((1, h, w, 3), jnp.float32),
               "pol": jnp.zeros((1, h, w, 4), jnp.float32)}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    infer = make_infer_step(model, cfg)

    @jax.jit
    def chained(state, b):
        def body(carry, i):
            bi = {"color": b["color"] + i.astype(jnp.uint8),
                  "pol": b["pol"] + i.astype(jnp.uint8)}
            return carry + jnp.sum(infer(state, bi)), None
        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(chain))
        return total

    r = np.random.default_rng(0)
    dev = jax.device_put({
        "color": r.integers(0, 255, (batch, h, w, 3), dtype=np.uint8),
        "pol": r.integers(0, 255, (batch, h, w, 4), dtype=np.uint8)})
    med = _median_time(lambda: float(chained(state, dev)), reps)
    return chain * batch / med


def measure_train(batch=12, h=320, w=480, chain=8, reps=5, **cfg_kw):
    """Supervised train-step throughput via the production multi-step scan
    dispatch (train/trainer.py:make_multi_train_step)."""
    jax = _setup_jax()
    import jax.numpy as jnp
    from polardepth_tpu.config import Config
    from polardepth_tpu.train.trainer import (
        build_model, make_multi_train_step)
    from polardepth_tpu.train.state import create_train_state

    from polardepth_tpu.data.synthetic import SyntheticHammer

    cfg = Config(height=h, width=w, batch_size=batch, donate_state=False,
                 **cfg_kw)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    example = {"color": jnp.zeros((1, h, w, 3), jnp.float32),
               "pol": jnp.zeros((1, h, w, 4), jnp.float32)}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    multi = jax.jit(make_multi_train_step(model, cfg))

    gen = SyntheticHammer(h, w, seed=5)
    batches = [gen.batch(batch, start=i * batch) for i in range(chain)]
    keys = ("color", "pol", "depth", "K")
    dev = jax.device_put({k: np.stack([b[k] for b in batches])
                          for k in keys})

    def run():
        nonlocal state
        state, logs = multi(state, dev, rng)
        float(logs["loss"])  # readback forces completion

    med = _median_time(run, reps)
    return chain * batch / med


def measure_student_train(batch=12, h=320, w=480, chain=4, reps=5,
                          remat=None, **cfg_kw):
    """Teacher+student (cost volume) train step at the published geometry,
    chained on the host (the step donates no state; readback per call)."""
    jax = _setup_jax()
    import jax.numpy as jnp
    from polardepth_tpu.config import Config
    from polardepth_tpu.data.synthetic import SyntheticHammer
    from polardepth_tpu.train.student import (
        StudentModel, make_student_train_step)
    from polardepth_tpu.train.state import create_train_state

    cfg = Config(height=h, width=w, batch_size=batch, train_student=True,
                 donate_state=False, **cfg_kw)
    # None = the shipped default (Config.student_remat), so the
    # "defaults" row always measures what the CLI actually runs
    model = StudentModel.from_config(
        cfg, **({} if remat is None else {"remat": remat}))
    rng = jax.random.PRNGKey(0)
    nf = len(cfg.frame_ids)
    n_lookup = len(cfg.matching_ids) - 1
    example = {
        "color_frames": jnp.zeros((1, nf, h, w, 3), jnp.float32),
        "pol": jnp.zeros((1, h, w, 4), jnp.float32),
        "lookup_frames": jnp.zeros((1, n_lookup, h, w, 3), jnp.float32),
        "rel_poses": jnp.zeros((1, n_lookup, 4, 4), jnp.float32),
        "K_quarter": jnp.eye(4)[None].astype(jnp.float32),
        "inv_K_quarter": jnp.eye(4)[None].astype(jnp.float32),
        "min_depth_bin": cfg.min_depth, "max_depth_bin": cfg.max_depth,
    }
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    step = jax.jit(make_student_train_step(model, cfg))

    gen = SyntheticHammer(h, w, seed=3)
    b = gen.batch_frames(batch, frame_ids=cfg.frame_ids)
    b["inv_K"] = np.linalg.inv(b["K"]).astype(np.float32)
    dev = jax.device_put({k: b[k] for k in
                          ("color_frames", "pol", "depth", "rel_poses",
                           "K", "inv_K")})
    trackers = (jnp.float32(cfg.min_depth), jnp.float32(cfg.max_depth))

    def run():
        nonlocal state, trackers
        for _ in range(chain):
            state, trackers, logs = step(state, trackers, dev, rng)
        float(logs["loss"])

    med = _median_time(run, reps)
    return chain * batch / med


def measure_cpu_baseline(batch=8, h=512, w=512, timeout=3600):
    """Headline-geometry pipeline on host CPU, subprocess-isolated."""
    code = (
        "import os; os.environ['JAX_PLATFORMS']='cpu'; "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "import sys; sys.path.insert(0, %r); "
        "from scripts.bench_suite import measure_infer; "
        "print('RESULT', measure_infer(batch=%d, h=%d, w=%d, chain=2, "
        "reps=2, phase_packed_decoder=False))" % (HERE, batch, h, w))
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=timeout, cwd=HERE,
                         env=dict(os.environ, JAX_PLATFORMS="cpu"))
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return float(line[7:])
    raise RuntimeError(f"cpu baseline failed: {out.stderr[-2000:]}")


# The single row registry: scripts/bench_student_rows.py iterates subsets of
# THIS dict, so a row measured either way lands under the same name and the
# full suite covers every row (ADVICE r3).  Insertion order = run order.
ROWS = {
    # Since round 5 the Config DEFAULT is phase_packed_decoder=True, so the
    # legacy (unpacked) rows pin phase_packed_decoder=False explicitly —
    # each row's name keeps meaning what it always measured.
    "infer_512_f32": lambda: measure_infer(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        phase_packed_decoder=False),
    "infer_512_bf16": lambda: measure_infer(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        compute_dtype="bfloat16", phase_packed_decoder=False),
    "infer_512_bf16_fast": lambda: measure_infer(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        compute_dtype="bfloat16", fast_decoder=True,
        phase_packed_decoder=False),
    # The production headline config: phase-packed decoder stages with the
    # reference's reflection padding (exact reference graph semantics).
    "infer_512_bf16_phase": lambda: measure_infer(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        compute_dtype="bfloat16", phase_packed_decoder=True),
    # round-4: XOLP+normals encoders as one groups=2 stack at 128 lanes
    "infer_512_bf16_phase_fusedenc": lambda: measure_infer(
        compute_dtype="bfloat16", phase_packed_decoder=True,
        fused_encoders=True, fused_plan="grouped"),
    # round-5: the same fused stack executed as block-diagonal DENSE convs
    "infer_512_bf16_phase_fusedenc_dense": lambda: measure_infer(
        compute_dtype="bfloat16", phase_packed_decoder=True,
        fused_encoders=True, fused_plan="dense"),
    "train_512_f32": lambda: measure_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        batch=8, h=512, w=512, phase_packed_decoder=False),
    "train_512_bf16_fast": lambda: measure_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        batch=8, h=512, w=512, compute_dtype="bfloat16", fast_decoder=True,
        phase_packed_decoder=False),
    "train_320x480_f32": lambda: measure_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        phase_packed_decoder=False),
    "train_320x480_bf16_fast": lambda: measure_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        compute_dtype="bfloat16", fast_decoder=True,
        phase_packed_decoder=False),
    "train_320x480_bf16_phase": lambda: measure_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        compute_dtype="bfloat16", phase_packed_decoder=True),
    "train_320x480_bf16_phase_packedloss": lambda: measure_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        compute_dtype="bfloat16", phase_packed_decoder=True,
        photometric_packed=True),
    "train_512_bf16_phase_packedloss": lambda: measure_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        batch=8, h=512, w=512, compute_dtype="bfloat16",
        phase_packed_decoder=True, photometric_packed=True),
    "train_512_bf16_phase_fusedenc": lambda: measure_train(
        batch=8, h=512, w=512, compute_dtype="bfloat16",
        phase_packed_decoder=True, fused_encoders=True,
        fused_plan="grouped"),  # r5 session-1 row: grouped plan
    # shipped-defaults execution plan (dense block-diagonal fusion)
    "train_512_bf16_phase_fusedenc_dense": lambda: measure_train(
        batch=8, h=512, w=512, compute_dtype="bfloat16",
        phase_packed_decoder=True),
    "train_320x480_bf16_phase_fusedenc_dense": lambda: measure_train(
        compute_dtype="bfloat16", phase_packed_decoder=True),
    "student_train_320x480_f32": lambda: measure_student_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        phase_packed_decoder=False, warp_impl="patch", cv_warp_impl="xla"),
    "student_train_320x480_pallas": lambda: measure_student_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        warp_impl="pallas", cv_warp_impl="pallas8",
        phase_packed_decoder=False),
    "student_train_320x480_pallas_bf16": lambda: measure_student_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        warp_impl="pallas", cv_warp_impl="pallas8_fast",
        compute_dtype="bfloat16", fast_decoder=True,
        phase_packed_decoder=False),
    # round-3 session-2: fast single-pass photometric warps + phase-packed
    # decoders + stacked channels-leading photometric losses
    "student_train_320x480_fast_bf16": lambda: measure_student_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        warp_impl="pallas_fast", cv_warp_impl="pallas8_fast",
        compute_dtype="bfloat16", fast_decoder=True,
        phase_packed_decoder=False),
    "student_train_320x480_phase_bf16": lambda: measure_student_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        warp_impl="pallas_fast", cv_warp_impl="pallas8_fast",
        compute_dtype="bfloat16", phase_packed_decoder=True),
    # no-remat experiment: bf16 sweep + Pallas warps freed the HBM that
    # forced remat in round 2 — does dropping the ~0.6-forward recompute pay?
    "student_train_320x480_phase_bf16_noremat": lambda: measure_student_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        warp_impl="pallas_fast", cv_warp_impl="pallas8_fast",
        compute_dtype="bfloat16", phase_packed_decoder=True, remat=False),
    # round-4: the two wins compose? (noremat freed by bf16+Pallas HBM
    # savings; packed losses halve the loss-elementwise dispatch count)
    "student_train_320x480_packed_bf16_noremat": lambda: measure_student_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        warp_impl="pallas_fast", cv_warp_impl="pallas8_fast",
        compute_dtype="bfloat16", phase_packed_decoder=True,
        photometric_packed=True, remat=False),
    "student_train_320x480_packed_bf16": lambda: measure_student_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        warp_impl="pallas_fast", cv_warp_impl="pallas8_fast",
        compute_dtype="bfloat16", phase_packed_decoder=True,
        photometric_packed=True),
    "student_train_320x480_packedloss_f32": lambda: measure_student_train(
        fused_encoders=False,  # pre-r5 row: name keeps its meaning
        warp_impl="pallas", cv_warp_impl="pallas8",
        photometric_packed=True, phase_packed_decoder=False),
    # round-5: the SHIPPED DEFAULTS (warp_impl/cv_warp_impl "auto" ->
    # pallas_fast/pallas8_fast on TPU, phase-packed decoder,
    # Config.student_remat) + the bf16 fast-path dtype — VERDICT r4 #2's
    # ">=30 fps with the shipped defaults" row
    "student_train_320x480_defaults_bf16": lambda: measure_student_train(
        compute_dtype="bfloat16"),
    "cpu_infer_512_f32": lambda: measure_cpu_baseline(),
}


def record(results, out, name, fn):
    """Measure one row into results[name]; None on failure (a stale prior
    value must never survive a re-measurement attempt — ADVICE r3)."""
    t0 = time.time()
    try:
        results[name] = round(fn(), 2)
        print(f"{name}: {results[name]} fps  ({time.time()-t0:.0f}s)",
              flush=True)
    except Exception as exc:
        results[name] = None
        print(f"{name}: FAILED {exc}", flush=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-cpu", action="store_true")
    p.add_argument("--out", default=os.path.join(HERE, "bench_suite.json"))
    p.add_argument("--rows", default="",
                   help="comma-separated exact row names to (re)measure; "
                        "unlisted rows keep their stored value")
    a = p.parse_args()
    only = {r for r in a.rows.split(",") if r}
    unknown = only - set(ROWS)
    if unknown:
        p.error(f"unknown rows: {sorted(unknown)}")
    results = {}
    if os.path.exists(a.out):  # rows SKIPPED this run keep their value;
        with open(a.out) as f:  # every attempted row is overwritten
            results = json.load(f)
    for name, fn in ROWS.items():
        if only and name not in only:
            continue
        if a.skip_cpu and name == "cpu_infer_512_f32":
            continue
        record(results, a.out, name, fn)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
