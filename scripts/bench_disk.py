#!/usr/bin/env python
"""Disk-to-depth honesty bench (VERDICT r3 #5).

The 313 fps headline feeds in-memory uint8.  This script writes a synthetic
corpus as REAL PNGs in the on-disk HAMMER layout, then runs the production
ingest path — HammerLoader (native C++ libpng decoder when available) ->
BatchIterator thread pool -> device_prefetch -> fused infer step — sustained
over full epochs, and reports:

  disk_fps        PNG decode every epoch (cache_bytes=0) — the true cold path
  cached_fps      epochs 2+ with the production decoded-sample RAM cache
                  (Config.host_cache_gb): decode amortised away
  inmem_fps       the headline's in-memory feeder at the same geometry
  decode_MBps     host PNG decode throughput (for the core-count analysis:
                  saturating the device needs decode_rate >= fps x
                  bytes/frame; this host has ONE core — the reference uses
                  8-12 DataLoader workers for the same reason)

  python scripts/bench_disk.py [--steps 200] [--root /tmp/polar_disk_corpus]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

H = W = 512
BATCH = 8


def build_corpus(root: str, scenes: int = 4, frames: int = 32) -> list:
    from polardepth_tpu.data.synthetic import write_synthetic_scene
    names = [f"scene{r}_traj1_1" for r in range(scenes)]
    marker = os.path.join(root, ".complete")
    if not os.path.exists(marker):
        for r, name in enumerate(names):
            write_synthetic_scene(root, name, num_frames=frames,
                                  height=H, width=W, seed=r)
            print(f"wrote {name}", flush=True)
        open(marker, "w").write("ok")
    return names


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/polar_disk_corpus")
    p.add_argument("--steps", type=int, default=200,
                   help="sustained steps per measurement (>= 2 epochs)")
    p.add_argument("--out", default=os.path.join(HERE, "bench_disk.json"))
    a = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from polardepth_tpu.config import Config
    from polardepth_tpu.data.hammer import HammerIndex, HammerLoader
    from polardepth_tpu.data.pipeline import BatchIterator, device_prefetch
    from polardepth_tpu.train.trainer import build_model, make_infer_step
    from polardepth_tpu.train.state import create_train_state

    scenes = build_corpus(a.root)
    cfg = Config(height=H, width=W, batch_size=BATCH, dropout_rate=0.0,
                 compute_dtype="bfloat16", phase_packed_decoder=True,
                 data_path=a.root)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    example = {"color": jnp.zeros((1, H, W, 3), jnp.float32),
               "pol": jnp.zeros((1, H, W, 4), jnp.float32)}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    infer = jax.jit(make_infer_step(model, cfg))

    index = HammerIndex(a.root, scenes)
    loader = HammerLoader(index, backend="auto")
    n = len(index)
    print(f"corpus: {n} frames across {len(scenes)} scenes "
          f"(decoder: {loader.backend})", flush=True)

    results = {"decoder": loader.backend, "frames": n}

    def load(i):  # ship only what the fused infer step consumes
        s = loader.load(int(i))
        return {"color": s["color"], "pol": s["pol"]}

    # host decode throughput (one full pass, no device)
    t0 = time.perf_counter()
    nbytes = 0
    for i in range(min(n, 64)):
        s = load(i)
        nbytes += sum(v.nbytes for v in s.values())
    dt = time.perf_counter() - t0
    results["decode_MBps"] = round(nbytes / dt / 1e6, 1)
    results["decode_fps_host"] = round(min(n, 64) / dt, 2)
    print(f"host decode: {results['decode_MBps']} MB/s "
          f"({results['decode_fps_host']} frames/s)", flush=True)

    def run(cache_bytes: int, steps: int, skip_first_epoch: bool):
        it = BatchIterator(load, n, BATCH, shuffle=True, seed=0,
                           num_workers=8, cache_bytes=cache_bytes)

        def stream():
            while True:
                yield from it

        gen = stream()
        if skip_first_epoch:  # warm the RAM cache
            for _ in range(len(it)):
                next(gen)
        pf = device_prefetch(gen, size=2)
        # warm compile
        float(jnp.sum(infer(state, next(pf))))
        done = 0
        t0 = time.perf_counter()
        for b in pf:
            float(jnp.sum(infer(state, b)))
            done += 1
            if done >= steps:
                break
        return steps * BATCH / (time.perf_counter() - t0)

    # component rates, to attribute any disk-vs-inmem gap:
    # (a) tunnel/PCIe host->device upload bandwidth at the batch size
    # NB: block_until_ready can return before completion through the axon
    # tunnel (PERF.md), so time with a value readback of the shipped bytes;
    # subtract the readback-only dispatch cost measured on a resident copy.
    rng = np.random.default_rng(1)
    ups = [{"color": rng.integers(0, 255, (BATCH, H, W, 3), dtype=np.uint8),
            "pol": rng.integers(0, 255, (BATCH, H, W, 4), dtype=np.uint8)}
           for _ in range(4)]
    nb = sum(v.nbytes for v in ups[0].values())
    touch = jax.jit(lambda d: jnp.float32(d["color"][0, 0, 0, 0])
                    + jnp.float32(d["pol"][-1, -1, -1, -1]))
    resident = jax.device_put(ups[0])
    float(touch(resident))  # compile
    t0 = time.perf_counter()
    for _ in range(10):
        float(touch(resident))
    base = (time.perf_counter() - t0) / 10
    t0 = time.perf_counter()
    for k in range(10):
        float(touch(jax.device_put(ups[k % len(ups)])))
    dt = (time.perf_counter() - t0) / 10 - base
    results["upload_MBps"] = round(nb / dt / 1e6, 1)
    results["upload_ms_per_batch"] = round(dt * 1e3, 1)
    print(f"host->device upload: {results['upload_MBps']} MB/s "
          f"({results['upload_ms_per_batch']} ms/batch)", flush=True)

    # (b) pure-host loader capacity (decode + batch assembly, NO device):
    # what the pipeline sustains if the device side were free
    it = BatchIterator(load, n, BATCH, shuffle=True, seed=0,
                       num_workers=8, cache_bytes=0)
    cnt = 0
    t0 = time.perf_counter()
    for b in it:
        cnt += 1
    results["loader_fps_host"] = round(cnt * BATCH
                                       / (time.perf_counter() - t0), 2)
    print(f"loader_fps_host {results['loader_fps_host']}", flush=True)

    results["disk_fps"] = round(run(0, a.steps, False), 2)
    print(f"disk_fps {results['disk_fps']}", flush=True)
    results["cached_fps"] = round(run(64 << 30, a.steps, True), 2)
    print(f"cached_fps {results['cached_fps']}", flush=True)

    # in-memory reference at the same geometry/step construction
    r = np.random.default_rng(0)
    dev = jax.device_put({
        "color": r.integers(0, 255, (BATCH, H, W, 3), dtype=np.uint8),
        "pol": r.integers(0, 255, (BATCH, H, W, 4), dtype=np.uint8)})
    float(jnp.sum(infer(state, dev)))
    t0 = time.perf_counter()
    for _ in range(a.steps):
        float(jnp.sum(infer(state, dev)))
    results["inmem_fps"] = round(a.steps * BATCH
                                 / (time.perf_counter() - t0), 2)
    print(f"inmem_fps {results['inmem_fps']}", flush=True)

    results["cached_vs_inmem"] = round(
        results["cached_fps"] / results["inmem_fps"], 3)
    with open(a.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
