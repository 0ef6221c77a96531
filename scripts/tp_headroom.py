#!/usr/bin/env python
"""Evidence for the tri-encoder conv-TP use case (VERDICT r4 #8).

PERF.md round-4 argued conv TP on the 21 M-param flagship is
throughput-NEGATIVE at production geometry (per-block psum ~5x the compute
it saves) and that its real use is **memory headroom at very large
resolutions** (>2k px).  This script turns that claim into numbers without
multi-chip hardware: it AOT-compiles the FULL supervised train step at
high resolution on a virtual device mesh and reads XLA's per-device
compiled memory analysis for

  dp   : 1 device,  unsharded (what a single chip would hold)
  tp=4 : (1, 4) ('data','model') mesh, tri_tp_spec channel sharding

No execution — compile only, so nothing can OOM.  Per-device peak =
argument + output + temp bytes of the SPMD executable.

  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/tp_headroom.py --height 2048 --width 2048
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

# Force CPU unconditionally: this is an AOT compile-only analysis, and the
# session env pins JAX_PLATFORMS=axon (the TPU tunnel is single-client —
# a setdefault here once connected to it and killed a running TPU job).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# The axon plugin can register despite the env var (it grabbed the tunnel
# and ran this analysis against the 1-chip TPU backend once); the config
# pin before first backend use is the reliable one.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def _mem(compiled):
    m = compiled.memory_analysis()
    gb = 1 << 30
    return {
        "argument_gb": round(m.argument_size_in_bytes / gb, 3),
        "output_gb": round(m.output_size_in_bytes / gb, 3),
        "temp_gb": round(m.temp_size_in_bytes / gb, 3),
        "peak_gb": round((m.argument_size_in_bytes + m.output_size_in_bytes
                          + m.temp_size_in_bytes) / gb, 3),
    }


def analyze(h: int, w: int, tp_deg: int):
    import jax
    import jax.numpy as jnp
    from polardepth_tpu.config import Config
    from polardepth_tpu.parallel import tp
    from polardepth_tpu.parallel.mesh import create_mesh
    from polardepth_tpu.train.trainer import build_model, make_train_step
    from polardepth_tpu.train.state import create_train_state
    from polardepth_tpu.data.synthetic import SyntheticHammer

    cfg = Config(height=h, width=w, batch_size=1, dropout_rate=0.0,
                 donate_state=False, compute_dtype="bfloat16",
                 # the Pallas kernel can't trace on the CPU AOT backend;
                 # the XLA preprocess chain has the same O(HW) residency
                 use_pallas=False)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    example = {"color": jnp.zeros((1, 64, 64, 3), jnp.float32),
               "pol": jnp.zeros((1, 64, 64, 4), jnp.float32)}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    batch_shapes = {
        "color": jax.ShapeDtypeStruct((1, h, w, 3), jnp.uint8),
        "pol": jax.ShapeDtypeStruct((1, h, w, 4), jnp.uint8),
        "depth": jax.ShapeDtypeStruct((1, h, w, 1), jnp.float32),
        "K": jax.ShapeDtypeStruct((1, 4, 4), jnp.float32),
    }
    # SyntheticHammer only provides K's structure; batch is abstract (AOT)
    del SyntheticHammer

    if tp_deg == 1:
        mesh = create_mesh((1,), devices=jax.devices()[:1])
        step = jax.jit(make_train_step(model, cfg))
        lowered = step.lower(state, batch_shapes, rng)
    else:
        tp.validate_tri_tp(tp_deg)
        mesh = tp.create_tp_mesh(1, tp_deg)
        state, sh = tp.shard_train_state(state, mesh,
                                         spec_fn=tp.tri_tp_spec)
        # donate=False: the dp leg jits without donation, so keep the two
        # executables' aliasing assumptions identical for a fair comparison
        step = tp.make_tri_tp_train_step(model, cfg, mesh, sh, donate=False)
        lowered = step.lower(state, batch_shapes, rng)
    return _mem(lowered.compile())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=2048)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--out", default=os.path.join(HERE, "tp_headroom.json"))
    a = ap.parse_args()
    out = {"geometry": [a.height, a.width], "batch": 1,
           "hbm_gb_v5e": 15.75}
    for name, deg in (("dp_1dev", 1), ("tp4", 4)):
        try:
            out[name] = analyze(a.height, a.width, deg)
            print(name, json.dumps(out[name]), flush=True)
        except Exception as exc:  # noqa: BLE001 — record, keep going
            out[name] = {"error": str(exc)[-500:]}
            print(name, "FAILED", exc, flush=True)
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
