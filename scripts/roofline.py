#!/usr/bin/env python
"""Roofline accounting for the headline inference pipeline (VERDICT r2 #2).

For every block of the 512px tri-encoder pipeline: measure runtime (chained
lax.scan, tunnel-immune) and pull XLA's compiled cost model (flops, bytes
accessed) to compute the hardware floor:

  t_bw    = bytes / HBM_BW          (bandwidth floor)
  t_flops = flops / MXU_PEAK        (compute floor)
  floor   = max(t_bw, t_flops);  ratio = measured / floor

v5e (TPU v5 lite) peaks: 197 TFLOP/s bf16 (MXU), ~819 GB/s HBM.  f32 conv
work runs through the MXU at ~1/4 the bf16 rate (XLA f32 emulation), so f32
rows report against 49 TFLOP/s.

Writes roofline.json + a markdown table for PERF.md.

  python scripts/roofline.py
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

HBM_BW = 819e9           # bytes/s
PEAK_BF16 = 197e12       # flop/s
PEAK_F32 = PEAK_BF16 / 4

H = W = 512
B = 8


def _setup_jax():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def measure_ms(fn, example, chain=16, reps=5):
    """Median ms per call via chained scan with index-dependent inputs."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x):
        def body(carry, i):
            # every input must depend on the scan index or XLA hoists the
            # whole body out of the loop and the timing lies
            xi = jax.tree_util.tree_map(
                lambda a: a + (i % 2).astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.integer)
                else a + i.astype(a.dtype) * 1e-6, x)
            out = fn(xi)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return carry + jnp.sum(leaf).astype(jnp.float32), None
        total, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(chain))
        return total

    dev = jax.device_put(example)
    float(chained(dev))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chained(dev))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2] / chain * 1e3


def cost(fn, example):
    """XLA compiled-cost model: (gflops, gbytes) per call."""
    import jax
    c = jax.jit(fn).lower(example).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return (c.get("flops", 0.0) / 1e9,
            c.get("bytes accessed", 0.0) / 1e9)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(HERE, "roofline.json"))
    p.add_argument("--dtype", default="bfloat16")
    a = p.parse_args()
    jax = _setup_jax()
    import jax.numpy as jnp
    from polardepth_tpu.config import Config
    from polardepth_tpu.train.trainer import build_model, make_infer_step
    from polardepth_tpu.train.state import create_train_state
    from polardepth_tpu.models.pre_encoders import (
        ShallowEncoder, ShallowNormalsEncoder, JointEncoder)
    from polardepth_tpu.models.resnet import ShallowResNet18Stem
    from polardepth_tpu.models.depth_decoder import DepthDecoder
    from polardepth_tpu.ops.xolp import xolp_from_pol
    from polardepth_tpu.ops.fresnel import normal_priors_from_xolp

    dt = a.dtype
    peak = PEAK_BF16 if dt == "bfloat16" else PEAK_F32
    # round-4: measure the PRODUCTION config (phase-packed decoder with
    # reference reflection padding + fused Pallas preprocess), not the
    # round-2 fast_decoder config the first roofline used.
    cfg = Config(height=H, width=W, batch_size=B, dropout_rate=0.0,
                 compute_dtype=dt, phase_packed_decoder=True)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)

    rows = []

    def add(name, fn, example):
        ms = measure_ms(fn, example)
        gf, gb = cost(fn, example)
        t_bw = gb * 1e9 / HBM_BW * 1e3
        t_fl = gf * 1e9 / peak * 1e3
        floor = max(t_bw, t_fl)
        rows.append({
            "block": name, "ms": round(ms, 3), "gflops": round(gf, 2),
            "gbytes": round(gb, 3), "t_bw_ms": round(t_bw, 3),
            "t_flops_ms": round(t_fl, 3),
            "bound": "bw" if t_bw >= t_fl else "flops",
            "ratio_vs_floor": round(ms / max(floor, 1e-9), 2),
        })
        print(f"{name:24s} {ms:8.3f} ms | floor {floor:7.3f} ms "
              f"({rows[-1]['bound']}) | x{rows[-1]['ratio_vs_floor']}",
              flush=True)

    # full pipeline
    model = build_model(cfg)
    example = {"color": jnp.zeros((1, H, W, 3), jnp.float32),
               "pol": jnp.zeros((1, H, W, 4), jnp.float32)}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    infer = make_infer_step(model, cfg)
    batch = {"color": r.integers(0, 255, (B, H, W, 3), dtype=np.uint8),
             "pol": r.integers(0, 255, (B, H, W, 4), dtype=np.uint8)}
    add("full infer (uint8 in)", lambda b: infer(state, b), batch)

    pol = r.uniform(0, 255, (B, H, W, 4)).astype(np.float32)
    add("xolp stokes fit", lambda x: xolp_from_pol(x), pol)

    xolp = np.stack([r.uniform(0, 0.9, (B, H, W)),
                     r.uniform(-1.5, 1.5, (B, H, W))], -1).astype(np.float32)
    add("fresnel priors", lambda x: normal_priors_from_xolp(x, 1.5), xolp)

    # round-4 production preprocess: the banded Pallas kernel.  XLA's cost
    # model cannot see inside a pallas_call, so floors are analytic: HBM
    # traffic = read (P, 4) f32 + write (P, 11) f32; the compute floor uses
    # the VPU transcendental budget (atan2 poly ~30 ops + 8 sin/cos ~12 ops
    # each ~= 126 VPU flops/pixel at ~1/16 MXU peak per the pallas guide's
    # VPU:MXU ratio) — this chain is VPU-bound, not matmul-bound.
    from polardepth_tpu.ops.pallas.polar_preprocess import (
        fused_polar_preprocess)
    P_pix = B * H * W
    pal_gb = P_pix * (4 + 11) * 4 / 1e9
    pal_gf = P_pix * 126 / 1e9
    ms = measure_ms(lambda x: fused_polar_preprocess(x, 1.5)[1], pol)
    t_bw = pal_gb * 1e9 / HBM_BW * 1e3
    t_fl = pal_gf * 1e9 / (peak / 16) * 1e3
    rows.append({
        "block": "fused preprocess (pallas)", "ms": round(ms, 3),
        "gflops": round(pal_gf, 2), "gbytes": round(pal_gb, 3),
        "t_bw_ms": round(t_bw, 3), "t_flops_ms": round(t_fl, 3),
        "bound": "bw" if t_bw >= t_fl else "vpu",
        "ratio_vs_floor": round(ms / max(t_bw, t_fl, 1e-9), 2),
    })
    print(f"{'fused preprocess (pallas)':24s} {ms:8.3f} ms | floor "
          f"{max(t_bw, t_fl):7.3f} ms ({rows[-1]['bound']}) | "
          f"x{rows[-1]['ratio_vs_floor']}", flush=True)

    color = r.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    stem = ShallowResNet18Stem(dt)
    sv = stem.init(rng, jnp.asarray(color[:1]))
    add("rgb stem", lambda x: stem.apply(sv, x), color)

    xenc = ShallowEncoder("XOLP", 0.0, dt)
    xv = xenc.init({"params": rng, "dropout": rng}, jnp.asarray(xolp[:1]))
    add("xolp encoder", lambda x: xenc.apply(xv, x), xolp)

    nenc = ShallowNormalsEncoder(0.0, 1.5, dt)
    nv = nenc.init({"params": rng, "dropout": rng}, jnp.asarray(xolp[:1]))
    add("normals enc (incl phys)", lambda x: nenc.apply(nv, x), xolp)

    # round-5 production encoder plan: both modality trunks as ONE dense
    # block-diagonal 128-lane stack (priors precomputed, as in production
    # where the Pallas preprocess supplies them) — compare against the sum
    # of the two standalone rows above.
    from polardepth_tpu.models.pre_encoders import FusedModalityEncoders
    priors = r.uniform(-1, 1, (B, H, W, 9)).astype(np.float32)
    fenc = FusedModalityEncoders(0.0, 1.5, dt, plan="dense")
    fv = fenc.init({"params": rng, "dropout": rng}, jnp.asarray(xolp[:1]),
                   priors=jnp.asarray(priors[:1]))
    add("fused modality encs (dense)",
        lambda t: fenc.apply(fv, t[0], priors=t[1]), (xolp, priors))

    h8, w8 = H // 8, W // 8
    rgb8 = r.normal(0, 1, (B, h8, w8, 128)).astype(np.float32)
    x8 = r.normal(0, 1, (B, h8, w8, 64)).astype(np.float32)
    n8 = r.normal(0, 1, (B, h8, w8, 64)).astype(np.float32)
    jenc = JointEncoder(0.0)
    jv = jenc.init({"params": rng, "dropout": rng}, jnp.asarray(rgb8[:1]),
                   jnp.asarray(x8[:1]), jnp.asarray(n8[:1]))
    add("joint encoder",
        lambda t: jenc.apply(jv, t[0], t[1], t[2]), (rgb8, x8, n8))

    feats = [r.normal(0, 1, (B, H // s, W // s, c)).astype(np.float32)
             for s, c in ((2, 64), (4, 64), (8, 128), (16, 256), (32, 512))]
    dec = DepthDecoder((0, 1, 2, 3), pad_mode="reflect",
                       phase_packed=cfg.phase_packed_decoder)
    dv = dec.init(rng, [jnp.asarray(f[:1]) for f in feats])
    add("depth decoder (phase-packed)",
        lambda t: dec.apply(dv, list(t)), tuple(feats))

    out = {"config": {"h": H, "w": W, "batch": B, "dtype": dt,
                      "hbm_gbps": HBM_BW / 1e9, "peak_tflops": peak / 1e12},
           "device": str(jax.devices()[0]), "rows": rows}
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)

    print("\n| block | ms | GFLOP | GB | bw floor ms | flop floor ms | "
          "bound | x floor |")
    print("|---|---|---|---|---|---|---|---|")
    for rr in rows:
        print(f"| {rr['block']} | {rr['ms']} | {rr['gflops']} | "
              f"{rr['gbytes']} | {rr['t_bw_ms']} | {rr['t_flops_ms']} | "
              f"{rr['bound']} | {rr['ratio_vs_floor']} |")
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
