#!/usr/bin/env python
"""Analytic (device-free) roofline floors for the headline pipeline blocks.

VERDICT r2 #2 asked for bytes-moved arithmetic: for every block of the
512 px tri-encoder pipeline, what is the hardware floor on a v5e and how
far above it does the measured time sit?  `scripts/roofline.py` answers
with the XLA compiled cost model and needs the TPU; this script answers
from first principles and runs anywhere:

  * FLOPs: exact conv_general_dilated / dot_general arithmetic counted by
    walking the traced jaxpr (2 * out_elems * Cin/groups * kh * kw per
    conv; 2*M*N*K per dot), at the dtypes the production graph actually
    uses (bf16 trunk, f32 physics).
  * Traffic: the minimum HBM bytes a perfectly-fused schedule still has
    to move — every conv/dot operand + result (inter-conv activations
    cannot stay in VMEM at 8x512x512 working sets) plus the block's own
    inputs/outputs; pure-elementwise chains are treated as free (fused).

  floor = max(traffic / HBM_BW, flops / MXU_peak);  ratio = measured / floor

Measured ms come from a prior on-TPU run (PERF.md component profile /
roofline.json when present); without them the table still reports the
floors so a future measurement can be judged against them.

  python scripts/analytic_roofline.py            # CPU is fine
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

HBM_BW = 819e9            # v5e HBM bytes/s
PEAK_BF16 = 197e12        # v5e MXU flop/s (bf16)
PEAK_F32 = PEAK_BF16 / 4  # f32 conv throughput through the MXU

H = W = 512
B = 8


def _walk(jaxpr, eqns):
    for e in jaxpr.eqns:
        eqns.append(e)
        for v in e.params.values():
            vals = v if isinstance(v, (list, tuple)) else (v,)
            for sub in vals:
                inner = getattr(sub, "jaxpr", sub)
                if hasattr(inner, "eqns"):
                    _walk(inner, eqns)


def _bytes(aval):
    return int(np.prod(aval.shape)) * aval.dtype.itemsize


def analyze(fn, example):
    """(flops_by_dtype, matmul_bytes, io_bytes) of the traced block."""
    import jax

    closed = jax.make_jaxpr(fn)(example)
    eqns = []
    _walk(closed.jaxpr, eqns)

    flops = {"bf16": 0.0, "f32": 0.0}
    mm_bytes = 0.0
    for e in eqns:
        name = e.primitive.name
        if name == "conv_general_dilated":
            lhs, rhs = e.invars[0].aval, e.invars[1].aval
            out = e.outvars[0].aval
            dnums = e.params["dimension_numbers"]
            # all rhs dims but out-features = (Cin/groups) * kh * kw,
            # i.e. K per output element (grouping already folded in)
            k_elems = int(np.prod(rhs.shape)) // rhs.shape[dnums.rhs_spec[0]]
            f = 2.0 * int(np.prod(out.shape)) * k_elems
            key = "bf16" if str(out.dtype) == "bfloat16" else "f32"
            flops[key] += f
            mm_bytes += _bytes(lhs) + _bytes(rhs) + _bytes(out)
        elif name == "dot_general":
            lhs, rhs = e.invars[0].aval, e.invars[1].aval
            out = e.outvars[0].aval
            (lc, _), _ = e.params["dimension_numbers"]
            k = int(np.prod([lhs.shape[i] for i in lc]))
            f = 2.0 * int(np.prod(out.shape)) * k
            key = "bf16" if str(out.dtype) == "bfloat16" else "f32"
            flops[key] += f
            mm_bytes += _bytes(lhs) + _bytes(rhs) + _bytes(out)

    io = sum(_bytes(v.aval) for v in closed.jaxpr.invars)
    io += sum(_bytes(v.aval) for v in closed.jaxpr.outvars)
    return flops, mm_bytes, io


# measured ms from the round-2 on-TPU component profile (PERF.md), keyed
# by the dtype the measurement actually ran in: the per-block profile was
# f32 except the decoder, which also has the bf16+zero-pad figure.  bf16
# per-block numbers await the queued roofline.py TPU run.
MEASURED_MS_R2 = {
    "float32": {
        "rgb stem": 6.9,
        "xolp stokes fit": 4.1,
        "fresnel priors": 5.0,
        "xolp encoder": 9.3,
        "normals enc (incl phys)": 10.8,
        "joint encoder": 5.1,
        "depth decoder": 19.5,
    },
    "bfloat16": {
        # physics stays f32 in the bf16 configuration — same measurement
        "xolp stokes fit": 4.1,
        "fresnel priors": 5.0,
        "depth decoder": 15.8,
    },
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default=os.path.join(HERE,
                                                 "roofline_analytic.json"))
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--measured", default="",
                   help="optional roofline.json with fresh measured ms")
    a = p.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS", "") != "":
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(HERE, ".jax_cache"))
    import jax.numpy as jnp
    from polardepth_tpu.config import Config
    from polardepth_tpu.models.pre_encoders import (
        ShallowEncoder, ShallowNormalsEncoder, JointEncoder)
    from polardepth_tpu.models.resnet import ShallowResNet18Stem
    from polardepth_tpu.models.depth_decoder import DepthDecoder
    from polardepth_tpu.ops.xolp import xolp_from_pol
    from polardepth_tpu.ops.fresnel import normal_priors_from_xolp

    dt = a.dtype
    cfg = Config(height=H, width=W, batch_size=B, dropout_rate=0.0,
                 compute_dtype=dt, fast_decoder=True)
    rng = jax.random.PRNGKey(0)
    r = np.random.default_rng(0)

    measured = dict(MEASURED_MS_R2.get(dt, {}))
    measured_src = f"round-2 PERF.md component profile ({dt} rows)"
    if a.measured and os.path.exists(a.measured):
        with open(a.measured) as f:
            measured.update({row["block"]: row["ms"]
                             for row in json.load(f)["rows"]})
        measured_src = a.measured

    rows = []

    def add(name, fn, example):
        flops, mm_gb, io_gb = analyze(fn, example)
        t_fl = (flops["bf16"] / PEAK_BF16 + flops["f32"] / PEAK_F32) * 1e3
        traffic = max(mm_gb, io_gb)
        t_bw = traffic / HBM_BW * 1e3
        floor = max(t_bw, t_fl)
        ms = measured.get(name)
        rows.append({
            "block": name,
            "gflops_bf16": round(flops["bf16"] / 1e9, 2),
            "gflops_f32": round(flops["f32"] / 1e9, 2),
            "matmul_gbytes": round(mm_gb / 1e9, 3),
            "io_gbytes": round(io_gb / 1e9, 3),
            "t_bw_ms": round(t_bw, 3), "t_flops_ms": round(t_fl, 3),
            "floor_ms": round(floor, 3),
            "bound": "bw" if t_bw >= t_fl else "flops",
            "measured_ms": ms,
            "ratio_vs_floor": round(ms / max(floor, 1e-9), 2) if ms else None,
        })
        rr = rows[-1]
        print(f"{name:24s} floor {floor:7.3f} ms ({rr['bound']})"
              + (f" | measured {ms} ms -> x{rr['ratio_vs_floor']}"
                 if ms else ""), flush=True)

    pol = r.uniform(0, 255, (B, H, W, 4)).astype(np.float32)
    add("xolp stokes fit", lambda x: xolp_from_pol(x), pol)

    xolp = np.stack([r.uniform(0, 0.9, (B, H, W)),
                     r.uniform(-1.5, 1.5, (B, H, W))], -1).astype(np.float32)
    add("fresnel priors", lambda x: normal_priors_from_xolp(x, 1.5), xolp)

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

    # joint encoder / decoder convs inherit their input dtype (the trainer
    # feeds them bf16 activations in the fast path) — cast the examples so
    # the floor reflects the production dtype
    adt = jnp.bfloat16 if dt == "bfloat16" else jnp.float32
    h8, w8 = H // 8, W // 8
    rgb8 = jnp.asarray(r.normal(0, 1, (B, h8, w8, 128)), adt)
    x8 = jnp.asarray(r.normal(0, 1, (B, h8, w8, 64)), adt)
    n8 = jnp.asarray(r.normal(0, 1, (B, h8, w8, 64)), adt)
    jenc = JointEncoder(0.0)
    jv = jenc.init({"params": rng, "dropout": rng}, rgb8[:1], x8[:1], n8[:1])
    add("joint encoder",
        lambda t: jenc.apply(jv, t[0], t[1], t[2]), (rgb8, x8, n8))

    feats = [jnp.asarray(r.normal(0, 1, (B, H // s, W // s, c)), adt)
             for s, c in ((2, 64), (4, 64), (8, 128), (16, 256), (32, 512))]
    dec = DepthDecoder((0, 1, 2, 3),
                       pad_mode="zero" if cfg.fast_decoder else "reflect")
    dv = dec.init(rng, [f[:1] for f in feats])
    add("depth decoder", lambda t: dec.apply(dv, list(t)), tuple(feats))

    out = {"config": {"h": H, "w": W, "batch": B, "dtype": dt,
                      "hbm_gbps": HBM_BW / 1e9,
                      "peak_tflops_bf16": PEAK_BF16 / 1e12},
           "measured_source": measured_src, "rows": rows}
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)

    print("\n| block | GFLOP bf16/f32 | min GB | bw floor | flop floor | "
          "bound | measured ms | x floor |")
    print("|---|---|---|---|---|---|---|---|")
    for rr in rows:
        print(f"| {rr['block']} | {rr['gflops_bf16']}/{rr['gflops_f32']} | "
              f"{max(rr['matmul_gbytes'], rr['io_gbytes'])} | "
              f"{rr['t_bw_ms']} | {rr['t_flops_ms']} | {rr['bound']} | "
              f"{rr['measured_ms']} | {rr['ratio_vs_floor']} |")
    print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
