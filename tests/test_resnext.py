"""ResNeXt101-32x8d trunk (MiDaS v2 backbone): torch-parity micro-tests and
weight-graft round-trips.

torchvision/torch.hub are unavailable here, so the torch sides are
hand-built to torchvision's exact Bottleneck semantics (groups=32 conv,
eval-mode BN), mirroring what `torch.hub.load(..., "resnext101_32x8d_wsl")`
executes in the reference (manydepth/dpt/blocks.py:133-135)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from polardepth_tpu.models.resnext import (
    GROUPS, STAGES, ResNeXt101Trunk, ResNeXtBottleneck,
    load_midas_npz, load_torch_resnext101,
)

RNG = np.random.default_rng(7)


def _t(a):
    return torch.tensor(np.ascontiguousarray(a), dtype=torch.float32)


def test_grouped_conv_matches_torch():
    """flax feature_group_count + OIHW->HWIO transpose == torch groups."""
    import flax.linen as nn
    x = RNG.normal(size=(2, 6, 8, 64)).astype(np.float32)
    w = RNG.normal(size=(64, 2, 3, 3)).astype(np.float32)  # out, in/g, kh, kw
    m = nn.Conv(64, (3, 3), padding=[(1, 1)] * 2, feature_group_count=GROUPS,
                use_bias=False)
    out = m.apply({"params": {"kernel": jnp.asarray(
        w.transpose(2, 3, 1, 0))}}, jnp.asarray(x))
    ref = F.conv2d(_t(x.transpose(0, 3, 1, 2)), _t(w), padding=1,
                   groups=GROUPS)
    np.testing.assert_allclose(np.asarray(out),
                               ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def _torch_bn(x, p, s):
    return F.batch_norm(x, _t(s["mean"]), _t(s["var"]), _t(p["scale"]),
                        _t(p["bias"]), training=False, eps=1e-5)


def test_bottleneck_matches_torch_semantics():
    """One grafted bottleneck (stride 2, projection shortcut) vs a
    hand-built torch forward in eval mode."""
    in_ch, width, out_ch, stride = 64, 32, 96, 2
    x = RNG.normal(size=(1, 8, 10, in_ch)).astype(np.float32)

    sd = {}
    sd["b.conv1.weight"] = RNG.normal(size=(width, in_ch, 1, 1)).astype(
        np.float32)
    sd["b.conv2.weight"] = RNG.normal(
        size=(width, width // GROUPS, 3, 3)).astype(np.float32)
    sd["b.conv3.weight"] = RNG.normal(size=(out_ch, width, 1, 1)).astype(
        np.float32)
    sd["b.downsample.0.weight"] = RNG.normal(
        size=(out_ch, in_ch, 1, 1)).astype(np.float32)
    for n, ch in (("bn1", width), ("bn2", width), ("bn3", out_ch),
                  ("downsample.1", out_ch)):
        sd[f"b.{n}.weight"] = RNG.normal(size=ch).astype(np.float32)
        sd[f"b.{n}.bias"] = RNG.normal(size=ch).astype(np.float32)
        sd[f"b.{n}.running_mean"] = RNG.normal(size=ch).astype(np.float32)
        sd[f"b.{n}.running_var"] = RNG.uniform(0.5, 2.0, ch).astype(
            np.float32)

    def conv(k):
        return jnp.asarray(sd[k].transpose(2, 3, 1, 0))

    def bnp(pre):
        return ({"scale": jnp.asarray(sd[f"{pre}.weight"]),
                 "bias": jnp.asarray(sd[f"{pre}.bias"])},
                {"mean": jnp.asarray(sd[f"{pre}.running_mean"]),
                 "var": jnp.asarray(sd[f"{pre}.running_var"])})

    params, stats = {}, {}
    for c in ("conv1", "conv2", "conv3"):
        params[c] = {"kernel": conv(f"b.{c}.weight")}
    for n in ("bn1", "bn2", "bn3"):
        params[n], stats[n] = bnp(f"b.{n}")
    params["downsample_conv"] = {"kernel": conv("b.downsample.0.weight")}
    params["downsample_bn"], stats["downsample_bn"] = bnp("b.downsample.1")

    m = ResNeXtBottleneck(out_ch, width, stride)
    ours = np.asarray(m.apply({"params": params, "batch_stats": stats},
                              jnp.asarray(x), train=False))

    xt = _t(x.transpose(0, 3, 1, 2))
    h = F.relu(_torch_bn(F.conv2d(xt, _t(sd["b.conv1.weight"])),
                         *[{"scale": sd["b.bn1.weight"],
                            "bias": sd["b.bn1.bias"]},
                           {"mean": sd["b.bn1.running_mean"],
                            "var": sd["b.bn1.running_var"]}]))
    h = F.relu(_torch_bn(
        F.conv2d(h, _t(sd["b.conv2.weight"]), stride=stride, padding=1,
                 groups=GROUPS),
        {"scale": sd["b.bn2.weight"], "bias": sd["b.bn2.bias"]},
        {"mean": sd["b.bn2.running_mean"], "var": sd["b.bn2.running_var"]}))
    h = _torch_bn(F.conv2d(h, _t(sd["b.conv3.weight"])),
                  {"scale": sd["b.bn3.weight"], "bias": sd["b.bn3.bias"]},
                  {"mean": sd["b.bn3.running_mean"],
                   "var": sd["b.bn3.running_var"]})
    sc = _torch_bn(F.conv2d(xt, _t(sd["b.downsample.0.weight"]),
                            stride=stride),
                   {"scale": sd["b.downsample.1.weight"],
                    "bias": sd["b.downsample.1.bias"]},
                   {"mean": sd["b.downsample.1.running_mean"],
                    "var": sd["b.downsample.1.running_var"]})
    ref = F.relu(sc + h).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)


def _fabricate_resnext_sd(rng):
    """torchvision-layout resnext101_32x8d state_dict with random values."""
    sd = {"conv1.weight": rng.normal(
        size=(64, 3, 7, 7)).astype(np.float32) * 0.05}
    for n, ch in (("bn1", 64),):
        sd[f"{n}.weight"] = np.ones(ch, np.float32)
        sd[f"{n}.bias"] = np.zeros(ch, np.float32)
        sd[f"{n}.running_mean"] = np.zeros(ch, np.float32)
        sd[f"{n}.running_var"] = np.ones(ch, np.float32)
    in_ch = 64
    for li, (out_ch, width, blocks, _) in enumerate(STAGES):
        for b in range(blocks):
            t = f"layer{li + 1}.{b}"
            cin = in_ch if b == 0 else out_ch
            sd[f"{t}.conv1.weight"] = rng.normal(
                size=(width, cin, 1, 1)).astype(np.float32) * 0.05
            sd[f"{t}.conv2.weight"] = rng.normal(
                size=(width, width // GROUPS, 3, 3)).astype(np.float32) * 0.05
            sd[f"{t}.conv3.weight"] = rng.normal(
                size=(out_ch, width, 1, 1)).astype(np.float32) * 0.05
            for n, ch in ((f"{t}.bn1", width), (f"{t}.bn2", width),
                          (f"{t}.bn3", out_ch)):
                sd[f"{n}.weight"] = np.ones(ch, np.float32)
                sd[f"{n}.bias"] = np.zeros(ch, np.float32)
                sd[f"{n}.running_mean"] = np.zeros(ch, np.float32)
                sd[f"{n}.running_var"] = np.ones(ch, np.float32)
            if b == 0:
                sd[f"{t}.downsample.0.weight"] = rng.normal(
                    size=(out_ch, cin, 1, 1)).astype(np.float32) * 0.05
                for suf, val in (("weight", np.ones), ("bias", np.zeros),
                                 ("running_mean", np.zeros),
                                 ("running_var", np.ones)):
                    sd[f"{t}.downsample.1.{suf}"] = val(out_ch, np.float32)
        in_ch = out_ch
    return sd


@pytest.fixture(scope="module")
def trunk_vars():
    m = ResNeXt101Trunk()
    v = m.init(jax.random.PRNGKey(0),
               jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    return m, v


def test_trunk_stage_shapes(trunk_vars):
    m, v = trunk_vars
    outs = m.apply(v, jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
    assert [o.shape for o in outs] == [
        (1, 16, 16, 256), (1, 8, 8, 512), (1, 4, 4, 1024), (1, 2, 2, 2048)]


def test_trunk_graft_roundtrip(trunk_vars):
    """Fabricated torchvision state_dict grafts into the exact init tree
    structure, and the grafted trunk produces finite output."""
    m, v = trunk_vars
    sd = _fabricate_resnext_sd(np.random.default_rng(1))
    params, stats = load_torch_resnext101(sd)
    ref_p = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)),
                                   v["params"])
    got_p = jax.tree_util.tree_map(lambda x: (x.shape, str(x.dtype)), params)
    assert jax.tree_util.tree_structure(ref_p) == \
        jax.tree_util.tree_structure(got_p)
    assert ref_p == got_p
    ref_s = jax.tree_util.tree_map(lambda x: x.shape, v["batch_stats"])
    got_s = jax.tree_util.tree_map(lambda x: x.shape, stats)
    assert ref_s == got_s
    out = m.apply({"params": params, "batch_stats": stats},
                  jnp.full((1, 64, 64, 3), 0.5, jnp.float32), train=False)
    assert all(np.isfinite(np.asarray(o)).all() for o in out)
    # orientation check: conv kernels really transposed (OIHW -> HWIO)
    np.testing.assert_array_equal(
        np.asarray(params["stem_conv"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0))


def test_midasnet_resnext_forward_and_graft():
    from polardepth_tpu.models.dpt import MidasNet
    m = MidasNet()
    x = jnp.full((1, 64, 64, 3), 0.4, jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out)).all()

    # full MiDaS-v21-style checkpoint: pretrained.* + scratch.*
    rng = np.random.default_rng(2)
    sd = {}
    for k, val in _fabricate_resnext_sd(rng).items():
        if k.startswith("conv1."):
            sd["pretrained.layer1.0." + k.split(".", 1)[1]] = val
        elif k.startswith("bn1."):
            sd["pretrained.layer1.1." + k.split(".", 1)[1]] = val
        elif k.startswith("layer1."):
            sd["pretrained.layer1.4." + k.split(".", 1)[1]] = val
        else:
            sd["pretrained." + k] = val
    chans = (256, 512, 1024, 2048)
    for n in range(1, 5):
        sd[f"scratch.layer{n}_rn.weight"] = rng.normal(
            size=(256, chans[n - 1], 3, 3)).astype(np.float32) * 0.02
        for mm in (1, 2):
            for c in (1, 2):
                base = f"scratch.refinenet{n}.resConfUnit{mm}.conv{c}"
                sd[f"{base}.weight"] = rng.normal(
                    size=(256, 256, 3, 3)).astype(np.float32) * 0.02
                sd[f"{base}.bias"] = np.zeros(256, np.float32)
    for idx, (o, i, k) in ((0, (128, 256, 3)), (2, (32, 128, 3)),
                           (4, (1, 32, 1))):
        sd[f"scratch.output_conv.{idx}.weight"] = rng.normal(
            size=(o, i, k, k)).astype(np.float32) * 0.02
        sd[f"scratch.output_conv.{idx}.bias"] = np.zeros(o, np.float32)

    p2, s2 = load_midas_npz(dict(v["params"]), dict(v["batch_stats"]), sd,
                            log=lambda *_: None)
    ref = jax.tree_util.tree_map(lambda x: x.shape, dict(v["params"]))
    got = jax.tree_util.tree_map(lambda x: x.shape, p2)
    assert ref == got
    out2 = m.apply({"params": p2, "batch_stats": s2}, x, train=False)
    assert out2.shape == (1, 64, 64, 1)
    assert np.isfinite(np.asarray(out2)).all()
    # scratch really landed: head1 kernel equals the transposed source
    np.testing.assert_array_equal(
        np.asarray(p2["head1"]["Conv_0"]["kernel"]),
        sd["scratch.output_conv.0.weight"].transpose(2, 3, 1, 0))
