"""DPT pretrained-weight path: torch-layout parity micro-tests and the
npz graft round-trip (scripts/convert_torch_dpt.py + models/dpt_weights.py).

timm itself is unavailable here, so the torch sides of the parity tests are
hand-built to timm's exact semantics (StdConv2dSame eps=1e-8, GroupNorm(32),
non-preact ResNetV2 bottleneck, ViT block with exact-erf GELU) — mirroring
what `timm.create_model("vit_base_resnet50_384")` executes in the reference
(manydepth/dpt/vit.py:494-513)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from polardepth_tpu.models.dpt import (
    BottleneckV2, DPTDepthModel, ResNetV2Trunk, StdConv, _Block,
)
from polardepth_tpu.models.dpt_weights import (
    fabricate_source, load_dpt_npz, resize_pos_embed, source_entry,
)

RNG = np.random.default_rng(42)


def _t(a):
    return torch.tensor(np.ascontiguousarray(a), dtype=torch.float32)


def _std_weight(w, eps=1e-8):
    """timm StdConv2d: standardize over (in, kh, kw) with biased variance."""
    mu = w.mean(dim=(1, 2, 3), keepdim=True)
    var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
    return (w - mu) / torch.sqrt(var + eps)


def _same_pad(x, k, s):
    """TF/timm 'same' padding amounts for kernel k stride s."""
    ih, iw = x.shape[-2:]
    ph = max((-(-ih // s) - 1) * s + k - ih, 0)
    pw = max((-(-iw // s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


def _torch_stdconv(x, w, k, s):
    return F.conv2d(_same_pad(x, k, s), _std_weight(w), stride=s)


def test_stdconv_matches_timm_semantics():
    x = RNG.normal(size=(2, 8, 10, 12)).astype(np.float32)  # NHWC
    for k, s, cin, cout in ((3, 1, 12, 5), (3, 2, 12, 5), (7, 2, 12, 6),
                            (1, 1, 12, 4), (1, 2, 12, 4)):
        w = RNG.normal(size=(cout, cin, k, k)).astype(np.float32)  # OIHW
        m = StdConv(cout, k, s)
        vars_ = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0))}}
        ours = np.asarray(m.apply(vars_, jnp.asarray(x)))
        ref = _torch_stdconv(_t(x.transpose(0, 3, 1, 2)), _t(w), k, s)
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-4)


def _torch_bottleneck(x, p, stride):
    """Non-preact ResNetV2 bottleneck exactly as timm instantiates it for
    the hybrid (StdConv + GroupNorm(32)+ReLU, stride on conv2)."""
    def gn(h, w, b):
        return F.group_norm(h, 32, w, b, eps=1e-5)
    if "downsample_conv" in p:
        sc = F.conv2d(_same_pad(x, 1, stride),
                      _std_weight(p["downsample_conv"]), stride=stride)
        sc = gn(sc, p["downsample_norm_w"], p["downsample_norm_b"])
    else:
        sc = x
    h = F.relu(gn(_torch_stdconv(x, p["conv1"], 1, 1),
                  p["norm1_w"], p["norm1_b"]))
    h = F.relu(gn(_torch_stdconv(h, p["conv2"], 3, stride),
                  p["norm2_w"], p["norm2_b"]))
    h = gn(_torch_stdconv(h, p["conv3"], 1, 1), p["norm3_w"], p["norm3_b"])
    return F.relu(sc + h)


@pytest.mark.parametrize("stride", [1, 2])
def test_bottleneckv2_matches_torch(stride):
    cin, mid, cout = 64, 32, 128
    x = RNG.normal(size=(1, 8, 8, cin)).astype(np.float32)
    m = BottleneckV2(cout, mid, stride)
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(x))

    tp, fp = {}, vars_["params"]
    for name, shape in (("conv1", (mid, cin, 1, 1)),
                        ("conv2", (mid, mid, 3, 3)),
                        ("conv3", (cout, mid, 1, 1)),
                        ("downsample_conv", (cout, cin, 1, 1))):
        w = RNG.normal(size=shape).astype(np.float32)
        tp[name] = _t(w)
        fp[name]["kernel"] = jnp.asarray(w.transpose(2, 3, 1, 0))
    for norm in ("norm1", "norm2", "norm3", "downsample_norm"):
        ch = fp[norm]["scale"].shape[0]
        wv = RNG.normal(size=ch).astype(np.float32)
        bv = RNG.normal(size=ch).astype(np.float32)
        tp[f"{norm}_w"], tp[f"{norm}_b"] = _t(wv), _t(bv)
        fp[norm]["scale"], fp[norm]["bias"] = jnp.asarray(wv), jnp.asarray(bv)

    ours = np.asarray(m.apply({"params": fp}, jnp.asarray(x)))
    ref = _torch_bottleneck(_t(x.transpose(0, 3, 1, 2)), tp, stride)
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_vit_block_matches_torch():
    """Full transformer block vs a hand-built timm-exact torch block
    (LN eps 1e-6, fused qkv with timm's reshape, exact-erf GELU)."""
    dim, heads, n = 32, 4, 7
    x = RNG.normal(size=(2, n, dim)).astype(np.float32)
    m = _Block(dim, heads)
    vars_ = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    fp = vars_["params"]

    w = {k: RNG.normal(size=s).astype(np.float32) * 0.1 for k, s in [
        ("qkv_w", (3 * dim, dim)), ("qkv_b", (3 * dim,)),
        ("proj_w", (dim, dim)), ("proj_b", (dim,)),
        ("fc1_w", (4 * dim, dim)), ("fc1_b", (4 * dim,)),
        ("fc2_w", (dim, 4 * dim)), ("fc2_b", (dim,)),
        ("ln1_w", (dim,)), ("ln1_b", (dim,)),
        ("ln2_w", (dim,)), ("ln2_b", (dim,))]}
    fp["attn"]["qkv"] = {"kernel": jnp.asarray(w["qkv_w"].T),
                         "bias": jnp.asarray(w["qkv_b"])}
    fp["attn"]["proj"] = {"kernel": jnp.asarray(w["proj_w"].T),
                          "bias": jnp.asarray(w["proj_b"])}
    fp["fc1"] = {"kernel": jnp.asarray(w["fc1_w"].T),
                 "bias": jnp.asarray(w["fc1_b"])}
    fp["fc2"] = {"kernel": jnp.asarray(w["fc2_w"].T),
                 "bias": jnp.asarray(w["fc2_b"])}
    fp["norm1"] = {"scale": jnp.asarray(w["ln1_w"]),
                   "bias": jnp.asarray(w["ln1_b"])}
    fp["norm2"] = {"scale": jnp.asarray(w["ln2_w"]),
                   "bias": jnp.asarray(w["ln2_b"])}
    ours = np.asarray(m.apply({"params": fp}, jnp.asarray(x)))

    xt = _t(x)
    h = F.layer_norm(xt, (dim,), _t(w["ln1_w"]), _t(w["ln1_b"]), eps=1e-6)
    qkv = F.linear(h, _t(w["qkv_w"]), _t(w["qkv_b"]))
    B, N = 2, n
    hd = dim // heads
    qkv = qkv.reshape(B, N, 3, heads, hd).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = (q @ k.transpose(-2, -1)) * hd ** -0.5
    attn = attn.softmax(dim=-1)
    out = (attn @ v).transpose(1, 2).reshape(B, N, dim)
    xt = xt + F.linear(out, _t(w["proj_w"]), _t(w["proj_b"]))
    h = F.layer_norm(xt, (dim,), _t(w["ln2_w"]), _t(w["ln2_b"]), eps=1e-6)
    h = F.linear(h, _t(w["fc1_w"]), _t(w["fc1_b"]))
    h = F.gelu(h)  # torch default = exact erf
    xt = xt + F.linear(h, _t(w["fc2_w"]), _t(w["fc2_b"]))
    np.testing.assert_allclose(ours, xt.numpy(), rtol=1e-4, atol=1e-5)


def test_conv_transpose_mapping_exact():
    """The converter's ConvTranspose2d layout (spatial flip + (2,3,0,1))
    must be bit-parity with torch for the x4/x2 reassemble upsampling."""
    import flax.linen as fnn
    for k in (2, 4):
        x = RNG.normal(size=(1, 3, 5, 4)).astype(np.float32)
        w = RNG.normal(size=(4, 6, k, k)).astype(np.float32)
        b = RNG.normal(size=(6,)).astype(np.float32)
        ref = F.conv_transpose2d(_t(x.transpose(0, 3, 1, 2)), _t(w), _t(b),
                                 stride=k).numpy().transpose(0, 2, 3, 1)
        m = fnn.ConvTranspose(6, (k, k), strides=(k, k))
        kern = np.ascontiguousarray(
            w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))
        out = m.apply({"params": {"kernel": jnp.asarray(kern),
                                  "bias": jnp.asarray(b)}}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5,
                                   atol=1e-5)


def test_resnetv2_trunk_shapes():
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    m = ResNetV2Trunk()
    vars_ = m.init(jax.random.PRNGKey(0), x)
    s0, s1, s2 = m.apply(vars_, x)
    assert s0.shape == (1, 16, 24, 256)   # 1/4
    assert s1.shape == (1, 8, 12, 512)    # 1/8
    assert s2.shape == (1, 4, 6, 1024)    # 1/16
    # stage block counts: (3, 4, 9) like ResNet50 / timm (3,4,9) hybrid
    names = set(vars_["params"].keys())
    assert "stage2_block8" in names and "stage2_block9" not in names


@pytest.fixture(scope="module")
def hybrid_model():
    m = DPTDepthModel(backbone="vitb_rn50")
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    return m, vars_


def test_hybrid_graft_roundtrip(hybrid_model):
    """fabricate_source builds a torch-layout state_dict with the exact
    keys the converter dumps; load_dpt_npz must graft every backbone AND
    scratch array (shape-checked) and the orientation must round-trip."""
    m, vars_ = hybrid_model
    src = fabricate_source(vars_["params"])
    assert "patch_embed.backbone.stem.conv.weight" in src
    assert "blocks.11.attn.qkv.weight" in src
    # (refinenet4 takes no skip input, so its resConfUnit1 — an unused
    # module in the reference too — has no flax counterpart)
    assert "scratch.refinenet3.resConfUnit1.conv1.weight" in src
    assert "scratch.output_conv.4.weight" in src

    logs = []
    new = load_dpt_npz(vars_["params"], src, grid_hw=(2, 3),
                       log=logs.append)
    assert "0 kept at init" in logs[0]

    # orientation spot checks
    np.testing.assert_allclose(
        np.asarray(new["trunk"]["stem_conv"]["kernel"]),
        src["patch_embed.backbone.stem.conv.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(new["block3"]["attn"]["qkv"]["kernel"]),
        src["blocks.3.attn.qkv.weight"].T)
    # hybrid slot 3: the stride-2 conv (act_postprocess4.4)
    np.testing.assert_allclose(
        np.asarray(new["downsample3"]["Conv_0"]["kernel"]),
        src["act_postprocess4.4.weight"].transpose(2, 3, 1, 0))

    # grafted model still runs
    out = m.apply({"params": new}, jnp.asarray(
        RNG.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32)))
    assert out.shape == (1, 32, 48, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_vitb16_graft_covers_conv_transpose(hybrid_model):
    """The plain-ViT variant routes slots 0/1 through ConvTranspose
    upsampling; its graft must map act_postprocess{1,2}.4 with the verified
    flip+transpose orientation."""
    del hybrid_model  # unrelated; keeps collection order stable
    m = DPTDepthModel(backbone="vitb16")
    x = jnp.zeros((1, 32, 48, 3), jnp.float32)
    vars_ = m.init(jax.random.PRNGKey(1), x)
    src = fabricate_source(vars_["params"])
    assert "act_postprocess1.4.weight" in src
    new = load_dpt_npz(vars_["params"], src, grid_hw=(2, 3),
                       log=lambda *_: None)
    np.testing.assert_allclose(
        np.asarray(new["upsample0"]["kernel"]),
        src["act_postprocess1.4.weight"][:, :, ::-1, ::-1]
        .transpose(2, 3, 0, 1))


def test_backbone_only_source_keeps_scratch(hybrid_model):
    """A timm backbone-only dump must load the backbone and leave scratch
    at its fresh init (the reference trains scratch from scratch)."""
    m, vars_ = hybrid_model
    src = {k: v for k, v in fabricate_source(vars_["params"]).items()
           if not (k.startswith("scratch.") or
                   k.startswith("act_postprocess"))}
    logs = []
    new = load_dpt_npz(vars_["params"], src, grid_hw=(2, 3),
                       log=logs.append)
    np.testing.assert_allclose(
        np.asarray(new["refinenet4"]["out_conv"]["Conv_0"]["kernel"]),
        np.asarray(vars_["params"]["refinenet4"]["out_conv"]["Conv_0"]
                   ["kernel"]))
    np.testing.assert_allclose(
        np.asarray(new["trunk"]["stem_conv"]["kernel"]),
        src["patch_embed.backbone.stem.conv.weight"].transpose(2, 3, 1, 0))


def test_missing_backbone_key_raises(hybrid_model):
    m, vars_ = hybrid_model
    src = fabricate_source(vars_["params"])
    del src["blocks.5.attn.qkv.weight"]
    with pytest.raises(KeyError):
        load_dpt_npz(vars_["params"], src, grid_hw=(2, 3),
                     log=lambda *_: None)


def test_pos_embed_grid_resize():
    """577-token (24x24 + cls) source resizes to an arbitrary grid with the
    cls slot preserved."""
    pos = RNG.normal(size=(1, 24 * 24 + 1, 8)).astype(np.float32)
    out = resize_pos_embed(pos, (2, 3))
    assert out.shape == (1, 7, 8)
    np.testing.assert_allclose(out[:, 0], pos[:, 0])
    # constant field stays constant under bilinear resize
    const = np.concatenate([pos[:, :1],
                            np.ones((1, 576, 8), np.float32)], axis=1)
    np.testing.assert_allclose(resize_pos_embed(const, (5, 4))[:, 1:], 1.0,
                               rtol=1e-6)


def test_source_entry_covers_all_hybrid_params(hybrid_model):
    """Every parameter of the hybrid model must have a torch counterpart
    (nothing silently skipped by the converter mapping)."""
    m, vars_ = hybrid_model
    unmapped = []
    for path, _ in jax.tree_util.tree_flatten_with_path(
            vars_["params"])[0]:
        tup = tuple(str(getattr(p, "key", p)) for p in path)
        if source_entry(tup) is None:
            unmapped.append("/".join(tup))
    assert not unmapped, unmapped
