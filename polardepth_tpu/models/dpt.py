"""DPT (Dense Prediction Transformer) depth backbone — the --train_dpt path.

Re-design of the reference's vendored DPT/MiDaS stack (manydepth/dpt/:
models.py:26-123, blocks.py, vit.py) as native flax: a ViT encoder with
reassemble hooks, RefineNet-style fusion blocks, and the monocular depth
head.  The reference pulls its backbones from timm (unavailable here), so
the transformer AND the hybrid's ResNetV2-50 trunk are implemented
directly; supported variants mirror the reference's factory names:

  vitb16:        ViT-B/16, hooks [2, 5, 8, 11], reassemble [96,192,384,768]
                 (dpt/vit.py:_make_pretrained_vitb16_384)
  vitl16:        ViT-L/16, hooks [5, 11, 17, 23], reassemble
                 [256,512,1024,1024]  (dpt/vit.py:_make_pretrained_vitl16_384)
  vitb_rn50:     the trainer's default (manydepth/trainer.py:161-167):
                 ResNetV2-50 trunk (timm vit_base_resnet50_384: BiT-style
                 weight-standardized convs + GroupNorm(32), stages (3,4,9))
                 whose stage-0/1 outputs (256ch@1/4, 512ch@1/8) feed the
                 first two reassemble slots directly, + ViT-B blocks with
                 hooks [8, 11] for the last two
                 (dpt/vit.py:_make_vit_b_rn50_backbone:351-494)

Structure per DPT paper + reference blocks:
  tokens -> [hook h] -> readout('project': concat cls -> linear -> gelu)
         -> unflatten -> 1x1 conv to the reassemble width
         -> ConvTranspose x4 / x2, identity, or stride-2 conv 3x3
            (act_postprocess1..4, vit.py:221-350/440-494)
         -> 3x3 conv to 256 ("scratch.layerN_rn", blocks.py:12-117)
  fusion: from deepest, x + RCU(skip) -> RCU -> bilinear x2 -> 1x1 out conv
          (FeatureFusionBlock_custom, dpt/blocks.py:318-383)
  head: conv3x3 256->128 -> x2 upsample -> conv3x3 ->32 -> relu -> conv1x1
        ->1 -> relu (non_negative)  (dpt/models.py:DPTDepthModel)

Every submodule is explicitly named so converted timm/MiDaS torch weights
graft deterministically (scripts/convert_torch_dpt.py +
models.load_dpt_npz).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from polardepth_tpu.models.layers import TorchConv
from polardepth_tpu.ops.resize import resize_bilinear

VARIANTS = {
    "vitb16": dict(depth=12, dim=768, heads=12, hooks=(2, 5, 8, 11),
                   reassemble=(96, 192, 384, 768), hybrid=False),
    "vitl16": dict(depth=24, dim=1024, heads=16, hooks=(5, 11, 17, 23),
                   reassemble=(256, 512, 1024, 1024), hybrid=False),
    "vitb_rn50": dict(depth=12, dim=768, heads=12, hooks=(0, 1, 8, 11),
                      reassemble=(256, 512, 768, 768), hybrid=True),
}
FEATURE_CH = 256
RESNET_STAGES = ((256, 64, 3, 1), (512, 128, 4, 2), (1024, 256, 9, 2))


class StdConv(nn.Module):
    """Weight-standardized SAME conv, no bias (timm StdConv2dSame, eps=1e-8;
    the conv layer of the BiT ResNetV2 trunk)."""

    features: int
    kernel_size: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.he_normal(), (k, k, x.shape[-1],
                                                    self.features))
        kernel = kernel.astype(jnp.float32)
        mu = kernel.mean(axis=(0, 1, 2), keepdims=True)
        var = kernel.var(axis=(0, 1, 2), keepdims=True)
        kernel = ((kernel - mu) / jnp.sqrt(var + 1e-8)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, kernel, (self.strides, self.strides), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class BottleneckV2(nn.Module):
    """Non-preact ResNetV2 bottleneck: StdConv + GroupNorm(32)+ReLU, stride
    on the 3x3, 1x1+GN projection shortcut (timm resnetv2.Bottleneck as
    instantiated by vit_base_resnet50_384)."""

    out_ch: int
    mid_ch: int
    strides: int = 1

    @nn.compact
    def __call__(self, x):
        gn = lambda name: nn.GroupNorm(num_groups=32, epsilon=1e-5,  # noqa: E731
                                       dtype=x.dtype, name=name)
        if self.strides != 1 or x.shape[-1] != self.out_ch:
            sc = StdConv(self.out_ch, 1, self.strides,
                         name="downsample_conv")(x)
            sc = gn("downsample_norm")(sc)
        else:
            sc = x
        h = nn.relu(gn("norm1")(StdConv(self.mid_ch, 1, name="conv1")(x)))
        h = nn.relu(gn("norm2")(StdConv(self.mid_ch, 3, self.strides,
                                        name="conv2")(h)))
        h = gn("norm3")(StdConv(self.out_ch, 1, name="conv3")(h))
        return nn.relu(sc + h)


class ResNetV2Trunk(nn.Module):
    """The vitb_rn50_384 hybrid's conv trunk: 7x7/2 stem + 3x3/2 maxpool +
    stages (3,4,9); returns the three stage outputs
    (256@1/4, 512@1/8, 1024@1/16)."""

    @nn.compact
    def __call__(self, x):
        x = StdConv(64, 7, 2, name="stem_conv")(x)
        x = nn.relu(nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=x.dtype,
                                 name="stem_norm")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        outs = []
        for s, (out_ch, mid_ch, blocks, stride) in enumerate(RESNET_STAGES):
            for b in range(blocks):
                x = BottleneckV2(out_ch, mid_ch, stride if b == 0 else 1,
                                 name=f"stage{s}_block{b}")(x)
            outs.append(x)
        return outs


class _Attention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=x.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.heads, hd), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(hd)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, self.dim)
        return nn.Dense(self.dim, dtype=x.dtype, name="proj")(out)


class _Block(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        x = x + _Attention(self.dim, self.heads, name="attn")(
            nn.LayerNorm(dtype=x.dtype, name="norm1")(x))
        h = nn.LayerNorm(dtype=x.dtype, name="norm2")(x)
        h = nn.Dense(4 * self.dim, dtype=x.dtype, name="fc1")(h)
        h = nn.gelu(h, approximate=False)  # timm uses exact-erf GELU
        h = nn.Dense(self.dim, dtype=x.dtype, name="fc2")(h)
        return x + h


class _ResidualConvUnit(nn.Module):
    """relu->conv3x3[->BN]->relu->conv3x3[->BN] + skip (blocks.py:247-316).

    use_bn mirrors ResidualConvUnit_custom(bn=True): convs drop their bias
    and each is followed by BatchNorm (the segmentation model's fusion
    blocks run with bn=True via DPT(use_bn=True), dpt/models.py:131)."""

    features: int = FEATURE_CH
    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.relu(x)
        h = TorchConv(self.features, 3, padding=1,
                      use_bias=not self.use_bn, name="conv1")(h)
        if self.use_bn:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name="bn1")(h)
        h = nn.relu(h)
        h = TorchConv(self.features, 3, padding=1,
                      use_bias=not self.use_bn, name="conv2")(h)
        if self.use_bn:
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name="bn2")(h)
        return x + h


class _FusionBlock(nn.Module):
    """RefineNet fusion (FeatureFusionBlock_custom, blocks.py:318-383)."""

    features: int = FEATURE_CH
    use_bn: bool = False

    @nn.compact
    def __call__(self, deeper, skip=None, train: bool = False):
        x = deeper
        if skip is not None:
            # odd grid sizes can make the strided-conv pyramid off-by-one;
            # align the deeper path to the skip's resolution first
            if x.shape[1:3] != skip.shape[1:3]:
                x = resize_bilinear(x, skip.shape[1:3])
            x = x + _ResidualConvUnit(self.features, self.use_bn,
                                      name="resConfUnit1")(skip, train)
        x = _ResidualConvUnit(self.features, self.use_bn,
                              name="resConfUnit2")(x, train)
        # reference DPT upsamples with bilinear align_corners=True
        # (dpt/blocks.py:378); required for output parity with grafted
        # MiDaS/timm DPT checkpoints
        h, w = x.shape[1:3]
        x = resize_bilinear(x, (2 * h, 2 * w), align_corners=True)
        return TorchConv(self.features, 1, name="out_conv")(x)


def _dpt_backbone(m: nn.Module, x: jnp.ndarray, train: bool = False,
                  use_bn: bool = False) -> jnp.ndarray:
    """Shared DPT trunk: ViT(+hybrid ResNetV2) encoder, reassemble,
    RefineNet fusion.  Returns the 1/2-resolution FEATURE_CH map that both
    the depth head (DPTDepthModel) and the segmentation head
    (DPTSegmentationModel) consume (reference DPT.forward path_1,
    dpt/models.py:71-86).  Runs inside the caller's @nn.compact context so
    submodule names (and thus grafted torch checkpoints) are identical for
    both heads."""
    spec = VARIANTS[m.backbone]
    dim, heads, depth = spec["dim"], spec["heads"], spec["depth"]
    hooks, reassemble = spec["hooks"], spec["reassemble"]
    hybrid = m.hybrid or spec["hybrid"]
    if hybrid and not spec["hybrid"]:
        reassemble = VARIANTS["vitb_rn50"]["reassemble"]
    b, H, W, _ = x.shape
    assert H % 16 == 0 and W % 16 == 0, "DPT needs multiples of 16"
    gh, gw = H // 16, W // 16

    # DPT input normalization: mean=std=0.5 (dpt/models.py net_w/h)
    x = ((x - 0.5) / 0.5).astype(m.compute_dtype)

    hybrid_feats = []
    if hybrid:
        s0, s1, s2 = ResNetV2Trunk(name="trunk")(x)
        hybrid_feats = [s0, s1]  # 256@1/4, 512@1/8, used directly
        # patch_embed.proj is 1x1 on the 1024ch 1/16 stage output
        tokens = nn.Conv(dim, (1, 1), dtype=s2.dtype,
                         name="patch_proj")(s2).reshape(b, gh * gw, dim)
    else:
        tokens = nn.Conv(dim, (16, 16), strides=(16, 16), dtype=x.dtype,
                         name="patch_proj")(x).reshape(b, gh * gw, dim)

    cls = m.param("cls_token", nn.initializers.zeros, (1, 1, dim))
    pos = m.param("pos_embed",
                  nn.initializers.normal(0.02),
                  (1, gh * gw + 1, dim))
    tokens = jnp.concatenate(
        [jnp.broadcast_to(cls, (b, 1, dim)).astype(tokens.dtype), tokens],
        axis=1) + pos.astype(tokens.dtype)

    saved = {}
    n_vit_slots = 2 if hybrid else 4
    vit_hooks = hooks[-n_vit_slots:]
    for i in range(depth):
        tokens = _Block(dim, heads, name=f"block{i}")(tokens)
        if i in vit_hooks:
            saved[i] = tokens
    # (hooks capture block outputs; timm's final LN is not applied to
    # hooked activations — vit.py:forward_flex)

    feats = []
    for slot, hk in enumerate(vit_hooks):
        slot_global = slot + (2 if hybrid else 0)
        t = saved[hk]
        spatial = t[:, 1:]
        readout = t[:, :1]
        # 'project' readout: concat cls -> linear -> gelu (vit.py:57-91)
        merged = jnp.concatenate(
            [spatial, jnp.broadcast_to(readout, spatial.shape)], axis=-1)
        merged = nn.gelu(nn.Dense(dim, dtype=t.dtype,
                                  name=f"readout{slot_global}")(merged),
                         approximate=False)
        fmap = merged.reshape(b, gh, gw, dim)
        fmap = TorchConv(reassemble[slot_global], 1,
                         name=f"reassemble{slot_global}")(fmap)
        scale = (4, 2, 1, 0)[slot_global]
        if scale > 1:
            # learned upsampling: ConvTranspose kxk stride k
            # (act_postprocess1/2's ConvTranspose2d, vit.py:246-276)
            fmap = nn.ConvTranspose(
                reassemble[slot_global], (scale, scale),
                strides=(scale, scale), dtype=fmap.dtype,
                name=f"upsample{slot_global}")(fmap)
        elif scale == 0:
            fmap = TorchConv(reassemble[3], 3, strides=2, padding=1,
                             name="downsample3")(fmap)
        feats.append(fmap)
    if hybrid:
        # act_postprocess1/2 are Identity for the hybrid (vit.py:440-446)
        feats = hybrid_feats + feats

    # scratch.layerN_rn 3x3 convs to the common width (blocks.py:91-117)
    rn = [TorchConv(FEATURE_CH, 3, padding=1, use_bias=False,
                    name=f"layer{i + 1}_rn")(f)
          for i, f in enumerate(feats)]

    # RefineNet fusion, deepest first (models.py:97-103)
    path = _FusionBlock(use_bn=use_bn, name="refinenet4")(rn[3], train=train)
    path = _FusionBlock(use_bn=use_bn, name="refinenet3")(path, rn[2], train)
    path = _FusionBlock(use_bn=use_bn, name="refinenet2")(path, rn[1], train)
    path = _FusionBlock(use_bn=use_bn, name="refinenet1")(path, rn[0], train)
    return path  # (B, H/2, W/2, FEATURE_CH)


class DPTDepthModel(nn.Module):
    """Input (B, H, W, 3) in [0, 1] -> non-negative depth (B, H, W, 1).

    `backbone="vitb16"|"vitl16"|"vitb_rn50"`; `hybrid=True` forces the
    ResNetV2-50 trunk regardless of name (backward compat: vitb16+hybrid
    == vitb_rn50 topology with vitb16 hook indices for the ViT slots)."""

    backbone: str = "vitb16"
    non_negative: bool = True
    hybrid: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1:3]
        path = _dpt_backbone(self, x, train=train)

        # head (models.py:DPTDepthModel head Sequential; its Interpolate is
        # bilinear align_corners=True, models.py:101)
        h = TorchConv(128, 3, padding=1, name="head1")(path)
        h = resize_bilinear(h, (H, W), align_corners=True)
        h = TorchConv(32, 3, padding=1, name="head2")(h)
        h = nn.relu(h)
        # zero bias: with torch's U(+-1/sqrt(32)) bias a negative draw can
        # exceed the whole incoming signal scale at init and the
        # non_negative ReLU goes uniformly dead (zero grads everywhere) —
        # an init-luck failure mode the reference avoids only because its
        # DPT backbones load timm-pretrained weights.
        h = TorchConv(1, 1, name="head3", zero_bias=True)(h)
        if self.non_negative:
            h = nn.relu(h)
        return h.astype(jnp.float32)


class DPTSegmentationModel(nn.Module):
    """DPT with the semantic-segmentation head (dpt/models.py:126-153):
    BN-enabled fusion blocks (DPT(use_bn=True)) and a
    conv3x3(no bias)->BN->ReLU->Dropout(0.1)->conv1x1->x2-bilinear head.
    Input (B, H, W, 3) in [0, 1] -> logits (B, H, W, num_classes).

    The reference also constructs an `auxlayer` head that its forward
    never calls (models.py:144-151) — dead weight, not instantiated here
    (same policy as the deepest fusion block's unused resConfUnit1)."""

    num_classes: int = 150
    backbone: str = "vitb_rn50"
    hybrid: bool = False
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1:3]
        path = _dpt_backbone(self, x, train=train, use_bn=True)
        h = TorchConv(FEATURE_CH, 3, padding=1, use_bias=False,
                      name="seg_conv1")(path)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="seg_bn")(h)
        h = nn.relu(h)
        h = nn.Dropout(0.1, deterministic=not train, name="seg_drop")(h)
        h = TorchConv(self.num_classes, 1, name="seg_conv2")(h)
        # head's Interpolate(scale_factor=2, align_corners=True):
        # 1/2-res path -> full resolution (models.py:139)
        h = resize_bilinear(h, (H, W), align_corners=True)
        return h.astype(jnp.float32)


class _PlainFusionBlock(nn.Module):
    """MiDaS v2 FeatureFusionBlock (blocks.py:213-244): plain RCUs, no
    output conv, bilinear x2 with align_corners=True."""

    features: int = FEATURE_CH

    @nn.compact
    def __call__(self, deeper, skip=None):
        x = deeper
        if skip is not None:
            if x.shape[1:3] != skip.shape[1:3]:
                x = resize_bilinear(x, skip.shape[1:3])
            x = x + _ResidualConvUnit(self.features,
                                      name="resConfUnit1")(skip)
        x = _ResidualConvUnit(self.features, name="resConfUnit2")(x)
        h, w = x.shape[1:3]
        return resize_bilinear(x, (2 * h, 2 * w), align_corners=True)


class MidasNet(nn.Module):
    """MiDaS v2 "large" (reference dpt/midas_net.py:12-77): ResNeXt101-32x8d
    trunk (the torch.hub WSL model, implemented natively in
    models/resnext.py) + plain refinenet decoder + conv head.

    backbone="resnet18" substitutes the framework's light encoder — kept
    for cheap smoke tests; the reference-parity trunk is the default.
    Pretrained torch weights graft via models.resnext.load_torch_resnext101
    (trunk) / load_midas_npz (full MiDaS v2.1 checkpoint)."""

    non_negative: bool = True
    compute_dtype: str = "float32"
    backbone: str = "resnext101_wsl"

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, H, W, _ = x.shape
        if self.backbone == "resnext101_wsl":
            from polardepth_tpu.models.resnext import ResNeXt101Trunk
            feats = ResNeXt101Trunk(self.compute_dtype,
                                    name="trunk")(x, train)   # 1/4 .. 1/32
        else:
            from polardepth_tpu.models.resnet import ResNet18Encoder
            feats = ResNet18Encoder(1, self.compute_dtype)(x, train)[1:]
        rn = [TorchConv(FEATURE_CH, 3, padding=1, use_bias=False,
                        name=f"layer{i + 1}_rn")(f)
              for i, f in enumerate(feats)]
        path = _PlainFusionBlock(name="refinenet4")(rn[3])
        path = _PlainFusionBlock(name="refinenet3")(path, rn[2])
        path = _PlainFusionBlock(name="refinenet2")(path, rn[1])
        path = _PlainFusionBlock(name="refinenet1")(path, rn[0])  # 1/2 res
        h = TorchConv(128, 3, padding=1, name="head1")(path)
        h = resize_bilinear(h, (H, W))
        h = TorchConv(32, 3, padding=1, name="head2")(h)
        h = nn.relu(h)
        h = TorchConv(1, 1, name="head3", zero_bias=True)(h)  # see DPT head
        if self.non_negative:
            h = nn.relu(h)
        return h.astype(jnp.float32)
