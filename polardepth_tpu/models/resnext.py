"""ResNeXt101-32x8d trunk — the MiDaS v2 "large" backbone.

The reference's MidasNet_large pulls `resnext101_32x8d_wsl` from torch.hub
(/root/reference/manydepth/dpt/blocks.py:133-135) and taps the four stage
outputs (256/512/1024/2048 ch at 1/4..1/32, blocks.py:55-59,120-131).
Neither torch.hub nor network access exists on the TPU host, so the
architecture is implemented here natively (torchvision ResNeXt Bottleneck:
1x1 -> grouped 3x3 (groups=32, width 8 per group) -> 1x1, BN after each,
projection shortcut on the first block of each stage) and pretrained
weights graft from an offline state_dict dump via `load_torch_resnext101`
(scripts/convert_torch_dpt.py --pt / --hub).

Every submodule is explicitly named so the graft is deterministic:
  stem_conv, stem_bn, layer{1..4}_block{b}/{conv1,bn1,conv2,bn2,conv3,bn3,
  downsample_conv,downsample_bn}.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from polardepth_tpu.models.layers import resnet_kernel_init

# (planes_out, width, blocks, stride) per stage; width = planes*(8/64)*32
STAGES = ((256, 256, 3, 1), (512, 512, 4, 2),
          (1024, 1024, 23, 2), (2048, 2048, 3, 2))
GROUPS = 32

# ImageNet normalization (torchvision / MiDaS NormalizeImage,
# dpt/transforms.py).  The reference trainer feeds raw [0,1] frames even to
# the WSL trunk — an omission on its side; pretrained weights expect this.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _bn(x, train: bool, name: str):
    """torch BatchNorm2d defaults (eps=1e-5, momentum 0.1 -> flax 0.9)."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=x.dtype, name=name)(x)


class ResNeXtBottleneck(nn.Module):
    """torchvision Bottleneck with groups (resnet.py in torchvision):
    relu(bn1(1x1)) -> relu(bn2(grouped 3x3, stride)) -> bn3(1x1) + shortcut.
    """

    out_ch: int
    width: int
    strides: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.strides != 1 or x.shape[-1] != self.out_ch:
            sc = nn.Conv(self.out_ch, (1, 1), (self.strides, self.strides),
                         padding="VALID", use_bias=False,
                         kernel_init=resnet_kernel_init, dtype=x.dtype,
                         name="downsample_conv")(x)
            sc = _bn(sc, train, "downsample_bn")
        else:
            sc = x
        h = nn.Conv(self.width, (1, 1), padding="VALID", use_bias=False,
                    kernel_init=resnet_kernel_init, dtype=x.dtype,
                    name="conv1")(x)
        h = nn.relu(_bn(h, train, "bn1"))
        h = nn.Conv(self.width, (3, 3), (self.strides, self.strides),
                    padding=[(1, 1)] * 2, feature_group_count=GROUPS,
                    use_bias=False, kernel_init=resnet_kernel_init,
                    dtype=x.dtype, name="conv2")(h)
        h = nn.relu(_bn(h, train, "bn2"))
        h = nn.Conv(self.out_ch, (1, 1), padding="VALID", use_bias=False,
                    kernel_init=resnet_kernel_init, dtype=x.dtype,
                    name="conv3")(h)
        h = _bn(h, train, "bn3")
        return nn.relu(sc + h)


class ResNeXt101Trunk(nn.Module):
    """Returns the four stage outputs: 256@1/4, 512@1/8, 1024@1/16,
    2048@1/32 (the channels _make_scratch consumes, blocks.py:57-59)."""

    compute_dtype: str = "float32"
    normalize: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.normalize:
            x = (x - IMAGENET_MEAN) / IMAGENET_STD
        x = x.astype(self.compute_dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, kernel_init=resnet_kernel_init,
                    dtype=x.dtype, name="stem_conv")(x)
        x = nn.relu(_bn(x, train, "stem_bn"))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        outs = []
        for li, (out_ch, width, blocks, stride) in enumerate(STAGES):
            for b in range(blocks):
                x = ResNeXtBottleneck(
                    out_ch, width, stride if b == 0 else 1,
                    name=f"layer{li + 1}_block{b}")(x, train)
            outs.append(x)
        return outs


def load_torch_resnext101(src) -> tuple[dict, dict]:
    """Dumped torchvision/WSL resnext101_32x8d state_dict (.npz path or
    dict, original torch key names, OIHW kernels) -> (params, batch_stats)
    pytrees under ResNeXt101Trunk's module names."""
    if isinstance(src, str):
        from polardepth_tpu.utils.torch_pth import load_array_dict
        raw = load_array_dict(src)
    else:
        raw = dict(src)

    def conv(k):
        return jnp.asarray(np.transpose(raw[k], (2, 3, 1, 0)))

    def bn(prefix):
        p = {"scale": jnp.asarray(raw[f"{prefix}.weight"]),
             "bias": jnp.asarray(raw[f"{prefix}.bias"])}
        s = {"mean": jnp.asarray(raw[f"{prefix}.running_mean"]),
             "var": jnp.asarray(raw[f"{prefix}.running_var"])}
        return p, s

    params: dict = {"stem_conv": {"kernel": conv("conv1.weight")}}
    stats: dict = {}
    params["stem_bn"], stats["stem_bn"] = bn("bn1")
    for li, (_, _, blocks, _) in enumerate(STAGES):
        for b in range(blocks):
            name = f"layer{li + 1}_block{b}"
            t = f"layer{li + 1}.{b}"
            p: dict = {}
            s: dict = {}
            for c in ("conv1", "conv2", "conv3"):
                p[c] = {"kernel": conv(f"{t}.{c}.weight")}
            for n in ("bn1", "bn2", "bn3"):
                p[n], s[n] = bn(f"{t}.{n}")
            if b == 0:
                p["downsample_conv"] = {
                    "kernel": conv(f"{t}.downsample.0.weight")}
                p["downsample_bn"], s["downsample_bn"] = bn(
                    f"{t}.downsample.1")
            params[name] = p
            stats[name] = s
    return params, stats


def load_midas_npz(params: dict, batch_stats: dict, src,
                   log=print) -> tuple[dict, dict]:
    """Graft a full MiDaS v2.1 checkpoint (midas_v21*.pt dumped to .npz by
    scripts/convert_torch_dpt.py --pt) into MidasNet (params, batch_stats).

    Checkpoint layout (reference dpt/blocks.py:120-131 wraps the trunk):
      pretrained.layer1.{0,1}   = conv1 / bn1 (Sequential indices; 2=relu,
                                  3=maxpool carry no params)
      pretrained.layer1.4.{b}.* = trunk layer1 blocks
      pretrained.layer{2,3,4}.* = trunk stages
      scratch.layer{n}_rn.weight, scratch.refinenet{n}.resConfUnit{m}.
      conv{k}.{weight,bias}, scratch.output_conv.{0,2,4}.{weight,bias}
    """
    import copy

    if isinstance(src, str):
        from polardepth_tpu.utils.torch_pth import load_array_dict
        raw = load_array_dict(src)
    else:
        raw = dict(src)
    trunk_sd, scratch = {}, {}
    for k, v in raw.items():
        v = np.asarray(v)
        if k.startswith("pretrained.layer1.0."):
            trunk_sd["conv1." + k.split(".", 3)[3]] = v
        elif k.startswith("pretrained.layer1.1."):
            trunk_sd["bn1." + k.split(".", 3)[3]] = v
        elif k.startswith("pretrained.layer1.4."):
            trunk_sd["layer1." + k.split(".", 3)[3]] = v
        elif k.startswith("pretrained.layer"):
            trunk_sd[k[len("pretrained."):]] = v
        elif k.startswith("scratch."):
            scratch[k[len("scratch."):]] = v

    params = copy.deepcopy(params)
    batch_stats = copy.deepcopy(batch_stats)
    params["trunk"], batch_stats["trunk"] = load_torch_resnext101(trunk_sd)

    def conv(k):
        return jnp.asarray(np.transpose(scratch[k], (2, 3, 1, 0)))

    loaded = 0
    for n in range(1, 5):
        key = f"layer{n}_rn.weight"
        if key in scratch:
            params[f"layer{n}_rn"]["Conv_0"]["kernel"] = conv(key)
            loaded += 1
    for n in range(1, 5):
        for m in (1, 2):
            for c in (1, 2):
                base = f"refinenet{n}.resConfUnit{m}.conv{c}"
                if f"{base}.weight" not in scratch:
                    continue
                if f"resConfUnit{m}" not in params[f"refinenet{n}"]:
                    # the deepest fusion block is called without a skip, so
                    # flax never instantiates its resConfUnit1; torch
                    # creates it anyway as dead weight (blocks.py:224-225)
                    continue
                dst = params[f"refinenet{n}"][f"resConfUnit{m}"][
                    f"conv{c}"]["Conv_0"]
                dst["kernel"] = conv(f"{base}.weight")
                dst["bias"] = jnp.asarray(scratch[f"{base}.bias"])
                loaded += 1
    for idx, name in ((0, "head1"), (2, "head2"), (4, "head3")):
        base = f"output_conv.{idx}"
        if f"{base}.weight" in scratch:
            params[name]["Conv_0"]["kernel"] = conv(f"{base}.weight")
            params[name]["Conv_0"]["bias"] = jnp.asarray(
                scratch[f"{base}.bias"])
            loaded += 1
    log(f"MiDaS graft: trunk + {loaded} scratch convs loaded")
    return params, batch_stats
