"""ResNet-18 encoders (full, shallow stem, multi-image pose variant).

Re-implements the torchvision resnet18 topology used by the reference
(manydepth/networks/resnet_encoder.py:736-822) in flax/NHWC:
  conv7x7/2 -> bn -> relu -> maxpool3x3/2 -> layer1..layer4 (BasicBlocks).

ShallowResNet18Stem truncates after layer2 and returns the three feature maps
the depth path consumes: 64@H/2, 64@H/4, 128@H/8
(reference ShallowResnetEncoder.forward, resnet_encoder.py:809-822).

ImageNet-pretrained init needs an offline torchvision->pytree conversion
(torchvision is not importable here); `load_torch_resnet18` consumes such a
converted .npz when available, otherwise kaiming init matches torchvision's
scratch init.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from polardepth_tpu.models.layers import resnet_kernel_init, _batch_norm

RESNET_NUM_CH_ENC = (64, 64, 128, 256, 512)


def _conv(x, features, kernel, stride, padding):
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(padding, padding)] * 2, use_bias=False,
                   kernel_init=resnet_kernel_init, dtype=x.dtype)(x)


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = _conv(x, self.features, 3, self.stride, 1)
        out = _batch_norm(out, train)
        out = nn.relu(out)
        out = _conv(out, self.features, 3, 1, 1)
        out = _batch_norm(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _conv(x, self.features, 1, self.stride, 0)
            identity = _batch_norm(identity, train)
        return nn.relu(out + identity)


def _layer(x, features, blocks, stride, train):
    x = BasicBlock(features, stride)(x, train)
    for _ in range(blocks - 1):
        x = BasicBlock(features, 1)(x, train)
    return x


def _stem(x, train):
    """conv1 + bn1 + relu.  Input is expected already normalized."""
    x = _conv(x, 64, 7, 2, 3)
    x = _batch_norm(x, train)
    return nn.relu(x)


def _maxpool(x):
    """torch MaxPool2d(3, stride=2, padding=1)."""
    return nn.max_pool(x, (3, 3), strides=(2, 2),
                       padding=((1, 1), (1, 1)))


class ShallowResNet18Stem(nn.Module):
    """RGB encoder: resnet18 truncated after layer2.

    Input: (B, H, W, 3) in [0, 1]; normalization (x-0.45)/0.225 is applied
    here as in the reference (resnet_encoder.py:813).
    Returns [f0 64@H/2, f1 64@H/4, f2 128@H/8].

    compute_dtype: activation dtype for the conv stack (bfloat16 for the MXU
    fast path; parameters stay float32).
    """

    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ((x - 0.45) / 0.225).astype(self.compute_dtype)
        f0 = _stem(x, train)
        f1 = _layer(_maxpool(f0), 64, 2, 1, train)
        f2 = _layer(f1, 128, 2, 2, train)
        return [f0, f1, f2]


class ResNet18Encoder(nn.Module):
    """Full 5-level resnet18 encoder (pose path; reference ResnetEncoder).

    num_input_images > 1 stacks frames channel-wise and widens conv1, as in
    resnet_multiimage_input (resnet_encoder.py:26-69).  For pretrained init,
    load_torch_resnet18(num_input_images=n) tiles the ImageNet conv1 kernel
    over the stacked frames and divides by n, exactly as the reference does
    (resnet_encoder.py:46-54); scratch init is plain kaiming on the widened
    kernel, matching torch.
    """

    num_input_images: int = 1
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ((x - 0.45) / 0.225).astype(self.compute_dtype)
        f0 = _stem(x, train)
        f1 = _layer(_maxpool(f0), 64, 2, 1, train)
        f2 = _layer(f1, 128, 2, 2, train)
        f3 = _layer(f2, 256, 2, 2, train)
        f4 = _layer(f3, 512, 2, 2, train)
        return [f0, f1, f2, f3, f4]


def load_torch_resnet18(npz_path: str, shallow: bool = False,
                        num_input_images: int = 1):
    """Convert a dumped torchvision resnet18 state_dict (.npz, original torch
    key names, OIHW kernels) into (params, batch_stats) pytrees matching
    ShallowResNet18Stem (shallow=True) or ResNet18Encoder module naming.

    num_input_images > 1 widens conv1 for stacked-frame input by tiling the
    kernel along the input-channel axis and dividing by the frame count —
    the reference's multi-image pretrained init
    (resnet_encoder.py:46-54: cat([conv1_weight] * n, 1) / n).

    Accepts an offline .npz dump
    (np.savez(path, **{k: v.numpy() for k, v in state_dict.items()})), a
    torch zip-format .pth directly (torch-free reader, utils/torch_pth.py),
    or an in-memory {torch key: array} dict.
    """
    if isinstance(npz_path, str):
        from polardepth_tpu.utils.torch_pth import load_array_dict
        raw = load_array_dict(npz_path)
    else:
        raw = dict(npz_path)
    if num_input_images > 1:
        raw["conv1.weight"] = np.concatenate(
            [raw["conv1.weight"]] * num_input_images,
            axis=1) / num_input_images

    def conv(k):
        return jnp.asarray(np.transpose(raw[k], (2, 3, 1, 0)))  # OIHW->HWIO

    def bn(prefix):
        p = {"scale": jnp.asarray(raw[f"{prefix}.weight"]),
             "bias": jnp.asarray(raw[f"{prefix}.bias"])}
        s = {"mean": jnp.asarray(raw[f"{prefix}.running_mean"]),
             "var": jnp.asarray(raw[f"{prefix}.running_var"])}
        return p, s

    params: dict = {}
    stats: dict = {}
    params["Conv_0"] = {"kernel": conv("conv1.weight")}
    params["BatchNorm_0"], stats["BatchNorm_0"] = bn("bn1")

    layers = [("layer1", False), ("layer2", True)]
    if not shallow:
        layers += [("layer3", True), ("layer4", True)]
    block_i = 0
    for layer, first_downsamples in layers:
        for b in range(2):
            name = f"BasicBlock_{block_i}"
            block_i += 1
            p: dict = {"Conv_0": {"kernel": conv(f"{layer}.{b}.conv1.weight")}}
            s: dict = {}
            p["BatchNorm_0"], s["BatchNorm_0"] = bn(f"{layer}.{b}.bn1")
            p["Conv_1"] = {"kernel": conv(f"{layer}.{b}.conv2.weight")}
            p["BatchNorm_1"], s["BatchNorm_1"] = bn(f"{layer}.{b}.bn2")
            if b == 0 and first_downsamples:
                p["Conv_2"] = {"kernel": conv(f"{layer}.{b}.downsample.0.weight")}
                p["BatchNorm_2"], s["BatchNorm_2"] = bn(f"{layer}.{b}.downsample.1")
            params[name] = p
            stats[name] = s
    return params, stats
