"""Convolutional building blocks shared by the model zoo.

Mirrors the behaviour of the reference's layer classes — reflection-padded
convs + ELU for the decoder (manydepth/layers.py:329-380) and
Conv+BN+ReLU+Pool+Dropout blocks for the pre-encoders
(manydepth/networks/pre_encoders.py:8-46) — with torch-matching default
parameter initialisation so training dynamics are comparable from step 0.

All modules are NHWC.  BatchNorm uses batch statistics of the *global* batch
when the step is jit-sharded over a data mesh (XLA inserts the cross-device
reduction), which exactly reproduces the reference's single-device BN
semantics at any device count — stronger than torch DDP's per-device BN.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default: kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = kh*kw*in_ch.
    Flax kernel shape is (kh, kw, in, out)."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int) -> Callable:
    """torch nn.Conv2d default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = math.sqrt(1.0 / fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def resnet_kernel_init(key, shape, dtype=jnp.float32):
    """torchvision ResNet init: kaiming_normal(mode=fan_out,
    nonlinearity=relu) == N(0, sqrt(2/fan_out)), fan_out = kh*kw*out_ch."""
    fan_out = shape[0] * shape[1] * shape[3]
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, dtype)


class _DenseExpandConv(nn.Module):
    """Grouped conv executed as a DENSE conv with a block-diagonal kernel.

    Parameters are created in the grouped shape (kh, kw, cin/G, cout) under
    the same 'kernel'/'bias' names nn.Conv uses, so checkpoints are
    interchangeable with the grouped execution.  At apply time the kernel
    is zero-embedded into its (kh, kw, cin, cout) block-diagonal dense form
    and run with feature_group_count=1: G x the MACs, but a full-lane-tile
    contraction and none of XLA's grouped-conv lowering overhead.
    Mathematically identical (the off-diagonal blocks are exactly zero)."""

    features: int
    kernel_size: int
    strides: int
    padding: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable
    groups: int

    @nn.compact
    def __call__(self, x):
        k, g, cin = self.kernel_size, self.groups, x.shape[-1]
        kern = self.param("kernel", self.kernel_init,
                          (k, k, cin // g, self.features))
        cpg_in, cpg_out = cin // g, self.features // g
        blocks = []
        for i in range(g):
            kg = kern[..., i * cpg_out:(i + 1) * cpg_out]
            pads = [(0, 0)] * 2 + [(i * cpg_in, (g - 1 - i) * cpg_in), (0, 0)]
            blocks.append(jnp.pad(kg, pads))
        dense = jnp.concatenate(blocks, axis=-1).astype(x.dtype)
        dn = jax.lax.conv_dimension_numbers(
            x.shape, dense.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, dense, (self.strides, self.strides),
            [(self.padding, self.padding)] * 2, dimension_numbers=dn)
        if self.use_bias:
            b = self.param("bias", self.bias_init, (self.features,))
            y = y + b.astype(y.dtype)
        return y


class TorchConv(nn.Module):
    """nn.Conv with torch-default initialisation and integer zero padding.

    groups > 1 executes a grouped conv (torch Conv2d(groups=G)); the
    per-group fan-in drives the init so a groups=2 conv initialises
    exactly like two independent convs stacked along cout.
    dense_expand=True executes the grouped conv as a block-diagonal DENSE
    conv (same params; see _DenseExpandConv)."""

    features: int
    kernel_size: int
    strides: int = 1
    padding: int = 0
    use_bias: bool = True
    kernel_init: Callable = torch_conv_kernel_init
    zero_bias: bool = False  # zero-init bias instead of torch's uniform
    groups: int = 1
    dense_expand: bool = False

    @nn.compact
    def __call__(self, x):
        fan_in = (self.kernel_size * self.kernel_size
                  * x.shape[-1] // self.groups)
        bias_init = (nn.initializers.zeros if self.zero_bias
                     else torch_conv_bias_init(fan_in))
        if self.dense_expand and self.groups > 1:
            return _DenseExpandConv(
                self.features, self.kernel_size, self.strides, self.padding,
                self.use_bias, self.kernel_init, bias_init, self.groups,
                name="Conv_0")(x)  # nn.Conv's auto-name: same param tree
        return nn.Conv(
            self.features, (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(self.padding, self.padding)] * 2,
            use_bias=self.use_bias,
            feature_group_count=self.groups,
            kernel_init=self.kernel_init,
            bias_init=bias_init,
            dtype=x.dtype,
        )(x)


class ReflectConv(nn.Module):
    """Reflection-pad + VALID conv (reference Conv3x3/Conv5x5,
    layers.py:345-380).

    pad_mode="zero" is the TPU fast path: the pad folds into the conv
    itself instead of materialising a padded tensor (one fewer HBM round
    trip per decoder stage — the decoder's full-resolution stages are
    HBM-bound, PERF.md).  Kernel/bias shapes are identical, so checkpoints
    are interchangeable between modes; outputs deviate only where the
    receptive field touches the image border (the reference's
    use_refl=False branch, layers.py:352-355)."""

    features: int
    kernel_size: int = 3
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2
        if self.pad_mode == "reflect":
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
            padding = "VALID"
        else:
            padding = [(p, p)] * 2
        fan_in = self.kernel_size * self.kernel_size * x.shape[-1]
        return nn.Conv(
            self.features, (self.kernel_size, self.kernel_size),
            padding=padding,
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_conv_bias_init(fan_in),
            dtype=x.dtype,
        )(x)


class ConvBlockELU(nn.Module):
    """ReflectConv3x3 + ELU — the decoder block (layers.py:329-342)."""

    features: int
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        return nn.elu(ReflectConv(self.features, 3,
                                  pad_mode=self.pad_mode)(x))


def _batch_norm(x, train: bool):
    """torch BatchNorm2d defaults: eps=1e-5, momentum=0.1 (flax: 0.9).

    dtype is left unspecified so flax promotes bf16 activations with the f32
    scale/bias to an f32 computation (stable statistics); the result is cast
    back to the activation dtype to keep a bf16 compute chain bf16.
    """
    y = nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
    return y.astype(x.dtype)


class ConvBNReLUDrop(nn.Module):
    """Conv -> BN -> ReLU -> [pool] -> Dropout — the pre-encoder ConvBlock
    (pre_encoders.py:8-34).  downsampling: 'none' | 'maxpool' | 'avgpool' |
    'stride2' (stride applied in the conv itself)."""

    features: int
    kernel_size: int
    downsampling: str = "none"
    padding: int = 0
    dropout_rate: float = 0.1
    groups: int = 1
    dense_expand: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        stride = 2 if self.downsampling == "stride2" else 1
        x = TorchConv(self.features, self.kernel_size, strides=stride,
                      padding=self.padding, groups=self.groups,
                      dense_expand=self.dense_expand)(x)
        x = _batch_norm(x, train)
        x = nn.relu(x)
        if self.downsampling == "maxpool":
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        elif self.downsampling == "avgpool":
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x


class ResidualBlock(nn.Module):
    """Two ConvBNReLUDrop blocks with an additive skip
    (pre_encoders.py:36-46)."""

    features: int
    kernel_size: int = 3
    padding: int = 1
    dropout_rate: float = 0.1
    groups: int = 1
    dense_expand: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBNReLUDrop(self.features, self.kernel_size, "none",
                             self.padding, self.dropout_rate,
                             groups=self.groups,
                             dense_expand=self.dense_expand)(x, train)
        out = ConvBNReLUDrop(self.features, self.kernel_size, "none",
                             self.padding, self.dropout_rate,
                             groups=self.groups,
                             dense_expand=self.dense_expand)(out, train)
        return out + x
