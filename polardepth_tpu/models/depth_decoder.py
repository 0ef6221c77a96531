"""Monodepth2 depth decoder (reference: manydepth/networks/depth_decoder.py).

Five up-stages with channel widths [16, 32, 64, 128, 256]; each stage is
ConvBlock -> bilinear x2 upsample -> skip concat -> ConvBlock; a 3x3
reflection-padded disp head + sigmoid at every requested scale.  The
reference's `upsample` is bilinear align_corners=False (layers.py:446-449)
despite the class's unused 'nearest' attribute.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from polardepth_tpu.models.layers import ConvBlockELU, ReflectConv
from polardepth_tpu.ops.resize import upsample2x

NUM_CH_DEC = (16, 32, 64, 128, 256)


class DepthDecoder(nn.Module):
    """input_features: 5 maps at [H/2, H/4, H/8, H/16, H/32] -> dict
    {scale: disp (B, H/2^s/... , 1)} for scale in scales.

    num_output_channels and the optional uncertainty heads mirror the
    reference's constructor surface.
    """

    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    uncertainty: bool = False
    # "zero" folds padding into the convs (Config.fast_decoder): measured
    # 19.5 -> 15.8 ms at 8x512x512 bf16; deviates from reflect padding only
    # in a border ring (see ReflectConv).  Disp heads keep reflection
    # padding either way (1-channel convs, negligible cost).
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, input_features):
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlockELU(NUM_CH_DEC[i],
                             pad_mode=self.pad_mode)(x)  # upconv_{i}_0
            x = upsample2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlockELU(NUM_CH_DEC[i],
                             pad_mode=self.pad_mode)(x)  # upconv_{i}_1
            if i in self.scales:
                # Disp head runs in float32 regardless of the trunk dtype:
                # bf16 disparity (~3 significant digits) would quantize depth
                # by ~0.4%, visible in AbsRel.
                disp = nn.sigmoid(ReflectConv(self.num_output_channels, 3)(
                    x.astype(jnp.float32)))
                outputs[("disp", i)] = disp
                if self.uncertainty:
                    outputs[("uncertainty", i)] = nn.sigmoid(
                        ReflectConv(self.num_output_channels, 5)(x))
                    outputs[("uncertainty_color", i)] = nn.sigmoid(
                        ReflectConv(self.num_output_channels, 5)(x))
        return outputs
