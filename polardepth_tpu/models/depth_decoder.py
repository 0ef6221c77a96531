"""Monodepth2 depth decoder (reference: manydepth/networks/depth_decoder.py).

Five up-stages with channel widths [16, 32, 64, 128, 256]; each stage is
ConvBlock -> bilinear x2 upsample -> skip concat -> ConvBlock; a 3x3
reflection-padded disp head + sigmoid at every requested scale.  The
reference's `upsample` is bilinear align_corners=False (layers.py:446-449)
despite the class's unused 'nearest' attribute.

`phase_packed=True` executes stages 1 and 0 (the half-/full-resolution,
16-32-channel stages) in a space-to-depth packed layout via ops/phase.py:
mathematically identical outputs (same params, border-exact), but every
materialized tensor keeps >=64 channels so the TPU lane-padding tax and the
<=32-lane MXU utilization of the original layout disappear.  See PERF.md
round-3 roofline: the decoder was the block furthest above its floor.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from polardepth_tpu.models.layers import ConvBlockELU, ReflectConv
from polardepth_tpu.ops.resize import upsample2x

NUM_CH_DEC = (16, 32, 64, 128, 256)


def _conv_params(block):
    """Kernel/bias of a ConvBlockELU or ReflectConv that has been called
    (child params are readable on the bound instance)."""
    p = block.variables["params"]
    if "ReflectConv_0" in p:          # ConvBlockELU wraps a ReflectConv
        p = p["ReflectConv_0"]
    return p["Conv_0"]["kernel"], p["Conv_0"]["bias"]


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
    # Execute stages 1/0 + their disp heads space-to-depth packed (same
    # params, border-exact same outputs).  The original stage-1/0 graph is
    # still traced for parameter creation but its results are unused, so
    # XLA dead-code-eliminates it.
    phase_packed: bool = False

    @nn.compact
    def __call__(self, input_features):
        outputs = {}
        phase = (self.phase_packed and self.use_skips
                 and not self.uncertainty and 0 in self.scales
                 and len(input_features) == 5)
        cap = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            blk0 = ConvBlockELU(NUM_CH_DEC[i], pad_mode=self.pad_mode)
            x = blk0(x)                                  # upconv_{i}_0
            if phase and i == 1:
                cap["x1"] = x
            if phase and i == 0:
                cap["blk0_0"] = blk0
            x = upsample2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            blk1 = ConvBlockELU(NUM_CH_DEC[i], pad_mode=self.pad_mode)
            x = blk1(x)                                  # upconv_{i}_1
            if phase and i in (0, 1):
                cap[f"blk{i}_1"] = blk1
            if i in self.scales:
                # Disp head runs in float32 regardless of the trunk dtype:
                # bf16 disparity (~3 significant digits) would quantize depth
                # by ~0.4%, visible in AbsRel.
                head = ReflectConv(self.num_output_channels, 3)
                disp = nn.sigmoid(head(x.astype(jnp.float32)))
                outputs[("disp", i)] = disp
                if phase and i in (0, 1):
                    cap[f"head{i}"] = head
                if self.uncertainty:
                    outputs[("uncertainty", i)] = nn.sigmoid(
                        ReflectConv(self.num_output_channels, 5)(x))
                    outputs[("uncertainty_color", i)] = nn.sigmoid(
                        ReflectConv(self.num_output_channels, 5)(x))
        if phase:
            outputs.update(self._phase_tail(cap, input_features[0]))
        return outputs

    def _phase_tail(self, cap, f0):
        """Packed recomputation of stages 1 and 0; returns ("disp", 0/1)."""
        from polardepth_tpu.ops.phase import (
            depth_to_space, packed_conv_exact, packed_upconv_exact,
            packed_upconv_from_packed_exact)
        out = {}
        w, b = _conv_params(cap["blk1_1"])
        y1p = nn.elu(packed_upconv_exact(cap["x1"], w, b, self.pad_mode,
                                         skip=f0))
        if 1 in self.scales:
            wh, bh = _conv_params(cap["head1"])
            d1 = packed_conv_exact(y1p.astype(jnp.float32), wh, bh, "reflect")
            out[("disp", 1)] = depth_to_space(nn.sigmoid(d1))
        w0, b0 = _conv_params(cap["blk0_0"])
        y8 = nn.elu(packed_conv_exact(y1p, w0, b0, self.pad_mode))
        w1, b1 = _conv_params(cap["blk0_1"])
        y0p = nn.elu(packed_upconv_from_packed_exact(y8, w1, b1,
                                                     self.pad_mode))
        wh, bh = _conv_params(cap["head0"])
        d0 = packed_conv_exact(y0p.astype(jnp.float32), wh, bh, "reflect")
        out[("disp", 0)] = depth_to_space(nn.sigmoid(d0))
        return out
