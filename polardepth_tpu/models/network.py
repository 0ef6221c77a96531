"""PolarDepthNet — the flagship supervised multi-encoder depth network.

Composes the graph the reference assembles imperatively in
Trainer.process_batch (trainer.py:497-545): ShallowResNet18Stem (RGB) +
optional ShallowEncoder (XOLP) + optional ShallowNormalsEncoder (Fresnel
priors) -> JointEncoder fusion -> Monodepth2 DepthDecoder.

TPU-native properties:
  * One jitted graph from raw polarization captures to multi-scale disparity:
    the XOLP Stokes fit runs on device (ops/xolp.py) instead of in host
    DataLoader workers, and the Fresnel priors fuse into the forward pass.
  * Submodules carry the reference's component names (rgb_encoder,
    xolp_encoder, normals_encoder, joint_encoder, mono_depth) so
    per-component checkpoint export/import maps 1:1
    (reference save_model, trainer.py:1597-1617).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from polardepth_tpu.models.resnet import ShallowResNet18Stem
from polardepth_tpu.models.pre_encoders import (
    ShallowEncoder, ShallowNormalsEncoder, JointEncoder,
)
from polardepth_tpu.models.depth_decoder import DepthDecoder
from polardepth_tpu.ops.xolp import xolp_from_pol


class PolarDepthNet(nn.Module):
    augment_xolp: bool = True
    augment_normals: bool = True
    dropout_rate: float = 0.1
    scales: Sequence[int] = (0, 1, 2, 3)
    refraction_index: float = 1.5

    @nn.compact
    def __call__(self, color: jnp.ndarray,
                 pol: Optional[jnp.ndarray] = None,
                 xolp: Optional[jnp.ndarray] = None,
                 train: bool = False):
        """Args:
          color: (B, H, W, 3) RGB in [0, 1] (augmented copy during training).
          pol: (B, H, W, 4) grayscale captures at [0, 45, 90, 135] deg in the
            0..255 scale (uint8-valued floats); XOLP is derived on device.
          xolp: (B, H, W, 2) precomputed (DoLP, AoLP) — alternative to pol.

        Returns: {("disp", s): (B, H/2^s, W/2^s, 1)} for s in scales.
        """
        needs_xolp = self.augment_xolp or self.augment_normals
        if needs_xolp and xolp is None:
            if pol is None:
                raise ValueError("augment_xolp/augment_normals need pol or xolp")
            xolp = xolp_from_pol(pol.astype(color.dtype))

        rgb_feats = ShallowResNet18Stem(name="rgb_encoder")(color, train)
        xolp_feats = None
        normals_feats = None
        if self.augment_xolp:
            xolp_feats = ShallowEncoder(
                "XOLP", self.dropout_rate, name="xolp_encoder")(xolp, train)
        if self.augment_normals:
            normals_feats = ShallowNormalsEncoder(
                self.dropout_rate, self.refraction_index,
                name="normals_encoder")(xolp, train)
        joint = JointEncoder(self.dropout_rate, name="joint_encoder")(
            rgb_feats[-1], xolp_feats, normals_feats, train)
        return DepthDecoder(tuple(self.scales), name="mono_depth")(
            rgb_feats + joint)
