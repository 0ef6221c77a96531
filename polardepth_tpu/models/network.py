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

import jax
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
    compute_dtype: str = "float32"  # "bfloat16" = MXU fast path; the XOLP
    # fit, Fresnel inversion and disparity heads always stay float32.
    use_pallas: bool = True  # fused polar-preprocess kernel on TPU backends
    # (no-op off TPU; see Config.use_pallas for the perf numbers)
    use_attention: bool = False  # arch1++: cross-modal attention at fusion
    attention_pe_in_stream: bool = False  # legacy r3 integration (see
    # models/attention.py CrossModalAttention docstring)
    attention_gate: bool = True  # gamma-gated attention delta
    decoder_pad_mode: str = "reflect"  # "zero" = fast decoder (HBM saver)
    phase_packed_decoder: bool = False  # space-to-depth packed full-res
    # decoder stages (ops/phase.py) — exact same function, >=64-lane layout
    fused_encoders: bool = False  # run the XOLP + normals encoders as ONE
    # groups=2 conv stack at 128 channels (full lane tile) — exact same
    # math (models/pre_encoders.py:FusedModalityEncoders); needs both
    # augment_xolp and augment_normals
    fused_plan: str = "grouped"  # "grouped" | "dense" execution plan for
    # the fused stack (see FusedModalityEncoders.plan)

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
        priors = None
        if needs_xolp and xolp is None:
            if pol is None:
                raise ValueError("augment_xolp/augment_normals need pol or xolp")
            pol_f32 = pol.astype(jnp.float32)
            if self.use_pallas and jax.default_backend() == "tpu":
                from polardepth_tpu.ops.pallas.polar_preprocess import (
                    fused_polar_preprocess)
                if self.augment_normals:
                    xolp, priors = fused_polar_preprocess(
                        pol_f32, self.refraction_index)
                else:
                    xolp = xolp_from_pol(pol_f32)
            else:
                xolp = xolp_from_pol(pol_f32)

        cd = self.compute_dtype
        rgb_feats = ShallowResNet18Stem(cd, name="rgb_encoder")(color, train)
        xolp_feats = None
        normals_feats = None
        if self.fused_encoders and self.augment_xolp and self.augment_normals:
            # one groups=2 stack at 128 lanes; its output IS
            # [xolp_feats | normals_feats], which is exactly what both the
            # attention's pol tokens and the JointEncoder concat consume
            from polardepth_tpu.models.pre_encoders import (
                FusedModalityEncoders)
            xolp_feats = FusedModalityEncoders(
                self.dropout_rate, self.refraction_index, cd,
                plan=self.fused_plan,
                name="fused_encoders")(xolp, train, priors=priors)
        elif self.fused_encoders:
            raise ValueError(
                "fused_encoders requires augment_xolp AND augment_normals")
        else:
            if self.augment_xolp:
                xolp_feats = ShallowEncoder(
                    "XOLP", self.dropout_rate, cd,
                    name="xolp_encoder")(xolp, train)
            if self.augment_normals:
                normals_feats = ShallowNormalsEncoder(
                    self.dropout_rate, self.refraction_index, cd,
                    name="normals_encoder")(xolp, train, priors=priors)
        rgb_fused = rgb_feats[-1]
        if self.use_attention and (xolp_feats is not None
                                   or normals_feats is not None):
            from polardepth_tpu.models.attention import CrossModalAttention
            pol_feats = jnp.concatenate(
                [f for f in (xolp_feats, normals_feats) if f is not None],
                axis=-1)
            rgb_fused = CrossModalAttention(
                d_model=rgb_fused.shape[-1],
                pe_in_stream=self.attention_pe_in_stream,
                gate=self.attention_gate,
                name="cross_modal_attention")(rgb_fused, pol_feats)
        joint = JointEncoder(self.dropout_rate, name="joint_encoder")(
            rgb_fused, xolp_feats, normals_feats, train)
        return DepthDecoder(tuple(self.scales),
                            pad_mode=self.decoder_pad_mode,
                            phase_packed=self.phase_packed_decoder,
                            name="mono_depth")(rgb_feats + joint)
