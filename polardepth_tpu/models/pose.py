"""Pose networks (reference: manydepth/networks/pose_decoder.py, pose_cnn.py).

PoseDecoder consumes the last feature map of the (possibly multi-frame) pose
encoder; outputs 0.01-scaled (axisangle, translation) for 2 frames, shaped
(B, num_frames, 1, 3) to feed ops.se3.transformation_from_parameters.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from polardepth_tpu.models.layers import TorchConv


class PoseDecoder(nn.Module):
    num_input_features: int = 1
    num_frames_to_predict_for: int = 2

    @nn.compact
    def __call__(self, input_features):
        """input_features: list (len num_input_features) of encoder feature
        lists; uses each list's last (deepest) map."""
        last = [f[-1] for f in input_features]
        cat = jnp.concatenate(
            [nn.relu(TorchConv(256, 1)(f)) for f in last], axis=-1)
        out = nn.relu(TorchConv(256, 3, padding=1)(cat))
        out = nn.relu(TorchConv(256, 3, padding=1)(out))
        out = TorchConv(6 * self.num_frames_to_predict_for, 1)(out)
        out = out.mean(axis=(1, 2))  # global average over H, W
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]


class PoseCNN(nn.Module):
    """7-conv alternative pose net (exported but unused by the published
    config; kept for capability parity)."""

    num_input_frames: int = 2

    @nn.compact
    def __call__(self, x):
        specs = [(16, 7, 2, 3), (32, 5, 2, 2), (64, 3, 2, 1), (128, 3, 2, 1),
                 (256, 3, 2, 1), (256, 3, 2, 1), (256, 3, 2, 1)]
        for feats, k, s, p in specs:
            x = nn.relu(TorchConv(feats, k, strides=s, padding=p)(x))
        x = TorchConv(6 * (self.num_input_frames - 1), 1)(x)
        x = x.mean(axis=(1, 2))
        x = 0.01 * x.reshape(-1, self.num_input_frames - 1, 1, 6)
        return x[..., :3], x[..., 3:]
