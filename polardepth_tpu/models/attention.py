"""Attention modules for the arch1++_attention variant.

Re-designs of the reference's LoFTR-style blocks
(manydepth/networks/resnet_encoder.py:72-289): 2-D sine position encoding,
elu-feature-map linear attention (O(N) in tokens — MXU-friendly einsums),
the LoFTR encoder layer, and the 3-D-distance-kernel spatial cross
attention.  On the reference's main branch these are only instantiated in
commented code (:378-381, :672-700); the published ablation table still
reports an "arch1++_attention" row (BASELINE.md), so the blocks are first-
class here and `CrossModalAttention` integrates them after encoder fusion
(BASELINE.json config 4: "cross-modal attention after encoder fusion").
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from polardepth_tpu.models.layers import TorchConv, _batch_norm


def sine_position_encoding(d_model: int, height: int, width: int,
                           temp_bug_fix: bool = True) -> np.ndarray:
    """(H, W, C) 2-D sinusoidal PE (LoFTR convention, channels interleaved
    x-sin/x-cos/y-sin/y-cos; resnet_encoder.py:158-187)."""
    pe = np.zeros((d_model, height, width))
    y_pos = np.cumsum(np.ones((height, width)), axis=0)[None]
    x_pos = np.cumsum(np.ones((height, width)), axis=1)[None]
    if temp_bug_fix:
        div = np.exp(np.arange(0, d_model // 2, 2)
                     * (-math.log(10000.0) / (d_model // 2)))
    else:
        div = np.exp(np.arange(0, d_model // 2, 2)
                     * (-math.log(10000.0) / d_model // 2))
    div = div[:, None, None]
    pe[0::4] = np.sin(x_pos * div)
    pe[1::4] = np.cos(x_pos * div)
    pe[2::4] = np.sin(y_pos * div)
    pe[3::4] = np.cos(y_pos * div)
    return np.transpose(pe, (1, 2, 0))  # HWC


def add_position_encoding(x: jnp.ndarray) -> jnp.ndarray:
    """x: (B, H, W, C) -> x + PE."""
    _, h, w, c = x.shape
    pe = jnp.asarray(sine_position_encoding(c, h, w), x.dtype)
    return x + pe[None]


def linear_attention(q, k, v, eps: float = 1e-6):
    """elu(.)+1 feature-map linear attention ("Transformers are RNNs";
    resnet_encoder.py:201-234).  q: (B, L, H, D); k, v: (B, S, H, D)."""
    q = nn.elu(q) + 1.0
    k = nn.elu(k) + 1.0
    kv = jnp.einsum("nshd,nshv->nhdv", k, v)
    z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", q, jnp.sum(k, axis=1)) + eps)
    return jnp.einsum("nlhd,nhdv,nlh->nlhv", q, kv, z)


class LoFTREncoderLayer(nn.Module):
    """QKV linear attention + gated MLP merge (resnet_encoder.py:237-289)."""

    d_model: int = 64
    nhead: int = 8

    @nn.compact
    def __call__(self, x, source):
        """x: (B, L, C) queries; source: (B, S, C) keys/values."""
        b, l, c = x.shape
        dim = self.d_model // self.nhead

        def proj(name, inp):
            return nn.Dense(self.d_model, use_bias=False,
                            dtype=x.dtype, name=name)(inp)

        q = proj("q_proj", x).reshape(b, l, self.nhead, dim)
        k = proj("k_proj", source).reshape(b, -1, self.nhead, dim)
        v = proj("v_proj", source).reshape(b, -1, self.nhead, dim)
        msg = linear_attention(q, k, v).reshape(b, l, self.d_model)
        msg = nn.Dense(self.d_model, use_bias=False, dtype=x.dtype,
                       name="merge")(msg)
        msg = nn.LayerNorm(dtype=x.dtype)(msg)
        msg = jnp.concatenate([x, msg], axis=-1)
        msg = nn.Dense(2 * self.d_model, use_bias=False, dtype=x.dtype)(msg)
        msg = nn.relu(msg)
        msg = nn.Dense(self.d_model, use_bias=False, dtype=x.dtype)(msg)
        msg = nn.LayerNorm(dtype=x.dtype)(msg)
        return x + msg


class SpatialAttention(nn.Module):
    """Cross attention weighted by a 3-D-distance kernel
    (resnet_encoder.py:72-155): attention(i, j) = exp(-d_ij / 2 sigma),
    aggregated values blended back with a learnable gamma."""

    features: int = 64
    radii: float = 0.3

    @nn.compact
    def __call__(self, context, distance, train: bool = False):
        """context: (B, H, W, C); distance: (B, N, N) pairwise euclidean
        distances of the backprojected points (N = H*W)."""
        b, h, w, c = context.shape
        n = h * w
        sigma = self.radii * 30.0 / 36.0  # frozen in the reference
        attn = jnp.exp(-distance / (2.0 * sigma))

        value = TorchConv(self.features, 1)(context).reshape(b, n,
                                                             self.features)
        normalizer = jnp.sum(attn, axis=1)[..., None]
        ca = jnp.einsum("bnm,bnc->bmc", attn, value) / normalizer
        ca = ca.reshape(b, h, w, self.features)

        ca = _batch_norm(TorchConv(64, 1)(ca), train)
        ctx = _batch_norm(TorchConv(64, 1)(context), train)
        out = _batch_norm(TorchConv(64, 1)(
            jnp.concatenate([ca, ctx], axis=-1)), train)
        gamma = self.param("gamma", lambda *_: jnp.full((1,), 0.7))
        out = gamma * out + context
        return out, attn


class CrossModalAttention(nn.Module):
    """arch1++ integration: RGB tokens attend to the polarization-modality
    tokens (and back) at the fusion level, before the JointEncoder.

    Round-4 integration knobs (VERDICT r3 #6 — the round-3 attention row
    regressed vs the tri-encoder; these address the two integration flaws
    found):
      pe_in_stream=True  (the round-3 behavior) leaks the sinusoidal PE
        into the features handed to JointEncoder — the residual stream is
        rgb+PE, so the returned features carry a unit-magnitude position
        pattern the downstream convs must learn to ignore.  Default False:
        the PE participates in attention only; the collected message delta
        is applied to the CLEAN rgb features.
      gate=True adds a learnable scalar gamma (init 0.1, the
        SpatialAttention gamma pattern, resnet_encoder.py:150-153) on the
        attention delta so the graph starts ~= the tri-encoder and adopts
        attention only as it pays.
    """

    d_model: int = 128
    nhead: int = 8
    num_layers: int = 1
    pe_in_stream: bool = False
    gate: bool = True

    @nn.compact
    def __call__(self, rgb_feats, pol_feats):
        """rgb_feats: (B, H, W, Cr); pol_feats: (B, H, W, Cp).  Returns the
        attended rgb features, same shape."""
        b, h, w, cr = rgb_feats.shape
        rgb_clean = rgb_feats.reshape(b, h * w, cr)
        rgb0 = add_position_encoding(rgb_feats).reshape(b, h * w, cr)
        pol = add_position_encoding(
            nn.Dense(self.d_model, dtype=pol_feats.dtype,
                     name="pol_embed")(pol_feats)
        ).reshape(b, h * w, self.d_model)
        rgb = rgb0
        for i in range(self.num_layers):
            rgb = LoFTREncoderLayer(self.d_model, self.nhead,
                                    name=f"cross_{i}")(rgb, pol)
            rgb = LoFTREncoderLayer(self.d_model, self.nhead,
                                    name=f"self_{i}")(rgb, rgb)
        if self.pe_in_stream:  # legacy round-3 integration
            return rgb.reshape(b, h, w, cr)
        delta = rgb - rgb0  # sum of the attention messages, PE-free
        if self.gate:
            gamma = self.param("gamma", lambda *_: jnp.full((1,), 0.1))
            delta = gamma * delta
        return (rgb_clean + delta).reshape(b, h, w, cr)
