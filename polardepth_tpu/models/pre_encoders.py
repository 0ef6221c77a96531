"""XOLP / normals shallow encoders and the JointEncoder fusion trunk.

Reference: manydepth/networks/pre_encoders.py:49-164.  Key TPU-native change:
the Fresnel normal priors are computed *inside the jitted graph* by fused
device ops (polardepth_tpu.ops.fresnel) instead of the reference's mid-forward
GPU->CPU->GPU scipy round-trip (normals_vec.py:12,21,26).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from polardepth_tpu.models.layers import ConvBNReLUDrop, ResidualBlock
from polardepth_tpu.ops.fresnel import normal_priors_from_xolp

# Precomputed XOLP standardization constants over 46 HAMMER sample maps
# (reference: polarisation/xolp_mean_and_std_dev.py, used at
# pre_encoders.py:79).
XOLP_MEAN = 0.08693199701957657
XOLP_STD = 0.44430732785457433


def normalize_input(x: jnp.ndarray, mode: str) -> jnp.ndarray:
    """Static per-modality standardization (pre_encoders.py:75-83)."""
    if mode == "XOLP":
        return (x - XOLP_MEAN) / XOLP_STD
    if mode == "normals":
        return x
    if mode == "RGB":
        return (x - 0.45) / 0.225
    raise ValueError(f"unknown normalization mode: {mode}")


class ShallowEncoder(nn.Module):
    """Conv7/2 -> Res -> Conv5+maxpool -> Res -> Conv5+maxpool -> Res.

    (B, H, W, C) -> (B, H/8, W/8, 64).  mode selects the input
    standardization ('XOLP' for the 2-channel DoLP/AoLP map).
    """

    mode: str = "XOLP"
    dropout_rate: float = 0.1
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dropout_rate
        x = normalize_input(x, self.mode).astype(self.compute_dtype)
        x = ConvBNReLUDrop(64, 7, "stride2", 3, d)(x, train)
        x = ResidualBlock(64, 3, 1, d)(x, train)
        x = ConvBNReLUDrop(64, 5, "maxpool", 2, d)(x, train)
        x = ResidualBlock(64, 3, 1, d)(x, train)
        x = ConvBNReLUDrop(64, 5, "maxpool", 2, d)(x, train)
        x = ResidualBlock(64, 3, 1, d)(x, train)
        return x


class ShallowNormalsEncoder(nn.Module):
    """XOLP (B,H,W,2) -> 9-channel Fresnel priors -> ShallowEncoder.

    The physics (diffuse + two specular interpretations, n=1.5) runs fused
    on-device; see ops/fresnel.py.  Reference: pre_encoders.py:85-113.
    """

    dropout_rate: float = 0.1
    refraction_index: float = 1.5
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, xolp, train: bool = False, priors=None):
        """priors: optionally precomputed 9-channel Fresnel priors (e.g. from
        the fused Pallas preprocessing kernel); computed from xolp here
        otherwise.  Both paths share the same parameter tree."""
        if priors is None:
            # Fresnel inversion stays float32: the LUT knot spacing (~4e-4)
            # is below bf16 resolution; only the conv stack runs in
            # compute_dtype.
            priors = normal_priors_from_xolp(
                xolp.astype(jnp.float32), self.refraction_index)
        return ShallowEncoder("normals", self.dropout_rate,
                              self.compute_dtype)(priors, train)


class FusedModalityEncoders(nn.Module):
    """XOLP + normals shallow encoders executed as ONE grouped-conv stack.

    The two modality encoders are architecturally identical 64-channel
    ShallowEncoders (reference pre_encoders.py:49-113) that never interact
    until the JointEncoder concatenates their outputs.  Running them as a
    single feature_group_count=2 graph at 128 channels is *mathematically
    identical* (groups don't mix; BN/ReLU/pool/dropout are per-channel) but
    TPU-shaped: 128 channels is a full v5e lane tile, so every conv/BN/pool
    runs at 2x the lane utilisation of the separate 64-channel graphs and
    half the op count / layout boundaries.

    Only the two first convs stay ungrouped (cin 2 vs 9 differ); from the
    first ResidualBlock on, everything is groups=2 at 128 channels.
    Output: the (B, H/8, W/8, 128) concat [xolp_feats | normals_feats] that
    the JointEncoder consumes (it concatenates them anyway, so no split is
    needed).  `fuse_modality_params` converts a separate-encoder checkpoint
    into this layout exactly.
    """

    dropout_rate: float = 0.1
    refraction_index: float = 1.5
    compute_dtype: str = "float32"
    # "grouped": feature_group_count=2 convs (round-4 plan; measured -19%
    # on infer — XLA's TPU grouped-conv lowering is the problem, PERF.md
    # round-5).  "dense": the same params executed as block-diagonal DENSE
    # convs (2x MACs, full 128-lane contraction, zero grouped-lowering
    # overhead; exactly the same math — layers.py:_DenseExpandConv).
    plan: str = "grouped"

    @nn.compact
    def __call__(self, xolp, train: bool = False, priors=None):
        if priors is None:
            priors = normal_priors_from_xolp(
                xolp.astype(jnp.float32), self.refraction_index)
        d = self.dropout_rate
        dense = self.plan == "dense"
        a = normalize_input(xolp, "XOLP").astype(self.compute_dtype)
        b = normalize_input(priors, "normals").astype(self.compute_dtype)
        # ungrouped stems (different cin), concatenated at 128 channels
        a = ConvBNReLUDrop(64, 7, "stride2", 3, d, name="stem_xolp")(a, train)
        b = ConvBNReLUDrop(64, 7, "stride2", 3, d,
                           name="stem_normals")(b, train)
        x = jnp.concatenate([a, b], axis=-1)
        x = ResidualBlock(128, 3, 1, d, groups=2, dense_expand=dense)(x, train)
        x = ConvBNReLUDrop(128, 5, "maxpool", 2, d, groups=2,
                           dense_expand=dense)(x, train)
        x = ResidualBlock(128, 3, 1, d, groups=2, dense_expand=dense)(x, train)
        x = ConvBNReLUDrop(128, 5, "maxpool", 2, d, groups=2,
                           dense_expand=dense)(x, train)
        x = ResidualBlock(128, 3, 1, d, groups=2, dense_expand=dense)(x, train)
        return x


def fuse_modality_params(xolp_tree: dict, normals_tree: dict) -> dict:
    """Convert two separate ShallowEncoder param/batch_stats subtrees into
    the FusedModalityEncoders layout (exact: grouped-conv group g reads
    input channels [64g:64g+64] with kernel slice [..., 64g:64g+64], which
    is precisely the separate encoders stacked along cout).

    Works on either the 'params' or the 'batch_stats' subtree; pass the
    subtree rooted at the ShallowEncoder (i.e. containing ConvBNReLUDrop_0,
    ResidualBlock_0, ...).  Note ShallowNormalsEncoder nests its trunk
    under 'ShallowEncoder_0'.
    """
    import numpy as np

    def cat(pa, pb):
        if isinstance(pa, dict):
            return {k: cat(pa[k], pb[k]) for k in pa}
        pa, pb = np.asarray(pa), np.asarray(pb)
        return np.concatenate([pa, pb], axis=-1)  # cout / channel axis

    out = {"stem_xolp": xolp_tree["ConvBNReLUDrop_0"],
           "stem_normals": normals_tree["ConvBNReLUDrop_0"]}
    # explicit names don't consume flax's auto-name counters, so the fused
    # trunk's ConvBNReLUDrop numbering starts at _0 while the separate
    # encoders' stem already used _0:
    mapping = {"ResidualBlock_0": "ResidualBlock_0",
               "ConvBNReLUDrop_1": "ConvBNReLUDrop_0",
               "ResidualBlock_1": "ResidualBlock_1",
               "ConvBNReLUDrop_2": "ConvBNReLUDrop_1",
               "ResidualBlock_2": "ResidualBlock_2"}
    for sep_name, fused_name in mapping.items():
        assert sep_name in xolp_tree, \
            f"missing {sep_name} in separate encoder tree"
        out[fused_name] = cat(xolp_tree[sep_name], normals_tree[sep_name])
    return out


def split_modality_params(fused_tree: dict) -> tuple:
    """Exact inverse of `fuse_modality_params`: convert a
    FusedModalityEncoders param/batch_stats subtree back into the two
    separate ShallowEncoder-shaped subtrees (xolp, normals).  Every fused
    trunk leaf is the two separate leaves concatenated along the
    cout/channel (last) axis, so the split is a clean halving; the stems
    were never fused.  Used by checkpoint.export_components so component
    exports keep the reference's layout regardless of execution plan."""
    import numpy as np

    def halves(t):
        if isinstance(t, dict):
            pairs = {k: halves(v) for k, v in t.items()}
            return ({k: v[0] for k, v in pairs.items()},
                    {k: v[1] for k, v in pairs.items()})
        a = np.asarray(t)
        h = a.shape[-1] // 2
        return a[..., :h], a[..., h:]

    mapping = {"ResidualBlock_0": "ResidualBlock_0",
               "ConvBNReLUDrop_1": "ConvBNReLUDrop_0",
               "ResidualBlock_1": "ResidualBlock_1",
               "ConvBNReLUDrop_2": "ConvBNReLUDrop_1",
               "ResidualBlock_2": "ResidualBlock_2"}
    xolp = {"ConvBNReLUDrop_0": fused_tree["stem_xolp"]}
    normals = {"ConvBNReLUDrop_0": fused_tree["stem_normals"]}
    for sep_name, fused_name in mapping.items():
        xolp[sep_name], normals[sep_name] = halves(fused_tree[fused_name])
    return xolp, normals


class JointEncoder(nn.Module):
    """Fusion trunk over concatenated modality features.

    Input: rgb (B,H/8,W/8,128) [+ xolp 64] [+ normals 64] -> two deepest
    pyramid levels [(B,H/16,W/16,256), (B,H/32,W/32,512)] so that
    rgb_feats(3) + joint(2) matches the 5-level decoder contract.
    Reference: pre_encoders.py:116-164.
    """

    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, rgb_feats, xolp_feats=None, normals_feats=None,
                 train: bool = False):
        d = self.dropout_rate
        feats = [rgb_feats]
        if xolp_feats is not None:
            feats.append(xolp_feats)
        if normals_feats is not None:
            feats.append(normals_feats)
        x = jnp.concatenate(feats, axis=-1) if len(feats) > 1 else feats[0]
        x = ConvBNReLUDrop(256, 1, "none", 0, d)(x, train)   # fc1
        x = ConvBNReLUDrop(128, 1, "none", 0, d)(x, train)   # fc2
        x = ResidualBlock(128, 3, 1, d)(x, train)
        x = ResidualBlock(128, 3, 1, d)(x, train)
        x = ConvBNReLUDrop(256, 5, "maxpool", 2, d)(x, train)
        x = ResidualBlock(256, 3, 1, d)(x, train)
        x = ResidualBlock(256, 3, 1, d)(x, train)
        out16 = x
        x = ConvBNReLUDrop(512, 5, "maxpool", 2, d)(x, train)
        x = ResidualBlock(512, 3, 1, d)(x, train)
        x = ResidualBlock(512, 3, 1, d)(x, train)
        return [out16, x]
