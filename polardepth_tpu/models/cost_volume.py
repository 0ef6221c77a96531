"""Cost-volume matching encoder (the ManyDepth multi-frame "student" path).

Re-design of the reference's ResnetEncoderMatching
(manydepth/networks/resnet_encoder.py:292-733).  The reference builds the
plane-sweep cost volume with a *Python loop over batch elements and lookup
frames* and a data-dependent `if pose.sum() == 0: continue`
(resnet_encoder.py:443-511) — untraceable and serial.  Here the whole volume
is one batched einsum/gather pipeline, vectorised over (batch, frame, bin),
with missing frames handled by a validity *mask* (compute always, weight by
zero) so the graph stays static for XLA.

Semantics preserved:
  * feature extraction = ResNet18 conv1..layer1 at 1/4 resolution, shared
    weights between current and lookup frames; lookup features and the
    volume are stop_gradient'ed (reference torch.no_grad,
    resnet_encoder.py:571, 616).
  * depth bins linear in depth or inverse depth (compute_depth_bins,
    :406-428), adaptive endpoints passed as traced scalars.
  * L1 feature difference, border edge-masking (>=2 px from both images'
    borders), per-pixel frame counts, missing -> max-over-bins
    (:471-504), confidence mask = all bins observed (:534-540).
  * lowest_cost = 1/depth at the argmin bin with zeros ignored (:623-627).
  * reduce_conv([feats ‖ masked volume]) -> resnet layers2..4 (:630-705).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from polardepth_tpu.models.layers import TorchConv
from polardepth_tpu.models.resnet import _stem, _layer, _maxpool
from polardepth_tpu.ops.warp import grid_sample


def compute_depth_bins(min_depth: jnp.ndarray, max_depth: jnp.ndarray,
                       num_bins: int, binning: str = "linear") -> jnp.ndarray:
    """(D,) depth hypotheses; endpoints may be traced scalars (adaptive
    bins, reference trainer.update_adaptive_depth_bins)."""
    if binning == "linear":
        return jnp.linspace(min_depth, max_depth, num_bins)
    if binning == "inverse":
        return (1.0 / jnp.linspace(1.0 / max_depth, 1.0 / min_depth,
                                   num_bins))[::-1]
    raise NotImplementedError(binning)


class _FeatureExtractor(nn.Module):
    """ResNet18 conv1+layer1 (shared for current and lookup frames)."""

    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ((x - 0.45) / 0.225).astype(self.compute_dtype)
        f0 = _stem(x, train)
        f1 = _layer(_maxpool(f0), 64, 2, 1, train)
        return f0, f1


def build_cost_volume(current_feats, lookup_feats, rel_poses, K, inv_K,
                      depth_bins, bin_chunk: int = 16,
                      warp_impl: str = "xla"):
    """Vectorised plane-sweep matching.

    Args:
      current_feats: (B, h, w, C) at 1/4 res.
      lookup_feats: (B, F, h, w, C).
      rel_poses: (B, F, 4, 4); an all-zero pose marks a missing frame.
      K, inv_K: (B, 4, 4) intrinsics *at 1/4 scale*.
      depth_bins: (D,).
      bin_chunk: process the depth bins in chunks of this size via lax.map.
        The dominant temporary — warped lookup features, (B, F, D, h, w, C)
        — is ~2.8 GB at the published batch 12, which OOMs one chip inside
        the full student step; per-bin costs are independent, so chunking
        bounds residency at (B, F, chunk, h, w, C) with identical numerics.
        0 (or a non-divisor of D) disables chunking.
      warp_impl: "xla" = the 4-corner grid_sample gather (exact reference
        numerics); "pallas" | "pallas<K>" | suffix "_fast" = the banded
        Pallas warp (ops/pallas/band_warp.py, default K=8 source rows per
        band).  Border-vs-zeros padding is immaterial here: the 2 px `edge`
        interior mask below zeroes every pixel whose sample could touch the
        image border, so both paddings agree on all surviving pixels (the
        equivalence is test-asserted).  The whole sweep is stop_gradient'ed,
        so the kernel's grid-only VJP is never taken.

    TPU gather note (round-3 profile, PERF.md): the bilinear warp's four
    corner gathers run at ~50 GB/s effective on v5e — narrow (256 B) rows
    keep them well below HBM bandwidth, and they are the sweep's floor under
    XLA.  A packed single-gather variant (corners concatenated channel-wise)
    was tried and measured SLOWER: XLA lowered the (rows, 4, C) weighted
    corner reduction into per-channel dynamic-slice loops with two layout
    transposes (~0.44 s/step of pure data shuffling).  The 4-gather
    grid_sample form is what XLA handles best; going below its floor needs
    a VMEM-resident Pallas sweep (the per-(b,f) feature table is only
    ~2.4 MB), kept as future work while the Mosaic stack is unreliable.

    Returns (cost_volume (B, D, h, w), missing_mask (B, D, h, w)).
    """
    from polardepth_tpu.ops.warp import resolve_warp_impl
    warp_impl = resolve_warp_impl(warp_impl, cv=True)
    b, h, w, c = current_feats.shape
    f = lookup_feats.shape[1]
    d = depth_bins.shape[0]
    dt = current_feats.dtype

    xs, ys = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                          jnp.arange(h, dtype=jnp.float32))
    pix = jnp.stack([xs.reshape(-1), ys.reshape(-1),
                     jnp.ones(h * w, jnp.float32)])            # (3, hw)
    cam = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], pix)     # (B, 3, hw)
    P = jnp.einsum("bij,bfjk->bfik", K, rel_poses)[:, :, :3]   # (B, F, 3, 4)
    frame_valid = (jnp.sum(jnp.abs(rel_poses), axis=(2, 3)) > 0).astype(dt)
    interior = jnp.zeros((h, w), dt).at[2:-2, 2:-2].set(1.0)

    def chunk_cost(bins_c):
        """(Dc,) bins -> (cost (B, Dc, h, w), counts (B, Dc, h, w))."""
        dc = bins_c.shape[0]
        pts = cam[:, None] * bins_c[None, :, None, None]       # (B, Dc, 3, hw)
        pts = jnp.concatenate(
            [pts, jnp.ones((b, dc, 1, h * w), jnp.float32)], axis=2)
        proj = jnp.einsum("bfij,bdjn->bfdin", P, pts)          # (B, F, Dc, 3, hw)
        pix_xy = proj[:, :, :, :2] / (proj[:, :, :, 2:3] + 1e-7)
        x_vals = pix_xy[:, :, :, 0].reshape(b, f, dc, h, w)
        y_vals = pix_xy[:, :, :, 1].reshape(b, f, dc, h, w)
        gx = (x_vals / (w - 1) - 0.5) * 2.0
        gy = (y_vals / (h - 1) - 0.5) * 2.0
        grid = jnp.stack([gx, gy], axis=-1)                    # (B, F, Dc, h, w, 2)

        # grid stays f32 (bf16 would quantize pixel coords by ~0.25 px);
        # grid_sample computes its corner weights in the image dtype, so a
        # bf16 volume keeps the gather AND the lerp at half traffic
        if warp_impl.startswith("pallas"):
            from polardepth_tpu.ops.pallas.band_warp import band_warp
            spec = warp_impl[len("pallas"):]
            fast = spec.endswith("_fast")
            spec = spec.removesuffix("_fast")
            warped = band_warp(
                lookup_feats.reshape(b * f, h, w, c),
                grid.reshape(b * f, dc * h, w, 2),
                k=int(spec) if spec else 8,
                align_corners=True, fast=fast,
            ).reshape(b, f, dc, h, w, c)
        else:
            warped = grid_sample(
                lookup_feats.reshape(b * f, h, w, c),
                grid.reshape(b * f, dc * h, w, 2),
                padding_mode="zeros", align_corners=True,
            ).reshape(b, f, dc, h, w, c)

        # edge masking: lookup-image border and current-image border, 2 px
        edge = ((x_vals >= 2.0) & (x_vals <= w - 2) &
                (y_vals >= 2.0) & (y_vals <= h - 2)).astype(dt)
        edge = edge * interior[None, None, None]

        diffs = jnp.mean(jnp.abs(warped - current_feats[:, None, None]),
                         axis=-1)
        diffs = diffs * edge * frame_valid[:, :, None, None, None]
        return jnp.sum(diffs, axis=1), jnp.sum((diffs > 0).astype(dt), axis=1)

    if bin_chunk and 0 < bin_chunk < d and d % bin_chunk == 0:
        cost, counts = jax.lax.map(
            chunk_cost, depth_bins.reshape(d // bin_chunk, bin_chunk))
        # (n, B, Dc, h, w) -> (B, n*Dc, h, w); bins stay in order
        cost = jnp.moveaxis(cost, 0, 1).reshape(b, d, h, w)
        counts = jnp.moveaxis(counts, 0, 1).reshape(b, d, h, w)
    else:
        cost, counts = chunk_cost(depth_bins)
    cost = cost / (counts + 1e-7)

    missing = (cost == 0).astype(dt)
    cost = cost * (1 - missing) + jnp.max(cost, axis=1, keepdims=True) * missing
    return cost, missing


class CostVolumeEncoder(nn.Module):
    """5-level encoder with a cost volume injected after layer1."""

    num_depth_bins: int = 96
    depth_binning: str = "linear"
    compute_dtype: str = "float32"
    bin_chunk: int = 16  # memory bound on the warp temp; see build_cost_volume
    warp_impl: str = "xla"  # plane-sweep sampler; see build_cost_volume
    # The cost volume is stop_gradient'ed, so rematerialising it in the
    # backward pass is pure waste (the round-3 profile showed the whole
    # plane sweep running TWICE per step under whole-module remat).  When
    # the caller wants rematerialisation it sets remat_trunk and only the
    # grad-bearing conv trunk after the volume is recomputed.
    remat_trunk: bool = False
    # Matching costs are smooth L1 feature means; bfloat16 halves the
    # gather/diff HBM traffic of the sweep (the student step's dominant
    # cost) at ~3-digit cost precision.  f32 keeps exact reference parity
    # and stays the default via compute_dtype.
    volume_dtype_follows_compute: bool = True

    @nn.compact
    def __call__(self, current_image, lookup_images, rel_poses, K, inv_K,
                 min_depth_bin, max_depth_bin, train: bool = False):
        """Args mirror the reference forward (resnet_encoder.py:562-707):
          current_image: (B, H, W, 3) in [0, 1]
          lookup_images: (B, F, H, W, 3)
          rel_poses: (B, F, 4, 4)
          K, inv_K: (B, 4, 4) at 1/4 scale (the reference feeds ("K", 2))
          min/max_depth_bin: scalars (python or traced — adaptive bins)

        Returns (features list of 5, lowest_cost (B, h, w), confidence_mask
        (B, h, w)).
        """
        # extractor is rematted along with the trunk (its 1/2-res
        # activations are the encoder's big residuals); only the
        # stop_gradient'ed plane sweep below runs exactly once
        ext_cls = (nn.remat(_FeatureExtractor, static_argnums=(2,))
                   if self.remat_trunk else _FeatureExtractor)
        extractor = ext_cls(self.compute_dtype)
        f0, f1 = extractor(current_image, train)

        b, nf, hh, ww, ch = lookup_images.shape
        lookup_flat = lookup_images.reshape(b * nf, hh, ww, ch)
        _, lookup_feats = extractor(lookup_flat, train)
        lookup_feats = jax.lax.stop_gradient(
            lookup_feats.reshape(b, nf, *lookup_feats.shape[1:]))

        vol_dt = (jnp.dtype(self.compute_dtype)
                  if self.volume_dtype_follows_compute else jnp.float32)
        bins = compute_depth_bins(min_depth_bin, max_depth_bin,
                                  self.num_depth_bins, self.depth_binning)
        cost, missing = build_cost_volume(
            jax.lax.stop_gradient(f1.astype(vol_dt)),
            lookup_feats.astype(vol_dt), rel_poses, K, inv_K,
            bins.astype(jnp.float32), bin_chunk=self.bin_chunk,
            warp_impl=self.warp_impl)
        cost = jax.lax.stop_gradient(cost).astype(jnp.float32)
        missing = jax.lax.stop_gradient(missing).astype(jnp.float32)

        observed = ((cost * (1 - missing)) > 0).astype(jnp.float32)
        confidence = (jnp.sum(observed, axis=1)
                      == self.num_depth_bins).astype(jnp.float32)

        viz = jnp.where(cost == 0, 100.0, cost)
        argmin = jnp.argmin(viz, axis=1)
        lowest_cost = 1.0 / jnp.take(bins, argmin)

        cost_masked = (cost * confidence[:, None]).astype(f1.dtype)
        # NHWC: volume bins become channels for the reduce conv
        vol = jnp.transpose(cost_masked, (0, 2, 3, 1))

        def trunk(mdl, f1_in, vol_in):
            fused = nn.relu(TorchConv(64, 3, padding=1,
                                      )(jnp.concatenate([f1_in, vol_in],
                                                        axis=-1)))
            f2 = _layer(fused, 128, 2, 2, train)
            f3 = _layer(f2, 256, 2, 2, train)
            f4 = _layer(f3, 512, 2, 2, train)
            return f2, f3, f4

        trunk_fn = nn.remat(trunk) if self.remat_trunk else trunk
        f2, f3, f4 = trunk_fn(self, f1, vol)
        return [f0, f1, f2, f3, f4], lowest_cost, confidence
