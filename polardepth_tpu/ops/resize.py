"""Image resizing with exact torch F.interpolate semantics, as MXU matmuls.

The reference leans on torch bilinear resizing in three places: the decoder's
x2 upsample (manydepth/layers.py:446-449), upsampling each disparity scale to
full resolution before disp_to_depth (trainer.py:538-539), and nearest resize
for masks (trainer.py:617-623).  On TPU, gather-based resampling wastes the
MXU; a fixed (in, out) resize is a *linear map*, so we materialise the exact
torch interpolation weights as small host constants (float64, then cast) and
apply them as two separable matmuls — resize literally runs on the systolic
array and fuses with neighbouring ops.

Semantics implemented (verified against torch in tests/test_resize.py):
  * bilinear, align_corners=False:  src = (dst + 0.5) * in/out - 0.5,
    clamped to >= 0 before the floor/lambda split, indices clamped to in-1.
  * bilinear, align_corners=True:   src = dst * (in-1)/(out-1).
  * nearest (legacy torch "nearest"): src = floor(dst * in/out).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=256)
def _linear_weights(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out, in) dense row-stochastic interpolation matrix, float64."""
    W = np.zeros((out_size, in_size))
    if in_size == 1:
        W[:, 0] = 1.0
        return W
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = dst * (in_size - 1) / max(out_size - 1, 1)
    else:
        src = (dst + 0.5) * (in_size / out_size) - 0.5
        src = np.maximum(src, 0.0)  # torch clamps before splitting
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    lam = src - i0
    W[dst.astype(np.int64), i0] += 1.0 - lam
    W[dst.astype(np.int64), i1] += lam
    return W


@functools.lru_cache(maxsize=256)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    dst = np.arange(out_size, dtype=np.float64)
    idx = np.floor(dst * (in_size / out_size)).astype(np.int64)
    return np.minimum(idx, in_size - 1)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int],
                    align_corners: bool = False) -> jnp.ndarray:
    """NHWC bilinear resize with torch semantics via separable matmuls."""
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    dt = x.dtype
    if h != oh:
        mh = jnp.asarray(_linear_weights(h, oh, align_corners), dtype=dt)
        x = jnp.einsum("oh,bhwc->bowc", mh, x)
    if w != ow:
        mw = jnp.asarray(_linear_weights(w, ow, align_corners), dtype=dt)
        x = jnp.einsum("ow,bhwc->bhoc", mw, x)
    return x


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """NHWC nearest resize (torch legacy 'nearest'); dtype-preserving, so it
    is safe for integer instance masks."""
    _, h, w, _ = x.shape
    oh, ow = out_hw
    if (h, w) == (oh, ow):
        return x
    if h != oh:
        x = jnp.take(x, jnp.asarray(_nearest_indices(h, oh)), axis=1)
    if w != ow:
        x = jnp.take(x, jnp.asarray(_nearest_indices(w, ow)), axis=2)
    return x


def _up2_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact x2 bilinear (align_corners=False) along one axis as a 2-tap
    stencil: dst[2i] = 0.25 src[i-1] + 0.75 src[i] (edge-clamped),
    dst[2i+1] = 0.75 src[i] + 0.25 src[i+1].  Equivalent to the dense-matmul
    weights but pure VPU shift-adds — the decoder runs this at full
    resolution with 16 channels, where a dense matmul wastes the MXU."""
    prev = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis=axis)
    nxt = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
         jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis],
                              axis=axis)], axis=axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return stacked.reshape(shape)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear x2 upsample, align_corners=False (reference layers.upsample)."""
    return _up2_axis(_up2_axis(x, 1), 2)


def resize_antialias(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Anti-aliased linear resize for native->working-resolution downscale.

    The reference downsizes with PIL's area-averaged bilinear
    (mono_dataset.py Resize(..., ANTIALIAS)); jax.image.resize with
    antialias=True applies the same triangle filter with scale-widened
    support.  Used on the device ingest path where PIL parity is approximate
    by design (documented deviation).
    """
    import jax
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="linear",
                            antialias=True)
