"""Phase-packed (space-to-depth) execution of the decoder's full-resolution
small-channel stages.

Why: the roofline analysis (PERF.md round-3) shows the depth decoder running
~2x above its realistic MXU floor.  The full-res stages produce tensors with
minor dim 16-32; XLA's TPU layout tiles the minor dimension to 128 lanes, so
a (B, H, W, 16) activation pays an 8x HBM-traffic tax and its convs run at
12.5% MXU lane utilization.  Packing 2x2 spatial phases into channels keeps
every materialized tensor at >=64 lanes *without changing the math*: because
the x2 bilinear upsample (ops/resize.upsample2x) and the 3x3 convs are
linear and translation-equivariant, `conv3x3(upsample2x(x))` is EXACTLY a
3x3 conv on x producing the four output phases, with a kernel that is a
fixed linear transform of the original weights.  Checkpoints are unchanged:
the packed kernels are derived on the fly from the standard (3,3,Cin,Cout)
parameters.

The reference executes these stages as materialized upsample + conv
(manydepth/networks/depth_decoder.py:57-75, manydepth/layers.py:446-449);
this module is the TPU-native execution plan for the same function.

Conventions:
  * packed layout: (B, H/2, W/2, 4C) with phase-major channels
    c_packed = (p*2 + q)*C + c  for output pixel (2i+p, 2j+q).
  * All fused ops are exact in the interior by construction; a 1-packed-
    pixel (2 full-res pixels) border ring is recomputed with the original
    ops on thin slabs and patched in, so the result is exact EVERYWHERE
    (to dtype rounding) for both "zero" and "reflect" conv padding.

Exactness is pinned by tests/test_phase_decoder.py against the unfused ops
in float64.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from polardepth_tpu.ops.resize import upsample2x

# 1-D phase transforms folding the x2 bilinear upsample (align_corners=False,
# edge-clamped) into a following 3-tap conv.  For interior pixels:
#   out[2i]   = W0*u[2i-1] + W1*u[2i] + W2*u[2i+1]
#   u[2i]     = 0.25 x[i-1] + 0.75 x[i];   u[2i+1] = 0.75 x[i] + 0.25 x[i+1]
# giving out[2i]   = K0 . x[i-1:i+2],  K0 = _T[0] @ (W0,W1,W2)
#        out[2i+1] = K1 . x[i-1:i+2],  K1 = _T[1] @ (W0,W1,W2)
_T = np.array([
    [[0.75, 0.25, 0.00],
     [0.25, 0.75, 0.75],
     [0.00, 0.00, 0.25]],
    [[0.25, 0.00, 0.00],
     [0.75, 0.75, 0.25],
     [0.00, 0.25, 0.75]],
])


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(B, 2R, 2S, C) -> (B, R, S, 4C), phase-major channel order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """(B, R, S, 4C) -> (B, 2R, 2S, C), inverse of space_to_depth."""
    b, r, s, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, r, s, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * r, 2 * s, c)


def phase_up_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) conv kernel -> (3,3,Cin,4Cout) kernel K such that
    conv_same(x, K) == space_to_depth(conv_same(upsample2x(x), w)) in the
    interior (x spatial, output packed)."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    t = jnp.asarray(_T, dtype=w.dtype)
    k = jnp.einsum("puk,qvl,klio->uvipqo", t, t, w)
    return k.reshape(3, 3, cin, 4 * cout)


def phase_pack_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(3,3,Cin,Cout) kernel of a plain full-res conv -> (3,3,4Cin,4Cout)
    kernel operating on packed input and producing packed output."""
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    out = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for p in range(2):
        for k in range(3):
            m = p - 1 + k          # full-res row offset
            u = m >> 1             # packed row offset (floor div)
            a = m - 2 * u          # input row phase
            for q in range(2):
                for l in range(3):
                    n = q - 1 + l
                    v = n >> 1
                    bq = n - 2 * v
                    out = out.at[
                        u + 1, v + 1,
                        (a * 2 + bq) * cin:(a * 2 + bq + 1) * cin,
                        (p * 2 + q) * cout:(p * 2 + q + 1) * cout,
                    ].add(w[k, l])
    return out


def conv_same(x: jnp.ndarray, w: jnp.ndarray,
              b: jnp.ndarray | None = None) -> jnp.ndarray:
    """3x3 SAME (zero-pad) conv, NHWC, weights cast to the input dtype
    (matches nn.Conv(dtype=x.dtype) accumulation semantics)."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def conv_ref(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None,
             pad_mode: str) -> jnp.ndarray:
    """The original full-res conv (ReflectConv semantics) used for border
    slabs: reflect- or zero-padded 3x3."""
    if pad_mode == "reflect":
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        y = lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    else:
        y = conv_same(x, w)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _tile_bias(b: jnp.ndarray, n: int = 4) -> jnp.ndarray:
    return jnp.tile(b, n)


def _patch4(y, top, bot, left, right):
    y = y.at[:, :1].set(top)
    y = y.at[:, -1:].set(bot)
    y = y.at[:, :, :1].set(left)
    y = y.at[:, :, -1:].set(right)
    return y


def packed_conv_exact(xp: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray | None,
                      pad_mode: str) -> jnp.ndarray:
    """Plain 3x3 full-res conv, packed in / packed out, exact everywhere.

    Equivalent to space_to_depth(conv_ref(depth_to_space(xp), w, b, pad)).
    """
    y = conv_same(xp, phase_pack_kernel(w),
                  _tile_bias(b) if b is not None else None)

    def orig(slab):
        return conv_ref(slab, w, b, pad_mode)

    top = space_to_depth(orig(depth_to_space(xp[:, :2]))[:, :2])
    bot = space_to_depth(orig(depth_to_space(xp[:, -2:]))[:, -2:])
    left = space_to_depth(orig(depth_to_space(xp[:, :, :2]))[:, :, :2])
    right = space_to_depth(orig(depth_to_space(xp[:, :, -2:]))[:, :, -2:])
    return _patch4(y, top, bot, left, right)


def packed_upconv_exact(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                        pad_mode: str,
                        skip: jnp.ndarray | None = None) -> jnp.ndarray:
    """conv3x3(concat([upsample2x(x), skip]), w) with packed output, exact.

    x: spatial (B, R, S, Cx); skip: spatial (B, 2R, 2S, Cs) or None; w's
    input dim is Cx (+ Cs).  Returns (B, R, S, 4Cout).
    """
    cx = x.shape[-1]
    y = conv_same(x, phase_up_kernel(w[:, :, :cx]))
    if skip is not None:
        y = y + conv_same(space_to_depth(skip),
                          phase_pack_kernel(w[:, :, cx:]))
    y = y + _tile_bias(b).astype(y.dtype)

    def orig(u_slab, s_slab):
        z = (jnp.concatenate([u_slab, s_slab], axis=-1)
             if s_slab is not None else u_slab)
        return conv_ref(z, w, b, pad_mode)

    none = skip is None
    top = space_to_depth(orig(
        upsample2x(x[:, :2])[:, :3],
        None if none else skip[:, :3])[:, :2])
    bot = space_to_depth(orig(
        upsample2x(x[:, -2:])[:, 1:],
        None if none else skip[:, -3:])[:, -2:])
    left = space_to_depth(orig(
        upsample2x(x[:, :, :2])[:, :, :3],
        None if none else skip[:, :, :3])[:, :, :2])
    right = space_to_depth(orig(
        upsample2x(x[:, :, -2:])[:, :, 1:],
        None if none else skip[:, :, -3:])[:, :, -2:])
    return _patch4(y, top, bot, left, right)


def packed_upconv_from_packed_exact(xp: jnp.ndarray, w: jnp.ndarray,
                                    b: jnp.ndarray,
                                    pad_mode: str) -> jnp.ndarray:
    """Same as packed_upconv_exact (no skip) but the input is ALREADY packed:
    xp (B, R, S, 4C) == spatial (2R, 2S, C).  The fused kernel is the
    composition phase_pack_kernel(phase_up_kernel(w)): one conv at (R, S)
    producing 16 phases, then one depth_to_space to the (2R, 2S, 4Cout)
    packed output.  The full-res (4R, 4S, Cout) tensor never materializes.
    """
    k = phase_pack_kernel(phase_up_kernel(w))          # (3,3,4C,16Cout)
    y = conv_same(xp, k, _tile_bias(b, 16))
    y = depth_to_space(y)                              # (B, 2R, 2S, 4Cout)

    t = upsample2x(depth_to_space(xp[:, :2]))          # rows 0..6 exact
    top = space_to_depth(conv_ref(t[:, :3], w, b, pad_mode)[:, :2])
    bm = upsample2x(depth_to_space(xp[:, -2:]))[:, 1:]  # rows 1..7 exact
    bot = space_to_depth(conv_ref(bm[:, -3:], w, b, pad_mode)[:, -2:])
    lf = upsample2x(depth_to_space(xp[:, :, :2]))[:, :, :3]
    left = space_to_depth(conv_ref(lf, w, b, pad_mode)[:, :, :2])
    rt = upsample2x(depth_to_space(xp[:, :, -2:]))[:, :, -3:]
    right = space_to_depth(conv_ref(rt, w, b, pad_mode)[:, :, -2:])
    return _patch4(y, top, bot, left, right)
