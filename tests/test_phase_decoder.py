"""Phase-packed decoder exactness.

The packed execution plan (ops/phase.py) claims mathematical identity with
the reference decoder graph (reference manydepth/networks/depth_decoder.py:
57-75 upsample+conv stages): same parameters, exact everywhere including
borders.  Pinned here in float64 (bit-level identity up to ~1e-12 from fp
reassociation only); in float32 the folded kernels change the reduction
order, so the integration check carries a small tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from polardepth_tpu.models.depth_decoder import DepthDecoder
from polardepth_tpu.ops.phase import (
    space_to_depth, depth_to_space, packed_conv_exact, packed_upconv_exact,
    packed_upconv_from_packed_exact, conv_ref)
from polardepth_tpu.ops.resize import upsample2x


@pytest.mark.parametrize("pad", ["zero", "reflect"])
def test_phase_ops_exact_f64(pad):
    rng = np.random.RandomState(0)
    B, R, S, C, Cout = 2, 8, 12, 5, 7
    x = jnp.asarray(rng.randn(B, 2 * R, 2 * S, C))
    b = jnp.asarray(rng.randn(Cout))

    w = jnp.asarray(rng.randn(3, 3, C, Cout))
    ref = space_to_depth(conv_ref(x, w, b, pad))
    got = packed_conv_exact(space_to_depth(x), w, b, pad)
    np.testing.assert_allclose(got, ref, atol=1e-12)

    xs = jnp.asarray(rng.randn(B, R, S, C))
    skip = jnp.asarray(rng.randn(B, 2 * R, 2 * S, 3))
    w2 = jnp.asarray(rng.randn(3, 3, C + 3, Cout))
    ref2 = space_to_depth(conv_ref(
        jnp.concatenate([upsample2x(xs), skip], axis=-1), w2, b, pad))
    got2 = packed_upconv_exact(xs, w2, b, pad, skip=skip)
    np.testing.assert_allclose(got2, ref2, atol=1e-12)

    w3 = jnp.asarray(rng.randn(3, 3, C, Cout))
    ref3 = space_to_depth(conv_ref(upsample2x(xs), w3, b, pad))
    got3 = packed_upconv_exact(xs, w3, b, pad, skip=None)
    np.testing.assert_allclose(got3, ref3, atol=1e-12)

    xp = space_to_depth(x)
    ref4 = space_to_depth(conv_ref(upsample2x(x), w3, b, pad))
    got4 = packed_upconv_from_packed_exact(xp, w3, b, pad)
    np.testing.assert_allclose(got4, ref4, atol=1e-12)


def test_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 6, 8, 3))
    np.testing.assert_array_equal(depth_to_space(space_to_depth(x)), x)


def _features(rng, dtype, b=2, h=64, w=96):
    chans = (64, 64, 128, 256, 512)
    return [jnp.asarray(rng.randn(b, h >> s, w >> s, c), dtype)
            for s, c in zip(range(1, 6), chans)]


@pytest.mark.parametrize("pad", ["zero", "reflect"])
def test_decoder_phase_packed_exact_f64(pad):
    rng = np.random.RandomState(2)
    feats = _features(rng, jnp.float64)
    base = DepthDecoder(pad_mode=pad)
    # flax default param_dtype is f32; upcast so the on-the-fly kernel
    # folding (phase_up_kernel/phase_pack_kernel) is itself exact and the
    # two graphs agree to f64 rounding.
    params = jax.tree.map(lambda a: a.astype(jnp.float64),
                          base.init(jax.random.PRNGKey(0), feats))
    ref = base.apply(params, feats)
    got = DepthDecoder(pad_mode=pad, phase_packed=True).apply(params, feats)
    assert set(got) == set(ref)
    for k in ref:
        # The disp heads are pinned to float32 BY DESIGN (see DepthDecoder:
        # bf16 disparity would quantize depth ~0.4%), so the packed scales
        # 0/1 can only match to f32 head-conv rounding; everything upstream
        # of the heads is exact in f64 (pinned by the op-level tests above).
        atol = 1e-12 if k[1] >= 2 else 3e-6
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   atol=atol, err_msg=str(k))


def test_decoder_phase_packed_f32_tol():
    """In f32 the folded kernels reassociate the reduction; the disp delta
    stays well below the bf16 quantization the eval CI guard already
    tolerates (~4e-3)."""
    rng = np.random.RandomState(3)
    feats = _features(rng, jnp.float32)
    base = DepthDecoder()
    params = base.init(jax.random.PRNGKey(0), feats)
    ref = base.apply(params, feats)
    got = DepthDecoder(phase_packed=True).apply(params, feats)
    for k in ref:
        d = float(jnp.abs(got[k] - ref[k]).max())
        assert d < 1e-3, (k, d)


def test_decoder_phase_packed_grad_parity():
    """The packed plan computes the same function, so parameter gradients
    match the unpacked graph (f64 params; the f32-pinned disp heads bound
    the residual)."""
    rng = np.random.RandomState(5)
    feats = _features(rng, jnp.float64, h=32, w=64)
    base = DepthDecoder()
    params = jax.tree.map(lambda a: a.astype(jnp.float64),
                          base.init(jax.random.PRNGKey(0), feats))

    def loss(p, packed):
        out = DepthDecoder(phase_packed=packed).apply(p, feats)
        return sum(jnp.sum(v ** 2) for v in out.values())

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_pk = jax.grad(lambda p: loss(p, True))(params)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pk = jax.tree.leaves(g_pk)
    assert len(flat_ref) == len(flat_pk)
    for a, b in zip(flat_ref, flat_pk):
        scale = float(jnp.abs(a).max()) + 1e-8
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5 * scale)


def test_decoder_phase_packed_falls_back():
    """Configs outside the packed plan's envelope (uncertainty heads, no
    scale 0) silently run the original graph."""
    rng = np.random.RandomState(4)
    feats = _features(rng, jnp.float32)
    base = DepthDecoder(uncertainty=True)
    params = base.init(jax.random.PRNGKey(0), feats)
    ref = base.apply(params, feats)
    got = DepthDecoder(uncertainty=True, phase_packed=True).apply(
        params, feats)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(ref[k]))
