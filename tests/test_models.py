"""Shape/dtype/contract tests for the model zoo, plus feature-pyramid parity
with the reference's documented shapes (pre_encoders.py docstrings: for
320x480 inputs the pyramid is (64,160,240),(64,80,120),(128,40,60) + joint
(256,20,30),(512,10,15))."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polardepth_tpu.models import (
    ShallowResNet18Stem, ResNet18Encoder, ShallowEncoder,
    ShallowNormalsEncoder, JointEncoder, DepthDecoder, PoseDecoder, PoseCNN,
    PolarDepthNet,
)

H, W = 64, 96  # small multiples of 32 for fast CPU tests


def _rand(key, shape):
    return jax.random.uniform(jax.random.PRNGKey(key), shape,
                              dtype=jnp.float32)


def test_shallow_resnet_stem_shapes():
    x = _rand(0, (2, H, W, 3))
    m = ShallowResNet18Stem()
    vars_ = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(vars_, x)
    assert [f.shape for f in feats] == [
        (2, H // 2, W // 2, 64), (2, H // 4, W // 4, 64),
        (2, H // 8, W // 8, 128)]


def test_full_resnet_encoder_shapes_and_multiimage():
    x = _rand(1, (2, H, W, 6))  # two stacked frames for pose
    m = ResNet18Encoder(num_input_images=2)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(vars_, x)
    assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]
    assert feats[-1].shape == (2, H // 32, W // 32, 512)


def test_shallow_encoder_xolp():
    xolp = _rand(2, (2, H, W, 2))
    m = ShallowEncoder("XOLP", 0.1)
    vars_ = m.init(jax.random.PRNGKey(0), xolp)
    out = m.apply(vars_, xolp)
    assert out.shape == (2, H // 8, W // 8, 64)


def test_normals_encoder_from_xolp():
    xolp = jnp.stack([_rand(3, (1, H, W)) * 0.8,
                      _rand(4, (1, H, W)) * 3 - 1.5], axis=-1)
    m = ShallowNormalsEncoder(0.1)
    vars_ = m.init(jax.random.PRNGKey(0), xolp)
    out = m.apply(vars_, xolp)
    assert out.shape == (1, H // 8, W // 8, 64)
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize("use_xolp,use_normals", [
    (True, True), (True, False), (False, True), (False, False)])
def test_joint_encoder_channel_combinations(use_xolp, use_normals):
    h8, w8 = H // 8, W // 8
    rgb = _rand(5, (2, h8, w8, 128))
    xf = _rand(6, (2, h8, w8, 64)) if use_xolp else None
    nf = _rand(7, (2, h8, w8, 64)) if use_normals else None
    m = JointEncoder(0.0)
    vars_ = m.init(jax.random.PRNGKey(0), rgb, xf, nf)
    o16, o32 = m.apply(vars_, rgb, xf, nf)
    assert o16.shape == (2, h8 // 2, w8 // 2, 256)
    assert o32.shape == (2, h8 // 4, w8 // 4, 512)


def test_depth_decoder_scales_and_sigmoid_range():
    feats = [_rand(8, (1, H // 2, W // 2, 64)),
             _rand(9, (1, H // 4, W // 4, 64)),
             _rand(10, (1, H // 8, W // 8, 128)),
             _rand(11, (1, H // 16, W // 16, 256)),
             _rand(12, (1, H // 32, W // 32, 512))]
    m = DepthDecoder(scales=(0, 1, 2, 3))
    vars_ = m.init(jax.random.PRNGKey(0), feats)
    out = m.apply(vars_, feats)
    for s in range(4):
        d = np.asarray(out[("disp", s)])
        assert d.shape == (1, H // 2 ** s, W // 2 ** s, 1)
        assert d.min() >= 0.0 and d.max() <= 1.0


def test_pose_decoder_output_scaling():
    feats = [[_rand(13, (2, H // 32, W // 32, 512))]]
    m = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)
    vars_ = m.init(jax.random.PRNGKey(0), feats)
    aa, t = m.apply(vars_, feats)
    assert aa.shape == (2, 2, 1, 3) and t.shape == (2, 2, 1, 3)
    # 0.01 scaling keeps initial outputs tiny
    assert np.abs(np.asarray(aa)).max() < 0.2


def test_pose_cnn():
    x = _rand(14, (1, H, W, 6))
    m = PoseCNN(num_input_frames=2)
    vars_ = m.init(jax.random.PRNGKey(0), x)
    aa, t = m.apply(vars_, x)
    assert aa.shape == (1, 1, 1, 3) and t.shape == (1, 1, 1, 3)


@pytest.mark.parametrize("use_xolp,use_normals", [(True, True), (False, False)])
def test_polardepthnet_end_to_end(use_xolp, use_normals):
    color = _rand(15, (2, H, W, 3))
    pol = _rand(16, (2, H, W, 4)) * 255.0
    m = PolarDepthNet(augment_xolp=use_xolp, augment_normals=use_normals)
    vars_ = m.init(jax.random.PRNGKey(0), color, pol=pol)
    out = m.apply(vars_, color, pol=pol)
    assert set(out.keys()) == {("disp", s) for s in range(4)}
    assert out[("disp", 0)].shape == (2, H, W, 1)
    # component names match the reference checkpoint layout
    for name in ["rgb_encoder", "joint_encoder", "mono_depth"]:
        assert name in vars_["params"], vars_["params"].keys()
    assert ("xolp_encoder" in vars_["params"]) == use_xolp
    assert ("normals_encoder" in vars_["params"]) == use_normals


def test_polardepthnet_train_mode_runs_with_dropout_rng():
    color = _rand(17, (1, H, W, 3))
    pol = _rand(18, (1, H, W, 4)) * 255.0
    m = PolarDepthNet()
    vars_ = m.init(jax.random.PRNGKey(0), color, pol=pol)
    out, mut = m.apply(vars_, color, pol=pol, train=True,
                       rngs={"dropout": jax.random.PRNGKey(1)},
                       mutable=["batch_stats"])
    assert ("disp", 0) in out and "batch_stats" in mut


def test_depth_decoder_uncertainty_heads():
    feats = [_rand(20, (1, H // 2, W // 2, 64)),
             _rand(21, (1, H // 4, W // 4, 64)),
             _rand(22, (1, H // 8, W // 8, 128)),
             _rand(23, (1, H // 16, W // 16, 256)),
             _rand(24, (1, H // 32, W // 32, 512))]
    m = DepthDecoder(scales=(0, 1), uncertainty=True)
    vars_ = m.init(jax.random.PRNGKey(0), feats)
    out = m.apply(vars_, feats)
    for s in (0, 1):
        assert ("uncertainty", s) in out and ("uncertainty_color", s) in out
        u = np.asarray(out[("uncertainty", s)])
        assert u.min() >= 0.0 and u.max() <= 1.0


# -- fast decoder (zero-pad) mode --------------------------------------------

def test_fast_decoder_interior_parity_and_border_deviation():
    """pad_mode='zero' must agree with reflection padding everywhere except
    the 1-px border ring of a single conv block, with identical params."""
    import jax
    import jax.numpy as jnp
    from polardepth_tpu.models.layers import ConvBlockELU

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 12, 16, 8)).astype(np.float32))
    refl = ConvBlockELU(4, pad_mode="reflect")
    fast = ConvBlockELU(4, pad_mode="zero")
    vars_ = refl.init(jax.random.PRNGKey(0), x)
    a = np.asarray(refl.apply(vars_, x))
    b = np.asarray(fast.apply(vars_, x))  # same params: shapes identical
    np.testing.assert_allclose(a[:, 1:-1, 1:-1], b[:, 1:-1, 1:-1],
                               rtol=1e-6, atol=1e-6)
    assert np.abs(a - b).max() > 1e-4  # border really deviates


def test_fast_decoder_checkpoint_compatible():
    """fast_decoder changes no parameter shapes: a tree initialised in one
    mode is byte-layout valid for the other (checkpoints interchangeable)."""
    import jax
    import jax.numpy as jnp
    from polardepth_tpu.models.network import PolarDepthNet

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    pol = jnp.zeros((1, 32, 32, 4), jnp.float32)
    kw = dict(dropout_rate=0.0)
    v_refl = PolarDepthNet(**kw).init(
        jax.random.PRNGKey(0), x, pol=pol)
    v_fast = PolarDepthNet(decoder_pad_mode="zero", **kw).init(
        jax.random.PRNGKey(0), x, pol=pol)
    ta = jax.tree_util.tree_structure(v_refl)
    tb = jax.tree_util.tree_structure(v_fast)
    assert ta == tb
    for a, b in zip(jax.tree_util.tree_leaves(v_refl),
                    jax.tree_util.tree_leaves(v_fast)):
        assert a.shape == b.shape and a.dtype == b.dtype
    # and the fast graph runs with the reflect-initialised params
    out = PolarDepthNet(decoder_pad_mode="zero", **kw).apply(
        v_refl, x, pol=pol)
    assert ("disp", 0) in out
