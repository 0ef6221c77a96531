"""DPT segmentation model + MiDaS/DPT host transforms
(reference dpt/models.py:126-153, dpt/transforms.py:6-231)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polardepth_tpu.data.dpt_transforms import (
    Resize, NormalizeImage, PrepareForNet, Compose, apply_min_size,
    dpt_transform,
)


def _sample(h, w):
    rng = np.random.default_rng(0)
    return {
        "image": rng.random((h, w, 3), np.float32),
        "disparity": rng.random((h, w), np.float32),
        "mask": rng.random((h, w)) > 0.5,
    }


# ---- Resize.get_size: the reference's bound arithmetic -------------------

def test_lower_bound_keep_aspect():
    r = Resize(384, 384, keep_aspect_ratio=True, ensure_multiple_of=32,
               resize_method="lower_bound")
    # 640x480 input: scale = max(384/640, 384/480) = 0.8 -> 512x384
    assert r.get_size(640, 480) == (512, 384)
    # both dims must end >= 384 and % 32 == 0
    w, h = r.get_size(1000, 300)
    assert w >= 384 and h >= 384 and w % 32 == 0 and h % 32 == 0


def test_upper_bound_keep_aspect():
    r = Resize(384, 384, keep_aspect_ratio=True, ensure_multiple_of=32,
               resize_method="upper_bound")
    w, h = r.get_size(640, 480)
    assert w <= 384 and h <= 384 and w % 32 == 0 and h % 32 == 0
    # scale = min(0.6, 0.8) = 0.6 -> 384x288
    assert (w, h) == (384, 288)


def test_minimal_picks_closest_scale():
    r = Resize(400, 300, keep_aspect_ratio=True, resize_method="minimal")
    # scales: w 400/420 = 0.952 (closer to 1), h 300/200 = 1.5 -> use w
    w, h = r.get_size(420, 200)
    assert (w, h) == (400, 190)  # round(200 * 0.952)


def test_no_keep_aspect_stretches():
    r = Resize(384, 192, resize_method="lower_bound")
    assert r.get_size(640, 480) == (384, 192)


def test_unknown_method_raises():
    r = Resize(64, 64, keep_aspect_ratio=True, resize_method="nope")
    with pytest.raises(ValueError):
        r.get_size(100, 100)


def test_resize_call_resizes_targets_nearest():
    s = _sample(100, 160)
    r = Resize(64, 64, resize_target=True, keep_aspect_ratio=True,
               resize_method="upper_bound")
    out = r(dict(s))
    h, w = out["image"].shape[:2]
    assert out["disparity"].shape == (h, w)
    assert out["mask"].shape == (h, w) and out["mask"].dtype == bool
    # nearest-neighbour: every target value existed in the source
    assert np.isin(out["disparity"], s["disparity"]).all()


def test_resize_target_false_leaves_targets():
    s = _sample(100, 160)
    out = Resize(64, 64, resize_target=False, keep_aspect_ratio=True,
                 resize_method="upper_bound")(dict(s))
    assert out["disparity"].shape == (100, 160)


def test_apply_min_size_grows_keeping_aspect():
    s = _sample(50, 80)
    out = apply_min_size(dict(s), (100, 100))
    h, w = out["disparity"].shape
    assert h >= 100 and w >= 100
    assert out["image"].shape[:2] == (h, w)
    # no-op when already large enough
    s2 = _sample(200, 200)
    out2 = apply_min_size(dict(s2), (100, 100))
    assert out2["disparity"].shape == (200, 200)


def test_normalize_and_prepare():
    s = _sample(32, 32)
    pipe = Compose([NormalizeImage(0.5, 0.25), PrepareForNet()])
    out = pipe(dict(s))
    np.testing.assert_allclose(out["image"], (s["image"] - 0.5) / 0.25,
                               rtol=1e-6)
    assert out["image"].dtype == np.float32
    assert out["mask"].dtype == np.float32  # bool -> float like the ref
    assert out["image"].flags["C_CONTIGUOUS"]


def test_dpt_transform_end_to_end():
    s = {"image": np.random.default_rng(1).random((97, 143, 3),
                                                  np.float32)}
    out = dpt_transform(64, 64)(s)
    h, w = out["image"].shape[:2]
    assert h % 32 == 0 and w % 32 == 0
    assert out["image"].dtype == np.float32


# ---- DPTSegmentationModel -------------------------------------------------

def test_segmentation_model_forward_and_bn():
    from polardepth_tpu.models.dpt import DPTSegmentationModel, VARIANTS
    VARIANTS["tiny_seg"] = dict(depth=2, dim=32, heads=2, hooks=(0, 1, 0, 1),
                                reassemble=(16, 24, 32, 32), hybrid=False)
    m = DPTSegmentationModel(num_classes=7, backbone="tiny_seg")
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 48, 3)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables  # BN-enabled fusion (use_bn=True)
    y = m.apply(variables, x)
    assert y.shape == (2, 32, 48, 7)
    assert jnp.isfinite(y).all()
    # train mode updates the running statistics
    y2, mut = m.apply(variables, x, train=True, mutable=["batch_stats"],
                      rngs={"dropout": jax.random.PRNGKey(1)})
    flat_old = jax.tree_util.tree_leaves(variables["batch_stats"])
    flat_new = jax.tree_util.tree_leaves(mut["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(flat_old, flat_new))


def test_depth_model_unchanged_param_names():
    # the trunk refactor must not move any DPTDepthModel parameter
    from polardepth_tpu.models.dpt import DPTDepthModel, VARIANTS
    VARIANTS["tiny_seg2"] = dict(depth=2, dim=32, heads=2,
                                 hooks=(0, 1, 0, 1),
                                 reassemble=(16, 24, 32, 32), hybrid=False)
    m = DPTDepthModel(backbone="tiny_seg2")
    x = jnp.zeros((1, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    for key in ("patch_proj", "cls_token", "pos_embed", "block0",
                "readout0", "reassemble0", "upsample0", "layer1_rn",
                "refinenet4", "refinenet1", "head1", "head2", "head3"):
        assert key in params, key
    assert "resConfUnit2" in params["refinenet4"]
    assert "bn1" not in params["refinenet4"]["resConfUnit2"]  # no BN here
