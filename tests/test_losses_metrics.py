"""Losses, SSIM, smoothness, metrics, disp_to_depth, SE3 parity tests.

Oracles: torch (CPU) re-implementations following the reference formulas
(manydepth/layers.py), written independently here."""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from polardepth_tpu.ops.depth import disp_to_depth, depth_to_disp  # noqa: E402
from polardepth_tpu.ops.metrics import compute_depth_errors  # noqa: E402
from polardepth_tpu.ops.losses import (  # noqa: E402
    smooth_loss, ssim, reprojection_loss, masked_l1_depth_loss, berhu_loss,
)
from polardepth_tpu.ops.se3 import (  # noqa: E402
    transformation_from_parameters, rot_from_axisangle,
)


def _rand(shape, seed=0, lo=0.0, hi=1.0):
    return np.random.default_rng(seed).uniform(lo, hi, shape).astype(np.float32)


def test_disp_to_depth_roundtrip_and_range():
    disp = jnp.asarray(_rand((2, 4, 4, 1)))
    scaled, depth = disp_to_depth(disp, 0.1, 2.0)
    d = np.asarray(depth)
    assert d.min() >= 0.1 - 1e-5 and d.max() <= 2.0 + 1e-5
    back = np.asarray(depth_to_disp(depth, 0.1, 2.0))
    np.testing.assert_allclose(back, np.asarray(disp), rtol=1e-5, atol=1e-6)
    # formula parity (layers.py:62-71)
    want = 1.0 / (1 / 2.0 + (1 / 0.1 - 1 / 2.0) * np.asarray(disp))
    np.testing.assert_allclose(d, want, rtol=1e-6)


def test_depth_errors_match_numpy_oracle():
    gt = _rand((1000,), seed=1, lo=0.1, hi=2.0).astype(np.float64)
    pred = np.clip(gt + _rand((1000,), seed=2, lo=-0.3, hi=0.3), 0.1, 2.0)
    m = compute_depth_errors(jnp.asarray(gt), jnp.asarray(pred))
    thresh = np.maximum(gt / pred, pred / gt)
    np.testing.assert_allclose(float(m["a1"]), (thresh < 1.25).mean(), atol=1e-6)
    np.testing.assert_allclose(float(m["a3"]), (thresh < 1.25 ** 3).mean(), atol=1e-6)
    np.testing.assert_allclose(float(m["rmse"]),
                               np.sqrt(((gt - pred) ** 2).mean()), rtol=1e-5)
    np.testing.assert_allclose(float(m["rmse_log"]),
                               np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean()),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m["abs_rel"]),
                               (np.abs(gt - pred) / gt).mean(), rtol=1e-5)
    np.testing.assert_allclose(float(m["sq_rel"]),
                               ((gt - pred) ** 2 / gt).mean(), rtol=1e-5)


def test_depth_errors_masked_equals_subset():
    gt = _rand((500,), seed=3, lo=0.2, hi=1.9).astype(np.float64)
    pred = np.clip(gt * _rand((500,), seed=4, lo=0.8, hi=1.2), 0.1, 2.0)
    mask = (np.arange(500) % 3 == 0)
    m_masked = compute_depth_errors(jnp.asarray(gt), jnp.asarray(pred),
                                    jnp.asarray(mask))
    m_subset = compute_depth_errors(jnp.asarray(gt[mask]), jnp.asarray(pred[mask]))
    for k in m_masked:
        np.testing.assert_allclose(float(m_masked[k]), float(m_subset[k]),
                                   rtol=1e-5, atol=1e-7)


def test_smooth_loss_matches_torch_oracle():
    disp = _rand((2, 8, 10, 1), seed=5)
    img = _rand((2, 8, 10, 3), seed=6)
    dt = torch.from_numpy(disp).permute(0, 3, 1, 2)
    it = torch.from_numpy(img).permute(0, 3, 1, 2)
    gdx = torch.abs(dt[:, :, :, :-1] - dt[:, :, :, 1:])
    gdy = torch.abs(dt[:, :, :-1, :] - dt[:, :, 1:, :])
    gix = torch.mean(torch.abs(it[:, :, :, :-1] - it[:, :, :, 1:]), 1, keepdim=True)
    giy = torch.mean(torch.abs(it[:, :, :-1, :] - it[:, :, 1:, :]), 1, keepdim=True)
    want = (gdx * torch.exp(-gix)).mean() + (gdy * torch.exp(-giy)).mean()
    got = float(smooth_loss(jnp.asarray(disp), jnp.asarray(img)))
    np.testing.assert_allclose(got, float(want), rtol=1e-5)


def _torch_ssim(x, y):
    """Reference SSIM (layers.py:468-499) in torch."""
    pad = torch.nn.ReflectionPad2d(1)
    pool = torch.nn.AvgPool2d(3, 1)
    x, y = pad(x), pad(y)
    mu_x, mu_y = pool(x), pool(y)
    sx = pool(x ** 2) - mu_x ** 2
    sy = pool(y ** 2) - mu_y ** 2
    sxy = pool(x * y) - mu_x * mu_y
    n = (2 * mu_x * mu_y + 0.01 ** 2) * (2 * sxy + 0.03 ** 2)
    d = (mu_x ** 2 + mu_y ** 2 + 0.01 ** 2) * (sx + sy + 0.03 ** 2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_matches_torch_oracle():
    x = _rand((2, 8, 9, 3), seed=7)
    y = _rand((2, 8, 9, 3), seed=8)
    want = _torch_ssim(torch.from_numpy(x).permute(0, 3, 1, 2),
                       torch.from_numpy(y).permute(0, 3, 1, 2))
    got = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got, want.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_reprojection_loss_weighting():
    x = _rand((1, 6, 6, 3), seed=9)
    y = _rand((1, 6, 6, 3), seed=10)
    full = np.asarray(reprojection_loss(jnp.asarray(x), jnp.asarray(y)))
    l1 = np.abs(y - x).mean(-1, keepdims=True)
    s = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y))).mean(-1, keepdims=True)
    np.testing.assert_allclose(full, 0.85 * s + 0.15 * l1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(reprojection_loss(jnp.asarray(x), jnp.asarray(y), False)),
        l1, rtol=1e-6)


def test_masked_l1():
    gt = _rand((2, 4, 4, 1), seed=11, lo=0.1, hi=2.0)
    pred = _rand((2, 4, 4, 1), seed=12, lo=0.1, hi=2.0)
    mask = (_rand((2, 4, 4, 1), seed=13) > 0.5).astype(np.float32)
    got = float(masked_l1_depth_loss(jnp.asarray(gt), jnp.asarray(pred),
                                     jnp.asarray(mask)))
    want = (np.abs(gt - pred) * mask).sum() / mask.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_berhu_matches_reference_formula():
    pred = _rand((1, 5, 5, 1), seed=14)
    gt = _rand((1, 5, 5, 1), seed=15)
    c = 0.2 * (pred - gt).max()
    diff = np.abs(pred - gt)
    diff2 = np.where(diff > c, diff, 0.0) ** 2
    want = np.concatenate([diff, diff2], axis=-1).mean(-1, keepdims=True)
    got = np.asarray(berhu_loss(jnp.asarray(pred), jnp.asarray(gt)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _torch_rot_from_axisangle(vec):
    """Reference rot_from_axisangle (layers.py:110-149) in torch."""
    angle = torch.norm(vec, 2, 2, True)
    axis = vec / (angle + 1e-7)
    ca, sa = torch.cos(angle), torch.sin(angle)
    C = 1 - ca
    x, y, z = (axis[..., i].unsqueeze(1) for i in range(3))
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    rot = torch.zeros((vec.shape[0], 4, 4))
    rot[:, 0, 0] = torch.squeeze(x * xC + ca)
    rot[:, 0, 1] = torch.squeeze(xyC - zs)
    rot[:, 0, 2] = torch.squeeze(zxC + ys)
    rot[:, 1, 0] = torch.squeeze(xyC + zs)
    rot[:, 1, 1] = torch.squeeze(y * yC + ca)
    rot[:, 1, 2] = torch.squeeze(yzC - xs)
    rot[:, 2, 0] = torch.squeeze(zxC - ys)
    rot[:, 2, 1] = torch.squeeze(yzC + xs)
    rot[:, 2, 2] = torch.squeeze(z * zC + ca)
    rot[:, 3, 3] = 1
    return rot


@pytest.mark.parametrize("invert", [False, True])
def test_transformation_from_parameters_matches_torch(invert):
    aa = _rand((3, 1, 3), seed=16, lo=-0.5, hi=0.5)
    t = _rand((3, 1, 3), seed=17, lo=-1, hi=1)
    R = _torch_rot_from_axisangle(torch.from_numpy(aa))
    tt = torch.from_numpy(t).clone()
    if invert:
        R = R.transpose(1, 2)
        tt = tt * -1
    T = torch.zeros(3, 4, 4)
    T[:, 0, 0] = T[:, 1, 1] = T[:, 2, 2] = T[:, 3, 3] = 1
    T[:, :3, 3] = tt.view(-1, 3)
    want = (R @ T if invert else T @ R).numpy()
    got = np.asarray(transformation_from_parameters(
        jnp.asarray(aa), jnp.asarray(t), invert=invert))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rot_from_axisangle_is_rotation():
    aa = _rand((4, 1, 3), seed=18, lo=-2, hi=2)
    R = np.asarray(rot_from_axisangle(jnp.asarray(aa)))[:, :3, :3]
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)


def test_photometric_storage_dtype():
    """bf16 photometric STORAGE (Config.photometric_dtype) must leave the
    loss arithmetic f32 and perturb values only at the quantization scale
    (~4e-3 relative — the images' own uint8 step), and "auto" must resolve
    through compute_dtype."""
    import jax.numpy as jnp
    from polardepth_tpu.config import Config
    from polardepth_tpu.ops.losses import (
        cast_photometric, photometric_storage_dtype, reprojection_loss,
        reprojection_loss_stacked)

    assert photometric_storage_dtype(Config()) is None
    assert photometric_storage_dtype(
        Config(compute_dtype="bfloat16")) == "bfloat16"
    assert photometric_storage_dtype(
        Config(compute_dtype="bfloat16", photometric_dtype="float32")) is None
    assert photometric_storage_dtype(
        Config(photometric_dtype="bfloat16")) == "bfloat16"

    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(0, 1, (2, 24, 32, 3)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, 1, (2, 24, 32, 3)), jnp.float32)
    ref = reprojection_loss(pred, tgt)
    assert ref.dtype == jnp.float32

    cfg16 = Config(compute_dtype="bfloat16")
    p16, t16 = cast_photometric(cfg16, (pred, tgt))
    assert p16.dtype == jnp.bfloat16
    got = reprojection_loss(p16, t16)
    assert got.dtype == jnp.float32  # arithmetic stays f32
    np.testing.assert_allclose(np.asarray(got).mean(),
                               np.asarray(ref).mean(), rtol=2e-2)

    # stacked path agrees with itself under the same storage quantization
    stack = jnp.stack([pred, tgt], axis=1)
    s_ref = reprojection_loss_stacked(stack, tgt)
    s_got = reprojection_loss_stacked(stack.astype(jnp.bfloat16),
                                      t16)
    assert s_got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(s_got).mean(),
                               np.asarray(s_ref).mean(), rtol=2e-2)

    # f32 config: cast is a no-op object-wise
    same = cast_photometric(Config(), pred)
    assert same is pred or same.dtype == jnp.float32
