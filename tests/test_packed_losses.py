"""Parity of the packed (channels-leading, stacked) photometric loss path
against the per-(frame, scale) NHWC reference path.

The packed path (Config.photometric_packed) is a TPU execution plan for the
same math — these tests pin exact-math equivalence (f32 tolerance) for
reprojection_loss_stacked, selfsup_losses, and student_losses, including the
RNG-matched automask tie-break noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from polardepth_tpu.config import Config
from polardepth_tpu.ops.losses import (
    reprojection_loss, reprojection_loss_stacked,
)
from polardepth_tpu.train.selfsup import selfsup_losses
from polardepth_tpu.train.student import student_losses

H, W = 32, 48
B = 2
SCALES = (0, 1, 2, 3)
FRAMES = (0, -1, 1)


def _rand(rng, *shape):
    return jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32))


def test_reprojection_loss_stacked_matches_loop():
    rng = np.random.default_rng(0)
    preds = _rand(rng, B, 5, H, W, 3)
    target = _rand(rng, B, H, W, 3)
    stacked = np.asarray(reprojection_loss_stacked(preds, target))
    for i in range(5):
        ref = np.asarray(reprojection_loss(preds[:, i], target))[..., 0]
        np.testing.assert_allclose(stacked[:, i], ref, atol=1e-6)
    # no-SSIM branch
    stacked = np.asarray(reprojection_loss_stacked(preds, target, False))
    for i in range(5):
        ref = np.asarray(reprojection_loss(preds[:, i], target, False))
        np.testing.assert_allclose(stacked[:, i], ref[..., 0], atol=1e-6)


def _loss_inputs(seed=0, supervised=False):
    rng = np.random.default_rng(seed)
    disps = {("disp", s): _rand(rng, B, H // 2 ** s, W // 2 ** s, 1) * 0.9
             + 0.05 for s in SCALES}
    warped = {("color", f, s): _rand(rng, B, H, W, 3)
              for s in SCALES for f in FRAMES if f != 0}
    depths = {("depth", 0, s): _rand(rng, B, H, W, 1) * 1.5 + 0.2
              for s in SCALES}
    batch = {
        "color": _rand(rng, B, H, W, 3),
        "color_frames": _rand(rng, B, len(FRAMES), H, W, 3),
    }
    if supervised:
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = K[1, 1] = 35.0
        K[0, 2], K[1, 2] = W / 2, H / 2
        batch["K"] = jnp.asarray(np.broadcast_to(K, (B, 4, 4)))
        batch["depth"] = _rand(rng, B, H, W, 1) * 1.5 + 0.2
    return disps, warped, depths, batch


@pytest.mark.parametrize("supervised", [False, True])
@pytest.mark.parametrize("avg", [False, True])
def test_selfsup_losses_packed_parity(supervised, avg):
    cfg = Config(height=H, width=W, batch_size=B,
                 depth_supervision=supervised, avg_reprojection=avg,
                 mesh_shape=(1,))
    disps, warped, depths, batch = _loss_inputs(supervised=supervised)
    key = jax.random.PRNGKey(7)
    tot_ref, logs_ref = selfsup_losses(cfg, key, disps, warped, depths, batch)
    cfg_p = cfg.replace(photometric_packed=True)
    tot_p, logs_p = selfsup_losses(cfg_p, key, disps, warped, depths, batch)
    np.testing.assert_allclose(float(tot_p), float(tot_ref), rtol=2e-6)
    assert set(logs_p) == set(logs_ref)
    for k in logs_ref:
        np.testing.assert_allclose(float(logs_p[k]), float(logs_ref[k]),
                                   rtol=2e-5, atol=1e-7, err_msg=k)


def test_selfsup_losses_packed_parity_no_automask():
    cfg = Config(height=H, width=W, batch_size=B, disable_automasking=True,
                 depth_supervision=False, mesh_shape=(1,))
    disps, warped, depths, batch = _loss_inputs()
    key = jax.random.PRNGKey(3)
    tot_ref, _ = selfsup_losses(cfg, key, disps, warped, depths, batch)
    tot_p, _ = selfsup_losses(cfg.replace(photometric_packed=True), key,
                              disps, warped, depths, batch)
    np.testing.assert_allclose(float(tot_p), float(tot_ref), rtol=2e-6)


@pytest.mark.parametrize("motion_masking", [True, False])
def test_student_losses_packed_parity(motion_masking):
    cfg = Config(height=H, width=W, batch_size=B, train_student=True,
                 disable_motion_masking=not motion_masking,
                 depth_supervision=False, mesh_shape=(1,))
    rng = np.random.default_rng(5)
    disps, warped, depths, batch = _loss_inputs(seed=5)
    mono_depths = {k: v + 0.05 for k, v in depths.items()}
    cmask = jnp.asarray(
        (rng.uniform(0, 1, (B, H, W, 1)) > 0.3).astype(np.float32))
    aug = jnp.asarray(
        (rng.uniform(0, 1, (B, 1, 1, 1)) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(11)
    args = (key, disps, warped, depths, mono_depths, cmask, aug, batch)
    tot_ref, logs_ref = student_losses(cfg, *args)
    tot_p, logs_p = student_losses(
        cfg.replace(photometric_packed=True), *args)
    np.testing.assert_allclose(float(tot_p), float(tot_ref), rtol=2e-6)
    assert set(logs_p) == set(logs_ref)
    for k in logs_ref:
        np.testing.assert_allclose(float(logs_p[k]), float(logs_ref[k]),
                                   rtol=2e-5, atol=1e-7, err_msg=k)


@pytest.mark.parametrize("nlw", [0.35, 0.0])
def test_supervised_losses_packed_parity(nlw):
    from polardepth_tpu.train.losses import supervised_losses
    cfg = Config(height=H, width=W, batch_size=B, depth_supervision=True,
                 normals_loss_weight=nlw, mesh_shape=(1,))
    disps, _, _, batch = _loss_inputs(seed=13, supervised=True)
    tot_ref, logs_ref = supervised_losses(cfg, disps, batch)
    tot_p, logs_p = supervised_losses(
        cfg.replace(photometric_packed=True), disps, batch)
    np.testing.assert_allclose(float(tot_p), float(tot_ref), rtol=2e-6)
    assert set(logs_p) == set(logs_ref)
    for k in logs_ref:
        np.testing.assert_allclose(float(logs_p[k]), float(logs_ref[k]),
                                   rtol=2e-5, atol=1e-7, err_msg=k)


def test_supervised_packed_grads_match():
    from polardepth_tpu.train.losses import supervised_losses
    cfg = Config(height=H, width=W, batch_size=B, depth_supervision=True,
                 mesh_shape=(1,))
    disps, _, _, batch = _loss_inputs(seed=17, supervised=True)

    def loss_of(d0, packed):
        d = dict(disps)
        d[("disp", 0)] = d0
        tot, _ = supervised_losses(
            cfg.replace(photometric_packed=packed), d, batch)
        return tot

    d0 = disps[("disp", 0)]
    g_ref = jax.grad(loss_of)(d0, False)
    g_p = jax.grad(loss_of)(d0, True)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_ref), atol=2e-6)


def test_depth_to_normals_hw_matches_nhwc():
    from polardepth_tpu.ops.normals import depth_to_normals, depth_to_normals_hw
    rng = np.random.default_rng(21)
    d = _rand(rng, B, H, W, 1) * 1.5 + 0.2
    K = np.eye(3, dtype=np.float32)
    K[0, 0], K[1, 1] = 40.0, 38.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    Kb = jnp.asarray(np.broadcast_to(K, (B, 3, 3)))
    ref = np.asarray(depth_to_normals(d, Kb))               # (B,H,W,3)
    hw = np.asarray(depth_to_normals_hw(d[..., 0][:, None], Kb))
    np.testing.assert_allclose(hw[:, 0].transpose(0, 2, 3, 1), ref,
                               atol=1e-6)


def test_packed_grads_match():
    """Gradient parity through the packed path (the part that matters for
    training): d(total)/d(warped) and d(total)/d(disp)."""
    cfg = Config(height=H, width=W, batch_size=B, depth_supervision=False,
                 mesh_shape=(1,))
    disps, warped, depths, batch = _loss_inputs(seed=9)
    key = jax.random.PRNGKey(1)

    def loss_of(w0, d0, packed):
        w = dict(warped)
        w[("color", -1, 0)] = w0
        d = dict(disps)
        d[("disp", 0)] = d0
        c = cfg.replace(photometric_packed=packed)
        tot, _ = selfsup_losses(c, key, d, w, depths, batch)
        return tot

    w0 = warped[("color", -1, 0)]
    d0 = disps[("disp", 0)]
    g_ref = jax.grad(loss_of, argnums=(0, 1))(w0, d0, False)
    g_p = jax.grad(loss_of, argnums=(0, 1))(w0, d0, True)
    for a, b in zip(g_ref, g_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-6)
