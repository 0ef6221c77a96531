"""Self-supervised path tests: SE3 log map, warping consistency, and a
train-step smoke test with pose supervision on synthetic multi-frame data."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polardepth_tpu.config import Config
from polardepth_tpu.data.synthetic import SyntheticHammer
from polardepth_tpu.ops.se3 import (
    rotmat_to_rotvec, rot_from_axisangle, transformation_from_parameters,
)
from polardepth_tpu.train.selfsup import (
    SelfSupModel, make_selfsup_train_step, generate_images_pred,
)
from polardepth_tpu.train.state import create_train_state

H, W = 32, 32


def test_rotmat_to_rotvec_roundtrip():
    rng = np.random.default_rng(0)
    vec = rng.uniform(-1.5, 1.5, (8, 1, 3)).astype(np.float64)
    R = rot_from_axisangle(jnp.asarray(vec))[:, :3, :3]
    back = np.asarray(rotmat_to_rotvec(R))
    np.testing.assert_allclose(back, vec[:, 0, :], atol=1e-5)


def test_rotmat_to_rotvec_small_and_large_angles():
    for angle in (1e-6, 0.1, 3.0, np.pi - 1e-4):
        axis = np.array([0.6, -0.64, 0.48])
        axis /= np.linalg.norm(axis)
        vec = (axis * angle)[None, None, :]
        R = rot_from_axisangle(jnp.asarray(vec))[:, :3, :3]
        back = np.asarray(rotmat_to_rotvec(R))[0]
        # compare rotations, not raw vectors (sign flip at pi is equivalent)
        R2 = rot_from_axisangle(jnp.asarray(back[None, None]))[:, :3, :3]
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


def test_identity_pose_warp_reproduces_source():
    """With identity pose and any depth, warping frame0 onto itself through
    generate_images_pred must reproduce frame0."""
    cfg = Config(height=H, width=W, batch_size=2, frame_ids=(0, 1),
                 scales=(0,), depth_supervision=False,
                 depth_supervision_only=False)
    gen = SyntheticHammer(H, W, seed=1)
    b = gen.batch_frames(2, frame_ids=(0, 1), offset=0)  # offset 0: same view
    color_frames = jnp.asarray(b["color_frames"].astype(np.float32) / 255.0)
    disp = jnp.full((2, H, W, 1), 0.5, jnp.float32)
    poses = {1: jnp.broadcast_to(jnp.eye(4), (2, 4, 4))}
    warped, _ = generate_images_pred(
        cfg, {("disp", 0): disp}, poses, color_frames,
        jnp.asarray(b["K"]), jnp.asarray(b["inv_K"]))
    np.testing.assert_allclose(np.asarray(warped[("color", 1, 0)]),
                               np.asarray(color_frames[:, 1]), atol=1e-3)


@pytest.mark.parametrize("supervise", [False, True])
def test_selfsup_train_step_runs_and_improves(supervise):
    cfg = Config(height=H, width=W, batch_size=2, dropout_rate=0.0,
                 depth_supervision=supervise, depth_supervision_only=False,
                 supervise_pose=supervise, mesh_shape=(1,))
    model = SelfSupModel(
        frame_ids=cfg.frame_ids, augment_xolp=cfg.augment_xolp,
        augment_normals=cfg.augment_normals, dropout_rate=0.0,
        scales=tuple(cfg.scales), compute_dtype="float32")
    rng = jax.random.PRNGKey(0)
    example = {
        "color_frames": jnp.zeros((1, 3, H, W, 3), jnp.float32),
        "pol": jnp.zeros((1, H, W, 4), jnp.float32),
    }
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    assert "mono" in state.params and "pose_net" in state.params
    assert "rgb_encoder" in state.params["mono"]
    assert "pose_encoder" in state.params["pose_net"]

    step = jax.jit(make_selfsup_train_step(model, cfg))
    gen = SyntheticHammer(H, W, seed=2)
    batch = gen.batch_frames(cfg.batch_size, frame_ids=cfg.frame_ids,
                             offset=2)
    losses = []
    for _ in range(4):
        state, logs = step(state, batch, rng)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all()
    assert f"reproj_loss/0" in logs
    if supervise:
        # the supervised depth terms dominate and must decrease
        assert losses[-1] < losses[0]
        assert "r_loss" in logs and "t_loss" in logs
    else:
        # pure photometric loss on near-identical frames is tiny and noisy;
        # just require it stays bounded
        assert losses[-1] < losses[0] * 3 + 1e-3


def test_matching_pose_net_chains_and_masks():
    from polardepth_tpu.train.selfsup import MatchingPoseNet
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(0, 1, (2, 3, H, W, 3)).astype(np.float32))
    # blank the -1 frame of sample 1
    frames = frames.at[1, 1].set(0.0)
    m = MatchingPoseNet()
    vars_ = m.init(jax.random.PRNGKey(0), frames, (0, -1, 1), (0, -1))
    rel = m.apply(vars_, frames, (0, -1, 1), (0, -1))
    assert set(rel.keys()) == {-1}
    p = np.asarray(rel[-1])
    assert p.shape == (2, 4, 4)
    assert np.abs(p[0]).sum() > 0          # valid frame -> real pose
    np.testing.assert_allclose(p[1], 0.0)  # blank frame -> zero pose


def test_residual_pose_prediction():
    from polardepth_tpu.train.selfsup import (
        PoseNet, predict_residual_poses)
    cfg = Config(height=H, width=W, batch_size=1, frame_ids=(0, 1),
                 depth_supervision_only=False, depth_supervision=False)
    rng = np.random.default_rng(1)
    color0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    warped = {("color", 1, 0): jnp.asarray(
        rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))}
    net = PoseNet()
    vars_ = net.init(jax.random.PRNGKey(0), color0, color0)
    res = predict_residual_poses(net.apply, vars_, cfg, warped, color0)
    assert res[1].shape == (1, 4, 4)
    # valid SE(3): rotation orthonormal
    R = np.asarray(res[1])[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_selfsup_res_pose_step():
    cfg = Config(height=H, width=W, batch_size=1, dropout_rate=0.0,
                 depth_supervision=False, depth_supervision_only=False,
                 res_pose=True, mesh_shape=(1,))
    model = SelfSupModel(frame_ids=cfg.frame_ids, dropout_rate=0.0,
                         scales=tuple(cfg.scales))
    rng = jax.random.PRNGKey(0)
    example = {"color_frames": jnp.zeros((1, 3, H, W, 3), jnp.float32),
               "pol": jnp.zeros((1, H, W, 4), jnp.float32)}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    step = jax.jit(make_selfsup_train_step(model, cfg))
    gen = SyntheticHammer(H, W, seed=9)
    batch = gen.batch_frames(1, frame_ids=cfg.frame_ids, offset=2)
    state, logs = step(state, batch, rng)
    assert "res_pose_loss" in logs
    assert np.isfinite(float(logs["loss"]))
