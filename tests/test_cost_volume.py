"""Cost-volume encoder tests: bin computation, geometric correctness of the
vectorised plane sweep on synthetic geometry, missing-frame masking, and the
full encoder forward."""

import numpy as np
import jax
import jax.numpy as jnp

from polardepth_tpu.data.synthetic import SyntheticHammer
from polardepth_tpu.models.cost_volume import (
    compute_depth_bins, build_cost_volume, CostVolumeEncoder,
)

H, W = 64, 96          # full res; matching runs at 1/4
h, w = H // 4, W // 4


def test_depth_bins_linear_and_inverse():
    lin = np.asarray(compute_depth_bins(0.1, 2.0, 96, "linear"))
    np.testing.assert_allclose(lin, np.linspace(0.1, 2.0, 96), rtol=1e-6)
    inv = np.asarray(compute_depth_bins(0.1, 2.0, 96, "inverse"))
    want = (1.0 / np.linspace(1 / 2.0, 1 / 0.1, 96))[::-1]
    np.testing.assert_allclose(inv, want, rtol=1e-5)
    assert np.all(np.diff(inv) > 0)  # depth order maintained


def _quarter_K(K):
    K4 = K.copy()
    K4[0, :] /= 4.0
    K4[1, :] /= 4.0
    return K4


def test_plane_sweep_recovers_depth_on_synthetic_motion():
    """RGB of two views with known relative pose: the cost at the true-depth
    bin must be clearly below the volume average, and the argmin bin must
    track true depth in well-posed interior regions."""
    gen = SyntheticHammer(H, W, seed=5, num_objects=3)
    cur = gen.sample(0, frame=0)
    look = gen.sample(0, frame=40)   # ~0.25 m baseline
    rel = gen.relative_pose(0, frame=40, center=0)

    cf = jnp.asarray(cur["color"].astype(np.float32) / 255.0)[None]
    lf = jnp.asarray(look["color"].astype(np.float32) / 255.0)[None, None]
    depth = cur["depth"][..., 0]
    K = cur["K"]

    bins = compute_depth_bins(0.5, 2.3, 96, "linear")
    cost, missing = build_cost_volume(
        cf, lf, jnp.asarray(rel)[None, None], jnp.asarray(K)[None],
        jnp.asarray(np.linalg.inv(K))[None], bins)
    assert cost.shape == (1, 96, H, W)

    c = np.asarray(cost)[0]
    bins_np = np.asarray(bins)
    true_bin = np.clip(np.searchsorted(bins_np, depth), 0, 95)
    interior = np.zeros((H, W), bool)
    interior[6:-6, 6:-6] = True
    cost_at_true = np.take_along_axis(c, true_bin[None], axis=0)[0]
    assert cost_at_true[interior].mean() < 0.6 * c[:, interior].mean()

    est = np.asarray(jnp.take(bins, jnp.argmin(
        jnp.where(cost == 0, 1e9, cost), axis=1)))[0]
    valid = interior & (np.asarray(missing)[0].sum(0) == 0)
    rel_err = np.abs(est - depth) / depth
    assert valid.mean() > 0.3
    assert np.median(rel_err[valid]) < 0.25, np.median(rel_err[valid])


def test_zero_pose_frame_is_ignored():
    rng = np.random.default_rng(0)
    cf = jnp.asarray(rng.uniform(0, 1, (2, h, w, 8)).astype(np.float32))
    lf = jnp.asarray(rng.uniform(0, 1, (2, 2, h, w, 8)).astype(np.float32))
    poses = np.broadcast_to(np.eye(4, dtype=np.float32), (2, 2, 4, 4)).copy()
    poses[:, 1] = 0.0  # second frame missing
    K4 = np.eye(4, dtype=np.float32)
    K4[0, 0] = K4[1, 1] = 20.0
    K4[0, 2], K4[1, 2] = w / 2, h / 2
    bins = compute_depth_bins(0.1, 2.0, 16, "linear")
    cost_two, _ = build_cost_volume(cf, lf, jnp.asarray(poses),
                                    jnp.asarray(K4)[None].repeat(2, 0),
                                    jnp.asarray(np.linalg.inv(K4))[None].repeat(2, 0),
                                    bins)
    cost_one, _ = build_cost_volume(cf, lf[:, :1], jnp.asarray(poses[:, :1]),
                                    jnp.asarray(K4)[None].repeat(2, 0),
                                    jnp.asarray(np.linalg.inv(K4))[None].repeat(2, 0),
                                    bins)
    np.testing.assert_allclose(np.asarray(cost_two), np.asarray(cost_one),
                               atol=1e-6)


def test_cost_volume_encoder_forward_shapes():
    gen = SyntheticHammer(H, W, seed=6)
    b = gen.batch_frames(2, frame_ids=(0, -1), offset=4)
    enc = CostVolumeEncoder(num_depth_bins=32)
    cur = jnp.asarray(b["color"].astype(np.float32) / 255.0)
    looks = jnp.asarray(
        b["color_frames"][:, 1:].astype(np.float32) / 255.0)
    K4 = b["K"].copy()
    K4[:, 0] /= 4.0
    K4[:, 1] /= 4.0
    inv_K4 = np.linalg.inv(K4)
    variables = enc.init(jax.random.PRNGKey(0), cur, looks,
                         jnp.asarray(b["rel_poses"][:, 1:]),
                         jnp.asarray(K4), jnp.asarray(inv_K4), 0.1, 2.0)
    feats, lowest, conf = enc.apply(
        variables, cur, looks, jnp.asarray(b["rel_poses"][:, 1:]),
        jnp.asarray(K4), jnp.asarray(inv_K4), 0.1, 2.0)
    assert [f.shape[-1] for f in feats] == [64, 64, 128, 256, 512]
    assert feats[0].shape == (2, H // 2, W // 2, 64)
    assert feats[4].shape == (2, H // 32, W // 32, 512)
    assert lowest.shape == (2, h, w)
    assert conf.shape == (2, h, w)
    assert set(np.unique(np.asarray(conf))) <= {0.0, 1.0}


def test_bin_chunking_is_exact():
    """Chunked plane-sweep (the memory-bounded path) must equal the
    single-shot volume bit-for-bit up to float assoc — per-bin costs are
    independent, so chunking only changes temporaries."""
    import jax.numpy as jnp
    from polardepth_tpu.models.cost_volume import (
        build_cost_volume, compute_depth_bins)
    rng = np.random.default_rng(3)
    b, f, h, w, c = 2, 2, 12, 16, 8
    cur = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    look = jnp.asarray(rng.normal(size=(b, f, h, w, c)).astype(np.float32))
    poses = np.tile(np.eye(4, dtype=np.float32), (b, f, 1, 1))
    poses[:, :, 0, 3] = 0.05
    poses[1, 1] = 0.0  # a missing frame
    K = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    K[:, 0, 0] = K[:, 1, 1] = 8.0
    K[:, 0, 2], K[:, 1, 2] = w / 2, h / 2
    inv_K = np.linalg.inv(K)
    bins = compute_depth_bins(jnp.float32(0.5), jnp.float32(2.0), 32)
    c0, m0 = build_cost_volume(cur, look, jnp.asarray(poses),
                               jnp.asarray(K), jnp.asarray(inv_K), bins,
                               bin_chunk=0)
    for chunk in (8, 16):
        c1, m1 = build_cost_volume(cur, look, jnp.asarray(poses),
                                   jnp.asarray(K), jnp.asarray(inv_K), bins,
                                   bin_chunk=chunk)
        np.testing.assert_allclose(np.asarray(c0), np.asarray(c1),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
