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


def test_packed_gather_matches_four_gather_grid_sample():
    """The round-3 packed 4-corner single-gather sweep must equal the
    original per-corner grid_sample formulation on every edge-masked-in
    pixel (the masked band is zero in both)."""
    from polardepth_tpu.ops.warp import grid_sample
    rng = np.random.default_rng(2)
    b, f, hh, ww, c = 2, 2, 12, 18, 5
    cur = jnp.asarray(rng.normal(0, 1, (b, hh, ww, c)).astype(np.float32))
    look = jnp.asarray(rng.normal(0, 1, (b, f, hh, ww, c))
                       .astype(np.float32))
    rel = np.tile(np.eye(4, dtype=np.float32), (b, f, 1, 1))
    rel[:, :, 0, 3] = rng.normal(0, 0.2, (b, f))   # translations
    rel[:, :, 1, 3] = rng.normal(0, 0.2, (b, f))
    rel[:, :, 2, 3] = rng.normal(0, 0.1, (b, f))
    K = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    K[:, 0, 0], K[:, 1, 1] = ww * 0.8, hh * 0.8
    K[:, 0, 2], K[:, 1, 2] = ww / 2, hh / 2
    inv_K = np.linalg.inv(K).astype(np.float32)
    bins = compute_depth_bins(0.4, 2.0, 8, "linear")

    cost, missing = build_cost_volume(cur, look, jnp.asarray(rel),
                                      jnp.asarray(K), jnp.asarray(inv_K),
                                      bins, bin_chunk=4)

    # oracle: the original 4-gather grid_sample formulation
    xs, ys = np.meshgrid(np.arange(ww, dtype=np.float32),
                         np.arange(hh, dtype=np.float32))
    pix = np.stack([xs.reshape(-1), ys.reshape(-1),
                    np.ones(hh * ww, np.float32)])
    cam = np.einsum("bij,jn->bin", inv_K[:, :3, :3], pix)
    P = np.einsum("bij,bfjk->bfik", K, rel)[:, :, :3]
    interior = np.zeros((hh, ww), np.float32)
    interior[2:-2, 2:-2] = 1.0
    bins_np = np.asarray(bins)
    pts = cam[:, None] * bins_np[None, :, None, None]
    pts = np.concatenate([pts, np.ones((b, 8, 1, hh * ww), np.float32)],
                         axis=2)
    proj = np.einsum("bfij,bdjn->bfdin", P, pts)
    pix_xy = proj[:, :, :, :2] / (proj[:, :, :, 2:3] + 1e-7)
    x_vals = pix_xy[:, :, :, 0].reshape(b, f, 8, hh, ww)
    y_vals = pix_xy[:, :, :, 1].reshape(b, f, 8, hh, ww)
    gx = (x_vals / (ww - 1) - 0.5) * 2.0
    gy = (y_vals / (hh - 1) - 0.5) * 2.0
    grid = np.stack([gx, gy], axis=-1)
    warped = grid_sample(
        look.reshape(b * f, hh, ww, c),
        jnp.asarray(grid.reshape(b * f, 8 * hh, ww, 2)),
        padding_mode="zeros", align_corners=True,
    ).reshape(b, f, 8, hh, ww, c)
    edge = ((x_vals >= 2.0) & (x_vals <= ww - 2) &
            (y_vals >= 2.0) & (y_vals <= hh - 2)).astype(np.float32)
    edge = edge * interior[None, None, None]
    diffs = np.mean(np.abs(np.asarray(warped) - np.asarray(cur)[:, None, None]),
                    axis=-1)
    diffs = diffs * edge
    cost_ref = diffs.sum(1)
    counts = (diffs > 0).astype(np.float32).sum(1)
    cost_ref = cost_ref / (counts + 1e-7)
    miss_ref = (cost_ref == 0).astype(np.float32)
    cost_ref = cost_ref * (1 - miss_ref) + \
        cost_ref.max(1, keepdims=True) * miss_ref

    np.testing.assert_array_equal(np.asarray(missing), miss_ref)
    np.testing.assert_allclose(np.asarray(cost), cost_ref,
                               rtol=1e-5, atol=1e-6)


def test_bf16_volume_close_to_f32():
    """The fast path runs the plane sweep in bfloat16
    (CostVolumeEncoder.volume_dtype_follows_compute); the resulting costs
    must stay within bf16 resolution of the f32 sweep and the argmin bins
    must agree almost everywhere."""
    rng = np.random.default_rng(4)
    b, f, hh, ww, c = 2, 1, 16, 24, 8
    cur = rng.normal(0, 1, (b, hh, ww, c)).astype(np.float32)
    look = rng.normal(0, 1, (b, f, hh, ww, c)).astype(np.float32)
    rel = np.tile(np.eye(4, dtype=np.float32), (b, f, 1, 1))
    rel[:, :, 0, 3] = 0.1
    K = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    K[:, 0, 0], K[:, 1, 1] = ww * 0.7, hh * 0.7
    K[:, 0, 2], K[:, 1, 2] = ww / 2, hh / 2
    inv_K = np.linalg.inv(K).astype(np.float32)
    bins = compute_depth_bins(0.4, 2.0, 16, "linear")
    outs = {}
    for dt in (np.float32, jnp.bfloat16):
        cost, _ = build_cost_volume(
            jnp.asarray(cur).astype(dt),
            jnp.asarray(look).astype(dt),
            jnp.asarray(rel), jnp.asarray(K), jnp.asarray(inv_K), bins,
            bin_chunk=8)
        outs[np.dtype(dt).name if dt is np.float32 else "bfloat16"] = \
            np.asarray(cost.astype(jnp.float32))
    f32c, bf16c = outs["float32"], outs["bfloat16"]
    np.testing.assert_allclose(bf16c, f32c, atol=0.04, rtol=0.05)
    am32 = f32c.argmin(1)
    am16 = bf16c.argmin(1)
    assert (am32 == am16).mean() > 0.9
