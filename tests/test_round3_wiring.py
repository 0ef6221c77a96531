"""Round-3 wiring tests: prefetch error propagation, random-flip in the
train step, decode-backend auto-fallback, KITTI/Cityscapes self-supervised
data routing, checkpoint legacy-extra fallback."""

import os
from types import SimpleNamespace

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from polardepth_tpu.config import Config


# -- device_prefetch must re-raise producer failures --------------------------

def test_device_prefetch_reraises_producer_error():
    from polardepth_tpu.data.pipeline import device_prefetch

    def gen():
        yield {"x": np.zeros(3, np.float32)}
        raise RuntimeError("decode failed mid-epoch")

    it = device_prefetch(gen())
    next(it)
    with pytest.raises(RuntimeError, match="decode failed mid-epoch"):
        for _ in it:
            pass


def test_device_prefetch_clean_end():
    from polardepth_tpu.data.pipeline import device_prefetch
    batches = [{"x": np.full(2, i, np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches)))
    assert len(out) == 5
    np.testing.assert_allclose(np.asarray(out[3]["x"]), 3.0)


# -- random flip: 5-d frame stacks + train-step wiring ------------------------

def test_random_flip_5d_frames_consistent_with_4d():
    from polardepth_tpu.data.augment import random_horizontal_flip
    rng = np.random.default_rng(0)
    batch = {
        "color_frames": jnp.asarray(
            rng.uniform(0, 1, (6, 3, 8, 10, 3)).astype(np.float32)),
        "depth": jnp.asarray(
            rng.uniform(0, 2, (6, 8, 10, 1)).astype(np.float32)),
    }
    out = random_horizontal_flip(jax.random.PRNGKey(7), batch, prob=0.5)
    cf0 = np.asarray(batch["color_frames"])
    cf1 = np.asarray(out["color_frames"])
    d0, d1 = np.asarray(batch["depth"]), np.asarray(out["depth"])
    flipped = np.array([np.allclose(cf1[i], cf0[i, :, :, ::-1])
                        for i in range(6)])
    same = np.array([np.allclose(cf1[i], cf0[i]) for i in range(6)])
    assert np.all(flipped | same) and flipped.any() and same.any()
    for i in range(6):  # depth flips with the frames
        want = d0[i, :, ::-1] if flipped[i] else d0[i]
        np.testing.assert_allclose(d1[i], want)


def test_supervised_train_step_honors_random_flip():
    """cfg.random_flip changes the step's loss on an asymmetric batch and
    leaves it unchanged when off (flag-behavior contract, VERDICT r2 #7)."""
    from polardepth_tpu.train.state import create_train_state
    from polardepth_tpu.train.trainer import build_model, make_train_step

    h, w, b = 32, 64, 8  # batch 8: all-unflipped draw has probability 2^-8
    base = Config(height=h, width=w, batch_size=b, augment_xolp=False,
                  augment_normals=False, dropout_rate=0.0,
                  normals_loss_weight=0.0)
    model = build_model(base)
    rng = jax.random.PRNGKey(0)
    example = {"color": jnp.zeros((1, h, w, 3), jnp.float32), "pol": None}
    state = create_train_state(model, {"params": rng, "dropout": rng},
                               example, 1e-4)
    rngs = np.random.default_rng(1)
    color = rngs.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
    color[:, :, : w // 2] = 0  # strongly asymmetric
    depth = rngs.uniform(0.2, 1.8, (b, h, w, 1)).astype(np.float32)
    K = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    batch = {"color": color, "depth": depth, "K": K}

    losses = {}
    for flip in (False, True):
        cfg = base.replace(random_flip=flip)
        step = jax.jit(make_train_step(model, cfg))
        _, logs = step(state, batch, rng)
        losses[flip] = float(logs["loss"])
        assert np.isfinite(losses[flip])
    # rng is fixed; with flip on, ~half the samples mirror -> different loss
    assert losses[True] != losses[False]


# -- decode backend auto-fallback --------------------------------------------

def test_hammer_loader_auto_backend(tmp_path):
    from polardepth_tpu.data.synthetic import write_synthetic_scene
    from polardepth_tpu.data.hammer import HammerIndex, HammerLoader
    from polardepth_tpu.runtime import native as rt

    root = str(tmp_path)
    write_synthetic_scene(root, "scene1_traj1_1", num_frames=2,
                          height=32, width=48, seed=0)
    idx = HammerIndex(root, ["scene1_traj1_1"], frame_ids=(0,), offset=1)
    auto = HammerLoader(idx, backend="auto")
    assert auto.backend == ("native" if rt.available() else "cv2")
    s = auto.load(0)
    ref = HammerLoader(idx, backend="cv2").load(0)
    for k in ("color", "pol", "depth_gt", "mask"):
        np.testing.assert_array_equal(s[k], ref[k])
    with pytest.raises(ValueError, match="unknown decode backend"):
        HammerLoader(idx, backend="nope")


# -- KITTI / Cityscapes self-supervised routing -------------------------------

def _write_kitti_odom(tmp_path, n=4):
    import cv2
    img_dir = tmp_path / "sequences" / "05" / "image_2"
    img_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        cv2.imwrite(str(img_dir / f"{i:06d}.png"),
                    rng.integers(0, 255, (38, 124, 3), dtype=np.uint8))
    split = tmp_path / "odom_tiny"
    split.mkdir()
    with open(split / "train_files.txt", "w") as f:
        for i in range(1, n - 1):  # interior frames have +-1 neighbours
            f.write(f"5 {i} l\n")
    return str(split)


def test_kitti_multiframe_selfsup_batches(tmp_path):
    from polardepth_tpu.cli import _make_multiframe_data
    split = _write_kitti_odom(tmp_path)
    cfg = Config(data_path=str(tmp_path), dataset="kitti_odom", split=split,
                 height=32, width=64, batch_size=2, augment_xolp=False,
                 augment_normals=False, depth_supervision=False,
                 depth_supervision_only=False)
    make, spe = _make_multiframe_data(cfg, SimpleNamespace(synthetic=0),
                                      "train")
    assert spe == 1
    b = next(make())
    assert b["color_frames"].shape == (2, 3, 32, 64, 3)
    assert b["pol"].shape == (2, 32, 64, 4)
    assert b["K"].shape == (2, 4, 4)
    np.testing.assert_allclose(b["K"][0, 0, 0], 0.58 * 64, rtol=1e-6)
    assert b["inv_K"].shape == (2, 4, 4)
    # no-depth dataset + depth supervision must fail loudly
    bad = cfg.replace(depth_supervision=True)
    with pytest.raises(ValueError, match="no depth"):
        _make_multiframe_data(bad, SimpleNamespace(synthetic=0), "train")


def test_cityscapes_preprocessed_triplet_and_normalized_K(tmp_path):
    import cv2
    from polardepth_tpu.data.kitti import CityscapesPreprocessedIndex
    city = tmp_path / "ulm"
    city.mkdir()
    rng = np.random.default_rng(0)
    wide = rng.integers(0, 255, (24, 3 * 40, 3), dtype=np.uint8)
    cv2.imwrite(str(city / "ulm_000064_000012.jpg"), wide)
    # reference _cam.txt layout: 3x3 K flattened row-major, comma separated
    fx, fy, u0, v0 = 1024.0, 768.0, 512.0, 192.0
    np.savetxt(str(city / "ulm_000064_000012_cam.txt"),
               np.array([fx, 0, u0, 0, fy, v0, 0, 0, 1])[None],
               delimiter=",")
    idx = CityscapesPreprocessedIndex(str(tmp_path), ["ulm ulm_000064_000012"])
    trip = idx.load_triplet(0)
    assert len(trip["frames"]) == 3
    assert trip["frames"][0].shape == (24, 40, 3)
    K = trip["K"]
    np.testing.assert_allclose(K[0, 0], fx / 1024.0, rtol=1e-6)
    np.testing.assert_allclose(K[1, 2], v0 / 384.0, rtol=1e-6)
    center = idx.load(0)
    # jpeg decode must match the middle slice exactly (same codec both ways)
    assert center["color"].shape == (24, 40, 3)


def test_supervised_kitti_rejects_depthless_datasets(tmp_path):
    from polardepth_tpu.cli import _make_kitti_data
    split = _write_kitti_odom(tmp_path)
    cfg = Config(data_path=str(tmp_path), dataset="kitti_odom", split=split,
                 height=32, width=64, augment_xolp=False,
                 augment_normals=False)
    with pytest.raises(ValueError, match="no depth supervision"):
        _make_kitti_data(cfg, SimpleNamespace(synthetic=0), "train")


def test_cli_sparse_dataset_zeroes_normals_weight(capsys):
    from polardepth_tpu.cli import _config_from_args
    a = SimpleNamespace(dataset="kitti", normals_loss_weight=0.35,
                        random_flip=None, augment_xolp=False,
                        augment_normals=False)
    cfg = _config_from_args(a)
    assert cfg.normals_loss_weight == 0.0
    assert cfg.random_flip is True  # KITTI default: flip on
    a2 = SimpleNamespace(dataset="HAMMER")
    cfg2 = _config_from_args(a2)
    assert cfg2.normals_loss_weight == 0.35
    assert cfg2.random_flip is False  # HAMMER hardwires do_flip False


# -- multi-host readiness: process-sharded BatchIterator ----------------------

def test_batch_iterator_process_shards_partition_each_batch():
    """Two 'processes' loading the same (seed, epoch) order must see
    disjoint interleaved halves of every global batch — the multi-host data
    recipe of parallel/mesh.py."""
    from polardepth_tpu.data.pipeline import BatchIterator

    def load(i):
        return {"idx": np.array([i], np.int64)}

    full = BatchIterator(load, 24, 8, shuffle=True, seed=3)
    shards = [BatchIterator(load, 24, 8, shuffle=True, seed=3,
                            shard_index=k, num_shards=2) for k in range(2)]
    for bf, b0, b1 in zip(iter(full), iter(shards[0]), iter(shards[1])):
        got = np.concatenate([b0["idx"], b1["idx"]]).ravel()
        assert b0["idx"].shape[0] == 4 and b1["idx"].shape[0] == 4
        assert set(got) == set(bf["idx"].ravel())
        assert not (set(b0["idx"].ravel()) & set(b1["idx"].ravel()))
    with pytest.raises(ValueError, match="divide evenly"):
        BatchIterator(load, 24, 9, num_shards=2)


# -- polardepth analyze: report + heatmaps from saved predictions -------------

def test_analyze_cli_writes_report(tmp_path):
    from polardepth_tpu.cli import cmd_analyze
    from polardepth_tpu.eval.pointcloud import export_prediction_pngs
    rng = np.random.default_rng(0)
    pred_dir = str(tmp_path / "preds")
    h, w = 24, 32
    for i in range(2):
        gt = rng.uniform(0.3, 1.8, (h, w, 1)).astype(np.float32)
        pred = gt + rng.normal(0, 0.05, gt.shape).astype(np.float32)
        mask = np.zeros((h, w, 1), np.int32)
        mask[4:10, 4:10] = 160  # glass
        export_prediction_pngs(pred_dir, f"{i:03d}",
                               rng.uniform(0, 1, (h, w, 3)), mask, pred, gt)
    rc = cmd_analyze(["--pred_dir", pred_dir])
    assert rc == 0
    out = tmp_path / "preds" / "analysis"
    report = (out / "report.md").read_text()
    assert "glass" in report and "**mean**" in report
    assert (out / "000_error.png").exists()
    assert (out / "001_error_objects.png").exists()


# -- checkpoint: legacy (no-'extra') fallback is metadata-driven --------------

def test_checkpoint_extra_fallback_and_corruption(tmp_path):
    from polardepth_tpu.train import checkpoint as ckpt
    from polardepth_tpu.train.state import create_train_state
    import flax.linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Dense(2)(x)

    rng = jax.random.PRNGKey(0)
    state = create_train_state(Tiny(), {"params": rng, "dropout": rng},
                               {"x": jnp.zeros((1, 3))}, 1e-3)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    d = str(tmp_path / "ck")
    # legacy checkpoint: written WITHOUT extra
    path = ckpt.save(d, state)
    template_extra = {"data": {"seed": 1, "epoch": 0, "cursor": 0}}
    restored, extra = ckpt.restore(path, state, extra=template_extra)
    assert int(restored.step) == 7
    assert extra == template_extra  # template values, not a crash
    # new checkpoint WITH extra round-trips it
    path2 = ckpt.save(d, state, step=8,
                      extra={"data": {"seed": 1, "epoch": 2, "cursor": 5}})
    _, extra2 = ckpt.restore(path2, state, extra=template_extra)
    assert extra2["data"]["cursor"] == 5
