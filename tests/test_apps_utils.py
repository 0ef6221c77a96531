"""Downstream apps + utils: point-cloud export/PLY roundtrip, AR compositing
and occlusion, colormap, metric writer, CLI train/evaluate on synthetic data."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from polardepth_tpu.eval.pointcloud import (
    depth_to_pointcloud, write_ply, read_ply,
)
from polardepth_tpu.apps.ar import (
    create_naked_depth, composite_ar_frame, render_ar_gif,
)
from polardepth_tpu.utils.colormap import colormap_plasma, normalize_image
from polardepth_tpu.utils.logging import MetricWriter, sec_to_hm_str


def test_pointcloud_geometry_and_ply_roundtrip(tmp_path):
    h, w = 6, 8
    depth = np.full((h, w), 2.0, np.float32)
    rgb = np.full((h, w, 3), 128, np.uint8)
    fx = fy = 10.0
    cx, cy = 4.0, 3.0
    pts, cols = depth_to_pointcloud(depth, rgb, fx, fy, cx, cy,
                                    flip_yz=False)
    assert pts.shape == (h * w, 3)
    # pixel at the principal point maps to (0, 0, z)
    i = 3 * w + 4
    np.testing.assert_allclose(pts[i], [0, 0, 2.0], atol=1e-6)
    path = str(tmp_path / "c.ply")
    write_ply(path, pts, cols)
    pts2, cols2 = read_ply(path)
    np.testing.assert_array_equal(pts2, pts)
    np.testing.assert_array_equal(cols2, cols)


def test_naked_depth_infill_from_right():
    depth = np.tile(np.arange(6, dtype=np.float64)[None], (2, 1)) + 1
    mask = np.zeros((2, 6), bool)
    mask[0, 2:4] = True  # object occupies columns 2-3 of row 0
    out = create_naked_depth(depth, mask)
    assert out[0, 2] == depth[0, 4] and out[0, 3] == depth[0, 4]
    np.testing.assert_array_equal(out[1], depth[1])
    # object at the right edge keeps its own value (no background to right)
    mask2 = np.zeros((2, 6), bool)
    mask2[0, 4:] = True
    out2 = create_naked_depth(depth, mask2)
    np.testing.assert_array_equal(out2[0, 4:], depth[0, 4:])


def test_ar_occlusion():
    h, w = 40, 60
    rgb = np.zeros((h, w, 3), np.uint8)
    naked = np.full((h, w), 1.0)
    logo = np.full((10, 10, 4), 255, np.uint8)
    # scene all *farther* than logo -> logo fully visible
    far = np.full((h, w), 1.8, np.float32)
    out = composite_ar_frame(rgb, far, naked, logo, 5, 5)
    assert (out > 0).any()
    # scene all *closer* -> logo fully occluded
    near = np.full((h, w), 0.5, np.float32)
    out2 = composite_ar_frame(rgb, near, naked, logo, 5, 5)
    assert not (out2 > 0).any()


def test_render_ar_gif(tmp_path):
    h, w = 32, 48
    rgb = np.random.default_rng(0).integers(0, 255, (h, w, 3)).astype(np.uint8)
    depth = np.full((h, w), 1.5, np.float32)
    mask = np.zeros((h, w), np.uint8)
    logo = np.full((8, 8, 4), 200, np.uint8)
    path = render_ar_gif(str(tmp_path / "ar.gif"), rgb, depth, depth, mask,
                         logo, positions=[(4, 4), (4, 12), (4, 20)])
    assert os.path.getsize(path) > 0


def test_colormap():
    x = np.linspace(0, 1, 64).reshape(8, 8)
    rgb = colormap_plasma(x)
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1
    assert not np.allclose(rgb[0, 0], rgb[-1, -1])
    np.testing.assert_allclose(normalize_image(x * 5 + 2).min(), 0, atol=1e-4)


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    w.scalars("train", 1, {"loss": 0.5})
    w.scalars("val", 2, {"abs_rel": 0.1})
    w.close()
    lines = [json.loads(l) for l in
             open(tmp_path / "metrics.jsonl").read().splitlines()]
    assert lines[0]["mode"] == "train" and lines[0]["loss"] == 0.5
    assert lines[1]["step"] == 2
    assert sec_to_hm_str(3725) == "01h02m05s"


@pytest.mark.parametrize("cmd", [
    ["train", "--synthetic", "2", "--batch_size", "2", "--height", "32",
     "--width", "32", "--num_epochs", "1", "--dropout_rate", "0.0"],
    ["evaluate", "--synthetic", "2", "--batch_size", "2", "--height", "32",
     "--width", "32", "--dropout_rate", "0.0"],
])
def test_cli_smoke(tmp_path, cmd):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    full = cmd + ["--log_dir", str(tmp_path)]
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu'); "
         "jax.config.update('jax_compilation_cache_dir', '.jax_cache'); "
         "from polardepth_tpu.cli import main; "
         f"raise SystemExit(main({full!r}))"],
        capture_output=True, text=True, timeout=1200, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]


def test_cli_bool_parsing():
    from polardepth_tpu.cli import _bool
    assert _bool("False") is False and _bool("true") is True
    assert _bool("0") is False and _bool("1") is True


@pytest.mark.parametrize("extra", [
    ["--depth_supervision_only", "False", "--depth_supervision", "False",
     "--num_epochs", "1"],
])
def test_cli_selfsup_smoke(tmp_path, extra):
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    cmd = ["train", "--synthetic", "2", "--batch_size", "2", "--height",
           "32", "--width", "32", "--dropout_rate", "0.0",
           "--log_dir", str(tmp_path)] + extra
    out = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu'); "
         "jax.config.update('jax_compilation_cache_dir', '.jax_cache'); "
         "from polardepth_tpu.cli import main; "
         f"raise SystemExit(main({cmd!r}))"],
        capture_output=True, text=True, timeout=1500, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert out.returncode == 0, out.stderr[-2000:]


def test_analysis_maps_and_tables():
    from polardepth_tpu.eval.analysis import (
        error_maps, per_material_rms, render_error_heatmap, render_normals)
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.3, 1.8, (16, 20)).astype(np.float32)
    pred = np.clip(gt + rng.normal(0, 0.05, gt.shape), 0.1, 2.0)
    inst = np.full((16, 20), 180, np.int32)
    inst[:8] = 160  # glass top half
    maps = error_maps(pred, gt)
    assert maps["valid"].all()
    np.testing.assert_allclose(maps["abs"], np.abs(pred - gt), atol=1e-6)
    rms = per_material_rms(pred, gt, inst)
    assert np.isfinite(rms["glass"]) and np.isfinite(rms["table"])
    assert np.isnan(rms["cup"])  # material absent
    hm = render_error_heatmap(pred, gt)
    assert hm.shape == (16, 20, 3)
    K = np.array([[100, 0, 10], [0, 100, 8], [0, 0, 1]], np.float32)
    nrm = render_normals(gt, K)
    assert nrm.shape == (16, 20, 3)
    assert nrm.min() >= 0 and nrm.max() <= 1
