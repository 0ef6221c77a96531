"""Offline physics-normals script (scripts/physical_normals.py) — the
ppp_code/physical_normals_channels.py analog: end-to-end file IO plus a
numpy oracle parity check of the masked Stokes form."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

cv2 = pytest.importorskip("cv2")

from physical_normals import compute_normal_pngs, process_image  # noqa: E402


def _fixture(tmp_path, image_no=3, h=20, w=24, seed=0):
    rng = np.random.default_rng(seed)
    iun = rng.uniform(60, 200, (h, w))
    rho = rng.uniform(0.05, 0.5, (h, w))
    phi = rng.uniform(-np.pi / 2, np.pi / 2, (h, w))
    (tmp_path / "images").mkdir()
    (tmp_path / "masks").mkdir()
    pol = {}
    for ang in (0, 45, 90, 135):
        a = np.deg2rad(ang)
        img = iun * (1 + rho * np.cos(2 * a - 2 * phi)) / 2
        pol[ang] = img.astype(np.uint8)
        cv2.imwrite(str(tmp_path / "images" / f"image{image_no}_{ang}.png"),
                    pol[ang])
    mask = np.zeros((h, w), np.uint8)
    mask[4:16, 6:20] = 255
    cv2.imwrite(str(tmp_path / "masks" / f"mask{image_no}.png"), mask)
    return pol, mask.astype(bool)


def test_script_writes_three_normal_pngs(tmp_path):
    _fixture(tmp_path)
    process_image(str(tmp_path), 3)
    for name in ("diffuse3.png", "specular3_1.png", "specular3_2.png"):
        p = tmp_path / "normals" / name
        assert p.exists()
        img = cv2.imread(str(p), cv2.IMREAD_UNCHANGED)
        assert img.shape == (20, 24, 3)
        assert img.max() > 0  # something was written inside the mask
    # outside the mask everything is zero
    d = cv2.imread(str(tmp_path / "normals" / "diffuse3.png"),
                   cv2.IMREAD_UNCHANGED)
    assert d[:4].max() == 0 and d[:, :6].max() == 0


def test_masked_stokes_matches_reference_oracle(tmp_path):
    """compute_normal_pngs vs the reference's numpy Stokes pipeline
    (ppp_code/physical_normals_channels.py:15-36 + scipy inversion,
    re-derived here as an oracle)."""
    import scipy.interpolate

    pol, mask = _fixture(tmp_path, seed=5)
    images = np.stack([pol[0], pol[45], pol[90], pol[135]],
                      axis=-1).astype(np.float64)
    images = images * mask[..., None]
    s0 = images[..., 0] + images[..., 2]
    s1 = images[..., 0] - images[..., 2]
    s2 = images[..., 1] - images[..., 3]
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = np.sqrt(s1 ** 2 + s2 ** 2) / s0
    rho = np.nan_to_num(rho, posinf=0.0)
    phi = 0.5 * np.arctan2(s2, s1)
    n = 1.5
    theta_d = np.linspace(0, np.pi / 2, 1000)
    rho_d = ((n - 1 / n) ** 2 * np.sin(theta_d) ** 2) / (
        2 + 2 * n ** 2 - (n + 1 / n) ** 2 * np.sin(theta_d) ** 2
        + 4 * np.cos(theta_d) * np.sqrt(n ** 2 - np.sin(theta_d) ** 2))
    theta = scipy.interpolate.interp1d(
        rho_d, theta_d, fill_value="extrapolate")(rho)
    oracle_diff = np.stack([np.cos(phi) * np.sin(theta),
                            np.sin(phi) * np.sin(theta),
                            np.cos(theta)], axis=-1)
    oracle_diff = np.clip(oracle_diff, 0, 1) * mask[..., None]

    got_diff, _, _ = compute_normal_pngs(
        np.stack([pol[0], pol[45], pol[90], pol[135]], axis=-1), mask, n)
    # f32 pruned-LUT evaluation vs the f64 scipy oracle: differences
    # concentrate where the rho(theta) curve is steep (slope -> inf near
    # the curve maximum); 5e-3 bounds them (ops/fresnel.py parity tests
    # pin the tight per-segment tolerances)
    np.testing.assert_allclose(got_diff, oracle_diff, atol=5e-3)
