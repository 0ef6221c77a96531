"""Fused Pallas polar-preprocess kernel: semantics validated in interpreter
mode on CPU against the pure-jnp exact path (the Mosaic-compiled TPU path is
exercised by bench.py and the TPU model graph)."""

import numpy as np
import jax.numpy as jnp

from polardepth_tpu.ops.pallas.polar_preprocess import (
    fused_polar_preprocess, _atan2,
)
from polardepth_tpu.ops.xolp import xolp_from_pol
from polardepth_tpu.ops.fresnel import normal_priors_from_xolp


def _physical_pol(shape, seed):
    """Polarization-consistent captures: I(a) = Iun*(1 + rho cos(2a - 2phi)),
    so DoLP stays in [0, 1) as with real sensors.  (Raw random uint8 per
    channel yields DoLP > 1, landing in the Brewster extrapolation region
    where any float32 evaluation order diverges — see tests/test_fresnel.py.)"""
    rng = np.random.default_rng(seed)
    iun = rng.uniform(30, 220, shape)
    rho = rng.uniform(0, 0.9, shape)
    phi = rng.uniform(-np.pi / 2, np.pi / 2, shape)
    angs = np.deg2rad([0, 45, 90, 135])
    return np.stack([iun * (1 + rho * np.cos(2 * a - 2 * phi)) / 2
                     for a in angs], axis=-1).astype(np.float32)


def test_kernel_matches_exact_path_interpret():
    pol = _physical_pol((1, 16, 24), seed=0)
    xo, pr = fused_polar_preprocess(jnp.asarray(pol), interpret=True)
    assert xo.shape == (1, 16, 24, 2) and pr.shape == (1, 16, 24, 9)
    xo_ref = xolp_from_pol(jnp.asarray(pol))
    pr_ref = normal_priors_from_xolp(xo_ref, 1.5, method="exact")
    np.testing.assert_allclose(np.asarray(xo), np.asarray(xo_ref), atol=2e-6)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(pr_ref), atol=5e-5)


def test_kernel_finite_on_wild_data():
    """Arbitrary uint8 data (DoLP up to ~2, deep extrapolation) must still
    produce finite outputs, even though exact f32 agreement is impossible
    there."""
    rng = np.random.default_rng(0)
    pol = rng.integers(0, 255, (1, 16, 24, 4)).astype(np.float32)
    xo, pr = fused_polar_preprocess(jnp.asarray(pol), interpret=True)
    assert np.all(np.isfinite(np.asarray(xo)))
    assert np.all(np.isfinite(np.asarray(pr)))
    # in-range pixels still agree
    xo_ref = np.asarray(xolp_from_pol(jnp.asarray(pol)))
    pr_ref = np.asarray(normal_priors_from_xolp(jnp.asarray(xo_ref), 1.5,
                                                method="exact"))
    mask = xo_ref[..., 0] <= 0.95
    np.testing.assert_allclose(np.asarray(pr)[mask], pr_ref[mask], atol=5e-5)


def test_kernel_handles_nonmultiple_tile_sizes():
    rng = np.random.default_rng(1)
    pol = rng.integers(0, 255, (3, 7, 11, 4)).astype(np.float32)  # P=231
    xo, pr = fused_polar_preprocess(jnp.asarray(pol), interpret=True)
    assert xo.shape == (3, 7, 11, 2) and pr.shape == (3, 7, 11, 9)
    xo_ref = xolp_from_pol(jnp.asarray(pol))
    np.testing.assert_allclose(np.asarray(xo), np.asarray(xo_ref), atol=2e-6)


def test_kernel_zero_intensity_pixels():
    pol = np.zeros((1, 8, 64, 4), np.float32)
    xo, pr = fused_polar_preprocess(jnp.asarray(pol), interpret=True)
    assert np.all(np.asarray(xo)[..., 0] == 0.0)  # DoLP -> 0 (inf/NaN rule)
    assert np.all(np.isfinite(np.asarray(pr)))


def test_custom_atan2_matches_numpy():
    rng = np.random.default_rng(2)
    y = rng.standard_normal((64, 128)).astype(np.float32) * 10
    x = rng.standard_normal((64, 128)).astype(np.float32) * 10
    # exercise axes and origin too
    y[0, :4] = [0, 0, 1, -1]
    x[0, :4] = [1, -1, 0, 0]
    y[1, 0] = x[1, 0] = 0.0
    # IEEE negative-zero octants: atan2(+-0, -x) = +-pi, atan2(-0, +x) = -0
    y[1, 1:5] = [-0.0, -0.0, 0.0, -0.0]
    x[1, 1:5] = [-1.0, -0.0, -0.0, 2.0]
    got = np.asarray(_atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_kernel_mosaic_matches_exact_on_tpu():
    """TPU-only: the compiled Mosaic kernel must match the exact
    (scipy-parity) Fresnel path on physically consistent data.  The
    interpret branch uses a HIGHEST-precision f32 dot while Mosaic uses the
    exact-bf16 hi/lo table split (~16 mantissa bits on the slope residuals),
    so compiled-vs-interpret only agrees to ~5e-4 in the steep-slope
    extrapolation region of wild data; the meaningful contract is
    compiled-vs-exact in the physical DoLP range (measured 1.5e-5 max,
    round 4).  The banded planar kernel compiles in ~7 s (the round-3
    (512, 4)-tile kernel took ~9 min)."""
    import pytest
    import jax
    if jax.default_backend() not in ("tpu", "axon"):
        pytest.skip("requires a TPU backend for the Mosaic path")
    pol = _physical_pol((2, 64, 64), seed=3)
    xm, pm = fused_polar_preprocess(jnp.asarray(pol), interpret=False)
    xo_ref = xolp_from_pol(jnp.asarray(pol))
    pr_ref = normal_priors_from_xolp(xo_ref, 1.5, method="exact")
    np.testing.assert_allclose(np.asarray(xm), np.asarray(xo_ref),
                               atol=2e-6)
    np.testing.assert_allclose(np.asarray(pm), np.asarray(pr_ref),
                               atol=5e-5)
    # wild data (deep extrapolation): finite, and loose interpret agreement
    rng = np.random.default_rng(0)
    wild = rng.uniform(0, 255, (1, 32, 64, 4)).astype(np.float32)
    xw, pw = fused_polar_preprocess(jnp.asarray(wild), interpret=False)
    xi, pi_ = fused_polar_preprocess(jnp.asarray(wild), interpret=True)
    assert np.all(np.isfinite(np.asarray(pw)))
    np.testing.assert_allclose(np.asarray(xw), np.asarray(xi), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pw), np.asarray(pi_), atol=2e-3)
