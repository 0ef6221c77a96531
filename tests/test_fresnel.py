"""Parity tests for the Fresnel rho->theta inversion against scipy's
interp1d(fill_value='extrapolate') on the exact reference curves
(manydepth/normals_vec.py:11-60)."""

import numpy as np
import scipy.interpolate
import jax.numpy as jnp

from polardepth_tpu.ops.fresnel import (
    theta_diffuse, theta_specular, spherical_normals, normal_priors_from_xolp,
)

N = 1.5


def _scipy_diffuse(rho):
    theta_d = np.linspace(0, np.pi / 2, 1000)
    rho_d = ((N - 1 / N) ** 2 * np.sin(theta_d) ** 2) / (
        2 + 2 * N ** 2 - (N + 1 / N) ** 2 * np.sin(theta_d) ** 2
        + 4 * np.cos(theta_d) * np.sqrt(N ** 2 - np.sin(theta_d) ** 2))
    f = scipy.interpolate.interp1d(rho_d, theta_d, fill_value="extrapolate")
    return f(rho)


def _scipy_spec(rho):
    theta_s = np.linspace(0, np.pi / 2, 1000)
    rho_s = (2 * np.sin(theta_s) ** 2 * np.cos(theta_s)
             * np.sqrt(N ** 2 - np.sin(theta_s) ** 2)) / (
        N ** 2 - np.sin(theta_s) ** 2 - N ** 2 * np.sin(theta_s) ** 2
        + 2 * np.sin(theta_s) ** 4)
    imax = np.argmax(rho_s)
    f1 = scipy.interpolate.interp1d(rho_s[:imax], theta_s[:imax],
                                    fill_value="extrapolate")
    f2 = scipy.interpolate.interp1d(rho_s[imax:], theta_s[imax:],
                                    fill_value="extrapolate")
    return f1(rho), f2(rho)


def test_theta_diffuse_matches_scipy_in_range_and_extrapolated():
    # includes rho beyond the curve max (0.385 for n=1.5) -> extrapolation
    rho = np.concatenate([np.linspace(0, 0.38, 101), [0.5, 0.9, 1.0, -0.05]])
    got = np.asarray(theta_diffuse(jnp.asarray(rho, jnp.float64), N))
    want = _scipy_diffuse(rho)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_theta_specular_matches_scipy_both_branches():
    rho = np.concatenate([np.linspace(0, 1.0, 201), [1.05, -0.02]])
    g1, g2 = theta_specular(jnp.asarray(rho, jnp.float64), N)
    w1, w2 = _scipy_spec(rho)
    np.testing.assert_allclose(np.asarray(g1), w1, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(g2), w2, rtol=1e-9, atol=1e-9)


def test_spherical_normals_formula():
    phi = jnp.asarray([0.0, np.pi / 2])
    theta = jnp.asarray([np.pi / 4, np.pi / 3])
    n = np.asarray(spherical_normals(phi, theta))
    want = np.stack([np.cos(phi) * np.sin(theta),
                     np.sin(phi) * np.sin(theta),
                     np.cos(theta)], axis=-1)
    np.testing.assert_allclose(n, want, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-6)


def test_normal_priors_shape_and_blocks():
    rng = np.random.default_rng(3)
    xolp = np.stack([rng.uniform(0, 0.9, (2, 5, 7)),
                     rng.uniform(-1.5, 1.5, (2, 5, 7))], axis=-1)
    out = np.asarray(normal_priors_from_xolp(jnp.asarray(xolp), N,
                                             method="exact"))
    assert out.shape == (2, 5, 7, 9)
    rho, phi = xolp[..., 0], xolp[..., 1]
    td = _scipy_diffuse(rho)
    t1, t2 = _scipy_spec(rho)
    np.testing.assert_allclose(out[..., 0], np.cos(phi) * np.sin(td), atol=1e-5)
    np.testing.assert_allclose(out[..., 2], np.cos(td), atol=1e-5)
    # specular blocks use azimuth phi + pi/2
    np.testing.assert_allclose(out[..., 3], np.cos(phi + np.pi / 2) * np.sin(t1),
                               atol=1e-5)
    np.testing.assert_allclose(out[..., 8], np.cos(t2), atol=1e-5)


def test_fused_interp_matches_exact_path():
    """The TPU fast path (compare-matrix matmul) must agree with the exact
    searchsorted LUT interpolation to float32-telescoping tolerance on the
    physical DoLP range.  (Beyond the Brewster knee, rho > ~0.95, the
    specular extrapolation slope is ~1e4 and *any* float32 evaluation order
    diverges — the reference itself only gets stable values there because
    scipy upcasts to float64.)"""
    rng = np.random.default_rng(4)
    xolp = np.stack([rng.uniform(0, 0.95, (3, 16, 16)),
                     rng.uniform(-1.5, 1.5, (3, 16, 16))],
                    axis=-1).astype(np.float32)
    fused = np.asarray(normal_priors_from_xolp(jnp.asarray(xolp), N,
                                               method="fused"))
    exact = np.asarray(normal_priors_from_xolp(jnp.asarray(xolp), N,
                                               method="exact"))
    np.testing.assert_allclose(fused, exact, atol=5e-5)

    # The diffuse channel stays tight even deep into extrapolation.
    wild = np.stack([rng.uniform(0.95, 1.1, (8, 8)),
                     rng.uniform(-1.5, 1.5, (8, 8))], axis=-1).astype(np.float32)
    f2 = np.asarray(normal_priors_from_xolp(jnp.asarray(wild), N, "fused"))
    e2 = np.asarray(normal_priors_from_xolp(jnp.asarray(wild), N, "exact"))
    np.testing.assert_allclose(f2[..., :3], e2[..., :3], atol=1e-4)


def test_hier_interp_matches_exact_path():
    """The round-4 two-level lookup (HierarchicalInterp, method="hier" — the
    scheme the banded Pallas kernel implements) must agree with the exact
    path at least as tightly as the flat fused form: its f32 accumulation
    spans <=7 deltas from an exactly stored base instead of up to ~1000
    telescoped terms."""
    rng = np.random.default_rng(5)
    xolp = np.stack([rng.uniform(0, 0.95, (3, 16, 16)),
                     rng.uniform(-1.5, 1.5, (3, 16, 16))],
                    axis=-1).astype(np.float32)
    hier = np.asarray(normal_priors_from_xolp(jnp.asarray(xolp), N,
                                              method="hier"))
    exact = np.asarray(normal_priors_from_xolp(jnp.asarray(xolp), N,
                                               method="exact"))
    np.testing.assert_allclose(hier, exact, atol=5e-5)

    # extrapolation: finite and diffuse-tight (no right-tail override is
    # needed in the hierarchical form; last segment is stored exactly)
    wild = np.stack([rng.uniform(0.95, 1.3, (8, 8)),
                     rng.uniform(-1.5, 1.5, (8, 8))], axis=-1).astype(np.float32)
    h2 = np.asarray(normal_priors_from_xolp(jnp.asarray(wild), N, "hier"))
    e2 = np.asarray(normal_priors_from_xolp(jnp.asarray(wild), N, "exact"))
    assert np.all(np.isfinite(h2))
    np.testing.assert_allclose(h2[..., :3], e2[..., :3], atol=1e-4)
