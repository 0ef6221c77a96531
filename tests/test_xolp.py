"""Golden parity tests for the XOLP Stokes fit against a tiny numpy oracle
replicating the reference algorithm (polarisation/xolp.py:8-34):
per-pixel np.linalg.lstsq over the 4x3 design matrix."""

import numpy as np
import jax.numpy as jnp

from polardepth_tpu.ops.xolp import iun_and_xolp, xolp_from_pol


def _oracle(images4: np.ndarray):
    """images4: (H, W, 4) float. Returns (Iun, rho, phi) per the reference."""
    angles = np.array([0, 45, 90, 135]) * np.pi / 180
    I = images4.reshape(-1, 4)
    A = np.zeros((4, 3))
    A[:, 0] = 1
    A[:, 1] = np.cos(2 * angles)
    A[:, 2] = np.sin(2 * angles)
    x = np.linalg.lstsq(A, I.T, rcond=None)[0].T
    amp = np.sqrt(x[:, 1] ** 2 + x[:, 2] ** 2)
    imax, imin = x[:, 0] + amp, x[:, 0] - amp
    iun = (imax + imin) / 2
    with np.errstate(divide="ignore", invalid="ignore"):
        rho = np.true_divide(imax - imin, imax + imin)
        rho[rho == np.inf] = 0
        rho = np.nan_to_num(rho)
    phi = 0.5 * np.arctan2(x[:, 2], x[:, 1])
    h, w = images4.shape[:2]
    return iun.reshape(h, w), rho.reshape(h, w), phi.reshape(h, w)


def test_xolp_matches_lstsq_oracle():
    rng = np.random.default_rng(0)
    # uint8-scale grays like the real pipeline (indoor_dataset feeds 0..255)
    imgs = rng.integers(0, 256, size=(16, 24, 4)).astype(np.float64)
    iun_o, rho_o, phi_o = _oracle(imgs)
    iun, rho, phi = iun_and_xolp(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(iun), iun_o, rtol=1e-10, atol=1e-8)
    np.testing.assert_allclose(np.asarray(rho), rho_o, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.asarray(phi), phi_o, rtol=1e-9, atol=1e-10)


def test_xolp_zero_intensity_maps_to_zero_dolp():
    imgs = np.zeros((4, 4, 4))
    _, rho, _ = iun_and_xolp(jnp.asarray(imgs))
    assert np.all(np.asarray(rho) == 0.0)


def test_xolp_recovers_known_polarization():
    # Synthesize I(theta) = a + b cos 2theta + c sin 2theta directly.
    h, w = 8, 8
    rng = np.random.default_rng(1)
    a = rng.uniform(50, 200, (h, w))
    dolp = rng.uniform(0, 0.9, (h, w))
    aolp = rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, (h, w))
    b = a * dolp * np.cos(2 * aolp)
    c = a * dolp * np.sin(2 * aolp)
    angs = np.array([0, 45, 90, 135]) * np.pi / 180
    imgs = np.stack([a + b * np.cos(2 * t) + c * np.sin(2 * t) for t in angs],
                    axis=-1)
    _, rho, phi = iun_and_xolp(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(rho), dolp, atol=1e-5)
    np.testing.assert_allclose(np.asarray(phi), aolp, atol=1e-5)


def test_xolp_from_pol_channel_order():
    rng = np.random.default_rng(2)
    imgs = rng.uniform(0, 255, size=(2, 6, 6, 4))
    out = np.asarray(xolp_from_pol(jnp.asarray(imgs)))
    assert out.shape == (2, 6, 6, 2)
    _, rho_o, phi_o = _oracle(imgs[0])
    np.testing.assert_allclose(out[0, ..., 0], rho_o, atol=1e-6)
    np.testing.assert_allclose(out[0, ..., 1], phi_o, atol=1e-6)
