"""Fresnel physics: DoLP -> zenith-angle inversion and normal priors.

The reference inverts the Fresnel rho(theta) curves *mid-forward on the host
CPU* — it calls .cpu().numpy(), builds 1000-point curves with numpy, runs
scipy.interpolate.interp1d(fill_value="extrapolate"), and ships the result
back to CUDA (reference: manydepth/normals_vec.py:11-60, called from
manydepth/networks/pre_encoders.py:99-113).  Here the curves are baked into
small constant LUTs at trace time (float64 numpy, identical formulas) and the
inversion is a branchless searchsorted + linear interpolation that stays on
device and fuses under XLA.

Numerics notes for parity with scipy.interpolate.interp1d(kind='linear',
fill_value="extrapolate", assume_sorted=False):
  * diffuse curve rho_d(theta) is strictly increasing on [0, pi/2] -> direct.
  * specular curve rho_s(theta) is unimodal; the reference splits it at
    argmax into an increasing branch [0:imax) and a decreasing branch
    [imax:].  interp1d sorts the decreasing branch ascending (stable sort ==
    exact reversal), which we replicate by flipping the arrays.
  * out-of-range queries extrapolate linearly from the first/last segment —
    implemented by clamping the segment index, never the query.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

_N_SAMPLES = 1000  # reference: np.linspace(0, np.pi/2, 1000)


@functools.lru_cache(maxsize=8)
def _diffuse_curve(n: float):
    """rho_d(theta) from Fresnel theory for the diffuse-reflection branch
    (reference: normals_vec.py:13-19, float64)."""
    theta = np.linspace(0.0, np.pi / 2, _N_SAMPLES)
    s2 = np.sin(theta) ** 2
    rho = ((n - 1.0 / n) ** 2 * s2) / (
        2.0 + 2.0 * n ** 2
        - (n + 1.0 / n) ** 2 * s2
        + 4.0 * np.cos(theta) * np.sqrt(n ** 2 - s2)
    )
    return rho, theta


@functools.lru_cache(maxsize=8)
def _specular_curves(n: float):
    """The two monotone branches of the specular rho_s(theta) curve, split at
    argmax (reference: normals_vec.py:27-47); the decreasing branch is
    returned flipped so both are ascending in rho."""
    theta = np.linspace(0.0, np.pi / 2, _N_SAMPLES)
    s = np.sin(theta)
    rho = (2.0 * s ** 2 * np.cos(theta) * np.sqrt(n ** 2 - s ** 2)) / (
        n ** 2 - s ** 2 - n ** 2 * s ** 2 + 2.0 * s ** 4
    )
    imax = int(np.argmax(rho))
    branch1 = (rho[:imax], theta[:imax])
    branch2 = (rho[imax:][::-1].copy(), theta[imax:][::-1].copy())
    return branch1, branch2


class FresnelLUT:
    """Precomputed rho->theta inversion tables for a given refraction index."""

    def __init__(self, n: float = 1.5):
        self.n = float(n)
        self.diffuse = tuple(np.ascontiguousarray(a) for a in _diffuse_curve(self.n))
        b1, b2 = _specular_curves(self.n)
        self.spec1 = b1
        self.spec2 = b2


def interp1d_extrapolate(x: jnp.ndarray, xp: np.ndarray, fp: np.ndarray,
                         dtype=None) -> jnp.ndarray:
    """Linear interpolation with linear extrapolation beyond both ends.

    Matches scipy.interpolate.interp1d(kind='linear',
    fill_value='extrapolate') for ascending ``xp``.  ``xp``/``fp`` are host
    constants baked into the graph; the interp itself is a searchsorted +
    two gathers, fully on-device.
    """
    dtype = dtype or x.dtype
    xp_j = jnp.asarray(xp, dtype=dtype)
    fp_j = jnp.asarray(fp, dtype=dtype)
    # Segment index in [0, len-2]; clamping (not clipping x) yields linear
    # extrapolation from the boundary segments.
    idx = jnp.clip(jnp.searchsorted(xp_j, x, side="right") - 1, 0, xp_j.shape[0] - 2)
    x0 = jnp.take(xp_j, idx)
    x1 = jnp.take(xp_j, idx + 1)
    f0 = jnp.take(fp_j, idx)
    f1 = jnp.take(fp_j, idx + 1)
    t = (x - x0) / (x1 - x0)
    return f0 + t * (f1 - f0)


def theta_diffuse(rho: jnp.ndarray, n: float = 1.5) -> jnp.ndarray:
    """Zenith angle from DoLP, diffuse branch (reference: rho_diffuse)."""
    lut = FresnelLUT(n)
    return interp1d_extrapolate(rho, *lut.diffuse)


def theta_specular(rho: jnp.ndarray, n: float = 1.5):
    """Two zenith-angle interpretations from DoLP, specular branches
    (reference: rho_spec)."""
    lut = FresnelLUT(n)
    t1 = interp1d_extrapolate(rho, *lut.spec1)
    t2 = interp1d_extrapolate(rho, *lut.spec2)
    return t1, t2


def spherical_normals(phi: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """(azimuth, zenith) -> unit normal, stacked on a new trailing axis
    (reference: calc_normals, but channels-last)."""
    st = jnp.sin(theta)
    return jnp.stack([jnp.cos(phi) * st, jnp.sin(phi) * st, jnp.cos(theta)],
                     axis=-1)


def normal_priors_from_xolp(xolp: jnp.ndarray, n: float = 1.5) -> jnp.ndarray:
    """The 9-channel physics prior: (..., 2) XOLP -> (..., 9) normals.

    Channel blocks (matching ShallowNormalsEncoder.get_normals,
    pre_encoders.py:99-113): N_diffuse(phi), N_spec1(phi + pi/2),
    N_spec2(phi + pi/2) — the specular azimuth is rotated 90 deg per Fresnel
    theory.  Entirely fused elementwise math + two tiny LUT gathers.
    """
    rho = xolp[..., 0]
    phi = xolp[..., 1]
    t_d = theta_diffuse(rho, n)
    t_s1, t_s2 = theta_specular(rho, n)
    phi_spec = phi + jnp.asarray(np.pi / 2, dtype=phi.dtype)
    return jnp.concatenate([
        spherical_normals(phi, t_d),
        spherical_normals(phi_spec, t_s1),
        spherical_normals(phi_spec, t_s2),
    ], axis=-1)
