"""XOLP: degree (DoLP) and angle (AoLP) of linear polarization from 4 captures.

The reference solves a per-pixel least-squares Stokes fit
I(theta) = a + b*cos(2 theta) + c*sin(2 theta) over polarizer angles
[0, 45, 90, 135] deg with ``np.linalg.lstsq`` on the host CPU inside
DataLoader workers (reference: polarisation/xolp.py:8-34, consumed at
manydepth/datasets/indoor_dataset.py:430-442).

The design matrix A is constant, so lstsq(A, I) == pinv(A) @ I exactly (A has
full column rank; for full-rank A the minimum-norm least-squares solution is
the unique solution and both reduce to the Moore-Penrose pseudoinverse).  We
precompute pinv(A) once in float64 at trace time and the whole fit becomes a
tiny 4->3 contraction per pixel that XLA fuses with its consumers — one
elementwise chain on the VPU, no solver, no host round trip.

Angle convention (matches indoor_dataset.py:434-439): the four quad-mosaic
images map to polarizer angles as im00=0deg, im01=45deg, im10=90deg,
im11=135deg and are stacked in the order (im00, im01, im10, im11), i.e. the
channel order of ``pol`` here is [0, 45, 90, 135] degrees.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

_ANGLES_DEG = np.array([0.0, 45.0, 90.0, 135.0])


def _design_matrix_pinv() -> np.ndarray:
    """pinv of the 4x3 design matrix, float64, built exactly as the reference
    builds A (including the ~1e-16 trig residue of cos(pi) etc.)."""
    angles = _ANGLES_DEG * np.pi / 180.0
    A = np.zeros((4, 3))
    A[:, 0] = 1.0
    A[:, 1] = np.cos(2.0 * angles)
    A[:, 2] = np.sin(2.0 * angles)
    return np.linalg.pinv(A)  # (3, 4)


_PINV = _design_matrix_pinv()


def iun_and_xolp(pol: jnp.ndarray):
    """Stokes fit over the trailing 4-channel axis.

    Args:
      pol: (..., 4) polarized intensities at [0, 45, 90, 135] deg.  Any scale
        (the reference feeds uint8 0..255 grays); rho and phi are
        scale-invariant but Iun keeps the input scale.

    Returns:
      (iun, rho, phi): each (...,).  iun = unpolarized intensity (a),
      rho = DoLP in [0, 1] with inf/NaN -> 0 (reference: xolp.py:26-29),
      phi = AoLP = 0.5*atan2(c, b) in (-pi/2, pi/2].
    """
    pinv = jnp.asarray(_PINV, dtype=pol.dtype)
    # HIGHEST: TPU's default-precision dot truncates to bf16 multiplies,
    # which costs ~4e-3 absolute in rho (measured vs an f64 oracle,
    # scripts/probe_mosaic.py stage 5) and up to 0.4 in the Fresnel
    # normals it feeds.  The contraction is 4x3 — HIGHEST is free here.
    abc = jnp.einsum("...k,ck->...c", pol, pinv,
                     precision=lax.Precision.HIGHEST)
    a, b, c = abc[..., 0], abc[..., 1], abc[..., 2]
    amp = jnp.sqrt(b * b + c * c)
    # rho = (Imax - Imin) / (Imax + Imin) with Imax/min = a +/- amp  ==  amp/a.
    rho = amp / a
    rho = jnp.where(jnp.isfinite(rho), rho, jnp.zeros_like(rho))
    phi = 0.5 * jnp.arctan2(c, b)
    return a, rho, phi


def xolp_from_pol(pol: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) pol intensities -> (..., 2) XOLP map stacked (DoLP, AoLP).

    Channel order matches the reference's ("xolp", i, 0) tensors
    (indoor_dataset.py:441: np.stack((dolp, aolp))).
    """
    _, rho, phi = iun_and_xolp(pol)
    return jnp.stack([rho, phi], axis=-1)
