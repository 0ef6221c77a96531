"""Fused Pallas kernel: 4 polarizer captures -> XOLP + 9-channel Fresnel
normal priors, one VMEM-resident pass (round-4 banded/planar rewrite).

Matches the reference preprocessing chain polarisation/xolp.py:8-34 (Stokes
fit) + manydepth/normals_vec.py:11-60 (Fresnel rho->theta inversion and
normal priors), which the reference runs partly on the host CPU mid-forward.

Why the round-3 kernel lost to XLA by 2.5x (VERDICT r3 #1): it processed
(512, 4)-shaped pixel tiles, so every elementwise op ran at 4/128 (or 1/128)
lane utilization across 4096 tiny grid steps, and the Fresnel segment lookup
was a flat (pixels x ~1000 knots) compare-matrix matmul.  This rewrite keeps
the planar-layout + full-lane-tile lessons from ops/pallas/band_warp.py:

  * Layout: pol enters channel-planar as (4, P/128, 128) and all 11 output
    channels leave planar as (11, P/128, 128) — every elementwise op runs on
    full (ROWS, 128) VPU tiles.
  * Fresnel inversion is the two-level scheme of
    ops/fresnel.py:HierarchicalInterp: per 128-pixel lane row, ONE
    (128, 128) @ (128, 128) MXU product (bf16 hi/lo split of the table,
    exact 0/1 one-hot rhs -> f32-exact parameters in two passes) fetches
    the 8-segment group tables of all three curves at once; an 8-compare
    fine stage finishes the piecewise-linear evaluation elementwise.
    Nothing pixel x knot ever exists outside VMEM.
  * Numerics: <=7-term f32 delta accumulation against exactly stored group
    bases — tighter than the flat telescoped XLA path, no right-tail
    override needed.  atan2 is the same signbit/copysign-correct polynomial
    as round 3 (Mosaic has no atan2 lowering).

Per (ROWS, 128)-pixel grid step:
  1. Stokes fit abc = pol . pinv(A)^T (12 FMAs; ops/xolp.py semantics,
     inf/NaN -> 0 rule included).
  2. rho, phi = |(b,c)|/a, atan2(c,b)/2.
  3. Per lane row r (unrolled): coarse prefix compare against <=128 bin
     knots -> one-hot via masked shifted subtraction -> two bf16 MXU passes
     against the split group table -> (128, 128) parameters.
  4. Fine stage + theta evaluation + trig -> 11 output channels
     [rho, phi, N_diff(3), N_spec1(3), N_spec2(3)].

Kernel table layout (rows of the transposed table, per curve ci at offset
40*ci): [fine_thresh(8, pad +inf), d_x0(8, pad 0), d_f0(8), d_slope(8),
base_x0, base_f0, base_slope, pad(5)] — every sliced group is 8-sublane
aligned.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polardepth_tpu.ops.xolp import _PINV
from polardepth_tpu.ops.fresnel import HierarchicalInterp

ROWS = 16      # lane rows (of 128 pixels) per grid step
NB = 128       # padded coarse-bin count (all three curves concatenated)
TROWS = 128    # padded table rows: 3 curves x 40 -> 128
# Compare sentinel: must dominate any rho (~1.1) but stay far from f32/bf16
# max so bf16 hi/lo splits and emulated-precision dots cannot overflow.
_BIG = np.float32(1.0e6)

# atan(t)/t as a degree-12 polynomial in s = t^2 on t in [0, 1] (Chebyshev
# interpolation nodes, converted to power basis; max error 5.9e-12 < f32
# eps).  Mosaic has no atan2 lowering, so we build it from this.
_ATAN_COEF = (
    1.00000000e+00, -3.33333330e-01, 1.99999783e-01, -1.42852256e-01,
    1.11053069e-01, -9.04918011e-02, 7.49526609e-02, -6.02220522e-02,
    4.36467291e-02, -2.60061417e-02, 1.14277296e-02, -3.19546183e-03,
    4.19233939e-04,
)


def _atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Branch-free float32 atan2 for Pallas TPU kernels.

    Range-reduce to t = min/max in [0, 1], evaluate the polynomial, then
    unfold the octant reductions.  Matches jnp.arctan2 to ~1e-7 everywhere,
    including the axes; atan2(0, 0) = 0 like numpy.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, jnp.float32(1e-37))  # in [0, 1]; 0 at origin
    s = t * t
    poly = jnp.float32(_ATAN_COEF[-1])
    for c in _ATAN_COEF[-2::-1]:
        poly = poly * s + jnp.float32(c)
    r = poly * t                                   # atan(t)
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    # signbit, not `< 0`: IEEE atan2(+-0, -0.0) = +-pi
    r = jnp.where(jnp.signbit(x), jnp.float32(np.pi) - r, r)
    # r >= 0 here, and IEEE atan2's sign always matches y's INCLUDING
    # -0.0 (atan2(-0.0, -x) = -pi); `y < 0` misses negative zero.
    return jnp.copysign(r, y)


@functools.lru_cache(maxsize=8)
def _tables(n: float, prune_tol: float | None):
    """Kernel constants from HierarchicalInterp, padded to MXU-friendly
    shapes: coarse knots (NB, 1), inner-bin mask (NB, 1), and the group
    table transposed into the aligned kernel layout, split into exact-bf16
    hi/lo halves (TROWS, NB) each."""
    hi = HierarchicalInterp(n, prune_tol=prune_tol)
    nb = hi._cknots.shape[0]
    if nb > NB:
        raise ValueError(f"coarse bins {nb} exceed padded NB={NB}")
    ck = np.full((NB, 1), _BIG)
    ck[:nb, 0] = hi._cknots
    inner = np.zeros((NB, 1), np.float32)
    inner[:nb, 0] = hi._inner.astype(np.float32)
    tabT = np.zeros((TROWS, NB), np.float32)
    src = hi._table.astype(np.float32)            # (nb, 93)
    for ci in range(3):
        s, d = 31 * ci, 40 * ci
        tabT[d + 0:d + 7, :nb] = src[:, s + 0:s + 7].T     # fine thresholds
        tabT[d + 7, :nb] = _BIG                            # pad threshold
        tabT[d + 8:d + 15, :nb] = src[:, s + 7:s + 14].T   # d_x0 (pad 0)
        tabT[d + 16:d + 23, :nb] = src[:, s + 14:s + 21].T  # d_f0
        tabT[d + 24:d + 31, :nb] = src[:, s + 21:s + 28].T  # d_slope
        tabT[d + 32:d + 35, :nb] = src[:, s + 28:s + 31].T  # bases
    import ml_dtypes
    t_hi = tabT.astype(ml_dtypes.bfloat16).astype(np.float32)
    t_lo = tabT - t_hi
    return ck, inner, t_hi, t_lo


def _make_kernel(interpret: bool):
    w = [[np.float32(v) for v in row] for row in _PINV]

    def dotT(t_hi, t_lo, oh):
        """(TROWS, NB) @ (NB, 128) with the table pre-split hi/lo bf16.

        The one-hot rhs is exact in bf16, so two default-precision MXU
        passes reproduce the f32 product.  Interpret mode uses a HIGHEST
        f32 dot instead (XLA on CPU/TPU outside Mosaic folds f32->bf16
        converts feeding a dot, which would double-count the hi half —
        same caveat as ops/pallas/band_warp.py:_dot3)."""
        if interpret:
            return jnp.dot(t_hi + t_lo, oh,
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)
        ohb = oh.astype(jnp.bfloat16)
        return (jnp.dot(t_hi.astype(jnp.bfloat16), ohb,
                        preferred_element_type=jnp.float32)
                + jnp.dot(t_lo.astype(jnp.bfloat16), ohb,
                          preferred_element_type=jnp.float32))

    def kernel(pol_ref, ck_ref, inner_ref, thi_ref, tlo_ref, out_ref):
        p0 = pol_ref[0].astype(jnp.float32)       # (ROWS, 128)
        p1 = pol_ref[1].astype(jnp.float32)
        p2 = pol_ref[2].astype(jnp.float32)
        p3 = pol_ref[3].astype(jnp.float32)
        a = p0 * w[0][0] + p1 * w[0][1] + p2 * w[0][2] + p3 * w[0][3]
        b = p0 * w[1][0] + p1 * w[1][1] + p2 * w[1][2] + p3 * w[1][3]
        c = p0 * w[2][0] + p1 * w[2][1] + p2 * w[2][2] + p3 * w[2][3]
        amp = jnp.sqrt(b * b + c * c)
        rho = amp / a
        rho = jnp.where(jnp.isfinite(rho), rho, 0.0)       # (ROWS, 128)
        phi = 0.5 * _atan2(c, b)

        sin_p = jnp.sin(phi)
        cos_p = jnp.cos(phi)
        out_ref[0] = rho
        out_ref[1] = phi

        ck = ck_ref[:]                                     # (NB, 1)
        inner = inner_ref[:]
        t_hi = thi_ref[:]
        t_lo = tlo_ref[:]
        zrow = jnp.zeros((1, 128), jnp.float32)
        # rows[ci][comp] collects the per-lane-row (1, 128) results
        rows = [[[], [], []] for _ in range(3)]
        for r in range(ROWS):
            rho_r = rho[r:r + 1, :]                        # (1, 128)
            ge = (rho_r >= ck).astype(jnp.float32)         # (NB, 128)
            # one-hot: prefix minus section-masked shifted prefix
            ge_next = jnp.concatenate([ge[1:], zrow], axis=0) * inner
            oh = ge - ge_next
            params = dotT(t_hi, t_lo, oh)                  # (TROWS, 128)
            for ci in range(3):
                o = 40 * ci
                gf = (rho_r >= params[o:o + 8]).astype(jnp.float32)
                x0 = params[o + 32:o + 33] + jnp.sum(
                    gf * params[o + 8:o + 16], axis=0, keepdims=True)
                f0 = params[o + 33:o + 34] + jnp.sum(
                    gf * params[o + 16:o + 24], axis=0, keepdims=True)
                sl = params[o + 34:o + 35] + jnp.sum(
                    gf * params[o + 24:o + 32], axis=0, keepdims=True)
                th = f0 + (rho_r - x0) * sl                # (1, 128)
                st = jnp.sin(th)
                ct = jnp.cos(th)
                if ci == 0:
                    az_c, az_s = cos_p[r:r + 1], sin_p[r:r + 1]
                else:  # specular azimuth phi + pi/2 analytically
                    az_c, az_s = -sin_p[r:r + 1], cos_p[r:r + 1]
                rows[ci][0].append(az_c * st)
                rows[ci][1].append(az_s * st)
                rows[ci][2].append(ct)
        for ci in range(3):
            for comp in range(3):
                out_ref[2 + 3 * ci + comp] = jnp.concatenate(
                    rows[ci][comp], axis=0)

    return kernel


def fused_polar_preprocess(pol: jnp.ndarray, n: float = 1.5,
                           prune_tol: float | None = 1e-5,
                           interpret: bool | None = None):
    """pol (..., 4) [0..255-scale grays at 0/45/90/135 deg] ->
    (xolp (..., 2), priors (..., 9)), all float32.

    prune_tol: adaptive knot-pruning tolerance in radians (None = the full
    1000-point reference grids — rejected here because the coarse bins would
    exceed the padded 128; 1e-5 keeps ~1/3 of the knots and stays below the
    float32 evaluation noise of the LUT itself).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    shape = pol.shape[:-1]
    flat = jnp.moveaxis(pol.astype(jnp.float32).reshape(-1, 4), -1, 0)
    P = flat.shape[1]
    tile = ROWS * 128
    pad = (-P) % tile
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.ones((4, pad), jnp.float32)], axis=1)
    R_total = flat.shape[1] // 128
    planes = flat.reshape(4, R_total, 128)

    ck, inner, t_hi, t_lo = _tables(float(n), prune_tol)
    kernel = _make_kernel(interpret)

    out = pl.pallas_call(
        kernel,
        grid=(R_total // ROWS,),
        in_specs=[pl.BlockSpec((4, ROWS, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NB, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((NB, 1), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TROWS, NB), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TROWS, NB), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((11, ROWS, 128), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((11, R_total, 128), jnp.float32),
        interpret=interpret,
    )(planes, jnp.asarray(ck), jnp.asarray(inner), jnp.asarray(t_hi),
      jnp.asarray(t_lo))

    out = out.reshape(11, R_total * 128)[:, :P]
    xolp = jnp.moveaxis(out[0:2], 0, -1).reshape(*shape, 2)
    priors = jnp.moveaxis(out[2:11], 0, -1).reshape(*shape, 9)
    return xolp, priors
