"""Fused Pallas kernel: 4 polarizer captures -> XOLP + 9-channel Fresnel
normal priors, one VMEM-resident pass.

STATUS (round 3, 2026-08-17): the Mosaic path is now HEALTHY on the
current toolchain — compiles in seconds and matches interpreter mode
exactly after two fixes on our side: (a) the atan2 octant unfold uses
signbit/copysign so IEEE signed zeros take the same branch as
jnp.arctan2, and (b) comparisons against the XLA path are angle-aware
(AoLP is physically mod-pi where the Stokes c component crosses zero; the
two paths' different summation orders legitimately land on different
branch cuts there).  The round-1 "Mosaic numerically wrong / 245 s
compiles" verdict was a toolchain-era artifact plus the -0.0 edge; see
scripts/probe_mosaic.py for the staged evidence.  In fact the kernel is
MORE accurate than the pre-round-3 XLA path was (its pinv contraction ran
default-precision bf16 on TPU; fixed in ops/xolp.py with HIGHEST).
Production default remains Config.use_pallas=False until the kernel also
wins on speed at production shapes (tracked in PERF.md).

This is the framework's hottest preprocessing chain.  The pure-jnp
implementation materialises the (pixels x knots) compare matrix in HBM
(~0.4 GB per 32k-pixel chunk, ~25 GB of HBM traffic per 512px batch-8 step
— measured 15-20 ms, HBM-bandwidth-bound).  Here the compare tile lives and
dies in VMEM; HBM traffic collapses to reading pol (P x 4) and writing the
11 output channels, and the knot contraction runs on the MXU.

Per 512-pixel tile:
  1. Stokes fit: abc = pol . pinv(A)^T            (12 FMAs, exact vs
     np.linalg.lstsq — see ops/xolp.py)
  2. rho = |(b, c)| / a (inf/NaN -> 0),  phi = atan2(c, b) / 2
  3. segment select: g = [rho >= knot_k]  (TILE x K, VMEM only)
     params = g @ V + base  -> (x0, f0, slope) for all 3 Fresnel curves
     (see ops/fresnel.py FusedPiecewiseInterp for the telescoping trick and
     the exact right-tail override)
  4. theta_{d,s1,s2} = f0 + (rho - x0) * slope
  5. trig: normals blocks N_diff(phi), N_spec1/2(phi + pi/2), using
     cos(phi+pi/2) = -sin(phi) analytically.

All small per-curve constants enter the kernel as Python float literals
(Pallas kernels cannot close over array constants); only the knot vector and
the V matrix are real VMEM operands.

Output layout (P, 16-padded): [rho, phi, N_diff(3), N_spec1(3), N_spec2(3),
pad(5)].
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from polardepth_tpu.ops.xolp import _PINV
from polardepth_tpu.ops.fresnel import FusedPiecewiseInterp

TILE = 512
OUT_CH = 16  # 11 used, lane-padded

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
    """Host constants: padded knots (Kp,), V (Kp, 16) with columns
    [x0_d, x0_s1, x0_s2, f0_d, f0_s1, f0_s2, sl_d, sl_s1, sl_s2, 0...],
    base (9 floats) and exact last-segment params (3 curves x 3 floats)."""
    fi = FusedPiecewiseInterp(n, prune_tol=prune_tol)
    K = fi._knots.shape[0]
    Kp = ((K + 127) // 128) * 128
    knots = np.full((Kp,), np.float32(3.0e38))
    knots[:K] = fi._knots
    V = np.zeros((Kp, OUT_CH))
    base = np.zeros(9)
    for ci in range(3):
        V[:K, 0 + ci] = fi._V[:, 3 * ci + 0]
        V[:K, 3 + ci] = fi._V[:, 3 * ci + 1]
        V[:K, 6 + ci] = fi._V[:, 3 * ci + 2]
        base[0 + ci] = fi._base[3 * ci + 0]
        base[3 + ci] = fi._base[3 * ci + 1]
        base[6 + ci] = fi._base[3 * ci + 2]
    # Split V into exactly-bf16-representable hi + lo parts: the MXU's
    # default bf16 multiply is then *exact* for both passes (the lhs is a
    # 0/1 matrix), recovering f32 precision from two default-precision dots
    # without the HIGHEST-precision emulation path.
    import ml_dtypes
    V32 = V.astype(np.float32)
    V_hi = V32.astype(ml_dtypes.bfloat16).astype(np.float32)
    V_lo = (V32 - V_hi).astype(np.float32)
    return (knots.astype(np.float32), V_hi, V_lo,
            tuple(np.float32(v) for v in base),
            tuple(np.float32(v) for v in fi._last_knot),
            tuple(tuple(np.float32(v) for v in row) for row in fi._last_seg))


def _make_kernel(base, last_knot, last_seg):
    w = [[np.float32(v) for v in row] for row in _PINV]

    def kernel(pol_ref, knots_ref, v_hi_ref, v_lo_ref, out_ref):
        pol = pol_ref[:].astype(jnp.float32)  # (TILE, 4)
        p = [pol[:, i:i + 1] for i in range(4)]
        a = p[0] * w[0][0] + p[1] * w[0][1] + p[2] * w[0][2] + p[3] * w[0][3]
        b = p[0] * w[1][0] + p[1] * w[1][1] + p[2] * w[1][2] + p[3] * w[1][3]
        c = p[0] * w[2][0] + p[1] * w[2][1] + p[2] * w[2][2] + p[3] * w[2][3]
        amp = jnp.sqrt(b * b + c * c)
        rho = amp / a
        rho = jnp.where(jnp.isfinite(rho), rho, 0.0)       # (TILE, 1)
        phi = 0.5 * _atan2(c, b)                           # (TILE, 1)

        g = (rho >= knots_ref[:].reshape(1, -1)).astype(jnp.float32)
        # Two default-precision dots against the exact hi/lo bf16 split of V
        # (see _tables): both multiplies are exact on the MXU, so the sum
        # recovers f32-accurate segment parameters without HIGHEST-precision
        # emulation.
        params = (jnp.dot(g, v_hi_ref[:], preferred_element_type=jnp.float32)
                  + jnp.dot(g, v_lo_ref[:],
                            preferred_element_type=jnp.float32))

        thetas = []
        for ci in range(3):
            x0 = params[:, 0 + ci:1 + ci] + base[0 + ci]
            f0 = params[:, 3 + ci:4 + ci] + base[3 + ci]
            sl = params[:, 6 + ci:7 + ci] + base[6 + ci]
            th = f0 + (rho - x0) * sl
            x0l, f0l, sll = last_seg[ci]
            th_tail = f0l + (rho - x0l) * sll
            thetas.append(jnp.where(rho >= last_knot[ci], th_tail, th))

        sin_p = jnp.sin(phi)
        cos_p = jnp.cos(phi)
        cols = [rho, phi]
        for ci, az_cos, az_sin in ((0, cos_p, sin_p),
                                   (1, -sin_p, cos_p),
                                   (2, -sin_p, cos_p)):
            st = jnp.sin(thetas[ci])
            ct = jnp.cos(thetas[ci])
            cols += [az_cos * st, az_sin * st, ct]
        cols.append(jnp.zeros((pol.shape[0], OUT_CH - 11), jnp.float32))
        out_ref[:] = jnp.concatenate(cols, axis=1)

    return kernel


def fused_polar_preprocess(pol: jnp.ndarray, n: float = 1.5,
                           prune_tol: float | None = 1e-5,
                           interpret: bool = False):
    """pol (..., 4) [0..255-scale grays at 0/45/90/135 deg] ->
    (xolp (..., 2), priors (..., 9)), all float32.

    prune_tol: adaptive knot-pruning tolerance in radians (None = the full
    1000-point reference grids; 1e-5 keeps ~1/3 of the knots and stays below
    the float32 evaluation noise of the LUT itself).
    """
    shape = pol.shape[:-1]
    flat = pol.reshape(-1, 4).astype(jnp.float32)
    P = flat.shape[0]
    pad = (-P) % TILE
    if pad:
        flat = jnp.concatenate(
            [flat, jnp.ones((pad, 4), jnp.float32)], axis=0)
    Pp = flat.shape[0]

    knots, V_hi, V_lo, base, last_knot, last_seg = _tables(float(n), prune_tol)
    kernel = _make_kernel(base, last_knot, last_seg)

    out = pl.pallas_call(
        kernel,
        grid=(Pp // TILE,),
        in_specs=[
            pl.BlockSpec((TILE, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((knots.shape[0],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((knots.shape[0], OUT_CH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((knots.shape[0], OUT_CH), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, OUT_CH), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Pp, OUT_CH), jnp.float32),
        interpret=interpret,
    )(flat, jnp.asarray(knots), jnp.asarray(V_hi), jnp.asarray(V_lo))

    out = out[:P]
    xolp = out[:, 0:2].reshape(*shape, 2)
    priors = out[:, 2:11].reshape(*shape, 9)
    return xolp, priors
