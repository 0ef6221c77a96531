"""SE(3) utilities: axis-angle <-> 4x4 transforms.

Reference: manydepth/layers.py:74-149 (transformation_from_parameters,
get_translation_matrix, rot_from_axisangle).  Built with stacked closed-form
expressions instead of in-place scatter writes — one fused elementwise graph.
"""

from __future__ import annotations

import jax.numpy as jnp


def rot_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """(B, 1, 3) axis-angle -> (B, 4, 4) rotation (Rodrigues).

    Matches the reference including its angle + 1e-7 regularisation.
    """
    vec = vec.reshape(vec.shape[0], 3)
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # (B, 1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    C = 1.0 - ca
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]

    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC

    zero = jnp.zeros_like(ca)
    one = jnp.ones_like(ca)
    rot = jnp.stack([
        x * xC + ca, xyC - zs,    zxC + ys,    zero,
        xyC + zs,    y * yC + ca, yzC - xs,    zero,
        zxC - ys,    yzC + xs,    z * zC + ca, zero,
        zero,        zero,        zero,        one,
    ], axis=-1).reshape(-1, 4, 4)
    return rot


def get_translation_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """(B, 3)/(B,1,3) translation -> (B, 4, 4) homogeneous transform."""
    t = t.reshape(t.shape[0], 3)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=t.dtype), (t.shape[0], 4, 4))
    return eye.at[:, :3, 3].set(t)


def rotmat_to_rotvec(R: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """(B, 3, 3) rotation matrices -> (B, 3) axis-angle (log map).

    Replaces the reference's roma.rotmat_to_rotvec dependency
    (trainer.py:1276-1277, pose-supervision loss).  Stable for small angles
    via the sinc form; angles near pi fall back to the diagonal formula.
    """
    trace = R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2]
    cos_a = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    angle = jnp.arccos(cos_a)                     # (B,)
    skew = jnp.stack([R[:, 2, 1] - R[:, 1, 2],
                      R[:, 0, 2] - R[:, 2, 0],
                      R[:, 1, 0] - R[:, 0, 1]], axis=-1)  # = 2 sin(a) * axis
    sin_a = jnp.sin(angle)
    # generic branch: axis = skew / (2 sin a); rotvec = axis * angle
    factor = jnp.where(sin_a > eps, angle / (2.0 * sin_a + eps), 0.5)
    generic = skew * factor[:, None]
    # near-pi branch: |axis_i| from the diagonal, signs from the skew part
    diag = jnp.stack([R[:, 0, 0], R[:, 1, 1], R[:, 2, 2]], axis=-1)
    axis_abs = jnp.sqrt(jnp.clip((diag + 1.0) * 0.5, 0.0, 1.0))
    signs = jnp.where(skew >= 0, 1.0, -1.0)
    near_pi = axis_abs * signs * angle[:, None]
    return jnp.where((jnp.pi - angle[:, None]) > 1e-3, generic, near_pi)


def transformation_from_parameters(axisangle: jnp.ndarray,
                                   translation: jnp.ndarray,
                                   invert: bool = False) -> jnp.ndarray:
    """Network (axisangle, translation) -> 4x4 cam-to-cam transform.

    invert=True mirrors the reference: R^T and -t with M = R @ T.
    """
    R = rot_from_axisangle(axisangle)
    t = translation.reshape(translation.shape[0], 3)
    if invert:
        R = jnp.swapaxes(R, 1, 2)
        t = -t
    T = get_translation_matrix(t)
    if invert:
        return R @ T
    return T @ R
