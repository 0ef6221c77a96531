"""On-device color augmentation (torchvision ColorJitter equivalent).

The reference jitters on the host with torchvision ColorJitter
(brightness/contrast/saturation (0.8, 1.2), hue (-0.1, 0.1)) applied to 50%
of training samples (indoor_dataset.py:96-107, 301, 402-407).  Here the same
photometric family runs inside the jitted train step on the VPU, driven by a
PRNG key — zero host work, reproducible under checkpoint/restore.

Deviation (documented): torchvision applies the four ops in a random order
per sample; we use the fixed order brightness -> contrast -> saturation ->
hue.  The factor distributions and per-op math (ITU-R 601-2 luma for
grayscale, PIL-style blends, HSV hue rotation) match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_LUMA = (0.299, 0.587, 0.114)


def _grayscale(img):
    return (img[..., 0:1] * _LUMA[0] + img[..., 1:2] * _LUMA[1]
            + img[..., 2:3] * _LUMA[2])


def _rgb_to_hsv(img):
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    maxc = jnp.max(img, axis=-1)
    minc = jnp.min(img, axis=-1)
    v = maxc
    spread = maxc - minc
    s = jnp.where(maxc > 0, spread / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(spread, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(maxc == r, bc - gc,
                  jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(spread == 0.0, 0.0, h)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, q, p, p, q])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, q, v])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(key: jax.Array, img: jnp.ndarray,
                 brightness=(0.8, 1.2), contrast=(0.8, 1.2),
                 saturation=(0.8, 1.2), hue=(-0.1, 0.1),
                 apply_prob: float = 0.5) -> jnp.ndarray:
    """Jitter a batch (B, H, W, 3) in [0, 1]; per-sample factors, and each
    sample is jittered with probability apply_prob (reference do_color_aug,
    indoor_dataset.py:301)."""
    b = img.shape[0]
    kb, kc, ks, kh, kp = jax.random.split(key, 5)

    def u(k, lo, hi):
        return jax.random.uniform(k, (b, 1, 1, 1), minval=lo, maxval=hi)

    fb = u(kb, *brightness)
    fc = u(kc, *contrast)
    fs = u(ks, *saturation)
    fh = u(kh, *hue)

    out = jnp.clip(img * fb, 0.0, 1.0)
    mean_gray = jnp.mean(_grayscale(out), axis=(1, 2, 3), keepdims=True)
    out = jnp.clip(out * fc + mean_gray * (1.0 - fc), 0.0, 1.0)
    gray = _grayscale(out)
    out = jnp.clip(out * fs + gray * (1.0 - fs), 0.0, 1.0)
    h, s, v = _rgb_to_hsv(out)
    out = _hsv_to_rgb((h + fh[..., 0]) % 1.0, s, v)
    out = jnp.clip(out, 0.0, 1.0)

    apply = jax.random.uniform(kp, (b, 1, 1, 1)) < apply_prob
    return jnp.where(apply, out, img)


def random_horizontal_flip(key: jax.Array, batch: dict,
                           prob: float = 0.5) -> dict:
    """Device-side per-sample horizontal flip (the KITTI-style augmentation;
    MonoDataset random flip, mono_dataset.py — the HAMMER path hardwires
    do_flip=False, indoor_dataset.py:302).

    Flips the width axis of every (B, H, W, C) image-like entry.  Note:
    flipping polarization captures mirrors AoLP without negating it, exactly
    as a naive image flip would in the reference — only meaningful for
    non-polarimetric datasets.
    """
    flip = None
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim in (4, 5):
            if flip is None:
                flip = jax.random.uniform(key, (v.shape[0], 1, 1, 1)) < prob
            if v.ndim == 4:                     # (B, H, W, C)
                out[k] = jnp.where(flip, v[:, :, ::-1], v)
            else:                               # (B, F, H, W, C) frame stacks
                out[k] = jnp.where(flip[:, None], v[:, :, :, ::-1], v)
        else:
            out[k] = v
    return out
