#!/usr/bin/env python
"""Offline physics-prior PNG writer — the framework's analog of the
reference's ppp_code/physical_normals_channels.py:15-163 (the sibling
"Polarimetric Pose Prediction" project's preprocessing script).

Layout mirrors the reference:
  <main_path>/images/image<N>_{0,45,90,135}.png   grayscale pol captures
  <main_path>/masks/mask<N>.png                   object mask (0 = outside)
  <main_path>/normals/{diffuse<N>,specular<N>_1,specular<N>_2}.png  written

Physics: masked Stokes parameters (s0=I0+I90, s1=I0-I90, s2=I45-I135) ->
DoLP/AoLP -> Fresnel rho(theta) inversion (diffuse + two specular
branches, n=1.5) -> unit normals, written clipped to [0,1] exactly as the
reference's matplotlib imsave(vmin=0, vmax=1) does.  The per-pixel math
runs through the framework's jitted ops (ops/xolp.py closed-form Stokes
fit == the reference's lstsq; ops/fresnel.py LUT inversion == scipy
interp1d with extrapolation, parity-tested), so one jit call processes a
whole image instead of the reference's per-pixel numpy/scipy loops.

  python scripts/physical_normals.py --main_path <dir> [--n 1.5]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def compute_normal_pngs(pol: np.ndarray, mask: np.ndarray, n: float = 1.5):
    """(H, W, 4) pol grays at 0/45/90/135 deg + bool mask ->
    (diffuse, spec1, spec2) float arrays in [0, 1], masked to 0 outside."""
    import jax.numpy as jnp
    from polardepth_tpu.ops.xolp import xolp_from_pol
    from polardepth_tpu.ops.fresnel import normal_priors_from_xolp

    pol = pol.astype(np.float32) * mask[..., None]
    xolp = xolp_from_pol(jnp.asarray(pol[None]))
    priors = np.asarray(normal_priors_from_xolp(xolp, n))[0]
    m = mask[..., None].astype(np.float32)
    out = []
    for c in range(3):
        # imsave(vmin=0, vmax=1) semantics: clip, zero outside the mask
        out.append(np.clip(priors[..., 3 * c:3 * c + 3], 0.0, 1.0) * m)
    return tuple(out)


def process_image(main_path: str, image_no: int, n: float = 1.5) -> None:
    import cv2
    imgs = []
    for ang in (0, 45, 90, 135):
        p = os.path.join(main_path, "images", f"image{image_no}_{ang}.png")
        imgs.append(cv2.imread(p, cv2.IMREAD_GRAYSCALE))
    mask = cv2.imread(os.path.join(main_path, "masks",
                                   f"mask{image_no}.png"),
                      cv2.IMREAD_GRAYSCALE).astype(bool)
    pol = np.stack(imgs, axis=-1)
    diff, s1, s2 = compute_normal_pngs(pol, mask, n)
    out_dir = os.path.join(main_path, "normals")
    os.makedirs(out_dir, exist_ok=True)
    for name, arr in ((f"diffuse{image_no}.png", diff),
                      (f"specular{image_no}_1.png", s1),
                      (f"specular{image_no}_2.png", s2)):
        bgr = (arr[..., ::-1] * 255.0).round().astype(np.uint8)
        cv2.imwrite(os.path.join(out_dir, name), bgr)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--main_path", required=True)
    p.add_argument("--n", type=float, default=1.5)
    a = p.parse_args()
    indices = []
    for f in os.listdir(os.path.join(a.main_path, "masks")):
        m = re.fullmatch(r"mask(\d+)\.png", f)
        if m:
            indices.append(int(m.group(1)))
    for i in sorted(indices):
        process_image(a.main_path, i, a.n)
        print(f"image {i}: normals written")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
