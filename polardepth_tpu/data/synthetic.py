"""Synthetic HAMMER-like scenes with physically consistent polarization.

The real HAMMER dataset is not distributable with the framework, so tests,
overfit smoke runs and benchmarks use generated scenes in which every
quantity is derived from a common ground-truth geometry:

  depth  ->  normals (pinhole unprojection + analytic surfaces)
         ->  zenith angle theta vs the viewing ray -> DoLP via the diffuse
             Fresnel curve; azimuth -> AoLP
         ->  four polarizer captures I(a) = Iun * (1 + rho * cos(2a - 2phi))
  rgb    =  Lambertian shading of the same geometry
  masks  =  material ids on the objects (HAMMER id scheme 20..200)

Because the forward model uses the same Fresnel curves the network's priors
invert, the XOLP/normals encoders receive real signal — an overfit run must
drive the supervised losses toward zero, which is the de-facto smoke test the
reference uses (--overfit, options.py:205-212).

`write_synthetic_scene` dumps the exact on-disk layout the HAMMER loader
scans (<scene>/polarization/{rgb,pol00,pol01,pol10,pol11,_instance,_gt,
_pose}/%06d.png|txt + intrinsics.txt), so the real loader is testable
without the real dataset.
"""

from __future__ import annotations

import os

import numpy as np

from polardepth_tpu.ops.fresnel import _diffuse_curve

MATERIAL_IDS = {
    "box": 20, "bottle": 40, "can": 60, "cup": 80, "remote": 100,
    "teapot": 120, "cutlery": 140, "glass": 160, "table": 180, "wall": 200,
}


class SyntheticHammer:
    """In-memory generator of HAMMER-schema samples.

    Each sample dict (numpy, NHWC, host dtypes ready for device upload):
      color     (H, W, 3) uint8        rgb render
      pol       (H, W, 4) uint8        captures at [0, 45, 90, 135] deg
      depth     (H, W, 1) float32      supervision depth (m)
      depth_gt  (H, W, 1) float32      ground-truth depth (m)
      mask      (H, W, 1) int32        instance/material ids
      K, inv_K  (4, 4)    float32      scale-0 intrinsics
      pose      (4, 4)    float32      cam-to-world (for pose-sup tests)
    """

    def __init__(self, height: int = 320, width: int = 480, n: float = 1.5,
                 num_objects: int = 4, seed: int = 0):
        self.height = height
        self.width = width
        self.n = n
        self.num_objects = num_objects
        self.seed = seed
        rho_d, theta_d = _diffuse_curve(n)
        self._rho_of_theta = (theta_d, rho_d)
        # Normalized intrinsics follow the HAMMER convention
        # (indoor_dataset.py:262-275): fx=0.58W, fy=0.60H, c=(0.5W, 0.5H).
        K = np.eye(4, dtype=np.float32)
        K[0, 0] = 0.58 * width
        K[1, 1] = 0.60 * height
        K[0, 2] = 0.5 * width
        K[1, 2] = 0.5 * height
        self.K = K
        self.inv_K = np.linalg.pinv(K).astype(np.float32)

    # -- geometry -------------------------------------------------------------

    def _scene_depth_normals_mask(self, rng):
        h, w = self.height, self.width
        K = self.K
        u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                           np.arange(h, dtype=np.float64))
        # Ray directions through each pixel (unit z).
        rx = (u - K[0, 2]) / K[0, 0]
        ry = (v - K[1, 2]) / K[1, 1]

        # Background: a tilted plane  n . p = d  with p = depth * (rx, ry, 1).
        tilt = rng.uniform(-0.25, 0.25, size=2)
        n_bg = np.array([tilt[0], tilt[1], 1.0])
        n_bg /= np.linalg.norm(n_bg)
        d_bg = rng.uniform(1.4, 1.9)
        denom = n_bg[0] * rx + n_bg[1] * ry + n_bg[2]
        depth = d_bg / np.maximum(denom, 1e-3)
        normals = np.broadcast_to(n_bg, (h, w, 3)).copy()
        mask = np.full((h, w), MATERIAL_IDS["table"], np.int32)

        # Spheres: ray-sphere intersection gives exact depth + normals.
        ids = rng.choice(list(MATERIAL_IDS.values())[:8], self.num_objects,
                         replace=False)
        for mid in ids:
            c = np.array([rng.uniform(-0.35, 0.35), rng.uniform(-0.25, 0.25),
                          rng.uniform(0.7, 1.2)])
            r = rng.uniform(0.08, 0.18)
            # |t*d - c|^2 = r^2 with d = (rx, ry, 1)/|.|
            dd = np.stack([rx, ry, np.ones_like(rx)], axis=-1)
            dn = dd / np.linalg.norm(dd, axis=-1, keepdims=True)
            b = dn @ c
            disc = b * b - (c @ c - r * r)
            hit = disc > 0
            t = b - np.sqrt(np.maximum(disc, 0.0))
            z = t * dn[..., 2]
            closer = hit & (z > 0.05) & (z < depth)
            p = dn * t[..., None]
            n_sph = (p - c) / r
            depth = np.where(closer, z, depth)
            normals = np.where(closer[..., None], n_sph, normals)
            mask = np.where(closer, mid, mask)
        return depth, normals, mask

    def _polarize(self, depth, normals, rng):
        """Fresnel forward model -> 4 uint8 captures + shading."""
        h, w = self.height, self.width
        K = self.K
        u, v = np.meshgrid(np.arange(w, dtype=np.float64),
                           np.arange(h, dtype=np.float64))
        view = np.stack([(u - K[0, 2]) / K[0, 0],
                         (v - K[1, 2]) / K[1, 1],
                         np.ones_like(u)], axis=-1)
        view /= np.linalg.norm(view, axis=-1, keepdims=True)
        # zenith angle between surface normal and the (towards-camera) ray
        cos_t = np.clip(np.abs((normals * -view).sum(-1)), 0.0, 1.0)
        theta = np.arccos(cos_t)
        theta_lut, rho_lut = self._rho_of_theta
        rho = np.interp(theta, theta_lut, rho_lut)
        phi = np.arctan2(normals[..., 1], normals[..., 0])
        # AoLP convention folds into (-pi/2, pi/2]
        phi = np.arctan(np.tan(phi + 1e-9))

        light = np.array([0.3, -0.5, -0.8])
        light /= np.linalg.norm(light)
        shade = np.clip((normals * -light).sum(-1), 0.15, 1.0)
        iun = 40.0 + 170.0 * shade

        angles = np.deg2rad([0.0, 45.0, 90.0, 135.0])
        pol = np.stack([iun * (1.0 + rho * np.cos(2 * a - 2 * phi)) / 1.8
                        for a in angles], axis=-1)
        pol = np.clip(pol + rng.normal(0, 1.0, pol.shape), 0, 255)

        albedo = np.stack([0.9 * shade, 0.75 * shade + 0.05, 0.6 * shade + 0.1],
                          axis=-1)
        rgb = np.clip(albedo * 255.0, 0, 255)
        return pol.astype(np.uint8), rgb.astype(np.uint8)

    def sample(self, index: int) -> dict:
        rng = np.random.default_rng(self.seed * 100003 + index)
        depth, normals, mask = self._scene_depth_normals_mask(rng)
        pol, rgb = self._polarize(depth, normals, rng)
        d32 = depth.astype(np.float32)[..., None]
        pose = np.eye(4, dtype=np.float32)
        pose[:3, 3] = rng.uniform(-0.05, 0.05, 3)
        return {
            "color": rgb,
            "pol": pol,
            "depth": d32,
            "depth_gt": d32.copy(),
            "mask": mask[..., None].astype(np.int32),
            "K": self.K,
            "inv_K": self.inv_K,
            "pose": pose,
        }

    def batch(self, batch_size: int, start: int = 0) -> dict:
        samples = [self.sample(start + i) for i in range(batch_size)]
        return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def write_synthetic_scene(root: str, scene: str, num_frames: int = 12,
                          height: int = 320, width: int = 480,
                          seed: int = 0) -> str:
    """Dump a synthetic scene in the on-disk HAMMER layout so HammerIndex /
    HammerLoader can be exercised without the real dataset."""
    import cv2

    gen = SyntheticHammer(height, width, seed=seed)
    base = os.path.join(root, scene, "polarization")
    subdirs = ["rgb", "pol00", "pol01", "pol10", "pol11", "_instance",
               "_gt", "_pose"]
    for d in subdirs:
        os.makedirs(os.path.join(base, d), exist_ok=True)
    # intrinsics.txt holds the *normalized* 3x3 (indoor_dataset.py:262-275)
    Kn = gen.K.copy()
    Kn[0, :] /= width
    Kn[1, :] /= height
    with open(os.path.join(base, "intrinsics.txt"), "w") as f:
        f.write(" ".join(str(x) for x in Kn[:3, :3].reshape(-1)))

    for i in range(num_frames):
        s = gen.sample(i)
        name = f"{i:06d}.png"
        cv2.imwrite(os.path.join(base, "rgb", name),
                    cv2.cvtColor(s["color"], cv2.COLOR_RGB2BGR))
        # quad-mosaic convention: pol00=0deg, pol01=45, pol10=90, pol11=135
        for d, ch in (("pol00", 0), ("pol01", 1), ("pol10", 2), ("pol11", 3)):
            cv2.imwrite(os.path.join(base, d, name), s["pol"][..., ch])
        cv2.imwrite(os.path.join(base, "_instance", name),
                    s["mask"][..., 0].astype(np.uint8))
        depth_mm = (s["depth_gt"][..., 0] * 1000.0).astype(np.uint16)
        cv2.imwrite(os.path.join(base, "_gt", name), depth_mm)
        with open(os.path.join(base, "_pose", f"{i:06d}.txt"), "w") as f:
            f.write(" ".join(str(x) for x in s["pose"].reshape(-1)))
    return base
