"""MiDaS/DPT host-side sample transforms (reference manydepth/dpt/
transforms.py:6-231), completing the DPT subsystem's public API.

These are *host* preprocessing utilities (numpy + cv2), used when feeding
arbitrary-size images to DPT/MiDaS models outside the fixed-geometry
training pipeline: aspect-preserving resize with the three bound modes,
mean/std normalization, and network-layout packing.  The TPU trainer never
uses them (it fixes the geometry at trace time and does its resizes on
device — ops/resize.py), so they live here purely for reference-API
completeness.

Deviation from the reference: PrepareForNet keeps HWC (channels-last)
layout — the whole framework, including DPTDepthModel, consumes NHWC (the
TPU-native layout) rather than torch's NCHW.  Everything else (resize
bound/multiple-of arithmetic, nearest-neighbour target resizing, mask
bool round-trip) matches the reference semantics exactly.
"""

from __future__ import annotations

import math

import numpy as np

try:  # cv2 ships in this image; guarded for minimal installs
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _require_cv2():
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("dpt_transforms resizing requires cv2")


def apply_min_size(sample: dict, size,
                   image_interpolation_method=None) -> dict:
    """Grow `sample` (in place) so image/disparity/mask are at least
    `size = (h, w)`, keeping aspect ratio (transforms.py:6-46).  Returns
    the sample (note: the reference's return-shape-tuple on the grow path
    is a latent bug its callers never hit; we always return the sample)."""
    _require_cv2()
    interp = (cv2.INTER_AREA if image_interpolation_method is None
              else image_interpolation_method)
    shape = list(sample["disparity"].shape)
    if shape[0] >= size[0] and shape[1] >= size[1]:
        return sample

    scale = max(size[0] / shape[0], size[1] / shape[1])
    shape[0] = math.ceil(scale * shape[0])
    shape[1] = math.ceil(scale * shape[1])

    sample["image"] = cv2.resize(sample["image"], tuple(shape[::-1]),
                                 interpolation=interp)
    sample["disparity"] = cv2.resize(sample["disparity"],
                                     tuple(shape[::-1]),
                                     interpolation=cv2.INTER_NEAREST)
    sample["mask"] = cv2.resize(sample["mask"].astype(np.float32),
                                tuple(shape[::-1]),
                                interpolation=cv2.INTER_NEAREST)
    sample["mask"] = sample["mask"].astype(bool)
    return sample


class Resize:
    """Resize a sample dict to (width, height) with the reference's
    bound semantics (transforms.py:49-194).

    resize_method:
      "lower_bound": output is at least (width, height)
      "upper_bound": output is at most (width, height)
      "minimal":     scale as little as possible
    keep_aspect_ratio ties the two scale factors per the bound mode;
    ensure_multiple_of rounds (then floors/ceils to respect the bound)."""

    def __init__(self, width, height, resize_target=True,
                 keep_aspect_ratio=False, ensure_multiple_of=1,
                 resize_method="lower_bound",
                 image_interpolation_method=None):
        _require_cv2()
        self._width = width
        self._height = height
        self._resize_target = resize_target
        self._keep_aspect_ratio = keep_aspect_ratio
        self._multiple_of = ensure_multiple_of
        self._resize_method = resize_method
        self._interp = (cv2.INTER_AREA if image_interpolation_method is None
                        else image_interpolation_method)

    def constrain_to_multiple_of(self, x, min_val=0, max_val=None):
        y = int(round(x / self._multiple_of) * self._multiple_of)
        if max_val is not None and y > max_val:
            y = int(math.floor(x / self._multiple_of) * self._multiple_of)
        if y < min_val:
            y = int(math.ceil(x / self._multiple_of) * self._multiple_of)
        return y

    def get_size(self, width, height):
        scale_height = self._height / height
        scale_width = self._width / width

        if self._keep_aspect_ratio:
            if self._resize_method == "lower_bound":
                # the larger scale guarantees both dims reach the bound
                scale_width = scale_height = max(scale_width, scale_height)
            elif self._resize_method == "upper_bound":
                scale_width = scale_height = min(scale_width, scale_height)
            elif self._resize_method == "minimal":
                # whichever scale is closest to identity
                if abs(1 - scale_width) < abs(1 - scale_height):
                    scale_height = scale_width
                else:
                    scale_width = scale_height
            else:
                raise ValueError(
                    f"resize_method {self._resize_method} not implemented")

        if self._resize_method == "lower_bound":
            new_height = self.constrain_to_multiple_of(
                scale_height * height, min_val=self._height)
            new_width = self.constrain_to_multiple_of(
                scale_width * width, min_val=self._width)
        elif self._resize_method == "upper_bound":
            new_height = self.constrain_to_multiple_of(
                scale_height * height, max_val=self._height)
            new_width = self.constrain_to_multiple_of(
                scale_width * width, max_val=self._width)
        elif self._resize_method == "minimal":
            new_height = self.constrain_to_multiple_of(scale_height * height)
            new_width = self.constrain_to_multiple_of(scale_width * width)
        else:
            raise ValueError(
                f"resize_method {self._resize_method} not implemented")

        return (new_width, new_height)

    def __call__(self, sample: dict) -> dict:
        width, height = self.get_size(sample["image"].shape[1],
                                      sample["image"].shape[0])
        sample["image"] = cv2.resize(sample["image"], (width, height),
                                     interpolation=self._interp)
        if self._resize_target:
            for key in ("disparity", "depth"):
                if key in sample:
                    sample[key] = cv2.resize(
                        sample[key], (width, height),
                        interpolation=cv2.INTER_NEAREST)
            if "mask" in sample:
                sample["mask"] = cv2.resize(
                    sample["mask"].astype(np.float32), (width, height),
                    interpolation=cv2.INTER_NEAREST).astype(bool)
        return sample


class NormalizeImage:
    """(image - mean) / std (transforms.py:197-207)."""

    def __init__(self, mean, std):
        self._mean = mean
        self._std = std

    def __call__(self, sample: dict) -> dict:
        sample["image"] = (sample["image"] - self._mean) / self._std
        return sample


class PrepareForNet:
    """Finalize dtypes/contiguity for the network (transforms.py:210-231).

    Keeps HWC layout (framework-wide NHWC; the reference transposes to
    CHW for torch here)."""

    def __call__(self, sample: dict) -> dict:
        sample["image"] = np.ascontiguousarray(
            sample["image"]).astype(np.float32)
        for key in ("mask", "disparity", "depth"):
            if key in sample:
                sample[key] = np.ascontiguousarray(
                    sample[key].astype(np.float32))
        return sample


class Compose:
    """Chain transforms (torchvision.transforms.Compose stand-in; the
    reference composes via torchvision in run_monocular_depth/dpt)."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample: dict) -> dict:
        for t in self.transforms:
            sample = t(sample)
        return sample


def dpt_transform(net_w: int = 384, net_h: int = 384,
                  backbone: str = "vitb_rn50") -> Compose:
    """The stock DPT monocular-depth input transform: lower-bound
    aspect-preserving resize to multiples of 32, mean/std 0.5 handled *in
    the model* (models/dpt.py folds the 0.5/0.5 normalization into the
    graph), PrepareForNet packing."""
    return Compose([
        Resize(net_w, net_h, resize_target=False,
               keep_aspect_ratio=True, ensure_multiple_of=32,
               resize_method="minimal"),
        PrepareForNet(),
    ])
