"""Traditional augmentation pipeline (host-side, cv2/numpy).

Re-implements the reference's Albumentations 2.x pipeline
(scripts/augmentation/traditional_augment.py:47-64) without the
albumentations dependency (not in this image): the same ops, probabilities
and parameter ranges, applied jointly to an image and its N instance masks
(geometric ops use nearest-neighbor for masks, exactly like
``A.Compose(additional_targets={mask_i: 'mask'})`` in the reference
:139-150).

Ops (probability, params — reference lines cited):
  HorizontalFlip .5 | VerticalFlip .3 | Rotate ±15 .5 |
  ShiftScaleRotate (shift .0625, scale .1, rot 15) .5 |
  RandomBrightnessContrast (.2, .2) .5 | HueSaturationValue (20,30,20) .3 |
  GaussNoise std 0.02-0.10 .3 | GaussianBlur k 3-5 .3
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _affine(img: np.ndarray, masks: List[np.ndarray], mat: np.ndarray
            ) -> Tuple[np.ndarray, List[np.ndarray]]:
    h, w = img.shape[:2]
    img2 = cv2.warpAffine(img, mat, (w, h), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    masks2 = [cv2.warpAffine(m, mat, (w, h), flags=cv2.INTER_NEAREST,
                             borderMode=cv2.BORDER_CONSTANT, borderValue=0)
              for m in masks]
    return img2, masks2


class TraditionalAugmenter:
    """Joint image+masks augmentation, seeded via numpy Generator."""

    def __init__(self,
                 p_hflip: float = 0.5, p_vflip: float = 0.3,
                 p_rotate: float = 0.5, rotate_limit: float = 15.0,
                 p_ssr: float = 0.5, shift_limit: float = 0.0625,
                 scale_limit: float = 0.1, ssr_rotate_limit: float = 15.0,
                 p_bc: float = 0.5, brightness_limit: float = 0.2,
                 contrast_limit: float = 0.2,
                 p_hsv: float = 0.3, hue_shift: float = 20.0,
                 sat_shift: float = 30.0, val_shift: float = 20.0,
                 p_noise: float = 0.3,
                 noise_std: Tuple[float, float] = (0.02, 0.10),
                 p_blur: float = 0.3, blur_limit: Tuple[int, int] = (3, 5)):
        if cv2 is None:
            raise ImportError("cv2 required for TraditionalAugmenter")
        self.p = dict(hflip=p_hflip, vflip=p_vflip, rotate=p_rotate,
                      ssr=p_ssr, bc=p_bc, hsv=p_hsv, noise=p_noise,
                      blur=p_blur)
        self.rotate_limit = rotate_limit
        self.shift_limit = shift_limit
        self.scale_limit = scale_limit
        self.ssr_rotate_limit = ssr_rotate_limit
        self.brightness_limit = brightness_limit
        self.contrast_limit = contrast_limit
        self.hue_shift = hue_shift
        self.sat_shift = sat_shift
        self.val_shift = val_shift
        self.noise_std = noise_std
        self.blur_limit = blur_limit

    def __call__(self, image: np.ndarray, masks: Sequence[np.ndarray],
                 rng: np.random.Generator
                 ) -> Tuple[np.ndarray, List[np.ndarray]]:
        img = image.copy()
        msks = [np.ascontiguousarray(m, dtype=np.uint8) for m in masks]
        h, w = img.shape[:2]

        # ---------------- geometric (joint)
        if rng.random() < self.p["hflip"]:
            img = img[:, ::-1].copy()
            msks = [m[:, ::-1].copy() for m in msks]
        if rng.random() < self.p["vflip"]:
            img = img[::-1].copy()
            msks = [m[::-1].copy() for m in msks]
        if rng.random() < self.p["rotate"]:
            ang = rng.uniform(-self.rotate_limit, self.rotate_limit)
            mat = cv2.getRotationMatrix2D((w / 2, h / 2), ang, 1.0)
            img, msks = _affine(img, msks, mat)
        if rng.random() < self.p["ssr"]:
            ang = rng.uniform(-self.ssr_rotate_limit, self.ssr_rotate_limit)
            scale = 1.0 + rng.uniform(-self.scale_limit, self.scale_limit)
            dx = rng.uniform(-self.shift_limit, self.shift_limit) * w
            dy = rng.uniform(-self.shift_limit, self.shift_limit) * h
            mat = cv2.getRotationMatrix2D((w / 2, h / 2), ang, scale)
            mat[0, 2] += dx
            mat[1, 2] += dy
            img, msks = _affine(img, msks, mat)

        # ---------------- photometric (image only)
        if rng.random() < self.p["bc"]:
            alpha = 1.0 + rng.uniform(-self.contrast_limit, self.contrast_limit)
            beta = rng.uniform(-self.brightness_limit,
                               self.brightness_limit) * 255.0
            img = np.clip(img.astype(np.float32) * alpha + beta,
                          0, 255).astype(np.uint8)
        if rng.random() < self.p["hsv"]:
            hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV).astype(np.int32)
            hsv[..., 0] = (hsv[..., 0]
                           + int(rng.uniform(-self.hue_shift, self.hue_shift))
                           ) % 180
            hsv[..., 1] = np.clip(
                hsv[..., 1] + int(rng.uniform(-self.sat_shift, self.sat_shift)),
                0, 255)
            hsv[..., 2] = np.clip(
                hsv[..., 2] + int(rng.uniform(-self.val_shift, self.val_shift)),
                0, 255)
            img = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
        if rng.random() < self.p["noise"]:
            std = rng.uniform(*self.noise_std) * 255.0
            noise = rng.normal(0.0, std, img.shape).astype(np.float32)
            img = np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        if rng.random() < self.p["blur"]:
            k = int(rng.integers(self.blur_limit[0] // 2,
                                 self.blur_limit[1] // 2 + 1)) * 2 + 1
            img = cv2.GaussianBlur(img, (k, k), 0)
        return img, msks
