"""Augmentation pipelines (host cv2/numpy, synced image+mask).

Mirrors the reference's two systems:
  * hand-rolled AugmentationPipeline: flip / rotate±15° / scale / brightness /
    contrast with nearest-neighbour mask warping
    (reference src/data/augmentation.py:11-302)
  * the albumentations strong stack used by the flagship training run —
    random-resized-crop, flips, shift-scale-rotate, color jitter/HSV, noise,
    blur, motion blur (reference src/data/advanced_dataset.py:87-120),
    re-implemented directly (albumentations isn't a dependency here); the
    p=0.2 fog/rain weather pair is approximated by a brightness haze overlay.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _warp(image, mask, M, out_wh):
    import cv2
    img = cv2.warpAffine(image, M, out_wh, flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    msk = cv2.warpAffine(mask, M, out_wh, flags=cv2.INTER_NEAREST,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    return img, msk


class AugmentationPipeline:
    """Reference AugmentationPipeline parity (augmentation.py:11-258):
    each op applied with its own probability; masks always nearest."""

    def __init__(self, flip_prob: float = 0.5, rotate_prob: float = 0.3,
                 max_rotate_deg: float = 15.0, scale_prob: float = 0.3,
                 scale_range: Tuple[float, float] = (0.9, 1.1),
                 brightness_prob: float = 0.5,
                 brightness_range: Tuple[float, float] = (0.7, 1.3),
                 contrast_prob: float = 0.3,
                 contrast_range: Tuple[float, float] = (0.8, 1.2),
                 rng: Optional[np.random.Generator] = None):
        self.p = dict(flip=flip_prob, rotate=rotate_prob, scale=scale_prob,
                      brightness=brightness_prob, contrast=contrast_prob)
        self.max_rotate_deg = max_rotate_deg
        self.scale_range = scale_range
        self.brightness_range = brightness_range
        self.contrast_range = contrast_range
        self.rng = rng or np.random.default_rng()

    def __call__(self, image: np.ndarray, mask: np.ndarray):
        import cv2
        r = self.rng
        h, w = mask.shape
        if r.random() < self.p["flip"]:
            image, mask = cv2.flip(image, 1), cv2.flip(mask, 1)
        if r.random() < self.p["flip"]:
            image, mask = cv2.flip(image, 0), cv2.flip(mask, 0)
        if r.random() < self.p["rotate"]:
            ang = r.uniform(-self.max_rotate_deg, self.max_rotate_deg)
            M = cv2.getRotationMatrix2D((w / 2, h / 2), ang, 1.0)
            image, mask = _warp(image, mask, M, (w, h))
        if r.random() < self.p["scale"]:
            s = r.uniform(*self.scale_range)
            M = cv2.getRotationMatrix2D((w / 2, h / 2), 0.0, s)
            image, mask = _warp(image, mask, M, (w, h))
        if r.random() < self.p["brightness"]:
            f = r.uniform(*self.brightness_range)
            image = np.clip(image.astype(np.float32) * f, 0, 255).astype(np.uint8)
        if r.random() < self.p["contrast"]:
            f = r.uniform(*self.contrast_range)
            mean = image.mean()
            image = np.clip((image.astype(np.float32) - mean) * f + mean,
                            0, 255).astype(np.uint8)
        return image, mask


class StrongAugmentationPipeline:
    """The flagship strong stack (reference advanced_dataset.py:87-120 /
    augmentation.py:261-281)."""

    def __init__(self, rng: Optional[np.random.Generator] = None):
        self.rng = rng or np.random.default_rng()

    def __call__(self, image: np.ndarray, mask: np.ndarray):
        import cv2
        r = self.rng
        h, w = mask.shape[:2]

        # geometric: random-resized-crop OR keep (p=0.5 overall)
        if r.random() < 0.5 and r.random() < 0.5:
            scale = r.uniform(0.7, 1.0)
            ch, cw = int(h * scale), int(w * scale)
            y1 = int(r.integers(0, h - ch + 1))
            x1 = int(r.integers(0, w - cw + 1))
            image = image[y1:y1 + ch, x1:x1 + cw]
            mask = mask[y1:y1 + ch, x1:x1 + cw]
            h, w = ch, cw
        if r.random() < 0.5:
            image, mask = cv2.flip(image, 1), cv2.flip(mask, 1)
        if r.random() < 0.5:
            image, mask = cv2.flip(image, 0), cv2.flip(mask, 0)
        if r.random() < 0.5:  # shift-scale-rotate (0.1 / 0.2 / 15deg)
            ang = r.uniform(-15, 15)
            s = 1.0 + r.uniform(-0.2, 0.2)
            M = cv2.getRotationMatrix2D((w / 2, h / 2), ang, s)
            M[0, 2] += r.uniform(-0.1, 0.1) * w
            M[1, 2] += r.uniform(-0.1, 0.1) * h
            image, mask = _warp(image, mask, M, (w, h))

        # color (p=0.6): jitter OR HSV OR brightness/contrast
        if r.random() < 0.6:
            pick = r.integers(0, 3)
            img = image.astype(np.float32)
            if pick == 0:  # color jitter
                img *= 1.0 + r.uniform(-0.3, 0.3)
                mean = img.mean()
                img = (img - mean) * (1.0 + r.uniform(-0.3, 0.3)) + mean
                image = np.clip(img, 0, 255).astype(np.uint8)
                hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV).astype(np.float32)
                hsv[..., 0] = (hsv[..., 0] + r.uniform(-0.1, 0.1) * 180) % 180
                hsv[..., 1] = np.clip(hsv[..., 1] * (1 + r.uniform(-0.3, 0.3)), 0, 255)
                image = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
            elif pick == 1:  # HueSaturationValue (20/30/20)
                hsv = cv2.cvtColor(image, cv2.COLOR_RGB2HSV).astype(np.float32)
                hsv[..., 0] = (hsv[..., 0] + r.uniform(-20, 20)) % 180
                hsv[..., 1] = np.clip(hsv[..., 1] + r.uniform(-30, 30), 0, 255)
                hsv[..., 2] = np.clip(hsv[..., 2] + r.uniform(-20, 20), 0, 255)
                image = cv2.cvtColor(hsv.astype(np.uint8), cv2.COLOR_HSV2RGB)
            else:  # brightness/contrast 0.3
                img *= 1.0 + r.uniform(-0.3, 0.3)
                mean = img.mean()
                img = (img - mean) * (1.0 + r.uniform(-0.3, 0.3)) + mean
                image = np.clip(img, 0, 255).astype(np.uint8)

        # noise/blur (p=0.3)
        if r.random() < 0.3:
            pick = r.integers(0, 3)
            if pick == 0:  # gauss noise var 10-50
                sigma = np.sqrt(r.uniform(10, 50))
                noise = r.normal(0, sigma, image.shape)
                image = np.clip(image + noise, 0, 255).astype(np.uint8)
            elif pick == 1:  # gaussian blur 3-5
                k = int(r.choice([3, 5]))
                image = cv2.GaussianBlur(image, (k, k), 0)
            else:  # motion blur 3-5
                k = int(r.choice([3, 5]))
                kern = np.zeros((k, k), np.float32)
                kern[k // 2, :] = 1.0 / k
                image = cv2.filter2D(image, -1, kern)

        # weather haze approximation (p=0.2)
        if r.random() < 0.2:
            fog = r.uniform(0.1, 0.3)
            image = np.clip(image * (1 - fog) + 255 * fog, 0, 255).astype(np.uint8)
        return image, mask


class WeakAugmentationPipeline(AugmentationPipeline):
    """Low-probability variant (reference augmentation.py:284-302)."""

    def __init__(self, rng=None):
        super().__init__(flip_prob=0.3, rotate_prob=0.1, max_rotate_deg=5.0,
                         scale_prob=0.1, scale_range=(0.95, 1.05),
                         brightness_prob=0.3, brightness_range=(0.9, 1.1),
                         contrast_prob=0.1, contrast_range=(0.95, 1.05), rng=rng)
