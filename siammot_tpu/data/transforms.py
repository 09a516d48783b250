"""Host-side image transforms for inference.

Mirrors the reference's eval-time pipeline (maskrcnn Resize semantics +
Normalize, ``adapters/augmentation/build_augmentation.py:52-66``): resize
the short side to MIN_SIZE_TEST unless the long side would exceed
MAX_SIZE_TEST, then ``x/255`` normalize by PIXEL_MEAN/STD.  Decode and
resize stay on CPU (cv2); normalization is cheap enough host-side and
keeps the device transfer at uint8 size when requested.
"""

from __future__ import annotations

import cv2
import numpy as np


def resize_dims(w: int, h: int, min_size: int, max_size: int):
    """maskrcnn Resize.get_size: returns (new_w, new_h)."""
    mn, mx = min(w, h), max(w, h)
    size = min_size
    if mx / mn * size > max_size:
        size = int(round(max_size * mn / mx))
    if mn == size:
        return w, h
    if w < h:
        return size, int(size * h / w)
    return int(size * w / h), size


def pad_to_divisible(x: np.ndarray, divisor: int = 32) -> np.ndarray:
    h, w = x.shape[:2]
    ph = -(-h // divisor) * divisor - h
    pw = -(-w // divisor) * divisor - w
    if ph or pw:
        x = np.pad(x, ((0, ph), (0, pw), (0, 0)))
    return x


class EvalTransform:
    """frame (HWC uint8/float RGB) -> normalized padded [1, H', W', 3] f32
    plus the resized (w, h) before padding."""

    def __init__(self, cfg):
        self.min_size = cfg.INPUT.MIN_SIZE_TEST
        self.max_size = cfg.INPUT.MAX_SIZE_TEST
        self.mean = np.asarray(cfg.INPUT.PIXEL_MEAN, np.float32)
        self.std = np.asarray(cfg.INPUT.PIXEL_STD, np.float32)
        self.to_bgr255 = cfg.INPUT.TO_BGR255
        self.divisor = cfg.DATALOADER.SIZE_DIVISIBILITY or 32
        # ship uint8, normalize on device (models/siammot.normalize_images
        # re-zeroes the pad past image_size) — 4x less transfer
        self.device_normalize = bool(getattr(cfg.TPU, "DEVICE_NORMALIZE",
                                             False))

    def input_size(self, w: int, h: int):
        return resize_dims(w, h, self.min_size, self.max_size)

    def __call__(self, frame: np.ndarray):
        h, w = frame.shape[:2]
        nw, nh = self.input_size(w, h)
        if (nw, nh) != (w, h):
            frame = cv2.resize(frame, (nw, nh), interpolation=cv2.INTER_LINEAR)
        if self.device_normalize and frame.dtype == np.uint8:
            x = pad_to_divisible(np.ascontiguousarray(frame), self.divisor)
            return x[None], (nw, nh)
        x = frame.astype(np.float32)
        if self.to_bgr255:
            x = x[..., ::-1]
        else:
            x = x / 255.0
        x = (x - self.mean) / self.std
        x = pad_to_divisible(x, self.divisor)
        return x[None], (nw, nh)
