"""Clip-consistent training augmentation.

Host-side (numpy/cv2) rebuild of the reference pipeline
(``/root/reference/siammot/data/adapters/augmentation/``):

  ColorJitter (ONE random frame of the pair) -> MotionBlur (one frame,
  with prob) -> JPEG compression (one frame) -> SiamVideoMotionAugment
  (random crop-resize of ONE frame = synthetic inter-frame motion for
  image datasets, amodal-aware) -> multi-scale resize (same new size for
  both frames, floored to SIZE_DIVISIBILITY) -> clip-consistent HFlip ->
  normalize (x/255, PIXEL_MEAN/STD).

The reference leans on torchvision/imgaug for the photometric ops; the
rebuild keeps their *semantics* (same parameter ranges and application
order) with cv2/numpy so no GPU-era deps are needed.  Every transform is
``(frames, targets, rng) -> (frames, targets)`` over uint8 RGB HWC frames
and ``FrameTarget`` boxes.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

from .target import FrameTarget


class Compose:
    def __init__(self, transforms):
        self.transforms = [t for t in transforms if t is not None]

    def __call__(self, frames, targets, rng: random.Random):
        for t in self.transforms:
            frames, targets = t(frames, targets, rng)
        return frames, targets


# ---------------------------------------------------------------------------
# Photometric (applied to ONE random frame of the pair, like the reference)
# ---------------------------------------------------------------------------

class ColorJitter:
    """torchvision ColorJitter semantics (random order of brightness /
    contrast / saturation / hue, factors U[max(0,1-x), 1+x], hue U[-h, h]);
    parameters drawn once, applied to one random frame
    (``video_augmentation.py:84-109``)."""

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0):
        self.b, self.c, self.s, self.h = brightness, contrast, saturation, hue
        self.enabled = any(v > 0 for v in (brightness, contrast, saturation,
                                           hue))

    @staticmethod
    def _blend(a, b, f):
        return np.clip(f * a + (1.0 - f) * b, 0, 255)

    def _apply(self, img: np.ndarray, rng: random.Random) -> np.ndarray:
        x = img.astype(np.float32)
        ops = []
        if self.b > 0:
            f = rng.uniform(max(0.0, 1 - self.b), 1 + self.b)
            ops.append(lambda x: np.clip(x * f, 0, 255))
        if self.c > 0:
            f = rng.uniform(max(0.0, 1 - self.c), 1 + self.c)

            def contrast(x, f=f):
                gray_mean = (x @ np.array([0.299, 0.587, 0.114],
                                          np.float32)).mean()
                return self._blend(x, gray_mean, f)
            ops.append(contrast)
        if self.s > 0:
            f = rng.uniform(max(0.0, 1 - self.s), 1 + self.s)

            def sat(x, f=f):
                gray = x @ np.array([0.299, 0.587, 0.114], np.float32)
                return self._blend(x, gray[..., None], f)
            ops.append(sat)
        if self.h > 0:
            d = rng.uniform(-self.h, self.h)

            def hue(x, d=d):
                hsv = cv2.cvtColor(x.astype(np.uint8), cv2.COLOR_RGB2HSV)
                # OpenCV hue is [0, 180); torchvision hue factor is in turns
                hsv[..., 0] = (hsv[..., 0].astype(np.int32)
                               + int(round(d * 180))) % 180
                return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32)
            ops.append(hue)
        rng.shuffle(ops)
        for op in ops:
            x = op(x)
        return x.astype(np.uint8)

    def __call__(self, frames, targets, rng):
        if not self.enabled or len(frames) < 2:
            return frames, targets
        idx = rng.choice((0, 1))
        frames = list(frames)
        frames[idx] = self._apply(frames[idx], rng)
        return frames, targets


class MotionBlur:
    """One frame, with probability ``prob``: random pick of directional
    motion blur (k=10, angle U[-30, 30] — imgaug MotionBlur) or Gaussian
    blur (sigma U[0, 2]) (``image_augmentation.py:140-163``)."""

    def __init__(self, prob=0.0, kernel_size=10, angle=30.0, max_sigma=2.0):
        self.prob = prob
        self.k = kernel_size
        self.angle = angle
        self.max_sigma = max_sigma

    def _motion_kernel(self, angle_deg: float) -> np.ndarray:
        k = self.k
        kern = np.zeros((k, k), np.float32)
        kern[k // 2, :] = 1.0
        rot = cv2.getRotationMatrix2D((k / 2 - 0.5, k / 2 - 0.5), angle_deg,
                                      1.0)
        kern = cv2.warpAffine(kern, rot, (k, k))
        s = kern.sum()
        return kern / s if s > 0 else kern

    def __call__(self, frames, targets, rng):
        if self.prob <= 0 or len(frames) < 2:
            return frames, targets
        idx = rng.choice((0, 1))
        if rng.uniform(0, 1) >= self.prob:
            return frames, targets
        frames = list(frames)
        if rng.choice((0, 1)) == 0:
            kern = self._motion_kernel(rng.uniform(-self.angle, self.angle))
            frames[idx] = cv2.filter2D(frames[idx], -1, kern)
        else:
            sigma = rng.uniform(0.0, self.max_sigma)
            if sigma > 1e-3:
                frames[idx] = cv2.GaussianBlur(frames[idx], (0, 0), sigma)
        return frames, targets


class JpegCompression:
    """One frame: JPEG round-trip at compression U[0, max_compression]
    (quality = 100 - compression; ``image_augmentation.py:166-186``)."""

    def __init__(self, max_compression=0.0):
        self.max_compression = max_compression

    def __call__(self, frames, targets, rng):
        if self.max_compression <= 0 or len(frames) < 2:
            return frames, targets
        idx = rng.choice((0, 1))
        compression = min(100, int(rng.uniform(0, 1) * self.max_compression))
        quality = 100 - compression
        frames = list(frames)
        ok, buf = cv2.imencode(".jpg", frames[idx][..., ::-1],
                               [cv2.IMWRITE_JPEG_QUALITY, quality])
        if ok:
            frames[idx] = cv2.imdecode(buf, cv2.IMREAD_COLOR)[..., ::-1]
        return frames, targets


# ---------------------------------------------------------------------------
# Geometric
# ---------------------------------------------------------------------------

class MotionAugment:
    """Synthetic inter-frame motion: crop-resize ONE frame of the pair
    (``SiamVideoMotionAugment`` + ``ImageCropResize``,
    ``video_augmentation.py:112-137``, ``image_augmentation.py:53-137``).

    The crop keeps aspect ratio, is bounded so the largest box keeps at
    least 75% visible, and the frame is resized back to its original size
    (boxes shifted + rescaled; amodal keeps out-of-bounds corners)."""

    def __init__(self, motion_limit=0.0, amodal=False):
        self.motion_limit = min(0.1, motion_limit or 0.0)
        self.amodal = amodal

    def _crop_resize(self, img: np.ndarray, target: FrameTarget,
                     rng: random.Random):
        h, w = img.shape[:2]
        tl_x = int(w * rng.random() * self.motion_limit)
        tl_y = int(h * rng.random() * self.motion_limit)
        br_x = int(w - w * rng.random() * self.motion_limit)
        br_y = int((h / w) * (br_x - tl_x) + tl_y)  # keep aspect ratio

        if len(target) > 0:
            b = target.boxes
            bw = np.clip(b[:, 2], 0, w - 1) - np.clip(b[:, 0], 0, w - 1)
            bh = np.clip(b[:, 3], 0, h - 1) - np.clip(b[:, 1], 0, h - 1)
            i = int(np.argmax(bw * bh))
            # preserve at least one box after the crop
            tl_x = min(tl_x, int(bw[i] * 0.25))
            tl_y = min(tl_y, int(bh[i] * 0.25))
            br_x = max(br_x, w - int(bw[i] * 0.25))
            br_y = max(br_y, h - int(bh[i] * 0.25))
        br_y = min(br_y, h)
        if tl_x >= br_x or tl_y >= br_y:
            return img, target

        crop = img[tl_y:br_y, tl_x:br_x]
        crop = cv2.resize(crop, (w, h), interpolation=cv2.INTER_LINEAR)
        target = target.crop_shift(tl_x, tl_y, br_x, br_y, self.amodal)
        return crop, target.resize((w, h))

    def __call__(self, frames, targets, rng):
        if self.motion_limit == 0 or len(frames) < 2:
            return frames, targets
        idx = rng.choice((0, 1))
        frames, targets = list(frames), list(targets)
        frames[idx], targets[idx] = self._crop_resize(frames[idx],
                                                      targets[idx], rng)
        return frames, targets


def train_resize_dims(w: int, h: int, min_sizes: Sequence[int], max_size: int,
                      divisibility: int, rng: random.Random):
    """Reference ``ImageResize.get_size`` (``image_augmentation.py:21-42``):
    random short-side choice, long-side cap, FLOOR to divisibility.
    Returns (new_w, new_h)."""
    size = rng.choice(tuple(min_sizes))
    mn, mx = float(min(w, h)), float(max(w, h))
    if max_size is not None and mx / mn * size > max_size:
        size = int(round(max_size * mn / mx))
    if w < h:
        ow, oh = size, int(size * h / w)
    else:
        oh, ow = size, int(size * w / h)
    if divisibility > 0:
        oh = int(oh / divisibility) * divisibility
        ow = int(ow / divisibility) * divisibility
    return ow, oh


class ClipResize:
    """Same new size for every frame of the clip, computed from frame 0
    (``SiamVideoResize``, ``video_augmentation.py:35-59``)."""

    def __init__(self, min_sizes, max_size, divisibility):
        self.min_sizes = min_sizes if isinstance(min_sizes, (list, tuple)) \
            else (min_sizes,)
        self.max_size = max_size
        self.divisibility = divisibility

    def __call__(self, frames, targets, rng):
        h, w = frames[0].shape[:2]
        nw, nh = train_resize_dims(w, h, self.min_sizes, self.max_size,
                                   self.divisibility, rng)
        out_f, out_t = [], []
        for img, t in zip(frames, targets):
            out_f.append(cv2.resize(img, (nw, nh),
                                    interpolation=cv2.INTER_LINEAR))
            out_t.append(t.resize((nw, nh)))
        return out_f, out_t


class ClipHFlip:
    """All frames flip together or none (``video_augmentation.py:62-81``)."""

    def __init__(self, prob=0.5):
        self.prob = prob

    def __call__(self, frames, targets, rng):
        if rng.random() >= self.prob:
            return frames, targets
        return ([np.ascontiguousarray(f[:, ::-1]) for f in frames],
                [t.hflip() for t in targets])


class Normalize:
    """x/255 then (x - mean) / std, float32 HWC output."""

    def __init__(self, mean, std, to_bgr255=False):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.to_bgr255 = to_bgr255

    def __call__(self, frames, targets, rng):
        out = []
        for f in frames:
            x = f.astype(np.float32)
            if self.to_bgr255:
                x = x[..., ::-1]
            else:
                x = x / 255.0
            out.append((x - self.mean) / self.std)
        return out, targets


def build_siam_augmentation(cfg, is_train=True, modality="video") -> Compose:
    """Mirror of the reference builder
    (``build_augmentation.py:9-66``): photometric + synthetic-motion
    transforms only apply at train time, and the crop-based motion /
    blur / compression only for image (pseudo-video) datasets."""
    motion_limit = blur_prob = compression = 0.0
    if is_train:
        min_size = cfg.INPUT.MIN_SIZE_TRAIN
        max_size = cfg.INPUT.MAX_SIZE_TRAIN
        flip_prob = cfg.INPUT.HORIZONTAL_FLIP_PROB_TRAIN
        jitter = ColorJitter(cfg.INPUT.BRIGHTNESS, cfg.INPUT.CONTRAST,
                             cfg.INPUT.SATURATION, cfg.INPUT.HUE)
        if modality == "image":
            motion_limit = cfg.INPUT.MOTION_LIMIT
            blur_prob = cfg.INPUT.MOTION_BLUR_PROB
            compression = cfg.INPUT.COMPRESSION_LIMIT
    else:
        min_size = cfg.INPUT.MIN_SIZE_TEST
        max_size = cfg.INPUT.MAX_SIZE_TEST
        flip_prob = 0.0
        jitter = None

    steps = [
        jitter,
        MotionBlur(blur_prob),
        JpegCompression(compression),
        MotionAugment(motion_limit, cfg.INPUT.AMODAL),
        ClipResize(min_size, max_size, cfg.DATALOADER.SIZE_DIVISIBILITY),
        ClipHFlip(flip_prob),
    ]
    if not cfg.TPU.DEVICE_NORMALIZE:
        # host-side normalization (reference pipeline); default is raw
        # uint8 frames normalized on device (models/siammot.py
        # normalize_images — same math, 4x less host->HBM traffic)
        steps.append(Normalize(cfg.INPUT.PIXEL_MEAN, cfg.INPUT.PIXEL_STD,
                               cfg.INPUT.TO_BGR255))
    return Compose(steps)
