"""ROIAlign for TPU.

Re-owns maskrcnn-benchmark's ``ROIAlign`` CUDA kernel
(``csrc/ROIAlign_cuda.cu``; consumed by the reference at
``EMM/sr_pool.py:27-31`` and the FPN box-head pooler) as a pure-XLA
gather/weighted-sum formulation over NHWC features with static shapes.

Exact semantics preserved:
  * ``aligned=False`` coordinate transform: ``start = x1 * scale`` (no 0.5
    pixel shift), ``roi_w = max(end - start, 1)``.
  * sample grid: ``sampling_ratio`` x ``sampling_ratio`` points per bin at
    ``start + (p*S + s + 0.5) * bin / S``; average over samples.
  * boundary: samples with ``y < -1 or y > H`` contribute 0; otherwise ``y``
    is clamped to ``[0, H-1]`` before bilinear corner interpolation.

Virtual padding: the reference physically zero-pads every FPN level by
``PAD_PIXELS * scale`` pixels and shifts boxes into padded coordinates
(``track_utils.pad_feature`` / ``update_boxes_in_pad_images``,
``track_utils.py:87-135``).  Materialising those pads is pure HBM waste on
TPU; instead this op accepts ``pad`` (the per-level pad in feature pixels)
and evaluates the *padded* computation implicitly: bounds checks use the
padded extent while lookups into the unpadded feature return 0 for indices
that fall inside the pad band.  Bit-for-bit equal to pooling from a
physically padded map.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _sample_positions(start, roi_extent, out_size: int, sampling_ratio: int):
    """All 1-D sample coordinates for one axis. -> [..., out*S]"""
    bin_size = roi_extent / out_size  # [...]
    s = np.arange(out_size * sampling_ratio, dtype=np.float32)
    frac = (s + 0.5) / sampling_ratio  # in bin units spanning [0, out)
    return start[..., None] + frac * bin_size[..., None]


def _bilinear_1d(pos, size_padded: int):
    """1-D bilinear corner indices/weights with maskrcnn edge semantics.

    Returns (lo, hi, w_lo, w_hi, inside) where indices are in the padded
    coordinate space.
    """
    inside = (pos >= -1.0) & (pos <= size_padded)
    p = jnp.clip(pos, 0.0, size_padded - 1)
    lo = jnp.floor(p).astype(jnp.int32)
    lo = jnp.minimum(lo, size_padded - 1)
    hi = jnp.minimum(lo + 1, size_padded - 1)
    frac = jnp.where(lo >= size_padded - 1, 0.0, p - lo.astype(p.dtype))
    return lo, hi, 1.0 - frac, frac, inside


@partial(jax.jit, static_argnames=("output_size", "spatial_scale",
                                   "sampling_ratio", "pad"))
def roi_align(features: jnp.ndarray, rois: jnp.ndarray,
              output_size: int, spatial_scale: float,
              sampling_ratio: int, pad: int = 0) -> jnp.ndarray:
    """Single-level ROIAlign.

    Args:
      features: [H, W, C] (one image, NHWC layout without batch).
      rois: [N, 4] xyxy boxes.  If ``pad > 0`` they are in virtually-padded
        image coordinates (shifted by ``pad / spatial_scale`` pixels).
      output_size: pooled height == width.
      pad: per-level virtual pad in *feature* pixels.

    Returns: [N, output_size, output_size, C]
    """
    h, w, c = features.shape
    hp, wp = h + 2 * pad, w + 2 * pad

    start = rois[:, :2] * spatial_scale  # [N, 2] (x, y)
    end = rois[:, 2:] * spatial_scale
    extent = jnp.maximum(end - start, 1.0)

    xs = _sample_positions(start[:, 0], extent[:, 0], output_size, sampling_ratio)
    ys = _sample_positions(start[:, 1], extent[:, 1], output_size, sampling_ratio)

    x_lo, x_hi, wx_lo, wx_hi, x_in = _bilinear_1d(xs, wp)  # [N, out*S]
    y_lo, y_hi, wy_lo, wy_hi, y_in = _bilinear_1d(ys, hp)

    # shift from padded to unpadded index space; zero outside the real map
    def lookup_weight(idx, unpadded_size):
        real = idx - pad
        ok = (real >= 0) & (real < unpadded_size)
        return jnp.clip(real, 0, unpadded_size - 1), ok

    x_lo_r, x_lo_ok = lookup_weight(x_lo, w)
    x_hi_r, x_hi_ok = lookup_weight(x_hi, w)
    y_lo_r, y_lo_ok = lookup_weight(y_lo, h)
    y_hi_r, y_hi_ok = lookup_weight(y_hi, h)

    wx_lo = jnp.where(x_in & x_lo_ok, wx_lo, 0.0)
    wx_hi = jnp.where(x_in & x_hi_ok, wx_hi, 0.0)
    wy_lo = jnp.where(y_in & y_lo_ok, wy_lo, 0.0)
    wy_hi = jnp.where(y_in & y_hi_ok, wy_hi, 0.0)

    flat = features.reshape(h * w, c)

    n = rois.shape[0]
    os = output_size * sampling_ratio

    def corner(yi, xi, wy, wx):
        # [N, os] x [N, os] -> [N, os, os]
        idx = yi[:, :, None] * w + xi[:, None, :]
        val = flat[idx.reshape(-1)].reshape(n, os, os, c)
        wgt = (wy[:, :, None] * wx[:, None, :]).astype(features.dtype)
        return val * wgt[..., None]

    acc = corner(y_lo_r, x_lo_r, wy_lo, wx_lo)
    acc += corner(y_lo_r, x_hi_r, wy_lo, wx_hi)
    acc += corner(y_hi_r, x_lo_r, wy_hi, wx_lo)
    acc += corner(y_hi_r, x_hi_r, wy_hi, wx_hi)

    # average the sampling_ratio^2 samples inside every bin
    acc = acc.reshape(n, output_size, sampling_ratio, output_size,
                      sampling_ratio, c)
    return acc.mean(axis=(2, 4))


def map_rois_to_levels(boxes: jnp.ndarray, k_min: int, k_max: int,
                       canonical_scale: int = 224,
                       canonical_level: int = 4) -> jnp.ndarray:
    """maskrcnn ``LevelMapper``: FPN paper eqn.(1) with +1 box areas.

    Returns level indices relative to ``k_min`` (0-based into the pooler's
    feature list).  Used by ``SRPooler`` with the *template* box
    (``sr_pool.py:73-74``).
    """
    w = boxes[..., 2] - boxes[..., 0] + 1.0
    h = boxes[..., 3] - boxes[..., 1] + 1.0
    s = jnp.sqrt(jnp.maximum(w * h, 0.0))
    lvl = jnp.floor(canonical_level + jnp.log2(s / canonical_scale + 1e-6))
    lvl = jnp.clip(lvl, k_min, k_max)
    return (lvl - k_min).astype(jnp.int32)


def multilevel_roi_align_batched(features: list, rois: jnp.ndarray,
                                 img_idx: jnp.ndarray, levels: jnp.ndarray,
                                 output_size: int, scales: tuple,
                                 sampling_ratio: int,
                                 pad_pixels: int = 0) -> jnp.ndarray:
    """Batched-image FPN pooler: every ROI names its (image, level) pair.

    features: list of [B, Hi, Wi, C]; rois [M, 4]; img_idx [M]; levels [M].
    Flattens (image, level) into one row table so a single gather serves
    boxes from any frame in the batch — used by the track-head training
    path where template/search crops pool from different frames of a pair.
    """
    num_levels = len(scales)
    # callers may pass the full FPN list (incl. P6, which no pooler scale
    # covers); slice to the scale-covered levels — otherwise the flat
    # (image, level) block indexing below mixes levels across images
    features = list(features)[:num_levels]
    b = features[0].shape[0]
    flat_feats = [f[i] for i in range(b) for f in features]
    flat_levels = img_idx * num_levels + levels
    flat_scales = tuple(scales) * b
    return multilevel_roi_align(flat_feats, rois, flat_levels, output_size,
                                flat_scales, sampling_ratio, pad_pixels)


def multilevel_roi_align(features: list, rois: jnp.ndarray,
                         levels: jnp.ndarray, output_size: int,
                         scales: tuple, sampling_ratio: int,
                         pad_pixels: int = 0) -> jnp.ndarray:
    """FPN pooler: each ROI pools from its assigned pyramid level.

    Rather than masking 4 full per-level passes, all levels are flattened
    into one row table and each ROI gathers through a per-level row offset —
    one gather regardless of the number of levels.

    Args:
      features: list of [Hi, Wi, C] maps (one image), len == len(scales).
      rois: [N, 4] xyxy (padded-coordinate if pad_pixels > 0).
      levels: [N] int32 in [0, len(scales)).
      pad_pixels: image-space virtual pad (reference PAD_PIXELS).

    Returns: [N, output_size, output_size, C]
    """
    n = rois.shape[0]
    c = features[0].shape[-1]
    num_levels = len(scales)
    os = output_size * sampling_ratio

    heights = np.array([f.shape[0] for f in features], np.int32)
    widths = np.array([f.shape[1] for f in features], np.int32)
    pads = np.array([int(round(pad_pixels * s)) for s in scales], np.int32)
    row_offsets = np.concatenate([[0], np.cumsum(heights * widths)])[:-1].astype(np.int32)

    table = jnp.concatenate([f.reshape(-1, c) for f in features], axis=0)

    scale_arr = jnp.asarray(np.array(scales, np.float32))[levels]  # [N]
    h_arr = jnp.asarray(heights)[levels]
    w_arr = jnp.asarray(widths)[levels]
    pad_arr = jnp.asarray(pads)[levels]
    off_arr = jnp.asarray(row_offsets)[levels]

    start = rois[:, :2] * scale_arr[:, None]
    end = rois[:, 2:] * scale_arr[:, None]
    extent = jnp.maximum(end - start, 1.0)

    xs = _sample_positions(start[:, 0], extent[:, 0], output_size, sampling_ratio)
    ys = _sample_positions(start[:, 1], extent[:, 1], output_size, sampling_ratio)

    def bilinear_dyn(pos, size_padded):
        inside = (pos >= -1.0) & (pos <= size_padded[:, None].astype(pos.dtype))
        hi_clip = (size_padded - 1).astype(pos.dtype)[:, None]
        p = jnp.clip(pos, 0.0, hi_clip)
        lo = jnp.floor(p).astype(jnp.int32)
        lo = jnp.minimum(lo, size_padded[:, None] - 1)
        hi = jnp.minimum(lo + 1, size_padded[:, None] - 1)
        at_edge = lo >= size_padded[:, None] - 1
        frac = jnp.where(at_edge, 0.0, p - lo.astype(p.dtype))
        return lo, hi, 1.0 - frac, frac, inside

    x_lo, x_hi, wx_lo, wx_hi, x_in = bilinear_dyn(xs, w_arr + 2 * pad_arr)
    y_lo, y_hi, wy_lo, wy_hi, y_in = bilinear_dyn(ys, h_arr + 2 * pad_arr)

    def to_real(idx, size):
        real = idx - pad_arr[:, None]
        ok = (real >= 0) & (real < size[:, None])
        return jnp.clip(real, 0, size[:, None] - 1), ok

    x_lo_r, x_lo_ok = to_real(x_lo, w_arr)
    x_hi_r, x_hi_ok = to_real(x_hi, w_arr)
    y_lo_r, y_lo_ok = to_real(y_lo, h_arr)
    y_hi_r, y_hi_ok = to_real(y_hi, h_arr)

    wx_lo = jnp.where(x_in & x_lo_ok, wx_lo, 0.0)
    wx_hi = jnp.where(x_in & x_hi_ok, wx_hi, 0.0)
    wy_lo = jnp.where(y_in & y_lo_ok, wy_lo, 0.0)
    wy_hi = jnp.where(y_in & y_hi_ok, wy_hi, 0.0)

    def corner(yi, xi, wy, wx):
        idx = (off_arr[:, None, None] + yi[:, :, None] * w_arr[:, None, None]
               + xi[:, None, :])
        val = table[idx.reshape(-1)].reshape(n, os, os, c)
        wgt = (wy[:, :, None] * wx[:, None, :]).astype(table.dtype)
        return val * wgt[..., None]

    acc = corner(y_lo_r, x_lo_r, wy_lo, wx_lo)
    acc += corner(y_lo_r, x_hi_r, wy_lo, wx_hi)
    acc += corner(y_hi_r, x_lo_r, wy_hi, wx_lo)
    acc += corner(y_hi_r, x_hi_r, wy_hi, wx_hi)

    acc = acc.reshape(n, output_size, sampling_ratio, output_size,
                      sampling_ratio, c)
    return acc.mean(axis=(2, 4))
