"""Fixed-shape box operations.

Pure-JAX equivalents of the maskrcnn-benchmark BoxList operators that the
reference consumes (``boxlist_iou``, ``BoxCoder.encode/decode``,
``clip_to_image``, ``remove_small_boxes``), re-designed for static shapes:
every set of boxes is a padded ``[N, 4]`` ``xyxy`` array plus a boolean
validity mask instead of a dynamically-sized BoxList.

Numerical conventions preserved from the reference stack:
  * ``TO_REMOVE = 1`` box-size convention: ``width = x2 - x1 + 1`` in area /
    IoU / clip (maskrcnn ``bounding_box.py``), relied on by e.g. the EMM
    search-region geometry and NMS.
  * Faster-R-CNN box coder with per-coordinate weights and
    ``bbox_xform_clip = log(1000/16)``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

TO_REMOVE = 1.0
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area with the +1 convention. boxes: [..., 4] xyxy."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU between two padded sets; [N, 4] x [M, 4] -> [N, M].

    Matches maskrcnn ``boxlist_iou`` (+1 convention, zero-clamped overlap).
    """
    area_a = box_area(a)  # [N]
    area_b = box_area(b)  # [M]
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])  # [N,M,2]
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])  # [N,M,2]
    wh = jnp.clip(rb - lt + TO_REMOVE, 0)
    inter = wh[..., 0] * wh[..., 1]
    denom = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(denom, 1e-12)


def clip_to_image(boxes: jnp.ndarray, image_size) -> jnp.ndarray:
    """Clamp xyxy boxes to ``[0, size-1]`` (maskrcnn ``clip_to_image``).

    image_size: (width, height) — BoxList.size ordering.
    """
    w, h = image_size
    x1 = jnp.clip(boxes[..., 0], 0, w - TO_REMOVE)
    y1 = jnp.clip(boxes[..., 1], 0, h - TO_REMOVE)
    x2 = jnp.clip(boxes[..., 2], 0, w - TO_REMOVE)
    y2 = jnp.clip(boxes[..., 3], 0, h - TO_REMOVE)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_mask(boxes: jnp.ndarray) -> jnp.ndarray:
    """Boxes with positive extent (xyxy): x2 > x1 and y2 > y1."""
    return (boxes[..., 2] > boxes[..., 0]) & (boxes[..., 3] > boxes[..., 1])


def min_size_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """maskrcnn ``remove_small_boxes``: keep boxes with w,h >= min_size
    (in xywh mode, i.e. width = x2 - x1 + 1)."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return (w >= min_size) & (h >= min_size)


def encode(reference_boxes: jnp.ndarray, proposals: jnp.ndarray,
           weights=(10.0, 10.0, 5.0, 5.0)) -> jnp.ndarray:
    """Faster-R-CNN box encoding (maskrcnn ``BoxCoder.encode``)."""
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0] + TO_REMOVE
    ex_h = proposals[..., 3] - proposals[..., 1] + TO_REMOVE
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0] + TO_REMOVE
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1] + TO_REMOVE
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode(rel_codes: jnp.ndarray, boxes: jnp.ndarray,
           weights=(10.0, 10.0, 5.0, 5.0)) -> jnp.ndarray:
    """Faster-R-CNN box decoding (maskrcnn ``BoxCoder.decode``).

    rel_codes: [..., 4*k]; boxes: [..., 4]. Returns [..., 4*k] xyxy.
    """
    wx, wy, ww, wh = weights
    widths = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    heights = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    dx = rel_codes[..., 0::4] / wx
    dy = rel_codes[..., 1::4] / wy
    dw = jnp.minimum(rel_codes[..., 2::4] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(rel_codes[..., 3::4] / wh, BBOX_XFORM_CLIP)

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack([
        pred_ctr_x - 0.5 * pred_w,
        pred_ctr_y - 0.5 * pred_h,
        pred_ctr_x + 0.5 * pred_w - 1,
        pred_ctr_y + 0.5 * pred_h - 1,
    ], axis=-1)  # [..., k, 4]
    return out.reshape(*rel_codes.shape)


def extend_box(boxes: jnp.ndarray, search_expansion: float,
               min_search_wh: float) -> jnp.ndarray:
    """EMM search-region expansion (reference ``track_utils.extend_bbox``
    ``track_utils.py:62-85``): grow each side by ``wh * expansion / 2``,
    with a minimum extension derived from ``min_search_wh``."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    w_ext = w * (search_expansion / 2.0)
    h_ext = h * (search_expansion / 2.0)
    if min_search_wh > 0:
        w_ext = jnp.maximum((min_search_wh - w) / (search_expansion * 2.0), w_ext)
        h_ext = jnp.maximum((min_search_wh - h) / (search_expansion * 2.0), h_ext)
    return jnp.stack([
        boxes[..., 0] - w_ext,
        boxes[..., 1] - h_ext,
        boxes[..., 2] + w_ext,
        boxes[..., 3] + h_ext,
    ], axis=-1)


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """BoxList.convert('xywh') (+1 convention)."""
    return jnp.stack([
        boxes[..., 0],
        boxes[..., 1],
        boxes[..., 2] - boxes[..., 0] + TO_REMOVE,
        boxes[..., 3] - boxes[..., 1] + TO_REMOVE,
    ], axis=-1)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([
        boxes[..., 0],
        boxes[..., 1],
        boxes[..., 0] + jnp.clip(boxes[..., 2] - TO_REMOVE, 0),
        boxes[..., 1] + jnp.clip(boxes[..., 3] - TO_REMOVE, 0),
    ], axis=-1)


def resize_boxes(boxes: jnp.ndarray, from_size, to_size) -> jnp.ndarray:
    """BoxList.resize: independent x / y scaling. Sizes are (w, h)."""
    ratio_w = to_size[0] / from_size[0]
    ratio_h = to_size[1] / from_size[1]
    scale = jnp.asarray([ratio_w, ratio_h, ratio_w, ratio_h], dtype=boxes.dtype)
    return boxes * scale
