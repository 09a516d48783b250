"""maskrcnn-benchmark layer semantics in pure torch.

The reference outsources these to compiled maskrcnn_benchmark extensions
(ROIAlign / nms) and small Python modules (BoxCoder, LevelMapper,
FrozenBatchNorm2d).  Re-derived here from their definitions:

  * FrozenBatchNorm2d: affine-only BN, NO eps
    (maskrcnn layers/batch_norm.py).
  * ROIAlign, aligned=False: Detectron sampling grid — rois scaled with
    no half-pixel offset, roi size floored at 1, `sampling_ratio`
    bilinear taps per bin averaged, samples outside [-1, size] dropped,
    coordinates clamped at 0 and size-1 (csrc/ROIAlign_cpu.cpp).
  * nms: serial greedy with the Detectron +1 width convention.
  * BoxCoder: weighted dx/dy/dw/dh with bbox_xform_clip = log(1000/16).
"""

import math

import torch
from torch import nn

TO_REMOVE = 1.0
BBOX_XFORM_CLIP = math.log(1000.0 / 16)


class FrozenBatchNorm2d(nn.Module):
    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.ones(n))
        self.register_buffer("bias", torch.zeros(n))
        self.register_buffer("running_mean", torch.zeros(n))
        self.register_buffer("running_var", torch.ones(n))

    def forward(self, x):
        scale = self.weight * self.running_var.rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + bias[None, :, None, None]


def bilinear_gather(feat: torch.Tensor, y: torch.Tensor, x: torch.Tensor):
    """feat [C, H, W]; y/x arbitrary same-shaped sample coords.

    Returns [C, *y.shape] with the ROIAlign border rules applied.
    """
    c, h, w = feat.shape
    inside = (y >= -1.0) & (y <= h) & (x >= -1.0) & (x <= w)
    y = y.clamp(min=0.0)
    x = x.clamp(min=0.0)
    y_low = y.floor().long().clamp(max=h - 1)
    x_low = x.floor().long().clamp(max=w - 1)
    # at the top border the sample collapses onto the last row/col
    y = torch.where(y_low >= h - 1, y_low.to(y.dtype), y)
    x = torch.where(x_low >= w - 1, x_low.to(x.dtype), x)
    y_high = (y_low + 1).clamp(max=h - 1)
    x_high = (x_low + 1).clamp(max=w - 1)
    ly = y - y_low.to(y.dtype)
    lx = x - x_low.to(x.dtype)
    hy, hx = 1.0 - ly, 1.0 - lx

    flat = feat.reshape(c, h * w)

    def take(yy, xx):
        return flat[:, (yy * w + xx).reshape(-1)].reshape(c, *y.shape)

    val = (take(y_low, x_low) * (hy * hx)
           + take(y_low, x_high) * (hy * lx)
           + take(y_high, x_low) * (ly * hx)
           + take(y_high, x_high) * (ly * lx))
    return val * inside.to(val.dtype)


def roi_align(feat: torch.Tensor, rois: torch.Tensor, out_hw,
              spatial_scale: float, sampling_ratio: int) -> torch.Tensor:
    """feat [C, H, W] (single image), rois [R, 4] xyxy in image coords.

    aligned=False semantics; sampling_ratio must be > 0 (the reference
    configs use 2 everywhere).
    """
    assert sampling_ratio > 0
    ph, pw = out_hw
    s = sampling_ratio
    r = rois.shape[0]
    if r == 0:
        return feat.new_zeros((0, feat.shape[0], ph, pw))

    start_w = rois[:, 0] * spatial_scale
    start_h = rois[:, 1] * spatial_scale
    roi_w = (rois[:, 2] * spatial_scale - start_w).clamp(min=1.0)
    roi_h = (rois[:, 3] * spatial_scale - start_h).clamp(min=1.0)
    bin_w = roi_w / pw
    bin_h = roi_h / ph

    iy = (torch.arange(s, dtype=feat.dtype) + 0.5) / s        # [s]
    py = torch.arange(ph, dtype=feat.dtype)
    px = torch.arange(pw, dtype=feat.dtype)
    # y coords [R, ph, s]: start + (py + frac) * bin_h
    ys = (start_h[:, None, None]
          + (py[None, :, None] + iy[None, None, :]) * bin_h[:, None, None])
    xs = (start_w[:, None, None]
          + (px[None, :, None] + iy[None, None, :]) * bin_w[:, None, None])

    out = []
    for i in range(r):
        yy = ys[i].reshape(ph * s, 1).expand(ph * s, pw * s)
        xx = xs[i].reshape(1, pw * s).expand(ph * s, pw * s)
        v = bilinear_gather(feat, yy, xx)                       # [C, ph*s, pw*s]
        v = v.reshape(-1, ph, s, pw, s).mean(dim=(2, 4))
        out.append(v)
    return torch.stack(out)


def box_area(boxes: torch.Tensor) -> torch.Tensor:
    return ((boxes[:, 2] - boxes[:, 0] + TO_REMOVE)
            * (boxes[:, 3] - boxes[:, 1] + TO_REMOVE))


def box_iou(a: torch.Tensor, b: torch.Tensor) -> torch.Tensor:
    lt = torch.max(a[:, None, :2], b[None, :, :2])
    rb = torch.min(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt + TO_REMOVE).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (box_area(a)[:, None] + box_area(b)[None] - inter)


def nms(boxes: torch.Tensor, scores: torch.Tensor, iou_thresh: float,
        max_out: int = -1) -> torch.Tensor:
    """Serial greedy NMS keep indices, score-descending."""
    order = torch.argsort(scores, descending=True)
    keep = []
    alive = torch.ones(len(order), dtype=torch.bool)
    for oi in range(len(order)):
        if not alive[oi]:
            continue
        i = order[oi]
        keep.append(i.item())
        if 0 <= max_out == len(keep):
            break
        if oi + 1 < len(order):
            rest = order[oi + 1:]
            ious = box_iou(boxes[i: i + 1], boxes[rest])[0]
            alive[oi + 1:] &= ious <= iou_thresh
    return torch.tensor(keep, dtype=torch.long)


def clip_to_image(boxes: torch.Tensor, size_wh) -> torch.Tensor:
    w, h = size_wh
    return torch.stack([
        boxes[:, 0].clamp(0, w - TO_REMOVE),
        boxes[:, 1].clamp(0, h - TO_REMOVE),
        boxes[:, 2].clamp(0, w - TO_REMOVE),
        boxes[:, 3].clamp(0, h - TO_REMOVE)], dim=1)


class BoxCoder:
    def __init__(self, weights=(10.0, 10.0, 5.0, 5.0)):
        self.weights = weights

    def decode(self, codes: torch.Tensor, boxes: torch.Tensor):
        """codes [N, 4k], boxes [N, 4] -> [N, 4k]."""
        boxes = boxes.to(codes.dtype)
        widths = boxes[:, 2] - boxes[:, 0] + TO_REMOVE
        heights = boxes[:, 3] - boxes[:, 1] + TO_REMOVE
        cx = boxes[:, 0] + 0.5 * widths
        cy = boxes[:, 1] + 0.5 * heights
        wx, wy, ww, wh = self.weights
        dx = codes[:, 0::4] / wx
        dy = codes[:, 1::4] / wy
        dw = (codes[:, 2::4] / ww).clamp(max=BBOX_XFORM_CLIP)
        dh = (codes[:, 3::4] / wh).clamp(max=BBOX_XFORM_CLIP)
        pred_cx = dx * widths[:, None] + cx[:, None]
        pred_cy = dy * heights[:, None] + cy[:, None]
        pred_w = dw.exp() * widths[:, None]
        pred_h = dh.exp() * heights[:, None]
        out = torch.zeros_like(codes)
        out[:, 0::4] = pred_cx - 0.5 * pred_w
        out[:, 1::4] = pred_cy - 0.5 * pred_h
        out[:, 2::4] = pred_cx + 0.5 * pred_w - 1
        out[:, 3::4] = pred_cy + 0.5 * pred_h - 1
        return out


class LevelMapper:
    """FPN heuristic: floor(k0 + log2(sqrt(area)/s0 + eps)), clamped."""

    def __init__(self, k_min=2, k_max=5, canonical_scale=224,
                 canonical_level=4, eps=1e-6):
        self.k_min, self.k_max = k_min, k_max
        self.s0, self.lvl0, self.eps = canonical_scale, canonical_level, eps

    def __call__(self, boxes: torch.Tensor) -> torch.Tensor:
        s = torch.sqrt(box_area(boxes))
        lvl = torch.floor(self.lvl0 + torch.log2(s / self.s0 + self.eps))
        return (lvl.clamp(min=self.k_min, max=self.k_max) - self.k_min).long()
