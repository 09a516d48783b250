"""EMM (Explicit Motion Model) Siamese track head.

TPU-native rebuild of the reference EMM tracker
(``/root/reference/siammot/modelling/track_head/EMM/track_core.py:15-225``,
``feature_extractor.py:9-68``) over *static padded track slots*:

  * template crops: 15x15 ROIAlign at the track box; search-region crops:
    30x30 ROIAlign at the SEARCH_REGION-expanded box in virtually padded
    coordinates (the reference's physical ``pad_feature`` is replaced by
    the pad-aware gather in ``ops/roi_align.py``) — the FPN level is always
    chosen by the *template* box (``sr_pool.py:73-74``);
  * depthwise cross-correlation (``ops/xcorr.py``) + conv towers with
    GroupNorm produce 2-ch cls / 1-ch centerness / 4-ch (l,t,r,b) maps;
  * inference decodes the x16-bicubic-upsampled maps with scale and Hann
    cosine-window penalties and a per-slot argmax, entirely on device.

Invalid slots ride along as masked lanes; no host sync anywhere.
"""

from __future__ import annotations

import math
import os

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..core import boxes as box_ops
from ..ops.roi_align import (map_rois_to_levels, multilevel_roi_align,
                             multilevel_roi_align_batched)
from ..ops.upsample import upsample_bicubic
from ..ops.xcorr import xcorr_depthwise, xcorr_depthwise_auto


@flax.struct.dataclass
class EMMConfig:
    resolution: int            # template size (15)
    scales: tuple              # pooler scales
    sampling_ratio: int
    search_region: float       # SR box = box extended by (search_region - 1)
    min_search_wh: float
    pad_pixels: int
    use_centerness: bool
    cosine_window_weight: float
    cls_pos_region: float
    track_loss_weight: float
    amodal: bool

    @property
    def sr_size(self) -> int:
        return int(self.resolution * self.search_region)

    @property
    def response_size(self) -> int:
        return self.sr_size - self.resolution + 1

    @staticmethod
    def from_cfg(cfg) -> "EMMConfig":
        t = cfg.MODEL.TRACK_HEAD
        return EMMConfig(
            resolution=t.POOLER_RESOLUTION,
            scales=tuple(t.POOLER_SCALES),
            sampling_ratio=t.POOLER_SAMPLING_RATIO,
            search_region=t.SEARCH_REGION,
            min_search_wh=t.MINIMUM_SREACH_REGION,
            pad_pixels=t.PAD_PIXELS,
            use_centerness=t.EMM.USE_CENTERNESS,
            cosine_window_weight=t.EMM.COSINE_WINDOW_WEIGHT,
            cls_pos_region=t.EMM.CLS_POS_REGION,
            track_loss_weight=t.EMM.TRACK_LOSS_WEIGHT,
            amodal=bool(cfg.INPUT.AMODAL),
        )


class _Conv3x3(nn.Module):
    """3x3 SAME conv with explicit params (same tree keys/shapes/init as
    ``nn.Conv`` so checkpoints are unchanged; explicit so the Pallas
    predictor kernel can read the weights without a module call)."""

    in_features: int
    features: int

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.normal(0.01),
                                 (3, 3, self.in_features, self.features))
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.features,))

    def __call__(self, x):
        dt = jnp.promote_types(x.dtype, self.kernel.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), self.kernel.astype(dt), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.bias.astype(dt)


class _GroupNorm(nn.Module):
    """``nn.GroupNorm`` semantics (f32 stats, fast variance) with explicit
    scale/bias params (same tree keys)."""

    features: int
    groups: int = 32
    eps: float = 1e-5

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones_init(),
                                (self.features,))
        self.bias = self.param("bias", nn.initializers.zeros_init(),
                               (self.features,))

    def __call__(self, x):
        c = x.shape[-1]
        xf = x.astype(jnp.float32).reshape(*x.shape[:-1], self.groups,
                                           c // self.groups)
        red = tuple(range(1, xf.ndim - 2)) + (xf.ndim - 1,)
        mean = jnp.mean(xf, axis=red, keepdims=True)
        var = jnp.mean(xf * xf, axis=red, keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y.reshape(x.shape)
        dt = jnp.promote_types(x.dtype, self.scale.dtype)
        return (y.astype(dt) * self.scale.astype(dt)
                + self.bias.astype(dt))


class EMMPredictor(nn.Module):
    """cls/reg conv towers over the correlation response
    (reference ``feature_extractor.py:43-68``): 3x3 conv + GN(32) + ReLU
    towers, then 3x3 heads for 2-ch cls, 1-ch centerness, 4-ch regression
    (ReLU-clamped).

    With ``valid`` given on a TPU backend, the whole stack runs as ONE
    Pallas program per live track slot (``ops/pallas/decode.py`` sibling
    ``ops/pallas/predictor.py``); dead slots skip compute and emit zeros
    (downstream masks on ``TrackState.occupied``).
    """

    channels: int
    use_pallas: bool = True

    def setup(self):
        c = self.channels
        self.cls_tower_conv = _Conv3x3(c, c)
        self.cls_tower_gn = _GroupNorm(c)
        self.reg_tower_conv = _Conv3x3(c, c)
        self.reg_tower_gn = _GroupNorm(c)
        self.cls = _Conv3x3(c, 2)
        self.center = _Conv3x3(c, 1)
        self.reg = _Conv3x3(c, 4)

    def params_tree(self):
        return {
            name: {"kernel": m.kernel, "bias": m.bias}
            for name, m in (("cls_tower_conv", self.cls_tower_conv),
                            ("reg_tower_conv", self.reg_tower_conv),
                            ("cls", self.cls), ("center", self.center),
                            ("reg", self.reg))
        } | {
            name: {"scale": m.scale, "bias": m.bias}
            for name, m in (("cls_tower_gn", self.cls_tower_gn),
                            ("reg_tower_gn", self.reg_tower_gn))
        }

    def __call__(self, x, valid=None):
        # VMEM gate: one program keeps ~6 response-sized f32 buffers live
        # (padded input, two tower activations, accumulators); past ~10 MB
        # (AOT's SEARCH_REGION=5 -> 61x61 responses at C=128 is 11 MB)
        # fall back to XLA rather than press the 16 MB scoped-VMEM limit.
        s, c = x.shape[1], x.shape[-1]
        if (valid is not None and self.use_pallas
                and s * s * c * 4 * 6 <= 10 * 2**20
                and jax.default_backend() in ("tpu", "axon")):
            from ..ops.pallas.predictor import (emm_predictor_pallas,
                                                emm_predictor_pallas_blocked)
            # slot-block batching: B slots per program -> B x larger tap
            # matmuls (SIAMMOT_PREDICTOR_BLOCK=0 keeps per-slot; A/B via
            # SIAMMOT_BENCH_OPTS is not needed — env read at trace time)
            blk = int(os.environ.get("SIAMMOT_PREDICTOR_BLOCK", "0"))
            if blk > 1 and x.shape[0] % blk == 0 \
                    and s * s * c * 4 * 6 * blk <= 10 * 2**20:
                return emm_predictor_pallas_blocked(
                    x, valid, self.params_tree(), block=blk)
            return emm_predictor_pallas(x, valid, self.params_tree())
        cls_x = nn.relu(self.cls_tower_gn(self.cls_tower_conv(x)))
        reg_x = nn.relu(self.reg_tower_gn(self.reg_tower_conv(x)))
        return self.cls(cls_x), self.center(cls_x), nn.relu(self.reg(reg_x))


from ..utils.registry import SIAMESE_TRACKER


@SIAMESE_TRACKER.register("EMM")
class EMMHead(nn.Module):
    """Parameters of the EMM head (the predictor); pooling/xcorr/decoding
    are pure functions below.  Registered as the "EMM" siamese tracker
    (reference ``track_core.py:14``)."""

    channels: int

    use_pallas: bool = True

    @nn.compact
    def __call__(self, sr_features, template_features, valid=None):
        if valid is not None and self.use_pallas:
            from ..ops.xcorr import xcorr_depthwise_masked
            response = xcorr_depthwise_masked(sr_features, template_features,
                                              valid)
        else:
            xcorr = (xcorr_depthwise_auto if self.use_pallas
                     else xcorr_depthwise)
            response = xcorr(sr_features, template_features)
        # the Pallas xcorr accumulates/returns f32; drop back to the head
        # compute dtype so the predictor convs hit the bf16 MXU path
        # (f32 x bf16 weights would silently promote the towers to f32)
        response = response.astype(sr_features.dtype)
        return EMMPredictor(self.channels, use_pallas=self.use_pallas,
                            name="predictor")(response, valid)


# ---------------------------------------------------------------------------
# Pooling (the SRPooler semantics)
# ---------------------------------------------------------------------------

def pool_template(features, boxes, img_idx, ecfg: EMMConfig, pack=None,
                  window: int = 64, valid=None):
    """15x15 template crops at track boxes (unpadded coords).

    ``pack`` (a ``LevelPack``) selects the windowed-separable pooler —
    the inference fast path; the exact gather pooler otherwise.
    ``valid`` rows marked False pool to zeros and skip their window work
    (dead fixed-capacity slots).
    """
    levels = map_rois_to_levels(boxes, 2, 2 + len(ecfg.scales) - 1)
    if pack is not None:
        from ..ops.roi_align_windowed import windowed_pool
        return windowed_pool(pack, boxes, img_idx, levels, ecfg.resolution,
                             ecfg.sampling_ratio, window, valid=valid)
    out = multilevel_roi_align_batched(
        features, boxes, img_idx, levels, ecfg.resolution, ecfg.scales,
        ecfg.sampling_ratio)
    if valid is not None:   # match the windowed path's zeroed dead lanes
        out = jnp.where(valid[:, None, None, None], out, 0.0)
    return out


def pool_search_region(features, template_boxes, sr_boxes, img_idx,
                       ecfg: EMMConfig, pack=None, window: int = 128,
                       valid=None):
    """30x30 SR crops: level from the template box, crop from the SR box in
    padded coords (``sr_pool.py:64-74``)."""
    levels = map_rois_to_levels(template_boxes, 2, 2 + len(ecfg.scales) - 1)
    if pack is not None:
        from ..ops.roi_align_windowed import windowed_pool
        return windowed_pool(pack, sr_boxes, img_idx, levels, ecfg.sr_size,
                             ecfg.sampling_ratio, window,
                             pad_pixels=ecfg.pad_pixels, valid=valid)
    out = multilevel_roi_align_batched(
        features, sr_boxes, img_idx, levels, ecfg.sr_size, ecfg.scales,
        ecfg.sampling_ratio, pad_pixels=ecfg.pad_pixels)
    if valid is not None:
        out = jnp.where(valid[:, None, None, None], out, 0.0)
    return out


def make_search_region(boxes: jnp.ndarray, ecfg: EMMConfig) -> jnp.ndarray:
    """Padded-coordinate SR boxes from track boxes (reference
    ``extract_cache``: shift by PAD_PIXELS then ``extend_bbox``)."""
    padded = boxes + ecfg.pad_pixels
    return box_ops.extend_box(padded, ecfg.search_region - 1.0,
                              ecfg.min_search_wh)


# ---------------------------------------------------------------------------
# Locations + decode (reference track_core.py:101-225)
# ---------------------------------------------------------------------------

def response_locations(sr_boxes: jnp.ndarray, sr_size: int, template_size: int,
                       pad_pixels: int, up_scale: int) -> jnp.ndarray:
    """Image-space (x, y) of every response-map cell, [K, L, 2].

    The SR feature grid spans the SR box with stride (sr_extent)/(S*up - 1);
    the valid-correlation crop drops floor(T/2)*up cells from each border;
    coordinates shift back by PAD_PIXELS to unpadded image space.
    """
    s = sr_size * up_scale
    border = int(math.floor(template_size / 2)) * up_scale
    idx = np.arange(s, dtype=np.float32)[border:s - border]  # [L1d]

    ext = sr_boxes[:, 2:] - sr_boxes[:, :2]                   # [K, 2] (w, h)
    stride = ext / (s - 1)                                    # [K, 2]
    xs = sr_boxes[:, 0:1] + idx[None, :] * stride[:, 0:1]     # [K, L1d]
    ys = sr_boxes[:, 1:2] + idx[None, :] * stride[:, 1:2]

    gx = jnp.broadcast_to(xs[:, None, :], (xs.shape[0], len(idx), len(idx)))
    gy = jnp.broadcast_to(ys[:, :, None], (ys.shape[0], len(idx), len(idx)))
    loc = jnp.stack([gx, gy], axis=-1).reshape(xs.shape[0], -1, 2)
    return loc - pad_pixels


def _hann_window(size: int) -> np.ndarray:
    """Periodic Hann (torch.hann_window default), outer product, flat."""
    w = 0.5 * (1 - np.cos(2 * np.pi * np.arange(size) / size))
    return np.outer(w, w).reshape(-1).astype(np.float32)


def decode_response(cls_logits, center_logits, reg_logits, locations,
                    template_boxes, ecfg: EMMConfig):
    """Anchor-free decode of the upsampled response maps.

    Args (all NHWC, K track slots):
      cls_logits [K, S, S, 2]; center_logits [K, S, S, 1];
      reg_logits [K, S, S, 4]; locations [K, S*S, 2];
      template_boxes [K, 4].

    Returns (boxes [K, 4], scores [K]).
    """
    k, s, _, _ = cls_logits.shape
    L = s * s
    cls_prob = jax.nn.softmax(cls_logits, axis=-1)[..., 1].reshape(k, L)
    if ecfg.use_centerness:
        center = jax.nn.sigmoid(center_logits[..., 0]).reshape(k, L)
        conf = cls_prob * center
    else:
        conf = cls_prob
    tlbr = reg_logits.reshape(k, L, 4)

    # scale penalty (track_core.py:138-152); box extents WITHOUT +1.
    # NO epsilon guards: the reference divides raw, and the IEEE behavior
    # is semantically live — upsampled relu reg maps hit exact zeros
    # (sw=0 -> 1/0=+inf -> penalty exp(-inf)=0 suppresses the cell) and
    # bicubic overshoot makes them negative (max(sw, 1/sw) stays NEGATIVE,
    # leaving the cell unsuppressed; with the other axis at 0 the penalty
    # is +inf and WINS the argmax).  Guarding flips these decisions
    # (caught by tests/test_reference_model_parity.py).
    box_w = template_boxes[:, 2] - template_boxes[:, 0]
    box_h = template_boxes[:, 3] - template_boxes[:, 1]
    # dead fixed-capacity slots carry all-zero boxes; box-head-decoded
    # live boxes always have strictly positive extents, so guarding ONLY
    # the ==0 case keeps reference IEEE semantics for every live slot
    # while dead slots stay finite (consumers mask on occupancy)
    box_w = jnp.where(box_w == 0, 1.0, box_w)
    box_h = jnp.where(box_h == 0, 1.0, box_h)
    r_w = tlbr[..., 2] + tlbr[..., 0]
    r_h = tlbr[..., 3] + tlbr[..., 1]
    scale_w = r_w / box_w[:, None]
    scale_h = r_h / box_h[:, None]
    scale_w = jnp.maximum(scale_w, 1.0 / scale_w)
    scale_h = jnp.maximum(scale_h, 1.0 / scale_h)
    penalty = jnp.exp((-scale_w * scale_h + 1.0) * 0.1)

    window = jnp.asarray(_hann_window(s))[None, :]
    sigma = ecfg.cosine_window_weight
    p_conf = conf * penalty * (1 - sigma) + sigma * window

    idx = jnp.argmax(p_conf, axis=1)                       # [K]
    take = lambda a: jnp.take_along_axis(a, idx[:, None, None], axis=1)[:, 0] \
        if a.ndim == 3 else jnp.take_along_axis(a, idx[:, None], axis=1)[:, 0]
    c = take(locations)                                    # [K, 2]
    d = take(tlbr)                                         # [K, 4]
    out = jnp.stack([c[:, 0] - d[:, 0], c[:, 1] - d[:, 1],
                     c[:, 0] + d[:, 2], c[:, 1] + d[:, 3]], axis=-1)
    score = take(cls_prob[..., None])[:, 0]
    return out, score


def decode_response_fused(cls_logits, center_logits, reg_logits, sr_boxes,
                          template_boxes, ecfg: EMMConfig, up_scale: int,
                          use_pallas: bool = False, interpret: bool = False,
                          valid=None):
    """Upsample + decode in one pass, materializing only what the argmax
    needs.

    Mathematically identical to ``upsample_bicubic`` x3 +
    ``response_locations`` + ``decode_response`` (the reference's
    ``track_core.py:69-135`` pipeline) but:

      * softmax over 2 classes of upsampled logits == sigmoid of the
        upsampled logit *difference* (bicubic is linear) — 1 channel
        instead of 2;
      * the scale penalty needs only ``l+r`` and ``t+b`` — 2 channels
        instead of 4 (linearity again);
      * the regression vector and image-space location are evaluated at
        the argmax cell only (a [K,16] x [16,16,4] x [16] contraction per
        track) instead of materializing [K, S², 4] + [K, S², 2].

    ~3.4x less HBM traffic than the unfused decode at bench shapes; with
    ``use_pallas`` (TPU-only; the dispatch rule mirrors
    ``ops/xcorr.xcorr_depthwise_auto``) the upsample+penalty+argmax runs
    per-track in VMEM (``ops/pallas/decode.py``) and the [K, S², 4]
    upsampled maps never touch HBM at all.
    """
    from ..ops.upsample import bicubic_matrix

    k, s_lo = cls_logits.shape[:2]
    u = jnp.asarray(bicubic_matrix(s_lo, up_scale))     # [s_hi, s_lo]
    s_hi = s_lo * up_scale
    hi = jax.lax.Precision.HIGHEST

    diff = cls_logits[..., 1] - cls_logits[..., 0]
    chans = [diff, center_logits[..., 0],
             reg_logits[..., 0] + reg_logits[..., 2],
             reg_logits[..., 1] + reg_logits[..., 3]]
    box_w = template_boxes[:, 2] - template_boxes[:, 0]
    box_h = template_boxes[:, 3] - template_boxes[:, 1]
    # zero extents only on dead slots — see decode_response
    box_w = jnp.where(box_w == 0, 1.0, box_w)
    box_h = jnp.where(box_h == 0, 1.0, box_h)
    window = jnp.asarray(_hann_window(s_hi)).reshape(s_hi, s_hi)
    sigma = ecfg.cosine_window_weight

    # whole-map kernel to s_hi 512; row-striped kernel (bitwise-equal
    # cells, running argmax) beyond — its VMEM peak is the full Hann
    # window, so past ~1024 (no shipped recipe; AOT's SEARCH_REGION=5 is
    # s_hi 976) fall back to the XLA path
    if use_pallas and s_hi <= 1024 and (
            interpret or jax.default_backend() in ("tpu", "axon")):
        from ..ops.pallas.decode import emm_decode_pallas
        x4 = jnp.stack(chans, axis=1).astype(jnp.float32)  # [K, 4, s, s]
        idx, score = emm_decode_pallas(
            x4, jnp.stack([box_w, box_h], axis=-1), u, window, valid,
            sigma=float(sigma), use_centerness=bool(ecfg.use_centerness),
            up_scale=up_scale, interpret=interpret)
    else:
        x = jnp.stack(chans, axis=-1).astype(jnp.float32)   # [K, s, s, 4]
        up = jnp.einsum("oh,khwc->kowc", u, x, precision=hi)
        up = jnp.einsum("pw,khwc->khpc", u, up, precision=hi)

        cls_prob = jax.nn.sigmoid(up[..., 0])
        conf = cls_prob * jax.nn.sigmoid(up[..., 1]) if ecfg.use_centerness \
            else cls_prob

        # raw IEEE divisions — see decode_response for why guards are wrong
        scale_w = up[..., 2] / box_w[:, None, None]
        scale_h = up[..., 3] / box_h[:, None, None]
        scale_w = jnp.maximum(scale_w, 1.0 / scale_w)
        scale_h = jnp.maximum(scale_h, 1.0 / scale_h)
        penalty = jnp.exp((-scale_w * scale_h + 1.0) * 0.1)

        p_conf = conf * penalty * (1 - sigma) + sigma * window

        idx = jnp.argmax(p_conf.reshape(k, -1), axis=1)
        score = jnp.take_along_axis(cls_prob.reshape(k, -1), idx[:, None],
                                    axis=1)[:, 0]

    iy, ix = idx // s_hi, idx % s_hi

    # regression vector at the argmax only
    uy = u[iy]                                          # [K, s_lo]
    ux = u[ix]
    reg = jnp.einsum("kh,khwc,kw->kc", uy,
                     reg_logits.astype(jnp.float32), ux, precision=hi)

    # image-space location of the argmax (response_locations math: the
    # valid-correlation crop drops floor(T/2)*up border cells of the
    # sr_size*up grid; stride = sr_extent / (sr_size*up - 1))
    import math as _math
    border = int(_math.floor(ecfg.resolution / 2)) * up_scale
    s_full = ecfg.sr_size * up_scale
    ext = sr_boxes[:, 2:] - sr_boxes[:, :2]
    stride = ext / (s_full - 1)
    cx = sr_boxes[:, 0] + (border + ix) * stride[:, 0] - ecfg.pad_pixels
    cy = sr_boxes[:, 1] + (border + iy) * stride[:, 1] - ecfg.pad_pixels

    out = jnp.stack([cx - reg[:, 0], cy - reg[:, 1],
                     cx + reg[:, 2], cy + reg[:, 3]], axis=-1)
    return out, score


# ---------------------------------------------------------------------------
# Loss (reference EMM/track_loss.py:62-158)
# ---------------------------------------------------------------------------

def emm_targets(locations, tar_boxes, pos_region: float):
    """FCOS-style target assignment: a cell is positive when it lies inside
    the central ``pos_region`` band of the target box in both axes.

    Returns (cls_labels [K, L] in {0, 1}, reg_targets [K, L, 4]).
    """
    xs, ys = locations[..., 0], locations[..., 1]
    l = xs - tar_boxes[:, None, 0]
    t = ys - tar_boxes[:, None, 1]
    r = tar_boxes[:, None, 2] - xs
    b = tar_boxes[:, None, 3] - ys
    half_w = (tar_boxes[:, None, 2] - tar_boxes[:, None, 0]) / 2.0
    half_h = (tar_boxes[:, None, 3] - tar_boxes[:, None, 1]) / 2.0
    pos = ((l > pos_region * half_w) & (r > pos_region * half_w)
           & (t > pos_region * half_h) & (b > pos_region * half_h))
    reg = jnp.stack([l, t, r, b], axis=-1)
    return pos.astype(jnp.int32), reg


def _centerness(reg):
    lr = jnp.stack([reg[..., 0], reg[..., 2]], -1)
    tb = jnp.stack([reg[..., 1], reg[..., 3]], -1)
    c = (jnp.min(lr, -1) / jnp.maximum(jnp.max(lr, -1), 1e-10)) * \
        (jnp.min(tb, -1) / jnp.maximum(jnp.max(tb, -1), 1e-10))
    return jnp.sqrt(jnp.maximum(c, 0.0))


def _iou_loss(pred, target):
    """-log IoU with +1 smoothing (reference IOULoss, track_loss.py:33-59)."""
    t_area = (target[..., 0] + target[..., 2]) * (target[..., 1] + target[..., 3])
    p_area = (pred[..., 0] + pred[..., 2]) * (pred[..., 1] + pred[..., 3])
    w_i = jnp.minimum(pred[..., 0], target[..., 0]) + \
        jnp.minimum(pred[..., 2], target[..., 2])
    h_i = jnp.minimum(pred[..., 1], target[..., 1]) + \
        jnp.minimum(pred[..., 3], target[..., 3])
    inter = w_i * h_i
    union = t_area + p_area - inter
    return -jnp.log((inter + 1.0) / (union + 1.0))


def emm_loss(cls_logits, center_logits, reg_logits, locations, tar_boxes,
             slot_valid, ecfg: EMMConfig):
    """Balanced cls NLL + centerness-weighted IoU + centerness BCE,
    all scaled by TRACK_LOSS_WEIGHT. ``slot_valid`` masks padded slots."""
    k, s, _, _ = cls_logits.shape
    L = s * s
    labels, reg_t = emm_targets(locations, tar_boxes, ecfg.cls_pos_region)
    labels = jnp.where(slot_valid[:, None], labels, -1)

    logp = jax.nn.log_softmax(cls_logits.reshape(k, L, 2), axis=-1)
    pos = labels == 1
    neg = labels == 0
    nll_pos = -jnp.sum(jnp.where(pos, logp[..., 1], 0.0)) / \
        jnp.maximum(jnp.sum(pos), 1)
    nll_neg = -jnp.sum(jnp.where(neg, logp[..., 0], 0.0)) / \
        jnp.maximum(jnp.sum(neg), 1)
    cls_loss = 0.5 * nll_pos + 0.5 * nll_neg

    n_pos = jnp.sum(pos)
    cness = _centerness(jnp.where(pos[..., None], reg_t, 1.0))
    w = jnp.where(pos, cness, 0.0)
    # sanitize masked lanes BEFORE the log so neither the forward value nor
    # the gradient can turn NaN (0 * NaN == NaN)
    safe_pred = jnp.where(pos[..., None], reg_logits.reshape(k, L, 4), 1.0)
    safe_t = jnp.where(pos[..., None], reg_t, 1.0)
    iou_l = _iou_loss(safe_pred, safe_t)
    reg_loss = jnp.sum(w * iou_l) / jnp.maximum(jnp.sum(w), 1e-10)
    reg_loss = jnp.where(n_pos > 0, reg_loss, 0.0)

    cl = center_logits.reshape(k, L)
    bce = jnp.maximum(cl, 0) - cl * cness + jnp.log1p(jnp.exp(-jnp.abs(cl)))
    center_loss = jnp.sum(jnp.where(pos, bce, 0.0)) / jnp.maximum(n_pos, 1)
    center_loss = jnp.where(n_pos > 0, center_loss, 0.0)

    lw = ecfg.track_loss_weight
    return {"loss_tracker_class": lw * cls_loss,
            "loss_tracker_motion": lw * reg_loss,
            "loss_tracker_center": lw * center_loss}
