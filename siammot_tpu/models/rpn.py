"""Region Proposal Network.

TPU-native replacement for the external maskrcnn RPN the reference uses
(``rcnn.py:9,30``) together with the amodal post-processing patch
(``operator_patch/rpn_patch.py:9-90``): anchors follow the classic
Detectron rounding formulas, the head is a shared 3x3 conv tower, and
proposal selection is a fixed-shape pipeline (per-level top-k -> masked
NMS -> cross-level top-k) that stays entirely on device.  With
``amodal=True`` proposals are *not* clipped to the image, reproducing the
reference's MOT17 patch (``rpn_patch.py:48-52``).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..core import boxes as box_ops
from ..core.matcher import match_targets, balanced_sample
from ..core.nms import nms_mask
from ..core.structures import Boxes


# ---------------------------------------------------------------------------
# Anchors (Detectron generate_anchors semantics: round() of sqrt ratios)
# ---------------------------------------------------------------------------

def base_anchors(stride: int, size: int, aspect_ratios: Sequence[float]) -> np.ndarray:
    """Per-cell anchors for one FPN level, [A, 4] xyxy centered on cell 0."""
    base = np.array([0.0, 0.0, stride - 1.0, stride - 1.0])
    w = base[2] - base[0] + 1
    h = base[3] - base[1] + 1
    cx = base[0] + 0.5 * (w - 1)
    cy = base[1] + 0.5 * (h - 1)
    area = w * h

    out = []
    scale = size / stride
    for r in aspect_ratios:
        ws = np.round(np.sqrt(area / r))
        hs = np.round(ws * r)
        ws, hs = ws * scale, hs * scale
        out.append([cx - 0.5 * (ws - 1), cy - 0.5 * (hs - 1),
                    cx + 0.5 * (ws - 1), cy + 0.5 * (hs - 1)])
    return np.asarray(out, np.float32)


def grid_anchors(feat_hw, stride: int, cell_anchors: np.ndarray) -> np.ndarray:
    """All anchors for one level, [(H*W*A), 4] in (y, x, a) order — matching
    maskrcnn's ``permute_and_flatten`` layout."""
    h, w = feat_hw
    sx = np.arange(w, dtype=np.float32) * stride
    sy = np.arange(h, dtype=np.float32) * stride
    shift_x, shift_y = np.meshgrid(sx, sy)
    shifts = np.stack([shift_x, shift_y, shift_x, shift_y], -1).reshape(-1, 1, 4)
    return (shifts + cell_anchors[None]).reshape(-1, 4)


# ---------------------------------------------------------------------------
# Head
# ---------------------------------------------------------------------------

class RPNHead(nn.Module):
    """Shared conv tower: 3x3 + ReLU, then 1x1 objectness / 1x1 deltas."""

    num_anchors: int

    @nn.compact
    def __call__(self, features):
        conv = nn.Conv(features[0].shape[-1], (3, 3), padding=1,
                       kernel_init=nn.initializers.normal(0.01), name="conv")
        cls = nn.Conv(self.num_anchors, (1, 1),
                      kernel_init=nn.initializers.normal(0.01), name="cls_logits")
        reg = nn.Conv(self.num_anchors * 4, (1, 1),
                      kernel_init=nn.initializers.normal(0.01), name="bbox_pred")
        logits, deltas = [], []
        for f in features:
            t = nn.relu(conv(f))
            logits.append(cls(t))
            deltas.append(reg(t))
        return logits, deltas


# ---------------------------------------------------------------------------
# Proposal selection (fixed shape)
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class RPNConfig:
    anchor_strides: tuple
    anchor_sizes: tuple
    aspect_ratios: tuple
    pre_nms_top_n: int
    post_nms_top_n: int
    fpn_post_nms_top_n: int
    nms_thresh: float
    min_size: int
    amodal: bool
    # train-only (maskrcnn FPN_POST_NMS_PER_BATCH): the final top-k is
    # taken jointly over the whole batch instead of per image
    fpn_post_per_batch: bool = False
    straddle_thresh: float = 0.0
    fg_iou: float = 0.7
    bg_iou: float = 0.3
    batch_per_image: int = 256
    positive_fraction: float = 0.5

    @staticmethod
    def from_cfg(cfg, is_train: bool) -> "RPNConfig":
        r = cfg.MODEL.RPN
        return RPNConfig(
            anchor_strides=tuple(r.ANCHOR_STRIDE),
            anchor_sizes=tuple(r.ANCHOR_SIZES),
            aspect_ratios=tuple(r.ASPECT_RATIOS),
            pre_nms_top_n=r.PRE_NMS_TOP_N_TRAIN if is_train else r.PRE_NMS_TOP_N_TEST,
            post_nms_top_n=r.POST_NMS_TOP_N_TRAIN if is_train else r.POST_NMS_TOP_N_TEST,
            fpn_post_nms_top_n=(r.FPN_POST_NMS_TOP_N_TRAIN if is_train
                                else r.FPN_POST_NMS_TOP_N_TEST),
            fpn_post_per_batch=bool(is_train and r.FPN_POST_NMS_PER_BATCH),
            nms_thresh=r.NMS_THRESH,
            min_size=r.MIN_SIZE,
            amodal=bool(cfg.INPUT.AMODAL),
            straddle_thresh=float(r.STRADDLE_THRESH),
            fg_iou=r.FG_IOU_THRESHOLD,
            bg_iou=r.BG_IOU_THRESHOLD,
            batch_per_image=r.BATCH_SIZE_PER_IMAGE,
            positive_fraction=r.POSITIVE_FRACTION,
        )


def _grouped_topk(scores, k: int, group_size: int = 22080):
    """Exact top-k via per-group top-k + merge.

    For large N a batched top-k over contiguous groups followed by a
    top-k over the G*k survivors is ~2.5x faster on TPU than one flat
    ``lax.top_k`` (measured: 0.75 ms vs 2.0 ms for N=176k, k=1000 on
    v5e).  Exact including tie order: groups are contiguous index
    slices, so the merged candidate order is original index order and
    ``top_k``'s lowest-index tie-breaking matches the flat call.
    """
    n = scores.shape[0]
    groups = -(-n // group_size)
    if groups <= 1 or n <= groups * k:
        return jax.lax.top_k(scores, k)
    m = -(-n // groups)
    pad = groups * m - n
    s = jnp.concatenate(
        [scores, jnp.full((pad,), -jnp.inf, scores.dtype)]).reshape(groups, m)
    gv, gi = jax.lax.top_k(s, k)                       # [G, k]
    base = (jnp.arange(groups, dtype=gi.dtype) * m)[:, None]
    cand_v = gv.reshape(-1)
    cand_i = (gi + base).reshape(-1)
    v, j = jax.lax.top_k(cand_v, k)
    return v, cand_i[j]


def _topk_level(objectness, deltas, anchors, image_size, rcfg: RPNConfig,
                k: int):
    """One level, one image: top-k + decode + clip + small-box filter.

    Returns (boxes [k,4], scores [k], keep [k]); levels with fewer than k
    anchors are padded with keep=False rows.
    """
    hwa = objectness.shape[0]
    # top-k on raw logits (sigmoid is monotone — exact, and only the k
    # survivors pay the sigmoid)
    if hwa >= k:
        top_logits, idx = _grouped_topk(objectness, k)
        top_scores = jax.nn.sigmoid(top_logits)
        pad = jnp.ones((k,), bool)
    else:
        # small level: take everything, but still SORTED descending (same
        # selection; the downstream NMS runs presorted=True, which
        # requires valid rows in score order — top_k's lowest-index
        # tie-break matches the stable argsort it replaces)
        top_logits, sidx = jax.lax.top_k(objectness, hwa)
        top_scores = jnp.concatenate(
            [jax.nn.sigmoid(top_logits),
             jnp.full((k - hwa,), -jnp.inf, objectness.dtype)])
        idx = jnp.concatenate([sidx.astype(jnp.int32),
                               jnp.zeros((k - hwa,), jnp.int32)])
        pad = jnp.concatenate([jnp.ones((hwa,), bool),
                               jnp.zeros((k - hwa,), bool)])
    # maskrcnn's RPN BoxCoder uses weights (1,1,1,1) (rpn.py
    # ``rpn_box_coder``), NOT the box-head's (10,10,5,5) — caught by the
    # torch-replica golden test; also required for reference-checkpoint
    # compatibility (their RPN deltas are unit-scaled)
    proposals = box_ops.decode(deltas[idx], anchors[idx],
                               weights=(1.0, 1.0, 1.0, 1.0))
    if not rcfg.amodal:
        proposals = box_ops.clip_to_image(proposals, image_size)
    keep = box_ops.min_size_mask(proposals, rcfg.min_size) & pad
    return proposals, top_scores, keep


def select_proposals(logits, deltas, anchors_per_level, image_size,
                     rcfg: RPNConfig):
    """Full RPN proposal selection for a batch.

    Per-level top-k feeds ONE batched NMS over the stacked [L*N, K] sets
    (a single fixed-point loop of batched mat-vecs) instead of L
    serialized per-level NMS loops.

    Args:
      logits: list of [N, H, W, A] per level.
      deltas: list of [N, H, W, A*4].
      anchors_per_level: list of [H*W*A, 4] arrays.
      image_size: (w, h) of the network input.

    Returns (boxes [N, K, 4], objectness [N, K], valid [N, K]) with
    K = fpn_post_nms_top_n, per-image top-k semantics (test path).
    """
    k_pre = rcfg.pre_nms_top_n
    lv_boxes, lv_scores, lv_keep = [], [], []
    for lg, dl, anch in zip(logits, deltas, anchors_per_level):
        n, h, w, a = lg.shape
        obj = lg.reshape(n, h * w * a)
        dlt = dl.reshape(n, h * w * a, 4)
        fn = jax.vmap(partial(_topk_level, image_size=image_size, rcfg=rcfg,
                              k=k_pre), in_axes=(0, 0, None))
        bx, sc, kp = fn(obj, dlt, anch)
        lv_boxes.append(bx)
        lv_scores.append(sc)
        lv_keep.append(kp)

    # [L, N, K] -> one batched NMS over L*N independent sets
    n = lv_boxes[0].shape[0]
    sb = jnp.stack(lv_boxes).reshape(-1, k_pre, 4)
    ss = jnp.stack(lv_scores).reshape(-1, k_pre)
    sk = jnp.stack(lv_keep).reshape(-1, k_pre)
    # per-level candidates come straight out of top_k (valid rows already
    # score-descending; invalid rows are inert in the fixed-point
    # whatever their position) -> skip the NMS-internal argsort+gathers
    nms = jax.vmap(partial(nms_mask, iou_threshold=rcfg.nms_thresh,
                           max_out=rcfg.post_nms_top_n, presorted=True))
    sk = nms(sb, ss, sk)

    num_levels = len(lv_boxes)
    boxes = jnp.concatenate(
        [sb.reshape(num_levels, n, k_pre, 4)[i] for i in range(num_levels)],
        axis=1)
    scores = jnp.concatenate(
        [ss.reshape(num_levels, n, k_pre)[i] for i in range(num_levels)],
        axis=1)
    keep = jnp.concatenate(
        [sk.reshape(num_levels, n, k_pre)[i] for i in range(num_levels)],
        axis=1)

    k = min(rcfg.fpn_post_nms_top_n, boxes.shape[1])
    masked = jnp.where(keep, scores, -jnp.inf)
    top, idx = jax.lax.top_k(masked, k)
    sel_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    sel_scores = jnp.take_along_axis(scores, idx, axis=1)
    sel_valid = jnp.take_along_axis(keep, idx, axis=1)

    # maskrcnn FPN_POST_NMS_PER_BATCH (train): the fpn_post quota is
    # shared across the batch — the joint top-n over all images' NMS
    # survivors.  Capping each image at the same quota first is lossless
    # (a survivor outside its own image's top-n has >= n better in that
    # image alone), so this is a mask over the per-image selection.
    if rcfg.fpn_post_per_batch and n * k > rcfg.fpn_post_nms_top_n:
        flat = jnp.where(sel_valid, sel_scores, -jnp.inf).reshape(-1)
        _, gidx = jax.lax.top_k(flat, rcfg.fpn_post_nms_top_n)
        gmask = jnp.zeros((n * k,), bool).at[gidx].set(True)
        sel_valid = sel_valid & gmask.reshape(n, k)
    return sel_boxes, sel_scores, sel_valid


# ---------------------------------------------------------------------------
# Loss (maskrcnn RPNLossComputation semantics)
# ---------------------------------------------------------------------------

def smooth_l1(x, beta):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def rpn_loss(rng, logits, deltas, anchors_per_level, gt: Boxes,
             image_size, rcfg: RPNConfig):
    """RPN objectness + box loss for ONE image over all anchors.

    gt: padded Boxes of ground truth.
    Returns dict(loss_objectness, loss_rpn_box_reg) — caller averages over
    the batch.
    """
    anchors = jnp.concatenate(
        [jnp.asarray(a) for a in anchors_per_level], axis=0)  # [T, 4]
    obj = jnp.concatenate([l.reshape(-1) for l in logits])       # [T]
    dlt = jnp.concatenate([d.reshape(-1, 4) for d in deltas])    # [T, 4]

    # anchor visibility (straddle_thresh = 0: fully inside image)
    w, h = image_size
    st = rcfg.straddle_thresh
    visible = ((anchors[:, 0] >= -st) & (anchors[:, 1] >= -st)
               & (anchors[:, 2] < w + st) & (anchors[:, 3] < h + st))

    quality = box_ops.box_iou(gt.boxes, anchors)
    matches = match_targets(quality, gt.valid, jnp.ones_like(visible),
                            rcfg.fg_iou, rcfg.bg_iou,
                            allow_low_quality_matches=True)

    labels = (matches >= 0).astype(jnp.float32)
    discard = (matches == -2) | ~visible
    pos_mask = (matches >= 0) & ~discard
    neg_mask = (matches == -1) & ~discard

    sampled_pos, sampled_neg = balanced_sample(
        rng, pos_mask, neg_mask, rcfg.batch_per_image, rcfg.positive_fraction)
    sampled = sampled_pos | sampled_neg
    num_sampled = jnp.maximum(jnp.sum(sampled), 1)

    matched_gt = gt.boxes[jnp.clip(matches, 0)]
    # unit weights: maskrcnn's RPN BoxCoder (must match the decode side)
    reg_targets = box_ops.encode(matched_gt, anchors,
                                 weights=(1.0, 1.0, 1.0, 1.0))
    box_l = jnp.sum(
        jnp.where(sampled_pos[:, None], smooth_l1(dlt - reg_targets, 1.0 / 9), 0.0)
    ) / num_sampled

    logp = jax.nn.log_sigmoid(obj)
    logn = jax.nn.log_sigmoid(-obj)
    bce = -(labels * logp + (1 - labels) * logn)
    obj_l = jnp.sum(jnp.where(sampled, bce, 0.0)) / num_sampled

    return {"loss_objectness": obj_l, "loss_rpn_box_reg": box_l}
