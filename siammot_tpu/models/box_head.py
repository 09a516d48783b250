"""Detection box head.

TPU-native rebuild of the reference's ROI box head: maskrcnn's
``FPN2MLPFeatureExtractor`` (7x7 FPN pooling -> two 1024-d FC layers) +
``FPNPredictor`` (per-class score / box deltas), with SiamMOT's custom
*track-aware* post-processing (``/root/reference/siammot/modelling/
box_head/inference.py:11-217``):

  * proposals carrying a track id (id >= 0) get their class probability
    boosted by +1 at their own label and zeroed elsewhere, so NMS can
    never suppress a propagated track (``inference.py:97-103``);
  * per-class score threshold + NMS applies only to detections
    (id < 0); track rows bypass NMS and are concatenated back;
  * boxes are not clipped when ``INPUT.AMODAL`` (``inference.py:109-110``).

All of it operates on padded fixed-shape ``Boxes`` sets.
"""

from __future__ import annotations

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from ..core import boxes as box_ops
from ..core.matcher import match_targets, balanced_sample
from ..core.nms import nms_mask
from ..core.structures import Boxes
from ..ops.roi_align import map_rois_to_levels, multilevel_roi_align
from .rpn import smooth_l1


class BoxHeadFeatureExtractor(nn.Module):
    """FPN pooler + 2 FC (maskrcnn FPN2MLPFeatureExtractor)."""

    resolution: int
    scales: tuple
    sampling_ratio: int
    mlp_dim: int

    window: int = 64
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, features, rois, levels, pack=None, valid=None):
        # features: list of [N, Hi, Wi, C]; rois [N, R, 4]; levels [N, R]
        if pack is not None:  # windowed fast path (inference)
            from ..ops.roi_align_windowed import windowed_pool
            b, r = rois.shape[:2]
            img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r)
            pool = windowed_pool(pack, rois.reshape(-1, 4), img_idx,
                                 levels.reshape(-1), self.resolution,
                                 self.sampling_ratio, self.window,
                                 valid=None if valid is None
                                 else valid.reshape(-1))
            pool = pool.reshape(b, r, *pool.shape[1:])
        else:
            pool = jax.vmap(
                lambda fs, r, l: multilevel_roi_align(
                    fs, r, l, self.resolution, self.scales,
                    self.sampling_ratio)
            )([f for f in features[:len(self.scales)]], rois, levels)
            if valid is not None:  # match the windowed path's zeroed lanes
                pool = jnp.where(valid[..., None, None, None], pool, 0.0)
        # pooling stays f32-exact; the MLP computes in the trunk dtype
        x = pool.reshape(pool.shape[0], pool.shape[1], -1)
        x = x.astype(jnp.dtype(self.compute_dtype))
        x = nn.relu(nn.Dense(self.mlp_dim, name="fc6")(x))
        x = nn.relu(nn.Dense(self.mlp_dim, name="fc7")(x))
        return x


class BoxHeadPredictor(nn.Module):
    """maskrcnn FPNPredictor."""

    num_classes: int

    @nn.compact
    def __call__(self, x):
        cls_logits = nn.Dense(self.num_classes,
                              kernel_init=nn.initializers.normal(0.01),
                              name="cls_score")(x)
        box_deltas = nn.Dense(self.num_classes * 4,
                              kernel_init=nn.initializers.normal(0.001),
                              name="bbox_pred")(x)
        return cls_logits, box_deltas


class BoxHead(nn.Module):
    resolution: int
    scales: tuple
    sampling_ratio: int
    mlp_dim: int
    num_classes: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, features, rois, levels, pack=None, valid=None):
        x = BoxHeadFeatureExtractor(
            self.resolution, self.scales, self.sampling_ratio, self.mlp_dim,
            compute_dtype=self.compute_dtype,
            name="feature_extractor")(features, rois, levels, pack, valid)
        return BoxHeadPredictor(self.num_classes, name="predictor")(x)


@flax.struct.dataclass
class BoxHeadConfig:
    score_thresh: float
    nms_thresh: float
    num_classes: int
    amodal: bool
    reg_weights: tuple
    fg_iou: float = 0.5
    bg_iou: float = 0.5
    batch_per_image: int = 256
    positive_fraction: float = 0.25

    @staticmethod
    def from_cfg(cfg) -> "BoxHeadConfig":
        return BoxHeadConfig(
            score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH,
            nms_thresh=cfg.MODEL.ROI_HEADS.NMS,
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            amodal=bool(cfg.INPUT.AMODAL),
            reg_weights=tuple(cfg.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS),
            fg_iou=cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
            bg_iou=cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD,
            batch_per_image=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
        )


def postprocess(class_logits: jnp.ndarray, box_deltas: jnp.ndarray,
                proposals: Boxes, image_size, hcfg: BoxHeadConfig) -> Boxes:
    """Track-aware post-processing for one image.

    Args:
      class_logits: [N, C]; box_deltas: [N, C*4]; proposals: padded Boxes.

    Returns a padded Boxes of capacity N * (C-1): every (proposal, class)
    pair with its keep decision folded into ``valid``.
    """
    n, c = class_logits.shape
    prob = jax.nn.softmax(class_logits, axis=-1)

    is_track = (proposals.ids >= 0) & proposals.valid
    # zero all classes for tracks, then +1 boost at the track's own label
    # (inference.py:97-103)
    onehot = jax.nn.one_hot(proposals.labels, c, dtype=prob.dtype)
    track_prob = onehot * (prob + 1.0)
    prob = jnp.where(is_track[:, None], track_prob, prob)

    decoded = box_ops.decode(box_deltas, proposals.boxes,
                             hcfg.reg_weights).reshape(n, c, 4)
    if not hcfg.amodal:
        decoded = box_ops.clip_to_image(decoded, image_size)

    outs = []
    for j in range(1, c):
        boxes_j = decoded[:, j]
        scores_j = prob[:, j]
        above = (scores_j > hcfg.score_thresh) & proposals.valid
        det_mask = above & ~is_track
        det_keep = nms_mask(boxes_j, scores_j, det_mask, hcfg.nms_thresh)
        keep = det_keep | (above & is_track)
        outs.append(Boxes(
            boxes=boxes_j,
            scores=scores_j,
            ids=proposals.ids,
            labels=jnp.full((n,), j, jnp.int32),
            valid=keep,
        ))
    return jax.tree.map(lambda *xs: jnp.concatenate(xs), *outs)


# ---------------------------------------------------------------------------
# Training: proposal subsampling + losses (maskrcnn FastRCNNLossComputation)
# ---------------------------------------------------------------------------

def subsample_proposals(rng, proposals: Boxes, gt: Boxes,
                        hcfg: BoxHeadConfig, num_samples: int):
    """Match proposals to gt and take a balanced 256-sample subset.

    Returns (sampled Boxes [num_samples], cls_labels [num_samples] int32,
    reg_targets [num_samples, 4]).
    """
    quality = box_ops.box_iou(gt.boxes, proposals.boxes)
    matches = match_targets(quality, gt.valid, proposals.valid,
                            hcfg.fg_iou, hcfg.bg_iou)
    matched = jnp.clip(matches, 0)
    labels = jnp.where(matches >= 0, gt.labels[matched], 0)
    labels = jnp.where(matches == -2, -1, labels)

    pos_mask = labels > 0
    neg_mask = labels == 0
    sampled_pos, sampled_neg = balanced_sample(
        rng, pos_mask, neg_mask, hcfg.batch_per_image, hcfg.positive_fraction)
    sampled = sampled_pos | sampled_neg

    # compress sampled rows to the front [num_samples]
    priority = jnp.where(sampled, 0, 1)
    order = jnp.argsort(priority, stable=True)[:num_samples]
    sel = lambda x: x[order]

    reg_targets = box_ops.encode(gt.boxes[matched], proposals.boxes,
                                 hcfg.reg_weights)
    out = Boxes(boxes=sel(proposals.boxes), scores=sel(proposals.scores),
                ids=sel(proposals.ids), labels=sel(labels.astype(jnp.int32)),
                valid=sel(sampled))
    return out, sel(labels.astype(jnp.int32)), sel(reg_targets)


def box_head_loss(class_logits, box_deltas, labels, reg_targets, valid):
    """Classification CE + class-specific smooth-L1 box loss.

    All inputs are flattened over (batch, sample): class_logits [M, C],
    box_deltas [M, C*4], labels [M], reg_targets [M, 4], valid [M].
    """
    num = jnp.maximum(jnp.sum(valid), 1)
    logp = jax.nn.log_softmax(class_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, jnp.clip(labels, 0)[:, None], axis=1)[:, 0]
    cls_loss = jnp.sum(jnp.where(valid, ce, 0.0)) / num

    pos = valid & (labels > 0)
    m = box_deltas.shape[0]
    cols = 4 * jnp.clip(labels, 0)[:, None] + jnp.arange(4)[None, :]
    picked = jnp.take_along_axis(box_deltas, cols, axis=1)
    l1 = jnp.sum(smooth_l1(picked - reg_targets, 1.0), axis=-1)
    box_loss = jnp.sum(jnp.where(pos, l1, 0.0)) / num
    return {"loss_classifier": cls_loss, "loss_box_reg": box_loss}


def pool_levels(boxes: jnp.ndarray, num_levels: int) -> jnp.ndarray:
    """FPN level assignment for the box-head pooler (k_min=2, k_max=5)."""
    return map_rois_to_levels(boxes, 2, 2 + num_levels - 1)
