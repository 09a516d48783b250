"""EMM training-pair sampler, vectorized.

Re-casts the reference's Python-loop sampler
(``/root/reference/siammot/modelling/track_head/EMM/target_sampler.py:11-304``)
as fixed-shape masked ops.  Per image pair it emits 256 padded track
samples (source box for template pooling, pair box whose extension is the
search region, target box in the *other* frame for regression):

  * positives: RPN proposals IoU-matched (FG .65 / BG .35) to a source GT
    id; target = the same id's box in the paired frame (dummy if absent);
  * hard negatives: (gt, proposal) pairs where the proposal carries a
    *different* id and has a similar height scale (ratio in [0.5, 2]);
  * negatives: unmatched proposals with objectness >= 0.3 and >= 5 px.

Budget: 256 * POS_RATIO positives, 256 * HN_RATIO hard negatives, the
remainder negatives (``defaults.py:61,74-75``).

Known deviation: the reference caps each GT's hard negatives at the
number of distinct other-ids among its candidates
(``target_sampler.py:154-178``); the vectorized version samples uniformly
over all (gt, proposal) candidates — same pool, slightly different
redundancy distribution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import boxes as box_ops
from ..core.matcher import match_targets
from ..core.structures import Boxes

DUMMY_BOX = -1.0


def _sample_k(rng, mask, k):
    """Randomly keep at most k set entries of ``mask``; returns
    (selected mask, count)."""
    n = mask.shape[0]
    pri = jnp.where(mask, jax.random.uniform(rng, (n,)), 2.0)
    order = jnp.argsort(pri)
    rank = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))
    sel = mask & (rank < k)
    return sel, jnp.sum(sel.astype(jnp.int32))


from ..utils.registry import TRACKER_SAMPLER


@TRACKER_SAMPLER.register("EMM")
def sample_track_pairs(rng, proposals: Boxes, objectness: jnp.ndarray,
                       gt_src: Boxes, gt_tar: Boxes, num_samples: int,
                       pos_ratio: float, hn_ratio: float,
                       fg_iou: float, bg_iou: float):
    """One image pair -> [num_samples] padded track training samples.

    Returns dict with src_boxes, pair_boxes, tar_boxes, valid.
    """
    p = proposals.capacity
    g = gt_src.capacity
    r_pos, r_hn, r_neg = jax.random.split(rng, 3)

    # ---- match proposals to source gt (target_sampler.py:24-49)
    quality = box_ops.box_iou(gt_src.boxes, proposals.boxes)
    matches = match_targets(quality, gt_src.valid, proposals.valid,
                            fg_iou, bg_iou)
    matched = jnp.clip(matches, 0)
    prop_ids = jnp.where(matches >= 0, gt_src.ids[matched], matches)

    # id -> paired-frame box (dummy when the id is absent in the pair frame)
    def tar_box_of_ids(ids):
        eq = (ids[:, None] == gt_tar.ids[None, :]) & gt_tar.valid[None, :] \
            & (ids >= 0)[:, None]
        has = jnp.any(eq, axis=1)
        idx = jnp.argmax(eq, axis=1)
        found = gt_tar.boxes[idx]
        return jnp.where(has[:, None], found, DUMMY_BOX)

    # ---- positives
    pos_cand = (prop_ids >= 0) & proposals.valid
    n_pos_budget = int(num_samples * pos_ratio)
    pos_sel, n_pos = _sample_k(r_pos, pos_cand, n_pos_budget)
    pos_src = proposals.boxes
    pos_pair = proposals.boxes
    pos_tar = tar_box_of_ids(prop_ids)

    # ---- hard negatives over the (gt, proposal) grid
    prop_h = proposals.boxes[:, 3] - proposals.boxes[:, 1]
    gt_h = gt_src.boxes[:, 3] - gt_src.boxes[:, 1]
    scale = gt_h[:, None] / jnp.maximum(prop_h[None, :], 1e-10)
    hn_cand = (gt_src.valid[:, None] & proposals.valid[None, :]
               & (prop_ids[None, :] >= 0)
               & (prop_ids[None, :] != gt_src.ids[:, None])
               & (scale >= 0.5) & (scale <= 2.0)).reshape(-1)
    n_hn_budget = int(num_samples * hn_ratio)
    hn_sel, n_hn = _sample_k(r_hn, hn_cand, n_hn_budget)
    hn_src = jnp.repeat(gt_src.boxes, p, axis=0)               # [G*P, 4]
    hn_pair = jnp.tile(proposals.boxes, (g, 1))                # [G*P, 4]
    hn_tar = tar_box_of_ids(jnp.repeat(gt_src.ids, p))

    # ---- negatives (target_sampler.py:242-270)
    prop_w = proposals.boxes[:, 2] - proposals.boxes[:, 0]
    neg_cand = ((prop_ids == -1) & (objectness >= 0.3)
                & (prop_h >= 5) & (prop_w >= 5) & proposals.valid)
    n_neg_budget = num_samples - n_pos - n_hn
    neg_sel, _ = _sample_k(r_neg, neg_cand, n_neg_budget)
    neg_tar = jnp.full((p, 4), DUMMY_BOX)

    # ---- compact the union to num_samples slots
    all_valid = jnp.concatenate([pos_sel, hn_sel, neg_sel])
    all_src = jnp.concatenate([pos_src, hn_src, proposals.boxes])
    all_pair = jnp.concatenate([pos_pair, hn_pair, proposals.boxes])
    all_tar = jnp.concatenate([pos_tar, hn_tar, neg_tar])

    order = jnp.argsort(~all_valid, stable=True)[:num_samples]
    return dict(
        src_boxes=all_src[order],
        pair_boxes=all_pair[order],
        tar_boxes=all_tar[order],
        valid=all_valid[order],
    )
