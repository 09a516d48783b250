"""RPN proposal selection: FPN_POST_NMS_PER_BATCH train semantics.

maskrcnn shares the final fpn_post top-k quota across the whole batch in
training (``FPN_POST_NMS_PER_BATCH``, the default); the test checks our
masked re-selection equals a numpy oracle of "top-n scores over every
image's NMS survivors" and leaves the per-image path untouched.
"""

import pytest
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from siammot_tpu.models.rpn import (RPNConfig, base_anchors, grid_anchors,
                                    select_proposals)


def _setup(rng, n_img=3, hw=(8, 8), num_a=3):
    stride, size = 4, 16
    cell = base_anchors(stride, size, (0.5, 1.0, 2.0))[:num_a]
    anchors = [jnp.asarray(grid_anchors(hw, stride, cell))]
    total = hw[0] * hw[1] * num_a
    logits = [jnp.asarray(rng.randn(n_img, hw[0], hw[1], num_a)
                          .astype(np.float32))]
    deltas = [jnp.asarray(rng.randn(n_img, hw[0], hw[1], num_a * 4)
                          .astype(np.float32) * 0.1)]
    rcfg = RPNConfig(
        anchor_strides=(stride,), anchor_sizes=(size,),
        aspect_ratios=(0.5, 1.0, 2.0), pre_nms_top_n=total,
        post_nms_top_n=total, fpn_post_nms_top_n=40, nms_thresh=0.7,
        min_size=0, amodal=False)
    return logits, deltas, anchors, rcfg


@pytest.mark.slow
def test_per_batch_topk_matches_oracle(rng):
    logits, deltas, anchors, rcfg = _setup(rng)
    image_size = (32, 32)

    boxes, scores, valid = select_proposals(logits, deltas, anchors,
                                            image_size, rcfg)
    pb_cfg = dataclasses.replace(rcfg, fpn_post_per_batch=True)
    boxes2, scores2, valid2 = select_proposals(logits, deltas, anchors,
                                               image_size, pb_cfg)

    # same rows selected, only the valid mask tightens
    np.testing.assert_array_equal(np.asarray(boxes), np.asarray(boxes2))
    np.testing.assert_array_equal(np.asarray(scores), np.asarray(scores2))

    # oracle: joint top-n over all per-image survivors (row-major ties)
    sc = np.where(np.asarray(valid), np.asarray(scores), -np.inf).reshape(-1)
    n_valid = int(np.isfinite(sc).sum())
    quota = min(rcfg.fpn_post_nms_top_n, n_valid)
    order = np.argsort(-sc, kind="stable")
    want = np.zeros(sc.shape, bool)
    want[order[:quota]] = True
    want &= np.isfinite(sc)
    np.testing.assert_array_equal(np.asarray(valid2).reshape(-1), want)
    assert int(np.asarray(valid2).sum()) == quota
    # strictly fewer rows than the per-image path kept
    assert int(np.asarray(valid2).sum()) < int(np.asarray(valid).sum())


def test_per_batch_noop_when_under_quota(rng):
    logits, deltas, anchors, rcfg = _setup(rng, n_img=1)
    rcfg = dataclasses.replace(rcfg, fpn_post_nms_top_n=500,
                               fpn_post_per_batch=True)
    boxes, scores, valid = select_proposals(logits, deltas, anchors,
                                            (32, 32), rcfg)
    base = dataclasses.replace(rcfg, fpn_post_per_batch=False)
    _, _, valid0 = select_proposals(logits, deltas, anchors, (32, 32), base)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(valid0))
