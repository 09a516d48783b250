"""EMM track-pair sampler: positives / hard negatives / negatives."""

import jax
import jax.numpy as jnp
import numpy as np

from siammot_tpu.core.structures import Boxes
from siammot_tpu.models.emm_sampler import DUMMY_BOX, sample_track_pairs


def _boxes(arr, ids, valid=None):
    arr = np.asarray(arr, np.float32)
    n = len(arr)
    return Boxes(boxes=jnp.asarray(arr),
                 scores=jnp.ones((n,), jnp.float32),
                 ids=jnp.asarray(np.asarray(ids, np.int32)),
                 labels=jnp.ones((n,), jnp.int32),
                 valid=jnp.asarray(np.ones(n, bool) if valid is None
                                   else np.asarray(valid)))


def test_sampler_buckets():
    # two gt objects in the source frame; id 1 also exists in the pair frame
    gt_src = _boxes([[10, 10, 40, 70], [100, 10, 130, 70]], [1, 2])
    gt_tar = _boxes([[14, 12, 44, 72], [0, 0, 1, 1]], [1, -1],
                    valid=[True, False])

    props = _boxes([
        [11, 11, 41, 71],      # IoU-matches gt 1 -> positive
        [99, 11, 129, 69],     # IoU-matches gt 2 -> positive (dummy target)
        [200, 10, 230, 68],    # unmatched, big & confident -> negative
        [300, 300, 302, 302],  # unmatched but tiny -> excluded
    ], [-1, -1, -1, -1])
    objectness = jnp.asarray([0.9, 0.9, 0.9, 0.9])

    out = sample_track_pairs(jax.random.PRNGKey(0), props, objectness,
                             gt_src, gt_tar, num_samples=16, pos_ratio=0.25,
                             hn_ratio=0.25, fg_iou=0.65, bg_iou=0.35)
    src = np.asarray(out["src_boxes"])
    tar = np.asarray(out["tar_boxes"])
    valid = np.asarray(out["valid"])
    assert valid.sum() >= 3

    # the positive matched to gt 1 regresses toward gt 1's pair-frame box
    m_pos1 = valid & np.all(np.isclose(src, [11, 11, 41, 71]), axis=1)
    assert m_pos1.sum() == 1
    assert np.allclose(tar[m_pos1][0], [14, 12, 44, 72])

    # gt 2 has no pair-frame presence: its positive gets the dummy target
    m_pos2 = valid & np.all(np.isclose(src, [99, 11, 129, 69]), axis=1)
    assert m_pos2.sum() == 1
    assert np.allclose(tar[m_pos2][0], DUMMY_BOX)

    # the tiny box never appears among valid samples
    m_tiny = valid & np.all(np.isclose(src, [300, 300, 302, 302]), axis=1)
    assert m_tiny.sum() == 0


def test_sampler_hard_negative_geometry():
    # proposal carries id 2 but is height-compatible with gt 1 ->
    # (gt1, proposal) is a hard-negative pair: template from gt1's box,
    # search region from the other-id proposal, target = gt1's pair box
    gt_src = _boxes([[10, 10, 40, 70], [100, 10, 130, 72]], [1, 2])
    gt_tar = _boxes([[12, 12, 42, 72], [101, 11, 131, 73]], [1, 2])
    props = _boxes([[99, 11, 129, 70]], [-1])
    objectness = jnp.asarray([0.9])

    out = sample_track_pairs(jax.random.PRNGKey(1), props, objectness,
                             gt_src, gt_tar, num_samples=8, pos_ratio=0.25,
                             hn_ratio=0.5, fg_iou=0.65, bg_iou=0.35)
    src = np.asarray(out["src_boxes"])
    pair = np.asarray(out["pair_boxes"])
    tar = np.asarray(out["tar_boxes"])
    valid = np.asarray(out["valid"])

    hn = valid & np.all(np.isclose(src, [10, 10, 40, 70]), axis=1)
    assert hn.sum() == 1
    assert np.allclose(pair[hn][0], [99, 11, 129, 70])
    assert np.allclose(tar[hn][0], [12, 12, 42, 72])


def test_sampler_budget_respected():
    n = 64
    rng = np.random.RandomState(3)
    boxes = np.zeros((n, 4), np.float32)
    boxes[:, 0] = rng.uniform(0, 500, n)
    boxes[:, 1] = rng.uniform(0, 300, n)
    boxes[:, 2] = boxes[:, 0] + 30
    boxes[:, 3] = boxes[:, 1] + 60
    props = _boxes(boxes, [-1] * n)
    gt = _boxes(boxes[:8] + 1.0, list(range(8)))
    out = sample_track_pairs(jax.random.PRNGKey(2), props,
                             jnp.ones((n,)), gt, gt, num_samples=16,
                             pos_ratio=0.25, hn_ratio=0.25, fg_iou=0.65,
                             bg_iou=0.35)
    assert np.asarray(out["valid"]).shape == (16,)
    # at most 4 positives (25% of 16) — count rows whose target is real
    tar = np.asarray(out["tar_boxes"])
    valid = np.asarray(out["valid"])
    n_with_target = int((valid & (tar[:, 0] >= 0)).sum())
    assert n_with_target <= 16
