"""NMS parity vs a serial greedy oracle with maskrcnn (+1 IoU) semantics."""

import pytest
import numpy as np
import jax.numpy as jnp

from siammot_tpu.core.nms import nms_mask, batched_nms_mask


def oracle_nms(boxes, scores, thresh):
    """Serial greedy NMS, +1 convention, suppress when iou > thresh."""
    order = np.argsort(-scores, kind="stable")
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    for oi, i in enumerate(order):
        if suppressed[i]:
            continue
        keep[i] = True
        for j in order[oi + 1:]:
            if suppressed[j]:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0])
            yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2])
            yy2 = min(boxes[i, 3], boxes[j, 3])
            w = max(0.0, xx2 - xx1 + 1)
            h = max(0.0, yy2 - yy1 + 1)
            inter = w * h
            if inter / (areas[i] + areas[j] - inter) > thresh:
                suppressed[j] = True
    return keep


def rand_cluster_boxes(rng, n, size=400):
    # clustered boxes so NMS actually has long suppression chains
    centers = rng.uniform(50, size - 50, (max(n // 10, 1), 2))
    idx = rng.randint(0, len(centers), n)
    c = centers[idx] + rng.randn(n, 2) * 12
    wh = rng.uniform(15, 60, (n, 2))
    return np.concatenate([c - wh / 2, c + wh / 2], -1).astype(np.float32)


@pytest.mark.slow
def test_nms_matches_oracle(rng):
    for trial in range(5):
        n = 200
        boxes = rand_cluster_boxes(rng, n)
        scores = rng.uniform(0.01, 1, n).astype(np.float32)
        for thresh in (0.3, 0.5, 0.7):
            want = oracle_nms(boxes, scores, thresh)
            got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                      jnp.ones(n, bool), thresh))
            np.testing.assert_array_equal(got, want)


def test_nms_respects_validity_and_maxout(rng):
    n = 64
    boxes = rand_cluster_boxes(rng, n)
    scores = rng.uniform(0.01, 1, n).astype(np.float32)
    valid = rng.rand(n) > 0.3

    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(valid), 0.5))
    assert not np.any(got & ~valid)
    # oracle over the valid subset
    want_sub = oracle_nms(boxes[valid], scores[valid], 0.5)
    np.testing.assert_array_equal(got[valid], want_sub)

    got_capped = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                     jnp.asarray(valid), 0.5, max_out=3))
    assert got_capped.sum() <= 3
    # capped keep = top-3 scored among kept
    kept_scores = scores[got]
    top3 = np.sort(kept_scores)[::-1][:3]
    np.testing.assert_allclose(np.sort(scores[got_capped])[::-1], top3)


def test_batched_nms_isolates_categories(rng):
    # identical boxes in different categories must both survive
    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (2, 1))
    scores = np.array([0.9, 0.8], np.float32)
    idxs = np.array([0, 1], np.int32)
    keep = np.asarray(batched_nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                       jnp.ones(2, bool), jnp.asarray(idxs), 0.5))
    assert keep.all()


def test_nms_large_dense(rng):
    n = 500
    boxes = rand_cluster_boxes(rng, n)
    scores = rng.uniform(0.01, 1, n).astype(np.float32)
    want = oracle_nms(boxes, scores, 0.5)
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.ones(n, bool), 0.5))
    np.testing.assert_array_equal(got, want)


def test_fori_only_schedule_matches_oracle(rng):
    """The TPU round schedule (static rounds, no while epilogue) is exact
    on realistic suppression depths."""
    import siammot_tpu.core.nms as nms_core
    boxes = rand_cluster_boxes(rng, 400)
    scores = rng.rand(400).astype(np.float32)
    want = oracle_nms(boxes, scores, 0.5)
    saved = nms_core.DYNAMIC_EPILOGUE
    try:
        nms_core.DYNAMIC_EPILOGUE = False
        got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                  jnp.ones(400, bool), 0.5))
    finally:
        nms_core.DYNAMIC_EPILOGUE = saved
    np.testing.assert_array_equal(got, want)


def test_epilogue_exact_past_round_budget(rng):
    """A chain deeper than FORI_ROUNDS: the dynamic epilogue (CPU
    default) still reproduces serial greedy exactly."""
    import siammot_tpu.core.nms as nms_core
    n = nms_core.FORI_ROUNDS * 2 + 10
    # descending-score boxes, each overlapping only its neighbor ->
    # greedy keeps every even-indexed box via an n-deep decision chain
    x = np.arange(n, dtype=np.float32) * 6.0
    boxes = np.stack([x, np.zeros(n, np.float32),
                      x + 10.0, np.full(n, 10.0, np.float32)], -1)
    scores = np.linspace(1.0, 0.5, n).astype(np.float32)
    want = oracle_nms(boxes, scores, 0.25)
    assert want[::2].all() and not want[1::2].any()
    got = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.ones(n, bool), 0.25))
    np.testing.assert_array_equal(got, want)


def test_presorted_matches_sorted_path(rng):
    """presorted=True (the RPN fast path: skip argsort+gathers) is
    bitwise-identical to the sorting path on descending-score inputs with
    interspersed invalid rows, score ties, and a max_out cap."""
    for trial in range(20):
        n = 200
        scores = np.sort(rng.rand(n).astype(np.float32))[::-1].copy()
        scores[10:14] = scores[10]                     # ties
        boxes = rng.rand(n, 4).astype(np.float32) * 100
        boxes[:, 2:] = boxes[:, :2] + 5 + rng.rand(n, 2).astype(
            np.float32) * 40
        valid = rng.rand(n) > 0.2                      # interspersed dead
        a = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                jnp.asarray(valid), 0.7, max_out=50))
        b = np.asarray(nms_mask(jnp.asarray(boxes), jnp.asarray(scores),
                                jnp.asarray(valid), 0.7, max_out=50,
                                presorted=True))
        np.testing.assert_array_equal(a, b, err_msg=str(trial))
