"""Track-aware box-head post-processing semantics
(reference ``box_head/inference.py:46-191``)."""

import jax.numpy as jnp
import numpy as np

from siammot_tpu.core.structures import Boxes
from siammot_tpu.models.box_head import BoxHeadConfig, postprocess


def _cfg(amodal=False):
    return BoxHeadConfig(score_thresh=0.05, nms_thresh=0.5, num_classes=2,
                         amodal=amodal, reg_weights=(10., 10., 5., 5.))


def _proposals(boxes, ids):
    n = len(boxes)
    return Boxes(boxes=jnp.asarray(np.asarray(boxes, np.float32)),
                 scores=jnp.ones((n,), jnp.float32),
                 ids=jnp.asarray(np.asarray(ids, np.int32)),
                 labels=jnp.ones((n,), jnp.int32),
                 valid=jnp.ones((n,), bool))


def test_track_rows_bypass_nms_and_get_boost():
    # two heavily-overlapping rows: a detection and a propagated track.
    # plain NMS would drop one; the track must survive with score > 1.
    props = _proposals([[10, 10, 50, 60], [11, 11, 51, 61]], [-1, 7])
    logits = jnp.asarray([[0.0, 2.0], [0.0, 1.0]], jnp.float32)
    deltas = jnp.zeros((2, 8), jnp.float32)

    out = postprocess(logits, deltas, props, (100, 100), _cfg())
    valid = np.asarray(out.valid)
    ids = np.asarray(out.ids)
    scores = np.asarray(out.scores)
    track_rows = valid & (ids == 7)
    assert track_rows.sum() == 1
    assert scores[track_rows][0] > 1.0          # +1 boost (inference.py:97)
    det_rows = valid & (ids == -1)
    assert det_rows.sum() == 1                  # detection survives too
    assert scores[det_rows][0] < 1.0


def test_detections_nms_each_other():
    props = _proposals([[10, 10, 50, 60], [11, 11, 51, 61]], [-1, -1])
    logits = jnp.asarray([[0.0, 2.0], [0.0, 1.0]], jnp.float32)
    deltas = jnp.zeros((2, 8), jnp.float32)
    out = postprocess(logits, deltas, props, (100, 100), _cfg())
    assert np.asarray(out.valid).sum() == 1     # lower-scored one suppressed


def test_score_threshold_filters():
    props = _proposals([[10, 10, 50, 60]], [-1])
    logits = jnp.asarray([[5.0, -5.0]], jnp.float32)   # bg-confident
    deltas = jnp.zeros((1, 8), jnp.float32)
    out = postprocess(logits, deltas, props, (100, 100), _cfg())
    assert np.asarray(out.valid).sum() == 0


def test_amodal_skips_clipping():
    # deltas push the box past the image edge
    props = _proposals([[60, 60, 99, 99]], [-1])
    logits = jnp.asarray([[0.0, 3.0]], jnp.float32)
    deltas = jnp.zeros((1, 8), jnp.float32)
    deltas = deltas.at[0, 4 + 2].set(5.0)  # class-1 dw: widen a lot

    clipped = postprocess(logits, deltas, props, (100, 100), _cfg(False))
    amodal = postprocess(logits, deltas, props, (100, 100), _cfg(True))
    cb = np.asarray(clipped.boxes)[np.asarray(clipped.valid)]
    ab = np.asarray(amodal.boxes)[np.asarray(amodal.valid)]
    assert cb[:, 2].max() <= 99.0
    assert ab[:, 2].max() > 99.0
