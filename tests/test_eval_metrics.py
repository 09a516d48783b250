"""CLEAR-MOT / IDF1 / detection-AP evaluation semantics."""

import numpy as np

from siammot_tpu.data.motion_dataset import AnnoEntity, DataSample
from siammot_tpu.eval.clearmot import MOTAccumulator, eval_clears_mot, \
    iou_distance_matrix
from siammot_tpu.eval.det_ap import eval_det_ap


def _sample(sid, tracks, n_frames, w=100, h=100, fps=10.0):
    """tracks: {id: offset} — each a 10x20 box sliding right 2px/frame."""
    s = DataSample(sid, metadata=dict(fps=fps, number_of_frames=n_frames,
                                      resolution={"width": w, "height": h}))
    for f in range(n_frames):
        for tid, off in tracks.items():
            e = AnnoEntity(time=f * 1000.0 / fps, id=tid)
            e.bbox = [off + 2 * f, 10 + 10 * tid, 10, 20]
            e.labels = {"person": 1.0}
            e.confidence = 1.0
            e.blob = {"frame_idx": f}
            s.add_entity(e)
    return s


def test_perfect_tracking_mota_one():
    gt = _sample("v", {0: 5, 1: 40}, 10)
    pred = _sample("v", {0: 5, 1: 40}, 10)
    accs, summary = eval_clears_mot([("v", gt)], {"v": pred})
    acc = accs["v"]
    assert acc.num_misses == 0 and acc.num_fp == 0 and acc.num_switches == 0
    m = acc.summary()
    assert abs(m["mota"] - 1.0) < 1e-9
    assert abs(m["idf1"] - 1.0) < 1e-9
    assert "MOTA" in summary or "mota" in summary


def test_missed_track_counts():
    gt = _sample("v", {0: 5, 1: 40}, 10)
    pred = _sample("v", {0: 5}, 10)           # track 1 never predicted
    accs, _ = eval_clears_mot([("v", gt)], {"v": pred})
    acc = accs["v"]
    assert acc.num_misses == 10
    m = acc.summary()
    assert abs(m["mota"] - 0.5) < 1e-9        # 10 misses / 20 gt


def test_id_switch_detected():
    gt = _sample("v", {0: 5}, 10)
    pred = _sample("v", {0: 5}, 10)
    # flip the predicted id halfway -> exactly one switch
    for e in pred.entities:
        if e.blob["frame_idx"] >= 5:
            e.id = 7
    accs, _ = eval_clears_mot([("v", gt)], {"v": pred})
    assert accs["v"].num_switches == 1
    m = accs["v"].summary()
    # IDF1 pays for the split trajectory even though MOTA barely moves
    assert m["idf1"] < 1.0 and m["mota"] < 1.0


def test_continuation_beats_hungarian():
    """A previous match within the gate is kept even when another pred is
    closer (motmetrics MOTAccumulator continuation rule)."""
    acc = MOTAccumulator()
    d0 = iou_distance_matrix([[0, 0, 10, 10]], [[0, 0, 10, 10],
                                                [6, 0, 10, 10]], 0.5)
    acc.update([1], [10, 11], d0)
    # frame 2: pred 11 now overlaps better, but 10 is still in gate
    d1 = iou_distance_matrix([[2, 0, 10, 10]], [[4, 0, 10, 10],
                                                [2, 0, 10, 10]], 0.5)
    acc.update([1], [10, 11], d1)
    assert acc.num_switches == 0
    assert acc.last_match[1] == 10


def test_det_ap_perfect_is_one():
    gt = _sample("v", {0: 5, 1: 40}, 5)
    pred = _sample("v", {0: 5, 1: 40}, 5)
    ap = eval_det_ap([("v", gt)], {"v": pred})
    assert np.asarray(ap).shape[-1] == 10     # IoU .5:.95
    assert float(np.mean(ap)) > 0.99


def test_det_ap_false_positives_lower():
    gt = _sample("v", {0: 5}, 5)
    pred = _sample("v", {0: 5, 1: 60}, 5)     # an extra spurious track
    ap = eval_det_ap([("v", gt)], {"v": pred})
    assert float(np.mean(ap)) < 0.99
