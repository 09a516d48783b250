"""Hand-pinned unit checks of the torch replica (the parity oracle).

The golden-parity suite proves model == replica; these tests pin the
REPLICA itself against values computed by hand from the reference's
equations, so a shared misreading of the reference cannot silently pass
golden parity.  Every expected number below is derived in a comment
directly from the cited reference lines — no framework code participates
in the expectation.

Reference equations pinned here:
  * solver score bands / +1 active boost / sequential -2/-1 subtraction,
    start/suspend/resume/expire transitions
    (/root/reference/siammot/modelling/track_head/track_solver.py:22-108)
  * EMM response decode: scale penalty exp((1-sw*sh)*0.1), periodic Hann
    cosine window, (1-sigma)/sigma blend, argmax, tlbr -> box
    (/root/reference/siammot/modelling/track_head/EMM/track_core.py:101-135)
  * search-region location grid and border crop
    (/root/reference/siammot/modelling/track_head/EMM/track_core.py:137-163)
  * search-region expansion (track_utils.py extend_bbox)
"""

import math
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.dirname(__file__))

from torch_replica.rcnn import EMM, TrackPool, TrackSolver

from siammot_tpu.configs.defaults import get_cfg


def _box(x1, y1, x2, y2):
    return [float(x1), float(y1), float(x2), float(y2)]


def _det(boxes, scores, ids):
    return dict(boxes=torch.tensor(boxes, dtype=torch.float32),
                scores=torch.tensor(scores, dtype=torch.float32),
                ids=torch.tensor(ids, dtype=torch.long),
                labels=torch.zeros(len(boxes), dtype=torch.long))


def test_solver_start_suspend_resume_expire_hand_pinned():
    """Four scripted frames; every transition and output value derived by
    hand from track_solver.py."""
    pool = TrackPool(max_dormant_frames=2)
    solver = TrackSolver(pool, track_thresh=0.4, start_thresh=0.6,
                         resume_thresh=0.4)

    # -- frame 0: two far-apart detections (ids -1), scores 0.7 / 0.55.
    # No active tracks -> no boost.  Scores < 1 -> band subtraction is a
    # no-op.  start iff score >= 0.6: only the 0.7 starts (gets id 0);
    # the 0.55 keeps id -1.  (solver lines: start_idxs = ids<0 &
    # score>=start_thresh; first started id = max_id+1 = 0)
    out = solver(_det([_box(0, 0, 10, 10), _box(50, 50, 60, 60)],
                      [0.7, 0.55], [-1, -1]))
    assert out["ids"].tolist() == [0, -1]
    np.testing.assert_allclose(out["scores"].numpy(), [0.7, 0.55])
    assert pool.active == {0} and pool.dormant == {}
    assert pool.frame_idx == 1

    # -- frame 1: the propagated track id0 arrives with combined score
    # 1.3 (refine average of det-score and emm-conf+1, roi_heads.py:67-77),
    # plus a fresh far-away detection at 0.65.
    # Active boost: 1.3 + 1 = 2.3.  Bands: 2.3 >= 2 -> 0.3 (the second
    # rule 0.3 >= 1 is then false).  0.3 < track_thresh 0.4 -> id0 is
    # SUSPENDED and its output id is -1 (solver line: _ids[inactive]=-1).
    # The detection: 0.65 >= 0.6 -> starts as id 1.
    out = solver(_det([_box(0, 0, 10, 10), _box(50, 50, 60, 60)],
                      [1.3, 0.65], [0, -1]))
    assert out["ids"].tolist() == [-1, 1]
    np.testing.assert_allclose(out["scores"].numpy(), [0.3, 0.65],
                               atol=1e-6)
    assert pool.active == {1}
    assert set(pool.dormant) == {0}
    # suspend records the pool clock MINUS ONE as the last live frame
    # (track_utils.py:164, _frame_idx - 1; the clock increments at the
    # END of each solver call, so during frame 1's call it still reads 1)
    assert pool.dormant[0] == 0

    # -- frame 2: dormant id0 is propagated and comes back clear of
    # overlap with combined 0.45.  NO boost (only active ids get +1);
    # 0.45 < 1 -> bands no-op; 0.45 >= resume_thresh 0.4 -> RESUME with
    # the SAME id.  Active id1 arrives at combined 1.45 -> boosted 2.45
    # -> band 0.45 >= track_thresh -> stays.  A duplicate detection
    # (id -1, score 0.9) sits exactly on id1's box: NMS at IoU 0.5 keeps
    # the boosted 2.45 row and removes the 0.9 row (it is a detection,
    # not an active id, so nothing is suspended by its removal).  NMS
    # emits keep order = boosted-score-descending: id1 (2.45) first.
    out = solver(_det([_box(0, 0, 10, 10), _box(50, 50, 60, 60),
                       _box(50, 50, 60, 60)],
                      [0.45, 1.45, 0.9], [0, 1, -1]))
    assert out["ids"].tolist() == [1, 0]          # duplicate removed
    np.testing.assert_allclose(out["scores"].numpy(), [0.45, 0.45],
                               atol=1e-6)
    assert pool.active == {0, 1} and pool.dormant == {}

    # -- frame 3: id0 vanishes mid-frame via NMS: its propagated box
    # lands ON id1's box with a lower boosted score (1.2+1=2.2 < 1.6+1
    # = 2.6).  NMS removes the id0 row entirely; removed-but-active ids
    # are suspended (solver: nms_removed_ids).
    out = solver(_det([_box(50, 50, 60, 60), _box(50, 50, 60, 60)],
                      [1.2, 1.6], [0, 1]))
    assert out["ids"].tolist() == [1]
    assert pool.active == {1} and set(pool.dormant) == {0}
    assert pool.dormant[0] == 2      # clock reads 3 during this call

    # -- frames 4, 5: id0 never reappears.  expire_tracks drops a dormant
    # id when clock - last_frame >= max_dormant (=2), checked BEFORE the
    # end-of-call increment: during frame 4's call the clock reads 4,
    # 4 - 2 >= 2 -> expired.
    out = solver(_det([_box(50, 50, 60, 60)], [1.5], [1]))
    assert pool.dormant == {}, "id0 should be expired"
    # a new start must take a FRESH id (2), never reuse 0
    out = solver(_det([_box(50, 50, 60, 60), _box(0, 0, 10, 10)],
                      [1.5, 0.95], [1, -1]))
    assert sorted(out["ids"].tolist()) == [1, 2]


def _bare_emm(sigma, use_centerness, resolution=15, pad_pixels=512):
    cfg = get_cfg()
    emm = EMM(cfg)
    emm.sigma = sigma
    emm.use_centerness = use_centerness
    emm.resolution = resolution
    emm.pad_pixels = pad_pixels
    return emm


def test_emm_decode_hand_pinned():
    """decode_response on a 3x3 response, every number hand-derived from
    track_core.py:101-135.

    Template box [10, 20, 30, 60]: box_w = 20, box_h = 40.
    tlbr regressions (rows below are [l, t, r, b]):
      cell 4 (center): l=5, t=10, r=15, b=30  -> r_w = 5+15 = 20,
        r_h = 10+30 = 40 -> sw = 20/20 = 1, sh = 40/40 = 1 ->
        max(s,1/s) = 1 -> penalty = exp((1 - 1*1)*0.1) = exp(0) = 1.
      cell 0 (corner): l=15, t=30, r=15, b=30 -> r_w = 30, r_h = 60 ->
        sw = sh = 1.5 -> penalty = exp((1 - 2.25)*0.1) = exp(-0.125)
        = 0.8824969...
      all other cells: tiny boxes l=t=r=b=1 -> r_w = 2, r_h = 2 ->
        sw = max(0.1, 10) = 10, sh = max(0.05, 20) = 20 -> penalty =
        exp((1 - 200)*0.1) = exp(-19.9) ~ 2.3e-9 (their window term
        alone, 0.4*0.5625 = 0.225, cannot beat the cells below).
    cls softmax probs: cell 0 has logit pair (0, 3) -> p1 = e^3/(1+e^3)
      = 0.9525741...; cell 4 has (0, 1) -> p1 = e/(1+e) = 0.7310586;
      others (0, -5) -> p1 = 0.0066929.
    periodic Hann, side 3: w[k] = 0.5*(1 - cos(2*pi*k/3)) = [0, 0.75,
      0.75]; outer product -> window[0] = 0, window[4] = 0.5625.
    sigma = 0.4:
      p_conf[0] = 0.9525741*0.8824969*0.6 + 0.4*0      = 0.5043856
      p_conf[4] = 0.7310586*1.0*0.6       + 0.4*0.5625 = 0.6636352
    -> argmax = cell 4 (the corner's higher raw score is beaten by
    penalty+window).  Location grid is scripted: cell 4 at (100, 200).
    Output box = [100-5, 200-10, 100+15, 200+30] = [95, 190, 115, 230];
    returned conf is the RAW prob at the argmax = 0.7310586 (track_core
    returns cls prob, not the penalized score).
    """
    emm = _bare_emm(sigma=0.4, use_centerness=False)

    cls_l = torch.full((1, 2, 3, 3), 0.0)
    cls_l[0, 1] = -5.0
    cls_l[0, 1, 0, 0] = 3.0
    cls_l[0, 1, 1, 1] = 1.0
    ctr_l = torch.zeros((1, 1, 3, 3))

    reg = torch.ones((1, 4, 3, 3))
    reg[0, :, 0, 0] = torch.tensor([15.0, 30.0, 15.0, 30.0])
    reg[0, :, 1, 1] = torch.tensor([5.0, 10.0, 15.0, 30.0])

    locations = torch.zeros((1, 9, 2))
    locations[0, :, 0] = torch.arange(9, dtype=torch.float32) * 10 + 60
    locations[0, :, 1] = torch.arange(9, dtype=torch.float32) * 10 + 160
    # cell 4 -> (100, 200)
    boxes = torch.tensor([[10.0, 20.0, 30.0, 60.0]])

    out, conf = emm.decode_response(cls_l, ctr_l, reg, locations, boxes)
    np.testing.assert_allclose(out.numpy(), [[95.0, 190.0, 115.0, 230.0]],
                               atol=1e-4)
    p4 = math.e / (1 + math.e)                    # 0.7310585786300049
    np.testing.assert_allclose(conf.numpy(), [p4], atol=1e-6)

    # with sigma = 0 (no window) the corner wins on raw*penalty alone:
    # 0.9525741*0.8824969 = 0.8406437 > 0.7310586.  Corner cell 0 sits
    # at (60, 160), tlbr (15, 30, 15, 30) -> box [45, 130, 75, 190].
    emm0 = _bare_emm(sigma=0.0, use_centerness=False)
    out0, conf0 = emm0.decode_response(cls_l, ctr_l, reg, locations, boxes)
    p0 = math.exp(3) / (1 + math.exp(3))
    np.testing.assert_allclose(out0.numpy(), [[45.0, 130.0, 75.0, 190.0]],
                               atol=1e-4)
    np.testing.assert_allclose(conf0.numpy(), [p0], atol=1e-6)
    # and the pinned penalty arithmetic itself
    assert abs(math.exp(-0.125) - 0.8824969025845955) < 1e-12


def test_emm_decode_centerness_hand_pinned():
    """use_centerness multiplies the cls prob by sigmoid(ctr) BEFORE the
    penalty/window blend but the returned conf stays the raw cls prob.
    Same response as the previous test but cell 4's centerness is killed
    (ctr logit -3) while cell 0's is boosted (+3); sigma = 0:
      blend[4] = 0.7310586 * sigmoid(-3) * 1.0
               = 0.7310586 * 0.0474259 * 1.0       = 0.0346690
      blend[0] = 0.9525741 * sigmoid(3) * 0.8824969
               = 0.9525741 * 0.9525741 * 0.8824969 = 0.8008268
    -> argmax flips to cell 0; returned conf is the RAW softmax prob
    0.9525741 (centerness does not leak into the confidence)."""
    emm = _bare_emm(sigma=0.0, use_centerness=True)

    cls_l = torch.full((1, 2, 3, 3), 0.0)
    cls_l[0, 1] = -5.0
    cls_l[0, 1, 0, 0] = 3.0
    cls_l[0, 1, 1, 1] = 1.0
    ctr_l = torch.full((1, 1, 3, 3), -20.0)
    ctr_l[0, 0, 0, 0] = 3.0
    ctr_l[0, 0, 1, 1] = -3.0

    reg = torch.ones((1, 4, 3, 3))
    reg[0, :, 0, 0] = torch.tensor([15.0, 30.0, 15.0, 30.0])
    reg[0, :, 1, 1] = torch.tensor([5.0, 10.0, 15.0, 30.0])

    locations = torch.zeros((1, 9, 2))
    locations[0, :, 0] = torch.arange(9, dtype=torch.float32) * 10 + 60
    locations[0, :, 1] = torch.arange(9, dtype=torch.float32) * 10 + 160
    boxes = torch.tensor([[10.0, 20.0, 30.0, 60.0]])

    out, conf = emm.decode_response(cls_l, ctr_l, reg, locations, boxes)
    np.testing.assert_allclose(out.numpy(), [[45.0, 130.0, 75.0, 190.0]],
                               atol=1e-4)
    p0 = math.exp(3) / (1 + math.exp(3))
    np.testing.assert_allclose(conf.numpy(), [p0], atol=1e-6)


def test_get_locations_hand_pinned():
    """Location grid arithmetic (track_core.py:137-163) by hand:
    sr = [0, 0, 160, 160] (already padded coords), up grid 6x6,
    up_scale 1, resolution 2 -> border = floor(2/2)*1 = 1, keeping
    indices 1..4.  stride = 160/(6-1) = 32 -> xs = ys = [32, 64, 96,
    128]; minus pad_pixels 512 -> [-480, -448, -416, -384].
    Row-major over the cropped 4x4 grid (y outer, x inner):
    location[0] = (-480, -480), location[1] = (-448, -480),
    location[5] = (row 1, col 1) = (-448, -448)."""
    emm = _bare_emm(sigma=0.4, use_centerness=True, resolution=2,
                    pad_pixels=512)
    sr = torch.tensor([[0.0, 0.0, 160.0, 160.0]])
    loc = emm.get_locations(sr, up_hw=6, up_scale=1)
    assert loc.shape == (1, 16, 2)
    np.testing.assert_allclose(loc[0, 0].numpy(), [-480.0, -480.0])
    np.testing.assert_allclose(loc[0, 1].numpy(), [-448.0, -480.0])
    np.testing.assert_allclose(loc[0, 5].numpy(), [-448.0, -448.0])
    np.testing.assert_allclose(loc[0, 6].numpy(), [-416.0, -448.0])
    np.testing.assert_allclose(loc[0, 15].numpy(), [-384.0, -384.0])


def test_extend_bbox_hand_pinned():
    """Search-region expansion (track_utils.py): w_ext = max(w*(r-1)/2,
    (min_wh - w)/(2*(r-1))) with r = SEARCH_REGION = 2, min_wh = 0.
    Box [100, 100, 140, 120] (+1 convention): w = 41, h = 21 ->
    w_ext = 20.5, h_ext = 10.5 -> [79.5, 89.5, 160.5, 130.5]."""
    emm = _bare_emm(sigma=0.4, use_centerness=True)
    assert emm.search_expansion == 1.0 and emm.min_search_wh == 0
    out = emm.extend_bbox(torch.tensor([[100.0, 100.0, 140.0, 120.0]]))
    np.testing.assert_allclose(out.numpy(),
                               [[79.5, 89.5, 160.5, 130.5]])
