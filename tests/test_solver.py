"""Track solver + TrackState transition tests against the reference state
machine semantics (track_solver.py / track_utils.py TrackPool)."""

import pytest
import numpy as np
import jax.numpy as jnp

from siammot_tpu.core.structures import Boxes
from siammot_tpu.models.track_state import TrackState, rebuild_state
from siammot_tpu.models.track_solver import SolverConfig, solve

K = 8
SCFG = SolverConfig(track_thresh=0.4, start_thresh=0.6, resume_thresh=0.4,
                    max_dormant_frames=3)


def mk_state():
    return TrackState.empty(K, 3, 2)


def mk_rows(boxes, scores, ids, valid=None):
    n = len(boxes)
    pad = K + 4 - n
    boxes = np.asarray(boxes, np.float32)
    boxes = np.concatenate([boxes, np.zeros((pad, 4), np.float32)])
    scores = np.concatenate([np.asarray(scores, np.float32), np.zeros(pad)])
    ids = np.concatenate([np.asarray(ids, np.int32),
                          np.full(pad, -1, np.int32)])
    v = np.concatenate([np.ones(n, bool) if valid is None
                        else np.asarray(valid, bool), np.zeros(pad, bool)])
    return Boxes(boxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
                 ids=jnp.asarray(ids.astype(np.int32)),
                 labels=jnp.ones(K + 4, jnp.int32), valid=jnp.asarray(v))


def step(state, rows):
    out, row_active, upd = solve(state, rows, SCFG)
    import jax
    pri = jnp.where(row_active, out.scores, -jnp.inf)
    _, top = jax.lax.top_k(pri, K)
    act = jax.tree.map(lambda x: x[top], out)
    act = act.replace(valid=row_active[top])
    fresh_t = jnp.zeros((K, 3, 3, 2), jnp.float32)
    fresh_sr = act.boxes + 1.0
    new_state = rebuild_state(
        state.replace(active=upd["active_after"],
                      last_active=upd["last_active"],
                      ids=jnp.where(upd["expired"], -1, state.ids)),
        act, act.valid, fresh_t, fresh_sr, upd["keep_dormant"],
        upd["next_id"], state.frame_idx)
    return out, new_state


def occupied_ids(state):
    ids = np.asarray(state.ids)
    return sorted(ids[ids >= 0].tolist())


def active_ids(state):
    ids, act = np.asarray(state.ids), np.asarray(state.active)
    return sorted(ids[(ids >= 0) & act].tolist())


@pytest.mark.slow
def test_start_new_tracks():
    state = mk_state()
    rows = mk_rows([[0, 0, 20, 20], [100, 100, 130, 130], [200, 0, 220, 30]],
                   [0.9, 0.7, 0.3], [-1, -1, -1])
    out, state = step(state, rows)
    # two detections above START_TRACK_THRESH get ids 0,1; third stays -1
    out_ids = np.asarray(out.ids)[np.asarray(out.valid)]
    assert set(out_ids.tolist()) == {0, 1, -1}
    assert active_ids(state) == [0, 1]
    assert int(state.next_id) == 2
    assert int(state.frame_idx) == 1


def test_suspend_and_resume():
    state = mk_state()
    rows = mk_rows([[0, 0, 20, 20]], [0.9], [-1])
    _, state = step(state, rows)
    assert active_ids(state) == [0]

    # frame 2: track row propagated with low score -> suspended, id -> -1
    rows = mk_rows([[0, 0, 20, 20]], [1.2], [0])  # track score in (1,2]
    out, state = step(state, rows)
    assert active_ids(state) == []
    assert occupied_ids(state) == [0]  # dormant, cache kept
    out_ids = np.asarray(out.ids)[np.asarray(out.valid)]
    assert (out_ids == -1).all()

    # frame 3: dormant propagated with good score -> resumed
    rows = mk_rows([[0, 0, 20, 20]], [1.8], [0])
    out, state = step(state, rows)
    assert active_ids(state) == [0]
    out_ids = np.asarray(out.ids)[np.asarray(out.valid)]
    assert 0 in out_ids.tolist()


def test_dormant_expiry():
    state = mk_state()
    _, state = step(state, mk_rows([[0, 0, 20, 20]], [0.9], [-1]))
    # suspend at frame 1
    _, state = step(state, mk_rows([[0, 0, 20, 20]], [1.2], [0]))
    assert occupied_ids(state) == [0]
    # keep dormant (propagated below resume thresh) until expiry at
    # frame_idx - last_active >= 3 (suspended at frame 1, last_active=0)
    _, state = step(state, mk_rows([[0, 0, 20, 20]], [1.1], [0]))
    assert occupied_ids(state) == [0]
    _, state = step(state, mk_rows([[0, 0, 20, 20]], [1.1], [0]))
    assert occupied_ids(state) == []  # expired and freed


def test_nms_merges_dormant_into_active():
    """An active track suppresses an overlapping dormant in the NMS
    (score bands: active (2,3] > dormant (1,2])."""
    state = mk_state()
    _, state = step(state, mk_rows(
        [[0, 0, 20, 20], [100, 0, 120, 20]], [0.9, 0.8], [-1, -1]))
    # suspend id 1
    _, state = step(state, mk_rows(
        [[0, 0, 20, 20], [100, 0, 120, 20]], [1.9, 1.1], [0, 1]))
    assert active_ids(state) == [0]
    assert occupied_ids(state) == [0, 1]
    # dormant id=1 propagates onto the same box as active id=0
    out, state = step(state, mk_rows(
        [[0, 0, 20, 20], [0, 0, 20, 20]], [1.9, 1.95], [0, 1]))
    out_ids = np.asarray(out.ids)[np.asarray(out.valid)]
    assert 0 in out_ids.tolist() and 1 not in out_ids.tolist()


def test_detection_overlapping_active_track_is_suppressed():
    state = mk_state()
    _, state = step(state, mk_rows([[0, 0, 20, 20]], [0.9], [-1]))
    out, state = step(state, mk_rows(
        [[1, 1, 21, 21], [0, 0, 20, 20]], [0.99, 1.5], [-1, 0]))
    kept = np.asarray(out.valid)
    ids = np.asarray(out.ids)
    # the track row survives; the overlapping detection is NMS-suppressed
    assert kept.sum() == 1 and ids[kept][0] == 0
    assert int(state.next_id) == 1  # no new track started


def test_track_missing_from_rows_is_suspended():
    state = mk_state()
    _, state = step(state, mk_rows([[0, 0, 20, 20]], [0.9], [-1]))
    # next frame: the track id never appears among rows (e.g. invalid box).
    rows = mk_rows([[50, 50, 70, 70]], [0.2], [-1])
    _, state = step(state, rows)
    # the slot survives as dormant with its cache
    assert occupied_ids(state) == [0]
    assert active_ids(state) == []


def test_new_ids_assigned_in_score_order():
    """The reference assigns fresh track ids over the NMS-kept boxlist,
    which is score-DESCENDING (track_solver.py:96-97 after boxlist_nms) —
    not input-row order."""
    st = mk_state()
    rows = mk_rows([[10, 10, 30, 30], [60, 60, 90, 90], [110, 10, 140, 40]],
                   [0.7, 0.95, 0.8], [-1, -1, -1])
    out, _ = step(st, rows)
    ids = np.asarray(out.ids)[:3].tolist()
    # highest score starts first: row1 -> 0, row2 -> 1, row0 -> 2
    assert ids == [2, 0, 1]
