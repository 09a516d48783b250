"""TrackState rebuild: slot priority and dormant-overflow eviction."""

import jax.numpy as jnp
import numpy as np

from siammot_tpu.core.structures import Boxes
from siammot_tpu.models.track_state import TrackState, rebuild_state, \
    rows_to_slots


def _state(k=4, ids=(-1, -1, -1, -1), active=(0, 0, 0, 0),
           last_active=(0, 0, 0, 0), frame=5):
    return TrackState(
        template=jnp.zeros((k, 3, 3, 2)),
        boxes=jnp.arange(k * 4, dtype=jnp.float32).reshape(k, 4),
        sr=jnp.zeros((k, 4)),
        ids=jnp.asarray(np.asarray(ids, np.int32)),
        labels=jnp.ones((k,), jnp.int32),
        active=jnp.asarray(np.asarray(active, bool)),
        last_active=jnp.asarray(np.asarray(last_active, np.int32)),
        next_id=jnp.asarray(9, jnp.int32),
        frame_idx=jnp.asarray(frame, jnp.int32))


def _rows(k, ids, active_mask):
    return Boxes(boxes=jnp.ones((k, 4)) * 7.0,
                 scores=jnp.linspace(1.0, 0.5, k),
                 ids=jnp.asarray(np.asarray(ids, np.int32)),
                 labels=jnp.ones((k,), jnp.int32),
                 valid=jnp.asarray(np.asarray(active_mask, bool)))


def test_rows_to_slots_join():
    st = _state(ids=(3, 7, -1, -1))
    slot, has = rows_to_slots(jnp.asarray([7, 3, 5, -1], jnp.int32),
                              jnp.asarray([True, True, True, True]), st)
    np.testing.assert_array_equal(np.asarray(has), [True, True, False, False])
    assert int(slot[0]) == 1 and int(slot[1]) == 0


def test_dormant_overflow_drops_oldest():
    """With K slots and K actives + surviving dormants, the oldest-
    suspended dormant entries are evicted (the reference's TrackPool cache
    is unbounded; see rebuild_state docstring)."""
    k = 4
    # 3 dormant slots with different suspension ages
    st = _state(ids=(10, 11, 12, -1), active=(0, 0, 0, 0),
                last_active=(1, 3, 2, 0), frame=5)
    # 2 fresh active rows -> only 2 dormant slots can survive
    act = _rows(k, ids=(20, 21, -1, -1), active_mask=(1, 1, 0, 0))
    new = rebuild_state(st, act, act.valid,
                        jnp.zeros((k, 3, 3, 2)), jnp.zeros((k, 4)),
                        keep_dormant=jnp.asarray([True, True, True, False]),
                        next_id=jnp.asarray(22, jnp.int32),
                        frame_idx=st.frame_idx)
    ids = set(np.asarray(new.ids)[np.asarray(new.ids) >= 0].tolist())
    # actives kept; of dormants (suspended at 1, 3, 2) the most recent two
    # (11 @3, 12 @2) survive, the oldest (10 @1) is evicted
    assert ids == {20, 21, 11, 12}
    active_ids = set(np.asarray(new.ids)[np.asarray(new.active)].tolist())
    assert active_ids == {20, 21}
    assert int(new.frame_idx) == 6
