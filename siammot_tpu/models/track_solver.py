"""Online track solver as a pure function.

Masked-array re-implementation of the reference's non-learned solver
(``/root/reference/siammot/modelling/track_head/track_solver.py:7-115``)
that merges detections (score in (0,1), id < 0) with propagated tracks
(score in (1,2], id >= 0):

  1. active tracks get +1 (-> (2,3]) so NMS ranks active > dormant > det
     and dormant tracks merge into active ones when they overlap;
  2. one NMS(0.5) over everything; scores then shifted back into (0,1];
  3. transitions: start (id<0, score >= START_TRACK_THRESH), suspend
     (id >= 0 & score < TRACK_THRESH, or NMS-removed), resume dormant
     (score >= RESUME_TRACK_THRESH), expire dormant after
     MAX_DORMANT_FRAMES, frame++ — all as masked vector ops on the
     TrackState, no host round-trips.

Known deviation: the reference early-returns on an empty detection list
(``track_solver.py:47-51``) without expiring/advancing the frame clock;
the masked version always advances.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import jax

from ..core.nms import nms_mask
from ..core.structures import Boxes
from .track_state import TrackState, rows_to_slots


@flax.struct.dataclass
class SolverConfig:
    track_thresh: float
    start_thresh: float
    resume_thresh: float
    max_dormant_frames: int
    nms_thresh: float = 0.5

    @staticmethod
    def from_cfg(cfg) -> "SolverConfig":
        t = cfg.MODEL.TRACK_HEAD
        return SolverConfig(
            track_thresh=t.TRACK_THRESH,
            start_thresh=t.START_TRACK_THRESH,
            resume_thresh=t.RESUME_TRACK_THRESH,
            max_dormant_frames=t.MAX_DORMANT_FRAMES,
        )


def solve(state: TrackState, rows: Boxes, scfg: SolverConfig):
    """Merge detections + propagated tracks, run the id state machine.

    Args:
      state: current TrackState (pre-solve).
      rows: [M] padded union of detections and refined tracks.

    Returns:
      out: [M] Boxes — NMS survivors with final ids and (0,1] scores.
      row_is_active: [M] bool — rows that are active tracks after solve.
      upd: dict of state updates (active/last_active/killed masks on slots,
        new next_id) for ``rebuild_state``.
    """
    slot, has_slot = rows_to_slots(rows.ids, rows.valid, state)
    row_from_active = has_slot & state.active[slot]

    scores = rows.scores + row_from_active.astype(rows.scores.dtype)
    keep = nms_mask(rows.boxes, scores, rows.valid, scfg.nms_thresh)

    # shift scores back into (0, 1] (track_solver.py:33-36)
    adj = jnp.where(scores >= 2.0, scores - 2.0, scores)
    adj = jnp.where(adj >= 1.0, adj - 1.0, adj)

    is_det = rows.ids < 0
    start = keep & is_det & (adj >= scfg.start_thresh)
    # the reference assigns new ids over the NMS-kept boxlist, whose rows
    # are in score-DESCENDING order (track_solver.py:96-97 iterating
    # boxlist_nms output) — not input-row order
    m = rows.ids.shape[0]
    start_order = jnp.argsort(jnp.where(start, -adj, jnp.inf), stable=True)
    start_rank = jnp.zeros((m,), jnp.int32).at[start_order].set(
        jnp.arange(m, dtype=jnp.int32))
    new_ids = jnp.where(start, state.next_id + start_rank, rows.ids)
    next_id = state.next_id + jnp.sum(start.astype(jnp.int32))

    # rows that survive but fall below the track threshold lose their id
    low = keep & (rows.ids >= 0) & (adj < scfg.track_thresh)

    # slot-level views
    def slot_any(row_mask):
        eq = (rows.ids[:, None] == state.ids[None, :]) & \
            state.occupied[None, :] & (rows.ids >= 0)[:, None]
        return jnp.any(eq & row_mask[:, None], axis=0)

    kept_slot = slot_any(keep)
    low_slot = slot_any(low)

    # reference: suspend on low score or NMS removal; additionally a track
    # absent from the rows entirely (clipped away in non-amodal mode) is
    # suspended rather than leaked as forever-active (reference leaks it:
    # ``track_solver.py:88-93`` only sees ids present in the input)
    inactive_slot = state.active & (low_slot | ~kept_slot)
    resume_slot = state.occupied & ~state.active & \
        slot_any(keep & (adj >= scfg.resume_thresh))

    active_after = (state.active & ~inactive_slot) | resume_slot
    # suspension clock: suspended this frame -> last_active = frame - 1
    last_active = jnp.where(inactive_slot, state.frame_idx - 1,
                            state.last_active)
    # expire dormant (incl. just-suspended) whose clock ran out
    dormant = state.occupied & ~active_after
    expired = dormant & (state.frame_idx - last_active
                         >= scfg.max_dormant_frames)

    out = Boxes(boxes=rows.boxes,
                scores=adj,
                ids=jnp.where(low, -1, new_ids).astype(jnp.int32),
                labels=rows.labels,
                valid=keep)

    # a row is an active track going forward if it kept an id and its slot
    # is active after transitions, or it just started / resumed
    row_slot_after, row_has_after = rows_to_slots(out.ids, out.valid, state)
    row_is_active = out.valid & (out.ids >= 0) & (
        start | (row_has_after & active_after[row_slot_after]))

    upd = dict(active_after=active_after, last_active=last_active,
               expired=expired, next_id=next_id,
               keep_dormant=dormant & ~expired)
    return out, row_is_active, upd
