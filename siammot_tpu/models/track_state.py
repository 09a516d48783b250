"""On-device track state: the reference's TrackPool + track memory as a
fixed-capacity pytree.

The reference keeps tracking state in Python-object soup — ``TrackPool``
id sets/dicts plus a per-track tensor cache
(``/root/reference/siammot/modelling/track_head/track_utils.py:138-255``)
and the ``track_memory`` tuple carried across frames (``rcnn.py:32-57``,
``track_head.py:54-97``) — with ``.item()`` host syncs in every frame.

Here the whole thing is one pytree of K padded slots so the per-frame
recurrence (detect → propagate → solve → update memory) compiles into a
single XLA program and can be ``lax.scan``-ned over frames:

  slot occupied   <=> ids[k] >= 0
  active slot     <=> occupied & active[k]
  dormant slot    <=> occupied & ~active[k]   (kept for MAX_DORMANT_FRAMES)

The per-slot cache (template features / search region / box) IS the slot
array; dormant slots keep the cache from their last active frame exactly
like ``TrackPool.update_cache`` + ``_update_memory_with_dormant_track``.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from ..core.structures import Boxes


@flax.struct.dataclass
class TrackState:
    template: jnp.ndarray     # [K, T, T, C] cached template features
    boxes: jnp.ndarray        # [K, 4] last known box (input-image coords)
    sr: jnp.ndarray           # [K, 4] search region (padded coords)
    ids: jnp.ndarray          # [K] int32; -1 = free slot
    labels: jnp.ndarray       # [K] int32
    active: jnp.ndarray       # [K] bool
    last_active: jnp.ndarray  # [K] int32 frame index (dormant expiry clock)
    next_id: jnp.ndarray      # [] int32
    frame_idx: jnp.ndarray    # [] int32

    @property
    def capacity(self) -> int:
        return self.ids.shape[0]

    @property
    def occupied(self) -> jnp.ndarray:
        return self.ids >= 0

    @staticmethod
    def empty(capacity: int, template_size: int, channels: int) -> "TrackState":
        return TrackState(
            template=jnp.zeros((capacity, template_size, template_size,
                                channels), jnp.float32),
            boxes=jnp.zeros((capacity, 4), jnp.float32),
            sr=jnp.zeros((capacity, 4), jnp.float32),
            ids=jnp.full((capacity,), -1, jnp.int32),
            labels=jnp.zeros((capacity,), jnp.int32),
            active=jnp.zeros((capacity,), bool),
            last_active=jnp.zeros((capacity,), jnp.int32),
            next_id=jnp.asarray(0, jnp.int32),
            frame_idx=jnp.asarray(0, jnp.int32),
        )


def rows_to_slots(row_ids: jnp.ndarray, row_valid: jnp.ndarray,
                  state: TrackState):
    """Join solver rows to state slots by track id.

    Returns (slot_index [M] int32, has_slot [M] bool).
    """
    eq = (row_ids[:, None] == state.ids[None, :]) & \
        state.occupied[None, :] & row_valid[:, None] & (row_ids >= 0)[:, None]
    has = jnp.any(eq, axis=1)
    slot = jnp.argmax(eq, axis=1).astype(jnp.int32)
    return slot, has


def rebuild_state(state: TrackState, out: Boxes, row_active: jnp.ndarray,
                  fresh_template: jnp.ndarray, fresh_sr: jnp.ndarray,
                  keep_dormant: jnp.ndarray, next_id, frame_idx) -> TrackState:
    """Assemble the next frame's TrackState.

    Args:
      out: solver output rows compacted to [K] (the active-track candidates,
        highest score first; invalid rows padded).
      row_active: [K] bool — rows that are active tracks after the solver.
      fresh_template / fresh_sr: [K, T, T, C] / [K, 4] extracted at ``out``
        boxes this frame (matching ``extract_cache`` reference semantics).
      keep_dormant: [K] bool over *old* slots — dormant entries that
        survive (not resumed, not expired).

    Active rows take priority; surviving dormant slots fill the remainder
    (newest-suspension first) — the reference never drops dormant tracks,
    but its cache is unbounded; with K slots an overflow drops the oldest
    dormant entries.
    """
    k = state.capacity

    cand_valid = jnp.concatenate([row_active, keep_dormant])
    # priority: actives first (by position = score order), then dormant by
    # recency of suspension
    pri_active = jnp.arange(k, dtype=jnp.float32)
    pri_dormant = 2.0 * k + (frame_idx - state.last_active).astype(jnp.float32)
    priority = jnp.concatenate([pri_active, pri_dormant])
    priority = jnp.where(cand_valid, priority, jnp.inf)
    order = jnp.argsort(priority)[:k]
    valid = cand_valid[order]

    def sel(fresh, old):
        both = jnp.concatenate([fresh, old], axis=0)
        return jnp.where(
            valid.reshape((k,) + (1,) * (both.ndim - 1)), both[order],
            jnp.zeros_like(both[order]))

    ids = jnp.where(valid, jnp.concatenate([out.ids, state.ids])[order], -1)
    return TrackState(
        template=sel(fresh_template, state.template),
        boxes=sel(out.boxes, state.boxes),
        sr=sel(fresh_sr, state.sr),
        ids=ids.astype(jnp.int32),
        labels=sel(out.labels, state.labels).astype(jnp.int32),
        active=jnp.where(valid, jnp.concatenate(
            [jnp.ones(k, bool), jnp.zeros(k, bool)])[order], False),
        last_active=sel(jnp.full((k,), frame_idx, jnp.int32),
                        state.last_active).astype(jnp.int32),
        next_id=next_id,
        frame_idx=frame_idx + 1,
    )
