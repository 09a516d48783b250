"""Padded detection/track containers.

The reference passes dynamically-sized ``BoxList`` objects between every
stage (maskrcnn ``structures/bounding_box.py``).  The TPU design replaces
them with fixed-capacity pytrees: a ``Boxes`` batch is a padded ``[N, 4]``
array plus per-row fields and a validity mask, so every stage compiles to
static shapes and whole-frame steps can run under ``jax.jit`` /
``lax.scan`` with zero host round-trips (SURVEY.md §7).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp


@flax.struct.dataclass
class Boxes:
    """A padded set of boxes with the fields the reference tracks.

    ids semantics follow the reference: -1 = plain detection, >= 0 = track
    instance id (``box_head/inference.py:91-94``); padding rows have
    ``valid == False``.
    """

    boxes: jnp.ndarray     # [N, 4] xyxy, float32
    scores: jnp.ndarray    # [N] float32
    ids: jnp.ndarray       # [N] int32
    labels: jnp.ndarray    # [N] int32
    valid: jnp.ndarray     # [N] bool

    @property
    def capacity(self) -> int:
        return self.boxes.shape[0]

    @staticmethod
    def empty(capacity: int) -> "Boxes":
        return Boxes(
            boxes=jnp.zeros((capacity, 4), jnp.float32),
            scores=jnp.zeros((capacity,), jnp.float32),
            ids=jnp.full((capacity,), -1, jnp.int32),
            labels=jnp.zeros((capacity,), jnp.int32),
            valid=jnp.zeros((capacity,), bool),
        )


def concat_boxes(a: Boxes, b: Boxes) -> Boxes:
    """Concatenate two padded sets (capacity = sum of capacities)."""
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y]), a, b)


def topk_boxes(d: Boxes, k: int) -> Boxes:
    """Keep the k highest-scored valid rows (shrinks capacity to k)."""
    masked = jnp.where(d.valid, d.scores, -jnp.inf)
    _, idx = jax.lax.top_k(masked, k)
    return jax.tree.map(lambda x: x[idx], d)
