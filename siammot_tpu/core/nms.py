"""Fixed-shape greedy NMS.

Exact re-implementation of maskrcnn-benchmark's ``nms`` kernel semantics
(``csrc/nms.cu``: score-descending greedy suppression with the +1 IoU
convention, used via ``boxlist_nms`` in the reference's RPN patch
``rpn_patch.py:53-58``, box-head post-processing ``box_head/inference.py:174``
and track solver ``track_solver.py:22``) — but as a static-shape JAX
program over padded box sets.

Algorithm: instead of a serial N-step greedy scan, run a convergent
round-based fixed-point iteration.  Per round every box whose
higher-scored overlapping boxes are all decided becomes decided, and
boxes overlapping an already-kept box are killed.  Each round decides at
least the first undecided box, so the ``lax.while_loop`` terminates in at
most N rounds and in practice in a handful; each round is two [N]x[N,N]
mat-vec products that map onto the MXU.  The fixed point equals the
serial greedy result exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .boxes import box_iou

NEG_INF = -1e10

# Round schedule (module-level so profilers/tests can override):
# FORI_ROUNDS pipelined static rounds (cheap: the whole-body matmul
# round is ~5 us), then a data-dependent while epilogue for stragglers
# (exactness at any suppression-chain depth).  Real data converges in
# 3-11 rounds, so the epilogue usually sees one converged cond check.
# NOTE for profiling: a while_loop inside a lax.scan timing harness
# serializes scan iterations and wildly inflates per-iter slopes
# (measured 2.5 ms "cost" that does not exist in the real once-per-frame
# step); disable the epilogue when loop-amplifying, and trust only
# full-step deltas for while-bearing graphs.
FORI_ROUNDS = 16
DYNAMIC_EPILOGUE = True


def _use_epilogue() -> bool:
    return DYNAMIC_EPILOGUE


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float, max_out: int | None = None,
             presorted: bool = False) -> jnp.ndarray:
    """Greedy NMS over a padded box set.

    Args:
      boxes: [N, 4] xyxy.
      scores: [N] float.
      valid: [N] bool — padding mask; invalid boxes never kept.
      iou_threshold: suppression threshold (IoU > threshold suppresses).
      max_out: optionally keep only the top-k surviving boxes by score.
      presorted: the caller guarantees (scores masked by valid) are
        already descending with padding at the tail — true for any set
        coming straight out of ``lax.top_k`` (RPN per-level candidates).
        Skips the argsort and three [N]-sized gathers/scatters; the
        result is bitwise-identical because a stable sort of an
        already-sorted array is the identity permutation.

    Returns:
      keep: [N] bool in the *original* order.
    """
    n = boxes.shape[0]
    if presorted:
        sboxes, svalid = boxes, valid
        order = None
    else:
        masked_scores = jnp.where(valid, scores, NEG_INF)
        # stable descending sort (ties broken by original index, like
        # torch.sort)
        order = jnp.argsort(-masked_scores, stable=True)
        sboxes = boxes[order]
        svalid = valid[order]

    iou = box_iou(sboxes, sboxes)
    tri = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)  # tri[j, i]: j before i
    # overlap[j, i] = True if earlier box j suppresses later box i.
    # Stored bf16 (halves the per-round matrix read) — products are exact
    # 0/1 counts accumulated in f32.
    overlap = (iou > iou_threshold) & tri.T
    # bf16 0/1 matrix on TPU (halves the per-round read; exact under f32
    # accumulation); CPU's dot has no bf16 support
    mat_dt = jnp.bfloat16 if jax.default_backend() in ("tpu", "axon") \
        else jnp.float32
    overlap_f = overlap.astype(mat_dt)
    # materialize before the while_loop: loop regions are fusion-opaque
    # and XLA otherwise fuses the whole IoU-matrix chain INTO the loop
    # body, recomputing it every round
    overlap_f = jax.lax.optimization_barrier(overlap_f)

    decided0 = ~svalid
    keep0 = jnp.zeros((n,), dtype=bool)

    def cond(state):
        decided, _ = state
        return ~jnp.all(decided)

    def body(state):
        decided, keep = state
        # ONE [2, n] @ [n, n] MXU matmul per round: separate mat-vecs
        # lower to M=1 VPU reduces with T(1,128) layouts that re-read the
        # whole matrix at 1/8 sublane utilization (measured 2.5 ms for
        # ~11 rounds at 5x1000 boxes; this form is ~0.2 ms)
        vec = jnp.stack([~decided, keep]).astype(overlap_f.dtype)
        prods = jax.lax.dot_general(
            vec, overlap_f, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [2, n]
        # box i still blocked if an undecided earlier box overlaps it
        blocked = prods[0] > 0.5
        # box i killed if any kept earlier box overlaps it
        killed = prods[1] > 0.5
        can_decide = ~decided & (~blocked | killed)
        new_keep = keep | (can_decide & ~killed)
        new_decided = decided | can_decide
        return new_decided, new_keep

    # Static rounds (pipelined, ~free) + optional dynamic epilogue for
    # exactness past FORI_ROUNDS-deep suppression chains — see the
    # schedule notes at the top of the file.
    state = jax.lax.fori_loop(0, FORI_ROUNDS, lambda t, st: body(st),
                              (decided0, keep0))
    if _use_epilogue():
        state = jax.lax.while_loop(cond, body, state)
    keep_sorted = state[1]

    if max_out is not None and max_out < n:
        rank = jnp.cumsum(keep_sorted.astype(jnp.int32)) - 1
        keep_sorted = keep_sorted & (rank < max_out)

    if order is None:
        return keep_sorted
    # scatter back to original order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray,
                     valid: jnp.ndarray, idxs: jnp.ndarray,
                     iou_threshold: float,
                     max_out: int | None = None) -> jnp.ndarray:
    """Category-aware NMS: boxes with different ``idxs`` never suppress
    each other (torchvision ``batched_nms`` offset trick)."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1024.0)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, valid, iou_threshold, max_out)
