"""Target matcher + balanced sampler.

Static-shape equivalents of maskrcnn-benchmark's ``Matcher`` and
``BalancedPositiveNegativeSampler`` (consumed by the reference's RPN loss,
box-head loss and EMM target sampler ``target_sampler.py:289-304``).

Matcher sentinel values follow the reference exactly:
  -1 = below low threshold (background), -2 = between thresholds (ignore).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BELOW_LOW_QUALITY = -1
BETWEEN_THRESHOLDS = -2


def match_targets(quality: jnp.ndarray, gt_valid: jnp.ndarray,
                  pred_valid: jnp.ndarray, high_threshold: float,
                  low_threshold: float,
                  allow_low_quality_matches: bool = False) -> jnp.ndarray:
    """maskrcnn ``Matcher.__call__`` over padded sets.

    Args:
      quality: [G, P] match quality (IoU).
      gt_valid: [G] bool.
      pred_valid: [P] bool.

    Returns:
      matches: [P] int32 — index of matched gt, or -1 / -2 sentinels.
      Invalid preds get -1.
    """
    neg = jnp.full_like(quality, -1.0)
    q = jnp.where(gt_valid[:, None] & pred_valid[None, :], quality, neg)

    matched_vals = jnp.max(q, axis=0)          # [P]
    matches = jnp.argmax(q, axis=0).astype(jnp.int32)  # [P]

    below_low = matched_vals < low_threshold
    between = (matched_vals >= low_threshold) & (matched_vals < high_threshold)

    out = jnp.where(below_low, BELOW_LOW_QUALITY, matches)
    out = jnp.where(between, BETWEEN_THRESHOLDS, out)

    if allow_low_quality_matches:
        highest_per_gt = jnp.max(q, axis=1)    # [G]
        # preds tied with a gt's best quality are force-matched (to their own
        # argmax gt, reproducing the reference's update semantics)
        is_best = (q == highest_per_gt[:, None]) & gt_valid[:, None]
        force = jnp.any(is_best, axis=0) & pred_valid
        out = jnp.where(force, matches, out)

    return jnp.where(pred_valid, out, BELOW_LOW_QUALITY)


def balanced_sample(rng: jax.Array, pos_mask: jnp.ndarray, neg_mask: jnp.ndarray,
                    batch_size: int, positive_fraction: float):
    """maskrcnn ``BalancedPositiveNegativeSampler`` for one image.

    Randomly selects up to ``batch_size * positive_fraction`` positives and
    fills the rest with negatives.  Returns (sampled_pos, sampled_neg) masks.
    """
    rng_p, rng_n = jax.random.split(rng)
    num_pos_target = int(batch_size * positive_fraction)

    def pick(rng_k, mask, limit):
        n = mask.shape[0]
        priority = jax.random.uniform(rng_k, (n,))
        priority = jnp.where(mask, priority, 2.0)  # invalid sorted last
        order = jnp.argsort(priority)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        return mask & (rank < limit)

    num_pos = jnp.minimum(jnp.sum(pos_mask), num_pos_target)
    sampled_pos = pick(rng_p, pos_mask, num_pos)
    num_neg = jnp.minimum(jnp.sum(neg_mask), batch_size - num_pos)
    sampled_neg = pick(rng_n, neg_mask, num_neg)
    return sampled_pos, sampled_neg
