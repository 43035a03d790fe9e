"""Balanced positive/negative subsampling with static shapes.

d2 ``subsample_labels`` returns dynamic index lists; here sampling returns a
fixed-shape boolean *sampled* mask instead (reference usage:
``rpn.py:300-320`` RPN anchor subsampling 512@0.5 and
``roi_heads.py:1566-1610`` ``_sample_proposals_wsl``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _random_rank_within(mask: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    """Rank (0-based) of each element among mask members, in random order;
    non-members get rank >= num_members."""
    n = mask.shape[0]
    r = jax.random.uniform(key, (n,))
    # members sort before non-members; random order within group
    sort_key = jnp.where(mask, r, r + 2.0)
    order = jnp.argsort(sort_key)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return ranks


def subsample_labels(
    labels: jnp.ndarray,
    num_samples: int,
    positive_fraction: float,
    key: jax.Array,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Randomly pick up to ``num_samples`` with at most
    ``positive_fraction * num_samples`` positives, rest negatives.

    Args:
      labels: [N] int, 1 = positive, 0 = negative, -1 = ignore.

    Returns:
      (pos_sampled, neg_sampled): two [N] bool masks.
    """
    pos_mask = labels == 1
    neg_mask = labels == 0

    num_pos_target = int(num_samples * positive_fraction)
    num_pos_avail = jnp.sum(pos_mask.astype(jnp.int32))
    num_pos = jnp.minimum(num_pos_target, num_pos_avail)
    num_neg_target = num_samples - num_pos
    num_neg_avail = jnp.sum(neg_mask.astype(jnp.int32))
    num_neg = jnp.minimum(num_neg_target, num_neg_avail)

    kp, kn = jax.random.split(key)
    pos_rank = _random_rank_within(pos_mask, kp)
    neg_rank = _random_rank_within(neg_mask, kn)

    pos_sampled = pos_mask & (pos_rank < num_pos)
    neg_sampled = neg_mask & (neg_rank < num_neg)
    return pos_sampled, neg_sampled
