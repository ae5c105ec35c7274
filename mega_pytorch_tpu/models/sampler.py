"""Balanced positive/negative sampler on fixed shapes.

Semantics of mega_core/modeling/balanced_positive_negative_sampler.py:5-68:
pick up to ``batch * positive_fraction`` positives uniformly at random, fill
the remainder (up to ``batch``) with random negatives; returns boolean masks.

TPU design: instead of randperm + dynamic slicing, draw one uniform key per
element, rank candidates by key within their class via argsort, and threshold
the rank at the (traced) per-class budget. Shapes stay (N,) throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _rank_among(mask: jnp.ndarray, rand: jnp.ndarray) -> jnp.ndarray:
    """rank[i] = position of i among mask==True elements, ordered by rand."""
    key = jnp.where(mask, rand, jnp.inf)
    order = jnp.argsort(key)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return ranks


def balanced_sample(
    labels: jnp.ndarray,
    rng: jax.Array,
    batch_size: int,
    positive_fraction: float,
):
    """Args:
      labels: (N,) — -1 ignore, 0 negative, >= 1 positive.
      Returns (pos_mask, neg_mask): (N,) bool each.
    """
    n = labels.shape[0]
    positive = labels >= 1
    negative = labels == 0

    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(positive.sum(), max_pos)
    num_neg = jnp.minimum(negative.sum(), batch_size - num_pos)

    r_pos, r_neg = jax.random.uniform(rng, (2, n))
    pos_mask = positive & (_rank_among(positive, r_pos) < num_pos)
    neg_mask = negative & (_rank_among(negative, r_neg) < num_neg)
    return pos_mask, neg_mask
