"""IoU matcher with padded ground truth.

Semantics of mega_core/modeling/matcher.py:5-117 on fixed shapes: each
prediction gets the argmax ground-truth index, demoted to BELOW_LOW (-1) /
BETWEEN (-2) by thresholds; with ``allow_low_quality_matches`` every
prediction that ties a ground truth's best IoU is restored to its argmax
match. Padded (invalid) ground truths never match.
"""

from __future__ import annotations

import jax.numpy as jnp

BELOW_LOW_THRESHOLD = -1
BETWEEN_THRESHOLDS = -2


def match(
    iou: jnp.ndarray,
    gt_valid: jnp.ndarray,
    high_threshold: float,
    low_threshold: float,
    allow_low_quality_matches: bool = False,
) -> jnp.ndarray:
    """Args:
      iou: (M, N) quality matrix — M padded ground truths × N predictions.
      gt_valid: (M,) bool.
      Returns (N,) int32: gt index, or -1 (below low), or -2 (between).
    """
    neg = jnp.full_like(iou, -1.0)
    quality = jnp.where(gt_valid[:, None], iou, neg)

    matched_vals = quality.max(axis=0)
    all_matches = quality.argmax(axis=0).astype(jnp.int32)

    matches = jnp.where(
        matched_vals < low_threshold,
        BELOW_LOW_THRESHOLD,
        jnp.where(matched_vals < high_threshold, BETWEEN_THRESHOLDS, all_matches),
    )

    if allow_low_quality_matches:
        # ties with each gt's best prediction are promoted back (matcher.py:85-117)
        best_per_gt = quality.max(axis=1, keepdims=True)  # (M, 1)
        is_best = (quality == best_per_gt) & gt_valid[:, None] & (best_per_gt > -1.0)
        pred_is_someones_best = is_best.any(axis=0)
        matches = jnp.where(pred_is_someones_best, all_matches, matches)

    return matches
