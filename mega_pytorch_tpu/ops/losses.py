"""Loss primitives.

Pure-XLA replacements for mega_core/layers/smooth_l1_loss.py:6-16 and the
SigmoidFocalLoss CUDA kernel (mega_core/csrc/cuda/SigmoidFocalLoss_cuda.cu;
CPU semantics in mega_core/layers/sigmoid_focal_loss.py:40-50). Both are
bandwidth-bound elementwise ops — XLA fuses them; no Pallas needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_l1_loss(
    input: jnp.ndarray,
    target: jnp.ndarray,
    beta: float = 1.0 / 9,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Elementwise smooth-L1 with the extra ``beta`` knob.

    Returns the unreduced loss; callers apply their own masked reduction
    (the reference's size_average/sum happens at the call sites).
    """
    n = jnp.abs(input - target)
    loss = jnp.where(n < beta, 0.5 * n * n / beta, n - 0.5 * beta)
    if weights is not None:
        loss = loss * weights
    return loss


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Per-anchor, per-class focal loss.

    Args:
      logits: (N, C) — class logits for classes 1..C (no background column).
      targets: (N,) int — 0 = background, -1 = ignore, c>=1 = class id.

    Returns (N, C) losses (reference CPU impl semantics: positive term only on
    the target class; negative term on all other classes for targets >= 0).
    """
    num_classes = logits.shape[1]
    class_range = jnp.arange(1, num_classes + 1)[None, :]
    t = targets[:, None]
    p = jax.nn.sigmoid(logits)
    # log(p) / log(1-p) via stable softplus forms
    log_p = jax.nn.log_sigmoid(logits)
    log_1mp = jax.nn.log_sigmoid(-logits)
    term_pos = ((1 - p) ** gamma) * log_p
    term_neg = (p**gamma) * log_1mp
    pos_mask = (t == class_range).astype(logits.dtype)
    neg_mask = ((t != class_range) & (t >= 0)).astype(logits.dtype)
    return -pos_mask * term_pos * alpha - neg_mask * term_neg * (1 - alpha)
