"""Fixed-shape greedy NMS for TPU.

Replaces the CUDA bitmask kernel (mega_core/csrc/cuda/nms.cu:13-131) and its
Python wrapper (mega_core/layers/nms.py). Same greedy semantics: process boxes
in score order, suppress any box whose IoU with an already-kept box exceeds the
threshold, using the Detectron +1 area convention (nms.cu `devIoU`).

TPU design — exact greedy via independent-set peeling, not a K-step loop:
sort by score once, build the (N, N) rank-ordered overlap mask, then peel
rounds: every still-undecided box with NO higher-ranked undecided overlapper
is provably kept (its potential suppressors can only be kept boxes, and any
kept overlapper would already have removed it), and everything a newly-kept
box overlaps is removed. Each round is one vectorized masked any(); real
detection data converges in a handful of rounds (`lax.while_loop` runs until
no box is undecided), instead of `max_outputs` sequential argmax steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _iou_matrix(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 4) → (N, N) IoU, +1 convention."""
    areas = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.clip(rb - lt + 1.0, min=0.0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(areas[:, None] + areas[None, :] - inter, 1e-12)


@functools.partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_outputs: int,
):
    """Greedy NMS with a static output size.

    Args:
      boxes: (N, 4) xyxy.
      scores: (N,).
      valid: (N,) bool — padding mask; invalid boxes are never selected.
      iou_threshold: suppress boxes with IoU > threshold w.r.t. a kept box.
      max_outputs: static number of keep slots.

    Returns:
      keep_idx: (max_outputs,) int32 indices into the input, score-descending.
      keep_valid: (max_outputs,) bool — which slots hold real selections.
    """
    n = boxes.shape[0]
    order = jnp.argsort(jnp.where(valid, scores, NEG_INF))[::-1]
    b = boxes[order]
    v = valid[order]

    def peel(bb, vv):
        """Exact greedy keep mask over score-sorted boxes."""
        m = bb.shape[0]
        overlap = _iou_matrix(bb) > iou_threshold
        rank = jnp.arange(m)
        # overlap[j, i]: higher-ranked j (j < i) suppresses i when kept
        overlap = overlap & (rank[:, None] < rank[None, :])

        def cond(state):
            _, undecided = state
            return undecided.any()

        def body(state):
            kept, undecided = state
            blocked = (undecided[:, None] & overlap).any(axis=0)
            safe = undecided & ~blocked
            removed = (safe[:, None] & overlap).any(axis=0)
            return kept | safe, undecided & ~safe & ~removed

        kept, _ = jax.lax.while_loop(cond, body, (jnp.zeros(m, bool), vv))
        return kept

    # prefix shortcut: keep decisions within the sorted prefix are final
    # (suppression only flows from higher-ranked boxes), so when the prefix
    # already yields >= max_outputs keeps — or contains every valid box —
    # the full O(N^2) overlap matrix is never needed
    prefix = min(n, max(4 * max_outputs, 512))
    if prefix < n:
        kept_p = peel(b[:prefix], v[:prefix])
        enough = (kept_p.sum() >= max_outputs) | (~v[prefix:].any())
        kept = jax.lax.cond(
            enough,
            lambda: jnp.concatenate([kept_p, jnp.zeros(n - prefix, bool)]),
            lambda: peel(b, v),
        )
    else:
        kept = peel(b, v)

    # first max_outputs kept boxes in rank (score) order; pad the slots when
    # fewer candidates than keep slots exist (tiny inputs)
    rank = jnp.arange(n)
    pick = jnp.where(kept, n - rank, 0)
    k = min(max_outputs, n)
    _, pos = jax.lax.top_k(pick, k)
    keep_valid = kept[pos]
    keep_idx = order[pos].astype(jnp.int32)
    if k < max_outputs:
        pad = max_outputs - k
        keep_idx = jnp.concatenate([keep_idx, jnp.zeros(pad, jnp.int32)])
        keep_valid = jnp.concatenate([keep_valid, jnp.zeros(pad, bool)])
    return keep_idx, keep_valid


def batched_nms(boxes, scores, valid, iou_threshold: float, max_outputs: int):
    """vmap of :func:`nms` over a leading batch (e.g. classes or images).

    boxes: (B, N, 4); scores/valid: (B, N). Returns (B, K) idx + valid.
    """
    return jax.vmap(lambda b, s, v: nms(b, s, v, iou_threshold, max_outputs))(
        boxes, scores, valid
    )
