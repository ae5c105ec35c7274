"""Fixed-shape greedy NMS for TPU.

Replaces the CUDA bitmask kernel (mega_core/csrc/cuda/nms.cu:13-131) and its
Python wrapper (mega_core/layers/nms.py). Same greedy semantics: process boxes
in score order, suppress any box whose IoU with an already-kept box exceeds the
threshold, using the Detectron +1 area convention (nms.cu `devIoU`).

TPU design: dynamic-length outputs are impossible under XLA, so we run exactly
``max_outputs`` greedy select-and-suppress steps with ``lax.fori_loop``: each
step picks the argmax of the still-alive scores (equivalent to walking the
sorted order) and suppresses its neighbors with one N-vector IoU. O(K·N) work,
fully vectorized per step, vmap-able over classes/images.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _iou_one_vs_all(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one (4,) box against (N, 4), +1 convention."""
    area1 = (box[2] - box[0] + 1.0) * (box[3] - box[1] + 1.0)
    areas = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt + 1.0, min=0.0)
    inter = wh[:, 0] * wh[:, 1]
    return inter / jnp.maximum(area1 + areas - inter, 1e-12)


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
      keep_idx: (max_outputs,) int32 indices into the input, greedy order.
      keep_valid: (max_outputs,) bool — which slots hold real selections.
    """
    n = boxes.shape[0]
    live_scores = jnp.where(valid, scores, NEG_INF)

    def body(i, state):
        live, keep_idx, keep_valid = state
        j = jnp.argmax(live)
        ok = live[j] > NEG_INF / 2
        keep_idx = keep_idx.at[i].set(j.astype(jnp.int32))
        keep_valid = keep_valid.at[i].set(ok)
        iou = _iou_one_vs_all(boxes[j], boxes)
        suppress = (iou > iou_threshold) | (jnp.arange(n) == j)
        live = jnp.where(ok & suppress, NEG_INF, live)
        return live, keep_idx, keep_valid

    keep_idx = jnp.zeros((max_outputs,), jnp.int32)
    keep_valid = jnp.zeros((max_outputs,), bool)
    _, keep_idx, keep_valid = jax.lax.fori_loop(
        0, max_outputs, body, (live_scores, keep_idx, keep_valid)
    )
    return keep_idx, keep_valid


def batched_nms(boxes, scores, valid, iou_threshold: float, max_outputs: int):
    """vmap of :func:`nms` over a leading batch (e.g. classes or images).

    boxes: (B, N, 4); scores/valid: (B, N). Returns (B, K) idx + valid.
    """
    return jax.vmap(lambda b, s, v: nms(b, s, v, iou_threshold, max_outputs))(
        boxes, scores, valid
    )
