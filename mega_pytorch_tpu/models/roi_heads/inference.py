"""Detection post-processing (fixed shapes).

Parity with mega_core/modeling/roi_heads/box_head/inference.py:12-149:
softmax → per-class decode (weights 10,10,5,5) → clip → per-class score
threshold (strictly >) + NMS → cap to DETECTIONS_PER_IMG over all classes.

TPU design: the per-class python loop becomes a vmap over C-1 foreground
classes (background column 0 skipped), each with static keep slots; the final
cap is one global top-k over the (C-1)·K padded candidates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.box_coder import BoxCoder
from ...ops.nms import nms
from ...structures.boxes import clip_to_image


class Detections(NamedTuple):
    boxes: jnp.ndarray  # (B, D, 4)
    scores: jnp.ndarray  # (B, D)
    labels: jnp.ndarray  # (B, D) int32, 1..C-1
    valid: jnp.ndarray  # (B, D) bool


def _postprocess_one(
    class_logits, box_regression, prop_boxes, prop_valid, im_size,
    coder: BoxCoder, score_thresh: float, nms_thresh: float,
    detections_per_img: int, per_class_keep: int,
):
    num_classes = class_logits.shape[-1]
    probs = jax.nn.softmax(class_logits, axis=-1)  # (K, C)
    decoded = coder.decode(box_regression, prop_boxes)  # (K, 4C)
    decoded = decoded.reshape(-1, num_classes, 4)
    decoded = clip_to_image(decoded, im_size[0], im_size[1])

    # per-foreground-class NMS (skip background column 0)
    cls_boxes = jnp.moveaxis(decoded[:, 1:, :], 1, 0)  # (C-1, K, 4)
    cls_scores = probs[:, 1:].T  # (C-1, K)
    cls_valid = (cls_scores > score_thresh) & prop_valid[None, :]

    # boxes/scores ride the NMS sorts as payload instead of being gathered
    # by keep_idx afterwards (TPU dynamic-gather is the bottleneck here —
    # see ops/nms.py `extras`)
    _, keep_valid, (kept_boxes, kept_scores) = jax.vmap(
        lambda b, s, v: nms(b, s, v, nms_thresh, per_class_keep,
                            extras=(s,), return_boxes=True)
    )(cls_boxes, cls_scores, cls_valid)
    labels = jnp.broadcast_to(
        jnp.arange(1, num_classes, dtype=jnp.int32)[:, None], keep_valid.shape
    )

    flat_boxes = kept_boxes.reshape(-1, 4)
    flat_scores = jnp.where(keep_valid.reshape(-1), kept_scores.reshape(-1), -1.0)
    flat_labels = labels.reshape(-1)

    # a DETECTIONS_PER_IMG above the candidate pool means "no cap"
    k = min(detections_per_img, flat_scores.shape[0])
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    return (
        flat_boxes[top_idx],
        jnp.maximum(top_scores, 0.0),
        flat_labels[top_idx],
        top_scores > 0,
    )


def postprocess_detections(
    class_logits: jnp.ndarray,
    box_regression: jnp.ndarray,
    prop_boxes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    im_sizes: jnp.ndarray,
    bbox_reg_weights=(10.0, 10.0, 5.0, 5.0),
    score_thresh: float = 0.001,
    nms_thresh: float = 0.5,
    detections_per_img: int = 300,
    per_class_keep: int | None = None,
) -> Detections:
    """Batched. class_logits: (B, K, C); box_regression: (B, K, 4C);
    prop_boxes: (B, K, 4); im_sizes: (B, 2) (h, w)."""
    coder = BoxCoder(bbox_reg_weights)
    if per_class_keep is None:
        per_class_keep = min(prop_boxes.shape[1], detections_per_img)
    out = jax.vmap(
        lambda cl, br, pb, pv, s: _postprocess_one(
            cl, br, pb, pv, s, coder, score_thresh, nms_thresh,
            detections_per_img, per_class_keep,
        )
    )(class_logits, box_regression, prop_boxes, prop_valid, im_sizes)
    return Detections(*out)
