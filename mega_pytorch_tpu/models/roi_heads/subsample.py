"""Training-time proposal subsampling + Fast R-CNN losses.

Parity with mega_core/modeling/roi_heads/box_head/loss.py:15-193: IoU matcher
(0.5/0.5, no low-quality), per-proposal class labels (0 = bg, -1 = ignore),
Detectron (10,10,5,5) regression targets, balanced 128@0.25 sampling, then
CE + per-class smooth-L1 (beta 1) normalized by the sampled count.

TPU shape discipline: instead of gathering a dynamic number of sampled
proposals, we always emit exactly ``batch_size_per_image`` slots (top-k over
the sampled mask with random tiebreak) plus a slot-validity mask.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ...ops.box_coder import BoxCoder
from ...ops.losses import smooth_l1_loss
from ...structures.boxes import box_iou
from ..matcher import BELOW_LOW_THRESHOLD, BETWEEN_THRESHOLDS, match
from ..sampler import balanced_sample


class SampledRois(NamedTuple):
    boxes: jnp.ndarray  # (B, S, 4)
    valid: jnp.ndarray  # (B, S) bool
    labels: jnp.ndarray  # (B, S) int32 — 0 bg, >=1 class
    reg_targets: jnp.ndarray  # (B, S, 4)


def _subsample_one(
    prop_boxes, prop_valid, gt_boxes, gt_labels, gt_valid, rng,
    coder: BoxCoder, batch_size: int, positive_fraction: float,
    fg_iou: float, bg_iou: float,
):
    iou = box_iou(gt_boxes, prop_boxes)  # (G, K)
    # padded proposals must never match
    iou = jnp.where(prop_valid[None, :], iou, -1.0)
    matched = match(iou, gt_valid, fg_iou, bg_iou, allow_low_quality_matches=False)

    labels = jnp.where(
        matched >= 0,
        gt_labels[jnp.maximum(matched, 0)],
        jnp.where(matched == BELOW_LOW_THRESHOLD, 0, -1),
    ).astype(jnp.int32)
    labels = jnp.where(prop_valid, labels, -1)

    reg_targets = coder.encode(gt_boxes[jnp.maximum(matched, 0)], prop_boxes)

    rng, sub = jax.random.split(rng)
    pos_mask, neg_mask = balanced_sample(
        labels.astype(jnp.float32), sub, batch_size, positive_fraction
    )
    sampled = pos_mask | neg_mask

    # pack sampled proposals into S static slots (random order within sampled)
    tiebreak = jax.random.uniform(rng, sampled.shape)
    priority = sampled.astype(jnp.float32) * 2.0 + tiebreak
    _, slot_idx = jax.lax.top_k(priority, batch_size)
    slot_valid = sampled[slot_idx]

    return (
        prop_boxes[slot_idx],
        slot_valid,
        jnp.where(slot_valid, labels[slot_idx], 0),
        reg_targets[slot_idx],
    )


def subsample_proposals(
    prop_boxes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    bbox_reg_weights=(10.0, 10.0, 5.0, 5.0),
    batch_size_per_image: int = 128,
    positive_fraction: float = 0.25,
    fg_iou: float = 0.5,
    bg_iou: float = 0.5,
) -> SampledRois:
    """Batched over images. prop_boxes: (B, K, 4); gt_*: (B, G, ...)."""
    coder = BoxCoder(bbox_reg_weights)
    b = prop_boxes.shape[0]
    rngs = jax.random.split(rng, b)
    out = jax.vmap(
        lambda pb, pv, gb, gl, gv, r: _subsample_one(
            pb, pv, gb, gl, gv, r, coder, batch_size_per_image,
            positive_fraction, fg_iou, bg_iou,
        )
    )(prop_boxes, prop_valid, gt_boxes, gt_labels, gt_valid, rngs)
    return SampledRois(*out)


def fastrcnn_loss(
    class_logits: jnp.ndarray,
    box_regression: jnp.ndarray,
    rois: SampledRois,
    cls_agnostic_bbox_reg: bool = False,
):
    """class_logits: (B, S, C); box_regression: (B, S, 4C). Returns (cls, box) losses."""
    num_sampled = jnp.maximum(rois.valid.sum(), 1)

    logp = jax.nn.log_softmax(class_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, rois.labels[..., None], axis=-1)[..., 0]
    classification_loss = (ce * rois.valid).sum() / num_sampled

    if cls_agnostic_bbox_reg:
        reg = box_regression[..., 4:8]
    else:
        idx = rois.labels[..., None] * 4 + jnp.arange(4)
        reg = jnp.take_along_axis(box_regression, idx, axis=-1)
    pos = rois.valid & (rois.labels > 0)
    sl1 = smooth_l1_loss(reg, rois.reg_targets, beta=1.0)
    box_loss = (sl1.sum(-1) * pos).sum() / num_sampled

    return classification_loss, box_loss
