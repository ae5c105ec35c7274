"""RetinaNet head / loss / inference (single-stage detector).

Parity with mega_core/modeling/rpn/retinanet/{retinanet,loss,inference}.py:
shared 4-conv cls/bbox towers over FPN P3..P7, per-level anchors with 3
octave scales x 3 ratios, focal loss (alpha .25, gamma 2) + smooth-L1
(beta .11) with a 0.5/0.4 low-quality matcher, and per-level top-k →
score-threshold → class-aware NMS inference. Selected by MODEL.RETINANET_ON;
unused by the VID methods but part of the detector zoo.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.box_coder import BoxCoder
from ...ops.losses import sigmoid_focal_loss, smooth_l1_loss
from ...ops.nms import nms
from ...structures.boxes import box_iou, clip_to_image
from ..matcher import BELOW_LOW_THRESHOLD, BETWEEN_THRESHOLDS, match
from .anchors import generate_cell_anchors, grid_anchors

RETINA_CODER = BoxCoder(weights=(10.0, 10.0, 5.0, 5.0))


class RetinaNetHead(nn.Module):
    """Shared cls/bbox towers applied to every pyramid level."""

    num_classes: int = 80  # foreground classes (logits exclude background)
    num_anchors: int = 9
    num_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray]):
        convs = lambda name: [  # noqa: E731
            nn.Conv(
                self.channels, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.01), name=f"{name}_{i}",
            )
            for i in range(self.num_convs)
        ]
        cls_tower = convs("cls_tower")
        bbox_tower = convs("bbox_tower")
        bias_init = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_logits = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=[(1, 1)] * 2,
            dtype=self.dtype, kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias_init), name="cls_logits",
        )
        bbox_pred = nn.Conv(
            self.num_anchors * 4, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01), name="bbox_pred",
        )

        logits, bbox = [], []
        for f in features:
            t = f.astype(self.dtype)
            u = f.astype(self.dtype)
            for c1, c2 in zip(cls_tower, bbox_tower):
                t = nn.relu(c1(t))
                u = nn.relu(c2(u))
            b = f.shape[0]
            logits.append(
                cls_logits(t).reshape(b, -1, self.num_classes).astype(jnp.float32)
            )
            bbox.append(bbox_pred(u).reshape(b, -1, 4).astype(jnp.float32))
        return logits, bbox


def retinanet_anchors(
    shapes: Sequence[tuple[int, int]],
    sizes=(32, 64, 128, 256, 512),
    strides=(8, 16, 32, 64, 128),
    ratios=(0.5, 1.0, 2.0),
    octave: float = 2.0,
    scales_per_octave: int = 3,
) -> list[jnp.ndarray]:
    """Per-level anchors with octave scales (anchor_generator.py:146-166)."""
    out = []
    for (h, w), size, stride in zip(shapes, sizes, strides):
        per_level = tuple(
            size * octave ** (i / scales_per_octave) for i in range(scales_per_octave)
        )
        cell = generate_cell_anchors(stride, per_level, ratios)
        out.append(grid_anchors(h, w, stride, cell))
    return out


def retinanet_loss(
    anchors: jnp.ndarray,  # (A, 4) all levels concatenated
    logits: jnp.ndarray,  # (A, C)
    bbox_reg: jnp.ndarray,  # (A, 4)
    gt_boxes: jnp.ndarray,
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    fg_iou: float = 0.5,
    bg_iou: float = 0.4,
    alpha: float = 0.25,
    gamma: float = 2.0,
    beta: float = 0.11,
    reg_weight: float = 4.0,
):
    """Focal + smooth-L1 losses, normalized by #positives (retinanet/loss.py)."""
    iou = box_iou(gt_boxes, anchors)
    matched = match(iou, gt_valid, fg_iou, bg_iou, allow_low_quality_matches=True)
    labels = jnp.where(
        matched >= 0,
        gt_labels[jnp.maximum(matched, 0)],
        jnp.where(matched == BELOW_LOW_THRESHOLD, 0, -1),
    )
    pos = labels > 0
    num_pos = jnp.maximum(pos.sum(), 1)

    cls = sigmoid_focal_loss(logits, labels, gamma, alpha)
    cls_loss = cls.sum() / num_pos

    targets = RETINA_CODER.encode(gt_boxes[jnp.maximum(matched, 0)], anchors)
    reg = smooth_l1_loss(bbox_reg, targets, beta=beta)
    reg_loss = (reg.sum(-1) * pos).sum() / num_pos * reg_weight
    return cls_loss, reg_loss


def retinanet_inference(
    anchors_per_level: list[jnp.ndarray],
    logits_per_level: list[jnp.ndarray],  # each (A_l, C) for one image
    bbox_per_level: list[jnp.ndarray],
    im_size,
    pre_nms_top_n: int = 1000,
    score_thresh: float = 0.05,
    nms_thresh: float = 0.4,
    detections_per_img: int = 100,
):
    """Per-level top-k → decode → per-class NMS → global cap
    (retinanet/inference.py). Single image; vmap for batches."""
    boxes_all, scores_all, labels_all = [], [], []
    for anchors, logits, deltas in zip(
        anchors_per_level, logits_per_level, bbox_per_level
    ):
        num_classes = logits.shape[-1]
        probs = jax.nn.sigmoid(logits).reshape(-1)  # (A*C,)
        k = min(pre_nms_top_n, probs.shape[0])
        top_p, top_i = jax.lax.top_k(probs, k)
        anchor_idx = top_i // num_classes
        cls_idx = top_i % num_classes + 1  # labels are 1-based
        decoded = RETINA_CODER.decode(
            deltas[anchor_idx], anchors[anchor_idx]
        )
        decoded = clip_to_image(decoded, im_size[0], im_size[1])
        boxes_all.append(decoded)
        scores_all.append(jnp.where(top_p > score_thresh, top_p, 0.0))
        labels_all.append(cls_idx)

    boxes = jnp.concatenate(boxes_all, axis=0)
    scores = jnp.concatenate(scores_all, axis=0)
    labels = jnp.concatenate(labels_all, axis=0)

    # class-aware NMS: offset boxes per class so classes never suppress
    # each other (equivalent to per-class NMS on the union set)
    offsets = labels.astype(jnp.float32)[:, None] * 1e5
    keep_idx, keep_valid = nms(
        boxes + offsets, scores, scores > 0, nms_thresh, detections_per_img
    )
    return (
        boxes[keep_idx],
        jnp.where(keep_valid, scores[keep_idx], 0.0),
        labels[keep_idx],
        keep_valid,
    )
