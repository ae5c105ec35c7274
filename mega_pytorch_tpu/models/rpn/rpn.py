"""Region Proposal Network — head, fixed-shape inference, loss.

TPU-native rebuild of mega_core/modeling/rpn/{rpn,inference,loss}.py:
  * RPNHead — shared 3x3 conv + 1x1 cls/bbox heads (rpn.py:73-106), NHWC.
  * rpn_postprocess — sigmoid → static top-k (PRE_NMS_TOP_N) → decode → clip →
    min-size mask → greedy NMS to POST_NMS_TOP_N padded slots
    (inference.py:76-123); vmapped over the batch. The "ref" version for
    video methods is the same function with REF_* sizes (rpn.py:200-243).
  * add_gt_proposals — appends padded GT boxes with objectness 1
    (inference.py:52-74) as extra static slots.
  * rpn_loss — IoU matcher (0.7/0.3, low-quality), visibility/between
    discards, balanced 256@0.5 sampling, BCE + smooth-L1/Σsampled
    (loss.py:21-133).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.box_coder import BoxCoder
from ...ops.losses import smooth_l1_loss
from ...ops.nms import nms
from ...structures.boxes import Boxes, box_iou, clip_to_image, small_box_mask
from ..matcher import BELOW_LOW_THRESHOLD, BETWEEN_THRESHOLDS, match
from ..sampler import balanced_sample
from .anchors import anchor_visibility

RPN_BOX_CODER = BoxCoder(weights=(1.0, 1.0, 1.0, 1.0))


class RPNHead(nn.Module):
    """Shared 3x3 conv + 1x1 objectness / box-delta convs."""

    in_channels: int
    num_anchors: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, H, W, C) → objectness (B, H*W*A), box deltas (B, H*W*A, 4)."""
        t = nn.relu(
            nn.Conv(
                self.in_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                kernel_init=nn.initializers.normal(0.01),
                name="conv",
            )(x)
        )
        logits = nn.Conv(
            self.num_anchors,
            (1, 1),
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_logits",
        )(t)
        bbox = nn.Conv(
            self.num_anchors * 4,
            (1, 1),
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="bbox_pred",
        )(t)
        b = x.shape[0]
        # NHWC channel order is (a, 4)-major exactly like the reference's
        # permute_and_flatten (rpn/utils.py): flat ordering (y, x, a)
        objectness = logits.reshape(b, -1).astype(jnp.float32)
        box_deltas = bbox.reshape(b, -1, 4).astype(jnp.float32)
        return objectness, box_deltas


class RPNSizes(NamedTuple):
    pre_nms_top_n: int
    post_nms_top_n: int
    nms_thresh: float
    min_size: float


def _postprocess_one(
    objectness: jnp.ndarray,
    box_deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    im_size: jnp.ndarray,
    sizes: RPNSizes,
) -> Boxes:
    """Single image: (N,) logits, (N, 4) deltas, (N, 4) anchors → padded Boxes."""
    n = objectness.shape[0]
    scores = jax.nn.sigmoid(objectness)
    k = min(sizes.pre_nms_top_n, n)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    # decode ALL anchors (a ~30-op/row VPU triviality), then gather once:
    # gathering deltas AND anchors separately cost a second (N, 4) random
    # gather per frame (0.11 ms/frame at 12 lanes in the r4 trace)
    proposals = RPN_BOX_CODER.decode(box_deltas, anchors)[top_idx]
    proposals = clip_to_image(proposals, im_size[0], im_size[1])
    valid = small_box_mask(proposals, sizes.min_size)
    # proposals/scores ride the NMS sorts as payload — no post-hoc gathers
    # (see ops/nms.py `extras`); top_k's output is already score-descending,
    # so the NMS rank sort is skipped (presorted)
    _, keep_valid, (kept_boxes, kept_scores) = nms(
        proposals, top_scores, valid, sizes.nms_thresh, sizes.post_nms_top_n,
        extras=(top_scores,), return_boxes=True, presorted=True,
    )
    return Boxes(
        boxes=kept_boxes,
        valid=keep_valid,
        fields={"objectness": kept_scores},
    )


def rpn_postprocess(
    objectness: jnp.ndarray,
    box_deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    im_sizes: jnp.ndarray,
    sizes: RPNSizes,
) -> Boxes:
    """Batched: (B, N) logits, (B, N, 4) deltas → Boxes with (B, K, ...) leaves."""
    return jax.vmap(lambda o, d, s: _postprocess_one(o, d, anchors, s, sizes))(
        objectness, box_deltas, im_sizes
    )


def shared_ref_key_postprocess(
    objectness: jnp.ndarray,
    box_deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    im_sizes: jnp.ndarray,
    ref_sizes: RPNSizes,
    key_sizes: RPNSizes,
) -> tuple[Boxes, Boxes, bool]:
    """(ref, key, is_prefix) proposal sets from ONE sort + ONE NMS where
    possible; is_prefix=True means ref IS key[:, :ref_post] (callers can then
    also reuse pooled ROI features by slicing instead of re-pooling).

    The VID streaming protocol derives two proposal sets per frame from the
    same RPN outputs: the ref set (REF_POST_NMS_TOP_N=75, defaults.py:414-415)
    and the key set (POST_NMS_TOP_N_TEST=300, BASE_RCNN_*.yaml). Every shipped
    config differs only in post_nms_top_n — and NMS keep slots are filled in
    score-rank order with identical suppression sets for identical inputs, so
    the 75-post result is exactly the first 75 slots of the 300-post result.
    Computing the key set once and slicing halves the per-frame sort + NMS
    work (measured ~1.0 ms/frame of sort+while on v5e at MEGA shapes).
    Falls back to two independent passes when the params genuinely differ.
    """
    key_props = rpn_postprocess(objectness, box_deltas, anchors, im_sizes, key_sizes)
    if (
        ref_sizes.pre_nms_top_n == key_sizes.pre_nms_top_n
        and ref_sizes.nms_thresh == key_sizes.nms_thresh
        and ref_sizes.min_size == key_sizes.min_size
        and ref_sizes.post_nms_top_n <= key_sizes.post_nms_top_n
    ):
        r = ref_sizes.post_nms_top_n
        ref_props = Boxes(
            boxes=key_props.boxes[:, :r],
            valid=key_props.valid[:, :r],
            fields={k: v[:, :r] for k, v in key_props.fields.items()},
        )
        return ref_props, key_props, True
    ref_props = rpn_postprocess(
        objectness, box_deltas, anchors, im_sizes, ref_sizes
    )
    return ref_props, key_props, False


def add_gt_proposals(proposals: Boxes, gt_boxes: jnp.ndarray, gt_valid: jnp.ndarray) -> Boxes:
    """Append padded GT slots with objectness 1 (inference.py:52-74).

    proposals leaves are (B, K, ...); gt_boxes (B, G, 4); gt_valid (B, G).
    """
    obj = proposals.fields["objectness"]
    return Boxes(
        boxes=jnp.concatenate([proposals.boxes, gt_boxes], axis=1),
        valid=jnp.concatenate([proposals.valid, gt_valid], axis=1),
        fields={
            "objectness": jnp.concatenate(
                [obj, jnp.ones(gt_boxes.shape[:2], obj.dtype)], axis=1
            )
        },
    )


def _rpn_targets_one(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    im_size: jnp.ndarray,
    fg_iou: float,
    bg_iou: float,
    straddle_thresh: float,
):
    """labels (N,) in {-1, 0, 1} and (N, 4) regression targets."""
    iou = box_iou(gt_boxes, anchors)  # (G, N)
    matched = match(iou, gt_valid, fg_iou, bg_iou, allow_low_quality_matches=True)
    labels = jnp.where(
        matched >= 0,
        1.0,
        jnp.where(matched == BELOW_LOW_THRESHOLD, 0.0, -1.0),
    )
    visible = anchor_visibility(anchors, im_size[0], im_size[1], straddle_thresh)
    labels = jnp.where(visible, labels, -1.0)
    labels = jnp.where(matched == BETWEEN_THRESHOLDS, -1.0, labels)

    matched_gt = gt_boxes[jnp.maximum(matched, 0)]
    reg_targets = RPN_BOX_CODER.encode(matched_gt, anchors)
    return labels, reg_targets


def rpn_loss(
    anchors: jnp.ndarray,
    objectness: jnp.ndarray,
    box_deltas: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    im_sizes: jnp.ndarray,
    rng: jax.Array,
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    fg_iou: float = 0.7,
    bg_iou: float = 0.3,
    straddle_thresh: float = 0.0,
):
    """Batched RPN losses (loss.py:92-133). Returns (objectness_loss, box_loss)."""
    b = objectness.shape[0]
    labels, reg_targets = jax.vmap(
        lambda g, v, s: _rpn_targets_one(
            anchors, g, v, s, fg_iou, bg_iou, straddle_thresh
        )
    )(gt_boxes, gt_valid, im_sizes)

    rngs = jax.random.split(rng, b)
    pos_mask, neg_mask = jax.vmap(
        lambda l, r: balanced_sample(l, r, batch_size_per_image, positive_fraction)
    )(labels, rngs)

    sampled = pos_mask | neg_mask
    num_sampled = jnp.maximum(sampled.sum(), 1)

    # box loss: smooth-L1 summed over positives / #sampled (loss.py:118-123)
    sl1 = smooth_l1_loss(box_deltas, reg_targets, beta=1.0 / 9)
    box_loss = (sl1.sum(-1) * pos_mask).sum() / num_sampled

    # objectness: mean BCE over sampled anchors, batch-concatenated
    logp = jax.nn.log_sigmoid(objectness)
    log1mp = jax.nn.log_sigmoid(-objectness)
    bce = -(labels * logp + (1.0 - labels) * log1mp)
    objectness_loss = (bce * sampled).sum() / num_sampled

    return objectness_loss, box_loss
