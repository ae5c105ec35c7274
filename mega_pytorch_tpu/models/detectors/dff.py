"""DFF meta-architecture (Deep Feature Flow).

Parity with mega_core/modeling/detector/generalized_rcnn_dff.py:19-138:
  train — backbone on the reference (key) frame only; FlowNetS on the
  (cur/255, ref/255) pair; the key C4 features are flow-warped to the current
  frame and modulated by the predicted scale map; detection runs on the
  warped map with the standard single-frame heads.

  test — every KEY_FRAME_INTERVAL-th frame recomputes key features
  (vid_dff.py `frame_id % 10 == 0`); other frames warp the cached key map.
  The cache is an explicit ``DFFCarry``; the engine decides key-ness.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.warp import warp_by_flow
from ...structures.image_list import ImageBatch
from ..backbone.flownet import FlowNetS
from ..backbone.resnet import ResNetC4
from ..roi_heads.extractors import ResNetConv52MLPFeatureExtractor
from ..roi_heads.inference import Detections, postprocess_detections
from ..roi_heads.predictors import FPNPredictor
from ..roi_heads.subsample import fastrcnn_loss, subsample_proposals
from ..rpn.anchors import generate_cell_anchors, grid_anchors
from ..rpn.rpn import RPNHead, RPNSizes, add_gt_proposals, rpn_loss, rpn_postprocess
from .rcnn import RCNNConfig
from .rdn import VidConfig


class DFFCarry(NamedTuple):
    key_image: jnp.ndarray  # (H, W, 3) normalized key frame
    key_feats: jnp.ndarray  # (h, w, 1024) key C4 map
    key_size: jnp.ndarray  # (2,)


class GeneralizedRCNNDFF(nn.Module):
    c: RCNNConfig
    v: VidConfig

    def setup(self):
        dtype = jnp.dtype(self.c.compute_dtype)
        self.backbone = ResNetC4(
            depth=self.c.depth,
            freeze_at=self.c.freeze_at,
            stride_in_1x1=self.c.stride_in_1x1,
            norm=self.c.norm,
            dtype=dtype,
            name="backbone",
        )
        # FGFA subclasses this detector; the flownet variant (scale-map branch
        # for dff, plain flow for fgfa) follows the method config
        self.flownet = FlowNetS(method=self.v.method, dtype=dtype, name="flownet")
        self.rpn = RPNHead(
            in_channels=1024,
            num_anchors=self.c.num_anchors_per_cell,
            dtype=dtype,
            name="rpn",
        )
        self.extractor = ResNetConv52MLPFeatureExtractor(
            depth=self.c.depth,
            reduce_channel=self.c.reduce_channel,
            resolution=self.c.pooler_resolution,
            spatial_scale=self.c.pooler_scale,
            sampling_ratio=self.c.pooler_sampling_ratio,
            mlp_dim=self.c.mlp_dim,
            dilation=self.c.res5_dilation,
            stride_in_1x1=self.c.stride_in_1x1,
            norm=self.c.norm,
            dtype=dtype,
            name="extractor",
        )
        self.predictor = FPNPredictor(
            num_classes=self.c.num_classes,
            cls_agnostic_bbox_reg=self.c.cls_agnostic_bbox_reg,
            dtype=dtype,
            name="predictor",
        )

    def _anchors(self, feat_h: int, feat_w: int) -> jnp.ndarray:
        cell = generate_cell_anchors(
            self.c.anchor_stride, self.c.anchor_sizes, self.c.aspect_ratios
        )
        return grid_anchors(feat_h, feat_w, self.c.anchor_stride, cell)

    def flow_and_scale(self, img_cur: jnp.ndarray, img_ref: jnp.ndarray):
        """(B, H, W, 3) pairs → flow (B, h, w, 2) + scale map (B, h, w, 1024).

        The reference feeds normalized tensors divided by 255
        (generalized_rcnn_dff.py:92-94)."""
        pair = jnp.concatenate([img_cur / 255.0, img_ref / 255.0], axis=-1)
        return self.flownet(pair)

    def warped_features(self, img_cur, img_ref, feats_ref):
        flow, scale_map = self.flow_and_scale(img_cur, img_ref)
        flow = flow.astype(jnp.float32)
        warped = jax.vmap(warp_by_flow)(feats_ref.astype(jnp.float32), flow)
        return warped * scale_map.astype(jnp.float32)

    def _detect_heads_train(self, feats, im_sizes, gt, rng):
        c = self.c
        objectness, deltas = self.rpn(feats)
        anchors = self._anchors(feats.shape[1], feats.shape[2])
        rng_rpn, rng_roi = jax.random.split(rng)
        loss_obj, loss_rpn_box = rpn_loss(
            anchors, objectness, deltas, gt["boxes"], gt["valid"], im_sizes, rng_rpn,
            batch_size_per_image=c.rpn_batch_size,
            positive_fraction=c.rpn_positive_fraction,
            fg_iou=c.rpn_fg_iou, bg_iou=c.rpn_bg_iou,
            straddle_thresh=c.straddle_thresh,
        )
        sizes = RPNSizes(
            c.pre_nms_top_n_train, c.post_nms_top_n_train, c.rpn_nms_thresh,
            c.rpn_min_size,
        )
        props = rpn_postprocess(
            jax.lax.stop_gradient(objectness),
            jax.lax.stop_gradient(deltas),
            anchors, im_sizes, sizes,
        )
        props = add_gt_proposals(props, gt["boxes"], gt["valid"])
        rois = subsample_proposals(
            props.boxes, props.valid, gt["boxes"], gt["labels"], gt["valid"], rng_roi,
            bbox_reg_weights=c.bbox_reg_weights,
            batch_size_per_image=c.roi_batch_size,
            positive_fraction=c.roi_positive_fraction,
            fg_iou=c.roi_fg_iou, bg_iou=c.roi_bg_iou,
        )
        x = self.extractor(feats, rois.boxes)
        class_logits, box_reg = self.predictor(x)
        loss_cls, loss_box = fastrcnn_loss(class_logits, box_reg, rois, c.cls_agnostic_bbox_reg)
        return {
            "loss_objectness": loss_obj,
            "loss_rpn_box_reg": loss_rpn_box,
            "loss_classifier": loss_cls,
            "loss_box_reg": loss_box,
        }

    def _detect_heads_test(self, feats, im_sizes) -> Detections:
        c = self.c
        objectness, deltas = self.rpn(feats)
        anchors = self._anchors(feats.shape[1], feats.shape[2])
        sizes = RPNSizes(
            c.pre_nms_top_n_test, c.post_nms_top_n_test, c.rpn_nms_thresh,
            c.rpn_min_size,
        )
        props = rpn_postprocess(objectness, deltas, anchors, im_sizes, sizes)
        x = self.extractor(feats, props.boxes)
        class_logits, box_reg = self.predictor(x)
        return postprocess_detections(
            class_logits, box_reg, props.boxes, props.valid, im_sizes,
            bbox_reg_weights=c.bbox_reg_weights,
            score_thresh=c.score_thresh,
            nms_thresh=c.nms_thresh,
            detections_per_img=c.detections_per_img,
        )

    # -- train -------------------------------------------------------------------
    def __call__(self, images: ImageBatch, gt=None, rng=None, train: bool = False):
        assert train
        return self.forward_train(images, gt, rng)

    def forward_train(self, images: ImageBatch, gt: dict, rng: jax.Array):
        """images: 2 frames — [cur, ref]; detection happens on cur."""
        dtype = jnp.dtype(self.c.compute_dtype)
        img_cur = images.tensors[0:1]
        img_ref = images.tensors[1:2]
        feats_ref = self.backbone(img_ref.astype(dtype))
        feats = self.warped_features(img_cur, img_ref, feats_ref)
        return self._detect_heads_train(feats, images.sizes[0:1], gt, rng)

    # -- streaming test ------------------------------------------------------------
    def make_key(self, images: ImageBatch) -> DFFCarry:
        feats = self.backbone(images.tensors.astype(jnp.dtype(self.c.compute_dtype)))
        return DFFCarry(
            key_image=images.tensors[0], key_feats=feats[0], key_size=images.sizes[0]
        )

    def detect_non_key(self, carry: DFFCarry, images: ImageBatch) -> Detections:
        feats = self.warped_features(
            images.tensors, carry.key_image[None], carry.key_feats[None]
        )
        return self._detect_heads_test(feats, images.sizes)

    def detect_key(self, carry: DFFCarry, images: ImageBatch) -> Detections:
        """On key frames the reference still warps (cur == key ⇒ near-identity
        flow) — generalized_rcnn_dff.py:124-130 computes flow unconditionally."""
        return self.detect_non_key(carry, images)
