"""Single-frame Faster R-CNN meta-architecture (the `base` VID method).

Parity with mega_core/modeling/detector/generalized_rcnn.py:16-65 on fixed
shapes: backbone C4 → RPN (losses + proposals with GT appended under
stop-gradient) → subsample 128 ROIs → res5-on-map extractor → FPNPredictor →
CE/smooth-L1 (train) or padded Detections (eval).

All static hyperparameters are collected in ``RCNNConfig`` (a hashable
NamedTuple) so the flax module is a proper frozen dataclass.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...structures.image_list import ImageBatch
from ..backbone.resnet import ResNetC4
from ..roi_heads.extractors import ResNetConv52MLPFeatureExtractor
from ..roi_heads.inference import Detections, postprocess_detections
from ..roi_heads.predictors import FPNPredictor
from ..roi_heads.subsample import fastrcnn_loss, subsample_proposals
from ..rpn.anchors import generate_cell_anchors, grid_anchors
from ..rpn.rpn import (
    RPNHead,
    RPNSizes,
    add_gt_proposals,
    rpn_loss,
    rpn_postprocess,
)


class RCNNConfig(NamedTuple):
    """Static hyperparameters for the detection stack (reference defaults for
    the VID recipe, configs/BASE_RCNN_1gpu.yaml)."""

    depth: str = "R-50"
    num_classes: int = 31
    compute_dtype: str = "float32"
    freeze_at: int = 2
    stride_in_1x1: bool = True
    norm: str = "frozen_bn"  # "gn" for the *WithGN TRANS_FUNC/STEM_FUNC variants
    # anchors / RPN
    anchor_sizes: tuple = (64, 128, 256, 512)
    aspect_ratios: tuple = (0.5, 1.0, 2.0)
    anchor_stride: int = 16
    straddle_thresh: float = 0.0
    rpn_fg_iou: float = 0.7
    rpn_bg_iou: float = 0.3
    rpn_batch_size: int = 256
    rpn_positive_fraction: float = 0.5
    pre_nms_top_n_train: int = 6000
    pre_nms_top_n_test: int = 6000
    post_nms_top_n_train: int = 300
    post_nms_top_n_test: int = 300
    ref_pre_nms_top_n: int = 6000
    ref_post_nms_top_n: int = 75
    rpn_nms_thresh: float = 0.7
    rpn_min_size: float = 0.0
    # ROI head
    reduce_channel: bool = True
    mlp_dim: int = 1024
    pooler_resolution: int = 7
    pooler_scale: float = 1.0 / 16
    pooler_sampling_ratio: int = 0
    res5_dilation: int = 2
    roi_batch_size: int = 128
    roi_positive_fraction: float = 0.25
    roi_fg_iou: float = 0.5
    roi_bg_iou: float = 0.5
    bbox_reg_weights: tuple = (10.0, 10.0, 5.0, 5.0)
    cls_agnostic_bbox_reg: bool = False
    # test
    score_thresh: float = 0.001
    nms_thresh: float = 0.5
    detections_per_img: int = 300
    # padding
    max_gt_boxes: int = 32

    @classmethod
    def from_cfg(cls, cfg) -> "RCNNConfig":
        return cls(
            depth="-".join(cfg.MODEL.BACKBONE.CONV_BODY.split("-")[:2]),
            num_classes=cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES,
            compute_dtype=cfg.TPU.COMPUTE_DTYPE,
            freeze_at=cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
            stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
            norm="gn" if cfg.MODEL.RESNETS.TRANS_FUNC.endswith("WithGN") else "frozen_bn",
            anchor_sizes=tuple(cfg.MODEL.RPN.ANCHOR_SIZES),
            aspect_ratios=tuple(cfg.MODEL.RPN.ASPECT_RATIOS),
            anchor_stride=cfg.MODEL.RPN.ANCHOR_STRIDE[0],
            straddle_thresh=cfg.MODEL.RPN.STRADDLE_THRESH,
            rpn_fg_iou=cfg.MODEL.RPN.FG_IOU_THRESHOLD,
            rpn_bg_iou=cfg.MODEL.RPN.BG_IOU_THRESHOLD,
            rpn_batch_size=cfg.MODEL.RPN.BATCH_SIZE_PER_IMAGE,
            rpn_positive_fraction=cfg.MODEL.RPN.POSITIVE_FRACTION,
            pre_nms_top_n_train=cfg.MODEL.RPN.PRE_NMS_TOP_N_TRAIN,
            pre_nms_top_n_test=cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST,
            post_nms_top_n_train=cfg.MODEL.RPN.POST_NMS_TOP_N_TRAIN,
            post_nms_top_n_test=cfg.MODEL.RPN.POST_NMS_TOP_N_TEST,
            ref_pre_nms_top_n=cfg.MODEL.VID.RPN.REF_PRE_NMS_TOP_N,
            ref_post_nms_top_n=cfg.MODEL.VID.RPN.REF_POST_NMS_TOP_N,
            rpn_nms_thresh=cfg.MODEL.RPN.NMS_THRESH,
            rpn_min_size=cfg.MODEL.RPN.MIN_SIZE,
            reduce_channel=cfg.MODEL.VID.ROI_BOX_HEAD.REDUCE_CHANNEL,
            mlp_dim=cfg.MODEL.ROI_BOX_HEAD.MLP_HEAD_DIM,
            pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
            pooler_scale=cfg.MODEL.ROI_BOX_HEAD.POOLER_SCALES[0],
            pooler_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO,
            res5_dilation=cfg.MODEL.RESNETS.RES5_DILATION,
            roi_batch_size=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
            roi_positive_fraction=cfg.MODEL.ROI_HEADS.POSITIVE_FRACTION,
            roi_fg_iou=cfg.MODEL.ROI_HEADS.FG_IOU_THRESHOLD,
            roi_bg_iou=cfg.MODEL.ROI_HEADS.BG_IOU_THRESHOLD,
            bbox_reg_weights=tuple(cfg.MODEL.ROI_HEADS.BBOX_REG_WEIGHTS),
            cls_agnostic_bbox_reg=cfg.MODEL.CLS_AGNOSTIC_BBOX_REG,
            score_thresh=cfg.MODEL.ROI_HEADS.SCORE_THRESH,
            nms_thresh=cfg.MODEL.ROI_HEADS.NMS,
            detections_per_img=cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG,
            max_gt_boxes=cfg.TPU.MAX_GT_BOXES,
        )

    @property
    def num_anchors_per_cell(self) -> int:
        return len(self.anchor_sizes) * len(self.aspect_ratios)


class GeneralizedRCNN(nn.Module):
    """Backbone → RPN → ROI box head. Pure function of (params, inputs, rng)."""

    c: RCNNConfig

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

    def features(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.backbone(images.astype(jnp.dtype(self.c.compute_dtype)))

    def __call__(self, images: ImageBatch, gt=None, rng=None, train: bool = False):
        if train:
            return self.forward_train(images, gt, rng)
        return self.forward_test(images)

    def forward_train(self, images: ImageBatch, gt: dict, rng: jax.Array):
        """gt: {"boxes": (B, G, 4), "labels": (B, G), "valid": (B, G)}."""
        c = self.c
        feats = self.features(images.tensors)
        objectness, box_deltas = self.rpn(feats)
        anchors = self._anchors(feats.shape[1], feats.shape[2])

        rng_rpn, rng_roi = jax.random.split(rng)
        loss_obj, loss_rpn_box = rpn_loss(
            anchors, objectness, box_deltas,
            gt["boxes"], gt["valid"], images.sizes, rng_rpn,
            batch_size_per_image=c.rpn_batch_size,
            positive_fraction=c.rpn_positive_fraction,
            fg_iou=c.rpn_fg_iou, bg_iou=c.rpn_bg_iou,
            straddle_thresh=c.straddle_thresh,
        )

        sizes = RPNSizes(
            c.pre_nms_top_n_train, c.post_nms_top_n_train, c.rpn_nms_thresh,
            c.rpn_min_size,
        )
        proposals = rpn_postprocess(
            jax.lax.stop_gradient(objectness),
            jax.lax.stop_gradient(box_deltas),
            anchors, images.sizes, sizes,
        )
        proposals = add_gt_proposals(proposals, gt["boxes"], gt["valid"])

        rois = subsample_proposals(
            proposals.boxes, proposals.valid,
            gt["boxes"], gt["labels"], gt["valid"], rng_roi,
            bbox_reg_weights=c.bbox_reg_weights,
            batch_size_per_image=c.roi_batch_size,
            positive_fraction=c.roi_positive_fraction,
            fg_iou=c.roi_fg_iou, bg_iou=c.roi_bg_iou,
        )

        x = self.extractor(feats, rois.boxes)
        class_logits, box_regression = self.predictor(x)
        loss_cls, loss_box = fastrcnn_loss(
            class_logits, box_regression, rois, c.cls_agnostic_bbox_reg
        )
        return {
            "loss_objectness": loss_obj,
            "loss_rpn_box_reg": loss_rpn_box,
            "loss_classifier": loss_cls,
            "loss_box_reg": loss_box,
        }

    def forward_test(self, images: ImageBatch) -> Detections:
        c = self.c
        feats = self.features(images.tensors)
        objectness, box_deltas = self.rpn(feats)
        anchors = self._anchors(feats.shape[1], feats.shape[2])
        sizes = RPNSizes(
            c.pre_nms_top_n_test, c.post_nms_top_n_test, c.rpn_nms_thresh,
            c.rpn_min_size,
        )
        proposals = rpn_postprocess(objectness, box_deltas, anchors, images.sizes, sizes)
        x = self.extractor(feats, proposals.boxes)
        class_logits, box_regression = self.predictor(x)
        return postprocess_detections(
            class_logits, box_regression, proposals.boxes, proposals.valid,
            images.sizes,
            bbox_reg_weights=c.bbox_reg_weights,
            score_thresh=c.score_thresh,
            nms_thresh=c.nms_thresh,
            detections_per_img=c.detections_per_img,
        )


def make_empty_gt(batch: int, max_gt: int = 32) -> dict:
    return {
        "boxes": jnp.zeros((batch, max_gt, 4), jnp.float32),
        "labels": jnp.zeros((batch, max_gt), jnp.int32),
        "valid": jnp.zeros((batch, max_gt), bool),
    }


def pad_gt(boxes: np.ndarray, labels: np.ndarray, max_gt: int = 32) -> dict:
    """Pad one image's ground truth to static shapes (host-side helper)."""
    g = min(len(boxes), max_gt)
    out_boxes = np.zeros((max_gt, 4), np.float32)
    out_labels = np.zeros((max_gt,), np.int32)
    out_valid = np.zeros((max_gt,), bool)
    out_boxes[:g] = boxes[:g]
    out_labels[:g] = labels[:g]
    out_valid[:g] = True
    return {"boxes": out_boxes, "labels": out_labels, "valid": out_valid}
