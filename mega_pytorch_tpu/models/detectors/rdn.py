"""RDN meta-architecture (Relation Distillation Networks).

Parity with mega_core/modeling/detector/generalized_rcnn_rdn.py:21-190:
  train — current frame + REF_NUM reference frames through one backbone pass;
  key-version RPN on the current frame (losses + 300+GT proposals, subsampled
  to 128), ref-version RPN (75 proposals) on every frame; RDN attention in the
  box head; CE/smooth-L1 losses.

  test — streaming over a ``all_frame_interval``(37)-slot ring buffer whose
  key sits at slot ``key_frame_location``(18). The reference mutates deques
  and reads frames from disk inside the module; here the state is an explicit
  fixed-shape ``RDNCarry`` and the engine owns frame IO/warmup, so the whole
  per-frame step jits and scans.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...structures.image_list import ImageBatch
from ..roi_heads.inference import Detections, postprocess_detections
from ..roi_heads.predictors import FPNPredictor
from ..roi_heads.subsample import fastrcnn_loss, subsample_proposals
from ..roi_heads.vid_extractors import RDNFeatureExtractor
from ..backbone.resnet import ResNetC4
from ..rpn.anchors import generate_cell_anchors, grid_anchors
from ..rpn.rpn import (
    RPNHead,
    RPNSizes,
    add_gt_proposals,
    rpn_loss,
    rpn_postprocess,
    shared_ref_key_postprocess,
)
from .rcnn import RCNNConfig


class VidConfig(NamedTuple):
    """Static video-method hyperparameters (MODEL.VID.* defaults)."""

    method: str = "rdn"
    base_stage: int = 2
    advanced_stage: int = 0
    embed_dim: int = 64
    groups: int = 16
    ref_num: int = 2
    all_frame_interval: int = 37
    key_frame_location: int = 18
    ratio: float = 0.2
    # MEGA extras
    memory_enable: bool = True
    memory_size: int = 25
    global_enable: bool = True
    global_size: int = 10
    global_res_stage: int = 1
    ref_num_local: int = 2
    ref_num_mem: int = 3
    ref_num_global: int = 2

    @classmethod
    def from_cfg(cls, cfg) -> "VidConfig":
        v = cfg.MODEL.VID
        method = v.METHOD
        node = {
            "rdn": v.RDN,
            "mega": v.MEGA,
            "fgfa": v.FGFA,
            "dff": v.DFF,
        }.get(method)
        kw = dict(
            method=method,
            base_stage=v.ROI_BOX_HEAD.ATTENTION.STAGE,
            advanced_stage=v.ROI_BOX_HEAD.ATTENTION.ADVANCED_STAGE,
            embed_dim=v.ROI_BOX_HEAD.ATTENTION.EMBED_DIM,
            groups=v.ROI_BOX_HEAD.ATTENTION.GROUP,
        )
        if method in ("rdn", "fgfa"):
            kw.update(ref_num=node.REF_NUM)
        if method in ("rdn", "fgfa", "mega"):
            kw.update(
                all_frame_interval=node.ALL_FRAME_INTERVAL,
                key_frame_location=node.KEY_FRAME_LOCATION,
            )
        if method in ("rdn", "mega"):
            kw.update(ratio=node.RATIO)
        if method == "mega":
            kw.update(
                memory_enable=v.MEGA.MEMORY.ENABLE,
                memory_size=v.MEGA.MEMORY.SIZE,
                global_enable=v.MEGA.GLOBAL.ENABLE,
                global_size=v.MEGA.GLOBAL.SIZE,
                global_res_stage=v.MEGA.GLOBAL.RES_STAGE,
                ref_num_local=v.MEGA.REF_NUM_LOCAL,
                ref_num_mem=v.MEGA.REF_NUM_MEM,
                ref_num_global=v.MEGA.REF_NUM_GLOBAL,
            )
        return cls(**kw)

    @property
    def advanced_num(self) -> int:
        return int(75 * self.ratio)  # base_num fixed by REF_POST_NMS_TOP_N


class RDNCarry(NamedTuple):
    """Streaming state: ring buffers with the newest frame at index -1.

    TPU redesign: like MEGACarry, the key-frame proposals and pooled ROI
    features are computed when a frame ENTERS the window (deterministic
    network ⇒ identical values), so no feature maps are cached and detect
    runs zero convolutions."""

    rois: jnp.ndarray  # (T, base_num, 4)
    roi_valid: jnp.ndarray  # (T, base_num)
    feats: jnp.ndarray  # (T, base_num, mlp_dim) fc0'd pooled features
    key_rois: jnp.ndarray  # (T, K, 4)
    key_valid: jnp.ndarray  # (T, K)
    key_feats: jnp.ndarray  # (T, K, mlp_dim) fcs[0]-applied key ROI features
    sizes: jnp.ndarray  # (T, 2) per-frame true (h, w)


def _push(buf: jnp.ndarray, new: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([buf[1:], new[None]], axis=0)


class GeneralizedRCNNRDN(nn.Module):
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
        self.rpn = RPNHead(
            in_channels=1024,
            num_anchors=self.c.num_anchors_per_cell,
            dtype=dtype,
            name="rpn",
        )
        self.extractor = RDNFeatureExtractor(
            depth=self.c.depth,
            reduce_channel=self.c.reduce_channel,
            resolution=self.c.pooler_resolution,
            spatial_scale=self.c.pooler_scale,
            sampling_ratio=self.c.pooler_sampling_ratio,
            mlp_dim=self.c.mlp_dim,
            dilation=self.c.res5_dilation,
            stride_in_1x1=self.c.stride_in_1x1,
            norm=self.c.norm,
            base_stage=self.v.base_stage,
            advanced_stage=self.v.advanced_stage,
            base_num=self.c.ref_post_nms_top_n,
            advanced_num=int(self.c.ref_post_nms_top_n * self.v.ratio),
            embed_dim=self.v.embed_dim,
            groups=self.v.groups,
            dtype=dtype,
            name="extractor",
        )
        self.predictor = FPNPredictor(
            num_classes=self.c.num_classes,
            cls_agnostic_bbox_reg=self.c.cls_agnostic_bbox_reg,
            dtype=dtype,
            name="predictor",
        )

    # -- shared helpers ------------------------------------------------------
    def _anchors(self, feat_h: int, feat_w: int) -> jnp.ndarray:
        cell = generate_cell_anchors(
            self.c.anchor_stride, self.c.anchor_sizes, self.c.aspect_ratios
        )
        return grid_anchors(feat_h, feat_w, self.c.anchor_stride, cell)

    def _ref_sizes(self) -> RPNSizes:
        return RPNSizes(
            self.c.ref_pre_nms_top_n,
            self.c.ref_post_nms_top_n,
            self.c.rpn_nms_thresh,
            self.c.rpn_min_size,
        )

    def _key_sizes(self, train: bool) -> RPNSizes:
        return RPNSizes(
            self.c.pre_nms_top_n_train if train else self.c.pre_nms_top_n_test,
            self.c.post_nms_top_n_train if train else self.c.post_nms_top_n_test,
            self.c.rpn_nms_thresh,
            self.c.rpn_min_size,
        )

    def _ref_proposals(self, feats: jnp.ndarray, sizes: jnp.ndarray):
        """ref-version RPN (rpn.py:240-243) — 75 proposals, no gradients."""
        objectness, deltas = self.rpn(feats)
        anchors = self._anchors(feats.shape[1], feats.shape[2])
        props = rpn_postprocess(
            jax.lax.stop_gradient(objectness),
            jax.lax.stop_gradient(deltas),
            anchors,
            sizes,
            self._ref_sizes(),
        )
        return props

    # -- train ---------------------------------------------------------------
    def __call__(self, images: ImageBatch, gt=None, rng=None, train: bool = False):
        assert train, "use test_step/precompute for streaming inference"
        return self.forward_train(images, gt, rng)

    def forward_train(self, images: ImageBatch, gt: dict, rng: jax.Array):
        """images: (1+ref_num) frames of one video; frame 0 is current.

        gt holds frame-0 ground truth with leading dim 1.
        """
        c = self.c
        dtype = jnp.dtype(c.compute_dtype)
        feats = self.backbone(images.tensors.astype(dtype))  # (F, h, w, 1024)
        cur_feats = feats[0:1]
        cur_size = images.sizes[0:1]

        objectness, deltas = self.rpn(cur_feats)
        anchors = self._anchors(feats.shape[1], feats.shape[2])
        rng_rpn, rng_roi = jax.random.split(rng)
        loss_obj, loss_rpn_box = rpn_loss(
            anchors, objectness, deltas, gt["boxes"], gt["valid"], cur_size, rng_rpn,
            batch_size_per_image=c.rpn_batch_size,
            positive_fraction=c.rpn_positive_fraction,
            fg_iou=c.rpn_fg_iou, bg_iou=c.rpn_bg_iou,
            straddle_thresh=c.straddle_thresh,
        )
        key_props = rpn_postprocess(
            jax.lax.stop_gradient(objectness),
            jax.lax.stop_gradient(deltas),
            anchors, cur_size, self._key_sizes(train=True),
        )
        key_props = add_gt_proposals(key_props, gt["boxes"], gt["valid"])
        rois = subsample_proposals(
            key_props.boxes, key_props.valid,
            gt["boxes"], gt["labels"], gt["valid"], rng_roi,
            bbox_reg_weights=c.bbox_reg_weights,
            batch_size_per_image=c.roi_batch_size,
            positive_fraction=c.roi_positive_fraction,
            fg_iou=c.roi_fg_iou, bg_iou=c.roi_bg_iou,
        )

        # ref proposals for every frame (incl. current), 75 each
        ref_props = self._ref_proposals(feats, images.sizes)

        x = self.extractor.extract_train(
            feats, rois.boxes[0], ref_props.boxes, ref_props.valid
        )
        class_logits, box_reg = self.predictor(x)
        loss_cls, loss_box = fastrcnn_loss(
            class_logits[None], box_reg[None], rois, c.cls_agnostic_bbox_reg
        )
        return {
            "loss_objectness": loss_obj,
            "loss_rpn_box_reg": loss_rpn_box,
            "loss_classifier": loss_cls,
            "loss_box_reg": loss_box,
        }

    # -- streaming test --------------------------------------------------------
    def precompute(self, images: ImageBatch):
        """One frame → cache entry: backbone + res5 once, ref (75) and key
        (300) proposal sets, pooled features for both."""
        feats = self.backbone(
            images.tensors.astype(jnp.dtype(self.c.compute_dtype))
        )
        objectness, deltas = self.rpn(feats)
        anchors = self._anchors(feats.shape[1], feats.shape[2])
        ref_props, key_props, prefix = shared_ref_key_postprocess(
            objectness, deltas, anchors, images.sizes,
            self._ref_sizes(), self._key_sizes(train=False),
        )
        enhanced = self.extractor.enhance_features(feats)
        key_feats = self.extractor.fc0(
            self.extractor.pool_flat(enhanced[0], key_props.boxes[0])
        )
        ref_feats = (
            key_feats[: self.c.ref_post_nms_top_n]
            if prefix
            else self.extractor.fc0(
                self.extractor.pool_flat(enhanced[0], ref_props.boxes[0])
            )
        )
        return {
            "rois": ref_props.boxes[0], "roi_valid": ref_props.valid[0],
            "feats": ref_feats,
            "key_rois": key_props.boxes[0], "key_valid": key_props.valid[0],
            "key_feats": key_feats,
        }

    def init_carry(self, entry, size) -> RDNCarry:
        """Fill all T slots with frame 0's cache (the reference's warmup
        replication, generalized_rcnn_rdn.py:146-151)."""
        t = self.v.all_frame_interval
        tile = lambda a: jnp.tile(a[None], (t,) + (1,) * a.ndim)  # noqa: E731
        return RDNCarry(
            rois=tile(entry["rois"]), roi_valid=tile(entry["roi_valid"]),
            feats=tile(entry["feats"]),
            key_rois=tile(entry["key_rois"]), key_valid=tile(entry["key_valid"]),
            key_feats=tile(entry["key_feats"]),
            sizes=tile(size),
        )

    def push_carry(self, carry: RDNCarry, entry, size) -> RDNCarry:
        return RDNCarry(
            rois=_push(carry.rois, entry["rois"]),
            roi_valid=_push(carry.roi_valid, entry["roi_valid"]),
            feats=_push(carry.feats, entry["feats"]),
            key_rois=_push(carry.key_rois, entry["key_rois"]),
            key_valid=_push(carry.key_valid, entry["key_valid"]),
            key_feats=_push(carry.key_feats, entry["key_feats"]),
            sizes=_push(carry.sizes, size),
        )

    def detect_key(self, carry: RDNCarry) -> Detections:
        """Detect on the key-slot frame using all cached refs.

        Convolution-free: key proposals + pooled features were computed when
        the frame entered the window."""
        c, v = self.c, self.v
        k = v.key_frame_location
        key_size = carry.sizes[k][None]
        key_rois = carry.key_rois[k]
        key_valid = carry.key_valid[k]

        t = v.all_frame_interval
        m = t * c.ref_post_nms_top_n
        x = self.extractor.extract_test(
            carry.key_feats[k],
            key_rois,
            carry.rois.reshape(m, 4),
            carry.roi_valid.reshape(m),
            carry.feats.reshape(m, -1),
        )
        class_logits, box_reg = self.predictor(x)
        return postprocess_detections(
            class_logits[None], box_reg[None], key_rois[None], key_valid[None], key_size,
            bbox_reg_weights=c.bbox_reg_weights,
            score_thresh=c.score_thresh,
            nms_thresh=c.nms_thresh,
            detections_per_img=c.detections_per_img,
        )

    def test_step(self, carry: RDNCarry, images: ImageBatch):
        """Steady-state streaming step: push one frame, detect at the key slot."""
        entry = self.precompute(images)
        carry = self.push_carry(carry, entry, images.sizes[0])
        return carry, self.detect_key(carry)
