"""Combined ROI heads: box + optional mask + optional keypoint.

Parity with mega_core/modeling/roi_heads/roi_heads.py:9-76 (the dict of heads
behind MODEL.MASK_ON / KEYPOINT_ON — image-only; the VID methods use the box
head alone).

TPU redesign for mask targets: the reference crops GT *polygons* per proposal
in python inside the loss (mask_head/loss.py project_masks_on_boxes) — not
jittable. Here ground truth arrives as dense per-instance binary masks (the
loader rasterizes polygons once, structures/segmentation.py) and per-ROI
targets are cropped on device with ROIAlign over the matched instance's mask,
thresholded at 0.5 — the standard dense equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.roi_align import roi_align
from .mask_head import (
    KeypointRCNNFeatureExtractor,
    KeypointRCNNPredictor,
    MaskRCNNC4Predictor,
    MaskRCNNFPNFeatureExtractor,
    maskrcnn_inference,
    maskrcnn_loss,
)
from .subsample import SampledRois


def mask_targets_from_dense(
    gt_masks: jnp.ndarray,  # (G, Hm, Wm) binary instance masks (image frame)
    matched_gt: jnp.ndarray,  # (R,) index of each ROI's matched instance
    rois: jnp.ndarray,  # (R, 4) in image coordinates
    mask_size: int = 28,
    mask_scale: float = 1.0,  # Hm/Wm relative to image coords
) -> jnp.ndarray:
    """Crop each ROI's matched GT mask to (mask_size, mask_size)."""
    sel = gt_masks[matched_gt][..., None].astype(jnp.float32)  # (R, Hm, Wm, 1)
    pooled = jax.vmap(
        lambda m, r: roi_align(
            m, r[None], mask_scale, mask_size, mask_size, sampling_ratio=2
        )[0, ..., 0]
    )(sel, rois)
    return (pooled > 0.5).astype(jnp.float32)


class CombinedROIHeads(nn.Module):
    """Mask / keypoint branches over sampled ROIs and a shared feature map.

    The box branch lives in the detectors (it drives proposal sampling);
    this module adds the auxiliary branches the reference attaches via
    CombinedROIHeads, sharing the same feature map and sampled boxes."""

    mask_on: bool = False
    keypoint_on: bool = False
    num_classes: int = 81
    num_keypoints: int = 17
    mask_resolution: int = 14
    spatial_scale: float = 1.0 / 16
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.mask_on:
            self.mask_extractor = MaskRCNNFPNFeatureExtractor(
                resolution=self.mask_resolution,
                spatial_scale=self.spatial_scale,
                dtype=self.dtype,
                name="mask",
            )
            self.mask_predictor = MaskRCNNC4Predictor(
                num_classes=self.num_classes, dtype=self.dtype, name="mask_predictor"
            )
        if self.keypoint_on:
            self.kp_extractor = KeypointRCNNFeatureExtractor(
                spatial_scale=self.spatial_scale, dtype=self.dtype, name="keypoint"
            )
            self.kp_predictor = KeypointRCNNPredictor(
                num_keypoints=self.num_keypoints, dtype=self.dtype, name="keypoint_predictor"
            )

    def mask_logits(self, feat_map: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        """feat_map (B, H, W, C); rois (B, R, 4) → (B, R, 2*res, 2*res, C)."""
        return self.mask_predictor(self.mask_extractor(feat_map, rois))

    def mask_losses(
        self,
        feat_map: jnp.ndarray,
        rois: SampledRois,
        gt_masks: jnp.ndarray,  # (B, G, Hm, Wm)
        matched_gt: jnp.ndarray,  # (B, R)
        mask_scale: float = 1.0,
    ) -> dict:
        logits = self.mask_logits(feat_map, rois.boxes)
        size = logits.shape[2]
        targets = jax.vmap(
            lambda m, idx, r: mask_targets_from_dense(m, idx, r, size, mask_scale)
        )(gt_masks, matched_gt, rois.boxes)
        positives = rois.valid & (rois.labels > 0)
        return {"loss_mask": maskrcnn_loss(logits, targets, rois.labels, positives)}

    def mask_probs(self, feat_map, det_boxes, det_labels) -> jnp.ndarray:
        """Per-detection mask probability maps (inference)."""
        logits = self.mask_logits(feat_map, det_boxes)
        return maskrcnn_inference(logits, det_labels)

    def keypoint_logits(self, feat_map, rois) -> jnp.ndarray:
        return self.kp_predictor(self.kp_extractor(feat_map, rois))
