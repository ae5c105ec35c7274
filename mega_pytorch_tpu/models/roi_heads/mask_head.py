"""Mask and keypoint heads (image-only detector zoo).

Parity with mega_core/modeling/roi_heads/mask_head/* (~700 LoC) and
keypoint_head/* (~600 LoC): extractors, predictors, losses, inference.
Unused by the VID methods (MODEL.MASK_ON / KEYPOINT_ON default False); kept
for framework completeness. Targets are rasterized host-side
(structures/segmentation.py); here everything is fixed-shape jax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.roi_align import roi_align
from ..backbone.resnet import ResNetRes5Head


class MaskRCNNFPNFeatureExtractor(nn.Module):
    """Pool 14x14 → 4 3x3 convs (mask_head/roi_mask_feature_extractors.py)."""

    resolution: int = 14
    spatial_scale: float = 1.0 / 16
    sampling_ratio: int = 0
    layers: tuple = (256, 256, 256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_map: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        """feat_map (B, H, W, C); rois (B, R, 4) → (B, R, res, res, C')."""
        pooled = jax.vmap(
            lambda f, r: roi_align(
                f, r, self.spatial_scale, self.resolution, self.resolution,
                self.sampling_ratio,
            )
        )(feat_map.astype(jnp.float32), rois)
        b, r = pooled.shape[0], pooled.shape[1]
        x = pooled.reshape(b * r, self.resolution, self.resolution, -1)
        for i, ch in enumerate(self.layers):
            x = nn.relu(
                nn.Conv(
                    ch, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name=f"mask_fcn{i + 1}",
                )(x.astype(self.dtype))
            )
        return x.reshape(b, r, *x.shape[1:])


class MaskRCNNC4Predictor(nn.Module):
    """2x deconv + 1x1 per-class mask logits (roi_mask_predictors.py)."""

    num_classes: int = 81
    dim_reduced: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x (B, R, res, res, C) → (B, R, 2*res, 2*res, num_classes)."""
        b, r = x.shape[0], x.shape[1]
        y = x.reshape(b * r, *x.shape[2:]).astype(self.dtype)
        y = nn.relu(
            nn.ConvTranspose(
                self.dim_reduced, (2, 2), strides=(2, 2), transpose_kernel=True,
                name="conv5_mask", dtype=self.dtype,
            )(y)
        )
        y = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="mask_fcn_logits")(y)
        return y.reshape(b, r, *y.shape[1:]).astype(jnp.float32)


def maskrcnn_loss(
    mask_logits: jnp.ndarray,  # (B, R, S, S, C)
    mask_targets: jnp.ndarray,  # (B, R, S, S) binary
    labels: jnp.ndarray,  # (B, R) int
    valid: jnp.ndarray,  # (B, R) — positives only
) -> jnp.ndarray:
    """Per-class BCE on positives (mask_head/loss.py)."""
    sel = jnp.take_along_axis(
        mask_logits, labels[:, :, None, None, None], axis=-1
    )[..., 0]
    logp = jax.nn.log_sigmoid(sel)
    log1mp = jax.nn.log_sigmoid(-sel)
    bce = -(mask_targets * logp + (1 - mask_targets) * log1mp)
    per_roi = bce.mean(axis=(-2, -1))
    return (per_roi * valid).sum() / jnp.maximum(valid.sum(), 1)


def maskrcnn_inference(mask_logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Sigmoid probability map of each detection's own class
    (mask_head/inference.py MaskPostProcessor)."""
    sel = jnp.take_along_axis(
        mask_logits, labels[:, :, None, None, None], axis=-1
    )[..., 0]
    return jax.nn.sigmoid(sel)


class KeypointRCNNFeatureExtractor(nn.Module):
    """Pool 14x14 → 8 3x3 convs of 512 (keypoint_head extractors)."""

    resolution: int = 14
    spatial_scale: float = 1.0 / 16
    sampling_ratio: int = 0
    layers: tuple = tuple(512 for _ in range(8))
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_map: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        pooled = jax.vmap(
            lambda f, r: roi_align(
                f, r, self.spatial_scale, self.resolution, self.resolution,
                self.sampling_ratio,
            )
        )(feat_map.astype(jnp.float32), rois)
        b, r = pooled.shape[0], pooled.shape[1]
        x = pooled.reshape(b * r, self.resolution, self.resolution, -1)
        for i, ch in enumerate(self.layers):
            x = nn.relu(
                nn.Conv(
                    ch, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    name=f"conv_fcn{i + 1}",
                )(x.astype(self.dtype))
            )
        return x.reshape(b, r, *x.shape[1:])


class KeypointRCNNPredictor(nn.Module):
    """Deconv x2 + bilinear x2 up to 56x56 heatmaps (keypoint predictors)."""

    num_keypoints: int = 17
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, r = x.shape[0], x.shape[1]
        y = x.reshape(b * r, *x.shape[2:]).astype(self.dtype)
        y = nn.ConvTranspose(
            self.num_keypoints, (4, 4), strides=(2, 2), transpose_kernel=True,
            padding="SAME", name="kps_score_lowres", dtype=self.dtype,
        )(y)
        y = jax.image.resize(
            y.astype(jnp.float32),
            (y.shape[0], y.shape[1] * 2, y.shape[2] * 2, y.shape[3]),
            method="bilinear",
        )
        return y.reshape(b, r, *y.shape[1:])


def keypointrcnn_loss(
    kp_logits: jnp.ndarray,  # (B, R, S, S, K)
    kp_targets: jnp.ndarray,  # (B, R, K) int heatmap index in [0, S*S)
    kp_visible: jnp.ndarray,  # (B, R, K) bool
) -> jnp.ndarray:
    """Spatial softmax CE at visible keypoints (keypoint_head/loss.py)."""
    b, r, s, _, k = kp_logits.shape
    flat = kp_logits.reshape(b, r, s * s, k).transpose(0, 1, 3, 2)  # (B, R, K, S*S)
    logp = jax.nn.log_softmax(flat, axis=-1)
    ce = -jnp.take_along_axis(logp, kp_targets[..., None], axis=-1)[..., 0]
    return (ce * kp_visible).sum() / jnp.maximum(kp_visible.sum(), 1)


def keypointrcnn_inference(kp_logits: jnp.ndarray, rois: jnp.ndarray):
    """Heatmap argmax → image coordinates (keypoint_head/inference.py)."""
    b, r, s, _, k = kp_logits.shape
    flat = kp_logits.reshape(b, r, s * s, k)
    idx = flat.argmax(axis=2)  # (B, R, K)
    scores = flat.max(axis=2)
    ys = (idx // s).astype(jnp.float32) + 0.5
    xs = (idx % s).astype(jnp.float32) + 0.5
    w = rois[..., 2] - rois[..., 0] + 1.0
    h = rois[..., 3] - rois[..., 1] + 1.0
    x_img = rois[..., 0:1] + xs / s * w[..., None]
    y_img = rois[..., 1:2] + ys / s * h[..., None]
    return jnp.stack([x_img, y_img], axis=-1), scores
