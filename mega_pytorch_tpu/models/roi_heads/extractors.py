"""ROI box feature extractors (base variants).

Parity with mega_core/modeling/roi_heads/box_head/roi_box_feature_extractors.py:
  * ResNetConv52MLPFeatureExtractor (:54-118) — the VID workhorse: res5 runs on
    the full C4 map (stride_init=1, dilation 2), optional 1x1 channel-reduce
    (R-50 configs), ROIAlign pooling, then fc6/fc7 (1024-d).
  * ResNet50Conv5ROIFeatureExtractor (:18-51) — classic C4: pool 14x14 ROIs,
    then res5 with stride 2.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.roi_align import roi_align
from ..backbone.resnet import ResNetRes5Head


class ResNetConv52MLPFeatureExtractor(nn.Module):
    """res5-on-map → (optional 1x1 reduce) → ROIAlign → fc6 → fc7."""

    depth: str = "R-50"
    reduce_channel: bool = True
    resolution: int = 7
    spatial_scale: float = 1.0 / 16
    sampling_ratio: int = 0
    mlp_dim: int = 1024
    dilation: int = 2
    stride_in_1x1: bool = True
    norm: str = "frozen_bn"
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.mlp_dim

    def setup(self):
        self.head = ResNetRes5Head(
            depth=self.depth,
            stride_init=1,
            dilation=self.dilation,
            stride_in_1x1=self.stride_in_1x1,
            norm=self.norm,
            dtype=self.dtype,
            name="head",
        )
        if self.reduce_channel:
            self.conv = nn.Conv(256, (1, 1), dtype=self.dtype, name="conv")
        self.fc6 = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc6")
        self.fc7 = nn.Dense(self.mlp_dim, dtype=self.dtype, name="fc7")

    def enhance_features(self, c4: jnp.ndarray) -> jnp.ndarray:
        """res5 (+reduce) on the full map; computed once per image."""
        x = self.head(c4)
        if self.reduce_channel:
            x = nn.relu(self.conv(x))
        return x

    def pool_and_fc(self, feat_map: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        """feat_map: (B, H, W, C); rois: (B, R, 4) → (B, R, mlp_dim)."""
        pooled = jax.vmap(
            lambda f, r: roi_align(
                f,
                r,
                self.spatial_scale,
                self.resolution,
                self.resolution,
                self.sampling_ratio,
            )
        )(feat_map.astype(jnp.float32), rois)
        b, r = pooled.shape[0], pooled.shape[1]
        flat = pooled.reshape(b, r, -1).astype(self.dtype)
        x = nn.relu(self.fc6(flat))
        return nn.relu(self.fc7(x)).astype(jnp.float32)

    def __call__(self, c4: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        """c4: (B, H, W, 1024); rois: (B, R, 4) → (B, R, mlp_dim)."""
        return self.pool_and_fc(self.enhance_features(c4), rois)


class ResNet50Conv5ROIFeatureExtractor(nn.Module):
    """Pool 14x14 ROI features, then res5 with stride 2 → (R, 7, 7, 2048)."""

    depth: str = "R-50"
    resolution: int = 14
    spatial_scale: float = 1.0 / 16
    sampling_ratio: int = 0
    dilation: int = 1
    stride_in_1x1: bool = True
    norm: str = "frozen_bn"
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return 2048

    @nn.compact
    def __call__(self, c4: jnp.ndarray, rois: jnp.ndarray) -> jnp.ndarray:
        pooled = jax.vmap(
            lambda f, r: roi_align(
                f,
                r,
                self.spatial_scale,
                self.resolution,
                self.resolution,
                self.sampling_ratio,
            )
        )(c4.astype(jnp.float32), rois)
        b, r = pooled.shape[0], pooled.shape[1]
        x = pooled.reshape(b * r, self.resolution, self.resolution, -1)
        x = ResNetRes5Head(
            depth=self.depth,
            stride_init=2,
            dilation=self.dilation,
            stride_in_1x1=self.stride_in_1x1,
            norm=self.norm,
            dtype=self.dtype,
            name="head",
        )(x.astype(self.dtype))
        return x.reshape(b, r, *x.shape[1:]).astype(jnp.float32)
