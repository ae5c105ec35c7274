"""Box predictors (mega_core/modeling/roi_heads/box_head/roi_box_predictors.py:6-63)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class FPNPredictor(nn.Module):
    """Linear cls/bbox heads on flat features — the VID predictor."""

    num_classes: int = 31
    cls_agnostic_bbox_reg: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (..., D) → logits (..., C), deltas (..., 4C or 8)."""
        scores = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_score",
        )(x)
        num_reg = 2 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_reg * 4,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="bbox_pred",
        )(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)


class FastRCNNPredictor(nn.Module):
    """Global-avgpool then linear heads (classic C4 predictor)."""

    num_classes: int = 31
    cls_agnostic_bbox_reg: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (..., H, W, C) pooled ROI maps."""
        x = x.mean(axis=(-3, -2))
        scores = nn.Dense(
            self.num_classes,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="cls_score",
        )(x)
        num_reg = 2 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_reg * 4,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="bbox_pred",
        )(x)
        return scores.astype(jnp.float32), deltas.astype(jnp.float32)
