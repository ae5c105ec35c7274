"""FPN backbone variants (NHWC flax).

Parity with mega_core/modeling/backbone/fpn.py (lateral 1x1 + top-down
2x-upsample + 3x3 output convs; LastLevelMaxPool for Faster/Mask R-CNN,
LastLevelP6P7 for RetinaNet) and the R-*-FPN builders in backbone.py:23-72.
Unused by the VID methods (which are C4-only) but part of the framework's
detector zoo.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .resnet import STAGE_SPECS, ResNetStage, Stem


class ResNetFPNBody(nn.Module):
    """ResNet body returning every stage's feature map (C2..C5)."""

    depth: str = "R-50"
    freeze_at: int = 2
    stride_in_1x1: bool = True
    res2_out_channels: int = 256
    stem_out_channels: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        blocks = STAGE_SPECS[self.depth]
        x = Stem(self.stem_out_channels, dtype=self.dtype, name="stem")(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        outs = []
        in_ch = self.stem_out_channels
        for stage_idx, block_count in enumerate(blocks, start=1):
            factor = 2 ** (stage_idx - 1)
            out_ch = self.res2_out_channels * factor
            x = ResNetStage(
                block_count=block_count,
                in_channels=in_ch,
                bottleneck_channels=64 * factor,
                out_channels=out_ch,
                first_stride=1 if stage_idx == 1 else 2,
                stride_in_1x1=self.stride_in_1x1,
                dtype=self.dtype,
                name=f"layer{stage_idx}",
            )(x)
            if self.freeze_at >= stage_idx + 1:
                x = jax.lax.stop_gradient(x)
            outs.append(x)
            in_ch = out_ch
        return outs  # [C2, C3, C4, C5]


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor x2 (fpn.py uses F.interpolate(scale_factor=2))."""
    b, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
    ).reshape(b, 2 * h, 2 * w, c)


class FPN(nn.Module):
    """Lateral + top-down feature pyramid (fpn.py FPN)."""

    out_channels: int = 256
    top_block: str = "maxpool"  # "maxpool" | "p6p7" | "none"
    p6p7_in_from_c5: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> list[jnp.ndarray]:
        """inputs [C2..C5] (or [C3..C5] with a leading None skipped by the
        retinanet builder) → [P2..P5(+P6/P7)]."""
        feats = [f for f in inputs if f is not None]
        n = len(feats)
        offset = len(inputs) - n + 2  # first pyramid index (2 or 3)

        last_inner = nn.Conv(
            self.out_channels, (1, 1), dtype=self.dtype,
            name=f"fpn_inner{offset + n - 1}",
        )(feats[-1].astype(self.dtype))
        results = [
            nn.Conv(
                self.out_channels, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                name=f"fpn_layer{offset + n - 1}",
            )(last_inner)
        ]
        for i in range(n - 2, -1, -1):
            lateral = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype,
                name=f"fpn_inner{offset + i}",
            )(feats[i].astype(self.dtype))
            last_inner = lateral + _upsample2x(last_inner)
            results.insert(
                0,
                nn.Conv(
                    self.out_channels, (3, 3), padding=[(1, 1)] * 2,
                    dtype=self.dtype, name=f"fpn_layer{offset + i}",
                )(last_inner),
            )

        if self.top_block == "maxpool":
            results.append(
                nn.max_pool(results[-1], (1, 1), strides=(2, 2))
            )
        elif self.top_block == "p6p7":
            src = feats[-1] if self.p6p7_in_from_c5 else results[-1]
            p6 = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                dtype=self.dtype, name="p6",
            )(src.astype(self.dtype))
            p7 = nn.Conv(
                self.out_channels, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2,
                dtype=self.dtype, name="p7",
            )(nn.relu(p6))
            results.extend([p6, p7])
        return results
