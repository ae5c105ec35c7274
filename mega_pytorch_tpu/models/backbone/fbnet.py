"""FBNet mobile backbone + heads builder (NHWC flax).

Parity with mega_core/modeling/backbone/{fbnet,fbnet_builder,fbnet_modeldef}.py
(~1300 LoC): arch defs are [expansion t, channels c, repeats n, stride s]
stage tables of inverted-residual blocks ("ir_k3" etc.), split into trunk /
rpn / bbox(/mask) head stage groups. The reference's arch registry is a dict
(add_archs); custom archs register the same way here. The MobileNetV2-style
block math (1x1 expand → depthwise kxk → 1x1 project, residual when shapes
match, BN+ReLU — batch-stats folded like the frozen-BN detector convention)
is re-expressed as flax modules; negative stride means upsample (mask head).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

# [t, c, n, s] stage tables — the reference's full arch zoo
# (fbnet_modeldef.py:12-218: default, xirb16d_dsmask, mobilenet_v2,
# cham_v1a, cham_v2); users add archs via add_archs. "kernels" (optional)
# gives the depthwise kernel size per block per stage (the reference's
# ir_k3/ir_k5/ir_k7 block_op_type tables); absent → arch-wide "kernel".
MODEL_ARCH = {
    "default": {
        "first": [32, 2],
        "stages": [
            [[1, 16, 1, 1]],
            [[6, 24, 2, 2]],
            [[6, 32, 3, 2]],
            [[6, 64, 4, 2], [6, 96, 3, 1]],
            [[4, 160, 1, 2], [6, 160, 2, 1], [6, 240, 1, 1]],
            [[6, 96, 3, 1]],
            [[4, 160, 1, 1], [6, 160, 3, 1], [3, 80, 1, -2]],
        ],
        "backbone": [0, 1, 2, 3],
        "rpn": [5],
        "bbox": [4],
        "mask": [6],
        "kernel": 3,
    },
    "xirb16d_dsmask": {
        "first": [16, 2],
        "stages": [
            [[1, 16, 1, 1]],
            [[6, 32, 2, 2]],
            [[6, 48, 3, 2]],
            [[6, 96, 4, 2], [6, 128, 3, 1]],
            [[4, 128, 1, 2], [6, 128, 2, 1], [6, 160, 1, 1]],
            [[4, 128, 1, 2], [6, 128, 2, 1], [6, 128, 1, -2], [3, 64, 1, -2]],
            [[6, 128, 3, 1]],
        ],
        "backbone": [0, 1, 2, 3],
        "rpn": [6],
        "bbox": [4],
        "mask": [5],
        "kernel": 3,
    },
    "mobilenet_v2": {
        "first": [32, 2],
        "stages": [
            [[1, 16, 1, 1]],
            [[6, 24, 2, 2]],
            [[6, 32, 3, 2]],
            [[6, 64, 4, 2], [6, 96, 3, 1]],
            [[6, 160, 3, 1], [6, 320, 1, 1]],
        ],
        "backbone": [0, 1, 2, 3],
        "bbox": [4],
        "kernel": 3,
    },
    "cham_v1a": {
        "first": [32, 2],
        "stages": [
            [[1, 24, 1, 1]],
            [[4, 48, 2, 2]],
            [[7, 64, 5, 2]],
            [[12, 56, 7, 2], [8, 88, 5, 1]],
            [[7, 152, 4, 2], [10, 104, 1, 1]],
            [[8, 88, 3, 1]],
        ],
        "kernels": [
            [3],
            [7] * 2,
            [3] * 5,
            [5] * 7 + [3] * 5,
            [3] * 5,
            [3] * 3,
        ],
        "backbone": [0, 1, 2, 3],
        "rpn": [5],
        "bbox": [4],
        "kernel": 3,
    },
    "cham_v2": {
        "first": [32, 2],
        "stages": [
            [[1, 24, 1, 1]],
            [[8, 32, 4, 2]],
            [[5, 48, 6, 2]],
            [[9, 56, 3, 2], [6, 56, 6, 1]],
            [[2, 160, 6, 2], [6, 112, 1, 1]],
            [[6, 56, 1, 1]],
        ],
        "kernels": [
            [3],
            [5] * 4,
            [7] * 6,
            [5] * 3 + [3] * 6,
            [3] * 7,
            [3],
        ],
        "backbone": [0, 1, 2, 3],
        "rpn": [5],
        "bbox": [4],
        "kernel": 3,
    },
}


def add_archs(archs: dict) -> None:
    for name, spec in archs.items():
        assert name not in MODEL_ARCH, f"Duplicated model name {name}"
        MODEL_ARCH[name] = spec


def _scale_channels(c: int, scale: float, divisor: int = 1) -> int:
    c = int(c * scale)
    return max(divisor, (c + divisor // 2) // divisor * divisor)


class IRFBlock(nn.Module):
    """Inverted residual: 1x1 expand → depthwise kxk → 1x1 project."""

    in_channels: int
    out_channels: int
    expansion: int
    stride: int
    kernel: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.in_channels * self.expansion
        y = x
        if self.expansion != 1:
            y = nn.relu(
                nn.GroupNorm(num_groups=1, name="pw_bn")(
                    nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype, name="pw")(y)
                )
            )
        k = self.kernel
        if self.stride >= 1:
            y = nn.Conv(
                mid, (k, k), strides=(self.stride, self.stride),
                padding=[(k // 2, k // 2)] * 2, feature_group_count=mid,
                use_bias=False, dtype=self.dtype, name="dw",
            )(y)
        else:  # negative stride = upsample then depthwise (mask head)
            up = -self.stride
            b, h, w, c = y.shape
            y = jnp.broadcast_to(
                y[:, :, None, :, None, :], (b, h, up, w, up, c)
            ).reshape(b, h * up, w * up, c)
            y = nn.Conv(
                mid, (k, k), padding=[(k // 2, k // 2)] * 2, feature_group_count=mid,
                use_bias=False, dtype=self.dtype, name="dw",
            )(y)
        y = nn.relu(nn.GroupNorm(num_groups=1, name="dw_bn")(y))
        y = nn.GroupNorm(num_groups=1, name="pwl_bn")(
            nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="pwl")(y)
        )
        if self.stride == 1 and self.in_channels == self.out_channels:
            y = y + x
        return y


class FBNetTrunk(nn.Module):
    """First conv + the arch's backbone stage group."""

    arch: str = "default"
    width_scale: float = 1.0
    width_divisor: int = 1
    stage_group: str = "backbone"
    in_channels: int | None = None  # None → images (use `first` conv)
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        spec = MODEL_ARCH[self.arch]
        last = spec["stages"][spec[self.stage_group][-1]][-1][1]
        return _scale_channels(last, self.width_scale, self.width_divisor)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = MODEL_ARCH[self.arch]
        kernel = spec.get("kernel", 3)
        if self.in_channels is None:
            c_first, s_first = spec["first"]
            c_first = _scale_channels(c_first, self.width_scale, self.width_divisor)
            x = nn.relu(
                nn.GroupNorm(num_groups=1, name="first_bn")(
                    nn.Conv(
                        c_first, (3, 3), strides=(s_first, s_first),
                        padding=[(1, 1)] * 2, use_bias=False, dtype=self.dtype,
                        name="first",
                    )(x)
                )
            )
            in_ch = c_first
        else:
            in_ch = self.in_channels

        block_id = 0
        for stage_idx in spec[self.stage_group]:
            stage_kernels = spec.get("kernels", [None] * len(spec["stages"]))[stage_idx]
            k_pos = 0
            for t, c, n, s in spec["stages"][stage_idx]:
                c = _scale_channels(c, self.width_scale, self.width_divisor)
                for i in range(n):
                    x = IRFBlock(
                        in_channels=in_ch,
                        out_channels=c,
                        expansion=t,
                        stride=s if i == 0 else 1,
                        kernel=(
                            stage_kernels[k_pos] if stage_kernels is not None
                            else kernel
                        ),
                        dtype=self.dtype,
                        name=f"block_{block_id}",
                    )(x)
                    in_ch = c
                    block_id += 1
                    k_pos += 1
        return x


def build_fbnet_backbone(cfg):
    """cfg.MODEL.FBNET → trunk module (backbone.py add_conv_body analog)."""
    return FBNetTrunk(
        arch=cfg.MODEL.FBNET.ARCH,
        width_scale=cfg.MODEL.FBNET.SCALE_FACTOR,
        width_divisor=cfg.MODEL.FBNET.WIDTH_DIVISOR,
        stage_group="backbone",
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE),
    )


def build_fbnet_head(cfg, group: str, in_channels: int):
    """bbox / rpn / mask head stage groups (fbnet.py add_roi_head etc.)."""
    return FBNetTrunk(
        arch=cfg.MODEL.FBNET.ARCH,
        width_scale=cfg.MODEL.FBNET.SCALE_FACTOR,
        width_divisor=cfg.MODEL.FBNET.WIDTH_DIVISOR,
        stage_group=group,
        in_channels=in_channels,
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE),
    )
