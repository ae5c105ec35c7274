"""ResNet C4 backbone + res5 head, TPU-native (NHWC, flax.linen).

Architecture parity with mega_core/modeling/backbone/resnet.py:81-451:
frozen-BN bottlenecks, stride on the first 1x1 conv (STRIDE_IN_1X1, MSRA
style), stage freezing via stop_gradient at FREEZE_CONV_BODY_AT, and a
separately-instantiable res5 stage (``ResNetHead``) with ``stride_init=1`` and
dilation 2 for the VID C4 heads (roi_box_feature_extractors.py:62-73).

Module names mirror the torch state-dict layout (stem/layer{N}/{i}/conv{j},
bn{j}, downsample) so checkpoint ingestion is a mechanical rename
(utils/torch_ingest.py).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..layers import FrozenBatchNorm2d


def make_norm(kind: str, features: int, dtype, name: str):
    """Norm factory: FrozenBN (default) or GroupNorm-32 — the reference's
    *WithFixedBatchNorm / *WithGN transformation variants (resnet.py:370-451,
    make_layers.group_norm with NUM_GROUPS=32)."""
    if kind == "gn":
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=dtype, name=name)
    return FrozenBatchNorm2d(features, dtype=dtype, name=name)


# stage block counts (resnet.py:44-80); R-14 is a one-block-per-stage testing
# spec (same channel plan and code path, minimal graph) for fast compiles in
# the test suite and the driver's multi-chip dryrun.
STAGE_SPECS = {
    "R-14": (1, 1, 1, 1),
    "R-50": (3, 4, 6, 3),
    "R-101": (3, 4, 23, 3),
    "R-152": (3, 8, 36, 3),
}


class Bottleneck(nn.Module):
    """1x1 → 3x3 → 1x1 residual block with frozen BN (resnet.py:239-364)."""

    in_channels: int
    bottleneck_channels: int
    out_channels: int
    stride: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    num_groups: int = 1
    norm: str = "frozen_bn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stride = 1 if self.dilation > 1 else self.stride
        stride_1x1, stride_3x3 = (
            (stride, 1) if self.stride_in_1x1 else (1, stride)
        )

        identity = x
        if self.in_channels != self.out_channels:
            down_stride = self.stride if self.dilation == 1 else 1
            identity = nn.Conv(
                self.out_channels,
                (1, 1),
                strides=(down_stride, down_stride),
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            identity = make_norm(
                self.norm, self.out_channels, self.dtype, "downsample_bn"
            )(identity)

        out = nn.Conv(
            self.bottleneck_channels,
            (1, 1),
            strides=(stride_1x1, stride_1x1),
            use_bias=False,
            dtype=self.dtype,
            name="conv1",
        )(x)
        out = make_norm(self.norm, self.bottleneck_channels, self.dtype, "bn1")(out)
        out = nn.relu(out)

        out = nn.Conv(
            self.bottleneck_channels,
            (3, 3),
            strides=(stride_3x3, stride_3x3),
            padding=[(self.dilation, self.dilation)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.num_groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = make_norm(self.norm, self.bottleneck_channels, self.dtype, "bn2")(out)
        out = nn.relu(out)

        out = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        out = make_norm(self.norm, self.out_channels, self.dtype, "bn3")(out)

        return nn.relu(out + identity)


# maps 7x7 kernel offset u (padding 3, stride 2) to the equivalent
# (4-tap offset d=p-i in s2d coords, input phase a): 2i+u-3 = 2(i+d)+a
_S2D_TAPS = {0: (0, 1), 1: (1, 0), 2: (1, 1), 3: (2, 0), 4: (2, 1),
             5: (3, 0), 6: (3, 1)}


def s2d_stem_kernel(w7: jnp.ndarray) -> jnp.ndarray:
    """Rearrange the canonical stem kernel (7, 7, C, O) into the exact
    space-to-depth-2 equivalent (4, 4, 4C, O).

    A 7x7 stride-2 pad-3 conv on (H, W, C) equals a 4x4 stride-1 conv on the
    s2d(2) input (H/2, W/2, 4C) [channel packing a*2C + b*C + c for input
    pixel (2p+a, 2q+b, c)] with kernel taps scattered per phase; the
    (d=0, a=0) tap never occurs and stays zero. Exactness (incl. the zero
    padding) is locked in tests/test_backbone.py."""
    c, o = w7.shape[2], w7.shape[3]
    w4 = jnp.zeros((4, 4, 4 * c, o), w7.dtype)
    for u in range(7):
        du, a = _S2D_TAPS[u]
        for v in range(7):
            dv, b = _S2D_TAPS[v]
            w4 = w4.at[du, dv, (a * 2 + b) * c : (a * 2 + b + 1) * c].set(
                w7[u, v]
            )
    return w4


def s2d4_stem_kernel(w7: jnp.ndarray) -> jnp.ndarray:
    """Rearrange the canonical stem kernel (7, 7, C, O) into the exact
    space-to-depth-4 equivalent (3, 3, 16C, 4O).

    One s2d(4) cell covers a 4x4 input patch = 2x2 stem-conv output
    positions, so the 7x7 stride-2 pad-3 conv becomes a 3x3 stride-1 pad-1
    conv over 16C channels producing 4O channels: output block (a', b')
    holds output position (2t+a', 2u+b'). Input channel (a*4+b)*C+c is pixel
    (4p+a, 4q+b, c) (s2d_pack_frames factor=4). Tap algebra per dimension:
    output row 2t+a' reads input row 2(2t+a')-3+u = 4(t+d)+a with
    (d, a) = divmod(2a'-3+u, 4); offsets beyond the canonical +-3 zero-pad
    (4d+a in {-4, 6, 7}) never occur and stay zero, so cell zero-padding is
    exact. The depth-432 contraction packs the MXU (the factor-2 form's
    depth-12/48-tap conv measured ~10% MFU); exactness incl. padding is
    locked in tests/test_backbone.py."""
    c, o = w7.shape[2], w7.shape[3]
    w3 = jnp.zeros((3, 3, 16 * c, 4 * o), w7.dtype)
    for ap in range(2):
        for u in range(7):
            du, a = divmod(2 * ap - 3 + u, 4)
            for bp in range(2):
                for v in range(7):
                    dv, b = divmod(2 * bp - 3 + v, 4)
                    w3 = w3.at[
                        du + 1,
                        dv + 1,
                        (a * 4 + b) * c : (a * 4 + b + 1) * c,
                        (ap * 2 + bp) * o : (ap * 2 + bp + 1) * o,
                    ].set(w7[u, v])
    return w3


class _StemConv1(nn.Module):
    """Declares the canonical (7, 7, 3, features) stem kernel at the
    state-dict path <stem>/conv1/kernel without binding it to one conv form."""

    features: int = 64

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, 3, self.features),
        )


class Stem(nn.Module):
    """7x7/2 conv + frozen BN + 3x3/2 maxpool (resnet.py:367-387).

    A space-to-depth-2 packed input (channels = 4*3, see s2d_stem_kernel)
    takes an exact reformulated path: the canonical 7x7/2 conv runs as a
    4x4/1 conv over 12 channels. The 3-channel form feeds the MXU a depth-3
    contraction (measured 4% MFU, 0.78 ms/frame of the MEGA streaming step);
    the packed form has 4x fewer positions at 16x the depth. Parameters stay
    in the canonical (7, 7, 3, 64) layout either way — checkpoint ingestion
    and the classic path are untouched."""

    out_channels: int = 64
    norm: str = "frozen_bn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # canonical kernel param at the torch state-dict path stem/conv1/
        # (same default init as nn.Conv), shared by both conv forms
        w7 = _StemConv1(name="conv1", features=self.out_channels)()
        if x.shape[-1] == 48:  # s2d(4)-packed RGB → exact 3x3/1 reformulation
            o = self.out_channels
            w3 = s2d4_stem_kernel(w7).astype(self.dtype)

            def conv3(z):
                return jax.lax.conv_general_dilated(
                    z.astype(self.dtype), w3,
                    window_strides=(1, 1),
                    padding=[(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

            if jax.default_backend() == "tpu" and self.norm != "gn":
                # one-pass Pallas epilogue: BN affine + relu + packed maxpool
                # at the bandwidth floor (read y once, write the 1/4-size
                # pooled map once). The XLA formulations below cost ~0.5
                # ms/frame at MEGA streaming shapes in extra relayouts /
                # full-tensor max passes.
                from ...ops.pallas.stem_pool import stem_pool_packed

                bn1 = FrozenBatchNorm2d(o, dtype=self.dtype, name="bn1")
                shift = bn1(jnp.zeros((o,), self.dtype)).astype(jnp.float32)
                scale = bn1(jnp.ones((o,), self.dtype)).astype(
                    jnp.float32
                ) - shift
                n0, tp, up, _ = x.shape
                if n0 > 1:
                    # FOLD the batch into H (one zero row between frames):
                    # at batch 1 the conv emitter's batch-minor output layout
                    # coincides with the Pallas kernel's row-major input, so
                    # the 0.12 ms/frame conv->kernel relayout disappears.
                    # Exact per frame — the inserted zero row IS each frame's
                    # pad-1 boundary (top pad of frame i+1 == bottom pad of
                    # frame i == zeros), and the pool kernel masks its row
                    # halo at frame-first blocks (frame_rows). Junk rows
                    # (conv/pool outputs at the seams) are sliced off.
                    s = tp + 1
                    strip = jnp.pad(
                        x, ((0, 0), (0, 1), (0, 0), (0, 0))
                    ).reshape(1, n0 * s, up, 48)
                    p = stem_pool_packed(
                        conv3(strip), jnp.tile(scale, 4), jnp.tile(shift, 4),
                        o, frame_rows=s,
                    )
                    return p.reshape(n0, s, up, o)[:, :tp]
                return stem_pool_packed(
                    conv3(x), jnp.tile(scale, 4), jnp.tile(shift, 4), o
                )
            y = conv3(x)  # (N, H/4, W/4, 4*O): blocks (a', b') of O
            n, t, u, _ = y.shape
            y = y.reshape(n, t, u, 2, 2, o)
            y = make_norm(self.norm, o, self.dtype, "bn1")(y)
            y = nn.relu(y)
            # fused 3x3/2 pad-1 maxpool straight on the packed phases: pool
            # output row t covers stem rows 2t-1..2t+1 = phases (t-1, a'=1),
            # (t, a'=0), (t, a'=1) — shifted elementwise maxes replace the
            # reduce_window AND the depth-to-space relayout the unpacked
            # form would need. Of the three XLA formulations measured on v5e
            # (this 6-D chain 9.281 whole-step ms/frame; 128-lane-aligned
            # channel slices 9.407; depth-to-space + reduce_window 9.373)
            # this one profiles fastest.
            neg = jnp.asarray(jnp.finfo(y.dtype).min, y.dtype)
            prev_r = jnp.concatenate(
                [jnp.full_like(y[:, :1, :, 1], neg), y[:, :-1, :, 1]], axis=1
            )
            r = jnp.maximum(jnp.maximum(y[:, :, :, 0], y[:, :, :, 1]), prev_r)
            # r: (N, T, U, b', O); shift the b'=1 plane one cell along U
            prev_c = jnp.concatenate(
                [jnp.full_like(r[:, :, :1, 1], neg), r[:, :, :-1, 1]], axis=2
            )
            return jnp.maximum(jnp.maximum(r[..., 0, :], r[..., 1, :]), prev_c)
        if x.shape[-1] == 12:  # s2d(2)-packed RGB → exact 4x4/1 reformulation
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                s2d_stem_kernel(w7).astype(self.dtype),
                window_strides=(1, 1),
                padding=[(2, 1), (2, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            x = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w7.astype(self.dtype),
                window_strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        x = make_norm(self.norm, self.out_channels, self.dtype, "bn1")(x)
        x = nn.relu(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class ResNetStage(nn.Module):
    """A sequence of bottlenecks; first block carries the stride/projection."""

    block_count: int
    in_channels: int
    bottleneck_channels: int
    out_channels: int
    first_stride: int
    stride_in_1x1: bool = True
    dilation: int = 1
    num_groups: int = 1
    norm: str = "frozen_bn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = self.in_channels
        stride = self.first_stride
        for i in range(self.block_count):
            x = Bottleneck(
                in_channels=in_ch,
                bottleneck_channels=self.bottleneck_channels,
                out_channels=self.out_channels,
                stride=stride,
                stride_in_1x1=self.stride_in_1x1,
                dilation=self.dilation,
                num_groups=self.num_groups,
                norm=self.norm,
                dtype=self.dtype,
                name=str(i),
            )(x)
            in_ch = self.out_channels
            stride = 1
        return x


class ResNetC4(nn.Module):
    """ResNet body through stage 4 (C4 feature, stride 16, 1024 channels).

    ``freeze_at``: stop_gradient is applied after each frozen stage, matching
    the reference's requires_grad=False on stem..layer{freeze_at-1}
    (resnet.py:134-143); the solver additionally masks those params.
    """

    depth: str = "R-50"  # "R-14" (testing) | "R-50" | "R-101" | "R-152"
    freeze_at: int = 2
    stride_in_1x1: bool = True
    num_groups: int = 1
    width_per_group: int = 64
    res2_out_channels: int = 256
    stem_out_channels: int = 64
    norm: str = "frozen_bn"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        blocks = STAGE_SPECS[self.depth][:3]  # stages 1..3 for C4
        x = Stem(
            self.stem_out_channels, norm=self.norm, dtype=self.dtype, name="stem"
        )(x)
        if self.freeze_at >= 1:
            x = jax.lax.stop_gradient(x)
        in_ch = self.stem_out_channels
        for stage_idx, block_count in enumerate(blocks, start=1):
            factor = 2 ** (stage_idx - 1)
            out_ch = self.res2_out_channels * factor
            bott_ch = self.num_groups * self.width_per_group * factor
            x = ResNetStage(
                block_count=block_count,
                in_channels=in_ch,
                bottleneck_channels=bott_ch,
                out_channels=out_ch,
                first_stride=1 if stage_idx == 1 else 2,
                stride_in_1x1=self.stride_in_1x1,
                num_groups=self.num_groups,
                norm=self.norm,
                dtype=self.dtype,
                name=f"layer{stage_idx}",
            )(x)
            if self.freeze_at >= stage_idx + 1:
                x = jax.lax.stop_gradient(x)
            in_ch = out_ch
        return x  # (B, H/16, W/16, 1024)


class ResNetRes5Head(nn.Module):
    """Stage-5 head applied by the ROI feature extractors.

    Used two ways by VID configs (roi_box_feature_extractors.py:54-118):
    on the full C4 map with stride_init=1 + dilation=2 (ResNetConv52MLP), or
    on pooled 14x14 ROI features with stride 2 (classic C4 extractor).
    """

    depth: str = "R-50"
    stride_init: int = 1
    dilation: int = 2
    stride_in_1x1: bool = True
    num_groups: int = 1
    width_per_group: int = 64
    res2_out_channels: int = 256
    norm: str = "frozen_bn"
    dtype: jnp.dtype = jnp.float32

    @property
    def out_channels(self) -> int:
        return self.res2_out_channels * 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        block_count = STAGE_SPECS[self.depth][3]
        factor = 8
        return ResNetStage(
            block_count=block_count,
            in_channels=self.res2_out_channels * 4,
            bottleneck_channels=self.num_groups * self.width_per_group * factor,
            out_channels=self.res2_out_channels * factor,
            first_stride=self.stride_init,
            stride_in_1x1=self.stride_in_1x1,
            dilation=self.dilation,
            num_groups=self.num_groups,
            norm=self.norm,
            dtype=self.dtype,
            name="layer4",
        )(x)


def build_resnet_c4(cfg) -> ResNetC4:
    body = cfg.MODEL.BACKBONE.CONV_BODY  # e.g. "R-50-C4"
    depth = "-".join(body.split("-")[:2])
    norm = "gn" if cfg.MODEL.RESNETS.TRANS_FUNC.endswith("WithGN") else "frozen_bn"
    return ResNetC4(
        depth=depth,
        norm=norm,
        freeze_at=cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        stem_out_channels=cfg.MODEL.RESNETS.STEM_OUT_CHANNELS,
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE),
    )


def build_res5_head(cfg, stride_init: int = 1) -> ResNetRes5Head:
    body = cfg.MODEL.BACKBONE.CONV_BODY
    depth = "-".join(body.split("-")[:2])
    norm = "gn" if cfg.MODEL.RESNETS.TRANS_FUNC.endswith("WithGN") else "frozen_bn"
    return ResNetRes5Head(
        depth=depth,
        norm=norm,
        stride_init=stride_init,
        dilation=cfg.MODEL.RESNETS.RES5_DILATION,
        stride_in_1x1=cfg.MODEL.RESNETS.STRIDE_IN_1X1,
        num_groups=cfg.MODEL.RESNETS.NUM_GROUPS,
        width_per_group=cfg.MODEL.RESNETS.WIDTH_PER_GROUP,
        res2_out_channels=cfg.MODEL.RESNETS.RES2_OUT_CHANNELS,
        dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE),
    )
