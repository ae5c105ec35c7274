"""FlowNetS optical-flow network (NHWC, flax.linen).

Architecture parity with mega_core/modeling/backbone/flownet.py:14-126:
input is the channel-concat of two RGB(BGR255) frames scaled to [0,1]
(6 channels), average-pooled 2x; a 6-conv encoder (LeakyReLU 0.1) and a
4-level decoder with flow predictions; the output flow sits at stride 16 of
the original image (after a final ceil-mode avgpool) and is scaled by 2.5.
For DFF an extra zero-initialized 1x1 conv emits a 1024-channel scale map
(+1) used to modulate warped features (flownet.py:37-40, 120-126).

ConvTranspose layers use ``transpose_kernel=True`` so ingested torch
``ConvTranspose2d`` kernels apply identically (gradient-of-conv semantics);
the reference crops deconv outputs by [1 : size+1] (``crop_like``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


def _leaky(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def _avgpool2_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/2 average pool with ceil_mode=True (count includes only valid)."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        # ceil mode: pad, then average with correct divisor per window
        ones = jnp.ones((1, h, w, 1), x.dtype)
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        ones = jnp.pad(ones, ((0, 0), (0, ph), (0, pw), (0, 0)))
        s = nn.avg_pool(x, (2, 2), strides=(2, 2)) * 4.0
        c = nn.avg_pool(ones, (2, 2), strides=(2, 2)) * 4.0
        return s / c
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _crop_like(x: jnp.ndarray, target_hw: tuple[int, int]) -> jnp.ndarray:
    """flownet.py `crop_like`: slice [1 : target+1] when sizes differ."""
    th, tw = target_hw
    if x.shape[1] == th and x.shape[2] == tw:
        return x
    return x[:, 1 : th + 1, 1 : tw + 1, :]


class FlowNetS(nn.Module):
    method: str = "fgfa"  # "dff" adds the scale-map branch
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        """x: (B, H, W, 6) — two stacked frames in [0, 1]."""
        conv = lambda ch, k, s, name: nn.Conv(  # noqa: E731
            ch, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            dtype=self.dtype, name=name,
        )
        deconv = lambda ch, name: nn.ConvTranspose(  # noqa: E731
            ch, (4, 4), strides=(2, 2), padding="VALID", transpose_kernel=True,
            dtype=self.dtype, name=name,
        )

        x = _avgpool2_ceil(x)
        relu1 = _leaky(conv(64, 7, 2, "flow_conv1")(x))
        relu2 = _leaky(conv(128, 5, 2, "conv2")(relu1))
        relu3 = _leaky(conv(256, 5, 2, "conv3")(relu2))
        relu4 = _leaky(conv(256, 3, 1, "conv3_1")(relu3))
        relu5 = _leaky(conv(512, 3, 2, "conv4")(relu4))
        relu6 = _leaky(conv(512, 3, 1, "conv4_1")(relu5))
        relu7 = _leaky(conv(512, 3, 2, "conv5")(relu6))
        relu8 = _leaky(conv(512, 3, 1, "conv5_1")(relu7))
        relu9 = _leaky(conv(1024, 3, 2, "conv6")(relu8))
        relu10 = _leaky(conv(1024, 3, 1, "conv6_1")(relu9))

        flow6 = conv(2, 3, 1, "Convolution1")(relu10)
        hw5 = (relu8.shape[1], relu8.shape[2])
        up_flow5 = _crop_like(deconv(2, "upsample_flow6to5")(flow6), hw5)
        d5 = _leaky(_crop_like(deconv(512, "deconv5")(relu10), hw5))
        concat2 = jnp.concatenate([relu8, d5, up_flow5], axis=-1)

        flow5 = conv(2, 3, 1, "Convolution2")(concat2)
        hw4 = (relu6.shape[1], relu6.shape[2])
        up_flow4 = _crop_like(deconv(2, "upsample_flow5to4")(flow5), hw4)
        d4 = _leaky(_crop_like(deconv(256, "deconv4")(concat2), hw4))
        concat3 = jnp.concatenate([relu6, d4, up_flow4], axis=-1)

        flow4 = conv(2, 3, 1, "Convolution3")(concat3)
        hw3 = (relu4.shape[1], relu4.shape[2])
        up_flow3 = _crop_like(deconv(2, "upsample_flow4to3")(flow4), hw3)
        d3 = _leaky(_crop_like(deconv(128, "deconv3")(concat3), hw3))
        concat4 = jnp.concatenate([relu4, d3, up_flow3], axis=-1)

        flow3 = conv(2, 3, 1, "Convolution4")(concat4)
        hw2 = (relu2.shape[1], relu2.shape[2])
        up_flow2 = _crop_like(deconv(2, "upsample_flow3to2")(flow3), hw2)
        d2 = _leaky(_crop_like(deconv(64, "deconv2")(concat4), hw2))
        concat5 = jnp.concatenate([relu2, d2, up_flow2], axis=-1)

        concat5 = _avgpool2_ceil(concat5)
        flow = conv(2, 3, 1, "Convolution5")(concat5) * 2.5

        if self.method == "dff":
            scale_map = nn.Conv(
                1024, (1, 1), use_bias=False, dtype=self.dtype,
                kernel_init=nn.initializers.zeros, name="Convolution5_scale",
            )(concat5)
            return flow, scale_map + 1.0
        return flow


class EmbedNet(nn.Module):
    """FGFA embedding net (mega_core/modeling/backbone/embednet.py:8-28):
    1x1 1024→512, 3x3 512→512, 1x1 512→2048, ReLU between."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.relu(nn.Conv(512, (1, 1), dtype=self.dtype, name="embed_conv1")(x))
        x = nn.relu(
            nn.Conv(512, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype, name="embed_conv2")(x)
        )
        return nn.Conv(2048, (1, 1), dtype=self.dtype, name="embed_conv3")(x)


def build_flownet(cfg) -> FlowNetS:
    return FlowNetS(
        method=cfg.MODEL.VID.METHOD, dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE)
    )


def build_embednet(cfg) -> EmbedNet:
    return EmbedNet(dtype=jnp.dtype(cfg.TPU.COMPUTE_DTYPE))
