"""Bilinear flow warping (grid_sample replacement).

The reference warps key-frame feature maps along predicted optical flow via
``F.grid_sample(feats, grid, mode="bilinear", padding_mode="border")``
(mega_core/modeling/detector/generalized_rcnn_fgfa.py:45-62, and the identical
DFF path in generalized_rcnn_dff.py:42-59). The grid is built as
``(flow + identity) / ((size-1)/2) - 1`` and grid_sample is called WITHOUT
``align_corners`` — under the reference's pinned torch 1.3 (INSTALL.md) that
means ``align_corners=False``, whose unnormalization is
``x = (u + 1) * W / 2 - 0.5``. Composing the two gives the actual sample
coordinate ``x_src = (x + flow_x) * W / (W-1) - 0.5`` (NOT the intuitive
``x + flow_x`` of the pre-1.3 align_corners=True default — execution parity
against live mega_core pinned this down). We implement that absolute-coordinate
sampler directly with border clamping; XLA keeps the gathers O(H·W).
"""

from __future__ import annotations

import jax.numpy as jnp


def bilinear_sample(
    features: jnp.ndarray, src_x: jnp.ndarray, src_y: jnp.ndarray
) -> jnp.ndarray:
    """Border-clamped bilinear sample of (H, W, C) ``features`` at raw pixel
    coordinates ``(src_x, src_y)`` (each (H, W)). Used directly by ops that
    address pixels absolutely (deform conv: p + p_k + Δp, no grid
    normalization — csrc/cuda/deform_conv_kernel_cuda.cu bilinear taps), and
    by :func:`warp_by_flow` after the grid_sample coordinate transform."""
    h, w = features.shape[0], features.shape[1]
    # padding_mode="border": clamp sample coords into the image
    src_x = jnp.clip(src_x, 0.0, w - 1.0)
    src_y = jnp.clip(src_y, 0.0, h - 1.0)

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    lx = src_x - x0
    ly = src_y - y0

    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    v00 = features[y0i, x0i]
    v01 = features[y0i, x1i]
    v10 = features[y1i, x0i]
    v11 = features[y1i, x1i]

    lx = lx[..., None]
    ly = ly[..., None]
    top = v00 * (1 - lx) + v01 * lx
    bot = v10 * (1 - lx) + v11 * lx
    return top * (1 - ly) + bot * ly


def warp_by_flow(features: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``features`` by ``flow`` (grid_sample a_c=False semantics).

    Args:
      features: (H, W, C).
      flow: (H, W, 2) — (dx, dy) displacement in pixels; output[y, x] samples
            features at ((x+dx)·W/(W−1) − ½, (y+dy)·H/(H−1) − ½),
            border-clamped bilinear (see module docstring).

    Returns:
      (H, W, C) warped features.
    """
    h, w = features.shape[0], features.shape[1]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    src_x = (grid_x + flow[..., 0]) * (w / (w - 1.0)) - 0.5
    src_y = (grid_y + flow[..., 1]) * (h / (h - 1.0)) - 0.5
    return bilinear_sample(features, src_x, src_y)
