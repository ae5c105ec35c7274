"""Bilinear flow warping (grid_sample replacement).

The reference warps key-frame feature maps along predicted optical flow via
``F.grid_sample(feats, grid, mode="bilinear", padding_mode="border")``
(mega_core/modeling/detector/generalized_rcnn_fgfa.py:45-62, and the identical
DFF path in generalized_rcnn_dff.py:42-59). On TPU we implement the absolute-
coordinate sampler directly: the reference builds its grid as
``(flow + identity)`` normalized to [-1, 1], which is exactly "sample source at
(x + flow_x, y + flow_y)" — so we skip the normalization round-trip and gather
with border clamping. XLA lowers the one-hot matmul formulation to efficient
code; gathers stay O(H·W).
"""

from __future__ import annotations

import jax.numpy as jnp


def warp_by_flow(features: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``features`` by ``flow``.

    Args:
      features: (H, W, C).
      flow: (H, W, 2) — (dx, dy) displacement in pixels; output[y, x] samples
            features at (x + dx, y + dy), border-clamped bilinear.

    Returns:
      (H, W, C) warped features.
    """
    h, w = features.shape[0], features.shape[1]
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")
    src_x = grid_x + flow[..., 0]
    src_y = grid_y + flow[..., 1]

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
