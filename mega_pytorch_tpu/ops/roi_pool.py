"""ROIPool (quantized max pooling over ROI bins).

Parity with mega_core/csrc/cuda/ROIPool_cuda.cu / layers/roi_pool.py:
rounded ROI coordinates, floor/ceil bin boundaries, max over the integer
pixels of each bin (empty bins → 0). Available-but-unused by the VID configs
(the pooler everywhere is ROIAlign), kept for zoo completeness.

Fixed-shape design: each bin maxes over a static ``max_bin`` × ``max_bin``
candidate window with masking; bins larger than the cap (ROIs taller/wider
than ``max_bin * pooled`` feature pixels) are subsampled — exact for every
realistic ROI at the default cap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit, static_argnames=("pooled_height", "pooled_width", "max_bin")
)
def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    pooled_height: int = 7,
    pooled_width: int = 7,
    max_bin: int = 16,
) -> jnp.ndarray:
    """features (H, W, C); rois (R, 4) xyxy → (R, PH, PW, C)."""
    h, w = features.shape[0], features.shape[1]
    rois = rois.astype(jnp.float32)
    x1 = jnp.round(rois[:, 0] * spatial_scale)
    y1 = jnp.round(rois[:, 1] * spatial_scale)
    x2 = jnp.round(rois[:, 2] * spatial_scale)
    y2 = jnp.round(rois[:, 3] * spatial_scale)
    roi_w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 1.0)
    bin_h = roi_h / pooled_height  # (R,)
    bin_w = roi_w / pooled_width

    ph = jnp.arange(pooled_height, dtype=jnp.float32)
    pw = jnp.arange(pooled_width, dtype=jnp.float32)
    # epsilon-stabilized boundaries: f32 products like 7*(18/7) land on either
    # side of the exact integer depending on fusion order (the CUDA kernel's
    # own behavior is contraction-dependent there); nudge toward the
    # infinite-precision result so exact multiples stay exclusive/inclusive
    eps = 1e-4
    hstart = jnp.clip(jnp.floor(ph[None] * bin_h[:, None] + eps) + y1[:, None], 0, h)
    hend = jnp.clip(jnp.ceil((ph[None] + 1) * bin_h[:, None] - eps) + y1[:, None], 0, h)
    wstart = jnp.clip(jnp.floor(pw[None] * bin_w[:, None] + eps) + x1[:, None], 0, w)
    wend = jnp.clip(jnp.ceil((pw[None] + 1) * bin_w[:, None] - eps) + x1[:, None], 0, w)

    # candidate pixel offsets inside each bin (strided when the bin exceeds
    # the static cap)
    ii = jnp.arange(max_bin, dtype=jnp.float32)
    step_h = jnp.maximum((hend - hstart) / max_bin, 1.0)  # (R, PH)
    step_w = jnp.maximum((wend - wstart) / max_bin, 1.0)
    ys = hstart[:, :, None] + ii[None, None] * step_h[:, :, None]  # (R, PH, S)
    xs = wstart[:, :, None] + ii[None, None] * step_w[:, :, None]  # (R, PW, S)
    y_ok = ys < hend[:, :, None]
    x_ok = xs < wend[:, :, None]
    yi = jnp.clip(ys.astype(jnp.int32), 0, h - 1)
    xi = jnp.clip(xs.astype(jnp.int32), 0, w - 1)

    def pool_one(yi_r, xi_r, yok_r, xok_r):
        # (PH, S) x (PW, S) index grids → (PH, PW, S, S, C) samples
        vals = features[yi_r[:, None, :, None], xi_r[None, :, None, :]]
        mask = (yok_r[:, None, :, None] & xok_r[None, :, None, :])[..., None]
        vals = jnp.where(mask, vals, -jnp.inf)
        out = vals.max(axis=(2, 3))
        any_valid = mask.any(axis=(2, 3))
        return jnp.where(any_valid, out, 0.0)

    return jax.vmap(pool_one)(yi, xi, y_ok, x_ok)
