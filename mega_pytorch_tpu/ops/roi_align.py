"""ROIAlign as separable matmuls (TPU-native).

Replaces the CUDA kernel (mega_core/csrc/cuda/ROIAlign_cuda.cu:1-346) and the
autograd wrapper (mega_core/layers/roi_align.py:12-70).

Semantics match maskrcnn-benchmark ROIAlign exactly (no ``aligned`` half-pixel
shift): ROI corners scaled by ``spatial_scale``; width/height floored at 1;
``sampling_ratio == 0`` means an adaptive per-ROI grid of
``ceil(roi_size / pooled_size)`` sample points per bin; bilinear taps outside
``[-1, size]`` contribute zero; coordinates clamp at 0 and at ``size - 1``.

TPU design: bilinear interpolation weights factor into an x-part and a y-part,
and bin averaging factors across axes, so the whole op is

    pooled[r, ph, pw, c] = sum_{h,w} Wy[r, ph, h] * Wx[r, pw, w] * feat[h, w, c]

two dense einsums that run on the MXU — no gathers, no dynamic shapes, exact
adaptive-grid semantics via a static max grid + masking. The backward pass is
just the transposed einsums, so JAX autodiff gives the reference's backward
kernel (ROIAlign_cuda.cu backward) for free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _axis_weights(start, size, num_bins: int, grid: jnp.ndarray, axis_len: int, max_grid: int):
    """Per-ROI interpolation matrix for one axis.

    Args:
      start: (R,) roi start coordinate (feature scale).
      size: (R,) roi extent (>= 1).
      num_bins: pooled output size along this axis (static).
      grid: (R,) int — adaptive sample count per bin along this axis.
      axis_len: feature map length along this axis (static).
      max_grid: static upper bound for ``grid``.

    Returns:
      (R, num_bins, axis_len) float32 — rows sum to 1 (bin average weights).
    """
    r = start.shape[0]
    bin_size = size / num_bins  # (R,)
    iy = jnp.arange(max_grid, dtype=jnp.float32)  # (S,)
    ph = jnp.arange(num_bins, dtype=jnp.float32)  # (P,)
    gridf = grid.astype(jnp.float32)

    # sample coordinate: start + ph*bin + (iy + .5) * bin/grid   (ROIAlign_cuda.cu fwd)
    coord = (
        start[:, None, None]
        + ph[None, :, None] * bin_size[:, None, None]
        + (iy[None, None, :] + 0.5) * bin_size[:, None, None] / gridf[:, None, None]
    )  # (R, P, S)
    sample_ok = iy[None, None, :] < gridf[:, None, None]

    # bilinear_interpolate edge rules
    inside = (coord >= -1.0) & (coord <= axis_len)
    c = jnp.clip(coord, 0.0, None)
    low = jnp.floor(c)
    at_edge = low >= axis_len - 1
    low = jnp.where(at_edge, axis_len - 1, low)
    high = jnp.where(at_edge, axis_len - 1, low + 1)
    l_frac = jnp.where(at_edge, 0.0, c - low)
    h_frac = 1.0 - l_frac

    w_mask = (sample_ok & inside).astype(jnp.float32) / gridf[:, None, None]
    axis_idx = jnp.arange(axis_len, dtype=jnp.float32)
    onehot_low = (low[..., None] == axis_idx).astype(jnp.float32)  # (R, P, S, L)
    onehot_high = (high[..., None] == axis_idx).astype(jnp.float32)
    w = (
        h_frac[..., None] * onehot_low + l_frac[..., None] * onehot_high
    ) * w_mask[..., None]
    return w.sum(axis=2)  # (R, P, L)


@functools.partial(
    jax.jit, static_argnames=("pooled_height", "pooled_width", "sampling_ratio", "max_grid")
)
def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    pooled_height: int = 7,
    pooled_width: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 10,
) -> jnp.ndarray:
    """ROIAlign over a single feature map.

    Args:
      features: (H, W, C) — one image's feature map (vmap for batches).
      rois: (R, 4) xyxy in input-image coordinates.
      spatial_scale: feature stride inverse (e.g. 1/16).
      sampling_ratio: 0 → adaptive ceil(roi/pooled) grid (reference default).
      max_grid: static cap on the adaptive grid (>= ceil(max_roi/pooled)).

    Returns:
      (R, pooled_height, pooled_width, C) float32.
    """
    h, w = features.shape[0], features.shape[1]
    rois = rois.astype(jnp.float32)
    x1 = rois[:, 0] * spatial_scale
    y1 = rois[:, 1] * spatial_scale
    x2 = rois[:, 2] * spatial_scale
    y2 = rois[:, 3] * spatial_scale
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)

    if sampling_ratio > 0:
        gh = jnp.full(rois.shape[:1], sampling_ratio, jnp.int32)
        gw = gh
        max_grid = sampling_ratio
    else:
        gh = jnp.clip(jnp.ceil(roi_h / pooled_height).astype(jnp.int32), 1, max_grid)
        gw = jnp.clip(jnp.ceil(roi_w / pooled_width).astype(jnp.int32), 1, max_grid)

    wy = _axis_weights(y1, roi_h, pooled_height, gh, h, max_grid)  # (R, PH, H)
    wx = _axis_weights(x1, roi_w, pooled_width, gw, w, max_grid)  # (R, PW, W)

    feat = features.astype(jnp.float32)
    # (R, PH, H) @ (H, W*C) → (R, PH, W, C); then contract W with (R, PW, W)
    tmp = jnp.einsum("rph,hwc->rpwc", wy, feat, preferred_element_type=jnp.float32)
    out = jnp.einsum("rqw,rpwc->rpqc", wx, tmp, preferred_element_type=jnp.float32)
    return out


def roi_align_batched(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    batch_idx: jnp.ndarray,
    spatial_scale: float,
    pooled_height: int = 7,
    pooled_width: int = 7,
    sampling_ratio: int = 0,
    max_grid: int = 10,
) -> jnp.ndarray:
    """ROIAlign where rois index into a batch of feature maps.

    features: (B, H, W, C); rois: (R, 4); batch_idx: (R,) int32.
    Equivalent to the reference Pooler's [batch_idx | box] roi format
    (mega_core/modeling/poolers.py:100-126).
    """
    b = features.shape[0]
    if b == 1:
        return roi_align(
            features[0], rois, spatial_scale, pooled_height, pooled_width,
            sampling_ratio, max_grid,
        )
    per_image = jax.vmap(
        lambda f: roi_align(
            f, rois, spatial_scale, pooled_height, pooled_width, sampling_ratio, max_grid
        )
    )(features)  # (B, R, PH, PW, C)
    return per_image[batch_idx, jnp.arange(rois.shape[0])]
