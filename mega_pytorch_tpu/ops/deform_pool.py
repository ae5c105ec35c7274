"""Deformable (PS)ROI pooling — TPU-native rebuild of the reference CUDA op.

Semantics follow mega_core/csrc/cuda/deform_pool_kernel_cuda.cu
(DeformablePSROIPoolForwardKernel, :55-141) and the module wrappers in
mega_core/layers/dcn/deform_pool_module.py:6-155 exactly:

- ROI corners are **rounded** to integers, then scaled:
  start = round(x0) * scale - 0.5, end = (round(x1) + 1) * scale - 0.5,
  with width/height clamped to >= 0.1.
- Each of the pooled_h x pooled_w bins averages sample_per_part^2 bilinear
  samples; samples outside [-0.5, dim - 0.5] are *dropped from the count*
  (average over in-bounds samples only; 0 when none), in-bounds coordinates
  are clamped to [0, dim - 1].
- Position-sensitive channel mapping: input channel
  (ctop * group_size + gh) * group_size + gw feeds output channel ctop at
  bin (ph, pw), where gh/gw = floor(ph/pw * group_size / pooled).
- The per-bin offset (x, y) is read from a (num_classes*2, part, part) map
  at part_h/part_w = floor(p* / pooled * part_size), scaled by trans_std
  and the ROI extent.

TPU design: no scatter/gather — bilinear interpolation is two separable
one-hot weight einsums on the MXU (the roi_align design, ops/roi_align.py),
with the out-of-bounds drop expressed as a sample-validity mask folded into
the averaging denominator. This op exists for reference-API completeness
(no shipped VID config instantiates it — it backs the mdconv/R-FCN-style
heads); exactness over speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_axis_weights(coord, axis_len: int):
    """(..., S) sample coords → (..., S, axis_len) bilinear weights.

    Matches the CUDA `bilinear_interp`: x1 = floor(x), x2 = ceil(x) — when x
    is integral the two taps coincide and weights (1-d, d) = (1, 0) still sum
    to the single tap."""
    x1 = jnp.floor(coord)
    x2 = jnp.ceil(coord)
    d = coord - x1
    grid = jnp.arange(axis_len, dtype=coord.dtype)
    w1 = jnp.where(grid == x1[..., None], (1.0 - d)[..., None], 0.0)
    w2 = jnp.where(grid == x2[..., None], d[..., None], 0.0)
    # x1 == x2 (integral coord): w1 already carries weight 1 - d = 1, and
    # w2 adds d = 0, so the sum is exact without special-casing
    return w1 + w2


@functools.partial(
    jax.jit,
    static_argnames=(
        "spatial_scale", "out_size", "out_channels", "no_trans",
        "group_size", "part_size", "sample_per_part", "trans_std",
    ),
)
def deform_roi_pooling(
    data: jnp.ndarray,
    rois: jnp.ndarray,
    offset: jnp.ndarray | None,
    spatial_scale: float,
    out_size: int,
    out_channels: int,
    no_trans: bool,
    group_size: int = 1,
    part_size: int | None = None,
    sample_per_part: int = 4,
    trans_std: float = 0.0,
):
    """data: (H, W, C) NHWC feature map (single image; vmap for batches),
    rois: (R, 4) xyxy in image coordinates,
    offset: (R, num_classes*2, part, part) or None (no_trans).
    Returns (R, out_size, out_size, out_channels) f32."""
    h, w, c = data.shape
    r = rois.shape[0]
    p = out_size
    s = sample_per_part
    part = out_size if part_size is None else part_size
    assert c == out_channels * group_size * group_size

    f32 = jnp.float32
    x0 = jnp.round(rois[:, 0]).astype(f32) * spatial_scale - 0.5
    y0 = jnp.round(rois[:, 1]).astype(f32) * spatial_scale - 0.5
    x1 = (jnp.round(rois[:, 2]).astype(f32) + 1.0) * spatial_scale - 0.5
    y1 = (jnp.round(rois[:, 3]).astype(f32) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x1 - x0, 0.1)
    roi_h = jnp.maximum(y1 - y0, 0.1)
    bin_w = roi_w / p
    bin_h = roi_h / p
    sub_w = bin_w / s
    sub_h = bin_h / s

    ph = jnp.arange(p, dtype=f32)
    part_idx = np.floor(np.arange(p) / p * part).astype(np.int32)  # static

    if no_trans:
        trans_x = jnp.zeros((r, 1, p, p), f32)
        trans_y = jnp.zeros((r, 1, p, p), f32)
        num_classes = 1
    else:
        num_classes = offset.shape[1] // 2
        off = offset.reshape(r, num_classes, 2, part, part).astype(f32)
        # (R, cls, p, p) at the static part_h/part_w of each bin
        off = off[:, :, :, part_idx][:, :, :, :, part_idx]
        trans_x = off[:, :, 0] * trans_std
        trans_y = off[:, :, 1] * trans_std

    # sample coordinates: (R, cls, P(ph|pw), S)
    iw = jnp.arange(s, dtype=f32)
    wstart = (ph[None, :] * bin_w[:, None] + x0[:, None])[:, None, :]  # R,1,P
    hstart = (ph[None, :] * bin_h[:, None] + y0[:, None])[:, None, :]
    # trans_* is (R, cls, ph, pw): x-offset varies with BOTH bin coords
    sx = (
        wstart[:, :, None, :, None]  # R,1,1,PW,1
        + trans_x[:, :, :, :, None] * roi_w[:, None, None, None, None]
        + iw * sub_w[:, None, None, None, None]
    )  # (R, cls, PH, PW, S)
    sy = (
        hstart[:, :, :, None, None]
        + trans_y[:, :, :, :, None] * roi_h[:, None, None, None, None]
        + iw * sub_h[:, None, None, None, None]
    )

    vx = (sx >= -0.5) & (sx <= w - 0.5)
    vy = (sy >= -0.5) & (sy <= h - 0.5)
    sx = jnp.clip(sx, 0.0, w - 1.0)
    sy = jnp.clip(sy, 0.0, h - 1.0)

    wx = _bilinear_axis_weights(sx, w)  # (R, cls, PH, PW, S, W)
    wy = _bilinear_axis_weights(sy, h)
    wx = wx * vx[..., None]
    wy = wy * vy[..., None]

    # Within one bin the S x S samples are the tensor product of S x-coords
    # and S y-coords, and the bin output is a plain sum over samples — so the
    # per-sample weights PRE-SUM into one x-profile and one y-profile per bin
    # and bilinear pooling becomes profile_y @ data @ profile_x per bin.
    # (The trans offsets make different bins non-separable, so the contraction
    # runs bin-by-bin: 49 small MXU matmuls instead of one giant intermediate.)
    wx_bin = wx.sum(axis=-2)  # (R, cls, PH, PW, W)
    wy_bin = wy.sum(axis=-2)  # (R, cls, PH, PW, H)
    cnt = vy.astype(f32).sum(-1) * vx.astype(f32).sum(-1)  # (R, cls, PH, PW)

    dcl = data.astype(f32)
    rows = []
    for bh in range(p):
        cols = []
        for bw in range(p):
            t = jnp.einsum("rkh,hwc->rkwc", wy_bin[:, :, bh, bw], dcl,
                           preferred_element_type=f32)
            cols.append(jnp.einsum("rkw,rkwc->rkc", wx_bin[:, :, bh, bw], t,
                                   preferred_element_type=f32))
        rows.append(jnp.stack(cols, axis=2))  # (R, cls, PW, C)
    val = jnp.stack(rows, axis=2)  # (R, cls, PH, PW, C)

    pooled = jnp.where(cnt[..., None] > 0, val / jnp.maximum(cnt, 1.0)[..., None], 0.0)
    # (R, cls, PH, PW, C) -> pick class block + PS channel per output channel
    # channel map: input channel (ctop*gs + gh)*gs + gw at bin (ph, pw)
    gh = np.clip((np.arange(p) * group_size) // p, 0, group_size - 1)
    gw = gh  # same formula on both axes
    # static per-bin channel index: (PH, PW, out_channels)
    ct = np.arange(out_channels)
    chan = (ct[None, None, :] * group_size + gh[:, None, None]) * group_size \
        + gw[None, :, None]
    chan = jnp.asarray(chan, jnp.int32)
    pooled = jnp.take_along_axis(
        pooled, jnp.broadcast_to(chan[None, None], (r, num_classes, p, p, out_channels)),
        axis=-1,
    )
    # class selection: ctop // channels_each_class; with the module wrappers
    # num_classes is 1 (offset shape (R, 2, p, p)) — general case selects the
    # class block each output channel belongs to
    if num_classes == 1:
        return pooled[:, 0]
    cec = out_channels // num_classes
    cls_of = jnp.asarray(np.arange(out_channels) // cec, jnp.int32)
    pooled = jnp.take_along_axis(
        pooled,
        jnp.broadcast_to(
            cls_of[None, None, None, None, :], (r, 1, p, p, out_channels)
        ),
        axis=1,
    )
    return pooled[:, 0]
