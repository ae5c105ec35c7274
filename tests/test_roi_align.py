"""ROIAlign parity against a numpy oracle of the reference kernel semantics.

Oracle implements mega_core/csrc/cuda/ROIAlign_cuda.cu forward: no half-pixel
shift, roi sizes floored at 1, adaptive ceil(roi/pooled) sampling grid when
sampling_ratio == 0, bilinear taps zero outside [-1, size], clamped edges.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mega_pytorch_tpu.ops import roi_align


def _bilinear(data, y, x, h, w):
    if y < -1.0 or y > h or x < -1.0 or x > w:
        return 0.0
    y = max(y, 0.0)
    x = max(x, 0.0)
    y_low, x_low = int(y), int(x)
    if y_low >= h - 1:
        y_high = y_low = h - 1
        y = float(y_low)
    else:
        y_high = y_low + 1
    if x_low >= w - 1:
        x_high = x_low = w - 1
        x = float(x_low)
    else:
        x_high = x_low + 1
    ly, lx = y - y_low, x - x_low
    hy, hx = 1 - ly, 1 - lx
    return (
        hy * hx * data[y_low, x_low]
        + hy * lx * data[y_low, x_high]
        + ly * hx * data[y_high, x_low]
        + ly * lx * data[y_high, x_high]
    )


def np_roi_align(feat_hwc, rois, scale, pooled_h, pooled_w, sampling_ratio):
    h, w, c = feat_hwc.shape
    out = np.zeros((len(rois), pooled_h, pooled_w, c), np.float64)
    for r, roi in enumerate(rois):
        x1, y1, x2, y2 = roi * scale
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_h = roi_h / pooled_h
        bin_w = roi_w / pooled_w
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(roi_h / pooled_h))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(roi_w / pooled_w))
        for ph in range(pooled_h):
            for pw in range(pooled_w):
                acc = np.zeros(c)
                for iy in range(gh):
                    yy = y1 + ph * bin_h + (iy + 0.5) * bin_h / gh
                    for ix in range(gw):
                        xx = x1 + pw * bin_w + (ix + 0.5) * bin_w / gw
                        acc += _bilinear(feat_hwc, yy, xx, h, w)
                out[r, ph, pw] = acc / (gh * gw)
    return out


def test_roi_align_adaptive_grid_parity():
    rng = np.random.RandomState(0)
    feat = rng.randn(24, 32, 8).astype(np.float32)
    rois = np.array(
        [
            [0.0, 0.0, 100.0, 100.0],
            [16.0, 16.0, 400.0, 300.0],
            [50.0, 20.0, 60.0, 200.0],
            [0.0, 0.0, 511.0, 383.0],  # full image
            [300.0, 200.0, 310.0, 210.0],  # tiny
        ],
        np.float32,
    )
    expected = np_roi_align(feat, rois, 1 / 16.0, 7, 7, sampling_ratio=0)
    got = roi_align(jnp.asarray(feat), jnp.asarray(rois), 1 / 16.0, 7, 7, 0, max_grid=8)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


def test_roi_align_fixed_sampling_parity():
    rng = np.random.RandomState(1)
    feat = rng.randn(16, 16, 4).astype(np.float32)
    rois = np.array([[8.0, 8.0, 120.0, 90.0], [-10.0, -10.0, 50.0, 50.0]], np.float32)
    expected = np_roi_align(feat, rois, 1 / 16.0, 7, 7, sampling_ratio=2)
    got = roi_align(jnp.asarray(feat), jnp.asarray(rois), 1 / 16.0, 7, 7, sampling_ratio=2)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-4)


def test_roi_align_grad_flows():
    feat = jnp.ones((8, 8, 2))
    rois = jnp.array([[0.0, 0.0, 64.0, 64.0]])

    def f(x):
        return roi_align(x, rois, 1 / 16.0, 7, 7, 0, max_grid=4).sum()

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    # total gradient mass equals number of output elements (average pooling is
    # mass-preserving when all taps land inside)
    np.testing.assert_allclose(np.asarray(g).sum(), 7 * 7 * 2, rtol=1e-4)
