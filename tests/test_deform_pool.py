"""Deformable PSROI pooling vs a direct numpy oracle of the CUDA semantics.

Oracle re-derives mega_core/csrc/cuda/deform_pool_kernel_cuda.cu:55-141
sample-by-sample: rounded ROI corners, 0.1 min extent, per-bin part offsets
scaled by trans_std * roi extent, sample_per_part^2 bilinear samples with
out-of-bounds samples dropped from the averaging count, and the
position-sensitive (ctop, gh, gw) channel mapping.
"""

import jax.numpy as jnp
import numpy as np

from mega_pytorch_tpu.ops.deform_pool import deform_roi_pooling


def oracle(data_hwc, rois, offset, scale, p, out_ch, no_trans,
           gs=1, part=None, spp=4, trans_std=0.0):
    h, w, _ = data_hwc.shape
    part = p if part is None else part
    out = np.zeros((len(rois), p, p, out_ch), np.float32)
    num_classes = 1 if no_trans else offset.shape[1] // 2
    cec = out_ch // num_classes
    for n, roi in enumerate(rois):
        x0 = round(roi[0]) * scale - 0.5
        y0 = round(roi[1]) * scale - 0.5
        x1 = (round(roi[2]) + 1.0) * scale - 0.5
        y1 = (round(roi[3]) + 1.0) * scale - 0.5
        rw = max(x1 - x0, 0.1)
        rh = max(y1 - y0, 0.1)
        bw, bh = rw / p, rh / p
        sw, sh = bw / spp, bh / spp
        for ph in range(p):
            for pw in range(p):
                part_h = int(np.floor(ph / p * part))
                part_w = int(np.floor(pw / p * part))
                for ct in range(out_ch):
                    cls = ct // cec
                    if no_trans:
                        tx = ty = 0.0
                    else:
                        tx = offset[n, cls * 2, part_h, part_w] * trans_std
                        ty = offset[n, cls * 2 + 1, part_h, part_w] * trans_std
                    ws = pw * bw + x0 + tx * rw
                    hs = ph * bh + y0 + ty * rh
                    gh = min(max(ph * gs // p, 0), gs - 1)
                    gw_ = min(max(pw * gs // p, 0), gs - 1)
                    c = (ct * gs + gh) * gs + gw_
                    acc, cnt = 0.0, 0
                    for ih in range(spp):
                        for iw in range(spp):
                            sx = ws + iw * sw
                            sy = hs + ih * sh
                            if sx < -0.5 or sx > w - 0.5 or sy < -0.5 or sy > h - 0.5:
                                continue
                            sx = min(max(sx, 0.0), w - 1.0)
                            sy = min(max(sy, 0.0), h - 1.0)
                            xx1, yy1 = int(np.floor(sx)), int(np.floor(sy))
                            xx2, yy2 = int(np.ceil(sx)), int(np.ceil(sy))
                            dx, dy = sx - xx1, sy - yy1
                            v = ((1 - dx) * (1 - dy) * data_hwc[yy1, xx1, c]
                                 + (1 - dx) * dy * data_hwc[yy2, xx1, c]
                                 + dx * (1 - dy) * data_hwc[yy1, xx2, c]
                                 + dx * dy * data_hwc[yy2, xx2, c])
                            acc += v
                            cnt += 1
                    out[n, ph, pw, ct] = 0.0 if cnt == 0 else acc / cnt
    return out


def _data(rng, h, w, c):
    return rng.randn(h, w, c).astype(np.float32)


def test_psroi_no_trans_group1():
    rng = np.random.RandomState(0)
    data = _data(rng, 12, 16, 8)
    rois = np.array([
        [4.0, 8.0, 120.0, 100.0],
        [0.0, 0.0, 30.0, 30.0],
        [100.0, 80.0, 250.0, 190.0],   # clipped edges -> OOB samples dropped
        [50.0, 50.0, 50.0, 50.0],      # degenerate -> 0.1 extent clamp
    ], np.float32)
    got = deform_roi_pooling(
        jnp.asarray(data), jnp.asarray(rois), None, 1.0 / 16, 3, 8, True,
    )
    want = oracle(data, rois, None, 1.0 / 16, 3, 8, True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_psroi_no_trans_group2():
    rng = np.random.RandomState(1)
    data = _data(rng, 10, 14, 6 * 4)  # out_ch 6, group 2 -> 24 channels
    rois = np.array([[8.0, 8.0, 140.0, 120.0], [16.0, 0.0, 60.0, 90.0]], np.float32)
    got = deform_roi_pooling(
        jnp.asarray(data), jnp.asarray(rois), None, 1.0 / 16, 4, 6, True,
        group_size=2,
    )
    want = oracle(data, rois, None, 1.0 / 16, 4, 6, True, gs=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_deform_with_offsets():
    rng = np.random.RandomState(2)
    data = _data(rng, 12, 16, 8)
    rois = np.array([[4.0, 8.0, 120.0, 100.0], [30.0, 20.0, 200.0, 150.0]], np.float32)
    offset = rng.randn(2, 2, 3, 3).astype(np.float32)
    got = deform_roi_pooling(
        jnp.asarray(data), jnp.asarray(rois), jnp.asarray(offset),
        1.0 / 16, 3, 8, False, trans_std=0.1,
    )
    want = oracle(data, rois, offset, 1.0 / 16, 3, 8, False, trans_std=0.1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_pack_modules_build_and_start_at_identity():
    """Zero-init offset MLP: the Pack module's first output equals plain
    no-trans pooling; the modulated variant starts at exactly 0.5x."""
    import jax
    from mega_pytorch_tpu.models.layers import (
        DeformRoIPoolingPack, ModulatedDeformRoIPoolingPack,
    )

    rng = np.random.RandomState(3)
    data = jnp.asarray(_data(rng, 10, 12, 8))
    rois = jnp.asarray(
        np.array([[4.0, 8.0, 100.0, 90.0], [16.0, 0.0, 60.0, 70.0]], np.float32)
    )
    plain = deform_roi_pooling(data, rois, None, 1.0 / 16, 3, 8, True)

    pack = DeformRoIPoolingPack(
        spatial_scale=1.0 / 16, out_size=3, out_channels=8, no_trans=False,
        trans_std=0.1, deform_fc_channels=16,
    )
    params = pack.init(jax.random.PRNGKey(0), data, rois)
    out = pack.apply(params, data, rois)
    np.testing.assert_allclose(np.asarray(out), np.asarray(plain), rtol=1e-5, atol=1e-6)

    mpack = ModulatedDeformRoIPoolingPack(
        spatial_scale=1.0 / 16, out_size=3, out_channels=8, no_trans=False,
        trans_std=0.1, deform_fc_channels=16,
    )
    mparams = mpack.init(jax.random.PRNGKey(0), data, rois)
    mout = mpack.apply(mparams, data, rois)
    np.testing.assert_allclose(
        np.asarray(mout), 0.5 * np.asarray(plain), rtol=1e-5, atol=1e-6
    )
