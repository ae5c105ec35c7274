"""BoxCoder encode/decode, including round-trip and golden values.

Golden semantics from the reference BoxCoder (mega_core/modeling/box_coder.py:22-95):
+1 sizes, weighted deltas, log clamp at log(1000/16), x2/y2 get -1 on decode.
"""

import math

import jax.numpy as jnp
import numpy as np

from mega_pytorch_tpu.ops import BoxCoder


def _np_encode(ref, prop, weights):
    ex_w = prop[:, 2] - prop[:, 0] + 1
    ex_h = prop[:, 3] - prop[:, 1] + 1
    ex_cx = prop[:, 0] + 0.5 * ex_w
    ex_cy = prop[:, 1] + 0.5 * ex_h
    gt_w = ref[:, 2] - ref[:, 0] + 1
    gt_h = ref[:, 3] - ref[:, 1] + 1
    gt_cx = ref[:, 0] + 0.5 * gt_w
    gt_cy = ref[:, 1] + 0.5 * gt_h
    wx, wy, ww, wh = weights
    return np.stack(
        [
            wx * (gt_cx - ex_cx) / ex_w,
            wy * (gt_cy - ex_cy) / ex_h,
            ww * np.log(gt_w / ex_w),
            wh * np.log(gt_h / ex_h),
        ],
        axis=1,
    )


def test_encode_matches_reference_math():
    rng = np.random.RandomState(0)
    prop = rng.uniform(0, 100, (16, 2))
    prop = np.concatenate([prop, prop + rng.uniform(5, 100, (16, 2))], axis=1)
    gt = rng.uniform(0, 100, (16, 2))
    gt = np.concatenate([gt, gt + rng.uniform(5, 100, (16, 2))], axis=1)
    weights = (10.0, 10.0, 5.0, 5.0)
    coder = BoxCoder(weights)
    got = np.asarray(coder.encode(jnp.asarray(gt), jnp.asarray(prop)))
    # fp32 vs numpy fp64 oracle
    np.testing.assert_allclose(got, _np_encode(gt, prop, weights), rtol=1e-3, atol=1e-3)


def test_roundtrip():
    rng = np.random.RandomState(1)
    prop = rng.uniform(0, 100, (32, 2))
    prop = np.concatenate([prop, prop + rng.uniform(5, 100, (32, 2))], axis=1)
    gt = rng.uniform(0, 100, (32, 2))
    gt = np.concatenate([gt, gt + rng.uniform(5, 100, (32, 2))], axis=1)
    coder = BoxCoder((10.0, 10.0, 5.0, 5.0))
    deltas = coder.encode(jnp.asarray(gt), jnp.asarray(prop))
    rec = coder.decode(deltas, jnp.asarray(prop))
    np.testing.assert_allclose(np.asarray(rec), gt, rtol=1e-4, atol=1e-3)


def test_decode_clamps_log_space():
    coder = BoxCoder((1.0, 1.0, 1.0, 1.0))
    boxes = jnp.array([[0.0, 0.0, 9.0, 9.0]])
    huge = jnp.array([[0.0, 0.0, 50.0, 50.0]])  # dw=dh=50 ≫ clip
    out = np.asarray(coder.decode(huge, boxes))
    w = out[0, 2] - out[0, 0] + 1
    np.testing.assert_allclose(w, 10 * math.exp(math.log(1000.0 / 16)), rtol=1e-4)


def test_decode_multiclass_layout():
    coder = BoxCoder((10.0, 10.0, 5.0, 5.0))
    boxes = jnp.array([[10.0, 10.0, 29.0, 29.0]])
    deltas = jnp.zeros((1, 8))  # 2 classes of zero deltas
    out = np.asarray(coder.decode(deltas, boxes))
    assert out.shape == (1, 8)
    np.testing.assert_allclose(out[0, :4], out[0, 4:], atol=1e-5)
    np.testing.assert_allclose(out[0, :4], [10.0, 10.0, 29.0, 29.0], atol=1e-4)
