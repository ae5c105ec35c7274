"""DFF and FGFA: train losses/grads and streaming test steps."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mega_pytorch_tpu.models.detectors.dff import DFFCarry, GeneralizedRCNNDFF
from mega_pytorch_tpu.models.detectors.fgfa import GeneralizedRCNNFGFA, cosine_weights
from mega_pytorch_tpu.models.detectors.rcnn import RCNNConfig, pad_gt
from mega_pytorch_tpu.models.detectors.rdn import VidConfig
from mega_pytorch_tpu.structures.image_list import ImageBatch
from mega_pytorch_tpu.utils.misc import jit_init

TINY_C = RCNNConfig(
    depth="R-14",  # one-block-per-stage testing spec: same code path, fast compile
    anchor_sizes=(16, 32, 64),
    pre_nms_top_n_train=128,
    pre_nms_top_n_test=128,
    post_nms_top_n_train=16,
    post_nms_top_n_test=16,
    roi_batch_size=16,
    detections_per_img=8,
    max_gt_boxes=4,
)


def _images(n, seed=0, h=64, w=96):
    rs = np.random.RandomState(seed)
    return ImageBatch(
        tensors=jnp.asarray(rs.randn(n, h, w, 3) * 40, jnp.float32),
        sizes=jnp.tile(jnp.array([[float(h), float(w)]]), (n, 1)),
    )


GT = None


def _gt():
    global GT
    if GT is None:
        GT = jax.tree_util.tree_map(
            lambda x: x[None],
            pad_gt(np.array([[10.0, 10.0, 40.0, 44.0]]), np.array([2]), 4),
        )
    return GT


def test_dff_train_and_stream():
    model = GeneralizedRCNNDFF(c=TINY_C, v=VidConfig(method="dff"))
    images = _images(2)
    params = jit_init(model,
        jax.random.PRNGKey(0), images, _gt(), jax.random.PRNGKey(1), train=True
    )["params"]
    # flownet + backbone + heads all present
    assert "flownet" in params and "Convolution5_scale" in params["flownet"]

    def loss_fn(p):
        d = model.apply({"params": p}, images, _gt(), jax.random.PRNGKey(2), train=True)
        return sum(d.values()), d

    (_, losses), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert all(np.isfinite(float(v)) for v in losses.values())
    total = lambda t: float(  # noqa: E731
        jax.tree_util.tree_reduce(lambda a, x: a + jnp.abs(x).sum(), t, 0.0)
    )
    assert total(g["flownet"]["flow_conv1"]) > 0  # flow net learns
    assert total(g["backbone"]["layer2"]) > 0

    one = ImageBatch(tensors=images.tensors[:1], sizes=images.sizes[:1])
    carry = jax.jit(lambda p, im: model.apply({"params": p}, im, method=model.make_key))(params, one)
    assert isinstance(carry, DFFCarry)
    dets = jax.jit(
        lambda p, c, im: model.apply({"params": p}, c, im, method=model.detect_non_key)
    )(params, carry, ImageBatch(tensors=images.tensors[1:], sizes=images.sizes[1:]))
    assert dets.boxes.shape == (1, 8, 4)
    assert np.isfinite(np.asarray(dets.scores)).all()


# slow: FGFA train gradients; the DFF twin below keeps the flow-warp train
# path in the fast lane, FGFA-specific pieces (embednet, cosine weights,
# 19-frame aggregation) are covered by test_attention + the slow-lane
# FGFA execution-parity test.
@pytest.mark.slow
def test_fgfa_train_and_stream():
    v = VidConfig(method="fgfa", ref_num=2, all_frame_interval=4, key_frame_location=2)
    model = GeneralizedRCNNFGFA(c=TINY_C, v=v)
    images = _images(3, seed=1)
    params = jit_init(model,
        jax.random.PRNGKey(0), images, _gt(), jax.random.PRNGKey(1), train=True
    )["params"]
    assert "embednet" in params
    assert "Convolution5_scale" not in params["flownet"]  # fgfa variant

    def loss_fn(p):
        d = model.apply({"params": p}, images, _gt(), jax.random.PRNGKey(2), train=True)
        return sum(d.values()), d

    (_, losses), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert all(np.isfinite(float(v)) for v in losses.values())
    total = lambda t: float(  # noqa: E731
        jax.tree_util.tree_reduce(lambda a, x: a + jnp.abs(x).sum(), t, 0.0)
    )
    assert total(g["embednet"]) > 0
    assert total(g["flownet"]["flow_conv1"]) > 0

    one = ImageBatch(tensors=images.tensors[:1], sizes=images.sizes[:1])
    entry = jax.jit(lambda p, im: model.apply({"params": p}, im, method=model.precompute))(params, one)
    assert entry[1].shape[-1] == 1024 + 2048
    carry = model.apply({"params": params}, entry, one.sizes[0], method=model.init_carry)
    step = jax.jit(
        lambda p, c, im: model.apply({"params": p}, c, im, method=model.test_step)
    )
    for i in range(2):
        carry, dets = step(
            params,
            carry,
            ImageBatch(tensors=images.tensors[i + 1][None], sizes=images.sizes[:1]),
        )
    assert dets.boxes.shape == (1, 8, 4)
    assert np.isfinite(np.asarray(dets.scores)).all()


def test_cosine_weights_selfsim_maximal():
    rs = np.random.RandomState(0)
    e = jnp.asarray(rs.randn(3, 4, 5, 8), jnp.float32)
    w = np.asarray(cosine_weights(e, e[0:1]))
    np.testing.assert_allclose(w[0], 1.0, rtol=1e-5)
    assert (w <= 1.0 + 1e-5).all()
