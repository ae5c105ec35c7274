"""RDN: train forward with losses/grads, streaming test steps under jit."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mega_pytorch_tpu.models.detectors.rcnn import RCNNConfig, pad_gt
from mega_pytorch_tpu.models.detectors.rdn import (
    GeneralizedRCNNRDN,
    RDNCarry,
    VidConfig,
)
from mega_pytorch_tpu.structures.image_list import ImageBatch
from mega_pytorch_tpu.utils.misc import jit_init

TINY_C = RCNNConfig(
    depth="R-14",  # one-block-per-stage testing spec: same code path, fast compile
    anchor_sizes=(16, 32, 64),
    pre_nms_top_n_train=128,
    pre_nms_top_n_test=128,
    post_nms_top_n_train=24,
    post_nms_top_n_test=24,
    ref_pre_nms_top_n=64,
    ref_post_nms_top_n=10,
    roi_batch_size=16,
    detections_per_img=8,
    max_gt_boxes=4,
)
TINY_V = VidConfig(
    method="rdn",
    base_stage=2,
    advanced_stage=1,
    ref_num=2,
    all_frame_interval=5,
    key_frame_location=2,
    ratio=0.2,
)


@pytest.fixture(scope="module")
def rdn():
    model = GeneralizedRCNNRDN(c=TINY_C, v=TINY_V)
    rs = np.random.RandomState(0)
    images = ImageBatch(
        tensors=jnp.asarray(rs.randn(3, 64, 96, 3), jnp.float32),
        sizes=jnp.tile(jnp.array([[64.0, 96.0]]), (3, 1)),
    )
    gt = jax.tree_util.tree_map(
        lambda x: x[None], pad_gt(np.array([[10.0, 10.0, 40.0, 44.0]]), np.array([2]), 4)
    )
    params = jit_init(model,
        jax.random.PRNGKey(0), images, gt, jax.random.PRNGKey(1), train=True
    )["params"]
    return model, params, images, gt


def test_rdn_train_losses_and_grads(rdn):
    model, params, images, gt = rdn
    def loss_fn(p):
        d = model.apply({"params": p}, images, gt, jax.random.PRNGKey(2), train=True)
        return sum(d.values()), d

    (_, losses), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert set(losses) == {
        "loss_objectness", "loss_rpn_box_reg", "loss_classifier", "loss_box_reg",
    }
    assert all(np.isfinite(float(v)) for v in losses.values())
    total = lambda t: float(  # noqa: E731
        jax.tree_util.tree_reduce(lambda a, x: a + jnp.abs(x).sum(), t, 0.0)
    )
    # attention stages and fcs receive gradient
    assert total(g["extractor"]["attn_0"]) > 0
    assert total(g["extractor"]["attn_2"]) > 0  # base+adv final attention
    assert total(g["extractor"]["fcs_0"]) > 0
    assert total(g["backbone"]["layer2"]) > 0


def test_rdn_extractor_param_structure(rdn):
    model, params, *_ = rdn
    ext = params["extractor"]
    # base=2 adv=1: fcs 0..2, attn 0..3 (reference loop sizing)
    assert {k for k in ext if k.startswith("fcs_")} == {"fcs_0", "fcs_1", "fcs_2"}
    assert {k for k in ext if k.startswith("attn_")} == {
        "attn_0", "attn_1", "attn_2", "attn_3",
    }
    # RDN attention has no u bias
    assert "u" not in ext["attn_0"]


def test_rdn_streaming(rdn):
    model, params, images, _ = rdn
    one = ImageBatch(tensors=images.tensors[:1], sizes=images.sizes[:1])

    precompute = jax.jit(
        lambda p, im: model.apply({"params": p}, im, method=model.precompute)
    )
    entry = precompute(params, one)
    carry = model.apply(
        {"params": params}, entry, one.sizes[0], method=model.init_carry
    )
    assert carry.rois.shape[0] == TINY_V.all_frame_interval
    assert carry.feats.shape == (5, 10, 1024)
    # key-frame quantities precomputed at entry (convolution-free detect)
    assert carry.key_rois.shape == (5, TINY_C.post_nms_top_n_test, 4)
    assert carry.key_feats.shape == (5, TINY_C.post_nms_top_n_test, 1024)

    step = jax.jit(
        lambda p, c, im: model.apply({"params": p}, c, im, method=model.test_step)
    )
    for i in range(3):
        nxt = ImageBatch(
            tensors=images.tensors[i % 3][None], sizes=images.sizes[:1]
        )
        carry, dets = step(params, carry, nxt)
    assert dets.boxes.shape == (1, 8, 4)
    assert np.isfinite(np.asarray(dets.scores)).all()
    # carry shapes stable under jit (same compiled step reused)
    assert carry.rois.shape == (5, 10, 4)
