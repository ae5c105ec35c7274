"""MEGA: train forward, parameter structure, streaming with LRM/global caches."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mega_pytorch_tpu.models.detectors.mega import GeneralizedRCNNMEGA, MEGACarry
from mega_pytorch_tpu.models.detectors.rcnn import RCNNConfig, pad_gt
from mega_pytorch_tpu.models.detectors.rdn import VidConfig
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
    method="mega",
    base_stage=3,
    ratio=0.2,  # advanced_num = 2
    all_frame_interval=4,
    key_frame_location=2,
    memory_size=3,
    global_size=2,
    global_res_stage=1,
    ref_num_local=2,
    ref_num_mem=2,
    ref_num_global=2,
)


def _images(rs, n, h=64, w=96):
    return ImageBatch(
        tensors=jnp.asarray(rs.randn(n, h, w, 3), jnp.float32),
        sizes=jnp.tile(jnp.array([[float(h), float(w)]]), (n, 1)),
    )


@pytest.fixture(scope="module")
def mega():
    model = GeneralizedRCNNMEGA(c=TINY_C, v=TINY_V)
    rs = np.random.RandomState(0)
    batch = {
        "local": _images(rs, 3),
        "memory": _images(rs, 2),
        "global": _images(rs, 2),
    }
    gt = jax.tree_util.tree_map(
        lambda x: x[None], pad_gt(np.array([[10.0, 10.0, 40.0, 44.0]]), np.array([2]), 4)
    )
    params = jit_init(model,
        jax.random.PRNGKey(0), batch, gt, jax.random.PRNGKey(1), train=True
    )["params"]
    return model, params, batch, gt


def test_mega_param_structure(mega):
    model, params, *_ = mega
    ext = params["extractor"]
    assert {k for k in ext if k.startswith("l_fcs_")} == {"l_fcs_0", "l_fcs_1", "l_fcs_2"}
    assert {k for k in ext if k.startswith("l_attn_")} == {
        "l_attn_0", "l_attn_1", "l_attn_2",
    }
    # u bias present on both local and global attention
    assert "u" in ext["l_attn_0"]
    # global: res_stage(1) + 1 sets, content-only (no Wg)
    assert {k for k in ext if k.startswith("g_attn_")} == {"g_attn_0", "g_attn_1"}
    assert "Wg" not in ext["g_attn_0"]
    assert "Wg" in ext["l_attn_0"]


def test_mega_train_losses_and_grads(mega):
    model, params, batch, gt = mega
    def loss_fn(p):
        d = model.apply({"params": p}, batch, gt, jax.random.PRNGKey(2), train=True)
        return sum(d.values()), d

    (_, losses), g = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))(params)
    assert all(np.isfinite(float(v)) for v in losses.values()), losses
    total = lambda t: float(  # noqa: E731
        jax.tree_util.tree_reduce(lambda a, x: a + jnp.abs(x).sum(), t, 0.0)
    )
    assert total(g["extractor"]["l_attn_0"]) > 0
    assert total(g["extractor"]["g_attn_0"]) > 0  # global path differentiable
    assert total(g["extractor"]["g_attn_1"]) > 0  # residual global stage
    assert total(g["backbone"]["layer2"]) > 0


def test_mega_streaming_with_memory_growth(mega):
    model, params, batch, _ = mega
    one = ImageBatch(tensors=batch["local"].tensors[:1], sizes=batch["local"].sizes[:1])
    g_img = ImageBatch(tensors=batch["global"].tensors[:1], sizes=batch["global"].sizes[:1])

    entry = jax.jit(lambda p, im: model.apply({"params": p}, im, method=model.precompute))(params, one)
    carry = model.apply({"params": params}, entry, one.sizes[0], method=model.init_carry)
    assert not bool(carry.mem_valid[0].any())
    assert not bool(carry.g_valid.any())

    # global update before first detect (reference order, :201-208)
    carry = jax.jit(lambda p, c, im: model.apply({"params": p}, c, im, method=model.update_global))(params, carry, g_img)
    assert bool(carry.g_valid[-1].all())

    step = jax.jit(
        lambda p, c, im: model.apply({"params": p}, c, im, method=model.test_step)
    )
    for i in range(3):
        nxt = ImageBatch(
            tensors=batch["local"].tensors[i % 3][None], sizes=batch["local"].sizes[:1]
        )
        carry, dets = step(params, carry, nxt)
        # LRM gains one valid slot per detect (pushed before attention)
        assert int(jnp.sum(carry.mem_valid[0].any(axis=1))) == min(i + 1, TINY_V.memory_size)
        assert int(jnp.sum(carry.mem_valid[1].any(axis=1))) == min(i + 1, TINY_V.memory_size)

    assert dets.boxes.shape == (1, 8, 4)
    assert np.isfinite(np.asarray(dets.scores)).all()
    # stage-0 memory stores base_num rois; stages >= 1 store advanced_num
    assert carry.mem_rois[0].shape == (3, 10, 4)
    assert carry.mem_rois[1].shape == (3, 2, 4)
