"""End-to-end single-frame detector: train losses + eval detections on a tiny
synthetic scene, gradient flow, and postprocessing semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mega_pytorch_tpu.models.detectors.rcnn import (
    GeneralizedRCNN,
    RCNNConfig,
    pad_gt,
)
from mega_pytorch_tpu.models.roi_heads.inference import postprocess_detections
from mega_pytorch_tpu.models.roi_heads.subsample import (
    SampledRois,
    fastrcnn_loss,
    subsample_proposals,
)
from mega_pytorch_tpu.structures.image_list import ImageBatch
from mega_pytorch_tpu.utils.misc import jit_init

TINY = RCNNConfig(
    depth="R-14",  # one-block-per-stage testing spec: same code path, fast compile
    pre_nms_top_n_train=200,
    pre_nms_top_n_test=200,
    post_nms_top_n_train=50,
    post_nms_top_n_test=50,
    roi_batch_size=32,
    detections_per_img=20,
    max_gt_boxes=8,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = GeneralizedRCNN(c=TINY)
    images = ImageBatch(
        tensors=jnp.asarray(
            np.random.RandomState(0).randn(1, 128, 160, 3), jnp.float32
        ),
        sizes=jnp.array([[128.0, 160.0]]),
    )
    gt = jax.tree_util.tree_map(
        lambda x: x[None],
        pad_gt(np.array([[20.0, 20.0, 80.0, 90.0]]), np.array([3]), 8),
    )
    params = jit_init(model,
        jax.random.PRNGKey(0), images, gt, jax.random.PRNGKey(1), train=True
    )["params"]
    return model, params, images, gt


def test_train_losses(model_and_params):
    model, params, images, gt = model_and_params
    losses = jax.jit(
        lambda p: model.apply({"params": p}, images, gt, jax.random.PRNGKey(2), train=True)
    )(params)
    assert set(losses) == {
        "loss_objectness",
        "loss_rpn_box_reg",
        "loss_classifier",
        "loss_box_reg",
    }
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # untrained classifier on 31 classes ≈ log(31)
    assert 2.0 < float(losses["loss_classifier"]) < 5.0


def test_grad_flow_excludes_frozen(model_and_params):
    model, params, images, gt = model_and_params

    def loss_fn(p):
        d = model.apply({"params": p}, images, gt, jax.random.PRNGKey(2), train=True)
        return sum(d.values())

    g = jax.jit(jax.grad(loss_fn))(params)

    def total(t):
        return float(
            jax.tree_util.tree_reduce(lambda a, x: a + jnp.abs(x).sum(), t, 0.0)
        )

    assert total(g["backbone"]["stem"]) == 0.0  # frozen
    assert total(g["backbone"]["layer1"]) == 0.0  # frozen
    assert total(g["backbone"]["layer2"]) > 0.0
    assert total(g["rpn"]) > 0.0
    assert total(g["extractor"]) > 0.0
    assert total(g["predictor"]) > 0.0


def test_eval_detections(model_and_params):
    model, params, images, _ = model_and_params
    dets = jax.jit(lambda p: model.apply({"params": p}, images, train=False))(params)
    assert dets.boxes.shape == (1, 20, 4)
    assert dets.scores.shape == (1, 20)
    v = np.asarray(dets.valid[0])
    if v.any():
        bx = np.asarray(dets.boxes[0][v])
        assert (bx[:, 0] >= 0).all() and (bx[:, 2] <= 159).all()
        lab = np.asarray(dets.labels[0][v])
        assert (lab >= 1).all() and (lab <= 30).all()
        sc = np.asarray(dets.scores[0][v])
        assert (np.diff(sc) <= 1e-6).all()  # global top-k is sorted


def test_subsample_respects_ratio():
    rng = np.random.RandomState(0)
    k = 64
    props = np.concatenate(
        [rng.uniform(0, 50, (k, 2)), rng.uniform(60, 100, (k, 2))], axis=1
    ).astype(np.float32)
    # make 10 proposals exactly overlap the gt
    gt_box = np.array([10.0, 10.0, 40.0, 40.0], np.float32)
    props[:10] = gt_box
    rois = subsample_proposals(
        jnp.asarray(props)[None],
        jnp.ones((1, k), bool),
        jnp.asarray(gt_box)[None, None],
        jnp.array([[5]]),
        jnp.ones((1, 1), bool),
        jax.random.PRNGKey(0),
        batch_size_per_image=16,
        positive_fraction=0.25,
    )
    labels = np.asarray(rois.labels[0])
    valid = np.asarray(rois.valid[0])
    assert valid.sum() == 16
    assert (labels[valid] == 5).sum() == 4  # 16 * 0.25 positives
    # positives carry near-zero regression targets (exact overlap)
    pos_slots = (labels == 5) & valid
    np.testing.assert_allclose(
        np.asarray(rois.reg_targets[0])[pos_slots], 0.0, atol=1e-4
    )


def test_fastrcnn_loss_perfect_predictions_near_zero():
    b, s, c = 1, 8, 5
    labels = jnp.array([[1, 2, 0, 0, 3, 0, 0, 0]], jnp.int32)
    valid = jnp.ones((b, s), bool)
    logits = jax.nn.one_hot(labels, c) * 100.0
    reg_targets = jnp.zeros((b, s, 4))
    box_reg = jnp.zeros((b, s, 4 * c))
    rois = SampledRois(
        boxes=jnp.zeros((b, s, 4)), valid=valid, labels=labels, reg_targets=reg_targets
    )
    cls_loss, box_loss = fastrcnn_loss(logits, box_reg, rois)
    assert float(cls_loss) < 1e-3
    assert float(box_loss) == 0.0


def test_postprocess_score_threshold_and_cap():
    k, c = 6, 3
    prop = jnp.tile(jnp.array([[10.0, 10.0, 30.0, 30.0]]), (k, 1))
    prop = prop + jnp.arange(k)[:, None] * 25.0  # spatially separated
    logits = jnp.full((k, c), -10.0)
    logits = logits.at[:, 1].set(jnp.array([5.0, 4.0, 3.0, 2.0, 1.0, -20.0]))
    dets = postprocess_detections(
        logits[None],
        jnp.zeros((1, k, 4 * c)),
        prop[None],
        jnp.ones((1, k), bool),
        jnp.array([[500.0, 500.0]]),
        score_thresh=0.001,
        detections_per_img=3,
    )
    v = np.asarray(dets.valid[0])
    assert v.sum() == 3  # capped
    assert (np.asarray(dets.labels[0])[v] == 1).all()
