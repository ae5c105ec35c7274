"""RPN: anchor golden values, matcher semantics, sampler invariants,
postprocess and loss behavior."""

import jax
import jax.numpy as jnp
import numpy as np

from mega_pytorch_tpu.models.matcher import (
    BELOW_LOW_THRESHOLD,
    BETWEEN_THRESHOLDS,
    match,
)
from mega_pytorch_tpu.models.rpn import (
    RPNHead,
    RPNSizes,
    add_gt_proposals,
    anchor_visibility,
    generate_cell_anchors,
    grid_anchors,
    rpn_loss,
    rpn_postprocess,
)
from mega_pytorch_tpu.models.sampler import balanced_sample
from mega_pytorch_tpu.utils.misc import jit_init


def test_cell_anchors_golden():
    """Golden anchors = the reference generate_anchors' actual output
    (mega_core/modeling/rpn/anchor_generator.py:222-299, executed). Note the
    matlab table in the reference's header comment is stale — the python code
    itself produces these values (shifted -1 from the comment)."""
    got = generate_cell_anchors(16, (128, 256, 512), (0.5, 1.0, 2.0))
    expected = np.array(
        [
            [-84, -40, 99, 55],
            [-176, -88, 191, 103],
            [-360, -184, 375, 199],
            [-56, -56, 71, 71],
            [-120, -120, 135, 135],
            [-248, -248, 263, 263],
            [-36, -80, 51, 95],
            [-80, -168, 95, 183],
            [-168, -344, 183, 359],
        ],
        np.float32,
    )
    np.testing.assert_allclose(got, expected)


def test_grid_anchor_layout():
    cell = generate_cell_anchors(16, (64,), (1.0,))
    anchors = np.asarray(grid_anchors(2, 3, 16, cell))
    assert anchors.shape == (6, 4)
    # ordering is (y, x): the second anchor is shifted +16 in x
    np.testing.assert_allclose(anchors[1] - anchors[0], [16, 0, 16, 0])
    np.testing.assert_allclose(anchors[3] - anchors[0], [0, 16, 0, 16])


def test_visibility():
    anchors = jnp.array([[0.0, 0.0, 10.0, 10.0], [-1.0, 0.0, 10.0, 10.0], [0.0, 0.0, 99.5, 10.0]])
    vis = anchor_visibility(anchors, 50, 100, 0)
    np.testing.assert_array_equal(np.asarray(vis), [True, False, True])


def test_matcher_thresholds_and_low_quality():
    # 2 gts x 4 preds
    iou = jnp.array(
        [
            [0.9, 0.4, 0.1, 0.55],
            [0.0, 0.5, 0.2, 0.6],
        ]
    )
    valid = jnp.array([True, True])
    m = np.asarray(match(iou, valid, 0.7, 0.3, allow_low_quality_matches=False))
    np.testing.assert_array_equal(m, [0, BETWEEN_THRESHOLDS, BELOW_LOW_THRESHOLD, BETWEEN_THRESHOLDS])
    # low-quality: pred3 is gt1's best (0.6) → promoted to its argmax (gt1)
    m2 = np.asarray(match(iou, valid, 0.7, 0.3, allow_low_quality_matches=True))
    np.testing.assert_array_equal(m2, [0, BETWEEN_THRESHOLDS, BELOW_LOW_THRESHOLD, 1])


def test_matcher_ignores_padded_gt():
    iou = jnp.array([[0.9, 0.9], [0.95, 0.99]])
    valid = jnp.array([True, False])
    m = np.asarray(match(iou, valid, 0.7, 0.3, True))
    np.testing.assert_array_equal(m, [0, 0])


def test_balanced_sampler_counts():
    rng = jax.random.PRNGKey(0)
    # 10 positives, 500 negatives, 20 ignored
    labels = jnp.concatenate(
        [jnp.ones(10), jnp.zeros(500), -jnp.ones(20)]
    )
    pos, neg = balanced_sample(labels, rng, 256, 0.5)
    assert int(pos.sum()) == 10  # min(10, 128)
    assert int(neg.sum()) == 246  # 256 - 10
    assert not bool((pos & (labels != 1)).any())
    assert not bool((neg & (labels != 0)).any())

    # abundant positives → exactly 128/128
    labels2 = jnp.concatenate([jnp.ones(300), jnp.zeros(300)])
    pos2, neg2 = balanced_sample(labels2, rng, 256, 0.5)
    assert int(pos2.sum()) == 128 and int(neg2.sum()) == 128


def _toy_inputs(num_anchors=24, b=1):
    rng = np.random.RandomState(0)
    anchors = np.concatenate(
        [rng.uniform(0, 80, (num_anchors, 2)), rng.uniform(20, 60, (num_anchors, 2))],
        axis=1,
    ).astype(np.float32)
    anchors[:, 2:] += anchors[:, :2]
    objectness = rng.randn(b, num_anchors).astype(np.float32)
    deltas = (rng.randn(b, num_anchors, 4) * 0.1).astype(np.float32)
    return jnp.asarray(anchors), jnp.asarray(objectness), jnp.asarray(deltas)


def test_rpn_postprocess_shapes_and_ordering():
    anchors, objectness, deltas = _toy_inputs()
    sizes = RPNSizes(pre_nms_top_n=16, post_nms_top_n=8, nms_thresh=0.7, min_size=0)
    im_sizes = jnp.array([[100.0, 150.0]])
    props = rpn_postprocess(objectness, deltas, anchors, im_sizes, sizes)
    assert props.boxes.shape == (1, 8, 4)
    assert props.valid.shape == (1, 8)
    obj = np.asarray(props.fields["objectness"][0])
    v = np.asarray(props.valid[0])
    # greedy NMS emits in descending score order
    assert (np.diff(obj[v]) <= 1e-6).all()
    # boxes clipped to image
    bx = np.asarray(props.boxes[0][v])
    assert (bx[:, 0] >= 0).all() and (bx[:, 2] <= 149).all() and (bx[:, 3] <= 99).all()


def test_add_gt_proposals():
    anchors, objectness, deltas = _toy_inputs()
    sizes = RPNSizes(16, 8, 0.7, 0)
    props = rpn_postprocess(objectness, deltas, anchors, jnp.array([[100.0, 150.0]]), sizes)
    gt = jnp.array([[[5.0, 5.0, 20.0, 20.0], [0.0, 0.0, 0.0, 0.0]]])
    gt_valid = jnp.array([[True, False]])
    merged = add_gt_proposals(props, gt, gt_valid)
    assert merged.boxes.shape == (1, 10, 4)
    assert bool(merged.valid[0, 8]) and not bool(merged.valid[0, 9])
    np.testing.assert_allclose(merged.fields["objectness"][0, 8], 1.0)


def test_rpn_head_and_loss_end_to_end():
    head = RPNHead(in_channels=32, num_anchors=3)
    feat = jnp.zeros((2, 4, 5, 32))
    params = jit_init(head, jax.random.PRNGKey(0), feat)["params"]
    objectness, deltas = head.apply({"params": params}, feat)
    assert objectness.shape == (2, 60)
    assert deltas.shape == (2, 60, 4)

    cell = generate_cell_anchors(16, (32,), (0.5, 1.0, 2.0))
    anchors = grid_anchors(4, 5, 16, cell)
    gt = jnp.tile(jnp.array([[[8.0, 8.0, 40.0, 40.0]]]), (2, 1, 1))
    gt_valid = jnp.ones((2, 1), bool)
    im_sizes = jnp.array([[64.0, 80.0], [64.0, 80.0]])
    obj_loss, box_loss = rpn_loss(
        anchors, objectness, deltas, gt, gt_valid, im_sizes, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(obj_loss)) and np.isfinite(float(box_loss))
    assert float(obj_loss) > 0

    # gradient flows to head params
    def loss_fn(p):
        o, d = head.apply({"params": p}, feat)
        l1, l2 = rpn_loss(anchors, o, d, gt, gt_valid, im_sizes, jax.random.PRNGKey(1))
        return l1 + l2

    g = jax.grad(loss_fn)(params)
    total = jax.tree_util.tree_reduce(lambda a, x: a + float(jnp.abs(x).sum()), g, 0.0)
    assert total > 0
