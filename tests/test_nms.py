"""NMS parity against a straightforward numpy greedy reference.

The numpy oracle implements the semantics of the reference kernel
(mega_core/csrc/cpu/nms_cpu.cpp / cuda/nms.cu devIoU): score-descending greedy,
+1 area convention, suppress IoU > threshold.
"""

import jax.numpy as jnp
import numpy as np

from mega_pytorch_tpu.ops import batched_nms, nms


def np_greedy_nms(boxes, scores, thresh):
    order = np.argsort(-scores, kind="stable")
    areas = (boxes[:, 2] - boxes[:, 0] + 1) * (boxes[:, 3] - boxes[:, 1] + 1)
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        xx1 = np.maximum(boxes[i, 0], boxes[:, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[:, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[:, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[:, 3])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        iou = inter / (areas[i] + areas - inter)
        suppressed |= iou > thresh
    return np.array(keep)


def _random_boxes(rng, n, span=200):
    xy = rng.uniform(0, span, (n, 2))
    wh = rng.uniform(1, span / 2, (n, 2))
    return np.concatenate([xy, xy + wh], axis=1).astype(np.float32)


def test_nms_matches_numpy_oracle():
    rng = np.random.RandomState(42)
    for thresh in (0.3, 0.5, 0.7):
        boxes = _random_boxes(rng, 100)
        scores = rng.uniform(0, 1, 100).astype(np.float32)
        expected = np_greedy_nms(boxes, scores, thresh)
        k = len(expected)
        idx, valid = nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(100, bool), thresh, 100
        )
        got = np.asarray(idx)[np.asarray(valid)]
        assert len(got) == k
        np.testing.assert_array_equal(got, expected)


def test_nms_respects_validity_mask():
    boxes = jnp.array(
        [[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 60.0, 60.0]]
    )
    scores = jnp.array([0.9, 0.8, 0.7])
    valid = jnp.array([False, True, True])
    idx, v = nms(boxes, scores, valid, 0.5, 3)
    got = np.asarray(idx)[np.asarray(v)]
    np.testing.assert_array_equal(got, [1, 2])


def test_nms_max_outputs_truncates_in_score_order():
    rng = np.random.RandomState(7)
    boxes = _random_boxes(rng, 50)
    scores = rng.uniform(0, 1, 50).astype(np.float32)
    expected = np_greedy_nms(boxes, scores, 0.5)[:5]
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(50, bool), 0.5, 5)
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(idx), expected)


def test_batched_nms_vmaps_per_class():
    rng = np.random.RandomState(3)
    boxes = np.stack([_random_boxes(rng, 40) for _ in range(4)])
    scores = rng.uniform(0, 1, (4, 40)).astype(np.float32)
    idx, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones((4, 40), bool), 0.5, 40
    )
    for c in range(4):
        expected = np_greedy_nms(boxes[c], scores[c], 0.5)
        got = np.asarray(idx[c])[np.asarray(valid[c])]
        np.testing.assert_array_equal(got, expected)


def test_prefix_shortcut_matches_oracle_large_n():
    """n >> prefix: the fast path must still equal exact greedy."""
    rng = np.random.RandomState(11)
    boxes = _random_boxes(rng, 2000, span=600)
    scores = rng.uniform(0, 1, 2000).astype(np.float32)
    expected = np_greedy_nms(boxes, scores, 0.7)[:10]
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(2000, bool), 0.7, 10)
    assert np.asarray(valid).all()
    np.testing.assert_array_equal(np.asarray(idx), expected)


def test_chunked_path_carries_kept_set_across_chunks():
    """Dense top-scored cluster fills whole chunks (greedy keeps ~1); later
    chunks must both contribute keeps AND be suppressed by earlier-chunk
    kept boxes via the carried kept-set."""
    rng = np.random.RandomState(12)
    n = 1500
    # 700 near-identical top-scored boxes (span >2 chunks of 256)
    cluster = np.tile(np.array([[100.0, 100.0, 160.0, 160.0]]), (700, 1))
    cluster += rng.uniform(-2, 2, (700, 4))
    # 300 mid-scored copies of the cluster (must be suppressed cross-chunk)
    echoes = np.tile(np.array([[101.0, 101.0, 161.0, 161.0]]), (300, 1))
    echoes += rng.uniform(-2, 2, (300, 4))
    spread = _random_boxes(rng, n - 1000, span=5000) + 1000
    boxes = np.concatenate([cluster, echoes, spread]).astype(np.float32)
    scores = np.concatenate(
        [
            np.linspace(1.0, 0.9, 700),
            np.linspace(0.8, 0.7, 300),
            np.linspace(0.5, 0.1, n - 1000),
        ]
    ).astype(np.float32)
    expected = np_greedy_nms(boxes, scores, 0.5)[:8]
    idx, valid = nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool), 0.5, 8,
        chunk=256,
    )
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, expected[: len(got)])
    assert len(got) == len(expected)


def test_chunked_matches_single_peel_random():
    """chunk smaller than N must be output-identical to one big peel."""
    rng = np.random.RandomState(13)
    n = 1300
    boxes = _random_boxes(rng, n, span=400)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.rand(n) > 0.1
    for thresh in (0.3, 0.5, 0.7):
        a_idx, a_val = nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            thresh, 50, chunk=256,
        )
        b_idx, b_val = nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
            thresh, 50, chunk=4096,
        )
        np.testing.assert_array_equal(np.asarray(a_val), np.asarray(b_val))
        np.testing.assert_array_equal(
            np.asarray(a_idx)[np.asarray(a_val)],
            np.asarray(b_idx)[np.asarray(b_val)],
        )


def test_extras_match_gather_semantics():
    """`extras` payload columns must equal post-hoc gathers at keep_idx —
    including the garbage-but-deterministic values in invalid slots (the
    payload rides the same sort rows that keep_idx reports)."""
    rng = np.random.RandomState(7)
    n = 300
    boxes = _random_boxes(rng, n, span=200)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    valid = rng.rand(n) > 0.2
    idx, val, (kb, ks) = nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        0.5, 32, extras=(jnp.asarray(scores),), return_boxes=True,
    )
    # baseline: identical selection with no extras
    idx0, val0 = nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid), 0.5, 32
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx0))
    np.testing.assert_array_equal(np.asarray(val), np.asarray(val0))
    np.testing.assert_array_equal(np.asarray(kb), boxes[np.asarray(idx)])
    np.testing.assert_array_equal(np.asarray(ks), scores[np.asarray(idx)])


def test_presorted_matches_unsorted_path():
    """presorted=True on score-descending input must reproduce the full
    sort path exactly — keep indices, validity, payload — including with
    interspersed invalid rows and across the chunked large-N path."""
    rng = np.random.RandomState(3)
    for n, chunk in ((300, 1024), (6000, 1024)):
        boxes = _random_boxes(rng, n, span=600)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        order = np.argsort(-scores, kind="stable")
        boxes, scores = boxes[order], scores[order]
        valid = rng.rand(n) > 0.15  # interspersed invalid rows
        args = (jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
                0.5, 300)
        kw = dict(chunk=chunk, extras=(jnp.asarray(scores),),
                  return_boxes=True)
        i0, v0, (b0, s0) = nms(*args, **kw)
        i1, v1, (b1, s1) = nms(*args, presorted=True, **kw)
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
        m = np.asarray(v0)  # invalid slots hold garbage that may differ
        np.testing.assert_array_equal(np.asarray(i0)[m], np.asarray(i1)[m])
        np.testing.assert_array_equal(np.asarray(b0)[m], np.asarray(b1)[m])
        np.testing.assert_array_equal(np.asarray(s0)[m], np.asarray(s1)[m])
