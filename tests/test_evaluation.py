"""Evaluator tests: VID proposal recall (box_only), VOC 07/all-points AP,
COCO-protocol AP, and the dataset-family dispatcher."""

import numpy as np
import pytest

from mega_pytorch_tpu.data.evaluation import evaluate
from mega_pytorch_tpu.data.evaluation.coco_eval import eval_detection_coco
from mega_pytorch_tpu.data.evaluation.vid_eval import eval_proposals_vid
from mega_pytorch_tpu.data.evaluation.voc_eval import eval_detection_voc


def _gt(boxes, labels, **extra):
    d = {"boxes": np.asarray(boxes, np.float32), "labels": np.asarray(labels)}
    d.update(extra)
    return d


def _pred(boxes, labels, scores):
    return {
        "boxes": np.asarray(boxes, np.float32),
        "labels": np.asarray(labels),
        "scores": np.asarray(scores, np.float32),
    }


# -- box_only proposal recall -------------------------------------------------

def test_proposal_recall_perfect():
    gt = [_gt([[10, 10, 50, 50], [60, 60, 90, 90]], [1, 2])]
    pred = [
        {
            "boxes": np.array([[10, 10, 50, 50], [60, 60, 90, 90]], np.float32),
            "objectness": np.array([0.9, 0.8], np.float32),
        }
    ]
    r = eval_proposals_vid(gt, pred)
    assert r["recall"] == pytest.approx(1.0)


def test_proposal_recall_partial_and_limit():
    gt = [_gt([[10, 10, 50, 50], [100, 100, 140, 140]], [1, 1])]
    # only one GT is covered; the covering proposal would be cut by limit=1
    pred = [
        {
            "boxes": np.array([[200, 200, 220, 220], [10, 10, 50, 50]], np.float32),
            "objectness": np.array([0.9, 0.5], np.float32),
        }
    ]
    assert eval_proposals_vid(gt, pred)["recall"] == pytest.approx(0.5)
    assert eval_proposals_vid(gt, pred, limit=1)["recall"] == 0.0


def test_proposal_recall_greedy_assignment():
    # one proposal overlaps both GT; greedy must not double-count it
    gt = [_gt([[0, 0, 10, 10], [0, 0, 12, 12]], [1, 1])]
    pred = [
        {
            "boxes": np.array([[0, 0, 11, 11]], np.float32),
            "objectness": np.array([1.0], np.float32),
        }
    ]
    assert eval_proposals_vid(gt, pred)["recall"] == pytest.approx(0.5)


# -- VOC ---------------------------------------------------------------------

def test_voc_perfect_detection():
    gt = [_gt([[10, 10, 50, 50]], [3])]
    pred = [_pred([[10, 10, 50, 50]], [3], [0.9])]
    r = eval_detection_voc(gt, pred)
    assert r["map"] == pytest.approx(1.0)
    assert r["ap"][3] == pytest.approx(1.0)


def test_voc_difficult_neither_counts_nor_penalizes():
    gt = [
        _gt(
            [[10, 10, 50, 50], [100, 100, 140, 140]],
            [1, 1],
            difficult=np.array([False, True]),
        )
    ]
    # detection on the difficult GT: ignored (not FP); easy GT matched
    pred = [_pred([[100, 100, 140, 140], [10, 10, 50, 50]], [1, 1], [0.95, 0.9])]
    r = eval_detection_voc(gt, pred)
    assert r["ap"][1] == pytest.approx(1.0)


def test_voc_duplicate_detection_is_fp():
    gt = [_gt([[10, 10, 50, 50]], [1])]
    pred = [_pred([[10, 10, 50, 50], [11, 11, 50, 50]], [1, 1], [0.9, 0.8])]
    r = eval_detection_voc(gt, pred)
    # AP all-points: recall hits 1.0 at precision 1.0, duplicate adds FP after
    assert r["ap"][1] == pytest.approx(1.0)
    # ...but a higher-scored NON-matching box halves precision at recall 1
    pred2 = [_pred([[200, 200, 240, 240], [10, 10, 50, 50]], [1, 1], [0.9, 0.8])]
    r2 = eval_detection_voc(gt, pred2)
    assert r2["ap"][1] == pytest.approx(0.5)


def test_voc_07_metric_differs():
    gt = [_gt([[10, 10, 50, 50], [100, 100, 140, 140]], [1, 1])]
    pred = [_pred([[10, 10, 50, 50], [300, 300, 340, 340]], [1, 1], [0.9, 0.8])]
    r07 = eval_detection_voc(gt, pred, use_07_metric=True)
    # recall 0.5 at precision 1: 11-point metric gives 6/11
    assert r07["ap"][1] == pytest.approx(6 / 11, abs=1e-6)
    r = eval_detection_voc(gt, pred, use_07_metric=False)
    assert r["ap"][1] == pytest.approx(0.5)


# -- COCO --------------------------------------------------------------------

def test_coco_perfect_detection_all_thresholds():
    gt = [_gt([[10, 10, 50, 50]], [1])]
    pred = [_pred([[10, 10, 50, 50]], [1], [0.9])]
    r = eval_detection_coco(gt, pred)
    assert r["AP"] == pytest.approx(1.0)
    assert r["AP50"] == pytest.approx(1.0)
    assert r["AP75"] == pytest.approx(1.0)


def test_coco_iou_threshold_sweep():
    # IoU ≈ 0.7: counts at 0.5–0.7, misses at 0.75+
    gt = [_gt([[0, 0, 100, 100]], [1])]
    pred = [_pred([[0, 0, 100, 70]], [1], [0.9])]  # IoU = 0.7
    r = eval_detection_coco(gt, pred)
    assert r["AP50"] == pytest.approx(1.0)
    assert r["AP75"] == pytest.approx(0.0)
    # thresholds .5 .55 .6 .65 .7 → 5 of 10 hit (boundary inclusive)
    assert r["AP"] == pytest.approx(0.5, abs=0.11)


def test_coco_crowd_gt_ignored():
    gt = [
        _gt(
            [[10, 10, 50, 50], [100, 100, 200, 200]],
            [1, 1],
            iscrowd=np.array([False, True]),
        )
    ]
    # det on the crowd region is ignored, not an FP
    pred = [_pred([[100, 100, 200, 200], [10, 10, 50, 50]], [1, 1], [0.95, 0.9])]
    r = eval_detection_coco(gt, pred)
    assert r["AP50"] == pytest.approx(1.0)


def test_coco_missed_gt_bounds_recall():
    gt = [_gt([[10, 10, 50, 50], [100, 100, 140, 140]], [1, 1])]
    pred = [_pred([[10, 10, 50, 50]], [1], [0.9])]
    r = eval_detection_coco(gt, pred)
    # precision 1 up to recall 0.5 → 101-point mean ≈ 51/101
    assert r["AP50"] == pytest.approx(51 / 101, abs=1e-6)


# -- dispatcher ----------------------------------------------------------------

class _FakeVOC:
    pass


def test_dispatch_by_dataset_family():
    from mega_pytorch_tpu.data.datasets.coco_voc import PascalVOCDataset

    class FakeVOCDataset(PascalVOCDataset):
        def __init__(self):
            pass

        def get_groundtruth(self, i):
            return _gt([[10, 10, 50, 50]], [1])

    ds = FakeVOCDataset()
    preds = {0: _pred([[10, 10, 50, 50]], [1], [0.9])}
    r = evaluate(ds, preds)
    assert "map" in r and r["map"] == pytest.approx(1.0)
    r2 = evaluate(ds, preds, box_only=True)
    assert r2["recall"] == pytest.approx(1.0)


# -- advisor-r2 regressions ----------------------------------------------------

def test_voc_empty_gt_and_predictions():
    """No labels anywhere → NaN mAP, not ValueError (advisor r2, voc_eval)."""
    gt = [_gt(np.zeros((0, 4)), np.zeros((0,), np.int64))]
    pred = [_pred(np.zeros((0, 4)), np.zeros((0,), np.int64), np.zeros((0,)))]
    r = eval_detection_voc(gt, pred)
    assert np.isnan(r["map"]) and len(r["ap"]) == 0


def test_write_result_all_shapes(tmp_path):
    """result.txt/json writer handles VID/COCO/VOC/box-only shapes
    (advisor r2, tools/test_net.py)."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from test_net import write_result

    shapes = {
        "vid": ({"all": {"map": 0.5, "ap": np.arange(3.0)},
                 "fast": {"map": 0.25, "ap": np.arange(3.0)}}, False),
        "coco": ({"AP": 0.3, "AP50": 0.5, "AP75": np.float64(0.2),
                  "per_class": np.arange(4.0)}, False),
        "voc": ({"ap": np.array([np.nan, 1.0]), "map": 1.0}, False),
        "box_only": ({"recall": 0.9, "gt_overlaps": np.arange(5.0)}, True),
    }
    for name, (result, box_only) in shapes.items():
        out = tmp_path / name
        out.mkdir()
        write_result(result, str(out), box_only=box_only)
        txt = (out / "result.txt").read_text()
        assert txt.strip(), name
        loaded = json.loads((out / "result.json").read_text())
        assert set(loaded) == set(result), name
