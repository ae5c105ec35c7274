"""Streaming inference + evaluation orchestration.

Parity with mega_core/engine/inference.py:17-132 and the per-method
test-time protocols in the detector classes, with one deliberate redesign
(SURVEY.md §2.7): the reference's models open image files during inference;
here the ENGINE owns all IO — it prefetches warmup frames and feeds fixed
shape arrays, so every device step is a jitted function of (params, carry,
frame).

Protocol per video (frame_category 0): fill the window with frame 0, read
ahead (all_frame_interval - key_frame_location - 1) frames, then one detect
per frame with the key at key_frame_location.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np

from ..structures.image_list import ImageBatch
from ..utils.logger import Timer


def _to_image_batch(tensors: np.ndarray, sizes: np.ndarray) -> ImageBatch:
    return ImageBatch(tensors=tensors, sizes=sizes)


def _extract(dets, size, orig_hw) -> dict:
    """Padded Detections (batch of 1) → numpy dict in original image coords."""
    valid = np.asarray(dets.valid[0])
    boxes = np.asarray(dets.boxes[0])[valid]
    oh, ow = float(size[0]), float(size[1])
    h0, w0 = orig_hw
    boxes = boxes * np.array([w0 / ow, h0 / oh, w0 / ow, h0 / oh], np.float32)
    return {
        "boxes": boxes,
        "scores": np.asarray(dets.scores[0])[valid],
        "labels": np.asarray(dets.labels[0])[valid],
    }


class StreamingInferencer:
    """Per-method stateful driver around the jitted model functions."""

    def __init__(self, model, params, method: str, preprocessor, dataset):
        self.model, self.params, self.method = model, params, method
        self.prep = preprocessor
        self.dataset = dataset
        self.carry = None
        self._jits: dict = {}

    def _jit(self, name: str, method_fn) -> Callable:
        if name not in self._jits:
            m = self.model
            self._jits[name] = jax.jit(
                lambda p, *a: m.apply({"params": p}, *a, method=method_fn)
            )
        return self._jits[name]

    def _frame_batch(self, sample_key, sample) -> ImageBatch:
        return _to_image_batch(sample[sample_key], sample[sample_key + "_size"])

    def _load_extra_frame(self, pattern: str, frame_id: int) -> ImageBatch:
        img = self.dataset.load_frame(pattern, frame_id)
        p = self.prep._prep(img, flip=False)
        return _to_image_batch(p.image[None], p.size[None])

    # -- per-method steps -------------------------------------------------------
    def step(self, sample: dict):
        cur = self._frame_batch("cur", sample)
        if self.method == "base":
            fwd = self._jit("fwd", type(self.model).forward_test)
            return fwd(self.params, cur)

        if self.method == "dff":
            if sample["is_key_frame"] or self.carry is None:
                make_key = self._jit("make_key", type(self.model).make_key)
                self.carry = make_key(self.params, cur)
            detect = self._jit("detect", type(self.model).detect_non_key)
            return detect(self.params, self.carry, cur)

        if self.method in ("fgfa", "rdn"):
            v = self.model.v
            if sample["frame_category"] == 0:
                pre = self._jit("pre", type(self.model).precompute)
                init = self._jit("init", type(self.model).init_carry)
                entry = pre(self.params, cur)
                self.carry = init(self.params, entry, cur.sizes[0])
                self._end_id = 0
                step = self._jit("step", type(self.model).test_step)
                for _ in range(v.all_frame_interval - v.key_frame_location - 1):
                    self._end_id = min(self._end_id + 1, sample["seg_len"] - 1)
                    nxt = self._load_extra_frame(sample["pattern"], self._end_id)
                    self.carry, dets = step(self.params, self.carry, nxt)
                return dets
            step = self._jit("step", type(self.model).test_step)
            self._end_id = min(self._end_id + 1, sample["seg_len"] - 1)
            nxt = self._frame_batch("ref", sample) if "ref" in sample else (
                self._frame_batch("ref_l", sample)
            )
            self.carry, dets = step(self.params, self.carry, nxt)
            return dets

        if self.method == "mega":
            v = self.model.v
            upd_g = self._jit("upd_g", type(self.model).update_global)
            detect = self._jit("detect", type(self.model).detect_key)
            push_pre = self._jit("pre", type(self.model).precompute)
            push = self._jit("push", type(self.model).push_carry)

            if sample["frame_category"] == 0:
                init = self._jit("init", type(self.model).init_carry)
                entry = push_pre(self.params, cur)
                self.carry = init(self.params, entry, cur.sizes[0])
                self._end_id = 0
                for _ in range(v.all_frame_interval - v.key_frame_location - 1):
                    self._end_id = min(self._end_id + 1, sample["seg_len"] - 1)
                    nxt = self._load_extra_frame(sample["pattern"], self._end_id)
                    self.carry = push(
                        self.params, self.carry, push_pre(self.params, nxt), nxt.sizes[0]
                    )
            else:
                self._end_id = min(self._end_id + 1, sample["seg_len"] - 1)
                nxt = self._frame_batch("ref_l", sample)
                self.carry = push(
                    self.params, self.carry, push_pre(self.params, nxt), nxt.sizes[0]
                )

            # global updates (10 on frame 0, 1 per later frame — :201-208)
            if "ref_g" in sample and len(sample["ref_g"]):
                for i in range(sample["ref_g"].shape[0]):
                    g = _to_image_batch(
                        sample["ref_g"][i : i + 1], sample["ref_g_size"][i : i + 1]
                    )
                    self.carry = upd_g(self.params, self.carry, g)

            self.carry, dets = detect(self.params, self.carry)
            return dets

        raise ValueError(self.method)


def compute_on_dataset(
    model, params, dataset, indices, preprocessor, method: str, logger=None,
    log_period: int = 100, lanes: int = 1,
) -> dict:
    """Run streaming inference over `indices` (whole videos, ascending).

    lanes > 1 (any streaming method): vmapped lockstep multi-video streaming
    — the benchmark configuration — instead of one serial video at a time.

    Returns {dataset_idx: prediction dict in original image coords}."""
    if lanes > 1 and method in ("mega", "rdn", "fgfa", "dff"):
        from .batched_inference import compute_on_dataset_lockstep

        return compute_on_dataset_lockstep(
            model, params, dataset, indices, preprocessor, lanes=lanes,
            logger=logger,
        )
    runner = StreamingInferencer(model, params, method, preprocessor, dataset)
    results: dict = {}
    timer = Timer()
    for n, idx in enumerate(indices):
        sample = preprocessor(dataset[idx])
        timer.tic()
        dets = runner.step(sample)
        size = sample["cur_size"][0]
        info = dataset.get_img_info(idx)
        results[idx] = _extract(dets, size, (info["height"], info["width"]))
        timer.toc()
        if logger and (n + 1) % log_period == 0:
            logger.info(
                f"inference {n + 1}/{len(indices)} "
                f"({timer.average_time:.3f} s/img)"
            )
    return results


def evaluate_predictions(
    dataset,
    predictions: dict,
    motion_iou_path: str | None = None,
    logger=None,
    box_only: bool = False,
) -> dict:
    """do_vid_evaluation (vid_eval.py:14-69) + dataset-family dispatch: VID
    AP50 (+motion buckets), COCO/Cityscapes COCO-protocol AP, VOC 07 mAP,
    or class-agnostic proposal recall (box_only)."""
    from ..data.evaluation import evaluate

    return evaluate(
        dataset,
        predictions,
        box_only=box_only,
        motion_iou_path=motion_iou_path,
        logger=logger,
    )
