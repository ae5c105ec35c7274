"""Test-time augmentation for boxes (multi-scale + horizontal flip).

Parity with mega_core/engine/bbox_aug.py:11-…: run the single-frame detector
at TEST.BBOX_AUG.SCALES (plus optional hflip at each scale), map all
detections back to the original resolution, merge, and re-run class-aware
NMS with the global detections cap. Image-only (the VID streaming methods
never use TTA).
"""

from __future__ import annotations

import numpy as np
from PIL import Image

import jax.numpy as jnp

from ..data.transforms import preprocess_image, resize_hw
from ..ops.nms import nms
from ..structures.image_list import ImageBatch


def im_detect_bbox_aug(
    model,
    params,
    pil_image: Image.Image,
    scales: tuple,
    max_size: int,
    canvas_short: int,
    canvas_long: int,
    hflip: bool = True,
    scale_hflip: bool | None = None,
    nms_thresh: float = 0.5,
    detections_per_img: int = 300,
):
    """Returns merged {boxes, scores, labels} in original-image coordinates.

    ``scales[0]`` is the base test size (H_FLIP controls its flipped run);
    the remaining scales are the TEST.BBOX_AUG.SCALES sweep, whose flipped
    runs follow SCALE_H_FLIP (mega_core/engine/bbox_aug.py:24-66 runs the
    base size first, then each extra scale, each optionally flipped).
    ``scale_hflip=None`` applies ``hflip`` to every scale."""
    w0, h0 = pil_image.size
    all_boxes, all_scores, all_labels = [], [], []

    def run(min_size: int, flip: bool):
        # the canvas must fit every scale in the sweep: size it per run,
        # rounded up to the C4 stride (each scale compiles its own step,
        # as TTA inherently reruns the model per scale anyway)
        oh, ow = resize_hw(h0, w0, min_size, max_size)
        ceil16 = lambda v: -(-v // 16) * 16  # noqa: E731
        cs = max(ceil16(min(oh, ow)), canvas_short)
        cl = max(ceil16(max(oh, ow)), canvas_long)
        p = preprocess_image(pil_image, min_size, max_size, flip, cs, cl)
        images = ImageBatch(tensors=jnp.asarray(p.image[None]), sizes=jnp.asarray(p.size[None]))
        dets = model.apply({"params": params}, images, train=False)
        valid = np.asarray(dets.valid[0])
        boxes = np.asarray(dets.boxes[0])[valid]
        oh, ow = float(p.size[0]), float(p.size[1])
        if flip:
            x1 = ow - boxes[:, 2] - 1.0
            x2 = ow - boxes[:, 0] - 1.0
            boxes = np.stack([x1, boxes[:, 1], x2, boxes[:, 3]], axis=1)
        boxes = boxes * np.array([w0 / ow, h0 / oh, w0 / ow, h0 / oh], np.float32)
        all_boxes.append(boxes)
        all_scores.append(np.asarray(dets.scores[0])[valid])
        all_labels.append(np.asarray(dets.labels[0])[valid])

    for i, s in enumerate(scales):
        run(int(s), False)
        if hflip if (i == 0 or scale_hflip is None) else scale_hflip:
            run(int(s), True)

    boxes = np.concatenate(all_boxes, axis=0) if all_boxes else np.zeros((0, 4), np.float32)
    scores = np.concatenate(all_scores, axis=0) if all_scores else np.zeros(0, np.float32)
    labels = np.concatenate(all_labels, axis=0) if all_labels else np.zeros(0, np.int64)
    if len(boxes) == 0:
        return {"boxes": boxes, "scores": scores, "labels": labels}

    # class-aware merge NMS: offset per class so classes don't interact
    k = min(detections_per_img, len(boxes))
    offset = labels.astype(np.float32)[:, None] * 1e5
    keep_idx, keep_valid = nms(
        jnp.asarray(boxes + offset),
        jnp.asarray(scores),
        jnp.ones(len(boxes), bool),
        nms_thresh,
        k,
    )
    keep = np.asarray(keep_idx)[np.asarray(keep_valid)]
    return {"boxes": boxes[keep], "scores": scores[keep], "labels": labels[keep]}
