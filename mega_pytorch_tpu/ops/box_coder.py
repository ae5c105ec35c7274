"""Detectron-style box encode/decode.

Behavioral parity with the reference BoxCoder (mega_core/modeling/box_coder.py:7-95):
+1 width/height convention, per-coordinate weights, log-space size deltas clamped
at log(1000/16), and the asymmetric "-1" on decoded x2/y2.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

BBOX_XFORM_CLIP = math.log(1000.0 / 16)


class BoxCoder:
    def __init__(self, weights, bbox_xform_clip: float = BBOX_XFORM_CLIP):
        self.weights = weights
        self.bbox_xform_clip = bbox_xform_clip

    def encode(self, reference_boxes: jnp.ndarray, proposals: jnp.ndarray) -> jnp.ndarray:
        """Regression targets mapping ``proposals`` → ``reference_boxes``.

        Both inputs (..., 4) xyxy; output (..., 4) deltas.
        """
        ex_w = proposals[..., 2] - proposals[..., 0] + 1.0
        ex_h = proposals[..., 3] - proposals[..., 1] + 1.0
        ex_cx = proposals[..., 0] + 0.5 * ex_w
        ex_cy = proposals[..., 1] + 0.5 * ex_h

        gt_w = reference_boxes[..., 2] - reference_boxes[..., 0] + 1.0
        gt_h = reference_boxes[..., 3] - reference_boxes[..., 1] + 1.0
        gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
        gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

        wx, wy, ww, wh = self.weights
        # guard against padded zero-boxes producing nan/inf through the log
        ex_w = jnp.maximum(ex_w, 1e-6)
        ex_h = jnp.maximum(ex_h, 1e-6)
        gt_w = jnp.maximum(gt_w, 1e-6)
        gt_h = jnp.maximum(gt_h, 1e-6)
        return jnp.stack(
            [
                wx * (gt_cx - ex_cx) / ex_w,
                wy * (gt_cy - ex_cy) / ex_h,
                ww * jnp.log(gt_w / ex_w),
                wh * jnp.log(gt_h / ex_h),
            ],
            axis=-1,
        )

    def decode(self, rel_codes: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
        """Apply deltas to anchor/proposal boxes.

        rel_codes: (..., N, 4*K) — K classes of deltas per box (K=1 for RPN).
        boxes: (..., N, 4) xyxy.
        Returns (..., N, 4*K) decoded xyxy.
        """
        boxes = boxes.astype(rel_codes.dtype)
        widths = boxes[..., 2] - boxes[..., 0] + 1.0
        heights = boxes[..., 3] - boxes[..., 1] + 1.0
        ctr_x = boxes[..., 0] + 0.5 * widths
        ctr_y = boxes[..., 1] + 0.5 * heights

        wx, wy, ww, wh = self.weights
        dx = rel_codes[..., 0::4] / wx
        dy = rel_codes[..., 1::4] / wy
        dw = jnp.minimum(rel_codes[..., 2::4] / ww, self.bbox_xform_clip)
        dh = jnp.minimum(rel_codes[..., 3::4] / wh, self.bbox_xform_clip)

        pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
        pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
        pred_w = jnp.exp(dw) * widths[..., None]
        pred_h = jnp.exp(dh) * heights[..., None]

        x1 = pred_ctr_x - 0.5 * pred_w
        y1 = pred_ctr_y - 0.5 * pred_h
        x2 = pred_ctr_x + 0.5 * pred_w - 1.0
        y2 = pred_ctr_y + 0.5 * pred_h - 1.0
        # interleave back to (..., N, 4K) in x1,y1,x2,y2 order per class
        out = jnp.stack([x1, y1, x2, y2], axis=-1)  # (..., N, K, 4)
        return out.reshape(*rel_codes.shape[:-1], rel_codes.shape[-1])
