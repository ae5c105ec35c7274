"""Fixed-shape box containers and geometry ops.

TPU-native replacement for the reference's ragged ``BoxList``
(mega_core/structures/bounding_box.py:9-266) and ``boxlist_ops``
(mega_core/structures/boxlist_ops.py:10-133): every box set is a padded
``(N, 4)`` xyxy array plus a boolean validity mask, so all shapes are static
under ``jit``. The Detectron ``TO_REMOVE = 1`` pixel convention (inclusive
box coordinates) is preserved everywhere for checkpoint/AP parity.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import struct

TO_REMOVE = 1.0  # inclusive-coordinate convention (boxlist_ops.py:84)


@struct.dataclass
class Boxes:
    """A padded set of boxes with per-box fields.

    Attributes:
      boxes: (N, 4) float32, xyxy (inclusive corners).
      valid: (N,) bool — True for real boxes, False for padding.
      fields: dict of per-box arrays, each with leading dim N
              (e.g. "scores", "labels", "objectness").
    """

    boxes: jnp.ndarray
    valid: jnp.ndarray
    fields: Dict[str, Any] = struct.field(default_factory=dict)

    @property
    def num_boxes(self) -> int:
        return self.boxes.shape[-2]

    def add_field(self, name: str, value: jnp.ndarray) -> "Boxes":
        new = dict(self.fields)
        new[name] = value
        return self.replace(fields=new)

    def get_field(self, name: str) -> jnp.ndarray:
        return self.fields[name]

    def has_field(self, name: str) -> bool:
        return name in self.fields

    def take(self, idx: jnp.ndarray, idx_valid: jnp.ndarray | None = None) -> "Boxes":
        """Gather boxes (and all fields) at ``idx``; optionally re-mask validity."""
        valid = self.valid[idx]
        if idx_valid is not None:
            valid = valid & idx_valid
        return Boxes(
            boxes=self.boxes[idx],
            valid=valid,
            fields={k: v[idx] for k, v in self.fields.items()},
        )


# ---------------------------------------------------------------------------
# geometry ops (pure functions over (N, 4) arrays)
# ---------------------------------------------------------------------------


def area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Box areas with the +1 convention (bounding_box.py `area`, mode xyxy)."""
    w = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    h = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return w * h


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU matrix (M, N) for a:(M,4), b:(N,4).

    Matches boxlist_iou (boxlist_ops.py:53-101): +1 convention, intersection
    clamped at 0.
    """
    area_a = area(a)  # (M,)
    area_b = area(b)  # (N,)
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])  # (M, N, 2)
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])  # (M, N, 2)
    wh = jnp.clip(rb - lt + TO_REMOVE, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def clip_to_image(boxes: jnp.ndarray, height, width) -> jnp.ndarray:
    """Clamp coordinates into the image (bounding_box.py `clip_to_image`)."""
    x1 = jnp.clip(boxes[..., 0], 0, width - TO_REMOVE)
    y1 = jnp.clip(boxes[..., 1], 0, height - TO_REMOVE)
    x2 = jnp.clip(boxes[..., 2], 0, width - TO_REMOVE)
    y2 = jnp.clip(boxes[..., 3], 0, height - TO_REMOVE)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True where a box is at least ``min_size`` in both dims
    (remove_small_boxes, boxlist_ops.py:33-50: keeps ws >= min_size)."""
    ws = boxes[..., 2] - boxes[..., 0] + TO_REMOVE
    hs = boxes[..., 3] - boxes[..., 1] + TO_REMOVE
    return (ws >= min_size) & (hs >= min_size)


def hflip_boxes(boxes: jnp.ndarray, width) -> jnp.ndarray:
    """Horizontal flip (bounding_box.py `transpose` FLIP_LEFT_RIGHT):
    x' = width - x_opposite - 1."""
    x1 = width - boxes[..., 2] - TO_REMOVE
    x2 = width - boxes[..., 0] - TO_REMOVE
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def resize_boxes(boxes: jnp.ndarray, scale_x, scale_y) -> jnp.ndarray:
    """Scale coordinates (bounding_box.py `resize` with independent ratios)."""
    return boxes * jnp.stack(
        [
            jnp.asarray(scale_x),
            jnp.asarray(scale_y),
            jnp.asarray(scale_x),
            jnp.asarray(scale_y),
        ],
        axis=-1,
    ).astype(boxes.dtype)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """Convert xywh → xyxy with the -1 convention (bounding_box.py `convert`)."""
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [x, y, x + jnp.clip(w - TO_REMOVE, min=0), y + jnp.clip(h - TO_REMOVE, min=0)],
        axis=-1,
    )


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1 + TO_REMOVE, y2 - y1 + TO_REMOVE], axis=-1)


def cat_boxes(box_list: list[Boxes], fields: list[str] | None = None) -> Boxes:
    """Concatenate along N (cat_boxlist, boxlist_ops.py:104-133)."""
    if fields is None:
        fields = list(box_list[0].fields.keys())
        for b in box_list[1:]:
            fields = [f for f in fields if f in b.fields]
    return Boxes(
        boxes=jnp.concatenate([b.boxes for b in box_list], axis=0),
        valid=jnp.concatenate([b.valid for b in box_list], axis=0),
        fields={
            f: jnp.concatenate([b.fields[f] for b in box_list], axis=0) for f in fields
        },
    )
