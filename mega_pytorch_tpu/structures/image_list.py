"""Padded image batches.

Replaces the reference ``ImageList`` (mega_core/structures/image_list.py:7-74).
On TPU every batch lives on one fixed canvas (cfg.TPU.CANVAS_*), so instead of
"pad to the max size in this batch" we pad to a static canvas and carry each
image's true (resized) size for clipping and rescaling.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ImageBatch:
    """A batch of images on a fixed canvas.

    Attributes:
      tensors: (B, H, W, 3) float — NHWC (TPU-native layout; the reference is NCHW).
      sizes: (B, 2) float32 — true (height, width) of each resized image
             before canvas padding.
    """

    tensors: jnp.ndarray
    sizes: jnp.ndarray

    @property
    def batch(self) -> int:
        return self.tensors.shape[0]

    @property
    def canvas_hw(self) -> tuple[int, int]:
        return self.tensors.shape[1], self.tensors.shape[2]


def to_image_batch(images, sizes=None, size_divisible: int = 0) -> ImageBatch:
    """Stack pre-padded NHWC images into an ImageBatch."""
    tensors = jnp.stack([jnp.asarray(im) for im in images], axis=0) if isinstance(
        images, (list, tuple)
    ) else jnp.asarray(images)
    if tensors.ndim == 3:
        tensors = tensors[None]
    if sizes is None:
        h, w = tensors.shape[1], tensors.shape[2]
        sizes = jnp.tile(jnp.array([[h, w]], dtype=jnp.float32), (tensors.shape[0], 1))
    else:
        sizes = jnp.asarray(sizes, dtype=jnp.float32)
        if sizes.ndim == 1:
            sizes = sizes[None]
    if size_divisible > 0:
        h, w = tensors.shape[1], tensors.shape[2]
        ph = (-h) % size_divisible
        pw = (-w) % size_divisible
        if ph or pw:
            tensors = jnp.pad(tensors, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return ImageBatch(tensors=tensors, sizes=sizes)
