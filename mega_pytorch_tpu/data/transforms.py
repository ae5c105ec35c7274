"""Host-side image preprocessing (numpy/PIL — runs in loader workers).

Parity with mega_core/data/transforms/{transforms,build}.py:
  * Resize: scale so the shortest side hits MIN_SIZE, capped so the longest
    side stays <= MAX_SIZE (the maskrcnn-benchmark rule).
  * RandomHorizontalFlip with the chance SHARED across the current frame and
    all its reference frames (the reference keeps `self.chance` stateful so
    ref frames flip consistently) — here the flip decision is computed once
    per sample group and passed in.
  * Normalize: RGB→BGR, x255, subtract PIXEL_MEAN (TO_BGR255 Caffe2 style).
  * ColorJitter exists in the reference but every VID config leaves it at 0,
    so it is a no-op and omitted.

TPU addition: images are padded onto a fixed canvas (orientation-dependent)
so jit sees static shapes; the true resized (h, w) rides along for clipping.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
from PIL import Image

PIXEL_MEAN_BGR = np.array([102.9801, 115.9465, 122.7717], np.float32)


class Preprocessed(NamedTuple):
    image: np.ndarray  # (H, W, 3) float32 on the canvas
    size: np.ndarray  # (2,) float32 true (h, w) after resize
    scale: float  # resize scale applied (for mapping boxes back)


def resize_hw(h: int, w: int, min_size: int, max_size: int) -> tuple[int, int]:
    """Target (h, w) under the shortest/longest side rule (transforms.py Resize)."""
    size = min_size
    if max_size is not None:
        min_orig = min(h, w)
        max_orig = max(h, w)
        if max_orig / min_orig * size > max_size:
            size = int(round(max_size * min_orig / max_orig))
    if h < w:
        oh, ow = size, int(size * w / h)
    else:
        ow, oh = size, int(size * h / w)
    return oh, ow


def canvas_for(h: int, w: int, canvas_short: int = 608, canvas_long: int = 1024):
    """Orientation-dependent fixed canvas: landscape (short, long), portrait
    (long, short). Square images use the landscape canvas."""
    if h <= w:
        return canvas_short, canvas_long
    return canvas_long, canvas_short


def preprocess_image(
    img: Image.Image,
    min_size: int,
    max_size: int,
    flip: bool,
    canvas_short: int = 608,
    canvas_long: int = 1024,
    pixel_mean: np.ndarray = PIXEL_MEAN_BGR,
) -> Preprocessed:
    w0, h0 = img.size
    oh, ow = resize_hw(h0, w0, min_size, max_size)
    img = img.resize((ow, oh), Image.BILINEAR)
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(img, np.float32)  # (oh, ow, 3) RGB [0, 255]
    arr = arr[:, :, ::-1] - pixel_mean  # BGR255, mean-subtracted

    ch, cw = canvas_for(h0, w0, canvas_short, canvas_long)
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:oh, :ow] = arr
    return Preprocessed(
        image=canvas,
        size=np.array([oh, ow], np.float32),
        scale=oh / h0,
    )


def preprocess_image_u8(
    img: Image.Image,
    min_size: int,
    max_size: int,
    flip: bool,
    canvas_short: int = 608,
    canvas_long: int = 1024,
) -> Preprocessed:
    """Like preprocess_image but the canvas stays uint8 RGB (4x smaller on
    the wire); normalization (BGR, mean subtract, pad-zeroing) happens on
    device via `normalize_u8_frames`. Bit-identical to the f32 path: PIL's
    resize output is uint8, and uint8→f32 conversion is exact."""
    w0, h0 = img.size
    oh, ow = resize_hw(h0, w0, min_size, max_size)
    img = img.resize((ow, oh), Image.BILINEAR)
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(img, np.uint8)  # (oh, ow, 3) RGB [0, 255]
    ch, cw = canvas_for(h0, w0, canvas_short, canvas_long)
    canvas = np.zeros((ch, cw, 3), np.uint8)
    canvas[:oh, :ow] = arr
    return Preprocessed(
        image=canvas,
        size=np.array([oh, ow], np.float32),
        scale=oh / h0,
    )


def s2d_pack_frames(frames: np.ndarray, factor: int = 2) -> np.ndarray:
    """Host-side space-to-depth(factor): (..., H, W, 3) uint8 canvas →
    (..., H/f, W/f, 3f²) with channel packing (a*f + b)*3 + c for input pixel
    (f*p + a, f*q + b, c) — the layout models.backbone.resnet's
    s2d_stem_kernel / s2d4_stem_kernel reformulate the stem conv for.
    Packing on the HOST (a cheap numpy shuffle in the producer thread) is
    what makes the trick pay: the round-2 on-device attempt lost 14 fps to
    XLA relayouts of the full-res tensor. factor=4 is the production form
    (3x3x48→256 stem conv: the depth-432 contraction packs the MXU where the
    factor-2 form's depth-12 ran at ~10% MFU)."""
    f = factor
    *lead, h, w, c = frames.shape
    out = frames.reshape(*lead, h // f, f, w // f, f, c)
    out = np.moveaxis(out, -4, -3)  # (..., H/f, W/f, f, f, c)
    return np.ascontiguousarray(out).reshape(*lead, h // f, w // f, f * f * c)


# packed-channel index of BGR-flipped channel: group g keeps its phase, the
# RGB triple inside flips (frames[..., ::-1] of the unpacked path)
_S2D_BGR_PERM = {
    f: tuple(g * 3 + (2 - c) for g in range(f * f) for c in range(3))
    for f in (2, 4)
}


def normalize_u8_frames(frames, sizes, pixel_mean=None):
    """Device-side half of preprocess_image_u8: uint8 RGB canvas → BGR255
    mean-subtracted f32 with the padded region zeroed (matching the host
    path, which pads AFTER normalization). frames (..., H, W, 3) uint8 —
    or an s2d(f)-packed (..., H/f, W/f, 3f²) form (f ∈ {2, 4}), where the pad
    mask is evaluated per packed phase (row f·p+a, col f·q+b).
    sizes (..., 2) [oh, ow]."""
    import jax.numpy as jnp

    mean = jnp.asarray(
        (pixel_mean if pixel_mean is not None else PIXEL_MEAN_BGR), jnp.float32
    )
    h, w = frames.shape[-3], frames.shape[-2]
    oh = sizes[..., 0:1]  # (..., 1)
    ow = sizes[..., 1:2]
    if frames.shape[-1] in (12, 48):
        nc = frames.shape[-1]
        f = 2 if nc == 12 else 4
        x = frames[..., _S2D_BGR_PERM[f]].astype(jnp.float32) - jnp.tile(
            mean, f * f
        )
        iy = jnp.arange(h, dtype=jnp.float32)
        ix = jnp.arange(w, dtype=jnp.float32)
        # channel ch belongs to phase (a, b) = (ch//(3f), (ch//3) % f)
        a = jnp.asarray([ch // (3 * f) for ch in range(nc)], jnp.float32)
        b = jnp.asarray([(ch // 3) % f for ch in range(nc)], jnp.float32)
        mask_y = (f * iy[None, :, None] + a[None, None, :]) < oh[..., None]
        mask_x = (f * ix[None, :, None] + b[None, None, :]) < ow[..., None]
        mask = (
            mask_y.reshape(*frames.shape[:-3], h, 1, nc)
            & mask_x.reshape(*frames.shape[:-3], 1, w, nc)
        )
        return jnp.where(mask, x, 0.0)
    x = frames[..., ::-1].astype(jnp.float32) - mean
    iy = jnp.arange(h, dtype=jnp.float32)
    ix = jnp.arange(w, dtype=jnp.float32)
    mask_y = iy[None, :] < oh  # (..., H)
    mask_x = ix[None, :] < ow  # (..., W)
    mask = (
        mask_y.reshape(*frames.shape[:-3], h, 1, 1)
        & mask_x.reshape(*frames.shape[:-3], 1, w, 1)
    )
    return jnp.where(mask, x, 0.0)


def transform_boxes(
    boxes: np.ndarray, h0: int, w0: int, oh: int, ow: int, flip: bool
) -> np.ndarray:
    """Apply the same resize/flip to xyxy boxes (BoxList.resize/transpose)."""
    if len(boxes) == 0:
        return boxes.reshape(0, 4)
    out = boxes.astype(np.float32).copy()
    sx, sy = ow / w0, oh / h0
    out[:, 0::2] *= sx
    out[:, 1::2] *= sy
    if flip:
        x1 = ow - out[:, 2] - 1.0
        x2 = ow - out[:, 0] - 1.0
        out[:, 0], out[:, 2] = x1, x2
    return out
