from .boxes import (
    Boxes,
    area,
    box_iou,
    cat_boxes,
    clip_to_image,
    hflip_boxes,
    resize_boxes,
    small_box_mask,
    xywh_to_xyxy,
    xyxy_to_xywh,
)
from .image_list import ImageBatch, to_image_batch

__all__ = [
    "Boxes",
    "area",
    "box_iou",
    "cat_boxes",
    "clip_to_image",
    "hflip_boxes",
    "resize_boxes",
    "small_box_mask",
    "xywh_to_xyxy",
    "xyxy_to_xywh",
    "ImageBatch",
    "to_image_batch",
]
