from .box_coder import BoxCoder, BBOX_XFORM_CLIP
from .losses import sigmoid_focal_loss, smooth_l1_loss
from .nms import batched_nms, nms
from .roi_align import roi_align, roi_align_batched
from .warp import warp_by_flow

__all__ = [
    "BoxCoder",
    "BBOX_XFORM_CLIP",
    "sigmoid_focal_loss",
    "smooth_l1_loss",
    "batched_nms",
    "nms",
    "roi_align",
    "roi_align_batched",
    "warp_by_flow",
]
