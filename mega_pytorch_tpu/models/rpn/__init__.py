from .anchors import anchor_visibility, generate_cell_anchors, grid_anchors
from .rpn import (
    RPN_BOX_CODER,
    RPNHead,
    RPNSizes,
    add_gt_proposals,
    rpn_loss,
    rpn_postprocess,
)

__all__ = [
    "anchor_visibility",
    "generate_cell_anchors",
    "grid_anchors",
    "RPN_BOX_CODER",
    "RPNHead",
    "RPNSizes",
    "add_gt_proposals",
    "rpn_loss",
    "rpn_postprocess",
]
