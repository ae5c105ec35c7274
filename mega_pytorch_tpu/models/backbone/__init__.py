from .flownet import EmbedNet, FlowNetS, build_embednet, build_flownet
from .resnet import (
    ResNetC4,
    ResNetRes5Head,
    STAGE_SPECS,
    build_res5_head,
    build_resnet_c4,
)

__all__ = [
    "EmbedNet",
    "FlowNetS",
    "build_embednet",
    "build_flownet",
    "ResNetC4",
    "ResNetRes5Head",
    "STAGE_SPECS",
    "build_res5_head",
    "build_resnet_c4",
]
