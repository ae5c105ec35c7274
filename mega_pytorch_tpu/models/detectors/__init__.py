"""Meta-architecture factory (mega_core/modeling/detector/detectors.py:9-18)."""

from .dff import DFFCarry, GeneralizedRCNNDFF
from .fgfa import FGFACarry, GeneralizedRCNNFGFA
from .mega import GeneralizedRCNNMEGA, MEGACarry
from .rcnn import GeneralizedRCNN, RCNNConfig, make_empty_gt, pad_gt
from .rdn import GeneralizedRCNNRDN, RDNCarry, VidConfig

_DETECTION_META_ARCHITECTURES = {
    "GeneralizedRCNN": GeneralizedRCNN,
    "GeneralizedRCNNDFF": GeneralizedRCNNDFF,
    "GeneralizedRCNNFGFA": GeneralizedRCNNFGFA,
    "GeneralizedRCNNRDN": GeneralizedRCNNRDN,
    "GeneralizedRCNNMEGA": GeneralizedRCNNMEGA,
}


def build_detection_model(cfg):
    """cfg (ConfigNode) → flax detector module."""
    arch = _DETECTION_META_ARCHITECTURES[cfg.MODEL.META_ARCHITECTURE]
    c = RCNNConfig.from_cfg(cfg)
    if arch is GeneralizedRCNN:
        return GeneralizedRCNN(c=c)
    return arch(c=c, v=VidConfig.from_cfg(cfg))


__all__ = [
    "build_detection_model",
    "GeneralizedRCNN",
    "GeneralizedRCNNDFF",
    "GeneralizedRCNNFGFA",
    "GeneralizedRCNNRDN",
    "GeneralizedRCNNMEGA",
    "RCNNConfig",
    "VidConfig",
    "DFFCarry",
    "FGFACarry",
    "RDNCarry",
    "MEGACarry",
    "make_empty_gt",
    "pad_gt",
]
