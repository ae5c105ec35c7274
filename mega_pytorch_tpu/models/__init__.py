from .detectors import (
    GeneralizedRCNN,
    GeneralizedRCNNDFF,
    GeneralizedRCNNFGFA,
    GeneralizedRCNNMEGA,
    GeneralizedRCNNRDN,
    RCNNConfig,
    VidConfig,
    build_detection_model,
)

__all__ = [
    "GeneralizedRCNN",
    "GeneralizedRCNNDFF",
    "GeneralizedRCNNFGFA",
    "GeneralizedRCNNMEGA",
    "GeneralizedRCNNRDN",
    "RCNNConfig",
    "VidConfig",
    "build_detection_model",
]
