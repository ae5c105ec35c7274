"""Load the LIVE reference implementation (/root/reference) on CPU.

This powers the execution-parity tests: instead of re-implementing reference
math as oracles, we build the reference's own CPU kernels
(mega_core/csrc/cpu/{nms_cpu,ROIAlign_cpu}.cpp via torch cpp_extension),
import mega_core itself, and compare detections end-to-end.

The reference targets torch 1.x / old numpy and some unavailable packages, so
we install small compatibility shims before import:
  - yacs.config.CfgNode  (only attribute-tree + clone/freeze surface is used)
  - apex.amp             (float_function/half_function = identity)
  - cv2                  (never called on the modeling path)
  - torch._six.PY3       (utils/imports.py)
  - np.float/int/bool    (anchor_generator.py:229 uses np.float)
The csrc copies get two mechanical torch-2.x fixes (AT_DISPATCH takes
scalar_type(); Tensor::type().is_cuda() -> Tensor::is_cuda()).

Nothing under /root/reference is modified; patched csrc copies and build
artifacts live in /root/repo/.cache (gitignored).
"""

from __future__ import annotations

import copy
import glob
import os
import re
import shutil
import sys
import types

REF = "/root/reference"
CACHE = "/root/repo/.cache"

_loaded = None


class CfgNode(dict):
    """Minimal yacs-compatible config node (see module docstring)."""

    def __init__(self, d=None):
        super().__init__()
        if d:
            for k, v in d.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self[k] = v

    def clone(self):
        return copy.deepcopy(self)

    def freeze(self):
        pass

    def defrost(self):
        pass

    def is_frozen(self):
        return False

    def merge_from_list(self, opts):
        import ast

        for k, v in zip(opts[0::2], opts[1::2]):
            node = self
            *path, leaf = k.split(".")
            for p in path:
                node = node[p]
            if isinstance(v, str):
                try:
                    v = ast.literal_eval(v)
                except (ValueError, SyntaxError):
                    pass
            node[leaf] = v


def _install_stubs():
    if "yacs" not in sys.modules:
        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    if "apex" not in sys.modules:
        apex = types.ModuleType("apex")
        amp = types.ModuleType("apex.amp")
        amp.float_function = lambda f: f
        amp.half_function = lambda f: f
        apex.amp = amp
        sys.modules["apex"] = apex
        sys.modules["apex.amp"] = amp
    if "cv2" not in sys.modules:
        cv2 = types.ModuleType("cv2")

        def _cv2_missing(name):
            if name.startswith("__"):  # introspection (e.g. inspect.getmodule)
                raise AttributeError(name)

            def fail(*a, **k):
                raise RuntimeError(f"cv2 stub: {name} not available")

            return fail

        cv2.__getattr__ = _cv2_missing
        sys.modules["cv2"] = cv2
    import torch

    if not hasattr(torch, "_six"):
        torch._six = types.SimpleNamespace(PY3=True)
    import numpy as np

    for name, py in (("float", float), ("int", int), ("bool", bool)):
        if not hasattr(np, name):
            setattr(np, name, py)


def _patched_csrc() -> str:
    dst = os.path.join(CACHE, "ref_csrc")
    stamp = os.path.join(dst, ".patched")
    if os.path.exists(stamp):
        return dst
    os.makedirs(CACHE, exist_ok=True)
    if os.path.exists(dst):
        shutil.rmtree(dst)
    shutil.copytree(os.path.join(REF, "mega_core", "csrc"), dst)
    shutil.rmtree(os.path.join(dst, "cuda"))
    for path in glob.glob(os.path.join(dst, "cpu", "*.cpp")):
        with open(path) as f:
            src = f.read()
        # torch>=1.5: AT_DISPATCH_* takes ScalarType, and DeprecatedTypeProperties
        # lost is_cuda(); rewrite x.type().is_cuda() -> x.is_cuda() first, then
        # the remaining .type() uses (dispatch macros, dtype equality checks).
        src = re.sub(r"(\w+)\.type\(\)\.is_cuda\(\)", r"\1.is_cuda()", src)
        src = re.sub(r"(\w+)\.type\(\)", r"\1.scalar_type()", src)
        with open(path, "w") as f:
            f.write(src)
    with open(stamp, "w") as f:
        f.write("ok")
    return dst


def _build_ext():
    from torch.utils.cpp_extension import load

    dst = _patched_csrc()
    build_dir = os.path.join(CACHE, "ref_ext_build")
    os.makedirs(build_dir, exist_ok=True)
    return load(
        name="mega_ref_C",
        sources=[os.path.join(dst, "vision.cpp")]
        + sorted(glob.glob(os.path.join(dst, "cpu", "*.cpp"))),
        extra_include_paths=[dst],
        build_directory=build_dir,
        verbose=False,
    )


def make_ref_vid_cfg(depth: int = 50, pre_nms: int = 500, post_nms: int = 50,
                     detections: int = 2000):
    """Reference cfg for the VID single-frame recipe (BASE_RCNN_1gpu.yaml
    semantics) on CPU, with shrunken proposal counts for test speed. The
    counterpart RCNNConfig must use the same numbers."""
    load_reference()
    from mega_core.config import cfg as global_cfg

    cfg = global_cfg.clone()
    cfg.MODEL.DEVICE = "cpu"
    cfg.MODEL.META_ARCHITECTURE = "GeneralizedRCNN"
    cfg.MODEL.BACKBONE.CONV_BODY = f"R-{depth}-C4"
    cfg.MODEL.RPN.ANCHOR_SIZES = (64, 128, 256, 512)
    cfg.MODEL.RPN.PRE_NMS_TOP_N_TEST = pre_nms
    cfg.MODEL.RPN.POST_NMS_TOP_N_TEST = post_nms
    cfg.MODEL.ROI_HEADS.SCORE_THRESH = 0.001
    cfg.MODEL.ROI_HEADS.NMS = 0.5
    cfg.MODEL.ROI_HEADS.DETECTIONS_PER_IMG = detections
    cfg.MODEL.ROI_BOX_HEAD.NUM_CLASSES = 31
    cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    cfg.MODEL.ROI_BOX_HEAD.FEATURE_EXTRACTOR = "ResNetConv52MLPFeatureExtractor"
    cfg.MODEL.ROI_BOX_HEAD.PREDICTOR = "FPNPredictor"
    cfg.MODEL.RESNETS.RES5_DILATION = 2
    cfg.MODEL.VID.ROI_BOX_HEAD.REDUCE_CHANNEL = depth == 50
    return cfg


def load_reference():
    """Import and return the live mega_core package (cached)."""
    global _loaded
    if _loaded is not None:
        return _loaded
    _install_stubs()
    ext = _build_ext()
    sys.modules["mega_core._C"] = ext
    # utils/distributed.py shells out to nvidia-smi at import time
    dist = types.ModuleType("mega_core.utils.distributed")
    dist.gpu_indices = lambda *a, **k: iter(())
    dist.ompi_size = lambda: 1
    dist.ompi_rank = lambda: 0
    sys.modules["mega_core.utils.distributed"] = dist
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import mega_core  # noqa: F401

    mega_core._C = ext
    import mega_core.modeling.detector  # noqa: F401

    _loaded = mega_core
    return _loaded
