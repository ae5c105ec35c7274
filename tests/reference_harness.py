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


def _torch_roi_align_soft(input, rois, output_size, spatial_scale,
                          sampling_ratio):
    """Differentiable pure-torch ROIAlign with the kernel's exact semantics
    (csrc/cpu/ROIAlign_cpu.cpp: no -0.5 offset, roi size clamped to >=1,
    (i+0.5)/grid sample points, y<-1 or y>H zeroed, coords clamped at 0 and
    snapped at the high edge). Used ONLY to synthesize the CPU backward the
    reference never implemented; forward values still come from _C."""
    import torch as _t

    ph, pw = output_size
    B, C, H, W = input.shape
    outs = []
    for k in range(rois.shape[0]):
        b = int(rois[k, 0].item())
        x1, y1, x2, y2 = (float(v) * spatial_scale for v in rois[k, 1:])
        roi_w = max(x2 - x1, 1.0)
        roi_h = max(y2 - y1, 1.0)
        bin_h, bin_w = roi_h / ph, roi_w / pw
        gh = sampling_ratio if sampling_ratio > 0 else int(-(-roi_h // ph))
        gw = sampling_ratio if sampling_ratio > 0 else int(-(-roi_w // pw))
        iy = (_t.arange(gh, dtype=_t.float64) + 0.5) * bin_h / gh
        ix = (_t.arange(gw, dtype=_t.float64) + 0.5) * bin_w / gw
        ys = (y1 + _t.arange(ph, dtype=_t.float64)[:, None] * bin_h
              + iy[None, :]).reshape(-1)  # (ph*gh)
        xs = (x1 + _t.arange(pw, dtype=_t.float64)[:, None] * bin_w
              + ix[None, :]).reshape(-1)  # (pw*gw)
        yv = ys[:, None].expand(ph * gh, pw * gw).reshape(-1)
        xv = xs[None, :].expand(ph * gh, pw * gw).reshape(-1)
        inside = (yv >= -1.0) & (yv <= H) & (xv >= -1.0) & (xv <= W)
        y = yv.clamp(min=0.0)
        x = xv.clamp(min=0.0)
        yl = y.floor().long().clamp(max=H - 1)
        xl = x.floor().long().clamp(max=W - 1)
        snap_y = yl >= H - 1
        snap_x = xl >= W - 1
        y = _t.where(snap_y, yl.double(), y)
        x = _t.where(snap_x, xl.double(), x)
        yh = (yl + 1).clamp(max=H - 1)
        xh = (xl + 1).clamp(max=W - 1)
        ly, lx = (y - yl).float(), (x - xl).float()
        hy, hx = 1 - ly, 1 - lx
        m = inside.float()
        fm = input[b]  # (C, H, W)
        val = (
            (hy * hx * m) * fm[:, yl, xl]
            + (hy * lx * m) * fm[:, yl, xh]
            + (ly * hx * m) * fm[:, yh, xl]
            + (ly * lx * m) * fm[:, yh, xh]
        )  # (C, ph*gh*pw*gw)
        val = val.reshape(C, ph, gh, pw, gw).mean(dim=(2, 4))
        outs.append(val)
    return (
        _t.stack(outs)
        if outs
        else input.new_zeros((0, C, ph, pw))
    )


def install_differentiable_roi_align():
    """Give the reference's CPU ROIAlign a backward (train-parity tests).

    The reference CPU kernel is forward-only (layers/roi_align.py:33 raises
    'Not implemented on the CPU'); forward values keep coming from the exact
    _C kernel while backward is torch autograd through the semantically
    identical recompute above."""
    import torch as _t
    from torch.autograd import Function

    load_reference()
    # `import mega_core.layers.roi_align` resolves to the FUNCTION re-exported
    # by layers/__init__; grab the real submodule
    ra = sys.modules["mega_core.layers.roi_align"]
    _C = sys.modules["mega_core._C"]

    class _DiffROIAlign(Function):
        @staticmethod
        def forward(ctx, input, roi, output_size, spatial_scale,
                    sampling_ratio):
            ctx.save_for_backward(input, roi)
            ctx.meta = (output_size, spatial_scale, sampling_ratio)
            return _C.roi_align_forward(
                input, roi, spatial_scale, output_size[0], output_size[1],
                sampling_ratio,
            )

        @staticmethod
        def backward(ctx, grad_output):
            input, roi = ctx.saved_tensors
            output_size, spatial_scale, sampling_ratio = ctx.meta
            with _t.enable_grad():
                inp = input.detach().requires_grad_(True)
                soft = _torch_roi_align_soft(
                    inp, roi.detach(), output_size, spatial_scale,
                    sampling_ratio,
                )
                (g,) = _t.autograd.grad(soft, inp, grad_output)
            return g, None, None, None, None

    ra.roi_align = _DiffROIAlign.apply
    return _torch_roi_align_soft


def install_f64_support():
    """Let the reference run a FLOAT64 forward/backward (gradient-oracle
    tests): torch's own f32 autograd loses up to 2.2% on early-backbone
    leaves through the strided-conv backward (measured DFF: f32-vs-f64
    distance 0.0217 on layer2.1.conv1 while this framework's f32 grads sit
    within 4e-6 of the f64 truth), so the honest reference gradient is the
    double-precision one. Two kernels are f32-only and get shims:
      - _box_nms computes on f32-cast inputs (discrete index selection;
        keep-sets identical to the f32 run outside exact ties), and
      - roi_align routes double inputs through the soft recompute
        (_torch_roi_align_soft; its bilinear weights round through f32,
        a ~1e-7 relative perturbation, far under oracle tolerances).
    Call AFTER the model is built (building re-installs the differentiable
    ROIAlign shim, which would clobber the double wrapper)."""
    import torch as _t

    load_reference()
    import mega_core.structures.boxlist_ops as blo

    if not getattr(blo._box_nms, "_f64_shim", False):
        orig_nms = blo._box_nms

        def nms32(boxes, scores, thresh):
            return orig_nms(boxes.float(), scores.float(), thresh)

        nms32._f64_shim = True
        blo._box_nms = nms32

    ra = sys.modules["mega_core.layers.roi_align"]
    orig_ra = ra.roi_align
    if not getattr(orig_ra, "_f64_shim", False):

        def ra_f64(input, roi, output_size, spatial_scale, sampling_ratio):
            if input.dtype == _t.float64:
                return _torch_roi_align_soft(
                    input, roi, output_size, spatial_scale, sampling_ratio
                )
            return orig_ra(
                input, roi, output_size, spatial_scale, sampling_ratio
            )

        ra_f64._f64_shim = True
        ra.roi_align = ra_f64
