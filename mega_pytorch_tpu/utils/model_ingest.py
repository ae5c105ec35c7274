"""Full-model ingestion of reference PyTorch checkpoints.

Maps the reference's state-dict names (mega_core module tree) onto our flax
param tree (utils/model_serialization.py's suffix matching becomes an explicit
rename table — our module tree mirrors torch's, so the mapping is total):

  backbone.body.*                     → backbone/*
  rpn.head.{conv,cls_logits,bbox_pred}→ rpn/*
  roi_heads.box.feature_extractor.*   → extractor/*
  roi_heads.box.predictor.*           → predictor/*
  flownet.* / embednet.*              → flownet/* / embednet/*
  fcs.N / l_fcs.N                     → fcs_N / l_fcs_N
  {l_,g_,}W{q,k}s.N                   → {l_,g_,}attn_N/W{q,k} (transposed)
  {l_,}Wgs.N                          → ..attn_N/Wg  (1x1 conv → dense)
  {l_,g_,}Wvs.N                       → ..attn_N/Wv_kernel/bias (grouped 1x1 →
                                        per-group (feat, feat/groups) matmuls)
  {l_,g_,}us.N (g, 1, 64)             → ..attn_N/u (g, 64)

Layout caveats handled here:
  * fc layers that consume POOLED features (fc6, fcs.0, l_fcs.0): torch
    flattens (C, 7, 7) channel-major, we flatten (7, 7, C) spatial-major —
    the kernel is permuted accordingly.
  * FrozenBN buffers map 1:1; conv/deconv/linear kernels use torch_ingest's
    layout converters.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

from .torch_ingest import (
    conv_kernel,
    deconv_kernel,
    linear_kernel,
    set_in_tree,
    to_numpy,
)

_PREFIX_MAP = [
    ("module.", ""),
    ("backbone.body.", "backbone."),
    ("rpn.head.", "rpn."),
    ("roi_heads.box.feature_extractor.", "extractor."),
    ("roi_heads.box.predictor.", "predictor."),
]

_POOLED_FC = {"extractor.fc6", "extractor.fcs_0", "extractor.l_fcs_0"}
_BN_LEAVES = {"weight", "bias", "running_mean", "running_var"}
_ATTN_RE = re.compile(r"^(l_|g_)?(Wqs|Wks|Wgs|Wvs|us)\.(\d+)$")


def _pooled_fc_kernel(w: np.ndarray, resolution: int = 7) -> np.ndarray:
    """(out, C*res*res) channel-major → (res*res*C, out) spatial-major."""
    out, total = w.shape
    c = total // (resolution * resolution)
    w = w.reshape(out, c, resolution, resolution)
    w = np.transpose(w, (2, 3, 1, 0))  # (res, res, C, out)
    return np.ascontiguousarray(w.reshape(resolution * resolution * c, out))


def _grouped_wv(w: np.ndarray, groups: int = 16) -> np.ndarray:
    """torch grouped conv (feat, feat, 1, 1) → (groups, feat, feat/groups)."""
    feat = w.shape[0]
    d = feat // groups
    w = w[:, :, 0, 0]  # (out=feat, in_per_group=feat)
    return np.stack(
        [np.ascontiguousarray(w[g * d : (g + 1) * d].T) for g in range(groups)]
    )  # (g, feat, d)


def translate_name(name: str) -> list[str] | None:
    """torch dotted name → our dotted module path (without the leaf)."""
    for pre, rep in _PREFIX_MAP:
        if name.startswith(pre):
            name = rep + name[len(pre):]
    parts = name.split(".")
    out: list[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        nxt = parts[i + 1] if i + 1 < len(parts) else None
        # ModuleList containers: fcs.0 → fcs_0 ; Wqs.0 → attn_0/Wq etc.
        if nxt is not None and nxt.isdigit():
            m = _ATTN_RE.match(f"{p}.{nxt}")
            if m:
                side, kind, idx = m.group(1) or "", m.group(2), m.group(3)
                attn = f"{side}attn_{idx}"
                leaf = {"Wqs": "Wq", "Wks": "Wk", "Wgs": "Wg", "Wvs": "Wv", "us": "u"}[kind]
                out.extend([attn, leaf])
                i += 2
                continue
            if p.endswith("fcs"):
                out.append(f"{p}_{nxt}")
                i += 2
                continue
        if p == "downsample" and nxt in ("0", "1"):
            out.append("downsample_conv" if nxt == "0" else "downsample_bn")
            i += 2
            continue
        out.append(p)
        i += 1
    return out


def convert_entry(path: list[str], tensor, groups: int = 16):
    """(module path incl. leaf, tensor) → list of (flax path, array)."""
    leaf = path[-1]
    mod = path[-2] if len(path) >= 2 else ""
    w = to_numpy(tensor)

    if leaf == "num_batches_tracked":
        return []
    # attention leaves
    if leaf == "u":
        # ParameterList us.N: torch (groups, 1, embed) → ours (groups, embed)
        return [(tuple(path[:-1]) + ("u",), w.reshape(w.shape[0], -1))]
    if mod == "u":
        return [(tuple(path[:-1]) + ("u",), w.reshape(w.shape[0], -1))]
    if mod == "Wv":
        if leaf == "weight":
            return [(tuple(path[:-2]) + ("Wv_kernel",), _grouped_wv(w, groups))]
        return [(tuple(path[:-2]) + ("Wv_bias",), w)]
    if mod in ("Wq", "Wk"):
        if leaf == "weight":
            return [(tuple(path[:-1]) + ("kernel",), linear_kernel(w))]
        return [(tuple(path[:-1]) + ("bias",), w)]
    if mod == "Wg":
        if leaf == "weight":  # (groups, emb, 1, 1) conv → dense (emb, groups)
            return [(tuple(path[:-1]) + ("kernel",), np.ascontiguousarray(w[:, :, 0, 0].T))]
        return [(tuple(path[:-1]) + ("bias",), w)]

    is_bn = mod.startswith("bn") or mod.endswith("_bn")
    if is_bn:
        assert leaf in _BN_LEAVES, path
        return [(tuple(path), w)]

    dotted = ".".join(path[:-1])
    is_linear = (
        mod.startswith("fc")
        or "fcs_" in mod
        or mod in ("cls_score", "bbox_pred")
    ) and w.ndim == 2

    if leaf == "weight":
        if is_linear:
            if dotted in _POOLED_FC:
                return [(tuple(path[:-1]) + ("kernel",), _pooled_fc_kernel(w))]
            return [(tuple(path[:-1]) + ("kernel",), linear_kernel(w))]
        if mod.startswith("deconv") or mod.startswith("upsample"):
            return [(tuple(path[:-1]) + ("kernel",), deconv_kernel(w))]
        if w.ndim == 4:
            return [(tuple(path[:-1]) + ("kernel",), conv_kernel(w))]
        return [(tuple(path), w)]
    if leaf == "bias":
        return [(tuple(path[:-1]) + ("bias",), w)]
    return [(tuple(path), w)]


def convert_reference_state_dict(state_dict: dict, groups: int = 16) -> dict:
    """Full torch state dict → nested flax param dict."""
    tree: dict = {}
    for name, tensor in state_dict.items():
        path = translate_name(name)
        for p, arr in convert_entry(path, tensor, groups):
            set_in_tree(tree, p, arr)
    return tree


def merge_params(init_params: Any, loaded: dict, logger=None, prefix=()) -> Any:
    """Overlay loaded arrays onto an init tree (shape-checked); missing leaves
    keep their init values (reference's partial suffix-matching behavior)."""
    if not isinstance(init_params, dict):
        arr = np.asarray(loaded)
        if arr.shape != tuple(init_params.shape):
            raise ValueError(
                f"shape mismatch at {'/'.join(prefix)}: "
                f"checkpoint {arr.shape} vs model {tuple(init_params.shape)}"
            )
        return arr.astype(np.asarray(init_params).dtype)
    out = {}
    for k, v in init_params.items():
        if isinstance(loaded, dict) and k in loaded:
            out[k] = merge_params(v, loaded[k], logger, prefix + (k,))
        else:
            if logger:
                logger.info(f"[ingest] no checkpoint value for {'/'.join(prefix + (k,))}; keeping init")
            out[k] = v
    if logger and isinstance(loaded, dict):
        for k in loaded:
            if k not in init_params:
                logger.info(f"[ingest] unused checkpoint key {'/'.join(prefix + (k,))}")
    return out


def load_reference_weights(path: str, init_params: Any, logger=None) -> Any:
    """Load a torch .pth (reference format) and overlay it onto init params."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = payload.get("model", payload) if isinstance(payload, dict) else payload
    loaded = convert_reference_state_dict(state_dict)
    return merge_params(init_params, loaded, logger)


def _union_trees(a: dict, b: dict) -> dict:
    """Recursive union of two param trees (b wins on leaf conflicts)."""
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _union_trees(out[k], v)
        else:
            out[k] = v
    return out


def init_inference_params(model, method: str, preprocessor, dataset, logger=None):
    """Initialize a full param tree through the method's streaming test path.

    No single streaming method touches every submodule (e.g. DFF's
    detect_non_key never runs the backbone), so the entry/cache builder and
    the detect step are both initialized and their trees unioned."""
    import jax

    from ..structures.image_list import ImageBatch

    sample = preprocessor(dataset[0])
    one = ImageBatch(tensors=sample["cur"], sizes=sample["cur_size"])
    key = jax.random.PRNGKey(0)

    # every phase is jitted: un-jitted flax init/apply dispatches op-by-op,
    # which costs minutes through a ~30ms-RTT device relay
    if method == "base":
        init = jax.jit(lambda k, im: model.init(k, im, train=False))
        return init(key, one)["params"]
    if method == "dff":
        def _dff(k, im):
            p1 = model.init(k, im, method=model.make_key)["params"]
            carry = model.apply({"params": p1}, im, method=model.make_key)
            return p1, carry

        p1, carry = jax.jit(_dff)(key, one)
        p2 = jax.jit(
            lambda k, c, im: model.init(k, c, im, method=model.detect_non_key)
        )(key, carry, one)["params"]
        return _union_trees(p1, p2)

    # fgfa / rdn / mega share the precompute→carry→step pattern
    def _boot(k, im):
        p1 = model.init(k, im, method=model.precompute)["params"]
        entry = model.apply({"params": p1}, im, method=model.precompute)
        carry = model.apply(
            {"params": p1}, entry, im.sizes[0], method=model.init_carry
        )
        return p1, carry

    p1, carry = jax.jit(_boot)(key, one)
    p2 = jax.jit(
        lambda k, c, im: model.init(k, c, im, method=model.test_step)
    )(key, carry, one)["params"]
    return _union_trees(p1, p2)


# ---------------------------------------------------------------------------
# Caffe2 / Detectron pickle ingestion (ImageNet-pretrained backbones)
# ---------------------------------------------------------------------------
# The reference converts Detectron blob names to torch names in
# utils/c2_model_loading.py:12-63 and loads them with suffix matching. The
# catalog:// ImageNet R-50/R-101 pkls contain only backbone blobs with
# AffineChannel (folded) BN: scale/bias only — which matches FrozenBN with
# running_mean=0 / running_var=1 (our init), so loading weight/bias alone is
# exact.

_C2_BLOCK = re.compile(r"^res(\d)_(\d+)_branch(1|2a|2b|2c)(_bn)?_(w|b|s)$")
_C2_STEM = re.compile(r"^(?:res_)?conv1(_bn)?_(w|b|s)$")

_BRANCH_CONV = {"2a": "conv1", "2b": "conv2", "2c": "conv3", "1": "downsample_conv"}
_BRANCH_BN = {"2a": "bn1", "2b": "bn2", "2c": "bn3", "1": "downsample_bn"}
_C2_LEAF = {"w": "kernel", "s": "weight", "b": "bias"}


def c2_blob_to_path(name: str):
    """One Detectron blob name → (flax path rooted at the backbone, is_layer4)."""
    if name.endswith("_momentum") or name.startswith("fc1000"):
        return None
    m = _C2_STEM.match(name)
    if m:
        is_bn, leaf = m.group(1), m.group(2)
        mod = "bn1" if is_bn else "conv1"
        return ("stem", mod, _C2_LEAF[leaf]), False
    m = _C2_BLOCK.match(name)
    if m:
        stage, block, branch, is_bn, leaf = m.groups()
        layer = f"layer{int(stage) - 1}"
        mod = (_BRANCH_BN if is_bn else _BRANCH_CONV)[branch]
        return (layer, str(int(block)), mod, _C2_LEAF[leaf]), layer == "layer4"
    return None


def convert_c2_blobs(blobs: dict) -> dict:
    """Detectron blob dict → {"backbone": ..., "extractor": {"head": ...}}.

    layer4 (res5) lands under the box-head extractor, mirroring the
    reference's suffix matching of ImageNet weights into the ROI head."""
    tree: dict = {}
    for name, arr in blobs.items():
        hit = c2_blob_to_path(name)
        if hit is None:
            continue
        path, is_l4 = hit
        arr = np.asarray(arr)
        if path[-1] == "kernel":
            arr = conv_kernel(arr)
        root = ("extractor", "head") if is_l4 else ("backbone",)
        set_in_tree(tree, root + path, arr)
    return tree


def load_c2_weights(path: str, init_params, logger=None):
    """Load a Detectron .pkl (catalog:// ImageNet pretrained) onto init params."""
    import pickle as pk

    with open(path, "rb") as f:
        payload = pk.load(f, encoding="latin1")
    blobs = payload.get("blobs", payload) if isinstance(payload, dict) else payload
    return merge_params(init_params, convert_c2_blobs(blobs), logger)


# ---------------------------------------------------------------------------
# FlowNet checkpoint ingestion (MODEL.VID.FLOWNET_WEIGHT, DFF/FGFA warm start)
# ---------------------------------------------------------------------------
# The reference loads models/flownet.ckpt and suffix-matches keys onto the
# flownet.* module names (utils/checkpoint.py load_flownet +
# model_serialization.py:39 "flownet" filter). Our flownet module names
# mirror torch's, so the mapping is prefix-normalization + layout conversion.

def load_flownet_weights(path: str, init_params, logger=None):
    """Load a torch FlowNet checkpoint into params["flownet"] only."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = payload.get("state_dict", payload.get("model", payload))
    tree: dict = {}
    for name, tensor in state_dict.items():
        for pre in ("module.", "flownet."):
            if name.startswith(pre):
                name = name[len(pre):]
        path_parts = translate_name("flownet." + name)
        for p, arr in convert_entry(path_parts, tensor):
            set_in_tree(tree, p, arr)
    return merge_params(init_params, tree, logger)
