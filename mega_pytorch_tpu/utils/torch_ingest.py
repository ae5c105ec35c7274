"""PyTorch state-dict → flax params ingestion.

Layout conversions between torch and our NHWC/flax modules:
  Conv2d          (O, I, kH, kW)  →  kernel (kH, kW, I, O)
  ConvTranspose2d (I, O, kH, kW)  →  kernel (kH, kW, O, I)   [transpose_kernel=True]
  Linear          (O, I)          →  kernel (I, O)
  FrozenBN buffers                →  same names, 1:1

The reference loads three checkpoint flavors (utils/checkpoint.py:120-151,
c2_model_loading.py, model_serialization.py): native torch .pth, Caffe2
Detectron .pkl, and FlowNet .ckpt — all with fuzzy suffix matching. Here we
convert names mechanically because our module tree mirrors the torch layout.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def deconv_kernel(w: np.ndarray) -> np.ndarray:
    # torch ConvTranspose2d stores (in, out, kH, kW); flax transpose_kernel=True
    # expects (kH, kW, out, in)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def set_in_tree(tree: Dict[str, Any], path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def to_numpy(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


# translation of one torch parameter name (dot-separated, relative to a module
# whose flax twin uses the same submodule names) into a flax path + converter
_BN_SUFFIXES = {"weight", "bias", "running_mean", "running_var"}


def default_name_rule(name: str) -> tuple[tuple[str, ...], Callable] | None:
    """Map ``layerX.N.convY.weight``-style torch names to flax paths.

    Handles: conv weights/biases, FrozenBN buffers, sequential downsample
    (``downsample.0`` conv / ``downsample.1`` bn), and Linear (``fc*``) params.
    Returns None for names to skip (e.g. num_batches_tracked).
    """
    parts = name.split(".")
    leaf = parts[-1]
    if leaf == "num_batches_tracked":
        return None

    # downsample.0 / downsample.1 → downsample_conv / downsample_bn
    mapped = []
    i = 0
    while i < len(parts) - 1:
        if parts[i] == "downsample" and i + 1 < len(parts) - 1:
            mapped.append("downsample_conv" if parts[i + 1] == "0" else "downsample_bn")
            i += 2
        else:
            mapped.append(parts[i])
            i += 1
    mod = mapped[-1] if mapped else ""

    is_bn = mod.startswith("bn") or mod.endswith("_bn")
    if is_bn:
        assert leaf in _BN_SUFFIXES, name
        return tuple(mapped) + (leaf,), to_numpy

    is_linear = mod.startswith("fc") or mod in ("cls_score", "bbox_pred")
    if leaf == "weight":
        if is_linear:
            return tuple(mapped) + ("kernel",), lambda t: linear_kernel(to_numpy(t))
        if mod.startswith("deconv") or mod.startswith("upsample"):
            return tuple(mapped) + ("kernel",), lambda t: deconv_kernel(to_numpy(t))
        return tuple(mapped) + ("kernel",), lambda t: conv_kernel(to_numpy(t))
    if leaf == "bias":
        return tuple(mapped) + ("bias",), to_numpy
    # 1-D learned vectors (e.g. attention position bias) pass through
    return tuple(mapped) + (leaf,), to_numpy


def ingest_state_dict(
    state_dict: Mapping[str, Any],
    name_rule: Callable = default_name_rule,
    strip_prefixes: tuple[str, ...] = ("module.",),
) -> Dict[str, Any]:
    """Convert a torch state dict to a nested flax param dict."""
    params: Dict[str, Any] = {}
    for name, tensor in state_dict.items():
        for pre in strip_prefixes:
            if name.startswith(pre):
                name = name[len(pre):]
        rule = name_rule(name)
        if rule is None:
            continue
        path, convert = rule
        set_in_tree(params, path, convert(tensor))
    return params
