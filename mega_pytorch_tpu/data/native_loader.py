"""ctypes bindings for the native C++ loader core (csrc/loader.cpp).

Builds the shared library on first use (g++ -O3, linked against libjpeg) and
exposes decode→resize→normalize→canvas for single images and multithreaded
batches. Falls back cleanly when the toolchain or libjpeg is unavailable —
the PIL path in data/transforms.py remains the default for training; the
native path feeds the streaming inference loop where per-frame decode
otherwise bounds throughput.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()


def _build_lib() -> str:
    # Cache key = source content hash + host identity: a binary built with
    # -march=native on another machine (or from older sources) is never reused,
    # so a stale/foreign .so can't SIGILL at decode time.
    src_dir = os.path.join(os.path.dirname(__file__), "..", "csrc")
    src = os.path.join(src_dir, "loader.cpp")
    build_dir = os.path.join(src_dir, "build")
    os.makedirs(build_dir, exist_ok=True)
    with open(src, "rb") as f:
        key = hashlib.sha256(
            f.read() + f"|{platform.machine()}|{platform.processor()}".encode()
        ).hexdigest()[:16]
    lib_path = os.path.join(build_dir, f"libmegaloader-{key}.so")
    if os.path.exists(lib_path):
        return lib_path
    tmp_path = lib_path + f".tmp{os.getpid()}"
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        src, "-o", tmp_path, "-ljpeg", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp_path, lib_path)
    return lib_path


def get_lib():
    """Load (building if needed) the native library, or raise."""
    global _LIB
    with _LOCK:
        if _LIB is None:
            lib = ctypes.CDLL(_build_lib())
            lib.decode_resize_normalize.restype = ctypes.c_int
            lib.decode_resize_normalize.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
            ]
            lib.decode_batch.restype = ctypes.c_int
            lib.decode_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ]
            _LIB = lib
    return _LIB


def available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def load_frame(
    path: str, min_size: int, max_size: int, flip: bool,
    canvas_h: int, canvas_w: int,
):
    """→ (canvas (H, W, 3) float32 normalized BGR255, (oh, ow) true size)."""
    lib = get_lib()
    out = np.zeros((canvas_h, canvas_w, 3), np.float32)
    hw = np.zeros(2, np.int32)
    rc = lib.decode_resize_normalize(
        path.encode(), min_size, max_size, int(flip), canvas_h, canvas_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hw.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
    )
    if rc != 0:
        raise IOError(f"native decode failed ({rc}) for {path}")
    return out, (int(hw[0]), int(hw[1]))


def load_batch(
    paths: list[str], min_size: int, max_size: int, flips: list[bool],
    canvas_h: int, canvas_w: int, num_threads: int = 8,
):
    """Multithreaded batch decode → ((N, H, W, 3) float32, (N, 2) sizes)."""
    lib = get_lib()
    n = len(paths)
    outs = np.zeros((n, canvas_h, canvas_w, 3), np.float32)
    hws = np.zeros((n, 2), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    flips_arr = np.asarray(flips, np.int32)
    failures = lib.decode_batch(
        arr, n, min_size, max_size,
        flips_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        canvas_h, canvas_w,
        outs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        hws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        num_threads,
    )
    if failures:
        raise IOError(f"native batch decode: {failures}/{n} failures")
    return outs, hws.astype(np.float32)
