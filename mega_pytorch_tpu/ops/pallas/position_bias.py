"""Fused relation-attention position bias (Pallas TPU kernel).

The reference computes, per attention stage,
    emb = sinusoid(position_matrix(rois, ref_rois))   # (N, M, 64)
    bias = log(relu(Conv1x1_Wg(emb)) + 1e-6)          # (N, M, groups)
(roi_box_feature_extractors.py extract_position_{matrix,embedding} + the Wg
branch of attention_module_multi_head). Materializing the (N, M, 64)
embedding costs ~650 MB of HBM traffic per MEGA stage-0 call (N=675,
M=3750) — the measured hot spot of the streaming pipeline.

This kernel computes geometry → sinusoids → Wg contraction → relu → log
entirely in VMEM per (TN, TM) tile and writes only the (TN, TM, groups) bias
tile. The contraction over the 64 (channel, sin|cos, freq) terms runs as a
scalar-FMA unroll against SMEM weights — hardware Mosaic on this jax version
lowers neither the 4D dot_general nor the lane/sublane-mixing reshape a flat
MXU matmul would need (verified: 'tpu.matmul op ... lhs contracting dims
must be of size 1'), so the VPU loop is the only formulation that compiles
on a real chip.

The pure-XLA twin (`reference_position_bias`) keeps the einsum formulation
(XLA lowers it fine and fuses the sinusoid producers) and is the production
path everywhere; measured 5.4 ms for one MEGA stage-0 call (675 x 3750) on
v5e, dominated by HBM traffic on the sinusoid intermediates. The kernel is
kept (with parity tests) as the starting point for a fully fused attention
kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bias_freq_scales(num_freq: int) -> list[float]:
    """The reference's sinusoid frequency ladder: 100 / 1000^(f/F)
    (extract_position_embedding, roi_box_feature_extractors.py:125-144).

    The SINGLE definition shared by this module's kernel/XLA twin and the
    flash attention kernel's in-kernel bias + separable dw/dh factors
    (relation_attention.py), so one site cannot silently fork the convention
    (ADVICE r4 #2)."""
    log1000 = float(np.log(1000.0))
    return [
        100.0 * math.exp(-f * (1.0 / num_freq) * log1000)
        for f in range(num_freq)
    ]


def _geometry(r: jnp.ndarray):
    """Box geometry with the reference's 1e-3 w/h clamp (shared convention —
    see bias_freq_scales)."""
    w = r[:, 2] - r[:, 0] + 1.0
    h = r[:, 3] - r[:, 1] + 1.0
    cx = 0.5 * (r[:, 0] + r[:, 2])
    cy = 0.5 * (r[:, 1] + r[:, 3])
    return jnp.maximum(w, 1e-3), jnp.maximum(h, 1e-3), cx, cy


def _log_ratios(rois, ref_rois):
    """(TN, 4) x (TM, 4) → 4 slabs (TN, TM): the pairwise geometry channels."""
    w, h, cx, cy = _geometry(rois)
    w_r, h_r, cx_r, cy_r = _geometry(ref_rois)
    dx = jnp.log(jnp.abs((cx[:, None] - cx_r[None, :]) / w[:, None]) + 1e-3)
    dy = jnp.log(jnp.abs((cy[:, None] - cy_r[None, :]) / h[:, None]) + 1e-3)
    dw = jnp.log(w[:, None] / w_r[None, :])
    dh = jnp.log(h[:, None] / h_r[None, :])
    return dx, dy, dw, dh


def _kernel(rois_ref, refs_ref, wg_ref, b_ref, out_ref, *, embed_dim: int):
    """FMA-unroll tile kernel; wg/b live in SMEM (scalar element reads)."""
    num_freq = embed_dim // 8
    pos4 = _log_ratios(rois_ref[:], refs_ref[:])
    g = out_ref.shape[0]
    scales = bias_freq_scales(num_freq)
    # stream over the 64 (channel, freq) terms, keeping only the current
    # sin/cos slab pair and the g accumulators live — precomputing all 128
    # slabs per tile blows the 16M scoped-VMEM stack limit
    accs = [jnp.zeros_like(pos4[0]) + b_ref[0, gi] for gi in range(g)]
    for c in range(4):
        for f in range(num_freq):
            ang = pos4[c] * scales[f]  # (TN, TM)
            s, co = jnp.sin(ang), jnp.cos(ang)
            ws_row = c * 2 * num_freq + f
            wc_row = c * 2 * num_freq + num_freq + f
            accs = [
                accs[gi] + s * wg_ref[ws_row, gi] + co * wg_ref[wc_row, gi]
                for gi in range(g)
            ]
    # stack on axis 0: g rides the leading (untiled) dim — stacking on the
    # lane axis would pad each slab to 128 lanes (16x VMEM blow-up)
    pw = jnp.maximum(jnp.stack(accs, axis=0), 0.0)  # (g, TN, TM)
    out_ref[:] = jnp.log(pw + 1e-6)


def _pad_rows(x: jnp.ndarray, mult: int) -> jnp.ndarray:
    pad = (-x.shape[0]) % mult
    if pad:
        x = jnp.concatenate([x, jnp.ones((pad, x.shape[1]), x.dtype)], axis=0)
    return x


@functools.partial(
    jax.jit, static_argnames=("embed_dim", "tile_n", "tile_m", "interpret")
)
def fused_position_bias(
    rois: jnp.ndarray,
    ref_rois: jnp.ndarray,
    wg_kernel: jnp.ndarray,  # (embed_dim, groups)
    wg_bias: jnp.ndarray,  # (groups,)
    embed_dim: int = 64,
    tile_n: int = 32,
    tile_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, 4) x (M, 4) → (groups, N, M) fused log position bias."""
    n, m = rois.shape[0], ref_rois.shape[0]
    g = wg_kernel.shape[1]
    rois_p = _pad_rows(rois.astype(jnp.float32), tile_n)
    refs_p = _pad_rows(ref_rois.astype(jnp.float32), tile_m)
    np_, mp_ = rois_p.shape[0], refs_p.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, embed_dim=embed_dim),
        out_shape=jax.ShapeDtypeStruct((g, np_, mp_), jnp.float32),
        grid=(np_ // tile_n, mp_ // tile_m),
        in_specs=[
            pl.BlockSpec((tile_n, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (g, tile_n, tile_m), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        rois_p, refs_p,
        wg_kernel.astype(jnp.float32),
        wg_bias.astype(jnp.float32)[None, :],
    )
    return out[:, :n, :m]


def reference_position_bias(
    rois: jnp.ndarray,
    ref_rois: jnp.ndarray,
    wg_kernel: jnp.ndarray,
    wg_bias: jnp.ndarray,
    embed_dim: int = 64,
    sin_dtype: jnp.dtype = jnp.bfloat16,
) -> jnp.ndarray:
    """Pure-XLA twin (the production path; einsum formulation).

    Sinusoids are cast to `sin_dtype` before the contraction. bf16 (the
    inference default) is safe FORWARD-only: they are bounded in [-1, 1] so
    bf16's 8-bit mantissa costs ~4e-3 absolute on the bias weight, well below
    the softmax's sensitivity, and it halves the dominant HBM traffic. It is
    NOT safe under `jax.grad`: pw = relu(emb@Wg) clusters at the relu
    boundary at init scale (Wg ~ N(0, 0.01)), and a 4e-3 perturbation both
    flips relu' and shifts the 1/(pw+1e-6) factor of d log-bias/dWg, so Wg
    gradients come out ~3x off the reference's fp32 autograd (measured in
    the MEGA train-parity harness). Training paths must pass
    sin_dtype=float32 (RelationAttention(precise_bias=True))."""
    num_freq = embed_dim // 8
    g = wg_kernel.shape[1]
    dx, dy, dw, dh = _log_ratios(
        rois.astype(jnp.float32), ref_rois.astype(jnp.float32)
    )
    pos = jnp.stack([dx, dy, dw, dh], axis=2)  # (N, M, 4)
    div = pos[..., None] * jnp.asarray(
        bias_freq_scales(num_freq), jnp.float32
    )  # (N, M, 4, F)
    w4 = wg_kernel.astype(jnp.float32).reshape(4, 2, num_freq, g)
    pw = jnp.einsum(
        "nmcf,cfg->nmg",
        jnp.sin(div).astype(sin_dtype),
        w4[:, 0].astype(sin_dtype),
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "nmcf,cfg->nmg",
        jnp.cos(div).astype(sin_dtype),
        w4[:, 1].astype(sin_dtype),
        preferred_element_type=jnp.float32,
    )
    pw = jnp.maximum(pw + wg_bias.astype(jnp.float32), 0.0)
    return jnp.log(pw + 1e-6).transpose(2, 0, 1)
