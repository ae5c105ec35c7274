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
tile (Mosaic rejects the lane/sublane-mixing reshape a single flat MXU dot
would need, so the contraction runs per (channel, freq) via einsum).

The pure-XLA twin (`reference_position_bias`) has identical semantics and is
what the attention module currently uses everywhere — on this jax version
XLA fuses the sinusoid contraction well enough that the Pallas path has no
measured advantage; the kernel is kept (with parity tests) as the starting
point for a fully fused attention kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _geometry(r: jnp.ndarray):
    w = r[:, 2] - r[:, 0] + 1.0
    h = r[:, 3] - r[:, 1] + 1.0
    cx = 0.5 * (r[:, 0] + r[:, 2])
    cy = 0.5 * (r[:, 1] + r[:, 3])
    return jnp.maximum(w, 1e-3), jnp.maximum(h, 1e-3), cx, cy


def _tile_bias(rois, ref_rois, wg, bias, embed_dim: int):
    """(TN, 4) x (TM, 4) → (TN, TM, groups) log position bias."""
    tn, tm = rois.shape[0], ref_rois.shape[0]
    w, h, cx, cy = _geometry(rois)
    w_r, h_r, cx_r, cy_r = _geometry(ref_rois)

    dx = jnp.log(jnp.abs((cx[:, None] - cx_r[None, :]) / w[:, None]) + 1e-3)
    dy = jnp.log(jnp.abs((cy[:, None] - cy_r[None, :]) / h[:, None]) + 1e-3)
    dw = jnp.log(w[:, None] / w_r[None, :])
    dh = jnp.log(h[:, None] / h_r[None, :])
    pos = jnp.stack([dx, dy, dw, dh], axis=2)  # (TN, TM, 4)

    num_freq = embed_dim // 8
    # 1/dim_mat from an integer iota (Mosaic: no float iota, no captured
    # array constants): dim_mat = 1000 ** (8/embed_dim * f)
    f_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, num_freq), 3)
    inv_dim = jnp.exp(
        -f_iota.astype(jnp.float32) * (8.0 / embed_dim * float(np.log(1000.0)))
    )
    div = pos[..., None] * 100.0 * inv_dim  # (TN, TM, 4, F)
    g = wg.shape[1]
    # contract the 64 embedding features without flattening (Mosaic rejects
    # lane/sublane-mixing reshapes): wg rows are ordered (channel, sin|cos,
    # freq) to match the reference's concat layout. Sinusoids are cast to
    # bf16 before the contraction — they are bounded in [-1, 1] so bf16's
    # 8-bit mantissa costs ~4e-3 absolute on the bias weight, well below the
    # softmax's sensitivity, and it halves the dominant HBM traffic.
    w4 = wg.reshape(4, 2, num_freq, g)
    pw = jnp.einsum(
        "nmcf,cfg->nmg",
        jnp.sin(div).astype(jnp.bfloat16),
        w4[:, 0].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ) + jnp.einsum(
        "nmcf,cfg->nmg",
        jnp.cos(div).astype(jnp.bfloat16),
        w4[:, 1].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    pw = jnp.maximum(pw + bias, 0.0)  # (TN, TM, g)
    return jnp.log(pw + 1e-6)


def _kernel(rois_ref, refs_ref, wg_ref, b_ref, out_ref, *, embed_dim: int):
    out_ref[:] = _tile_bias(
        rois_ref[:], refs_ref[:], wg_ref[:], b_ref[:], embed_dim
    )


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
        out_shape=jax.ShapeDtypeStruct((np_, mp_, g), jnp.float32),
        grid=(np_ // tile_n, mp_ // tile_m),
        in_specs=[
            pl.BlockSpec((tile_n, 4), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 4), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((embed_dim, g), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, tile_m, g), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(rois_p, refs_p, wg_kernel.astype(jnp.float32), wg_bias.astype(jnp.float32))
    # (N, M, g) → (g, N, M): one cheap XLA transpose of the small bias tensor
    return out[:n, :m].transpose(2, 0, 1)


def reference_position_bias(
    rois: jnp.ndarray,
    ref_rois: jnp.ndarray,
    wg_kernel: jnp.ndarray,
    wg_bias: jnp.ndarray,
    embed_dim: int = 64,
) -> jnp.ndarray:
    """Pure-XLA fallback with identical semantics (used on CPU)."""
    return _tile_bias(
        rois.astype(jnp.float32),
        ref_rois.astype(jnp.float32),
        wg_kernel.astype(jnp.float32),
        wg_bias.astype(jnp.float32),
        embed_dim,
    ).transpose(2, 0, 1)
