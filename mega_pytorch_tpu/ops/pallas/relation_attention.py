"""Flash-style fused relation attention (Pallas TPU kernel).

The relation-attention hot path (roi_box_feature_extractors.py:567-646 in the
reference; RelationAttention here) computes, per stage,

    bias = log(relu(Wg · sinusoid(position_matrix(rois, ref_rois))) + 1e-6)
    aff  = (QK^T + u·K^T) / sqrt(d) + bias                   # (g, N, M) f32
    soft = softmax_m(mask(aff))
    out  = soft · V                                          # V pre-projected

At MEGA streaming shapes (N=675, M≈3750, g=16) the (g, N, M) logits and bias
tensors are ~160 MB each; materializing them and running the softmax over
HBM dominates the XLA pipeline. This kernel streams K/V tiles through VMEM
with an online softmax (running max / running sum — the flash-attention
recurrence) and, in the PRODUCTION "compute" mode, evaluates the position
weight per tile (geometry → polynomial sinusoids → one MXU Wg contraction
per row-chunk; see _tile_bias_weight / _sincos) and multiplies it into the
exponentials (softmax(qk + log pw) == pw·e^{qk−m}/Σ — same math, no log),
so neither the logits nor the bias ever exist in HBM. Measured on v5e at
stage-0 shapes: 2.15 ms vs 6.74 ms for the XLA-bias + input-bias-flash pair
(additive log form; the multiplicative form is faster still — see MFU.md).
The "input" mode (bias as a precomputed log-space operand) remains for the
no-position global-attention path and as the comparison baseline.

Batching: the streaming engines vmap the whole per-frame step over video
lanes, so the kernel supports an explicit leading lane dimension (grid =
(lanes, n_tiles, m_tiles)) and registers a jax.custom_batching rule that
routes a single level of vmap into it. (Nested vmap falls back is NOT
supported — the engine never nests.)

Numerics: QK/AV matmuls run on the MXU in bf16 inputs with f32 accumulation —
identical to the XLA einsum path in attention.py, which sets
preferred_element_type=f32 over bf16 operands. The softmax recurrence is f32.

The backward pass recomputes through the plain einsum path (materializing the
logits is fine at training shapes, which are ~10x smaller): see
`fused_relation_attention`'s custom_vjp.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
# query-row chunk for the in-kernel position-bias slab (see chunk_bias)
_BIAS_CHUNK = 32


def _geometry(r):
    w = r[:, 2] - r[:, 0] + 1.0
    h = r[:, 3] - r[:, 1] + 1.0
    cx = 0.5 * (r[:, 0] + r[:, 2])
    cy = 0.5 * (r[:, 1] + r[:, 3])
    return jnp.maximum(w, 1e-3), jnp.maximum(h, 1e-3), cx, cy


def _sincos(x):
    """Fast sin/cos pair: range-reduce to [-pi, pi] + odd/even minimax polys.

    Absolute error < 2e-4 over the bias args' range (|x| < ~800 rad; the f32
    reduction residual dominates at the top of the range) — far inside the
    bf16-grade tolerance the bias path already accepts (sinusoids feed a
    contraction whose XLA twin quantizes them to bf16, ~4e-3). Replaces two
    transcendental calls with ~12 VPU FMAs."""
    two_pi = 6.283185307179586
    k = jnp.round(x * (1.0 / two_pi))
    r = x - k * two_pi  # [-pi, pi]
    r2 = r * r
    s = r * (
        0.99998459345
        + r2 * (-0.16663259377
                + r2 * (0.00831238828
                        + r2 * (-1.9316269889e-4 + r2 * 2.1732569601e-6)))
    )
    c = (
        0.99999944371
        + r2 * (-0.49999558229
                + r2 * (0.04166103352
                        + r2 * (-1.3862749961e-3
                                + r2 * (2.4253229889e-5
                                        - r2 * 2.2194129825e-7))))
    )
    return s, c


def _tile_bias_weight(rois, refs, wt_ref, wb_ref, groups, num_freq):
    """(TN, 4) x (TM, 4) boxes → (g, TN, TM) position weight pw, in-register.

    Returns pw = relu(Wg · sinusoid(position_matrix)) + 1e-6 — NOT its log:
    softmax(qk + log pw) == (pw · exp(qk − m)) / Σ(pw · exp(qk − m)), so the
    kernel multiplies pw into the exponentials instead of adding log pw to
    the logits. Exact same math, and it deletes g·N·M log evaluations per
    call (~0.5 G transcendentals at MEGA stage-0 x12 lanes — the single
    largest VPU term after the sinusoids).

    wt_ref: (g, E) VMEM ref — Wg TRANSPOSED, columns ordered (channel,
    sin|cos, freq) to match the reference's concat layout; wb_ref its (g, 1)
    VMEM bias. Each chunk's sinusoid slab (E, rows*TM) is built in one
    vectorized pass and contracted against Wg^T in ONE MXU dot whose free
    dimension is rows*TM (8K lanes) — the per-query-row loop this replaces
    issued TN tiny (g x E) x (E, TM) dots and TM-wide VPU sincos batches,
    and measured ~3x slower at MEGA detect shapes."""
    w, h, cx, cy = _geometry(rois)
    w_r, h_r, cx_r, cy_r = _geometry(refs)
    tn, tm = rois.shape[0], refs.shape[0]
    # dw/dh are separable: log(w/w_r) = log w − log w_r needs TN+TM logs,
    # not TN·TM (dx/dy stay pairwise — the |Δc|/w + 1e-3 guard isn't
    # separable)
    lw, lh = jnp.log(w), jnp.log(h)
    lw_r, lh_r = jnp.log(w_r), jnp.log(h_r)

    log1000 = float(np.log(1000.0))
    scales = [
        100.0 * math.exp(-f * (1.0 / num_freq) * log1000)
        for f in range(num_freq)
    ]
    wt = wt_ref[:]  # (g, E)
    b = wb_ref[:]  # (g, 1)

    def chunk_pw(lo):
        """pw for query rows [lo, lo+rows): bounds the sinusoid slab's VMEM
        footprint (the (E, rows*TM) slab at rows=32 is ~2 MB; computing it at
        the full TN would trade the larger tile's K/V-streaming win for VMEM
        spills — measured: TN=64 single-slab was NET SLOWER than TN=32)."""
        rows = min(tn, _BIAS_CHUNK)
        sl = lambda t: t[lo : lo + rows]  # noqa: E731  (static: lo is Python)
        dx = jnp.log(
            jnp.abs((sl(cx)[:, None] - cx_r[None, :]) / sl(w)[:, None]) + 1e-3
        )
        dy = jnp.log(
            jnp.abs((sl(cy)[:, None] - cy_r[None, :]) / sl(h)[:, None]) + 1e-3
        )
        dw = sl(lw)[:, None] - lw_r[None, :]
        dh = sl(lh)[:, None] - lh_r[None, :]
        # sinusoid slab over the chunk, rows ordered (channel, sin|cos,
        # freq) to match the reference's concat layout
        slabs = []
        for pr in (dx, dy, dw, dh):
            flat = pr.reshape(1, rows * tm)
            args = jnp.concatenate([flat * s for s in scales], axis=0)
            sin_a, cos_a = _sincos(args)
            slabs.append(sin_a)
            slabs.append(cos_a)
        S = jnp.concatenate(slabs, axis=0)  # (E, rows*TM)
        pw = jax.lax.dot_general(
            wt, S, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (g, rows*TM)
        pw = jnp.maximum(pw + b, 0.0)
        return (pw + 1e-6).reshape(groups, rows, tm)

    if tn <= _BIAS_CHUNK:
        return chunk_pw(0)
    return jnp.concatenate(
        [chunk_pw(lo) for lo in range(0, tn, _BIAS_CHUNK)], axis=1
    )


def _kernel(
    *refs,
    groups: int,
    scale: float,
    bias_mode: str,  # "compute" | "input" | "none"
    num_freq: int,
):
    if bias_mode == "compute":
        (q_ref, k_ref, v_ref, uk_ref, rois_ref, rref_ref, w4_ref, wb_ref,
         valid_ref, out_ref, acc_ref, m_ref, l_ref) = refs
    elif bias_mode == "input":
        (q_ref, k_ref, v_ref, uk_ref, bias_ref, valid_ref,
         out_ref, acc_ref, m_ref, l_ref) = refs
    else:
        (q_ref, k_ref, v_ref, uk_ref, valid_ref,
         out_ref, acc_ref, m_ref, l_ref) = refs

    # grid = (lanes, n_tiles, m_tiles): m fastest, so the flash recurrence
    # runs to completion over M for each (lane, N-tile)
    j = pl.program_id(2)
    nm = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]  # (g, TN, d)
    k = k_ref[0]  # (g, TM, d)
    uk = uk_ref[0]  # (g, TM)
    valid = valid_ref[0, 0, :]  # (TM,)

    def one_group(g):
        return jax.lax.dot_general(
            q[g], k[g],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TN, TM)

    aff = jnp.stack([one_group(g) for g in range(groups)])
    aff = (aff + uk[:, None, :]) * scale
    pw = None
    if bias_mode == "compute":
        # multiplicative form: softmax(qk + log pw) = pw·exp(qk − m) / Σ(·).
        # m is then a running max of the qk logits alone — any consistent
        # stabilizer keeps the flash recurrence exact, and exp(qk − m) ≤ 1
        # times a bounded pw cannot overflow. This deletes the (g, TN, TM)
        # log evaluation per tile (the largest VPU term after the sinusoids).
        pw = _tile_bias_weight(
            rois_ref[0], rref_ref[0], w4_ref, wb_ref, groups, num_freq
        )
    elif bias_mode == "input":
        aff = aff + bias_ref[0]
    aff = jnp.where(valid[None, None, :] > 0.5, aff, NEG_INF)

    tile_max = jnp.max(aff, axis=2)  # (g, TN)
    prev_max = m_ref[:, :, 0]
    new_max = jnp.maximum(prev_max, tile_max)
    alpha = jnp.exp(prev_max - new_max)  # (g, TN)
    p = jnp.exp(aff - new_max[:, :, None])  # (g, TN, TM)
    if pw is not None:
        p = p * pw
    # invalid slots: exp(NEG_INF - max) underflows to 0 unless the whole row
    # is invalid so far (new_max == NEG_INF) — force those to exact 0
    p = jnp.where(valid[None, None, :] > 0.5, p, 0.0)

    l_new = l_ref[:, :, 0] * alpha + jnp.sum(p, axis=2)

    pv = jnp.stack(
        [
            jax.lax.dot_general(
                p[g].astype(jnp.bfloat16), v_ref[0, g],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for g in range(groups)
        ]
    )  # (g, TN, d)
    acc_ref[:] = acc_ref[:] * alpha[:, :, None] + pv
    m_ref[:] = jnp.broadcast_to(new_max[:, :, None], m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new[:, :, None], l_ref.shape)

    @pl.when(j == nm - 1)
    def _finish():
        # rows with zero valid refs get 0 output (empty attention contributes
        # nothing to the residual), matching attention.py's `soft = 0` branch
        denom = l_ref[:, :, 0]
        safe = jnp.where(denom > 0.0, denom, 1.0)
        out_ref[0] = acc_ref[:] / safe[:, :, None] * (denom > 0.0)[:, :, None]


def _pad_axis(x: jnp.ndarray, axis: int, mult: int, value=0.0) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if not pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("embed_dim", "tile_n", "tile_m", "interpret")
)
def _fused_fwd_batched(
    q: jnp.ndarray,  # (B, g, N, d)
    k: jnp.ndarray,  # (B, g, M, d)
    v: jnp.ndarray,  # (B, g, M, d)
    uk: jnp.ndarray,  # (B, g, M) f32
    pos: tuple | jnp.ndarray | None,
    valid: jnp.ndarray,  # (B, M) bool
    embed_dim: int = 64,
    tile_n: int = 64,
    tile_m: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Explicit-lane-batch flash attention; grid = (B, n_tiles, m_tiles).

    pos: (rois (B, N, 4), ref_rois (B, M, 4), wg_kernel (E, g), wg_bias (g,))
    for in-kernel bias; a precomputed (B, g, N, M) bias; or None."""
    b, g, n, d = q.shape
    scale = 1.0 / math.sqrt(d)

    q_p = _pad_axis(q.astype(jnp.bfloat16), 2, tile_n)
    k_p = _pad_axis(k.astype(jnp.bfloat16), 2, tile_m)
    v_p = _pad_axis(v.astype(jnp.bfloat16), 2, tile_m)
    uk_p = _pad_axis(uk.astype(jnp.float32), 2, tile_m)
    valid_p = _pad_axis(valid.astype(jnp.float32)[:, None, :], 2, tile_m)
    np_, mp_ = q_p.shape[2], k_p.shape[2]
    num_freq = embed_dim // 8

    if isinstance(pos, tuple):
        bias_mode = "compute"
        rois, ref_rois, wg_kernel, wg_bias = pos
        # pad box rows with unit boxes so the padded tiles' geometry is finite
        rois_p = _pad_axis(rois.astype(jnp.float32), 1, tile_n, 1.0)
        refs_p = _pad_axis(ref_rois.astype(jnp.float32), 1, tile_m, 1.0)
        # Wg transposed (g, E) in VMEM for the per-row MXU contraction;
        # columns keep the reference's (channel, sin|cos, freq) row order
        wt = wg_kernel.astype(jnp.float32).T
        wb = wg_bias.astype(jnp.float32)[:, None]  # (g, 1): broadcast-ready
        extra_in = [rois_p, refs_p, wt, wb]
        extra_specs = [
            pl.BlockSpec(
                (1, tile_n, 4), lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_m, 4), lambda b, i, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g, embed_dim), lambda b, i, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (g, 1), lambda b, i, j: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
    elif pos is not None:
        bias_mode = "input"
        bias_p = _pad_axis(
            _pad_axis(pos.astype(jnp.float32), 2, tile_n), 3, tile_m
        )
        extra_in = [bias_p]
        extra_specs = [
            pl.BlockSpec(
                (1, g, tile_n, tile_m), lambda b, i, j: (b, 0, i, j),
                memory_space=pltpu.VMEM,
            )
        ]
    else:
        bias_mode = "none"
        extra_in, extra_specs = [], []

    grid = (b, np_ // tile_n, mp_ // tile_m)
    out = pl.pallas_call(
        functools.partial(
            _kernel, groups=g, scale=scale, bias_mode=bias_mode,
            num_freq=num_freq,
        ),
        out_shape=jax.ShapeDtypeStruct((b, g, np_, d), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, g, tile_n, d), lambda b, i, j: (b, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, g, tile_m, d), lambda b, i, j: (b, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, g, tile_m, d), lambda b, i, j: (b, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, g, tile_m), lambda b, i, j: (b, 0, j),
                memory_space=pltpu.VMEM,
            ),
            *extra_specs,
            pl.BlockSpec(
                (1, 1, tile_m), lambda b, i, j: (b, 0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, g, tile_n, d), lambda b, i, j: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((g, tile_n, d), jnp.float32),
            pltpu.VMEM((g, tile_n, 128), jnp.float32),
            pltpu.VMEM((g, tile_n, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q_p, k_p, v_p, uk_p, *extra_in, valid_p)
    return out[:, :, :n, :]


def _fused_fwd(q, k, v, uk, bias, valid, embed_dim=64, tile_n=64,
               tile_m=256, interpret=False):
    """Unbatched (g, N, d) entry point (adds/strips a lane dim of 1)."""
    pos = bias
    if isinstance(bias, tuple):
        rois, refs, wk, wb = bias
        pos = (rois[None], refs[None], wk, wb)
    elif bias is not None:
        pos = bias[None]
    out = _fused_fwd_batched(
        q[None], k[None], v[None], uk[None], pos, valid[None],
        embed_dim=embed_dim, tile_n=tile_n, tile_m=tile_m, interpret=interpret,
    )
    return out[0]


def reference_relation_attention(q, k, v, uk, bias, valid):
    """Plain-XLA twin with identical semantics (and the training path)."""
    g, n, d = q.shape
    aff = jnp.einsum(
        "gnd,gmd->gnm",
        q.astype(jnp.bfloat16),
        k.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    aff = (aff + uk[:, None, :]) * (1.0 / math.sqrt(d))
    if bias is not None:
        aff = aff + bias
    aff = jnp.where(valid[None, None, :], aff, NEG_INF)
    soft = jax.nn.softmax(aff, axis=2)
    soft = jnp.where(valid.any(), soft, 0.0)
    return jnp.einsum(
        "gnm,gmd->gnd",
        soft.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


# -- vmap routing --------------------------------------------------------------
# The streaming engines vmap the per-frame step over video lanes; route that
# single level of vmap into the explicit-lane grid instead of relying on
# pallas_call's generic batching (which rejects mid-array batch dims).

@functools.lru_cache(maxsize=None)
def _make_flash(interpret: bool = False):
    @jax.custom_batching.custom_vmap
    def flash(q, k, v, uk, bias, valid):
        return _fused_fwd(q, k, v, uk, bias, valid, interpret=interpret)

    @flash.def_vmap
    def _rule(axis_size, in_batched, q, k, v, uk, bias, valid):
        qb, kb, vb, ukb, biasb, validb = in_batched

        def bc(x, batched):
            if x is None or batched:
                return x
            return jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        out = _fused_fwd_batched(
            bc(q, qb), bc(k, kb), bc(v, vb), bc(uk, ukb),
            bc(bias, biasb) if bias is not None else None,
            bc(valid, validb),
            interpret=interpret,
        )
        return out, True

    return flash


@functools.lru_cache(maxsize=None)
def _make_flash_pos(embed_dim: int = 64, interpret: bool = False):
    """In-kernel-bias twin of _make_flash (Wg weights shared across lanes)."""

    @jax.custom_batching.custom_vmap
    def flash(q, k, v, uk, rois, refs, wg_kernel, wg_bias, valid):
        return _fused_fwd(
            q, k, v, uk, (rois, refs, wg_kernel, wg_bias), valid,
            embed_dim=embed_dim, interpret=interpret,
        )

    @flash.def_vmap
    def _rule(axis_size, in_batched, q, k, v, uk, rois, refs, wgk, wgb, valid):
        qb, kb, vb, ukb, rb, rfb, wkb, wbb, vldb = in_batched
        assert not wkb and not wbb, "per-lane Wg weights not supported"

        def bc(x, batched):
            if batched:
                return x
            return jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        out = _fused_fwd_batched(
            bc(q, qb), bc(k, kb), bc(v, vb), bc(uk, ukb),
            (bc(rois, rb), bc(refs, rfb), wgk, wgb),
            bc(valid, vldb),
            embed_dim=embed_dim, interpret=interpret,
        )
        return out, True

    return flash


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_relation_attention(q, k, v, uk, bias, valid, interpret=False):
    """(g, N, d) attention output; logits never materialize in HBM.

    bias: a precomputed (g, N, M) log bias, or None (global attention)."""
    return _make_flash(interpret)(q, k, v, uk, bias, valid)


def _vjp_fwd(q, k, v, uk, bias, valid, interpret=False):
    return fused_relation_attention(q, k, v, uk, bias, valid, interpret), (
        q, k, v, uk, bias, valid,
    )


def _vjp_bwd(interpret, res, g_out):
    q, k, v, uk, bias, valid = res
    # training shapes are ~10x smaller: recompute through the einsum path
    has_bias = bias is not None

    def f(q, k, v, uk, bias):
        return reference_relation_attention(
            q, k, v, uk, bias if has_bias else None, valid
        )

    _, vjp = jax.vjp(f, q, k, v, uk, bias if has_bias else jnp.zeros(()))
    dq, dk, dv, duk, dbias = vjp(g_out)
    return dq, dk, dv, duk, dbias if has_bias else None, None


fused_relation_attention.defvjp(_vjp_fwd, _vjp_bwd)


# -- bias fused in-kernel (production for large ref sets on TPU) --------------
# Per-row MXU bias evaluation; measured 4.19 ms vs 6.74 ms for the
# XLA-bias + input-bias-flash pair at MEGA stage-0 shapes (675 x 3750) on
# v5e. Neither the (g, N, M) logits nor the bias ever exist in HBM.

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_relation_attention_pos(
    q, k, v, uk, rois, ref_rois_wg, valid, embed_dim=64, interpret=False
):
    """Fused attention with IN-KERNEL position bias.

    ref_rois_wg = (ref_rois (M, 4), wg_kernel (E, g), wg_bias (g,))."""
    ref_rois, wg_kernel, wg_bias = ref_rois_wg
    return _make_flash_pos(embed_dim, interpret)(
        q, k, v, uk, rois, ref_rois, wg_kernel, wg_bias, valid
    )


def _pos_vjp_fwd(q, k, v, uk, rois, ref_rois_wg, valid, embed_dim=64,
                 interpret=False):
    out = fused_relation_attention_pos(
        q, k, v, uk, rois, ref_rois_wg, valid, embed_dim, interpret
    )
    return out, (q, k, v, uk, rois, ref_rois_wg, valid)


def _pos_vjp_bwd(embed_dim, interpret, res, g_out):
    from .position_bias import reference_position_bias

    q, k, v, uk, rois, ref_rois_wg, valid = res
    ref_rois, wg_kernel, wg_bias = ref_rois_wg

    def f(q, k, v, uk, rois, ref_rois, wg_kernel, wg_bias):
        bias = reference_position_bias(rois, ref_rois, wg_kernel, wg_bias, embed_dim)
        return reference_relation_attention(q, k, v, uk, bias, valid)

    _, vjp = jax.vjp(f, q, k, v, uk, rois, ref_rois, wg_kernel, wg_bias)
    dq, dk, dv, duk, drois, drefs, dwk, dwb = vjp(g_out)
    return dq, dk, dv, duk, drois, (drefs, dwk, dwb), None


fused_relation_attention_pos.defvjp(_pos_vjp_fwd, _pos_vjp_bwd)
