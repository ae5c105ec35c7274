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

# geometry clamp + sinusoid frequency ladder shared with the XLA twin and
# the standalone bias kernel — ONE definition, no forked conventions
# (ADVICE r4 #2)
from .position_bias import _geometry, bias_freq_scales

NEG_INF = -1e30
# query-row chunk for the in-kernel position-bias slab (see chunk_bias)
_BIAS_CHUNK = 32


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


def _wh_factors(rois, refs, wg_kernel, num_freq):
    """XLA-side separable factors for the dw/dh position-bias channels.

    Their pairwise angle is s_f·(log w_n − log w_r_m), so by angle addition
    the pairwise sinusoids are rank-2 combinations of per-row and per-column
    sinusoids; folding the Wg columns for those channels into the column
    factors turns their whole bias contribution into
        C(g, n, m) = Σ_j S[j, n] · T[g, j, m],   j = 1..4F,
    an MXU contraction per group inside the kernel. Computed HERE (outside
    Pallas) the sinusoids cost O(N+M) transcendentals ONCE per call — the
    in-kernel pairwise slab they replace cost O(N·M) per (n, m) tile, and was
    half the kernel's VPU work. Conventions (geometry clamp, log, _sincos
    polynomial, Wg column order channel-major/sin-then-cos/freq-minor) match
    _tile_bias_weight exactly; only dx/dy (whose |Δc|/w + 1e-3 guard is
    genuinely pairwise) stay in-kernel.

    rois: (B, N, 4); refs: (B, M, 4); wg_kernel: (E, g).
    Returns S (B, N, 4F) f32 and T (B, g, 4F, M) bf16 (the factors are
    bounded by |Wg| and feed a bf16-grade contraction — the XLA twin itself
    quantizes its sinusoids to bf16 at inference — so bf16 halves the
    dominant HBM term of the bias path: the T block is re-streamed once per
    query tile, ~86 MB/lane/call f32 at stage-0; ADVICE r4 #3).
    """
    F = num_freq
    scales = jnp.asarray(bias_freq_scales(F), jnp.float32)

    def geom_wh(r):
        w, h, _, _ = _geometry(r.reshape(-1, 4))
        return (
            jnp.log(w).reshape(r.shape[:-1]),
            jnp.log(h).reshape(r.shape[:-1]),
        )

    lw, lh = geom_wh(rois.astype(jnp.float32))  # (B, N)
    lw_r, lh_r = geom_wh(refs.astype(jnp.float32))  # (B, M)

    def fsin(base):  # (B, L) -> (B, F, L) sin/cos per frequency
        args = base[:, None, :] * scales[None, :, None]
        return _sincos(args)

    sinAw, cosAw = fsin(lw)
    sinAh, cosAh = fsin(lh)
    sinBw, cosBw = fsin(lw_r)
    sinBh, cosBh = fsin(lh_r)

    # (B, N, 4F): feature-minor so the kernel block's last dim is the
    # full feature axis (Pallas requires last-two block dims 8/128-
    # divisible or full)
    S = jnp.concatenate([sinAw, cosAw, sinAh, cosAh], axis=1).swapaxes(1, 2)

    wt = wg_kernel.astype(jnp.float32).T  # (g, E)

    def col_factor(c0, sinB, cosB):
        ws = wt[:, c0 : c0 + F]  # (g, F) sin-feature weights
        wc = wt[:, c0 + F : c0 + 2 * F]  # (g, F) cos-feature weights
        alpha = (
            ws[None, :, :, None] * cosB[:, None] + wc[None, :, :, None] * sinB[:, None]
        )  # (B, g, F, M)
        beta = (
            wc[None, :, :, None] * cosB[:, None] - ws[None, :, :, None] * sinB[:, None]
        )
        return alpha, beta

    aw, bw_ = col_factor(4 * F, sinBw, cosBw)  # dw channel (cols 4F..6F)
    ah, bh_ = col_factor(6 * F, sinBh, cosBh)  # dh channel (cols 6F..8F)
    T = jnp.concatenate([aw, bw_, ah, bh_], axis=2)  # (B, g, 4F, M)
    return S, T.astype(jnp.bfloat16)


def _tile_bias_weight(rois, refs, s_ref, sbd_ref, t_ref, wt_ref, wb_ref,
                      groups, num_freq):
    """(TN, 4) x (TM, 4) boxes → (g, TN, TM) position weight pw, in-register.

    Returns pw = relu(Wg · sinusoid(position_matrix)) + 1e-6 — NOT its log:
    softmax(qk + log pw) == (pw · exp(qk − m)) / Σ(pw · exp(qk − m)), so the
    kernel multiplies pw into the exponentials instead of adding log pw to
    the logits. Exact same math, and it deletes g·N·M log evaluations per
    call (~0.5 G transcendentals at MEGA stage-0 x12 lanes — the single
    largest VPU term after the sinusoids).

    Only the dx/dy channels (pairwise |Δc|/w + 1e-3 guard) are evaluated
    here as a pairwise sinusoid slab; the dw/dh channels arrive as the
    separable factors s_ref (TN, 4F) / t_ref (g, 4F, TM) from _wh_factors
    and contribute through quad-blocked MXU contractions: groups (4p..4p+3)
    share one (4TN, 16F) @ (16F, TM) dot with S block-diagonal over the
    contraction dim (sbd_ref scratch, built once per query tile at j == 0) —
    at F=8 that is a 256-row, 128-deep FULLY PACKED MXU pass, vs the
    per-group (64, 32) @ (32, TM) form's ~12% fill (the r4 form; measured
    17.4 -> 14.0 ms/call at stage-0 together with the bf16 factors). Falls
    back to per-group dots when g % 4 != 0 (sbd_ref is None).

    wt_ref: (g, E) VMEM ref — Wg TRANSPOSED, columns ordered (channel,
    sin|cos, freq) to match the reference's concat layout; wb_ref its (g, 1)
    VMEM bias. Each chunk's dx/dy slab (4F, rows*TM) is built in one
    vectorized pass and contracted against Wg^T's dx/dy columns in ONE MXU
    dot whose free dimension is rows*TM (8K lanes)."""
    w, h, cx, cy = _geometry(rois)
    # refs: only the centers matter for dx/dy (the w/h channels ride the
    # separable factors — ADVICE r4 #1: no dead w_r/h_r geometry)
    cx_r = 0.5 * (refs[:, 0] + refs[:, 2])
    cy_r = 0.5 * (refs[:, 1] + refs[:, 3])
    tn, tm = rois.shape[0], refs.shape[0]

    scales = bias_freq_scales(num_freq)
    wt = wt_ref[:]  # (g, E)
    b = wb_ref[:]  # (g, 1)
    F = num_freq

    # dw/dh contribution for the whole tile (see docstring)
    if sbd_ref is not None:
        nq = groups // 4
        tq = t_ref[:].reshape(nq, 4 * 4 * F, tm)  # free view: g-major rows
        sbd = sbd_ref[:]  # (4TN, 16F) bf16 block-diag
        c4 = [
            jax.lax.dot_general(
                sbd, tq[qi], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for qi in range(nq)
        ]  # each (4TN, TM): rows r of quad qi = group 4qi + r // TN
        c_wh = jnp.stack(c4).reshape(groups, tn, tm)
    else:
        s_wh = s_ref[:].astype(jnp.bfloat16)  # (TN, 4F)
        c_wh = jnp.stack(
            [
                jax.lax.dot_general(
                    s_wh, t_ref[gi], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                for gi in range(groups)
            ]
        )  # (g, TN, TM)

    def chunk_pw(lo):
        """pw for query rows [lo, lo+rows): bounds the sinusoid slab's VMEM
        footprint (larger single slabs measured NET SLOWER via VMEM
        spills)."""
        rows = min(tn, _BIAS_CHUNK)
        sl = lambda t: t[lo : lo + rows]  # noqa: E731  (static: lo is Python)
        dx = jnp.log(
            jnp.abs((sl(cx)[:, None] - cx_r[None, :]) / sl(w)[:, None]) + 1e-3
        )
        dy = jnp.log(
            jnp.abs((sl(cy)[:, None] - cy_r[None, :]) / sl(h)[:, None]) + 1e-3
        )
        # pairwise sinusoid slab for dx/dy only, rows ordered (channel,
        # sin|cos, freq) to match the reference's concat layout
        slabs = []
        for pr in (dx, dy):
            flat = pr.reshape(1, rows * tm)
            args = jnp.concatenate([flat * s for s in scales], axis=0)
            sin_a, cos_a = _sincos(args)
            slabs.append(sin_a)
            slabs.append(cos_a)
        S = jnp.concatenate(slabs, axis=0)  # (4F, rows*TM)
        pw = jax.lax.dot_general(
            wt[:, : 4 * F], S, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(groups, rows, tm)
        pw = jnp.maximum(pw + c_wh[:, lo : lo + rows] + b[:, :, None], 0.0)
        return pw + 1e-6

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
    paired: bool = False,
):
    sbd_ref = None
    if bias_mode == "compute":
        (q_ref, k_ref, v_ref, uk_ref, rois_ref, rref_ref, s_ref, t_ref,
         w4_ref, wb_ref, valid_ref, out_ref, acc_ref, m_ref, l_ref,
         *rest) = refs
        if groups % 4 == 0:
            (sbd_ref,) = rest
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
        if sbd_ref is not None:
            # block-diagonal S for the quad-blocked dw/dh contraction
            # (constant over j — the m-tile loop reuses it 15x at stage-0)
            tn = s_ref.shape[1]
            f4 = s_ref.shape[2]
            sbd_ref[:] = jnp.zeros_like(sbd_ref)
            s_bf = s_ref[0].astype(sbd_ref.dtype)
            for qi in range(4):
                sbd_ref[qi * tn:(qi + 1) * tn, qi * f4:(qi + 1) * f4] = s_bf

    uk = uk_ref[0]  # (g, TM)
    valid = valid_ref[0, 0, :]  # (TM,)

    if paired:
        # Group-paired MXU form (see _fused_fwd_batched): the QK dot for
        # groups (2p, 2p+1) runs as ONE (2TN, 2d)@(2d, TM) contraction with
        # q block-diagonal over the contraction dim — both the 128-row and
        # 128-contraction MXU dimensions are full, vs the per-group
        # (TN=64, d=64) dots' quarter fill. Half the padded MXU passes.
        qbd = q_ref[0]  # (P, 2TN, 2d) block-diag over contraction
        kc = k_ref[0]   # (P, 2d, TM) pair-stacked k^T
        npairs = groups // 2
        tn2 = qbd.shape[1]

        def one_pair(p):
            return jax.lax.dot_general(
                qbd[p], kc[p], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2TN, TM): rows 0:TN = group 2p, TN:2TN = group 2p+1

        aff2 = jnp.stack([one_pair(p) for p in range(npairs)])
        aff = aff2.reshape(groups, tn2 // 2, aff2.shape[2])
    else:
        q = q_ref[0]  # (g, TN, d)
        k = k_ref[0]  # (g, TM, d)

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
            rois_ref[0], rref_ref[0], s_ref[0], sbd_ref, t_ref[0], w4_ref,
            wb_ref, groups, num_freq,
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

    if paired:
        # PV with column-widened v: (2TN, TM)@(TM, 2d) computes the two
        # diagonal blocks we need plus two discarded cross blocks — same MXU
        # time as one full tile, vs two quarter-filled per-group dots. The
        # accumulator stays in paired layout; cross-block garbage accumulates
        # harmlessly and is dropped at _finish.
        npairs = groups // 2
        tn = p.shape[1]
        p2 = p.reshape(npairs, 2 * tn, p.shape[2]).astype(jnp.bfloat16)
        vw = v_ref[0]  # (P, TM, 2d) column-widened v

        def one_pv(pp):
            return jax.lax.dot_general(
                p2[pp], vw[pp], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2TN, 2d)

        pv = jnp.stack([one_pv(pp) for pp in range(npairs)])
        alpha_acc = alpha.reshape(npairs, 2 * tn)
    else:
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
        alpha_acc = alpha
    acc_ref[:] = acc_ref[:] * alpha_acc[:, :, None] + pv
    m_ref[:] = jnp.broadcast_to(new_max[:, :, None], m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new[:, :, None], l_ref.shape)

    @pl.when(j == nm - 1)
    def _finish():
        # rows with zero valid refs get 0 output (empty attention contributes
        # nothing to the residual), matching attention.py's `soft = 0` branch
        denom = l_ref[:, :, 0]
        safe = jnp.where(denom > 0.0, denom, 1.0)
        if paired:
            npairs = groups // 2
            tn = denom.shape[1]
            d = acc_ref.shape[2] // 2
            acc = acc_ref[:]  # (P, 2TN, 2d)
            top = acc[:, :tn, :d]  # group 2p
            bot = acc[:, tn:, d:]  # group 2p+1
            out = jnp.stack([top, bot], axis=1).reshape(groups, tn, d)
        else:
            out = acc_ref[:]
        out_ref[0] = out / safe[:, :, None] * (denom > 0.0)[:, :, None]


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

    # Group-paired MXU layouts (even g; see _kernel). With d=64 and tile_n=64
    # the per-group QK dot fills a quarter of the 128x128 MXU tile; pairing
    # groups (2p, 2p+1) into one block-diagonal (2TN, 2d)@(2d, TM) dot and one
    # column-widened (2TN, TM)@(TM, 2d) PV dot halves the padded MXU passes.
    # Measured at MEGA stage-0 shapes (B=12, N=675, M=3750): 8.3 -> 7.0
    # ms/call no-bias, exact (0.0 max-abs-diff) vs the per-group form.
    paired = g % 2 == 0
    if paired:
        npair = g // 2
        nt = np_ // tile_n
        qpair = q_p.reshape(b, npair, 2, np_, d)
        zblk = jnp.zeros_like(qpair[:, :, 0])
        qtop = jnp.concatenate([qpair[:, :, 0], zblk], axis=-1)
        qbot = jnp.concatenate([zblk, qpair[:, :, 1]], axis=-1)
        # per n-tile the rows must be [group-2p TN rows ; group-2p+1 TN rows]
        qbd = jnp.concatenate([qtop[:, :, None], qbot[:, :, None]], axis=2)
        qbd = qbd.reshape(b, npair, 2, nt, tile_n, 2 * d)
        qbd = qbd.transpose(0, 1, 3, 2, 4, 5).reshape(b, npair, 2 * np_, 2 * d)
        kc = k_p.reshape(b, npair, 2, mp_, d).transpose(0, 1, 2, 4, 3)
        kc = kc.reshape(b, npair, 2 * d, mp_)
        vw = v_p.reshape(b, npair, 2, mp_, d).transpose(0, 1, 3, 2, 4)
        vw = vw.reshape(b, npair, mp_, 2 * d)

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
        # separable dw/dh factors, evaluated once per call in XLA (see
        # _wh_factors); padded columns use the unit-box geometry (log 1 = 0)
        s_wh, t_wh = _wh_factors(rois_p, refs_p, wg_kernel, num_freq)
        extra_in = [rois_p, refs_p, s_wh, t_wh, wt, wb]
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
                (1, tile_n, 4 * num_freq), lambda b, i, j: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, g, 4 * num_freq, tile_m), lambda b, i, j: (b, 0, 0, j),
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

    if paired:
        qkv_in = [qbd, kc, vw]
        qkv_specs = [
            pl.BlockSpec(
                (1, npair, 2 * tile_n, 2 * d), lambda b, i, j: (b, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, npair, 2 * d, tile_m), lambda b, i, j: (b, 0, 0, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, npair, tile_m, 2 * d), lambda b, i, j: (b, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        acc_scratch = pltpu.VMEM((npair, 2 * tile_n, 2 * d), jnp.float32)
    else:
        qkv_in = [q_p, k_p, v_p]
        qkv_specs = [
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
        ]
        acc_scratch = pltpu.VMEM((g, tile_n, d), jnp.float32)

    grid = (b, np_ // tile_n, mp_ // tile_m)
    out = pl.pallas_call(
        functools.partial(
            _kernel, groups=g, scale=scale, bias_mode=bias_mode,
            num_freq=num_freq, paired=paired,
        ),
        out_shape=jax.ShapeDtypeStruct((b, g, np_, d), jnp.float32),
        grid=grid,
        in_specs=[
            *qkv_specs,
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
            acc_scratch,
            pltpu.VMEM((g, tile_n, 128), jnp.float32),
            pltpu.VMEM((g, tile_n, 128), jnp.float32),
        ] + (
            # block-diag S for the quad-blocked dw/dh bias contraction
            [pltpu.VMEM((4 * tile_n, 4 * 4 * num_freq), jnp.bfloat16)]
            if bias_mode == "compute" and g % 4 == 0
            else []
        ),
        interpret=interpret,
    )(*qkv_in, uk_p, *extra_in, valid_p)
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
