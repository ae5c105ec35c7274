"""Fused stem epilogue: frozen-BN affine + relu + packed 3x3/2 maxpool.

Consumes the s2d(4) stem conv's output (N, T, U, 4*O) — phase blocks
(a'*2 + b')*O holding stem-conv output position (2t+a', 2u+b') — and emits
the pooled C1 input (N, T, U, O) in ONE pass. The XLA formulations of this
epilogue all cost ~0.5 ms/frame at the MEGA streaming shapes (measured:
6-D shifted-max chain, 128-aligned channel slices, depth-to-space +
reduce_window — each pays either an extra full-tensor relayout or extra
elementwise passes over the (24, 152, 256, 256) activation). The bandwidth
floor is one read + one 1/4-size write ≈ 0.06 ms/frame; this kernel runs at
that floor.

Pool algebra (exact 3x3 stride-2 pad-1 maxpool on the virtual (2T, 2U)
grid): output cell (t, u) covers rows 2t-1..2t+1 = phases (t-1, a'=1),
(t, a'=0), (t, a'=1) and likewise for columns, so

    r[t]  = max(z[t, a'=0], z[t, a'=1], z[t-1, a'=1])     (rows)
    out[u] = max(r[u, b'=0], r[u, b'=1], r[u-1, b'=1])     (cols)

with -inf beyond the borders (the canonical pad-1 maxpool semantics; the
top/right pads are never selected because the windows stay in range).

The row halo (z[t-1] for a block's first row) comes from a second ref on
the SAME input with a one-row block whose index map points at the previous
block's last row (clamped at 0 and masked by `i > 0`).

Exactness vs the canonical 7x7/2-conv + BN + relu + reduce_window stem is
locked in tests/test_backbone.py::test_s2d_stem_exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -3.0e38  # below any bf16/f32 activation; identity for max


def _kernel(y_ref, halo_ref, w_ref, b_ref, out_ref, *, out_ch: int,
            tile_h: int, frame_rows: int):
    i = pl.program_id(1)
    o = out_ch
    # frame-first blocks take NO halo (pad-1 maxpool top-border semantics).
    # Unfolded layout: frame_rows == T, true only at i == 0. Folded layout
    # (frames stacked along H at stride frame_rows, see stem_pool_folded):
    # true whenever the block starts a frame.
    use_halo = (i * tile_h) % frame_rows != 0

    def affine(x, lo, hi):
        # w/b stay 2-D (1, width): 1-D slices lower to >2-D gathers on TPU
        ws = w_ref[:, lo:hi][None]  # (1, 1, width) affine scale (BN folded)
        bs = b_ref[:, lo:hi][None]
        return jnp.maximum(x.astype(jnp.float32) * ws + bs, 0.0)

    # a'=0 / a'=1 phase halves, computed from separate input slices (the
    # shifted-concat form made Mosaic reject the layout offsets)
    top = affine(y_ref[0][:, :, : 2 * o], 0, 2 * o)  # (TH, U, 2O)
    bot = affine(y_ref[0][:, :, 2 * o :], 2 * o, 4 * o)
    # previous row's a'=1 half: the halo ref's single row (masked at i == 0)
    hz = affine(halo_ref[0][:, :, 2 * o :], 2 * o, 4 * o)  # (1, U, 2O)

    th, uu, _ = top.shape
    # pltpu.roll only lowers in 2D: flatten, roll along the leading axis,
    # unflatten. The wrapped-around rows land exactly in the positions the
    # border masks overwrite, so the circular shift is safe.
    prev = pltpu.roll(  # row t-1 (row 0 wraps: masked below)
        bot.reshape(th, uu * 2 * o), shift=1, axis=0
    ).reshape(th, uu, 2 * o)
    row0 = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 0) == 0
    prev = jnp.where(
        row0, jnp.where(use_halo, jnp.broadcast_to(hz, prev.shape), NEG), prev
    )
    r = jnp.maximum(jnp.maximum(top, bot), prev)  # (TH, U, 2O)

    r0 = r[:, :, :o]  # b' = 0
    r1 = r[:, :, o:]  # b' = 1
    prev_c = pltpu.roll(  # col u-1 (col 0 wraps: masked below)
        r1.reshape(th * uu, o), shift=1, axis=0
    ).reshape(th, uu, o)
    col0 = jax.lax.broadcasted_iota(jnp.int32, prev_c.shape, 1) == 0
    prev_c = jnp.where(col0, NEG, prev_c)
    out = jnp.maximum(jnp.maximum(r0, r1), prev_c)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_ch", "tile_h", "interpret", "frame_rows")
)
def stem_pool_packed(
    y: jnp.ndarray,  # (N, T, U, 4*O) stem conv output, packed phases
    scale: jnp.ndarray,  # (4*O,) frozen-BN scale, already phase-tiled
    shift: jnp.ndarray,  # (4*O,)
    out_ch: int = 64,
    tile_h: int = 19,
    interpret: bool = False,
    frame_rows: int = 0,  # folded form: frames stacked along T at this
    # stride (must be a multiple of tile_h); 0 = one frame per batch row
) -> jnp.ndarray:
    n, t, u, c4 = y.shape
    assert c4 == 4 * out_ch
    # pick the largest tile dividing T — and, in the folded form, the frame
    # stride too, so every frame's first row starts a block (the in-kernel
    # halo mask keys on block starts)
    div = frame_rows if frame_rows else t
    if t % tile_h or div % tile_h:
        tile_h = next(
            h for h in range(min(tile_h, t), 0, -1)
            if t % h == 0 and div % h == 0
        )
    grid = (n, t // tile_h)
    return pl.pallas_call(
        functools.partial(_kernel, out_ch=out_ch, tile_h=tile_h,
                          frame_rows=frame_rows if frame_rows else t),
        out_shape=jax.ShapeDtypeStruct((n, t, u, out_ch), y.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_h, u, c4), lambda n, i: (n, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            # one-row halo: the previous block's last row (clamped at i=0,
            # masked inside the kernel)
            pl.BlockSpec(
                (1, 1, u, c4),
                lambda n, i: (n, jnp.maximum(i * tile_h - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c4), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c4), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, u, out_ch), lambda n, i: (n, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(  # y passed twice: main blocks + the one-row halo view
        y, y, scale.astype(jnp.float32)[None], shift.astype(jnp.float32)[None]
    )
