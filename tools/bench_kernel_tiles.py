"""Microbench the flash relation-attention kernel across tile shapes.

Times _fused_fwd_batched on the chip at MEGA stage-0 shapes (B=12, G=16,
N=675, M=3750) for a grid of (tile_n, tile_m) and bias modes, to pick the
production tiling. The kernel re-streams K/V (and the bias T factors) once
per query tile, so larger tile_n trades VMEM for HBM traffic; the paired
MXU layout already packs rows 2*tile_n deep.

Usage: python tools/bench_kernel_tiles.py [--stage1] [--reps 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mega_pytorch_tpu.ops.pallas import relation_attention as ra


def make_args(b, g, n, m, d, e, rng):
    q = jnp.asarray(rng.standard_normal((b, g, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, g, m, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, g, m, d)), jnp.float32)
    uk = jnp.asarray(rng.standard_normal((b, g, m)), jnp.float32)
    rois = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 500, (b, n, 2)), rng.uniform(520, 990, (b, n, 2))],
            axis=-1,
        ),
        jnp.float32,
    )
    refs = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 500, (b, m, 2)), rng.uniform(520, 990, (b, m, 2))],
            axis=-1,
        ),
        jnp.float32,
    )
    wgk = jnp.asarray(rng.standard_normal((e, g)) * 0.1, jnp.float32)
    wgb = jnp.asarray(rng.standard_normal((g,)) * 0.1, jnp.float32)
    valid = jnp.ones((b, m), bool)
    return q, k, v, uk, rois, refs, wgk, wgb, valid


def bench(fn, reps):
    # force a real device round-trip per measurement: on the axon relay
    # platform block_until_ready can return before execution completes, so
    # reduce to a scalar and pull it to host
    force = jax.jit(lambda: jnp.sum(fn()))
    float(force())
    float(force())
    t0 = time.perf_counter()
    for _ in range(reps):
        s = force()
    float(s)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--m", type=int, default=3750)
    ap.add_argument("--n", type=int, default=675)
    ap.add_argument("--b", type=int, default=12)
    args = ap.parse_args()

    b, g, n, m, d, e = args.b, 16, args.n, args.m, 64, 64
    rng = np.random.default_rng(0)
    q, k, v, uk, rois, refs, wgk, wgb, valid = make_args(b, g, n, m, d, e, rng)

    base = None
    for tn, tm in [(64, 256), (64, 512), (128, 256), (128, 512)]:
        for mode in ("compute", "none"):
            pos = (rois, refs, wgk, wgb) if mode == "compute" else None
            fn = lambda: ra._fused_fwd_batched(  # noqa: E731
                q, k, v, uk, pos, valid, embed_dim=e, tile_n=tn, tile_m=tm
            )
            ms = None
            for attempt in range(2):  # remote compile server can 500 transiently
                try:
                    ms = bench(fn, args.reps)
                    break
                except Exception as exc:
                    err = f"{type(exc).__name__}: {str(exc)[:120]}"
                    time.sleep(2)
            if ms is None:
                print(f"tn={tn:4d} tm={tm:5d} {mode:8s}: FAIL {err}")
                continue
            if mode == "compute" and base is None:
                base = ms
            print(f"tn={tn:4d} tm={tm:5d} {mode:8s}: {ms:7.3f} ms/call "
                  f"({ms / b:6.4f} ms/frame)")

    # numerics cross-check for the best-looking variant vs the default tiling
    ref = ra._fused_fwd_batched(q, k, v, uk, (rois, refs, wgk, wgb), valid,
                                embed_dim=e, tile_n=64, tile_m=256)
    for tn, tm in [(128, 256), (128, 512)]:
        try:
            got = ra._fused_fwd_batched(q, k, v, uk, (rois, refs, wgk, wgb),
                                        valid, embed_dim=e, tile_n=tn, tile_m=tm)
            diff = float(jnp.max(jnp.abs(got - ref)))
            print(f"numerics tn={tn} tm={tm} vs (64,256): max abs diff {diff:.3e}")
        except Exception as exc:
            print(f"numerics tn={tn} tm={tm}: FAIL {type(exc).__name__}")


if __name__ == "__main__":
    main()
