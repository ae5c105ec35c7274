"""Per-method lockstep streaming throughput on the current chip.

VERDICT r3 next #5: bench.py measures only the MEGA flagship; the other three
streaming methods run through the same lockstep engine but had no recorded
fps, so regressions in their lane protocols were invisible. This script times
each method's steady-state per-frame device graph — the SAME jitted step the
lockstep eval engine (engine/batched_inference.py) runs per frame — at the
VID eval canvas (608x1024), R-101, shipped preset hyperparameters, L vmapped
video lanes, and prints ONE JSON line per method:

    {"method", "value" (frames/sec/chip), "unit", "lanes", "ms_per_frame"}

Measurement protocol matches bench.py: ITERS steps chained inside one jitted
lax.scan, synchronized by a single scalar fetch (block_until_ready is
unreliable through the axon relay), frames perturbed per iteration so no
backbone pass is loop-invariant-hoistable. Frames enter as uint8 canvases
exactly as the engine feeds them (s2d(4)-packed for mega/rdn, raw 3-channel
for fgfa/dff whose flownet consumes full-resolution images).

DFF alternates two step graphs (key every KEY_FRAME_INTERVAL=10 frames,
flownet-only otherwise, generalized_rcnn_dff.py:96-138); its line reports the
blended fps (interval frames / (t_key + (interval-1) * t_nonkey)) plus both
phase times.

Usage (on the TPU host):
    python tools/bench_methods.py [--lanes 4] [--methods mega,rdn,fgfa,dff]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

CANVAS_H, CANVAS_W = 608, 1024
ITERS = 16


def _perturb_u8(frames: jnp.ndarray, score: jnp.ndarray) -> jnp.ndarray:
    """Data-dependent +0/+1 on the uint8 frames: defeats loop-invariant
    hoisting of the backbone passes out of the chained scan."""
    bump = (score.astype(jnp.int32) & 1).astype(jnp.uint8)
    return frames + bump


def _time_scan(fn, params, state) -> float:
    """bench.py protocol: jit a scan of ITERS steps, sync by scalar fetch."""

    @jax.jit
    def chained(params, state):
        def body(carry_state, _):
            new_state, score = fn(params, carry_state)
            return new_state, score

        _, scores = jax.lax.scan(body, state, None, length=ITERS)
        return scores.sum()

    _ = float(chained(params, state))  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chained(params, state))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS


def _sizes(lanes: int) -> np.ndarray:
    return np.tile(
        np.array([[600.0, 1000.0]], np.float32), (lanes, 1)
    ).reshape(lanes, 1, 2)


def _u8_frames(rs, lanes: int, packed: bool) -> np.ndarray:
    if packed:  # s2d(4), matching the lockstep engine's pack=4 fast path
        shape = (lanes, 1, CANVAS_H // 4, CANVAS_W // 4, 48)
    else:
        shape = (lanes, 1, CANVAS_H, CANVAS_W, 3)
    return (rs.rand(*shape) * 255).astype(np.uint8)


def _boot_windowed(model, lanes: int, packed: bool):
    """Boot carries the way the lockstep engine does (_boot in
    batched_inference.py): precompute frame 0, init_carry, tile to lanes."""
    from mega_pytorch_tpu.data.transforms import normalize_u8_frames
    from mega_pytorch_tpu.structures.image_list import ImageBatch

    rs = np.random.RandomState(0)
    frames = _u8_frames(rs, lanes, packed)
    sizes = _sizes(lanes)
    M = type(model)

    @jax.jit
    def _boot(frames_u8, sizes):
        one = ImageBatch(
            tensors=normalize_u8_frames(frames_u8[0], sizes[0]), sizes=sizes[0]
        )
        tmp = model.init(jax.random.PRNGKey(0), one, method=M.precompute)[
            "params"
        ]
        entry = model.apply({"params": tmp}, one, method=M.precompute)
        carry1 = model.apply(
            {"params": tmp}, entry, one.sizes[0], method=M.init_carry
        )
        carries = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (lanes,) + (1,) * x.ndim), carry1
        )
        return carries, entry, carry1

    carries, entry, carry1 = _boot(jnp.asarray(frames), jnp.asarray(sizes))
    return carries, frames, sizes


def bench_windowed(preset: str, lanes: int, packed: bool):
    """RDN/FGFA: the make_lockstep_step_windowed graph, resets=False."""
    from mega_pytorch_tpu.config.presets import get_preset
    from mega_pytorch_tpu.engine.batched_inference import (
        make_lockstep_step_windowed,
    )
    from mega_pytorch_tpu.models.detectors import build_detection_model

    cfg = get_preset(preset)
    model = build_detection_model(cfg)
    carries, frames, sizes = _boot_windowed(model, lanes, packed)

    step = make_lockstep_step_windowed(model)
    params = jax.jit(
        lambda key, c, f, s: model.init(
            key,
            # init through the same per-lane step the engine jits
            jax.tree_util.tree_map(lambda x: x[0], c),
            _images_one(f, s),
            method=type(model).test_step,
        )
    )(
        jax.random.PRNGKey(0), carries, jnp.asarray(frames[0]),
        jnp.asarray(sizes[0]),
    )["params"]

    resets = jnp.zeros((lanes,), bool)

    def fn(params, state):
        carries, fr = state
        new_carries, dets = step(params, carries, fr, jnp.asarray(sizes),
                                 resets)
        score = dets.scores.sum()
        return (new_carries, _perturb_u8(fr, score)), score

    dt = _time_scan(fn, params, (carries, jnp.asarray(frames)))
    return lanes / dt, {}


def _images_one(frames_u8, sizes):
    from mega_pytorch_tpu.data.transforms import normalize_u8_frames
    from mega_pytorch_tpu.structures.image_list import ImageBatch

    return ImageBatch(
        tensors=normalize_u8_frames(frames_u8, sizes), sizes=sizes
    )


def bench_mega(lanes: int):
    from mega_pytorch_tpu.models.detectors.mega import build_mega_flagship

    fn, params, state, label = build_mega_flagship(CANVAS_H, CANVAS_W, lanes)

    def fn2(params, state):
        carry, images = state
        new_carry, score = fn(params, (carry, images))
        images = jax.tree_util.tree_map(
            lambda x: x + score.astype(x.dtype) * 1e-9
            if jnp.issubdtype(x.dtype, jnp.floating) and x.ndim >= 4
            else x,
            images,
        )
        return (new_carry, images), score

    dt = _time_scan(fn2, params, state)
    return lanes / dt, {}


def bench_dff(lanes: int, key_interval: int = 10):
    from mega_pytorch_tpu.config.presets import get_preset
    from mega_pytorch_tpu.engine.batched_inference import (
        make_lockstep_steps_dff,
    )
    from mega_pytorch_tpu.models.detectors import build_detection_model

    cfg = get_preset("dff_R_101")
    model = build_detection_model(cfg)
    M = type(model)
    rs = np.random.RandomState(0)
    frames = _u8_frames(rs, lanes, packed=False)
    sizes = _sizes(lanes)

    key_step, nonkey_step = make_lockstep_steps_dff(model)

    @jax.jit
    def _boot(frames_u8, sizes):
        one = _images_one(frames_u8[0], sizes[0])
        tmp = model.init(jax.random.PRNGKey(0), one, method=M.make_key)[
            "params"
        ]
        carry1 = model.apply({"params": tmp}, one, method=M.make_key)
        carries = jax.tree_util.tree_map(
            lambda x: jnp.tile(x[None], (lanes,) + (1,) * x.ndim), carry1
        )
        return carries, carry1, one

    carries, carry1, one = _boot(jnp.asarray(frames), jnp.asarray(sizes))
    params = jax.jit(
        lambda key: model.init(key, carry1, one, method=M.detect_non_key)
    )(jax.random.PRNGKey(0))["params"]

    def fn_key(params, state):
        carries, fr = state
        new_carries, dets = key_step(params, carries, fr, jnp.asarray(sizes))
        score = dets.scores.sum()
        return (new_carries, _perturb_u8(fr, score)), score

    def fn_nonkey(params, state):
        carries, fr = state
        new_carries, dets = nonkey_step(
            params, carries, fr, jnp.asarray(sizes)
        )
        score = dets.scores.sum()
        return (new_carries, _perturb_u8(fr, score)), score

    state = (carries, jnp.asarray(frames))
    t_key = _time_scan(fn_key, params, state)
    t_nonkey = _time_scan(fn_nonkey, params, state)
    blended = key_interval * lanes / (t_key + (key_interval - 1) * t_nonkey)
    return blended, {
        "key_ms_per_step": round(t_key * 1e3, 2),
        "nonkey_ms_per_step": round(t_nonkey * 1e3, 2),
        "key_interval": key_interval,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--lanes", type=int, default=4)
    parser.add_argument("--methods", default="mega,rdn,fgfa,dff")
    args = parser.parse_args()
    if args.lanes < 1:
        raise SystemExit(f"--lanes must be >= 1, got {args.lanes}")

    from mega_pytorch_tpu.utils.misc import setup_compilation_cache

    setup_compilation_cache()

    runners = {
        "mega": lambda: bench_mega(args.lanes),
        "rdn": lambda: bench_windowed("rdn_R_101", args.lanes, packed=True),
        "fgfa": lambda: bench_windowed("fgfa_R_101", args.lanes, packed=False),
        "dff": lambda: bench_dff(args.lanes),
    }
    for m in args.methods.split(","):
        fps, extra = runners[m.strip()]()
        print(
            json.dumps(
                {
                    "method": m.strip(),
                    "metric": (
                        f"{m.strip()} R-101 lockstep streaming frames/sec/"
                        f"chip ({CANVAS_H}x{CANVAS_W}, {args.lanes} lanes)"
                    ),
                    "value": round(fps, 2),
                    "unit": "frames/sec",
                    "lanes": args.lanes,
                    "ms_per_frame": round(1e3 / fps, 2),
                    **extra,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
