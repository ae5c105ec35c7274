"""MFU analysis of the flagship MEGA streaming step (VERDICT r3 item #1a).

"Saturated" must be a number, not a feeling: this tool combines
  - XLA's own cost model (compiled.cost_analysis()["flops"]) for the total
    FLOPs of one streaming step, and
  - a jax.profiler device trace, bucketed per op family (convolution fusions,
    the Pallas attention kernel, NMS, everything else),
and prints per-segment time, achieved TFLOP/s and MFU against the chip's
bf16 peak.

Peak reference: v5e ≈ 197 TFLOP/s bf16 (public spec). Override with
--peak-tflops for other chips.

Usage (on the TPU host):  python tools/profile_mfu.py [--lanes 4]
"""

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def collect_device_events(trace_dir: str):
    """Parse the perfetto trace: [(name, category, dur_us, flops)] for
    device-lane events.

    Bucketing uses the profiler's own `hlo_category` arg (e.g. "convolution
    fusion", "loop fusion", "data formatting", "custom-call") — XLA names
    fusions `fusion.NNN`, so name heuristics misbucket nearly everything.
    The umbrella `jit__lambda`-style XLA-op rows double-count their children
    and are dropped (an event is kept only if it has an hlo_category)."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    # device pids: process names containing '/device:' (axon/TPU) — host
    # python threads are excluded so only real device kernel times count
    dev_pids = {
        e["pid"]
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "/device" in str(e.get("args", {}).get("name", "")).lower()
    }
    events = []
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        a = e.get("args", {}) or {}
        cat = a.get("hlo_category")
        if not cat:
            continue  # umbrella/module rows double-count their children
        flops = float(a.get("flops", 0) or 0)
        events.append((e.get("name", ""), cat, float(e.get("dur", 0)), flops))
    return events


def main_train(args, h, w):
    """MEGA R-101 TRAIN-step profile at the shipped config (VERDICT r4 #7):
    one sample per step (the reference's 1 img/GPU, BASE_RCNN_1gpu.yaml),
    full forward + backward + SGD update, train-time frame pools
    local cur+2 / memory 3 / global 2 (vid_mega.py:30-93), canvas h x w.
    Single chip; the DP mesh adds only the grad all-reduce."""
    from mega_pytorch_tpu.config.presets import get_preset
    from mega_pytorch_tpu.engine.trainer import make_train_step
    from mega_pytorch_tpu.models.detectors.mega import GeneralizedRCNNMEGA
    from mega_pytorch_tpu.models.detectors.rcnn import RCNNConfig, pad_gt
    from mega_pytorch_tpu.models.detectors.rdn import VidConfig
    from mega_pytorch_tpu.solver import make_optimizer
    from mega_pytorch_tpu.structures.image_list import ImageBatch
    from mega_pytorch_tpu.utils.misc import jit_init

    c = RCNNConfig(depth="R-101", compute_dtype="bfloat16")
    v = VidConfig(method="mega", base_stage=3)
    model = GeneralizedRCNNMEGA(c=c, v=v)
    rs = np.random.RandomState(0)

    def images(frames):
        return ImageBatch(
            tensors=jnp.asarray(
                rs.randn(1, frames, h, w, 3) * 50, jnp.float32
            ),
            sizes=jnp.tile(
                jnp.array([[600.0, 1000.0]], jnp.float32), (1, frames, 1)
            ),
        )

    inputs = {"local": images(3), "memory": images(3), "global": images(2)}
    one_gt = pad_gt(
        np.array([[80.0, 80.0, 400.0, 400.0], [300.0, 200.0, 700.0, 500.0]]),
        np.array([3, 7]), 32,
    )
    gt = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[None, None], one_gt)

    one = jax.tree_util.tree_map(lambda x: x[0], (inputs, gt))
    params = jit_init(
        model, jax.random.PRNGKey(0), one[0], one[1], jax.random.PRNGKey(1),
        train=True,
    )["params"]
    optimizer = make_optimizer(get_preset("mega_R_101"), params)
    opt_state = optimizer.init(params)
    step = make_train_step(model, optimizer, num_samples=1)
    rng = jax.random.PRNGKey(2)

    lowered = step.lower(params, opt_state, inputs, gt, rng)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    total_flops = float(cost.get("flops", 0.0))
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(compiled.as_text())

    def run_iters(n, p, s):
        losses = None
        for _ in range(n):
            p, s, losses = step(p, s, inputs, gt, rng)
        return p, s, losses

    params, opt_state, losses = run_iters(1, params, opt_state)  # warmup
    _ = {k: float(x) for k, x in losses.items()}  # sync
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, losses = run_iters(args.iters, params, opt_state)
        _ = float(losses["loss_classifier"])
        times.append((time.perf_counter() - t0) / args.iters)
    step_s = min(times)

    trace_dir = tempfile.mkdtemp(prefix="mfu_train_trace_")
    jax.profiler.start_trace(trace_dir)
    params, opt_state, losses = run_iters(args.iters, params, opt_state)
    _ = float(losses["loss_classifier"])
    jax.profiler.stop_trace()

    events = collect_device_events(trace_dir)
    per_bucket = defaultdict(float)
    for name, cat, dur, flops in events:
        per_bucket[cat] += dur
    total_us = sum(per_bucket.values())

    print(f"\n=== MEGA R-101 TRAIN step (1 sample) @ {h}x{w} ===")
    print(f"XLA cost model: {total_flops / 1e9:.1f} GFLOP / step (fwd+bwd+SGD)")
    print(f"end-to-end step: {step_s * 1e3:.2f} ms "
          f"({1.0 / step_s:.2f} steps/s)")
    achieved = total_flops / step_s / 1e12
    print(f"whole-step achieved: {achieved:.1f} TFLOP/s "
          f"= {100 * achieved / args.peak_tflops:.1f}% MFU (bf16 peak "
          f"{args.peak_tflops} TFLOP/s)")
    print(f"\ndevice-time buckets over {args.iters} steps "
          f"({total_us / 1e3:.2f} ms total):")
    for b, us in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print(f"  {b:>16s}: {us / args.iters / 1e3:7.3f} ms/step "
              f"({100 * us / total_us:5.1f}%)")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--lanes", type=int, default=4)
    parser.add_argument("--iters", type=int, default=8)
    parser.add_argument("--peak-tflops", type=float, default=197.0)
    parser.add_argument("--canvas", default="608x1024")
    parser.add_argument(
        "--train", action="store_true",
        help="profile the MEGA train step (fwd+bwd+SGD, 1 sample) instead "
        "of the streaming inference step",
    )
    parser.add_argument(
        "--dump-hlo", default=None,
        help="write compiled HLO text here (grep fusion.NNN from the trace "
        "to see exactly which convolutions/ops a hot fusion contains)",
    )
    args = parser.parse_args()
    h, w = (int(x) for x in args.canvas.split("x"))

    if args.train:
        from mega_pytorch_tpu.utils.misc import setup_compilation_cache

        setup_compilation_cache()
        return main_train(args, h, w)

    from mega_pytorch_tpu.models.detectors.mega import build_mega_flagship
    from mega_pytorch_tpu.utils.misc import setup_compilation_cache

    setup_compilation_cache()
    fn, params, state, label = build_mega_flagship(h, w, args.lanes)

    step = jax.jit(lambda p, s: fn(p, s))
    lowered = step.lower(params, state)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    total_flops = float(cost.get("flops", 0.0))
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(compiled.as_text())
        print(f"HLO written to {args.dump_hlo}")

    # warmup + timed run for end-to-end step time (scalar-fetch sync: the
    # relay's block_until_ready is unreliable)
    out = step(params, state)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(params, state)
        _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
        times.append((time.perf_counter() - t0) / args.iters)
    step_s = min(times)

    trace_dir = tempfile.mkdtemp(prefix="mfu_trace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.iters):
        out = step(params, state)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    jax.profiler.stop_trace()

    events = collect_device_events(trace_dir)
    per_bucket = defaultdict(float)
    per_name = defaultdict(lambda: [0.0, 0.0, ""])  # dur_us, flops, category
    for name, cat, dur, flops in events:
        per_bucket[cat] += dur
        row = per_name[name]
        row[0] += dur
        row[1] += flops
        row[2] = cat
    total_us = sum(per_bucket.values())

    frames = args.lanes * args.iters
    print(f"\n=== {label} @ {h}x{w}, {args.lanes} lanes ===")
    print(f"XLA cost model: {total_flops / 1e9:.1f} GFLOP / step "
          f"({total_flops / args.lanes / 1e9:.1f} GFLOP / frame)")
    print(f"end-to-end step: {step_s * 1e3:.2f} ms "
          f"({args.lanes / step_s:.1f} fps)")
    achieved = total_flops / step_s / 1e12
    print(f"whole-step achieved: {achieved:.1f} TFLOP/s "
          f"= {100 * achieved / args.peak_tflops:.1f}% MFU (bf16 peak "
          f"{args.peak_tflops} TFLOP/s)")

    print(f"\ndevice-time buckets over {args.iters} steps "
          f"({total_us / 1e3:.2f} ms total, {total_us / frames / 1e3:.3f} "
          "ms/frame):")
    for b, us in sorted(per_bucket.items(), key=lambda kv: -kv[1]):
        print(f"  {b:>16s}: {us / frames / 1e3:7.3f} ms/frame "
              f"({100 * us / total_us:5.1f}%)")

    print("\ntop 30 ops by device time (achieved TFLOP/s from the trace's "
          "per-op flops where present):")
    for name, (us, flops, cat) in sorted(
        per_name.items(), key=lambda kv: -kv[1][0]
    )[:30]:
        tf = flops / (us * 1e-6) / 1e12 if us and flops else 0.0
        mfu = 100 * tf / args.peak_tflops
        extra = f"  {tf:6.1f} TF/s {mfu:5.1f}% MFU" if flops else " " * 25
        print(f"  {us / frames / 1e3:7.3f} ms/frame{extra}  [{cat[:18]:18s}] "
              f"{name[:60]}")


if __name__ == "__main__":
    main()
