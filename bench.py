"""Benchmark: ImageNet-VID-shaped inference throughput on the current chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes (this environment): the TPU is reached through a relay
where dispatch is async, ``block_until_ready`` does not actually block, and
each host round-trip costs ~30 ms. So we chain ITERS inference steps inside
one jitted ``lax.scan`` (exactly how the streaming video pipeline runs
anyway) and synchronize with a single scalar fetch — that measures true
device throughput.

Baseline context: the reference repo publishes no throughput numbers
(BASELINE.md); the MEGA paper reports 114.5 ms/frame for MEGA R-101 on a
2080Ti (~8.73 fps), which we use as the fixed reference point for
vs_baseline until a measured A100 number exists.

Round-1 flagship: single-frame Faster R-CNN R-101 at the VID eval canvas
(608x1024), bfloat16 compute. Switches to MEGA R-101 automatically once the
MEGA meta-arch lands.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_FPS = 8.73  # MEGA R-101, 2080Ti, 114.5 ms/frame (MEGA paper)

CANVAS_H, CANVAS_W = 608, 1024
BATCH = 4
ITERS = 16


def _build_flagship():
    from mega_pytorch_tpu.models.detectors.rcnn import GeneralizedRCNN, RCNNConfig
    from mega_pytorch_tpu.structures.image_list import ImageBatch

    try:
        from mega_pytorch_tpu.models.detectors.mega import build_mega_flagship  # noqa: F401

        return build_mega_flagship(CANVAS_H, CANVAS_W, BATCH)
    except ImportError:
        pass

    c = RCNNConfig(depth="R-101", compute_dtype="bfloat16")
    model = GeneralizedRCNN(c=c)
    rs = np.random.RandomState(0)
    images = ImageBatch(
        tensors=jnp.asarray(rs.randn(BATCH, CANVAS_H, CANVAS_W, 3) * 50, jnp.float32),
        sizes=jnp.tile(jnp.array([[600.0, 1000.0]], jnp.float32), (BATCH, 1)),
    )
    params = model.init(jax.random.PRNGKey(0), images, train=False)["params"]

    def fn(params, images):
        dets = model.apply({"params": params}, images, train=False)
        return dets.scores.sum()

    return fn, params, images, "single-frame R-101"


def main():
    fn, params, images, label = _build_flagship()

    @jax.jit
    def chained(params, images):
        def body(carry, _):
            # vary the input slightly each step so iterations can't be CSE'd
            imgs = images.replace(tensors=images.tensors + carry * 1e-6)
            return carry + fn(params, imgs), None

        total, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
        return total

    # compile + warmup, synchronized by host fetch (block_until_ready is
    # unreliable through the relay)
    _ = float(chained(params, images))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(chained(params, images))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    fps = ITERS * BATCH / dt
    print(
        json.dumps(
            {
                "metric": f"VID inference frames/sec/chip ({label}, {CANVAS_H}x{CANVAS_W})",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / REFERENCE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
