"""On-chip Pallas kernel numerics pin (VERDICT r4 ask #2).

The test suite pins the Pallas kernels only in interpret mode on CPU at toy
shapes; the live-reference parity suite never reaches them (its ref sets sit
below attention.FUSED_MIN_REFS, so parity pins the einsum twin). This tool
closes the missing edge of the chain — "reference == einsum" (CPU parity
suite) ∘ "einsum == Mosaic-compiled flash ON THE TPU at PRODUCTION shapes"
(this tool) — and commits the result as KERNEL_PARITY.md so a hardware/
Mosaic-lowering numerics drift fails loudly the next time it runs.

Checks (all on the real chip, production dispatch path — vmapped lanes
through the custom_vmap rules, paired-group MXU layout, multiplicative
in-kernel position bias):
  1. fused_relation_attention_pos at MEGA stage-0 shapes
     (B=12, G=16, N=675, M=3750) vs reference_position_bias(sin_dtype=f32)
     + reference_relation_attention.  Match target:
     mega_core/modeling/roi_heads/box_head/roi_box_feature_extractors.py:567-646.
  2. Same at stage-1/2 shapes (N=675, M=750).
  3. fused_relation_attention (no bias: the global-attention path,
     update_lm :690-699) at the merged global-enhance shape (N=2175, M=750).
  4. stem_pool_packed at the flagship stem shape (24, 152, 256, 256) bf16
     (the production dtype) vs the XLA shifted-max chain (exact semantics
     twin from tests/test_backbone.py::test_stem_pool_packed_kernel_exact).
  5. custom_vmap lane-routing consistency: the vmapped production dispatch's
     lane 0 must EXACTLY equal the unbatched call on the same data.
  6. End-to-end lockstep streaming determinism ON THE CHIP at a
     kernel-engaging geometry (window M >= FUSED_MIN_REFS), production
     bf16: two runs, bit-identical detections. (Serial==lockstep detection
     identity is pinned on CPU where both engines lower identically;
     cross-engine comparison on hardware is meaningless for an untrained
     model — see check_streaming_determinism for the measurement.)

Tolerances (stated, not implicit):
  - attention vs f32-sinusoid twin: atol 2e-2 on the (g, N, d) output
    (the in-kernel _sincos polynomial's 2e-4 sinusoid error enters the
    position weight before a softmax; 2e-2 is the interpret-mode test's
    bound for the same comparison and sits far below any score that could
    flip an NMS keep or AP ranking — typical diffs are ~1e-3, see artifact).
  - no-bias attention vs einsum twin: atol 6e-3 (bf16 matmul quantization,
    identical in both paths; the diff is accumulation order only).
  - stem_pool: rtol 8e-3 = one bf16 ULP on the bf16 production dtype (both
    paths do identical f32 max/FMA chains on the same bf16 inputs and round
    once; only FMA-contraction differences can appear, as single ULPs).
  - lockstep vs serial detections: identical boxes/labels/counts,
    scores atol 3e-3 (fp drift compounding through the carry — the bound
    the CPU lockstep tests use). f32 model compute: see
    check_streaming_identity for why a bf16 comparison across the two
    engines' different batch shapes is meaningless.

Usage (on the TPU host):  python tools/verify_kernels.py [--out KERNEL_PARITY.md]
"""

from __future__ import annotations

import argparse
import datetime
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

ATOL_POS = 2e-2
ATOL_NOBIAS = 6e-3
RTOL_STEM = 8e-3  # one bf16 ULP (see check_stem_pool)
ATOL_SCORES = 3e-3

ROWS = []
FAILURES = []


def record(name: str, shape: str, max_diff: float, p99: float, tol: float,
           tol_kind: str, passed: bool, note: str = ""):
    ROWS.append((name, shape, max_diff, p99, tol, tol_kind, passed, note))
    status = "ok" if passed else "FAIL"
    print(f"[{status}] {name} {shape}: max {max_diff:.3e} p99 {p99:.3e} "
          f"({tol_kind} {tol:g}) {note}")
    if not passed:
        FAILURES.append(name)


def _boxes(rs, n, h=600.0, w=1000.0):
    """Plausible proposal boxes on the eval canvas (x1 y1 x2 y2)."""
    cx = rs.rand(n) * w
    cy = rs.rand(n) * h
    bw = rs.gamma(2.0, 40.0, n) + 4.0
    bh = rs.gamma(2.0, 40.0, n) + 4.0
    b = np.stack([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2], 1)
    return np.clip(b, 0.0, [w - 1, h - 1, w - 1, h - 1]).astype(np.float32)


def check_attention(B, G, N, M, D, E, *, bias: bool, label: str, seed: int):
    from mega_pytorch_tpu.ops.pallas.position_bias import reference_position_bias
    from mega_pytorch_tpu.ops.pallas.relation_attention import (
        fused_relation_attention,
        fused_relation_attention_pos,
        reference_relation_attention,
    )

    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(B, G, N, D), jnp.float32)
    k = jnp.asarray(rs.randn(B, G, M, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, G, M, D), jnp.float32)
    uk = jnp.asarray(rs.randn(B, G, M) * 0.1, jnp.float32)
    rois = jnp.asarray(np.stack([_boxes(rs, N) for _ in range(B)]))
    refs = jnp.asarray(np.stack([_boxes(rs, M) for _ in range(B)]))
    wk = jnp.asarray(rs.randn(E, G) * 0.05, jnp.float32)
    wb = jnp.asarray(rs.rand(G) * 0.1, jnp.float32)
    # realistic validity: mostly valid with a padded tail per lane
    valid = jnp.asarray(rs.rand(B, M) > 0.1)

    if bias:
        fused = jax.jit(jax.vmap(
            lambda q, k, v, uk, r, rf, vl: fused_relation_attention_pos(
                q, k, v, uk, r, (rf, wk, wb), vl, E
            )
        ))
        out = np.asarray(fused(q, k, v, uk, rois, refs, valid))

        @jax.jit
        @jax.vmap
        def twin(q, k, v, uk, r, rf, vl):
            b = reference_position_bias(r, rf, wk, wb, E, sin_dtype=jnp.float32)
            return reference_relation_attention(q, k, v, uk, b, vl)

        ref = np.asarray(twin(q, k, v, uk, rois, refs, valid))
        tol = ATOL_POS
    else:
        fused = jax.jit(jax.vmap(
            lambda q, k, v, uk, vl: fused_relation_attention(
                q, k, v, uk, None, vl
            )
        ))
        out = np.asarray(fused(q, k, v, uk, valid))
        twin = jax.jit(jax.vmap(
            lambda q, k, v, uk, vl: reference_relation_attention(
                q, k, v, uk, None, vl
            )
        ))
        ref = np.asarray(twin(q, k, v, uk, valid))
        tol = ATOL_NOBIAS

    diff = np.abs(out - ref)
    record(label, f"B={B} G={G} N={N} M={M}", float(diff.max()),
           float(np.percentile(diff, 99)), tol, "atol", bool(diff.max() <= tol))


def check_stem_pool():
    from mega_pytorch_tpu.ops.pallas.stem_pool import stem_pool_packed

    o, n, t, u = 64, 24, 152, 256  # the flagship 12-lane x2-canvas stem shape
    rs = np.random.RandomState(11)
    # bf16 input/output — the PRODUCTION dtype (the flagship preset's
    # compute_dtype; the f32 form's (1, 19, 256, 256) blocks overflow the
    # 16M scoped-VMEM stack and never ship)
    y = jnp.asarray(rs.randn(n, t, u, 4 * o), jnp.bfloat16)
    scale = jnp.asarray(rs.rand(o) + 0.5, jnp.float32)
    shift = jnp.asarray(rs.randn(o), jnp.float32)

    @jax.jit
    def xla_chain(y):
        # f32 affine/max on the same bf16 inputs, one final bf16 round —
        # mirrors the kernel's internal precision exactly
        y = y.astype(jnp.float32)
        z = jnp.maximum(y.reshape(*y.shape[:3], 2, 2, o) * scale + shift, 0.0)
        neg = jnp.asarray(jnp.finfo(z.dtype).min, z.dtype)
        prev_r = jnp.concatenate(
            [jnp.full_like(z[:, :1, :, 1], neg), z[:, :-1, :, 1]], axis=1
        )
        r = jnp.maximum(jnp.maximum(z[:, :, :, 0], z[:, :, :, 1]), prev_r)
        prev_c = jnp.concatenate(
            [jnp.full_like(r[:, :, :1, 1], neg), r[:, :, :-1, 1]], axis=2
        )
        return jnp.maximum(
            jnp.maximum(r[..., 0, :], r[..., 1, :]), prev_c
        ).astype(jnp.bfloat16)

    got = np.asarray(jax.jit(
        lambda y: stem_pool_packed(y, jnp.tile(scale, 4), jnp.tile(shift, 4), o)
    )(y)).astype(np.float32)
    want = np.asarray(xla_chain(y)).astype(np.float32)
    denom = np.maximum(np.abs(want), 1e-30)
    rel = np.abs(got - want) / denom
    # one-bf16-ULP budget: both paths do f32 math on identical bf16 inputs
    # and round once; only FMA-contraction differences can show, as 1 ULP
    record("stem_pool_packed", f"({n},{t},{u},{4 * o}) bf16", float(rel.max()),
           float(np.percentile(rel, 99)), RTOL_STEM, "rtol",
           bool(np.allclose(got, want, rtol=RTOL_STEM, atol=1e-6)))


def check_vmap_lane_consistency():
    """The production dispatch is vmapped over video lanes (custom_vmap
    routes to the explicit-lane-batched grid); the unbatched entry wraps a
    B=1 grid. Both must agree EXACTLY on the same lane data — the kernel
    grid is per-lane, so batching may not perturb numerics. Pins the
    custom_vmap routing itself on hardware (the piece the engines rely on
    that checks 1-3's twin comparison doesn't isolate)."""
    from mega_pytorch_tpu.ops.pallas.relation_attention import (
        fused_relation_attention_pos,
    )

    B, G, N, M, D, E = 4, 16, 675, 3750, 64, 64
    rs = np.random.RandomState(7)
    q = jnp.asarray(rs.randn(B, G, N, D), jnp.float32)
    k = jnp.asarray(rs.randn(B, G, M, D), jnp.float32)
    v = jnp.asarray(rs.randn(B, G, M, D), jnp.float32)
    uk = jnp.asarray(rs.randn(B, G, M) * 0.1, jnp.float32)
    rois = jnp.asarray(np.stack([_boxes(rs, N) for _ in range(B)]))
    refs = jnp.asarray(np.stack([_boxes(rs, M) for _ in range(B)]))
    wk = jnp.asarray(rs.randn(E, G) * 0.05, jnp.float32)
    wb = jnp.asarray(rs.rand(G) * 0.1, jnp.float32)
    valid = jnp.asarray(rs.rand(B, M) > 0.1)

    call = lambda q, k, v, uk, r, rf, vl: fused_relation_attention_pos(  # noqa: E731
        q, k, v, uk, r, (rf, wk, wb), vl, E
    )
    batched = np.asarray(jax.jit(jax.vmap(call))(q, k, v, uk, rois, refs, valid))
    single = np.asarray(jax.jit(call)(
        q[0], k[0], v[0], uk[0], rois[0], refs[0], valid[0]
    ))
    diff = np.abs(batched[0] - single)
    record("flash vmap lane == unbatched", f"B={B} vs B=1, N={N} M={M}",
           float(diff.max()), float(np.percentile(diff, 99)), 0.0, "exact",
           bool(diff.max() == 0.0))


def check_streaming_determinism(tmp_root: Path):
    """2-lane lockstep MEGA streaming ON THE CHIP at the production bf16
    dtype with the flash kernel engaged (window M = 25*25 = 625 >=
    FUSED_MIN_REFS=512; the stage-0 call runs at M=1250 with in-kernel
    bias): two full runs must produce BIT-IDENTICAL detections.

    Why determinism and not serial==lockstep: the serial engine compiles
    batch-1 graphs and the lockstep engine batch-2 graphs, and two
    different-batch compilations tile (and so accumulate) convs differently
    — on an untrained random-weight model whose detection scores cluster in
    near-ties, those ULP-scale perturbations reshuffle NMS picks wholesale
    (measured on-chip: wholly different box sets per frame, at bf16 AND at
    f32). The serial==lockstep PROTOCOL equality is pinned on CPU, where
    both engines lower identically (tests/test_mega.py lockstep tests);
    what only hardware can attest is that the compiled step — Mosaic
    kernels, NMS while-loops, sorts — is run-to-run deterministic, which is
    what frame-exact reproducibility of an eval run rests on."""
    from PIL import Image

    from mega_pytorch_tpu.data.datasets.vid import VIDMEGADataset
    from mega_pytorch_tpu.data.loader import EvalPreprocessor
    from mega_pytorch_tpu.engine.inference import compute_on_dataset
    from mega_pytorch_tpu.models.detectors.mega import GeneralizedRCNNMEGA
    from mega_pytorch_tpu.models.detectors.rcnn import RCNNConfig
    from mega_pytorch_tpu.models.detectors.rdn import VidConfig
    from mega_pytorch_tpu.structures.image_list import ImageBatch
    from mega_pytorch_tpu.utils.misc import jit_init

    # synthetic 2-video dataset at 96x128 (the parity-suite geometry)
    img_dir = tmp_root / "Data" / "VID"
    anno_dir = tmp_root / "Annotations" / "VID"
    lines = []
    rng = np.random.RandomState(0)
    for vdx in range(2):
        folder = f"val/v{vdx:02d}"
        (img_dir / folder).mkdir(parents=True, exist_ok=True)
        (anno_dir / folder).mkdir(parents=True, exist_ok=True)
        for f in range(6):
            arr = (rng.rand(96, 128, 3) * 60).astype(np.uint8)
            x = 16 + 4 * f
            arr[24:72, x: x + 40] = 220
            Image.fromarray(arr).save(img_dir / folder / f"{f:06d}.JPEG")
            (anno_dir / folder / f"{f:06d}.xml").write_text(
                "<annotation><size><height>96</height><width>128</width>"
                "</size><object><name>n02691156</name><bndbox>"
                f"<xmin>{x}</xmin><ymin>24</ymin><xmax>{x + 39}</xmax>"
                "<ymax>71</ymax></bndbox></object></annotation>"
            )
            lines.append(f"{folder} {6 * vdx + f + 1} {f} 6")
    (tmp_root / "ImageSets").mkdir(exist_ok=True)
    (tmp_root / "ImageSets" / "val.txt").write_text("\n".join(lines) + "\n")

    c = RCNNConfig(
        depth="R-50",
        anchor_sizes=(16, 32, 64),
        pre_nms_top_n_test=300,
        post_nms_top_n_test=75,
        ref_pre_nms_top_n=150,
        ref_post_nms_top_n=25,
        detections_per_img=10,
        compute_dtype="bfloat16",  # the production dtype
    )
    v = VidConfig(
        method="mega", base_stage=3, all_frame_interval=25,
        key_frame_location=12, memory_size=25, global_size=5,
        global_res_stage=1,
    )
    model = GeneralizedRCNNMEGA(c=c, v=v)
    ds = VIDMEGADataset(
        image_set="VID_val", data_dir=str(tmp_root),
        img_dir=str(img_dir), anno_path=str(anno_dir),
        img_index=str(tmp_root / "ImageSets" / "val.txt"),
        is_train=False, max_offset=12, all_frame_interval=25,
        global_size=5, global_seed=0,
    )
    prep = EvalPreprocessor(min_size=96, max_size=128, canvas_short=96,
                            canvas_long=128, max_gt=4)

    s0 = prep(ds[0])
    one = ImageBatch(tensors=s0["cur"], sizes=s0["cur_size"])
    tmp = jit_init(model, jax.random.PRNGKey(0), one,
                   method=model.precompute)["params"]
    entry = jax.jit(
        lambda p, im: model.apply({"params": p}, im, method=model.precompute)
    )(tmp, one)
    carry = jax.jit(
        lambda p, e, s: model.apply({"params": p}, e, s,
                                    method=model.init_carry)
    )(tmp, entry, one.sizes[0])
    params = jit_init(model, jax.random.PRNGKey(0), carry, one,
                      method=model.test_step)["params"]

    # sanity: the flash kernel must actually be engaged at this geometry
    window_m = v.all_frame_interval * c.ref_post_nms_top_n
    from mega_pytorch_tpu.models.roi_heads.attention import FUSED_MIN_REFS
    assert window_m >= FUSED_MIN_REFS, (window_m, FUSED_MIN_REFS)
    assert jax.default_backend() == "tpu"

    indices = list(range(len(ds)))
    run_a = compute_on_dataset(model, params, ds, indices, prep, "mega",
                               lanes=2)
    run_b = compute_on_dataset(model, params, ds, indices, prep, "mega",
                               lanes=2)

    worst = 0.0
    identical = True
    for i in indices:
        a, b = run_a[i], run_b[i]
        if len(a["boxes"]) != len(b["boxes"]):
            identical = False
            continue
        if not len(a["boxes"]):
            continue
        if not np.array_equal(a["labels"], b["labels"]):
            identical = False
        worst = max(worst, float(np.abs(a["scores"] - b["scores"]).max()))
        if not np.array_equal(a["boxes"], b["boxes"]):
            identical = False
    n_dets = sum(len(run_a[i]["boxes"]) for i in indices)
    record(
        "streaming lockstep determinism (on-chip, bf16, kernel engaged)",
        f"2 videos x 6 frames, window M={window_m}, stage-0 M={2 * window_m}",
        worst, worst, 0.0, "exact",
        bool(identical and worst == 0.0),
        note=f"{n_dets} detections compared across 2 runs",
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default=str(Path(__file__).parent.parent
                                             / "KERNEL_PARITY.md"))
    parser.add_argument("--skip-streaming", action="store_true",
                        help="kernel microchecks only (faster)")
    args = parser.parse_args()

    from mega_pytorch_tpu.utils.misc import setup_compilation_cache

    setup_compilation_cache()
    backend = jax.default_backend()
    dev = str(jax.devices()[0])
    print(f"backend={backend} device={dev}")
    if backend != "tpu":
        raise SystemExit(
            "verify_kernels.py pins HARDWARE Mosaic numerics; run it on the "
            "TPU host (interpret-mode CPU parity already lives in "
            "tests/test_flash_attention.py)."
        )

    t0 = time.time()
    # 1-2: production compute-mode bias kernel at streaming shapes
    check_attention(12, 16, 675, 3750, 64, 64, bias=True,
                    label="flash pos (stage-0)", seed=0)
    check_attention(12, 16, 675, 750, 64, 64, bias=True,
                    label="flash pos (stage-1/2)", seed=1)
    # 3: no-bias global-attention path at the merged update_lm shape
    check_attention(12, 16, 2175, 750, 64, 64, bias=False,
                    label="flash no-bias (global enhance)", seed=2)
    check_stem_pool()
    check_vmap_lane_consistency()
    if not args.skip_streaming:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            check_streaming_determinism(Path(td))

    lines = [
        "# KERNEL_PARITY — on-chip Pallas numerics pin",
        "",
        f"Generated by `tools/verify_kernels.py` on "
        f"{datetime.date.today().isoformat()}; device `{dev}`, "
        f"backend `{backend}`, wall {time.time() - t0:.0f}s.",
        "",
        "Mosaic-compiled production kernels vs their XLA twins at the",
        "shipped streaming shapes, through the production dispatch path",
        "(vmapped lanes, paired-group MXU layout, multiplicative in-kernel",
        "position bias). See the tool docstring for the tolerance rationale.",
        "",
        "| check | shape | max diff | p99 diff | tolerance | pass |",
        "|---|---|---|---|---|---|",
    ]
    for name, shape, mx, p99, tol, kind, ok, note in ROWS:
        lines.append(
            f"| {name} | {shape} | {mx:.3e} | {p99:.3e} | {kind} {tol:g} | "
            f"{'yes' if ok else '**NO**'} {note} |"
        )
    lines.append("")
    Path(args.out).write_text("\n".join(lines))
    print(f"\nwrote {args.out}")
    if FAILURES:
        raise SystemExit(f"FAILED checks: {FAILURES}")


if __name__ == "__main__":
    main()
