"""CLI smoke tests: tools/demo.py and tools/test_prediction.py run end to end
on tiny synthetic inputs via subprocess (VERDICT r1 weakness #6 — these paths
were previously exercised only by hand)."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tiny model opts accepted by every CLI: R-14 backbone + small proposal tops
TINY_OPTS = [
    "MODEL.BACKBONE.CONV_BODY", "R-14-C4",
    "MODEL.RPN.ANCHOR_SIZES", "(8, 16, 32)",
    "MODEL.RPN.PRE_NMS_TOP_N_TEST", "64",
    "MODEL.RPN.POST_NMS_TOP_N_TEST", "16",
    "MODEL.VID.RPN.REF_PRE_NMS_TOP_N", "32",
    "MODEL.VID.RPN.REF_POST_NMS_TOP_N", "8",
    "MODEL.ROI_HEADS.DETECTIONS_PER_IMG", "5",
    "MODEL.VID.MEGA.ALL_FRAME_INTERVAL", "3",
    "MODEL.VID.MEGA.KEY_FRAME_LOCATION", "1",
    "MODEL.VID.MEGA.MEMORY.SIZE", "3",
    "MODEL.VID.MEGA.GLOBAL.SIZE", "2",
    "INPUT.MIN_SIZE_TEST", "48",
    "INPUT.MAX_SIZE_TEST", "64",
    "TPU.CANVAS_HEIGHT", "48",
    "TPU.CANVAS_WIDTH", "64",
    "TPU.COMPUTE_DTYPE", "float32",
]


def _run(args, timeout=1500):
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".cache", "jax_cache")
    )
    return subprocess.run(
        [sys.executable] + args, cwd=ROOT, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.mark.slow
def test_demo_folder_mode(tmp_path):
    frames = tmp_path / "frames"
    out = tmp_path / "out"
    frames.mkdir()
    rng = np.random.RandomState(0)
    for f in range(4):
        arr = (rng.rand(48, 64, 3) * 60).astype(np.uint8)
        arr[12:36, 8 + 2 * f : 28 + 2 * f] = 220
        Image.fromarray(arr).save(frames / f"{f:06d}.JPEG")

    proc = _run(
        [
            "tools/demo.py", "--preset", "mega_R_50",
            "--input-folder", str(frames), "--output-folder", str(out),
            "--confidence-threshold", "0.0",
            "opts", *TINY_OPTS,
        ]
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    written = sorted(out.glob("*.JPEG")) + sorted(out.glob("*.jpg"))
    assert len(written) == 4, (list(out.iterdir()), proc.stderr[-500:])


def test_test_prediction_rescore(tmp_path):
    # tiny VID_val_videos layout under an ILSVRC2015 data dir
    data = tmp_path / "datasets"
    img_dir = data / "ILSVRC2015" / "Data" / "VID" / "val" / "v00"
    anno_dir = data / "ILSVRC2015" / "Annotations" / "VID" / "val" / "v00"
    sets = data / "ILSVRC2015" / "ImageSets"
    img_dir.mkdir(parents=True)
    anno_dir.mkdir(parents=True)
    sets.mkdir(parents=True)
    lines = []
    for f in range(3):
        Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(
            img_dir / f"{f:06d}.JPEG"
        )
        (anno_dir / f"{f:06d}.xml").write_text(
            "<annotation><size><height>48</height><width>64</width></size>"
            "<object><name>n02691156</name><bndbox>"
            "<xmin>10</xmin><ymin>12</ymin><xmax>30</xmax><ymax>36</ymax>"
            "</bndbox></object></annotation>"
        )
        lines.append(f"val/v00 {f + 1} {f} 3")
    (sets / "VID_val_videos.txt").write_text("\n".join(lines) + "\n")

    # perfect predictions → AP50 = 1
    rows = [
        (
            i,
            np.array([[10.0, 12.0, 30.0, 36.0]], np.float32),
            np.array([0.9], np.float32),
            np.array([1], np.int64),
        )
        for i in range(3)
    ]
    npz = tmp_path / "predictions_0.npz"
    np.savez_compressed(npz, predictions=np.asarray(rows, dtype=object))

    proc = _run(
        [
            "tools/test_prediction.py", "--preset", "mega_R_50",
            "--data-dir", str(data), "--predictions", str(npz),
        ]
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    blob = proc.stdout + proc.stderr
    assert "AP50" in blob, blob[-1000:]
    assert "1.0000" in blob, blob[-1000:]
