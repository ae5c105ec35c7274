"""Visualization demo over an image folder or a video file (parity with
demo/demo.py:44-74 + demo/predictor.py's VIDDemo: stream frames through a
method, draw boxes, write annotated frames or an annotated video).

Usage:
  python tools/demo.py --preset mega_R_101 --checkpoint model.ckpt \
      --input-folder frames/ --output-folder visualized/ [--suffix .JPEG]
  python tools/demo.py ... --video clip.mp4 --output-folder out/ \
      [--output-video out/vis.avi]

Folder mode draws with PIL only; --video / --output-video use OpenCV for
decode/encode (gated import — everything else works without cv2).
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
from PIL import Image, ImageDraw

PALETTE = [
    (230, 25, 75), (60, 180, 75), (255, 225, 25), (0, 130, 200),
    (245, 130, 48), (145, 30, 180), (70, 240, 240), (240, 50, 230),
]


def draw(img: Image.Image, pred: dict, class_names, thresh: float) -> Image.Image:
    d = ImageDraw.Draw(img)
    for box, score, label in zip(pred["boxes"], pred["scores"], pred["labels"]):
        if score < thresh:
            continue
        x1, y1, x2, y2 = map(float, box)
        if x2 <= x1 or y2 <= y1:  # degenerate box (possible at low thresholds)
            continue
        color = PALETTE[int(label) % len(PALETTE)]
        d.rectangle([x1, y1, x2, y2], outline=color, width=3)
        d.text(
            (float(box[0]) + 2, float(box[1]) + 2),
            f"{class_names[int(label)]} {score:.2f}",
            fill=color,
        )
    return img


class FolderVideo:
    """Adapter exposing an image folder as a streaming pseudo-dataset."""

    def __init__(self, folder: str, suffix: str = ".JPEG"):
        self.files = sorted(
            os.path.join(folder, f) for f in os.listdir(folder) if f.endswith(suffix)
        )
        assert self.files, f"no {suffix} files in {folder}"
        with Image.open(self.files[0]) as im:
            self.w0, self.h0 = im.size
        self.fps = 25.0

    def __len__(self):
        return len(self.files)

    def load_image(self, idx):
        return Image.open(self.files[idx]).convert("RGB")

    def load_frame(self, pattern, frame):
        return self.load_image(min(int(frame), len(self.files) - 1))

    def get_img_info(self, idx):
        return {"height": self.h0, "width": self.w0}

    def sample(self, idx, max_offset: int, global_size: int, method: str):
        s = {"cur": self.load_image(idx), "gt": None, "idx": idx}
        frame_category = 0 if idx == 0 else 1
        nxt = min(idx + max_offset, len(self) - 1)
        if method in ("rdn", "fgfa"):
            s.update(ref=[self.load_image(nxt)], frame_category=frame_category,
                     seg_len=len(self), pattern="%06d", frame_id=idx)
        elif method == "mega":
            n_g = global_size if idx == 0 else 1
            rng = np.random.RandomState(0)
            g_ids = rng.choice(len(self), size=min(n_g, len(self)))
            s.update(
                ref_l=[self.load_image(nxt)],
                ref_g=[self.load_image(int(i)) for i in g_ids],
                frame_category=frame_category,
                seg_len=len(self), pattern="%06d", frame_id=idx,
            )
        elif method == "dff":
            s.update(is_key_frame=idx % 10 == 0, frame_id=idx,
                     seg_len=len(self), pattern="%06d")
        return s


class FileVideo(FolderVideo):
    """Adapter exposing a video file as a streaming pseudo-dataset
    (parity with demo/predictor.py:54-69 run_on_video's VideoCapture path).

    Frames decode lazily with positional seek, so MEGA's random global-frame
    reads work; sequential reads avoid the seek."""

    def __init__(self, path: str):
        import cv2

        self._cv2 = cv2
        self._cap = cv2.VideoCapture(path)
        assert self._cap.isOpened(), f"cannot open video {path}"
        self._n = int(self._cap.get(cv2.CAP_PROP_FRAME_COUNT))
        self.w0 = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.h0 = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.fps = float(self._cap.get(cv2.CAP_PROP_FPS)) or 25.0
        self._next = 0

    def __len__(self):
        return self._n

    def load_image(self, idx):
        idx = min(max(int(idx), 0), self._n - 1)
        if idx != self._next:
            self._cap.set(self._cv2.CAP_PROP_POS_FRAMES, idx)
        ok, frame = self._cap.read()
        assert ok, f"failed to decode frame {idx}"
        self._next = idx + 1
        return Image.fromarray(frame[:, :, ::-1])  # BGR -> RGB

    def load_frame(self, pattern, frame):
        return self.load_image(frame)


def main():
    from mega_pytorch_tpu.utils.misc import honor_jax_platforms_env

    honor_jax_platforms_env()
    from mega_pytorch_tpu.utils.misc import setup_compilation_cache

    setup_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="mega_R_101")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--input-folder", default=None)
    parser.add_argument("--video", default=None, help="input video file instead of a folder")
    parser.add_argument("--output-folder", required=True)
    parser.add_argument("--output-video", default=None,
                        help="also encode annotated frames into this video file")
    parser.add_argument("--suffix", default=".JPEG")
    parser.add_argument("--confidence-threshold", type=float, default=0.7)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()
    assert (args.input_folder is None) != (args.video is None), \
        "pass exactly one of --input-folder / --video"

    from mega_pytorch_tpu.config import get_preset
    from mega_pytorch_tpu.data.datasets.vid import VID_CLASSES
    from mega_pytorch_tpu.data.loader import EvalPreprocessor
    from mega_pytorch_tpu.engine.inference import StreamingInferencer, _extract
    from mega_pytorch_tpu.models.detectors import build_detection_model
    from mega_pytorch_tpu.utils.checkpoint import Checkpointer
    from mega_pytorch_tpu.utils.logger import setup_logger
    from mega_pytorch_tpu.utils.model_ingest import init_inference_params

    cfg = get_preset(args.preset)
    opts = args.opts[1:] if args.opts and args.opts[0] == "opts" else args.opts
    if opts:
        cfg.merge_from_list(opts)
    method = cfg.MODEL.VID.METHOD if cfg.MODEL.VID.ENABLE else "base"
    logger = setup_logger("demo", None)
    model = build_detection_model(cfg)

    video = (
        FileVideo(args.video) if args.video
        else FolderVideo(args.input_folder, args.suffix)
    )
    prep = EvalPreprocessor(
        min_size=cfg.INPUT.MIN_SIZE_TEST, max_size=cfg.INPUT.MAX_SIZE_TEST,
        canvas_short=cfg.TPU.CANVAS_HEIGHT, canvas_long=cfg.TPU.CANVAS_WIDTH,
        max_gt=cfg.TPU.MAX_GT_BOXES,
    )

    # EvalPreprocessor expects a gt field; folder demo has none
    def call_no_gt(sample):
        sample["gt"] = {
            "boxes": np.zeros((0, 4), np.float32),
            "labels": np.zeros(0, np.int64),
        }
        return prep(sample)

    params = init_inference_params(model, method, call_no_gt, _AsDataset(video, method, cfg), logger)
    if args.checkpoint:
        payload = Checkpointer(os.path.dirname(args.checkpoint) or ".", logger).load(args.checkpoint)
        params = payload.get("params", params)

    os.makedirs(args.output_folder, exist_ok=True)
    writer = None
    if args.output_video:
        import cv2

        fourcc = cv2.VideoWriter_fourcc(
            *("mp4v" if args.output_video.endswith(".mp4") else "MJPG")
        )
        writer = cv2.VideoWriter(
            args.output_video, fourcc, video.fps, (video.w0, video.h0)
        )
        assert writer.isOpened(), f"cannot open video writer {args.output_video}"

    ds = _AsDataset(video, method, cfg)
    runner = StreamingInferencer(model, params, method, prep, ds)
    for idx in range(len(video)):
        sample = call_no_gt(ds[idx])
        dets = runner.step(sample)
        pred = _extract(dets, sample["cur_size"][0], (video.h0, video.w0))
        img = draw(video.load_image(idx), pred, VID_CLASSES, args.confidence_threshold)
        img.save(os.path.join(args.output_folder, f"{idx:06d}.jpg"))
        if writer is not None:
            writer.write(np.asarray(img)[:, :, ::-1])  # RGB -> BGR
        if (idx + 1) % 20 == 0:
            logger.info(f"visualized {idx + 1}/{len(video)}")
    if writer is not None:
        writer.release()
        logger.info(f"wrote {args.output_video}")


class _AsDataset:
    def __init__(self, video: "FolderVideo", method: str, cfg):
        self.video = video
        self.method = method
        v = cfg.MODEL.VID
        self.max_offset = {"rdn": v.RDN.MAX_OFFSET, "mega": v.MEGA.MAX_OFFSET,
                           "fgfa": v.FGFA.MAX_OFFSET}.get(method, 0)
        self.global_size = v.MEGA.GLOBAL.SIZE

    def __len__(self):
        return len(self.video)

    def __getitem__(self, idx):
        return self.video.sample(idx, self.max_offset, self.global_size, self.method)

    def load_frame(self, pattern, frame):
        return self.video.load_frame(pattern, frame)

    def get_img_info(self, idx):
        return self.video.get_img_info(idx)


if __name__ == "__main__":
    main()
