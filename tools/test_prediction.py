"""Re-evaluate saved predictions without a model
(parity with the reference tools/test_prediction.py:23-88 /
engine.inference.inference_no_model:135-160).

Usage:
  python tools/test_prediction.py --preset mega_R_101 --data-dir datasets \
      --predictions output/predictions_0.npz [more shards ...]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    from mega_pytorch_tpu.utils.misc import honor_jax_platforms_env

    honor_jax_platforms_env()
    from mega_pytorch_tpu.utils.misc import setup_compilation_cache

    setup_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="mega_R_101")
    parser.add_argument("--data-dir", default="datasets")
    parser.add_argument("--motion-iou-file", default=None)
    parser.add_argument("--predictions", nargs="+", required=True)
    args = parser.parse_args()

    from mega_pytorch_tpu.config import get_preset
    from mega_pytorch_tpu.data.paths_catalog import build_dataset
    from mega_pytorch_tpu.engine.inference import evaluate_predictions
    from mega_pytorch_tpu.utils.logger import setup_logger

    cfg = get_preset(args.preset)
    method = cfg.MODEL.VID.METHOD if cfg.MODEL.VID.ENABLE else "base"
    logger = setup_logger("mega_pytorch_tpu.rescore", None)

    dataset = build_dataset(
        cfg.DATASETS.TEST[0], method=method, is_train=False, data_dir=args.data_dir
    )

    preds: dict = {}
    for path in args.predictions:
        z = np.load(path, allow_pickle=True)
        for idx, boxes, scores, labels in z["predictions"]:
            preds[int(idx)] = {"boxes": boxes, "scores": scores, "labels": labels}
    logger.info(f"loaded {len(preds)} predictions from {len(args.predictions)} shard(s)")
    evaluate_predictions(dataset, preds, args.motion_iou_file, logger)


if __name__ == "__main__":
    main()
