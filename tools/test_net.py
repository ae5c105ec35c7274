"""Evaluation CLI (parity with the reference tools/test_net.py:28-134).

Runs streaming inference over VID val with video-boundary sharding and the
motion-IoU evaluator; saves predictions.npz + result.txt.
"""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np


def main():
    from mega_pytorch_tpu.utils.misc import honor_jax_platforms_env

    honor_jax_platforms_env()
    from mega_pytorch_tpu.utils.misc import setup_compilation_cache

    setup_compilation_cache()
    parser = argparse.ArgumentParser(description="TPU video detection eval")
    parser.add_argument("--preset", default="mega_R_101")
    parser.add_argument("--config-file", action="append", default=None)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--data-dir", default="datasets")
    parser.add_argument("--output-dir", default="output")
    parser.add_argument("--motion-iou-file", default=None)
    parser.add_argument(
        "--box-only", action="store_true",
        help="score class-agnostic proposal recall instead of AP",
    )
    parser.add_argument(
        "--lanes", type=int, default=12,
        help="parallel video lanes for lockstep streaming "
        "(12 = measured v5e optimum, see MFU.md)",
    )
    parser.add_argument("--shard", type=int, default=0)
    parser.add_argument("--num-shards", type=int, default=1)
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    from mega_pytorch_tpu.config import get_preset
    from mega_pytorch_tpu.data.loader import EvalPreprocessor
    from mega_pytorch_tpu.data.paths_catalog import build_dataset
    from mega_pytorch_tpu.data.samplers import video_shards
    from mega_pytorch_tpu.engine.inference import (
        compute_on_dataset,
        evaluate_predictions,
    )
    from mega_pytorch_tpu.models.detectors import build_detection_model
    from mega_pytorch_tpu.utils.checkpoint import Checkpointer
    from mega_pytorch_tpu.utils.logger import setup_logger

    cfg = get_preset(args.preset)
    for path in args.config_file or ():
        cfg.merge_from_file(path)
    opts = args.opts[1:] if args.opts and args.opts[0] == "opts" else args.opts
    if opts:
        cfg.merge_from_list(opts)
    cfg.freeze()

    logger = setup_logger("mega_pytorch_tpu.eval", args.output_dir)
    method = cfg.MODEL.VID.METHOD if cfg.MODEL.VID.ENABLE else "base"
    model = build_detection_model(cfg)

    name = cfg.DATASETS.TEST[0]
    dataset = build_dataset(name, method=method, is_train=False, data_dir=args.data_dir)

    prep = EvalPreprocessor(
        min_size=cfg.INPUT.MIN_SIZE_TEST,
        max_size=cfg.INPUT.MAX_SIZE_TEST,
        canvas_short=cfg.TPU.CANVAS_HEIGHT,
        canvas_long=cfg.TPU.CANVAS_WIDTH,
        max_gt=cfg.TPU.MAX_GT_BOXES,
    )

    # params: from checkpoint or reference weights
    from mega_pytorch_tpu.utils.model_ingest import init_inference_params

    params = init_inference_params(model, method, prep, dataset, logger)
    if args.checkpoint:
        ckpt = Checkpointer(os.path.dirname(args.checkpoint) or ".", logger)
        payload = ckpt.load(args.checkpoint)
        if "params" in payload:
            params = payload["params"]
    elif cfg.MODEL.WEIGHT and os.path.exists(cfg.MODEL.WEIGHT):
        from mega_pytorch_tpu.utils.model_ingest import load_reference_weights

        params = load_reference_weights(cfg.MODEL.WEIGHT, params, logger)

    if hasattr(dataset, "start_index"):
        starts = dataset.start_index
    else:
        starts = [0]
    indices = video_shards(starts, len(dataset), args.num_shards)[args.shard]
    logger.info(f"shard {args.shard}/{args.num_shards}: {len(indices)} frames")

    if cfg.TEST.BBOX_AUG.ENABLED:
        # multi-scale + flip TTA (image methods only, like the reference's
        # bbox-aug path in tools/test_net.py via engine/bbox_aug.py)
        assert method == "base", "BBOX_AUG is single-frame only"
        from mega_pytorch_tpu.engine.bbox_aug import im_detect_bbox_aug

        preds = {}
        for n, i in enumerate(indices):
            preds[i] = im_detect_bbox_aug(
                model, params, dataset.load_image(i),
                scales=(cfg.INPUT.MIN_SIZE_TEST,) + tuple(cfg.TEST.BBOX_AUG.SCALES),
                max_size=cfg.TEST.BBOX_AUG.MAX_SIZE,
                canvas_short=cfg.TPU.CANVAS_HEIGHT,
                canvas_long=cfg.TPU.CANVAS_WIDTH,
                hflip=cfg.TEST.BBOX_AUG.H_FLIP,
                scale_hflip=cfg.TEST.BBOX_AUG.SCALE_H_FLIP,
                nms_thresh=cfg.MODEL.ROI_HEADS.NMS,
                detections_per_img=cfg.TEST.DETECTIONS_PER_IMG,
            )
            if logger and n % 100 == 0:
                logger.info(f"bbox-aug {n}/{len(indices)}")
    else:
        preds = compute_on_dataset(
            model, params, dataset, indices, prep, method, logger,
            lanes=args.lanes,
        )

    os.makedirs(args.output_dir, exist_ok=True)
    np.savez_compressed(
        os.path.join(args.output_dir, f"predictions_{args.shard}.npz"),
        predictions=np.asarray(
            [(k, v["boxes"], v["scores"], v["labels"]) for k, v in preds.items()],
            dtype=object,
        ),
    )
    if args.num_shards == 1:
        result = evaluate_predictions(
            dataset, preds, args.motion_iou_file, logger, box_only=args.box_only
        )
        write_result(result, args.output_dir, box_only=args.box_only)


def write_result(result: dict, output_dir: str, box_only: bool = False) -> None:
    """Serialize an evaluation result, whatever its family shape.

    Four shapes reach here (data/evaluation/__init__.py): VID nested
    {bucket: {'map': float, 'ap': ndarray}}, COCO {'AP': float, ...},
    VOC {'map': float, 'ap': ndarray}, box_only {'recall': float,
    'gt_overlaps': ndarray, ...}. result.txt gets human-readable summary
    lines; result.json gets the full dict with ndarrays as lists (the
    reference writes bucket lines only, vid_eval.py:64-67).
    """
    import json

    lines = []
    if box_only:
        lines.append(f"Proposal recall = {float(result['recall']):.4f}")
    elif result and all(isinstance(v, dict) for v in result.values()):
        for mname, r in result.items():  # VID motion buckets
            lines.append(f"AP50 | motion={mname:>6s} = {float(r['map']):.4f}")
    else:
        for key in ("AP", "AP50", "AP75", "APs", "APm", "APl", "map"):
            if key in result and np.isscalar(result[key]):
                lines.append(f"{key} = {float(result[key]):.4f}")

    def _to_jsonable(obj):
        if isinstance(obj, dict):
            return {k: _to_jsonable(v) for k, v in obj.items()}
        if isinstance(obj, np.ndarray):
            return obj.tolist()
        if isinstance(obj, (np.floating, np.integer)):
            return obj.item()
        return obj

    with open(os.path.join(output_dir, "result.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(output_dir, "result.json"), "w") as f:
        json.dump(_to_jsonable(result), f, indent=1)


if __name__ == "__main__":
    main()
