"""Training CLI (parity with the reference tools/train_net.py:142-226).

Usage:
  python tools/train_net.py --preset mega_R_101 [--data-dir datasets]
      [--config-file path.yaml ...] [opts KEY VALUE ...]

Presets replace the reference's {BASE_RCNN_N gpu + method yaml} stacking;
--config-file (repeatable, merged in order) also accepts reference-style
yaml stacks, e.g.
  --config-file configs/BASE_RCNN_1gpu.yaml --config-file configs/MEGA/vid_R_101_C4_MEGA_1x.yaml
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
    parser = argparse.ArgumentParser(description="TPU video detection training")
    parser.add_argument("--preset", default="base_R_50")
    parser.add_argument("--config-file", action="append", default=None)
    parser.add_argument("--data-dir", default="datasets")
    parser.add_argument("--output-dir", default="output")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    args = parser.parse_args()

    from mega_pytorch_tpu.config import get_preset
    from mega_pytorch_tpu.data.loader import TrainPreprocessor, train_batches
    from mega_pytorch_tpu.data.paths_catalog import build_dataset
    from mega_pytorch_tpu.data.samplers import training_indices
    from mega_pytorch_tpu.engine.trainer import assemble_inputs, do_train
    from mega_pytorch_tpu.models.detectors import build_detection_model
    from mega_pytorch_tpu.solver import make_optimizer
    from mega_pytorch_tpu.utils.checkpoint import Checkpointer
    from mega_pytorch_tpu.utils.logger import setup_logger

    cfg = get_preset(args.preset)
    for path in args.config_file or ():
        cfg.merge_from_file(path)
    opts = args.opts[1:] if args.opts and args.opts[0] == "opts" else args.opts
    if opts:
        cfg.merge_from_list(opts)
    cfg.OUTPUT_DIR = args.output_dir
    cfg.freeze()

    logger = setup_logger("mega_pytorch_tpu", cfg.OUTPUT_DIR)
    logger.info(f"preset={args.preset} devices={jax.devices()}")
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    with open(os.path.join(cfg.OUTPUT_DIR, "config.yml"), "w") as f:
        f.write(cfg.dump())

    method = cfg.MODEL.VID.METHOD if cfg.MODEL.VID.ENABLE else "base"
    model = build_detection_model(cfg)

    # datasets (concatenated like the reference's train tuple)
    datasets = []
    for name in cfg.DATASETS.TRAIN:
        method_kw = {}
        datasets.append(
            build_dataset(name, method=method, is_train=True, data_dir=args.data_dir, **method_kw)
        )

    class Concat:
        def __init__(self, ds_list):
            self.ds = ds_list
            self.cum = np.cumsum([len(d) for d in ds_list])

        def __len__(self):
            return int(self.cum[-1])

        def __getitem__(self, i):
            k = int(np.searchsorted(self.cum, i, side="right"))
            return self.ds[k][i - (self.cum[k - 1] if k else 0)]

        def get_img_info(self, i):
            k = int(np.searchsorted(self.cum, i, side="right"))
            return self.ds[k].get_img_info(i - (self.cum[k - 1] if k else 0))

    dataset = Concat(datasets)
    groups = [
        int(dataset.get_img_info(i)["height"] > dataset.get_img_info(i)["width"])
        for i in range(len(dataset))
    ]

    prep = TrainPreprocessor(
        min_size=cfg.INPUT.MIN_SIZE_TRAIN[0],
        max_size=cfg.INPUT.MAX_SIZE_TRAIN,
        canvas_short=cfg.TPU.CANVAS_HEIGHT,
        canvas_long=cfg.TPU.CANVAS_WIDTH,
        max_gt=cfg.TPU.MAX_GT_BOXES,
        hflip_prob=cfg.INPUT.HORIZONTAL_FLIP_PROB_TRAIN,
    )

    first = prep(dataset[0])
    inputs, gt = assemble_inputs(method, first)
    # jitted init: un-jitted flax init dispatches op-by-op (minutes over a
    # ~30ms-RTT device relay; also slow compile-per-op on CPU)
    params = jax.jit(
        lambda k1, inputs, gt, k2: model.init(k1, inputs, gt, k2, train=True)
    )(jax.random.PRNGKey(0), inputs, gt, jax.random.PRNGKey(1))["params"]

    checkpointer = Checkpointer(cfg.OUTPUT_DIR, logger)
    start_iter = 0
    if cfg.MODEL.WEIGHT and os.path.exists(cfg.MODEL.WEIGHT):
        from mega_pytorch_tpu.utils.model_ingest import load_reference_weights

        params = load_reference_weights(cfg.MODEL.WEIGHT, params, logger)
    if args.resume and checkpointer.has_checkpoint():
        payload = checkpointer.load(ignore_optimizer=cfg.MODEL.VID.IGNORE)
        params = payload.get("params", params)
        start_iter = payload.get("iteration", 0)

    optimizer = make_optimizer(cfg, params)
    opt_state = optimizer.init(params)
    if args.resume and checkpointer.has_checkpoint():
        payload = checkpointer.load(ignore_optimizer=cfg.MODEL.VID.IGNORE)
        if payload.get("opt_state") is not None:
            opt_state = jax.tree_util.tree_map(
                lambda a, b: np.asarray(b), opt_state, payload["opt_state"]
            )

    batch_size = max(cfg.SOLVER.IMS_PER_BATCH, 1)
    mesh = None
    if len(jax.devices()) > 1:
        import math

        from mega_pytorch_tpu.parallel import make_mesh

        # the sample axis shards over the data axis, so it must divide evenly
        n_data = math.gcd(batch_size, len(jax.devices()))
        if n_data > 1:
            mesh = make_mesh(n_data=n_data)
            logger.info(f"data-parallel mesh over {n_data} devices")
        else:
            logger.info("IMS_PER_BATCH=1: single-device step (no data mesh)")
    batches = train_batches(
        dataset, prep,
        training_indices(
            len(dataset), groups, batch_size,
            start_iter=start_iter, max_iter=cfg.SOLVER.MAX_ITER,
        ),
    )
    do_train(
        cfg, model, batches, params, optimizer, opt_state, checkpointer, logger,
        start_iter=start_iter, mesh=mesh,
    )


if __name__ == "__main__":
    main()
