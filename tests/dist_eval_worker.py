"""Worker for test_distributed.py: one rank of a 2-process sharded eval.

Runs the REAL distributed-eval path (tools/test_net.py semantics, reference
mega_core/engine/inference.py:50-69): video-boundary sharding → per-rank
streaming inference → comm.all_gather pickle merge → rank-0 evaluation.
Launched with: python dist_eval_worker.py RANK WORLD PORT DATA_ROOT OUT_PKL
"""

import os
import pickle
import sys
from pathlib import Path

rank, world = int(sys.argv[1]), int(sys.argv[2])
port, root, out = sys.argv[3], sys.argv[4], sys.argv[5]

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# mirror conftest.py's compile mode: the parent pytest process runs with
# XLA fast-compile (jax_disable_most_optimizations) by default, and the
# serial-vs-distributed box comparison is atol 1e-3 — mixing optimization
# levels between parent and workers drifts contraction order past that
if not os.environ.get("MEGA_TESTS_FULL_OPT"):
    jax.config.update("jax_disable_most_optimizations", True)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=world, process_id=rank
)

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

from mega_pytorch_tpu.utils.misc import setup_compilation_cache  # noqa: E402

setup_compilation_cache(str(REPO / ".cache" / "jax_cache"))

import numpy as np  # noqa: E402

from mega_pytorch_tpu.data.datasets.vid import VIDDataset  # noqa: E402
from mega_pytorch_tpu.data.loader import EvalPreprocessor  # noqa: E402
from mega_pytorch_tpu.data.samplers import video_shards  # noqa: E402
from mega_pytorch_tpu.engine.inference import (  # noqa: E402
    compute_on_dataset,
    evaluate_predictions,
)
from mega_pytorch_tpu.models.detectors.rcnn import GeneralizedRCNN  # noqa: E402
from mega_pytorch_tpu.utils import comm  # noqa: E402
from test_engine import TINY_C, _dataset, _prep_kwargs  # noqa: E402

assert comm.get_world_size() == world, comm.get_world_size()
assert comm.get_rank() == rank

ds = _dataset(Path(root), VIDDataset, is_train=False)
prep = EvalPreprocessor(**_prep_kwargs())
model = GeneralizedRCNN(c=TINY_C)

sample = prep(ds[0])
from mega_pytorch_tpu.structures.image_list import ImageBatch  # noqa: E402

images = ImageBatch(tensors=sample["cur"], sizes=sample["cur_size"])
params = jax.jit(lambda k, im: model.init(k, im, train=False))(
    jax.random.PRNGKey(0), images
)["params"]

starts = [i for i, f in enumerate(ds.frame_seg_id) if f == 0]
indices = video_shards(starts, len(ds), world)[rank]
assert indices, (rank, starts)
# establish the gloo context NOW, while the ranks are still aligned: the
# context's key-value rendezvous has a hard 30s timeout, and on a 1-core
# host the per-rank compile+inference skew ahead of the final all_gather
# can exceed it (observed flake) — once the context exists, later
# collectives block without that init deadline
comm.synchronize()
preds = compute_on_dataset(model, params, ds, indices, prep, "base")

gathered = comm.all_gather(preds)
loss_avg = comm.reduce_dict({"n": float(len(preds))})
comm.synchronize()

if comm.is_main_process():
    merged: dict = {}
    for p in gathered:
        merged.update(p)
    result = evaluate_predictions(ds, merged)
    with open(out, "wb") as f:
        pickle.dump(
            {
                "preds": merged,
                "result": result,
                "per_rank_sizes": [len(p) for p in gathered],
                "mean_n": loss_avg["n"],
            },
            f,
        )
print(f"rank {rank} done: {len(preds)} frames", flush=True)
