"""Multi-host communication helpers.

Parity with mega_core/utils/comm.py:13-117 (get_world_size/get_rank/
is_main_process/synchronize/all_gather/reduce_dict), rebuilt on jax process
APIs: the reference pickles python objects over NCCL byte tensors; here
host-side python objects ride `multihost_utils.process_allgather` on padded
arrays, and device reductions are plain `jax.device_get(psum)` results —
no rendezvous/launcher plumbing (jax.distributed owns that).
"""

from __future__ import annotations

import pickle
from typing import Any

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across hosts (comm.py `synchronize`)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mega_pytorch_tpu_sync")


def all_gather(data: Any) -> list[Any]:
    """Gather arbitrary picklable data from every host (comm.py:47-87).

    The reference's pickle-over-CUDA-tensor hack becomes pickle over a padded
    uint8 array through process_allgather."""
    world = jax.process_count()
    if world == 1:
        return [data]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(data), np.uint8)
    local_size = np.array([payload.size], np.int64)
    sizes = multihost_utils.process_allgather(local_size).reshape(-1)
    max_size = int(sizes.max())
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(world)
    ]


def reduce_dict(input_dict: dict, average: bool = True) -> dict:
    """Cross-host mean/sum of a dict of scalars (comm.py reduce_dict —
    display-only in the reference trainer)."""
    world = jax.process_count()
    if world == 1:
        return {k: float(v) for k, v in input_dict.items()}
    gathered = all_gather({k: float(v) for k, v in input_dict.items()})
    out = {}
    for k in input_dict:
        vals = [g[k] for g in gathered]
        out[k] = sum(vals) / world if average else sum(vals)
    return out
