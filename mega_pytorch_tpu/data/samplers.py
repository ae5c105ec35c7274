"""Index samplers for training and distributed evaluation.

Parity with mega_core/data/samplers/:
  * IterationBasedBatchSampler (iteration_based_batch_sampler.py:5-32) — an
    infinite, shuffled, iteration-counted stream (training is iteration-based,
    not epoch-based; resume continues mid-epoch).
  * GroupedBatchSampler (grouped_batch_sampler.py) — batches never mix aspect
    groups (here: orientation, since each orientation has its own canvas).
  * VIDTestDistributedSampler (distributed.py:70-115) — eval sharding that
    splits at video boundaries so each host owns whole videos (required by
    the stateful streaming carries).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np


def training_indices(
    dataset_len: int,
    group_ids: Sequence[int],
    batch_size: int,
    start_iter: int = 0,
    max_iter: int = 10**9,
    seed: int = 0,
    shard: int = 0,
    num_shards: int = 1,
) -> Iterator[list[int]]:
    """Infinite grouped batches: per-epoch shuffle, group by aspect id, chunk
    into batches, skip to start_iter (per-shard round-robin split)."""
    group_ids = np.asarray(group_ids)
    it = 0
    epoch = 0
    while it < max_iter:
        rng = np.random.RandomState(seed + epoch)
        order = rng.permutation(dataset_len)
        # stable-partition the shuffled order by group, then emit batches
        batches: list[list[int]] = []
        for g in np.unique(group_ids):
            members = order[group_ids[order] == g]
            for i in range(0, len(members) - batch_size + 1, batch_size):
                batches.append(members[i : i + batch_size].tolist())
        rng.shuffle(batches)
        for i, b in enumerate(batches):
            if i % num_shards != shard:
                continue
            if it >= start_iter:
                yield b
            it += 1
            if it >= max_iter:
                return
        epoch += 1


def video_shards(start_indices: Sequence[int], total: int, num_shards: int) -> list[list[int]]:
    """Split [0, total) at video boundaries into num_shards contiguous chunks.

    start_indices: dataset indices where a new video begins (frame_id == 0),
    ascending, starting with 0. Mirrors VIDTestDistributedSampler's
    `find_zero` logic: each shard's range is snapped forward to the next
    video start so no video straddles two shards."""
    starts = list(start_indices)
    assert starts and starts[0] == 0

    def snap(pos: int) -> int:
        for s in starts:
            if s >= pos:
                return s
        return total

    per = -(-total // num_shards)
    bounds = [snap(min(i * per, total)) for i in range(num_shards)] + [total]
    return [list(range(bounds[i], bounds[i + 1])) for i in range(num_shards)]
