"""Device mesh + sharded train/eval steps.

The reference's distribution story is pure data parallelism over NCCL DDP
(tools/train_net.py:52-57, utils/comm.py) with 1 image per GPU. TPU-native
equivalent (SURVEY.md §2.11): one `jax.sharding.Mesh`, batch sharded over the
`data` axis, parameters replicated; XLA inserts the gradient all-reduce over
ICI — there is no NCCL/MPI port.

`shard_batch` maps any pytree whose leaves have a leading batch dim onto the
mesh; `replicate` pins params/opt-state everywhere. A `model` axis is carried
for future tensor-parallel experiments (unused by the reference's models,
whose largest matmuls are modest).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    if len(devices) < n_data * n_model:
        raise ValueError(
            f"mesh wants {n_data}x{n_model} devices but the backend exposes "
            f"{len(devices)} ({jax.default_backend()}); on a single-chip host "
            "run under XLA_FLAGS=--xla_force_host_platform_device_count=N with "
            "the cpu platform (see tests/conftest.py / __graft_entry__.py)"
        )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host pytree with leading batch dims onto the data axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def make_train_step(model_apply, optimizer, mesh: Mesh):
    """Build a pjit'd train step: batch sharded over `data`, params replicated.

    model_apply(params, batch, rng) must return a dict of scalar losses
    (summed for the update, reported individually like engine/trainer.py:97-116).
    """

    @partial(
        jax.jit,
        in_shardings=(
            replicated(mesh),
            replicated(mesh),
            batch_sharding(mesh),
            replicated(mesh),
        ),
        out_shardings=(replicated(mesh), replicated(mesh), replicated(mesh)),
        donate_argnums=(0, 1),
    )
    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            losses = model_apply(p, batch, rng)
            return sum(losses.values()), losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), params, updates
        )
        return params, opt_state, losses

    return train_step
