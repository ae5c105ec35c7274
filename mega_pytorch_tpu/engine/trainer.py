"""Training loop.

Parity with mega_core/engine/trainer.py:43-196: iteration-based (not epochs),
per-method batch plumbing, summed loss, SGD step with warmup-multistep LR,
window-smoothed metric logging with ETA, periodic checkpointing with resume.

TPU shape: one jitted train step; samples are vmapped over a leading sample
axis and sharded over the mesh `data` axis (the reference's 1-image-per-GPU
DDP becomes 1-sample-per-device pjit).
"""

from __future__ import annotations

import datetime
import time
from typing import Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ..structures.image_list import ImageBatch
from ..utils.checkpoint import Checkpointer
from ..utils.logger import MetricLogger


def assemble_inputs(method: str, sample: dict):
    """One preprocessed sample dict → (model_inputs, gt) for the method."""
    gt = sample["gt"]
    if method == "base":
        images = ImageBatch(tensors=sample["cur"], sizes=sample["cur_size"])
        return images, gt
    if method in ("dff", "fgfa", "rdn"):
        frames = np.concatenate([sample["cur"], sample["ref"]], axis=0)
        sizes = np.concatenate([sample["cur_size"], sample["ref_size"]], axis=0)
        return ImageBatch(tensors=frames, sizes=sizes), gt
    if method == "mega":
        local = ImageBatch(
            tensors=np.concatenate([sample["cur"], sample["ref_l"]], axis=0),
            sizes=np.concatenate([sample["cur_size"], sample["ref_l_size"]], axis=0),
        )
        memory = ImageBatch(tensors=sample["ref_m"], sizes=sample["ref_m_size"])
        glob = ImageBatch(tensors=sample["ref_g"], sizes=sample["ref_g_size"])
        return {"local": local, "memory": memory, "global": glob}, gt
    raise ValueError(method)


def make_train_step(model, optimizer, num_samples: int = 1, mesh=None):
    """Jitted step over a stacked batch of `num_samples` samples.

    With a mesh, the sample axis is sharded over the mesh `data` axis and
    params/opt-state are replicated — the reference's 1-image-per-GPU DDP
    becomes samples-per-device pjit with an implicit ICI grad all-reduce."""

    def sample_loss(params, inputs, gt, rng):
        losses = model.apply({"params": params}, inputs, gt, rng, train=True)
        return losses

    def step(params, opt_state, inputs, gt, rng):
        def loss_fn(p):
            if num_samples == 1:
                one = jax.tree_util.tree_map(lambda x: x[0], (inputs, gt))
                losses = sample_loss(p, one[0], one[1], rng)
            else:
                rngs = jax.random.split(rng, num_samples)
                losses = jax.vmap(lambda i, g, r: sample_loss(p, i, g, r), in_axes=(0, 0, 0))(
                    inputs, gt, rngs
                )
                losses = jax.tree_util.tree_map(lambda x: x.mean(), losses)
            return sum(losses.values()), losses

        (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: (p + u).astype(p.dtype), params, updates)
        return params, opt_state, losses

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))

    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P("data"))
    return jax.jit(
        step,
        in_shardings=(rep, rep, shard, shard, rep),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0, 1),
    )


def do_train(
    cfg,
    model,
    batches: Iterator[list[dict]],
    params,
    optimizer,
    opt_state,
    checkpointer: Checkpointer,
    logger,
    start_iter: int = 0,
    rng: jax.Array | None = None,
    log_period: int = 20,
    mesh=None,
    validation_hook=None,
):
    """Run the iteration loop. `batches` yields lists of preprocessed samples
    (len == per-host batch size)."""
    method = cfg.MODEL.VID.METHOD if cfg.MODEL.VID.ENABLE else "base"
    max_iter = cfg.SOLVER.MAX_ITER
    ckpt_period = cfg.SOLVER.CHECKPOINT_PERIOD
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    meters = MetricLogger()
    step_fn = None
    start_time = time.time()
    last = time.time()
    iteration = start_iter

    for samples in batches:
        iteration += 1
        data_time = time.time() - last

        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *[assemble_inputs(method, s) for s in samples]
        )
        inputs, gt = stacked
        if step_fn is None:
            step_fn = make_train_step(
                model, optimizer, num_samples=len(samples), mesh=mesh
            )
            if mesh is not None:
                from ..parallel.mesh import replicate

                params = replicate(mesh, params)
                opt_state = replicate(mesh, opt_state)

        rng, sub = jax.random.split(rng)
        params, opt_state, losses = step_fn(params, opt_state, inputs, gt, sub)

        losses = {k: float(v) for k, v in losses.items()}
        batch_time = time.time() - last
        last = time.time()
        meters.update(loss=sum(losses.values()), **losses)
        meters.update(time=batch_time, data=data_time)

        if iteration % log_period == 0 or iteration == max_iter:
            eta = meters.meters["time"].global_avg * (max_iter - iteration)
            from ..utils.profiler import device_memory_stats

            mem = device_memory_stats().get("peak_bytes_in_use", 0)
            logger.info(
                f"eta: {datetime.timedelta(seconds=int(eta))}  iter: {iteration}  "
                f"{meters}  max mem: {mem / 2**20:.0f}MB"
            )
        if iteration % ckpt_period == 0:
            checkpointer.save(f"model_{iteration:07d}", params, opt_state, iteration)
        # periodic validation (engine/trainer.py:140-180 TEST_PERIOD analog)
        if (
            validation_hook is not None
            and cfg.SOLVER.TEST_PERIOD > 0
            and iteration % cfg.SOLVER.TEST_PERIOD == 0
        ):
            logger.info(f"running validation at iter {iteration}")
            validation_hook(params, iteration)
        if iteration >= max_iter:
            break

    checkpointer.save("model_final", params, opt_state, iteration)
    total = time.time() - start_time
    done = max(iteration - start_iter, 1)
    logger.info(
        f"Total training time: {datetime.timedelta(seconds=int(total))} "
        f"({total / done:.4f} s / it)"
    )
    return params, opt_state
