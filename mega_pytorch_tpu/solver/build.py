"""Optimizer + LR schedule.

Parity with mega_core/solver/build.py:7-31 and lr_scheduler.py:11-52:
SGD momentum 0.9 with torch update order (decay folded into the gradient
before momentum), per-param rules — biases get lr x BIAS_LR_FACTOR and
WEIGHT_DECAY_BIAS — and a WarmupMultiStepLR schedule (linear/constant warmup,
gamma decay at milestones).

Additions the reference handles via requires_grad: parameters are excluded
from the optimizer when they are (a) FrozenBatchNorm tensors (buffers in
torch) or (b) inside backbone stages below FREEZE_CONV_BODY_AT
(resnet.py:134-143, solver/build.py:11 `if not value.requires_grad: continue`).
"""

from __future__ import annotations

import bisect
from typing import Any

import jax.numpy as jnp
import jax.tree_util as jtu
import optax

_FBN_LEAVES = {"weight", "bias", "running_mean", "running_var"}


def _is_frozen_bn(path) -> bool:
    if len(path) < 2:
        return False
    mod = path[-2]
    return (mod.startswith("bn") or mod.endswith("_bn")) and path[-1] in _FBN_LEAVES


def _is_frozen_stage(path, freeze_at: int) -> bool:
    if "backbone" not in path:
        return False
    i = path.index("backbone")
    if i + 1 >= len(path):
        return False
    stage = path[i + 1]
    if stage == "stem":
        return freeze_at >= 1
    if stage.startswith("layer"):
        return freeze_at >= int(stage[5:]) + 1
    return False


def param_labels(params: dict, freeze_at: int = 2) -> Any:
    """Label tree: 'frozen' | 'bias' | 'weight' for multi_transform routing."""

    def label(key_path, _):
        path = tuple(
            k.key if hasattr(k, "key") else str(k) for k in key_path
        )
        if _is_frozen_bn(path) or _is_frozen_stage(path, freeze_at):
            return "frozen"
        return "bias" if path[-1] == "bias" else "weight"

    return jtu.tree_map_with_path(label, params)


def warmup_multistep_schedule(
    base_lr: float,
    steps: tuple,
    gamma: float = 0.1,
    warmup_factor: float = 1.0 / 3,
    warmup_iters: int = 500,
    warmup_method: str = "linear",
):
    """lr(it) = base * warmup(it) * gamma^(#milestones passed)  (lr_scheduler.py:36-52)."""
    milestones = jnp.asarray(sorted(steps), jnp.int32)

    def schedule(count):
        it = jnp.asarray(count, jnp.float32)
        if warmup_method == "constant":
            wf = warmup_factor
        else:
            alpha = it / max(warmup_iters, 1)
            wf = warmup_factor * (1.0 - alpha) + alpha
        warm = jnp.where(it < warmup_iters, wf, 1.0)
        decay = gamma ** (it >= milestones.astype(jnp.float32)).sum()
        return base_lr * warm * decay

    return schedule


def make_optimizer(cfg, params: dict) -> optax.GradientTransformation:
    """SGD with the reference's per-param lr/decay rules and frozen masking."""
    sched = warmup_multistep_schedule(
        cfg.SOLVER.BASE_LR,
        cfg.SOLVER.STEPS,
        cfg.SOLVER.GAMMA,
        cfg.SOLVER.WARMUP_FACTOR,
        cfg.SOLVER.WARMUP_ITERS,
        cfg.SOLVER.WARMUP_METHOD,
    )
    bias_factor = float(cfg.SOLVER.BIAS_LR_FACTOR)

    def sgd(weight_decay: float, lr_scale: float):
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
            optax.trace(decay=cfg.SOLVER.MOMENTUM, nesterov=False),
            optax.scale_by_schedule(lambda c: -lr_scale * sched(c)),
        )

    labels = param_labels(params, cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT)
    return optax.multi_transform(
        {
            "weight": sgd(cfg.SOLVER.WEIGHT_DECAY, 1.0),
            "bias": sgd(cfg.SOLVER.WEIGHT_DECAY_BIAS, bias_factor),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
