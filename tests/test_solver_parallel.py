"""Solver schedule/masking and 8-device mesh train step."""

import jax
import jax.numpy as jnp
import numpy as np

from mega_pytorch_tpu.config import get_preset
from mega_pytorch_tpu.solver import (
    make_optimizer,
    param_labels,
    warmup_multistep_schedule,
)
from mega_pytorch_tpu.parallel import make_mesh, make_train_step, replicate, shard_batch


def test_warmup_multistep_schedule_values():
    s = warmup_multistep_schedule(
        0.001, (80000,), gamma=0.1, warmup_factor=1 / 3, warmup_iters=500
    )
    np.testing.assert_allclose(float(s(0)), 0.001 / 3, rtol=1e-6)
    np.testing.assert_allclose(float(s(250)), 0.001 * (1 / 3 * 0.5 + 0.5), rtol=1e-6)
    np.testing.assert_allclose(float(s(500)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(s(79999)), 0.001, rtol=1e-6)
    np.testing.assert_allclose(float(s(80000)), 0.0001, rtol=1e-6)


def test_param_labels_routing():
    params = {
        "backbone": {
            "stem": {"conv1": {"kernel": jnp.zeros(1)}},
            "layer1": {"0": {"conv1": {"kernel": jnp.zeros(1)}}},
            "layer2": {
                "0": {
                    "conv1": {"kernel": jnp.zeros(1)},
                    "bn1": {"weight": jnp.zeros(1), "running_var": jnp.zeros(1)},
                }
            },
        },
        "rpn": {"conv": {"kernel": jnp.zeros(1), "bias": jnp.zeros(1)}},
    }
    labels = param_labels(params, freeze_at=2)
    assert labels["backbone"]["stem"]["conv1"]["kernel"] == "frozen"
    assert labels["backbone"]["layer1"]["0"]["conv1"]["kernel"] == "frozen"
    assert labels["backbone"]["layer2"]["0"]["conv1"]["kernel"] == "weight"
    assert labels["backbone"]["layer2"]["0"]["bn1"]["weight"] == "frozen"
    assert labels["backbone"]["layer2"]["0"]["bn1"]["running_var"] == "frozen"
    assert labels["rpn"]["conv"]["kernel"] == "weight"
    assert labels["rpn"]["conv"]["bias"] == "bias"


def test_optimizer_bias_lr_and_frozen():
    cfg = get_preset("base_R_50")
    params = {
        "backbone": {"stem": {"conv1": {"kernel": jnp.ones(4)}}},
        "rpn": {"conv": {"kernel": jnp.ones(4), "bias": jnp.ones(4)}},
    }
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # frozen param untouched
    np.testing.assert_allclose(updates["backbone"]["stem"]["conv1"]["kernel"], 0.0)
    # warmup factor 1/3 at iter 0; bias lr x2, zero decay on bias
    base = cfg.SOLVER.BASE_LR / 3
    k = np.asarray(updates["rpn"]["conv"]["kernel"])
    b = np.asarray(updates["rpn"]["conv"]["bias"])
    np.testing.assert_allclose(
        k, -(1.0 + cfg.SOLVER.WEIGHT_DECAY) * base, rtol=1e-5
    )
    np.testing.assert_allclose(b, -2 * base, rtol=1e-5)


def test_mesh_train_step_8_devices():
    assert len(jax.devices()) == 8
    mesh = make_mesh(n_data=8)

    # trivially-shaped quadratic model to exercise sharding + grad psum
    w0 = {"w": jnp.ones((4,))}
    import optax

    tx = optax.sgd(0.1)

    def apply_fn(p, batch, rng):
        pred = batch["x"] @ p["w"]
        return {"mse": jnp.mean((pred - batch["y"]) ** 2)}

    xs = np.random.RandomState(0).randn(16, 4).astype(np.float32)
    ys = xs @ np.array([1.0, -2.0, 0.5, 3.0], np.float32)

    with mesh:
        step = make_train_step(apply_fn, tx, mesh)
        params = replicate(mesh, w0)
        opt_state = replicate(mesh, tx.init(w0))
        batch = shard_batch(mesh, {"x": jnp.asarray(xs), "y": jnp.asarray(ys)})
        prev = np.inf
        for i in range(20):
            params, opt_state, losses = step(params, opt_state, batch, jax.random.PRNGKey(i))
        final = float(losses["mse"])
    assert final < 1.0  # learned
