"""Optimizer recipe tests: warmup interpolation, role-dependent decay, EMA."""

import jax
import jax.numpy as jnp
import numpy as np

from multispectral_object_detection_tpu.train.optim import (
    OptHyp, build_optimizer, ema_decay_schedule, ema_update, one_cycle_lf,
    param_role, yolo_sgd)


def _roles_tree():
    return {
        "conv": {"kernel": "kernel"},
        "bn": {"scale": "norm", "bias": "norm"},
        "head": {"bias": "bias"},
    }


def _params():
    return {
        "conv": {"kernel": jnp.ones((2, 2))},
        "bn": {"scale": jnp.ones((2,)), "bias": jnp.zeros((2,))},
        "head": {"bias": jnp.ones((2,))},
    }


def test_warmup_start_values():
    """First update: main lr ~ 0, bias lr ~ warmup_bias_lr, momentum 0.8."""
    hyp = OptHyp(lr0=0.01, warmup_epochs=3.0, warmup_bias_lr=0.1)
    tx = yolo_sgd(_roles_tree(), hyp, steps_per_epoch=100, epochs=300)
    params = _params()
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # bias step at count 0: buf = 0.8*0 + g; d = g + 0.8*buf = 1.8; u = -0.1*1.8
    np.testing.assert_allclose(np.asarray(updates["head"]["bias"]),
                               -0.1 * 1.8, rtol=1e-5)
    # main lr is ~0 at the very first step
    assert abs(float(updates["bn"]["scale"][0])) < 1e-6


def test_post_warmup_lr_follows_one_cycle():
    hyp = OptHyp(lr0=0.01, lrf=0.2, warmup_epochs=0.0)
    spe, epochs = 10, 100
    tx = yolo_sgd(_roles_tree(), hyp, steps_per_epoch=spe, epochs=epochs)
    params = _params()
    state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)  # isolate wd coupling
    # norm params have no weight decay: zero grad -> zero update
    for _ in range(5):
        updates, state = tx.update(grads, state, params)
    assert float(jnp.abs(updates["bn"]["scale"]).max()) == 0.0
    # kernel gets coupled L2: u = -lr * wd_eff * p * (1 + mom) at buf steady-in
    assert float(jnp.abs(updates["conv"]["kernel"]).max()) > 0.0


def test_one_cycle_endpoints():
    lf = one_cycle_lf(epochs=100, lrf=0.2)
    assert abs(float(lf(jnp.float32(0.0))) - 1.0) < 1e-6
    assert abs(float(lf(jnp.float32(100.0))) - 0.2) < 1e-6


def test_param_roles():
    import jax.tree_util as jtu

    params = {
        "blocks_0": {"conv": {"kernel": np.zeros((3, 3, 4, 8))},
                     "bn": {"scale": np.zeros(8), "bias": np.zeros(8)}},
        "blocks_24": {"m0": {"bias": np.zeros(18), "kernel": np.zeros((1, 1, 4, 18))}},
        "blocks_10": {"pos_emb": np.zeros((1, 128, 64))},
    }
    roles = jtu.tree_map_with_path(param_role, params)
    assert roles["blocks_0"]["conv"]["kernel"] == "kernel"
    assert roles["blocks_0"]["bn"]["scale"] == "norm"
    assert roles["blocks_24"]["m0"]["bias"] == "bias"
    assert roles["blocks_10"]["pos_emb"] == "norm"


def test_ema_schedule_and_update():
    # d(t) = 0.9999 * (1 - exp(-t/2000)) (torch_utils.py:283)
    assert abs(float(ema_decay_schedule(jnp.int32(0)))) < 1e-8
    d2000 = float(ema_decay_schedule(jnp.int32(2000)))
    assert abs(d2000 - 0.9999 * (1 - np.exp(-1))) < 1e-6
    ema = {"w": jnp.zeros(3)}
    new = {"w": jnp.ones(3)}
    out = ema_update(ema, new, jnp.int32(2000))
    np.testing.assert_allclose(np.asarray(out["w"]), 1 - d2000, rtol=1e-5)


def test_multisteps_accumulation():
    """accumulate>1 wraps in MultiSteps: params move once per k micro-steps."""
    params = _params()
    hyp = OptHyp(lr0=0.01, warmup_epochs=0.0)
    tx, _ = build_optimizer(params, hyp, steps_per_epoch=10, epochs=10,
                            accumulate=4, total_batch_size=16)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    moved = []
    for _ in range(4):
        updates, state = tx.update(grads, state, params)
        moved.append(float(jnp.abs(updates["head"]["bias"]).max()) > 0)
    assert moved == [False, False, False, True]
