"""Optimizer recipe tests: reference-trajectory warmup, summed accumulation,
role-dependent decay, EMA gating.

The reference trajectory simulated here is train.py:735-773: per-batch
np.interp warmup of lr/momentum/accumulate over nw = max(round(3*nb), 1000)
iterations, per-epoch LambdaLR staircase afterwards, optimizer step whenever
ni % accumulate == 0, EMA updated only on optimizer steps.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

from multispectral_object_detection_tpu.train.optim import (
    AdamState, OptHyp, SGDState, build_optimizer, ema_decay_schedule,
    ema_update, one_cycle_lf, opt_emitted, param_role, warmup_schedules,
    yolo_adam, yolo_sgd)


def _roles_tree():
    return {
        "conv": {"kernel": "kernel"},
        "bn": {"scale": "norm", "bias": "bias"},
        "head": {"bias": "bias"},
    }


def _params():
    return {
        "conv": {"kernel": jnp.ones((2, 2))},
        "bn": {"scale": jnp.ones((2,)), "bias": jnp.zeros((2,))},
        "head": {"bias": jnp.ones((2,))},
    }


def test_warmup_start_values():
    """First update (ni=0): main lr 0, bias lr warmup_bias_lr, momentum 0.8,
    and the step EMITS (reference: ni % accumulate == 0 at ni=0)."""
    hyp = OptHyp(lr0=0.01, warmup_epochs=3.0, warmup_bias_lr=0.1)
    tx = yolo_sgd(_roles_tree(), hyp, steps_per_epoch=100, epochs=300)
    params = _params()
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    assert bool(state.emitted)
    # bias step at ni 0: mom=0.8; buf = 0.8*0 + g; d = g + 0.8*buf = 1.8
    np.testing.assert_allclose(np.asarray(updates["head"]["bias"]),
                               -0.1 * 1.8, rtol=1e-5)
    # main lr is exactly 0 at the very first step
    assert abs(float(updates["bn"]["scale"][0])) < 1e-9


def _reference_trajectory(hyp, nb, epochs, total_bs, niters):
    """Host-side replay of train.py:735-744 + LambdaLR staircase."""
    nbs = 64
    nw = max(round(hyp.warmup_epochs * nb), 1000)
    lf = lambda e: ((1 + math.cos(e * math.pi / epochs)) / 2) * (1 - hyp.lrf) + hyp.lrf  # noqa: E731
    out = []
    accumulate = max(round(nbs / total_bs), 1)
    for ni in range(niters):
        epoch = ni // nb
        base = hyp.lr0 * lf(epoch)
        if ni <= nw:
            xi = [0, nw]
            accumulate = max(1, np.interp(ni, xi, [1, nbs / total_bs]).round())
            lr_main = np.interp(ni, xi, [0.0, base])
            lr_bias = np.interp(ni, xi, [hyp.warmup_bias_lr, base])
            mom = np.interp(ni, xi, [hyp.warmup_momentum, hyp.momentum])
        else:
            lr_main = lr_bias = base
            mom = hyp.momentum
        emit = ni % accumulate == 0
        out.append((lr_main, lr_bias, mom, accumulate, emit))
    return out


def test_trajectory_matches_reference():
    """lr/momentum/accumulate/emission over 3 epochs match the reference's
    per-batch host computation exactly (VERDICT round-1 item 7)."""
    hyp = OptHyp(lr0=0.01, lrf=0.2, warmup_epochs=3.0)
    nb, epochs, total_bs = 400, 3, 16
    sched = warmup_schedules(hyp, nb, epochs, total_bs)
    ref = _reference_trajectory(hyp, nb, epochs, total_bs, nb * epochs)
    nis = list(range(0, 200)) + list(range(200, nb * epochs, 37))
    for ni in nis:
        lr_m, lr_b, mom, k = jax.tree.map(
            float, sched(jnp.asarray(ni, jnp.int32)))
        r_lm, r_lb, r_mom, r_k, r_emit = ref[ni]
        assert abs(lr_m - r_lm) < 1e-7, (ni, lr_m, r_lm)
        assert abs(lr_b - r_lb) < 1e-7, (ni, lr_b, r_lb)
        assert abs(mom - r_mom) < 1e-7, (ni, mom, r_mom)
        assert int(k) == int(r_k), (ni, k, r_k)
        assert (ni % int(k) == 0) == r_emit


def test_accumulation_sum_semantics():
    """4 micro-steps at bs16 emit the SAME update as one bs64 step whose
    gradient is the 4-micro-batch sum (reference: loss*bs + torch backward
    accumulation => summed grads; ADVICE round-1 medium item)."""
    params = {"w": jnp.ones((3,))}
    roles = {"w": "norm"}  # no decay: isolates the gradient path
    hyp = OptHyp(warmup_epochs=0.0)
    g = {"w": jnp.full((3,), 0.25)}

    tx16 = yolo_sgd(roles, hyp, steps_per_epoch=10, epochs=10, accumulate=4,
                    total_batch_size=16, warmup_min_iters=0)
    s16 = tx16.init(params)
    # ni=0 emits immediately (1 micro-batch); the SECOND emission at ni=4
    # integrates the grads of ni=1..4
    upd0, s16 = tx16.update(g, s16, params)
    emitted_seq = [bool(s16.emitted)]
    for _ in range(4):
        upd16, s16 = tx16.update(g, s16, params)
        emitted_seq.append(bool(s16.emitted))
    assert emitted_seq == [True, False, False, False, True]

    tx64 = yolo_sgd(roles, hyp, steps_per_epoch=10, epochs=10, accumulate=1,
                    total_batch_size=64, warmup_min_iters=0)
    s64 = tx64.init(params)
    g4 = {"w": jnp.full((3,), 1.0)}  # the 4-micro-batch SUM
    upd64a, s64 = tx64.update(g4, s64, params)
    upd64b, s64 = tx64.update(g4, s64, params)
    # compare second emissions (same momentum-buffer history: one prior step
    # of magnitude g on tx16's path vs g4 on tx64's... so compare buffers
    # explicitly instead: replay tx64 with first step = upd0's gradient)
    tx64b = yolo_sgd(roles, hyp, steps_per_epoch=10, epochs=10, accumulate=1,
                     total_batch_size=64, warmup_min_iters=0)
    s = tx64b.init(params)
    u1, s = tx64b.update(g, s, params)      # matches tx16's ni=0 emission
    np.testing.assert_allclose(np.asarray(u1["w"]), np.asarray(upd0["w"]),
                               rtol=1e-6)
    u2, s = tx64b.update(g4, s, params)     # matches tx16's ni=4 emission
    np.testing.assert_allclose(np.asarray(u2["w"]), np.asarray(upd16["w"]),
                               rtol=1e-6)


def test_weight_decay_roles():
    """norm/bias leaves see no decay; kernel sees coupled L2; frozen never
    moves; ln_stacked decays only its scale half."""
    hyp = OptHyp(lr0=0.01, lrf=0.2, warmup_epochs=0.0, weight_decay=0.1)
    roles = {"k": "kernel", "n": "norm", "b": "bias", "f": "frozen",
             "ln": "ln_stacked"}
    params = {"k": jnp.ones((2,)), "n": jnp.ones((2,)), "b": jnp.ones((2,)),
              "f": jnp.ones((2,)), "ln": jnp.ones((4, 2, 3))}
    tx = yolo_sgd(roles, hyp, steps_per_epoch=10, epochs=10,
                  warmup_min_iters=0)
    state = tx.init(params)
    zeros = jax.tree.map(jnp.zeros_like, params)
    upd = None
    for _ in range(3):  # past the ni<=nw=1 warmup tail
        upd, state = tx.update(zeros, state, params)
    assert float(jnp.abs(upd["n"]).max()) == 0.0    # no decay
    assert float(jnp.abs(upd["b"]).max()) == 0.0    # no decay
    assert float(jnp.abs(upd["f"]).max()) == 0.0    # frozen
    assert float(jnp.abs(upd["k"]).max()) > 0.0     # decayed
    ln = np.asarray(upd["ln"])
    assert np.abs(ln[:, 0]).max() > 0.0             # scale half decayed
    assert np.abs(ln[:, 1]).max() == 0.0            # bias half not


def test_one_cycle_endpoints():
    lf = one_cycle_lf(epochs=100, lrf=0.2)
    assert abs(float(lf(jnp.float32(0.0))) - 1.0) < 1e-6
    assert abs(float(lf(jnp.float32(100.0))) - 0.2) < 1e-6


def test_param_roles():
    import jax.tree_util as jtu

    params = {
        "blocks_0": {"conv": {"kernel": np.zeros((3, 3, 4, 8))},
                     "bn": {"scale": np.zeros(8), "bias": np.zeros(8)}},
        "blocks_24": {"m0": {"bias": np.zeros(18),
                             "kernel": np.zeros((1, 1, 4, 18))}},
        "blocks_10": {"pos_emb": np.zeros((1, 128, 64)),
                      "ln1": np.zeros((8, 2, 64)),
                      "qkv_w": np.zeros((8, 64, 192)),
                      "qkv_b": np.zeros((8, 192))},
    }
    roles = jtu.tree_map_with_path(param_role, params)
    assert roles["blocks_0"]["conv"]["kernel"] == "kernel"
    assert roles["blocks_0"]["bn"]["scale"] == "norm"
    # the reference puts EVERY module bias in pg2 (train.py:550-551)
    assert roles["blocks_0"]["bn"]["bias"] == "bias"
    assert roles["blocks_24"]["m0"]["bias"] == "bias"
    # pos_emb is in NO reference param group -> frozen (common.py:565)
    assert roles["blocks_10"]["pos_emb"] == "frozen"
    assert roles["blocks_10"]["ln1"] == "ln_stacked"
    assert roles["blocks_10"]["qkv_w"] == "kernel"
    assert roles["blocks_10"]["qkv_b"] == "bias"


def test_adam_matches_torch():
    """yolo_adam reproduces torch.optim.Adam (train.py:562-565) bit-for-bit
    on a kernel (coupled-L2-decayed) and a bias (undecayed, warmup_bias_lr
    group) leaf when driven with the same per-step lr trajectory."""
    import torch

    hyp = OptHyp(lr0=0.01, lrf=0.2, momentum=0.937, weight_decay=0.05,
                 warmup_epochs=3.0, warmup_bias_lr=0.1, adam=True)
    nb, epochs, total_bs = 50, 5, 64  # accumulate = 1
    roles = {"k": "kernel", "b": "bias"}
    params = {"k": jnp.asarray([1.0, -2.0, 0.5]),
              "b": jnp.asarray([0.3, -0.7])}
    tx = yolo_adam(roles, hyp, steps_per_epoch=nb, epochs=epochs,
                   total_batch_size=total_bs, warmup_min_iters=10)
    state = tx.init(params)
    sched = warmup_schedules(hyp, nb, epochs, total_bs, warmup_min_iters=10)

    tk = torch.tensor([1.0, -2.0, 0.5], requires_grad=True)
    tb = torch.tensor([0.3, -0.7], requires_grad=True)
    wd = hyp.weight_decay * total_bs * 1 / 64.0
    topt = torch.optim.Adam(
        [{"params": [tk], "weight_decay": wd},
         {"params": [tb], "weight_decay": 0.0}],
        lr=hyp.lr0, betas=(hyp.momentum, 0.999))

    rng = np.random.default_rng(3)
    cur = params
    for ni in range(25):
        g = {"k": jnp.asarray(rng.normal(size=3), jnp.float32),
             "b": jnp.asarray(rng.normal(size=2), jnp.float32)}
        upd, state = tx.update(g, state, cur)
        cur = jax.tree.map(lambda p, u: p + u, cur, upd)

        lr_m, lr_b, _, _ = sched(jnp.asarray(ni, jnp.int32))
        topt.param_groups[0]["lr"] = float(lr_m)
        topt.param_groups[1]["lr"] = float(lr_b)
        tk.grad = torch.tensor(np.asarray(g["k"]))
        tb.grad = torch.tensor(np.asarray(g["b"]))
        topt.step()
    np.testing.assert_allclose(np.asarray(cur["k"]),
                               tk.detach().numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(cur["b"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_adam_warmup_accumulation_per_microbatch():
    """ADVICE round-2 medium: the Adam schedule must advance per MICRO-batch
    (global ni), not per emission — first step at ni=0, bias group ramping
    from warmup_bias_lr, accumulate ramp honored."""
    hyp = OptHyp(lr0=0.01, warmup_epochs=3.0, warmup_bias_lr=0.1, adam=True)
    params = {"kernel": jnp.ones((2,)), "bias": jnp.ones((2,))}
    tx, roles = build_optimizer(params, hyp, steps_per_epoch=100, epochs=300,
                                accumulate=4, total_batch_size=16)
    assert roles == {"kernel": "kernel", "bias": "bias"}
    state = tx.init(params)
    assert isinstance(state, AdamState)
    g = jax.tree.map(jnp.ones_like, params)
    upd, state = tx.update(g, state, params)
    # emission at ni=0 (reference: ni % accumulate == 0 holds at ni=0)
    assert bool(opt_emitted(state))
    assert int(state.gradient_steps) == 1
    # bias lr at ni=0 is warmup_bias_lr; Adam's first unit-grad step is
    # -lr * mhat/(sqrt(vhat)+eps) = -lr / (1+eps) ~ -lr
    np.testing.assert_allclose(np.asarray(upd["bias"]), -0.1, rtol=1e-4)
    # main lr at ni=0 is exactly 0
    assert float(jnp.abs(upd["kernel"]).max()) < 1e-9
    # warmup ramps accumulate toward 4: by ni=1000 emissions are 1-in-4,
    # NOT 1000 (per-emission-counter bug would hit 1000 emissions)
    for _ in range(999):
        _, state = tx.update(g, state, params)
    assert int(state.ni) == 1000
    assert 250 <= int(state.gradient_steps) <= 999  # ramp: between 1/4 and 1/1


def test_ema_schedule_and_update():
    # d(t) = 0.9999 * (1 - exp(-t/2000)) (torch_utils.py:283)
    assert abs(float(ema_decay_schedule(jnp.int32(0)))) < 1e-8
    d2000 = float(ema_decay_schedule(jnp.int32(2000)))
    assert abs(d2000 - 0.9999 * (1 - np.exp(-1))) < 1e-6
    ema = {"w": jnp.zeros(3)}
    new = {"w": jnp.ones(3)}
    out = ema_update(ema, new, jnp.int32(2000))
    np.testing.assert_allclose(np.asarray(out["w"]), 1 - d2000, rtol=1e-5)
    # gating: enabled=False leaves the EMA untouched
    out = ema_update(ema, new, jnp.int32(2000), enabled=jnp.asarray(False))
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0, atol=1e-9)


def test_opt_emitted():
    params = _params()
    hyp = OptHyp(warmup_epochs=0.0)
    tx, _ = build_optimizer(params, hyp, steps_per_epoch=10, epochs=10,
                            accumulate=4, total_batch_size=16,
                            warmup_min_iters=0)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    pattern = []
    for _ in range(8):
        _, state = tx.update(grads, state, params)
        pattern.append(bool(opt_emitted(state)))
    # ni%4==0 emission: ni = 0, 4 within the first 8 micro-steps
    assert pattern == [True, False, False, False, True,
                       False, False, False]
    assert isinstance(state, SGDState)
    assert int(state.gradient_steps) == 2
    assert bool(opt_emitted({}))  # non-accumulated states emit always
