"""Optimizer, LR schedule and EMA — the reference training recipe, optax-style.

Reference recipe (train.py:541-577, 735-744, 766-773):
- nominal batch 64; gradient accumulation `max(round(64/bs), 1)` with
  gradients SUMMED across micro-batches (torch .backward() accumulates into
  .grad; the loss is already scaled by the micro-batch size, loss.py:161);
- weight decay scaled by `bs * accumulate / 64` (train.py:546);
- SGD(momentum=0.937, nesterov) with THREE groups (train.py:548-560):
  pg0 = BatchNorm weights (no decay), pg1 = every other module `.weight`
  (decayed — note this INCLUDES LayerNorm scales), pg2 = every module
  `.bias` (no decay, high warmup LR). Plain nn.Parameter attributes such as
  the CFT `pos_emb` land in NO group and are therefore never optimized —
  they stay at their zero init in the published models (common.py:565);
- one-cycle cosine LR `((1+cos(pi*e/E))/2)*(1-lrf)+lrf` stepped ONCE PER
  EPOCH (LambdaLR, train.py:799 — a staircase in the batch index), with
  `nw = max(round(warmup_epochs*nb), 1000)` warmup iterations during which
  lr/momentum are interpolated PER BATCH from (0 | warmup_bias_lr,
  warmup_momentum) and `accumulate` itself ramps 1 -> 64/bs
  (train.py:735-744);
- the optimizer steps whenever `ni % accumulate == 0` (train.py:768) where
  `ni` is the global batch index;
- EMA of params AND buffers with decay `0.9999*(1-exp(-t/2000))`, updated
  only when the optimizer actually steps (train.py:768-773,
  utils/torch_utils.py:269-303).

Design: one custom optax GradientTransformation implementing torch-coupled
SGD with per-leaf role masks and INTERNAL summed accumulation, driven by the
micro-batch counter `ni` so warmup/accumulate ramping happen per-batch
inside jit exactly as the reference does per-batch on host. The state
exposes `emitted` so the train step can gate EMA updates on real optimizer
steps (see `opt_emitted`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptHyp:
    """Optimizer keys of hyp.scratch.yaml."""

    lr0: float = 0.01
    lrf: float = 0.2
    momentum: float = 0.937
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    adam: bool = False


def param_role(path: tuple, leaf) -> str:
    """Classify a parameter: 'bias' | 'norm' | 'kernel' | 'ln_stacked' |
    'frozen', mirroring the reference's three param groups (train.py:548-560):

    - 'bias'       -> pg2: no decay, warmup_bias_lr ramp. Covers conv/dense
                      biases AND BatchNorm/LayerNorm biases (the reference
                      appends every module `.bias` to pg2) and the CFT's
                      stacked per-layer bias leaves (qkv_b/proj_b/fc1_b/fc2_b).
    - 'norm'       -> pg0: BN scale, no decay, main lr.
    - 'kernel'     -> pg1: decayed, main lr.
    - 'ln_stacked' -> a stacked LayerNorm leaf with a trailing (2, C) layout
                      [scale, bias]: the scale half follows pg1 (decayed —
                      the reference decays LayerNorm weights), the bias half
                      follows pg2.
    - 'frozen'     -> never updated. The reference's plain nn.Parameter
                      attributes (GPT.pos_emb, common.py:565) are in NO
                      param group and are never optimized; pos_emb stays at
                      its zeros init in the published checkpoints.
    """
    keys = [str(getattr(k, "key", getattr(k, "name", str(k)))) for k in path]
    name = keys[-1] if keys else ""
    if name in ("pos_emb", "in_proj_w", "in_proj_b"):
        # plain nn.Parameter attributes (GPT.pos_emb, MultiheadAttention
        # in_proj_weight/bias) are in NO reference param group -> untrained
        return "frozen"
    if name == "bias" or name.endswith("_b"):
        return "bias"
    if name == "scale":
        return "norm"
    if name.startswith("ln"):  # ln1 / ln2 / ln_f stacked (…, 2, C) leaves
        return "ln_stacked"
    return "kernel"


def one_cycle_lf(epochs: int, lrf: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Cosine one-cycle factor (utils/general.py:220)."""

    def lf(e):
        return ((1.0 + jnp.cos(e * math.pi / epochs)) / 2.0) * (1.0 - lrf) + lrf

    return lf


def linear_lf(epochs: int, lrf: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def lf(e):
        return (1.0 - e / (epochs - 1)) * (1.0 - lrf) + lrf

    return lf


class SGDState(NamedTuple):
    momentum_buf: Any
    acc_grad: Any              # summed micro-batch gradients since last step
    ni: jnp.ndarray            # global micro-batch counter (train.py:714)
    gradient_steps: jnp.ndarray  # number of real optimizer steps taken
    emitted: jnp.ndarray       # did the LAST update() emit a real step


def warmup_schedules(hyp: OptHyp, steps_per_epoch: int, epochs: int,
                     total_batch_size: int, linear_lr: bool = False,
                     warmup_min_iters: int = 1000):
    """Returns `sched(ni) -> (lr_main, lr_bias, momentum, accumulate)`.

    Reproduces the reference per-batch trajectory exactly (train.py:735-744):
    during warmup (`ni <= nw`, nw = max(round(warmup_epochs*nb), 1000)) every
    quantity is np.interp'd in the batch index; afterwards lr follows the
    per-EPOCH LambdaLR staircase `lr0 * lf(epoch)`.
    """
    nw = max(round(hyp.warmup_epochs * steps_per_epoch), warmup_min_iters)
    nw = max(nw, 1)
    ratio = 64.0 / float(total_batch_size)  # accumulate ramp target
    lf = (linear_lf if linear_lr else one_cycle_lf)(epochs, hyp.lrf)

    def sched(ni):
        nif = ni.astype(jnp.float32)
        epoch = (ni // steps_per_epoch).astype(jnp.float32)  # LambdaLR staircase
        base = hyp.lr0 * lf(epoch)
        frac = jnp.clip(nif / nw, 0.0, 1.0)
        in_warm = nif <= nw
        lr_main = jnp.where(in_warm, frac * base, base)
        lr_bias = jnp.where(
            in_warm, hyp.warmup_bias_lr + frac * (base - hyp.warmup_bias_lr),
            base)
        mom = jnp.where(
            in_warm,
            hyp.warmup_momentum + frac * (hyp.momentum - hyp.warmup_momentum),
            hyp.momentum)
        k = jnp.where(in_warm,
                      jnp.maximum(1.0, jnp.round(1.0 + frac * (ratio - 1.0))),
                      jnp.maximum(1.0, jnp.round(ratio))).astype(jnp.int32)
        return lr_main, lr_bias, mom, k

    return sched


def yolo_sgd(params_roles, hyp: OptHyp, steps_per_epoch: int, epochs: int,
             accumulate: int = 1, total_batch_size: int = 64,
             linear_lr: bool = False,
             warmup_min_iters: int = 1000) -> optax.GradientTransformation:
    """Torch-coupled SGD + nesterov + per-role warmup + summed accumulation.

    One `update()` call = ONE micro-batch (gradients of the bs-scaled loss).
    Gradients are SUMMED into `acc_grad`; a real parameter step is emitted
    whenever `ni % accumulate == 0` with the (warmup-ramped) accumulate of
    that batch — bitwise the reference control flow (train.py:735-773).

    params_roles: pytree of role strings (same structure as params).
    `accumulate` is the NOMINAL max(round(64/bs), 1) — used only for the
    weight-decay scale; the live value is ramped by the schedule.
    """
    nbs = 64.0
    wd = hyp.weight_decay * total_batch_size * accumulate / nbs  # train.py:546
    sched = warmup_schedules(hyp, steps_per_epoch, epochs, total_batch_size,
                             linear_lr, warmup_min_iters)

    # stacked-LN leaves: trailing (2, C) = [scale, bias]
    _ln_decay = jnp.asarray([1.0, 0.0]).reshape(2, 1)

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return SGDState(momentum_buf=zeros,
                        acc_grad=jax.tree.map(jnp.zeros_like, params),
                        ni=jnp.zeros((), jnp.int32),
                        gradient_steps=jnp.zeros((), jnp.int32),
                        emitted=jnp.asarray(False))

    def update(grads, state, params=None):
        lr_main, lr_bias, mom, k = sched(state.ni)
        emit = (state.ni % k) == 0
        acc = jax.tree.map(jnp.add, state.acc_grad, grads)

        def one(role, g, buf, p):
            if role == "frozen":
                return (jnp.zeros_like(p), buf)
            if role == "kernel":
                eff = g + wd * p
                lr = lr_main
            elif role == "ln_stacked":
                eff = g + wd * _ln_decay * p
                lr = jnp.stack([lr_main, lr_bias]).reshape(2, 1)
            elif role == "bias":
                eff = g
                lr = lr_bias
            else:  # norm
                eff = g
                lr = lr_main
            new_buf = mom * buf + eff
            d = eff + mom * new_buf  # nesterov
            u = -lr * d
            return (jnp.where(emit, u, jnp.zeros_like(u)),
                    jnp.where(emit, new_buf, buf))

        pairs = jax.tree.map(one, params_roles, acc, state.momentum_buf,
                             params)
        is_pair = lambda x: isinstance(x, tuple) and len(x) == 2 and not isinstance(x[0], tuple)  # noqa: E731
        updates = jax.tree.map(lambda pr: pr[0], pairs, is_leaf=is_pair)
        bufs = jax.tree.map(lambda pr: pr[1], pairs, is_leaf=is_pair)
        acc_next = jax.tree.map(
            lambda a: jnp.where(emit, jnp.zeros_like(a), a), acc)
        return updates, SGDState(
            momentum_buf=bufs, acc_grad=acc_next, ni=state.ni + 1,
            gradient_steps=state.gradient_steps + emit.astype(jnp.int32),
            emitted=emit)

    return optax.GradientTransformation(init, update)


class AdamState(NamedTuple):
    mu: Any                    # first-moment estimates
    nu: Any                    # second-moment estimates
    acc_grad: Any              # summed micro-batch gradients since last step
    ni: jnp.ndarray            # global micro-batch counter (train.py:714)
    gradient_steps: jnp.ndarray  # number of real optimizer steps taken
    emitted: jnp.ndarray       # did the LAST update() emit a real step


def yolo_adam(params_roles, hyp: OptHyp, steps_per_epoch: int, epochs: int,
              accumulate: int = 1, total_batch_size: int = 64,
              linear_lr: bool = False, warmup_min_iters: int = 1000,
              b2: float = 0.999,
              eps: float = 1e-8) -> optax.GradientTransformation:
    """Torch-coupled Adam (train.py:562-565: Adam(lr0, betas=(momentum,
    0.999)) over the same three param groups) with the same micro-batch
    counter `ni` driving warmup / the per-epoch LR staircase / summed
    accumulation as `yolo_sgd`.

    Reference per-batch behavior it reproduces (train.py:735-773):
    - lr warmup is np.interp'd in the GLOBAL batch index ni, including the
      pg2 warmup_bias_lr ramp; afterwards lr = lr0 * lf(epoch) staircase;
    - torch Adam param groups carry no 'momentum' key, so the momentum
      warmup (train.py:743-744, guarded on `'momentum' in x`) does NOT
      apply — betas stay fixed;
    - the accumulate ramp applies (it lives outside the optimizer);
    - weight decay is COUPLED L2 on pg1 only (torch.optim.Adam adds
      wd * p to the gradient before the moment updates);
    - bias correction uses the per-group step count = number of real
      optimizer steps taken.
    """
    nbs = 64.0
    wd = hyp.weight_decay * total_batch_size * accumulate / nbs  # train.py:546
    b1 = hyp.momentum
    sched = warmup_schedules(hyp, steps_per_epoch, epochs, total_batch_size,
                             linear_lr, warmup_min_iters)

    _ln_decay = jnp.asarray([1.0, 0.0]).reshape(2, 1)

    def init(params):
        return AdamState(mu=jax.tree.map(jnp.zeros_like, params),
                         nu=jax.tree.map(jnp.zeros_like, params),
                         acc_grad=jax.tree.map(jnp.zeros_like, params),
                         ni=jnp.zeros((), jnp.int32),
                         gradient_steps=jnp.zeros((), jnp.int32),
                         emitted=jnp.asarray(False))

    def update(grads, state, params=None):
        lr_main, lr_bias, _mom, k = sched(state.ni)
        emit = (state.ni % k) == 0
        acc = jax.tree.map(jnp.add, state.acc_grad, grads)
        t = (state.gradient_steps + 1).astype(jnp.float32)
        bc1 = 1.0 - b1 ** t
        bc2 = 1.0 - b2 ** t

        def one(role, g, mu, nu, p):
            if role == "frozen":
                return (jnp.zeros_like(p), mu, nu)
            if role == "kernel":
                eff = g + wd * p
                lr = lr_main
            elif role == "ln_stacked":
                eff = g + wd * _ln_decay * p
                lr = jnp.stack([lr_main, lr_bias]).reshape(2, 1)
            elif role == "bias":
                eff = g
                lr = lr_bias
            else:  # norm
                eff = g
                lr = lr_main
            new_mu = b1 * mu + (1.0 - b1) * eff
            new_nu = b2 * nu + (1.0 - b2) * jnp.square(eff)
            u = -lr * (new_mu / bc1) / (jnp.sqrt(new_nu / bc2) + eps)
            return (jnp.where(emit, u, jnp.zeros_like(u)),
                    jnp.where(emit, new_mu, mu),
                    jnp.where(emit, new_nu, nu))

        triples = jax.tree.map(one, params_roles, acc, state.mu, state.nu,
                               params)
        is_tri = lambda x: isinstance(x, tuple) and len(x) == 3 and not isinstance(x[0], tuple)  # noqa: E731
        updates = jax.tree.map(lambda tr: tr[0], triples, is_leaf=is_tri)
        mus = jax.tree.map(lambda tr: tr[1], triples, is_leaf=is_tri)
        nus = jax.tree.map(lambda tr: tr[2], triples, is_leaf=is_tri)
        acc_next = jax.tree.map(
            lambda a: jnp.where(emit, jnp.zeros_like(a), a), acc)
        return updates, AdamState(
            mu=mus, nu=nus, acc_grad=acc_next, ni=state.ni + 1,
            gradient_steps=state.gradient_steps + emit.astype(jnp.int32),
            emitted=emit)

    return optax.GradientTransformation(init, update)


def opt_emitted(opt_state) -> jnp.ndarray:
    """Did the last tx.update() emit a real optimizer step?

    Used to gate EMA updates on optimizer emission (train.py:768-773: the
    reference calls ema.update only when the optimizer steps). Returns a
    traced bool for SGDState/AdamState/MultiStepsState; a static True
    otherwise (unaccumulated optimizers emit every update).
    """
    if isinstance(opt_state, (SGDState, AdamState)):
        return opt_state.emitted
    if isinstance(opt_state, optax.MultiStepsState):
        return opt_state.mini_step == 0  # just wrapped -> emitted
    return jnp.asarray(True)


def build_optimizer(params, hyp: OptHyp, steps_per_epoch: int, epochs: int,
                    accumulate: int = 1, total_batch_size: int = 64,
                    linear_lr: bool = False, warmup_min_iters: int = 1000,
                    freeze: tuple = ()):
    """Returns (tx, roles). Adam variant mirrors train.py:562-565.

    `freeze`: substrings of parameter paths to exclude from training
    (reference train.py:535-540 freeze-by-name loop; their list is
    hardcoded empty — ours is CLI-reachable via train --freeze)."""
    def role_with_freeze(path, leaf):
        if freeze:
            dotted = ".".join(
                str(getattr(k, "key", getattr(k, "name", str(k))))
                for k in path)
            if any(f in dotted for f in freeze):
                return "frozen"
        return param_role(path, leaf)

    roles = jax.tree_util.tree_map_with_path(role_with_freeze, params)
    if hyp.adam:
        tx = yolo_adam(roles, hyp, steps_per_epoch, epochs, accumulate,
                       total_batch_size, linear_lr, warmup_min_iters)
        return tx, roles
    tx = yolo_sgd(roles, hyp, steps_per_epoch, epochs, accumulate,
                  total_batch_size, linear_lr, warmup_min_iters)
    return tx, roles


def ema_decay_schedule(updates: jnp.ndarray, decay: float = 0.9999,
                       tau: float = 2000.0) -> jnp.ndarray:
    """d(t) = decay * (1 - exp(-t / tau)) (torch_utils.py:283)."""
    return decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))


def ema_update(ema_tree, new_tree, updates: jnp.ndarray,
               decay: float = 0.9999, enabled=None):
    """One EMA step over params (and float buffers).

    `enabled` (bool scalar or None): when False the tree is returned
    unchanged — used to gate EMA on real optimizer emissions under gradient
    accumulation (train.py:768-773).
    """
    d = ema_decay_schedule(updates, decay)
    if enabled is not None:
        d = jnp.where(enabled, d, 1.0)

    def upd(e, p):
        if not jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating):
            return p
        return e * d + p.astype(e.dtype) * (1.0 - d)

    return jax.tree.map(upd, ema_tree, new_tree)
