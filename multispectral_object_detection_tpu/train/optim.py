"""Optimizer, LR schedule and EMA — the reference training recipe, optax-style.

Reference recipe (train.py:541-577):
- nominal batch 64; gradient accumulation `max(round(64/bs), 1)`; weight
  decay scaled by `bs * accumulate / 64`;
- SGD(momentum=0.937, nesterov) with THREE groups: BN gammas & biases (no
  decay), conv/dense kernels (decayed), biases additionally get a high
  warmup LR;
- one-cycle cosine LR `((1+cos(pi*e/E))/2)*(1-lrf)+lrf`, 3-epoch linear
  warmup from 0 (0.1 for biases) with momentum warmed from 0.8;
- EMA of params AND buffers with decay `0.9999*(1-exp(-t/2000))`
  (utils/torch_utils.py:269-303).

Design: one custom optax GradientTransformation implementing torch-coupled
SGD with per-leaf role masks (bias / norm / kernel), driven by step-indexed
lr/momentum schedules so warmup happens per-iteration inside jit.
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
    """Classify a parameter: 'bias' | 'norm' | 'kernel'.

    BN/LN scales+biases and all biases are exempt from weight decay
    (train.py:548-560); positional embeddings are treated as norm-like.
    """
    keys = [getattr(k, "key", getattr(k, "name", str(k))) for k in path]
    name = keys[-1] if keys else ""
    if any("bn" in str(k) or "_bn" in str(k) or "BatchNorm" in str(k)
           or "ln_" in str(k) or "LayerNorm" in str(k) for k in keys):
        return "norm"
    if name == "bias":
        return "bias"
    if name in ("scale",):  # flax norm scale
        return "norm"
    if name == "pos_emb":
        return "norm"
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
    count: jnp.ndarray


def yolo_sgd(params_roles, hyp: OptHyp, steps_per_epoch: int, epochs: int,
             accumulate: int = 1, total_batch_size: int = 64,
             linear_lr: bool = False) -> optax.GradientTransformation:
    """Torch-coupled SGD + nesterov + per-role warmup, fully step-driven.

    params_roles: pytree of 'bias'/'norm'/'kernel' strings (same structure
    as params).
    """
    nbs = 64.0
    wd = hyp.weight_decay * total_batch_size * accumulate / nbs  # train.py:546
    nw = max(round(hyp.warmup_epochs * steps_per_epoch), 100)    # train.py:685
    lf = (linear_lf if linear_lr else one_cycle_lf)(epochs, hyp.lrf)

    def schedules(count):
        # `count` counts optimizer updates; integrated warmup uses raw steps.
        ni = count.astype(jnp.float32) * accumulate  # approx batch counter
        epoch_f = ni / steps_per_epoch
        base = hyp.lr0 * lf(epoch_f)
        frac = jnp.clip(ni / nw, 0.0, 1.0)
        in_warm = ni < nw
        lr_main = jnp.where(in_warm, frac * base, base)
        lr_bias = jnp.where(in_warm,
                            hyp.warmup_bias_lr + frac * (base - hyp.warmup_bias_lr),
                            base)
        mom = jnp.where(in_warm,
                        hyp.warmup_momentum + frac * (hyp.momentum - hyp.warmup_momentum),
                        hyp.momentum)
        return lr_main, lr_bias, mom

    def init(params):
        return SGDState(momentum_buf=jax.tree.map(jnp.zeros_like, params),
                        count=jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        lr_main, lr_bias, mom = schedules(state.count)

        def eff_grad(role, g, p):
            return g + (wd * p if role == "kernel" else 0.0)  # coupled L2

        def new_buf(role, g, buf, p):
            return mom * buf + eff_grad(role, g, p)

        bufs = jax.tree.map(new_buf, params_roles, grads,
                            state.momentum_buf, params)

        def step(role, g, buf, p):
            d = eff_grad(role, g, p) + mom * buf  # nesterov uses updated buf
            lr = lr_bias if role == "bias" else lr_main
            return -lr * d

        updates = jax.tree.map(step, params_roles, grads, bufs, params)
        return updates, SGDState(momentum_buf=bufs, count=state.count + 1)

    return optax.GradientTransformation(init, update)


def build_optimizer(params, hyp: OptHyp, steps_per_epoch: int, epochs: int,
                    accumulate: int = 1, total_batch_size: int = 64,
                    linear_lr: bool = False):
    """Returns (tx, roles). Adam variant mirrors train.py:562-565."""
    roles = jax.tree_util.tree_map_with_path(param_role, params)
    if hyp.adam:
        nw = max(round(hyp.warmup_epochs * steps_per_epoch), 100)
        lf = (linear_lf if linear_lr else one_cycle_lf)(epochs, hyp.lrf)

        def sched(count):
            ni = count * accumulate
            base = hyp.lr0 * lf(ni / steps_per_epoch)
            return jnp.where(ni < nw, jnp.clip(ni / nw, 0, 1) * base, base)

        wd = hyp.weight_decay * total_batch_size * accumulate / 64.0
        mask = jax.tree.map(lambda r: r == "kernel", roles,
                            is_leaf=lambda x: isinstance(x, str))
        tx = optax.chain(
            optax.add_decayed_weights(wd, mask=mask),
            optax.scale_by_adam(b1=hyp.momentum, b2=0.999),
            optax.scale_by_schedule(lambda c: -sched(c)),
        )
        return tx, roles
    tx = yolo_sgd(roles, hyp, steps_per_epoch, epochs, accumulate,
                  total_batch_size, linear_lr)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    return tx, roles


def ema_decay_schedule(updates: jnp.ndarray, decay: float = 0.9999,
                       tau: float = 2000.0) -> jnp.ndarray:
    """d(t) = decay * (1 - exp(-t / tau)) (torch_utils.py:283)."""
    return decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))


def ema_update(ema_tree, new_tree, updates: jnp.ndarray, decay: float = 0.9999):
    """One EMA step over params (and float buffers)."""
    d = ema_decay_schedule(updates, decay)

    def upd(e, p):
        if not jnp.issubdtype(jnp.asarray(p).dtype, jnp.floating):
            return p
        return e * d + p.astype(e.dtype) * (1.0 - d)

    return jax.tree.map(upd, ema_tree, new_tree)
