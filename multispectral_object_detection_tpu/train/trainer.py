"""Jitted training step + state management.

The reference's epoch loop mutates a torch module in place under AMP/DDP
(train.py:684-799); here the entire step — forward (bf16 optional), loss,
gradients, optimizer, EMA, BN-statistics update — is ONE pure jitted
function over a donated TrainState. Data parallelism is a sharding of the
batch over the mesh's 'data' axis: XLA inserts the gradient reductions
(the NCCL all-reduce of train.py:993 has no explicit equivalent).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from flax import struct

from .loss import DetectionLoss
from .optim import ema_update, opt_emitted


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_stats: Any
    step: jnp.ndarray          # optimizer/EMA update counter
    ema_updates: jnp.ndarray   # EMA update counter (resume-able)


def create_train_state(model, tx, rng, sample_rgb, sample_ir=None) -> TrainState:
    args = (sample_rgb,) if sample_ir is None else (sample_rgb, sample_ir)
    variables = model.init(rng, *args, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        # EMA must own DISTINCT buffers: aliasing params would double-donate
        # under jit(donate_argnums=0)
        ema_params=jax.tree.map(jnp.copy, params),
        ema_stats=jax.tree.map(jnp.copy, batch_stats),
        step=jnp.zeros((), jnp.int32),
        ema_updates=jnp.zeros((), jnp.int32),
    )


def remat_wrap(fn, remat: str):
    """Wrap a loss closure in jax.checkpoint for activation rematerialization.

    'none'  — XLA keeps every activation live for the backward pass.
    'dots'  — save matmul/conv outputs, recompute elementwise chains
              (jax.checkpoint_policies.checkpoint_dots): small memory win,
              near-zero recompute.
    'full'  — save only the inputs and recompute the whole forward during
              backward: activation memory ~O(1) at ~1 extra forward of
              compute. Enables larger batch/resolution on fixed HBM.
    The reference has no equivalent (torch.utils.checkpoint is unused).
    """
    if remat == "none":
        return fn
    if remat == "dots":
        return jax.checkpoint(
            fn, policy=jax.checkpoint_policies.checkpoint_dots)
    if remat == "full":
        return jax.checkpoint(fn)
    raise ValueError(f"remat must be none|dots|full, got {remat!r}")


def make_train_step(model, loss_fn: DetectionLoss, tx,
                    two_stream: bool, ema_decay: float = 0.9999,
                    donate: bool = True, remat: str = "none") -> Callable:
    """Build the jitted train step.

    step(state, rgb, ir, targets, tmask, rng) -> (state, metrics)
    rgb/ir: (B, S, S, 3) uint8. targets: (T, 6). tmask: (T,).
    remat: activation rematerialization policy (see remat_wrap).
    """

    def loss_and_aux(params, batch_stats, rgb, ir, targets, tmask, rng):
        x = rgb.astype(jnp.float32) / 255.0
        inputs = (x,) if not two_stream else (x, ir.astype(jnp.float32) / 255.0)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            *inputs, train=True, mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        total, comps = loss_fn(out, targets, tmask)
        return total, (mutated["batch_stats"], comps)

    loss_and_aux = remat_wrap(loss_and_aux, remat)

    def step_fn(state: TrainState, rgb, ir, targets, tmask, rng):
        (total, (new_stats, comps)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(
                state.params, state.batch_stats, rgb, ir, targets, tmask, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        # EMA only when the optimizer actually emitted a step — under grad
        # accumulation the reference updates EMA once per optimizer step,
        # not per micro-batch (train.py:768-773)
        emitted = opt_emitted(new_opt)
        new_updates = state.ema_updates + emitted.astype(jnp.int32)
        ema_params = ema_update(state.ema_params, new_params, new_updates,
                                ema_decay, enabled=emitted)
        ema_stats = ema_update(state.ema_stats, new_stats, new_updates,
                               ema_decay, enabled=emitted)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            ema_params=ema_params, ema_stats=ema_stats,
            step=state.step + 1, ema_updates=new_updates)
        metrics = {k: v for k, v in comps.items()}
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree.leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                        for x in leaves))


def make_eval_forward(model, two_stream: bool) -> Callable:
    """Jitted inference forward + decode using EMA weights."""

    @jax.jit
    def fwd(params, batch_stats, rgb, ir):
        x = rgb.astype(jnp.float32) / 255.0
        inputs = (x,) if not two_stream else (x, ir.astype(jnp.float32) / 255.0)
        feats = model.apply({"params": params, "batch_stats": batch_stats},
                            *inputs, train=False)
        return model.decode(feats), feats

    return fwd


def make_eval_forward_ensemble(model, two_stream: bool,
                               mode: str = "cat") -> Callable:
    """Jitted multi-checkpoint ensemble forward, drop-in for
    make_eval_forward (the CLI face of reference attempt_load ->
    Ensemble, experimental.py:113-134).

    Takes params/batch_stats trees whose leaves carry a leading member
    axis (utils/checkpoint.stack_param_trees); members run under one vmap
    and combine by ``mode``: "cat" (reference default torch.cat nms
    ensemble), "mean"/"max" (experimental.py:107-108), or
    "ds"/"ds-li"/"ds-sun" (ops/ds_fusion.py per-anchor evidence fusion).
    Returns (dets, None) — no val loss, same as the reference ensemble
    whose forward returns train_out=None (experimental.py:111)."""

    @jax.jit
    def fwd(params, batch_stats, rgb, ir):
        x = rgb.astype(jnp.float32) / 255.0
        x2 = ir.astype(jnp.float32) / 255.0 if two_stream else None

        def one(p, s):
            inputs = (x,) if not two_stream else (x, x2)
            feats = model.apply({"params": p, "batch_stats": s},
                                *inputs, train=False)
            return model.decode(feats)

        dets = jax.vmap(one)(params, batch_stats)  # (E, B, N, 5+nc)
        if mode == "cat":
            e, b, n, no = dets.shape
            out = jnp.moveaxis(dets, 0, 1).reshape(b, e * n, no)
        elif mode == "mean":
            out = dets.mean(axis=0)
        elif mode == "max":
            out = dets.max(axis=0)
        else:
            from ..ops.ds_fusion import fuse_detections

            method = {"ds": "plain", "ds-li": "li", "ds-sun": "sun"}[mode]
            out = fuse_detections(dets, method=method)
        return out, None

    return fwd


def make_eval_forward_tta(model, two_stream: bool) -> Callable:
    """Jitted test-time-augmentation forward (3 scales + lr flip,
    train/tta.py) + decode, drop-in for make_eval_forward.

    Returns (dets, None): TTA produces per-scale feature pyramids of
    different shapes, so no val loss is computed under --augment — same
    as the reference, whose augmented forward returns train_out=None
    (yolo_test.py:214-230)."""
    from .tta import tta_forward

    @jax.jit
    def fwd(params, batch_stats, rgb, ir):
        x = rgb.astype(jnp.float32) / 255.0
        x2 = ir.astype(jnp.float32) / 255.0 if two_stream else None
        return tta_forward(model, params, batch_stats, x, x2), None

    return fwd
