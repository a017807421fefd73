"""Device-mesh parallelism: data parallelism + tensor parallelism for CFT.

The reference's distribution story is NCCL DDP with explicit process groups,
gradient all-reduce, DistributedSampler and rank guards (train.py:613-658,
989-995; SURVEY.md §2.8). The TPU-native equivalent here is ONE jitted
program over a `jax.sharding.Mesh`:

- axis 'data': the global batch is sharded; gradient reductions are inserted
  by XLA (no DDP wrapper, no loss*world_size quirk — the global-batch mean is
  exact). BatchNorm statistics are computed over the GLOBAL batch because
  `jnp.mean` over a sharded axis compiles to a cross-replica reduction —
  i.e. SyncBatchNorm semantics by construction (reference needed an explicit
  `convert_sync_batchnorm`, train.py:617-620).
- axis 'model': Megatron-style tensor parallelism of the CFT fusion
  transformer: q/k/v and MLP-in kernels column-sharded, proj and MLP-out
  row-sharded; XLA inserts the single all-reduce per block. The CNN trunk is
  replicated (convs at these sizes don't benefit from TP).

Pipeline/sequence/expert parallelism are intentionally absent: the flagship
model is a ~200M-param CNN whose attention runs on 128 tokens (SURVEY.md §5
long-context note) — DP x TP covers every useful scale-out configuration.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    if n_data * n_model < n:
        import warnings

        warnings.warn(
            f"make_mesh uses {n_data * n_model} of {n} devices "
            f"(n_data={n_data} x n_model={n_model}); the rest are idle. "
            f"Pick n_model dividing the device count to use them all.")
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over 'data'."""
    return NamedSharding(mesh, P("data"))


def resolve_data_axis(batch_size: int, n_devices: int,
                      n_model: int = 1) -> tuple:
    """Pick the data-parallel axis size and a compatible global batch.

    The reference asserts `batch_size % world_size == 0`
    (utils/torch_utils.py:83-86) and dies; silently idling devices (the
    round-2 behavior) hides throughput loss. Policy: use every available
    device group and ROUND THE BATCH UP to the next multiple — unless the
    batch is smaller than the device count, in which case the data axis
    shrinks to the batch (a 2-image debug run should not be inflated 4x).

    Returns (n_data, batch_size, changed: bool).
    """
    avail = max(n_devices // max(n_model, 1), 1)
    n_data = min(avail, batch_size)
    if batch_size % n_data:
        new_bs = ((batch_size + n_data - 1) // n_data) * n_data
        return n_data, new_bs, True
    return n_data, batch_size, False


def _fusion_spec(path_keys, leaf) -> P:
    """Tensor-parallel PartitionSpec for CFT fusion params, replicated
    otherwise. The fusion stage stores stacked (L, ...) weights:
    qkv_w/fc1_w column-sharded on the output dim, proj_w/fc2_w row-sharded
    on the input dim, matching biases sharded with the outputs."""
    keys = [str(getattr(k, "key", getattr(k, "name", k))) for k in path_keys]
    name = keys[-1] if keys else ""
    if name in ("qkv_w", "fc1_w") and leaf.ndim == 3:
        return P(None, None, "model")   # (L, C_in, C_out): column parallel
    if name in ("proj_w", "fc2_w") and leaf.ndim == 3:
        return P(None, "model", None)   # (L, C_in, C_out): row parallel
    if name in ("qkv_b", "fc1_b") and leaf.ndim == 2:
        return P(None, "model")
    return P()


def param_shardings(params, mesh: Mesh, tensor_parallel: bool = True):
    """Pytree of NamedShardings: TP on fusion blocks, replicated elsewhere."""

    def spec(path, leaf):
        if tensor_parallel and mesh.shape.get("model", 1) > 1:
            return NamedSharding(mesh, _fusion_spec(path, leaf))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, params)


def replicated(tree, mesh: Mesh):
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def make_parallel_train_step(model, loss_fn, tx, two_stream: bool, mesh: Mesh,
                             ema_decay: float = 0.9999,
                             tensor_parallel: bool = True, donate: bool = True,
                             remat: str = "none"):
    """Like trainer.make_train_step but jitted over a mesh.

    State shardings: params/opt/ema follow `param_shardings`; batch arrays
    AND targets are sharded over 'data'. Targets arrive as per-image
    contiguous padded blocks (collate_batch: (B*max_labels, 6) with image
    i's rows at [i*max_labels, (i+1)*max_labels)), so a leading-axis shard
    puts every row on the device that owns its image; the loss's global
    image-index gathers/scatters are partitioned by XLA's SPMD pass.
    """
    from ..train.optim import ema_update, opt_emitted

    data_s = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())

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

    from ..train.trainer import remat_wrap

    loss_and_aux = remat_wrap(loss_and_aux, remat)

    def step_fn(state, rgb, ir, targets, tmask, rng):
        (total, (new_stats, comps)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(
                state.params, state.batch_stats, rgb, ir, targets, tmask, rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        # EMA gated on real optimizer emissions (train.py:768-773)
        emitted = opt_emitted(new_opt)
        n_upd = state.ema_updates + emitted.astype(jnp.int32)
        new_state = state.replace(
            params=new_params, batch_stats=new_stats, opt_state=new_opt,
            ema_params=ema_update(state.ema_params, new_params, n_upd,
                                  ema_decay, enabled=emitted),
            ema_stats=ema_update(state.ema_stats, new_stats, n_upd,
                                 ema_decay, enabled=emitted),
            step=state.step + 1, ema_updates=n_upd)
        return new_state, comps

    return jax.jit(
        step_fn,
        in_shardings=(None, data_s, data_s, data_s, data_s, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_parallel_eval_forward(model, two_stream: bool, mesh: Mesh,
                               batch_size: int,
                               tensor_parallel: bool = False):
    """Data-parallel inference forward for the evaluator / test CLI.

    Same signature and semantics as trainer.make_eval_forward, but jitted
    over the mesh: params replicated (or CFT tensor-parallel), the batch
    sharded over 'data'. The returned callable pads a short final batch up
    to `batch_size` (one compiled program, no ragged-shape recompiles) and
    slices the pad back off. Downstream NMS on the sharded detections
    keeps the 'data' partitioning — XLA runs it per-shard with no
    cross-device traffic. The reference has no distributed eval at all
    (test.py runs on one device; train.py only evaluates on rank 0).
    """
    from functools import partial

    data_s = batch_sharding(mesh)
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, in_shardings=(None, None, data_s, data_s))
    def _fwd(params, batch_stats, rgb, ir):
        x = rgb.astype(jnp.float32) / 255.0
        inputs = (x,) if not two_stream else (x,
                                              ir.astype(jnp.float32) / 255.0)
        feats = model.apply({"params": params, "batch_stats": batch_stats},
                            *inputs, train=False)
        return model.decode(feats), feats

    def place_params(params):
        if tensor_parallel:
            return jax.tree.map(
                jax.device_put, params,
                param_shardings(params, mesh, tensor_parallel=True))
        return jax.device_put(params, repl)

    def fwd(params, batch_stats, rgb, ir):
        b = int(rgb.shape[0])
        if b != batch_size:
            pad = [(0, batch_size - b)] + [(0, 0)] * (rgb.ndim - 1)
            rgb = np.pad(np.asarray(rgb), pad)
            ir = np.pad(np.asarray(ir), pad)
        rgb = jax.device_put(np.asarray(rgb), data_s)
        ir = jax.device_put(np.asarray(ir), data_s)
        dets, feats = _fwd(params, batch_stats, rgb, ir)
        if b != batch_size:
            dets = dets[:b]
            feats = [f[:b] for f in feats]
        return dets, feats

    fwd.place_params = place_params
    return fwd


def shard_state(state, model_params_shardings, mesh: Mesh):
    """Place a TrainState on the mesh: params per sharding rules, everything
    tree-structured alike; scalars replicated."""
    repl = NamedSharding(mesh, P())

    def place(x, s):
        return jax.device_put(x, s)

    return state.replace(
        params=jax.tree.map(place, state.params, model_params_shardings),
        ema_params=jax.tree.map(place, state.ema_params, model_params_shardings),
        batch_stats=jax.tree.map(lambda x: place(x, repl), state.batch_stats),
        ema_stats=jax.tree.map(lambda x: place(x, repl), state.ema_stats),
        opt_state=jax.tree.map(lambda x: place(x, repl), state.opt_state),
        step=place(state.step, repl),
        ema_updates=place(state.ema_updates, repl),
    )
