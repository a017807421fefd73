"""Model summaries and microbenchmarks.

Replaces the reference's thop/cuda tooling (utils/torch_utils.py:96-132
`profile`, 204-225 `model_info`, yolo_test.py:252-260 per-layer profiling)
with XLA-native equivalents: parameter tables from the pytree, FLOP counts
from XLA cost analysis, and block_until_ready wall-clock microbenchmarks.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def model_info(model, params, img_size: int = 640, verbose: bool = False):
    """Layer/param/GFLOP summary (torch_utils.py:204 model_info)."""
    leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    n_p = sum(int(np.prod(x.shape)) for _, x in leaves)
    n_layers = len(model.spec.nodes)
    if verbose:
        logger.info(f"{'name':<60} {'shape':>20} {'params':>12}")
        for path, x in leaves:
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            logger.info(f"{name:<60} {str(x.shape):>20} {int(np.prod(x.shape)):>12}")
    flops = estimate_flops(model, params, img_size)
    gf = f", {flops / 1e9:.1f} GFLOPs @ {img_size}px" if flops else ""
    logger.info(f"model: {n_layers} graph nodes, {n_p:,} parameters{gf}")
    return {"layers": n_layers, "params": n_p, "flops": flops}


def estimate_flops(model, params, img_size: int = 640) -> Optional[float]:
    """Forward FLOPs from XLA cost analysis (the thop equivalent)."""
    import jax.numpy as jnp

    try:
        x = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        args = (x,) if not model.spec.two_stream else (x, x)
        variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), *args)
        stats_shape = variables.get("batch_stats", {})
        stats = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), stats_shape)
        lowered = jax.jit(lambda *a: model.apply(
            {"params": params, "batch_stats": stats}, *a,
            train=False)).lower(*args)
        cost = lowered.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) if cost else None
    except Exception as e:  # cost analysis is best-effort
        logger.debug(f"flop estimate failed: {e}")
        return None


def microbenchmark(fn: Callable, *args, n: int = 20, warmup: int = 5) -> dict:
    """Forward/backward wall-clock (torch_utils.py:96 profile equivalent).

    fn must be jittable; returns ms statistics with a host-fetch sync (the
    experimental TPU platform's block_until_ready can be unreliable).
    """
    jfn = jax.jit(fn)

    def sync(o):
        np.asarray(jax.tree.leaves(o)[0])

    out = jfn(*args)
    sync(out)
    for _ in range(warmup):
        out = jfn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = jfn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / n * 1000
    return {"ms": dt}


def per_layer_costs(model, params, img_size: int = 640):
    """Static per-node parameter counts (the profile=True table of
    yolo_test.py:252 without per-layer timing — XLA fuses across layers, so
    per-layer wall-clock is not meaningful post-compilation)."""
    rows = []
    p = params
    for node in model.spec.nodes:
        key = f"blocks_{node.index}"
        sub = p.get(key, {})
        n_par = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(sub))
        rows.append({"i": node.index, "from": node.frm, "kind": node.kind,
                     "params": n_par, "c2": node.c2})
    return rows
