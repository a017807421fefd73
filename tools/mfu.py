"""MFU / MXU-utilization calculator for the inference headline.

Turns "HBM-bound plateau, 40-55% MXU" (PERF.md) into a measured number:
    MFU = FLOPs_per_pair * pairs_per_second / peak_FLOPs
FLOPs come from XLA cost analysis of the jitted fused inference forward
(utils/profiling.estimate_flops — the thop equivalent, reference
torch_utils.py:231); pairs/s from bench.py on the real chip. Peak is
TPU v5e bf16: 197 TFLOP/s per chip (public spec).

Usage:
  python tools/mfu.py [--cfg yolov5l_fusion_transformerx3] [--img 640]
                      [--pairs-per-s 490]   # from bench.py
  python tools/mfu.py --train --batch 8 --remat blocks --ms-per-step 74.4
                      # training-step MFU from tools/bench_train.py timing
FLOP counting runs fine on CPU (JAX_PLATFORMS=cpu) — conv/matmul FLOPs
are backend-independent. In --train mode the FLOPs come from cost
analysis of the FULL jitted train step (fwd+bwd+optimizer+EMA), so a
remat policy's recompute FLOPs are counted as executed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# XLA cost analysis is unavailable on the experimental axon backend
# (lowered.cost_analysis() -> None; measured round 4). FLOP counting is
# backend-independent, so force CPU before any backend initializes. The
# axon sitecustomize re-pins the platform from PALLAS_AXON_POOL_IPS, so
# dropping the env var alone is not enough — re-exec like __graft_entry__.
if os.environ.get("JAX_PLATFORMS") != "cpu" or \
        "PALLAS_AXON_POOL_IPS" in os.environ:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    os.execve(sys.executable, [sys.executable, *sys.argv], env)

V5E_PEAK_BF16 = 197e12  # FLOP/s per chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="yolov5l_fusion_transformerx3")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--pairs-per-s", type=float, default=0.0,
                    help="measured throughput from bench.py; 0 = only "
                         "print FLOPs/pair")
    ap.add_argument("--peak", type=float, default=V5E_PEAK_BF16)
    ap.add_argument("--tta", action="store_true",
                    help="cost-analyze the 3-scale+flip TTA forward "
                         "(train/tta.py) instead of the plain forward")
    ap.add_argument("--train", action="store_true",
                    help="cost-analyze the full train step instead of the "
                         "inference forward")
    ap.add_argument("--batch", type=int, default=8,
                    help="train-step batch size (--train only)")
    ap.add_argument("--remat", default="none",
                    choices=["none", "dots", "full", "blocks"])
    ap.add_argument("--ms-per-step", type=float, default=0.0,
                    help="measured train-step latency from "
                         "tools/bench_train.py (--train only)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # belt-and-braces
    import jax.numpy as jnp

    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import get_config
    from multispectral_object_detection_tpu.utils.profiling import \
        estimate_flops

    if args.train:
        return train_mfu(args)

    model = build_model(get_config(args.cfg, nc=3), dtype=jnp.bfloat16)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.img, args.img, 3), jnp.float32),
        jnp.zeros((1, args.img, args.img, 3), jnp.float32))["params"]
    if args.tta:
        from multispectral_object_detection_tpu.train.tta import tta_forward

        x = jnp.zeros((1, args.img, args.img, 3), jnp.float32)
        shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, x)
        stats = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             shapes.get("batch_stats", {}))
        lowered = jax.jit(lambda a, b: tta_forward(
            model, params, stats, a, b)).lower(x, x)
        cost = lowered.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) if cost else None
    else:
        flops = estimate_flops(model, params, args.img)
    if flops is None:
        print(json.dumps({"error": "cost analysis unavailable"}))
        return 1
    out = {"cfg": args.cfg, "img": args.img, "tta": bool(args.tta),
           "gflops_per_pair": round(flops / 1e9, 2)}
    if args.pairs_per_s:
        out["pairs_per_s"] = args.pairs_per_s
        out["achieved_tflops"] = round(flops * args.pairs_per_s / 1e12, 2)
        out["mfu_pct"] = round(100 * flops * args.pairs_per_s / args.peak, 2)
    print(json.dumps(out))
    return 0


def train_mfu(args):
    """FLOPs of the full jitted train step (mirrors tools/bench_train.py's
    construction exactly so the counted program is the timed program)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import get_config
    from multispectral_object_detection_tpu.models.detect import anchor_arrays
    from multispectral_object_detection_tpu.train.loss import (DetectionLoss,
                                                               LossHyp)
    from multispectral_object_detection_tpu.train.optim import (
        OptHyp, build_optimizer)
    from multispectral_object_detection_tpu.train.trainer import (
        create_train_state, make_train_step)

    model = build_model(get_config(args.cfg, nc=3), dtype=jnp.bfloat16,
                        remat_blocks=args.remat == "blocks")
    spec = model.spec
    loss_fn = DetectionLoss(nc=3, anchors_px=anchor_arrays(spec.anchors),
                            strides=spec.strides, hyp=LossHyp())
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((args.batch, args.img, args.img, 3), jnp.uint8)
    shapes = jax.eval_shape(model.init, rng, sample.astype(jnp.float32),
                            sample.astype(jnp.float32))
    accumulate = max(round(64 / args.batch), 1)
    tx, _ = build_optimizer(shapes["params"], OptHyp(), 100, 300,
                            accumulate, args.batch)
    state = create_train_state(model, tx, rng, sample, sample)
    step = make_train_step(model, loss_fn, tx, two_stream=True, donate=False,
                           remat="none" if args.remat == "blocks"
                           else args.remat)
    T = 64 * args.batch
    targets = jnp.zeros((T, 6), jnp.float32)
    tmask = jnp.zeros((T,), bool)
    lowered = step.lower(state, sample, sample, targets, tmask, rng)
    cost = lowered.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", 0.0)) if cost else None
    if not flops:
        print(json.dumps({"error": "cost analysis unavailable"}))
        return 1
    out = {"cfg": args.cfg, "img": args.img, "batch": args.batch,
           "remat": args.remat,
           "gflops_per_step": round(flops / 1e9, 2),
           "gflops_per_pair": round(flops / args.batch / 1e9, 2)}
    if args.ms_per_step:
        achieved = flops / (args.ms_per_step / 1e3)
        out["ms_per_step"] = args.ms_per_step
        out["achieved_tflops"] = round(achieved / 1e12, 2)
        out["mfu_pct"] = round(100 * achieved / args.peak, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
