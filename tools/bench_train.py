"""Training-step throughput bench (flagship CFT-L @640, one chip).

Times the FULL jitted training step (bf16 forward, fp32 loss/grads,
SGD+nesterov, EMA over params+buffers, BN stat update, donated state) the
same way bench.py times inference: difference two run lengths with a host
fetch to force completion (this platform's block_until_ready returns early).

Usage:  python tools/bench_train.py [--cfg yolov5l_fusion_transformerx3]
        [--img 640] [--batch 8] [--steps 30]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="yolov5l_fusion_transformerx3")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--max-labels", type=int, default=64)
    ap.add_argument("--remat", default="none",
                    choices=["none", "dots", "full", "blocks"])
    ap.add_argument("--profile", action="store_true",
                    help="per-op device profile of the train step "
                         "(top-30 HLO ops by time)")
    ap.add_argument("--in-loop", action="store_true",
                    help="also time the step inside a realistic epoch loop "
                         "(device-side metric accumulation, ONE fetch at "
                         "the end — the train_cli pattern) and inside the "
                         "old per-step host-sync loop, vs the isolated step")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import get_config
    from multispectral_object_detection_tpu.models.detect import anchor_arrays
    from multispectral_object_detection_tpu.train.loss import (DetectionLoss,
                                                               LossHyp)
    from multispectral_object_detection_tpu.train.optim import (OptHyp,
                                                                build_optimizer)
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
    n_par = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"{args.cfg}: {n_par:,} params, batch {args.batch} @{args.img}")

    step = make_train_step(model, loss_fn, tx, two_stream=True,
                           remat="none" if args.remat == "blocks"
                           else args.remat)
    T = args.max_labels * args.batch
    targets = np.zeros((T, 6), np.float32)
    targets[:8, 1] = np.arange(8) % 3
    targets[:8, 2:] = 0.3
    tmask = np.zeros((T,), bool)
    tmask[:8] = True
    rgb = np.random.default_rng(0).integers(
        0, 255, (args.batch, args.img, args.img, 3), dtype=np.uint8)
    batch = (jnp.asarray(rgb), jnp.asarray(rgb), jnp.asarray(targets),
             jnp.asarray(tmask))

    # step donates its state argument — thread one live state through all
    # runs instead of re-submitting donated buffers
    live = {"state": state, "rng": rng}

    def run(n):
        t0 = time.perf_counter()
        for i in range(n):
            live["rng"], k = jax.random.split(live["rng"])
            live["state"], metrics = step(live["state"], *batch, k)
        np.asarray(next(iter(metrics.values())))  # force completion (axon)
        return time.perf_counter() - t0

    try:  # compiled peak-memory estimate (before running)
        lowered = step.lower(state, *batch, jax.random.PRNGKey(1))
        mem = lowered.compile().memory_analysis()
        if mem is not None:
            print(f"remat={args.remat}: temp (activation) memory "
                  f"{mem.temp_size_in_bytes / 2**20:.0f} MiB, "
                  f"args {mem.argument_size_in_bytes / 2**20:.0f} MiB")
    except Exception as e:  # not all backends expose it
        print(f"memory_analysis unavailable: {e}")

    run(2)  # compile + warmup
    t_short = run(args.steps // 3)
    t_long = run(args.steps)
    dt = (t_long - t_short) / (args.steps - args.steps // 3)
    pairs = args.batch / dt
    print(f"train step: {dt * 1e3:.1f} ms / batch-{args.batch} = "
          f"{pairs:.1f} pairs/s/chip")

    if args.in_loop:
        # the train_cli epoch-loop pattern: metrics summed on device, one
        # fetch per "epoch" (VERDICT round-2 weak #1: the old loop fetched
        # 4 scalars per step, each a tunnel round trip)
        @jax.jit
        def acc_m(acc, m):
            return acc + jnp.stack([m["box"], m["obj"], m["cls"],
                                    m["total"]])

        def run_loop(n, host_sync):
            agg = jnp.zeros((4,), jnp.float32)
            t0 = time.perf_counter()
            for _ in range(n):
                live["rng"], k = jax.random.split(live["rng"])
                live["state"], m = step(live["state"], *batch, k)
                if host_sync:
                    _ = [float(m[c])
                         for c in ("box", "obj", "cls", "total")]
                else:
                    agg = acc_m(agg, m)
            np.asarray(jax.device_get(agg))
            return time.perf_counter() - t0

        for host_sync, tag in ((False, "device-accum loop (train_cli)"),
                               (True, "per-step host-sync loop (old)")):
            run_loop(2, host_sync)  # warm the acc_m program
            t_s = run_loop(args.steps // 3, host_sync)
            t_l = run_loop(args.steps, host_sync)
            d = (t_l - t_s) / (args.steps - args.steps // 3)
            print(f"{tag}: {d * 1e3:.1f} ms/step "
                  f"({(d / dt - 1) * 100:+.1f}% vs isolated step)")

    if args.profile:
        import tempfile

        from tools.profile_model import collect_device_ops

        trace_dir = tempfile.mkdtemp(prefix="mttrain_")
        with jax.profiler.trace(trace_dir):
            run(3)
        ops, total = collect_device_ops(trace_dir, 3)
        for k, (dur, n, _) in total.items():
            print(f"TOTAL {k.split('(')[0]}: {dur / 3 / 1e3:.3f} ms/iter")
        print(f"{'ms/iter':>8}  {'calls':>5}  op  [shape excerpt]")
        for nm, (dur, n, ln) in sorted(ops.items(),
                                       key=lambda x: -x[1][0])[:args.top]:
            shape = ln.split(" = ")[1].split("{")[0] if " = " in ln else ""
            print(f"{dur / 3 / 1e3:8.3f}  {n // 3:5d}  {nm[:44]:44s}  "
                  f"{shape[:40]}")


if __name__ == "__main__":
    main()
