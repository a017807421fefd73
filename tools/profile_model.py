"""Per-op TPU profile of the inference graph (works over the axon tunnel).

jax.profiler.trace DOES capture device-side per-HLO events on this
platform (despite block_until_ready being unreliable) — this tool runs the
fused flagship inference under the profiler and prints the top-K ops by
device time with their HLO long names, giving the per-layer decomposition
that whole-program A/B bisection can only approximate.

This is how the round-2 stem/C3/CFT cost split in PERF.md was measured.

Usage:
    python tools/profile_model.py [--cfg-scale l] [--img 640] [--batch 16]
                                  [--top 30] [--iters 3]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def collect_device_ops(trace_dir: str, iters: int):
    files = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    d = json.load(gzip.open(files[-1]))
    ev = d["traceEvents"]
    pids = {e["pid"]: e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu = {p for p, n in pids.items() if "TPU" in n}
    tot = {}
    for e in ev:
        if e.get("ph") == "X" and e["pid"] in tpu:
            nm = e["name"]
            rec = tot.setdefault(nm, [0.0, 0, ""])
            rec[0] += e["dur"]
            rec[1] += 1
            rec[2] = e.get("args", {}).get("long_name", "")
    # drop the whole-program parent entries (they contain everything else)
    ops = {k: v for k, v in tot.items() if not k.startswith("jit_")}
    total = {k: v for k, v in tot.items() if k.startswith("jit_")}
    return ops, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg-scale", default="l")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--no-nms", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multispectral_object_detection_tpu.models import build_model
    from multispectral_object_detection_tpu.models.configs import (
        yolov5_two_stream)
    from multispectral_object_detection_tpu.models.model import (
        cast_inference_params, fuse_conv_bn_params)
    from multispectral_object_detection_tpu.ops.nms import batched_nms

    model = build_model(yolov5_two_stream(args.cfg_scale, nc=1,
                                          fusion="transformerx3"),
                        dtype=jnp.bfloat16)
    s = args.img
    v = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)),
        jnp.zeros((1, s, s, 3)))
    fused = build_model(model.spec, dtype=jnp.bfloat16, fused=True,
                        use_pallas=True)
    params = cast_inference_params(
        fuse_conv_bn_params(v["params"], v.get("batch_stats", {})),
        jnp.bfloat16)

    @jax.jit
    def infer(p, rgb, ir):
        x = rgb.astype(jnp.float32) / 255.0
        x2 = ir.astype(jnp.float32) / 255.0
        feats = fused.apply({"params": p, "batch_stats": {}}, x, x2,
                            train=False)
        dets = fused.decode(feats)
        if args.no_nms:
            return dets
        return batched_nms(dets, conf_thres=0.25, iou_thres=0.45,
                           multi_label=False, max_det=300, top_k=1024)

    rgb = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (args.batch, s, s, 3), dtype=np.uint8))
    o = infer(params, rgb, rgb)
    np.asarray(jax.tree.leaves(o)[0])

    trace_dir = tempfile.mkdtemp(prefix="mtprof_")
    with jax.profiler.trace(trace_dir):
        for _ in range(args.iters):
            o = infer(params, rgb, rgb)
        np.asarray(jax.tree.leaves(o)[0])

    ops, total = collect_device_ops(trace_dir, args.iters)
    for k, (dur, n, _) in total.items():
        print(f"TOTAL {k.split('(')[0]}: {dur / args.iters / 1e3:.3f} "
              f"ms/iter")
    ssum = sum(v[0] for v in ops.values()) / args.iters / 1e3
    print(f"sum of child ops: {ssum:.3f} ms/iter "
          f"({len(ops)} distinct ops)\n")
    print(f"{'ms/iter':>8}  {'calls':>5}  op  [shape excerpt]")
    for nm, (dur, n, ln) in sorted(ops.items(), key=lambda x: -x[1][0])[
            :args.top]:
        shape = ln.split(" = ")[1].split("{")[0] if " = " in ln else ""
        print(f"{dur / args.iters / 1e3:8.3f}  {n // args.iters:5d}  "
              f"{nm[:44]:44s}  {shape[:40]}")
    print(f"\ntrace dir (tensorboard-compatible): {trace_dir}")


if __name__ == "__main__":
    main()
