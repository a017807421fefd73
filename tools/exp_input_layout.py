"""Bounded experiment: elide the stem input layout copies (PERF.md round-2
profile: 2 x 0.61 ms `copy` fusions on [16,640,640,3] — XLA transposes the
normalized input to its batch-in-lanes conv layout inside every call).

Attack: compile the flagship inference program with AUTO input layouts
(jax.experimental.layout), then commit the uint8 input arrays in the
layout the compiled program prefers — the in-program transpose should
disappear. Legit for serving: the host->device upload defines the device
layout, so writing the preferred layout costs the same tunnel bytes.

Run on the real TPU:  python tools/exp_input_layout.py
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental.layout import Format, Layout  # noqa: E402

from multispectral_object_detection_tpu.models import build_model  # noqa: E402
from multispectral_object_detection_tpu.models.configs import (  # noqa: E402
    yolov5_two_stream)
from multispectral_object_detection_tpu.models.model import (  # noqa: E402
    cast_inference_params, fuse_conv_bn_params)
from multispectral_object_detection_tpu.ops.nms import batched_nms  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    b, s = args.batch, args.img
    model = build_model(yolov5_two_stream("l", nc=1, fusion="transformerx3"),
                        dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda r, a, c: model.init(r, a, c, train=False))(
        rng, jnp.zeros((1, s, s, 3)), jnp.zeros((1, s, s, 3)))
    fused_model = build_model(model.spec, dtype=jnp.bfloat16, fused=True,
                              use_pallas=True)
    params = cast_inference_params(
        fuse_conv_bn_params(variables["params"],
                            variables.get("batch_stats", {})), jnp.bfloat16)
    params = jax.device_put(params)

    def infer(params, rgb_u8, ir_u8):
        x = rgb_u8.astype(jnp.float32) / 255.0
        x2 = ir_u8.astype(jnp.float32) / 255.0
        feats = fused_model.apply({"params": params, "batch_stats": {}},
                                  x, x2, train=False)
        dets = fused_model.decode(feats)
        return batched_nms(dets, conf_thres=0.25, iou_thres=0.45,
                           multi_label=False, max_det=300, top_k=1024)

    rgb = np.random.default_rng(0).integers(0, 255, (b, s, s, 3), np.uint8)
    ir = np.random.default_rng(1).integers(0, 255, (b, s, s, 3), np.uint8)

    def sync(o):
        np.asarray(jax.tree.leaves(o)[0])

    def bench(fn, p, a, c, label):
        out = fn(p, a, c); sync(out)
        for _ in range(3):
            out = fn(p, a, c)
        sync(out)
        def timed(n):
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(p, a, c)
            sync(o)
            return time.perf_counter() - t0
        t_small, t_big = timed(2), timed(args.iters)
        dt, n = t_big - t_small, args.iters - 2
        log(f"{label}: {dt / n * 1e3:.2f} ms/batch "
            f"({args.batch * n / dt:.1f} pairs/s)")
        return dt / n

    # leg A: default layouts (the bench.py path)
    jit_def = jax.jit(infer)
    rgb_d, ir_d = jnp.asarray(rgb), jnp.asarray(ir)
    t0 = time.perf_counter()
    t_def = bench(jit_def, params, rgb_d, ir_d, "default layout")

    # leg B: AUTO input layouts, inputs committed in the preferred layout
    jit_auto = jax.jit(infer, in_shardings=Format(Layout.AUTO))
    compiled = jit_auto.lower(params, rgb_d, ir_d).compile()
    fmts, _ = compiled.input_formats
    p_fmt, rgb_fmt, ir_fmt = fmts
    log(f"preferred input layout rgb: {rgb_fmt.layout}")
    params_l = jax.device_put(params, p_fmt)
    rgb_l = jax.device_put(rgb_d, rgb_fmt)
    ir_l = jax.device_put(ir_d, ir_fmt)
    t_auto = bench(compiled, params_l, rgb_l, ir_l, "auto layout")
    log(f"delta: {(t_def - t_auto) * 1e3:+.2f} ms/batch "
        f"({(t_def - t_auto) / t_def * 100:+.1f}%)")


if __name__ == "__main__":
    main()
