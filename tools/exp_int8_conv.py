"""Lever probe: are full-int8 convs (int8 activations x int8 weights ->
int32 accum, the v5e's 394-TOPS MXU mode) faster than bf16 on the
flagship's actual trunk shapes?

Round-4 context: weights-only int8 measured-closed as a throughput lever
(+0.4% = noise, PERF.md round 4) — at bs16 @640 the roof is activation
traffic / memory-bound high-res convs, not weight bytes. int8
*activations* halve that traffic AND double MXU peak, so this probe times
each YOLOv5-L trunk conv shape (one stream, @640, batch 16) in bf16 vs
int8 via XLA `conv_general_dilated(preferred_element_type=int32)`.

If the weighted ladder shows <~1.2x there is no model-path investment to
make (dynamic activation quant adds requant overhead on top); >=1.5x
justifies building the quantized inference build. Methodology: each shape
runs `--iters` distinct-input convs inside one jit (lax.scan over stacked
inputs, accumulated output — prevents CSE/elision), timed by two-length
differencing with a host fetch (axon sync caveat, see bench.py).

Run on the real TPU: python tools/exp_int8_conv.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# (name, H_in, C_in, C_out, k, stride, count) — YOLOv5-L trunk @640, one
# stream; count = occurrences per stream forward (backbone C3 internals
# summed; head included once). Two-stream doubles backbone counts; ratios
# are what matter here.
SHAPES = [
    ("focus_stem", 640, 3, 64, 6, 2, 1),
    ("p2_down", 320, 64, 128, 3, 2, 1),
    ("c3_p2_1x1", 160, 128, 64, 1, 1, 4),
    ("c3_p2_3x3", 160, 64, 64, 3, 1, 3),
    ("p3_down", 160, 128, 256, 3, 2, 1),
    ("c3_p3_1x1", 80, 256, 128, 1, 1, 10),
    ("c3_p3_3x3", 80, 128, 128, 3, 1, 9),
    ("p4_down", 80, 256, 512, 3, 2, 1),
    ("c3_p4_1x1", 40, 512, 256, 1, 1, 10),
    ("c3_p4_3x3", 40, 256, 256, 3, 1, 9),
    ("p5_down", 40, 512, 1024, 3, 2, 1),
    ("c3_p5_1x1", 20, 1024, 512, 1, 1, 4),
    ("c3_p5_3x3", 20, 512, 512, 3, 1, 3),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=16,
                    help="distinct-input conv calls per jit")
    ap.add_argument("--only", type=str, default="",
                    help="substring filter on shape name (smoke tests)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    def make_fn(h, cin, cout, k, s, dtype, acc_dtype):
        pad = k // 2
        ho = (h + 2 * pad - k) // s + 1

        rng = np.random.default_rng(0)
        if dtype == jnp.int8:
            xs = rng.integers(-127, 127, (args.iters, args.batch, h, h, cin),
                              dtype=np.int8)
            w = rng.integers(-127, 127, (k, k, cin, cout), dtype=np.int8)
        else:
            xs = rng.standard_normal(
                (args.iters, args.batch, h, h, cin)).astype(np.float32)
            w = rng.standard_normal((k, k, cin, cout)).astype(np.float32)
        # device_put ONCE; never closure-capture arrays into the jit (they
        # bake into the remote-compiled program — CLAUDE.md)
        xs = jax.device_put(jnp.asarray(xs).astype(dtype))
        w = jax.device_put(jnp.asarray(w).astype(dtype))

        @jax.jit
        def run(xs, w):
            def one(acc, x):
                y = jax.lax.conv_general_dilated(
                    x, w, window_strides=(s, s),
                    padding=[(pad, pad), (pad, pad)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc_dtype)
                return acc + y, 0

            acc0 = jnp.zeros((args.batch, ho, ho, cout), acc_dtype)
            acc, _ = jax.lax.scan(one, acc0, xs)
            return acc[0, 0, 0, 0]

        return run, xs, w

    def timed(run, xs, w, reps):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(xs, w)
        np.asarray(out)  # force completion (axon sync caveat)
        return time.perf_counter() - t0

    rows, tot = [], {"bf16": 0.0, "int8": 0.0}
    shapes = [r for r in SHAPES if args.only in r[0]]
    for name, h, cin, cout, k, s, count in shapes:
        row = {"shape": name, "HxCinxCout": f"{h}x{cin}->{cout} k{k}s{s}",
               "count": count}
        for tag, dt, at in (("bf16", jnp.bfloat16, jnp.float32),
                            ("int8", jnp.int8, jnp.int32)):
            try:
                run, xs, w = make_fn(h, cin, cout, k, s, dt, at)
                timed(run, xs, w, 1)  # compile + warmup
                t1 = timed(run, xs, w, 2)
                t2 = timed(run, xs, w, 6)
                ms = (t2 - t1) / 4 / args.iters * 1e3
                row[f"{tag}_ms"] = round(ms, 3)
                tot[tag] += ms * count
            except Exception as e:  # backend may not lower int8 convs
                row[f"{tag}_ms"] = f"ERROR: {type(e).__name__}: {e}"[:120]
                tot[tag] = float("nan")
        if isinstance(row.get("bf16_ms"), float) and \
                isinstance(row.get("int8_ms"), float) and row["int8_ms"] > 0:
            row["speedup"] = round(row["bf16_ms"] / row["int8_ms"], 2)
        print(json.dumps(row), flush=True)
        rows.append(row)

    summary = {"ladder_bf16_ms": round(tot["bf16"], 2),
               "ladder_int8_ms": round(tot["int8"], 2)}
    if tot["int8"] and tot["int8"] == tot["int8"]:  # not nan
        summary["weighted_speedup"] = round(tot["bf16"] / tot["int8"], 2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
