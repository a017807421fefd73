"""Bounded experiment: Pallas fused C3 bottleneck (PERF.md round-2 lever #1).

Target: the flagship's P2-stage C3 bottleneck cluster — 6 fused
cv1(1x1,64)+SiLU+cv2(3x3,64)+SiLU+residual ops on (16,160,160,64) at 26%
MXU under XLA (0.64 ms each, per-op profile in PERF.md). Hypothesis: a
Pallas kernel that keeps the activation in VMEM across both convs and
computes the 3x3 as 9 shifted matmuls over a zero-padded FLATTENED buffer
(every tap is a pure row-slice of one (H+3)*(W+2) x C array — no im2col
materialization, no relayout) reaches the ~45% MXU ceiling that K=N=64
matmul shapes allow.

Run on the real TPU:  python tools/exp_pallas_c3.py [--fp32] [--chain 3]
Correctness gate first (vs the jnp reference), then two-run-length timing
(the bench.py methodology — block_until_ready returns early on axon).
CPU check: python tools/exp_pallas_c3.py --interpret --batch 2 --hw 32
"""

from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402,F401
import jax.numpy as jnp  # noqa: E402

from multispectral_object_detection_tpu.ops.pallas_c3 import (  # noqa: E402
    bottleneck_pallas, bottleneck_ref)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--hw", type=int, default=160)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--chain", type=int, default=3,
                    help="number of chained bottlenecks (C3-L has 3)")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--row-chunk", type=int, default=40)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpreter correctness check only")
    args = ap.parse_args()

    dt = jnp.float32 if args.fp32 else jnp.bfloat16
    rng = np.random.default_rng(0)
    B, S, C = args.batch, args.hw, args.c
    x = jnp.asarray(rng.normal(size=(B, S, S, C)) * 0.5, dt)
    ws = []
    for _ in range(args.chain):
        ws.append((jnp.asarray(rng.normal(size=(C, C)) * 0.1, dt),
                   jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32),
                   jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, dt),
                   jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)))

    @jax.jit
    def chain_ref(x):
        for w1, b1, w2, b2 in ws:
            x = bottleneck_ref(x, w1, b1, w2, b2).astype(dt)
        return x

    @jax.jit
    def chain_pl(x):
        for w1, b1, w2, b2 in ws:
            x = bottleneck_pallas(x, w1, b1, w2, b2,
                                  row_chunk=args.row_chunk,
                                  interpret=args.interpret)
        return x

    ref = np.asarray(chain_ref(x), np.float32)
    got = np.asarray(chain_pl(x), np.float32)
    err = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
    print(f"correctness: max rel err {err:.2e}")
    assert err < (1e-5 if args.fp32 else 2e-2), "kernel mismatch"
    if args.interpret:
        print("interpret-mode check OK")
        return

    def timed(fn, n):
        t0 = time.perf_counter()
        y = x
        for _ in range(n):
            y = fn(y)
        np.asarray(y[0, 0, 0])  # force completion through the tunnel
        return time.perf_counter() - t0

    for name, fn in (("XLA", chain_ref), ("pallas", chain_pl)):
        timed(fn, 2)
        ts = timed(fn, args.steps // 3)
        tl = timed(fn, args.steps)
        dtt = (tl - ts) / (args.steps - args.steps // 3) * 1e3
        flops = args.chain * B * S * S * 2 * (C * C + 9 * C * C)
        print(f"{name}: {dtt:.3f} ms/chain-{args.chain}  "
              f"({flops / (dtt / 1e3) / 1e12:.1f} TF/s)")


if __name__ == "__main__":
    main()
