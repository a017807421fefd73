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

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def _silu(x):
    return x * jax.nn.sigmoid(x)


def bottleneck_ref(x, w1, b1, w2, b2):
    """jnp reference: y = x + silu(conv3x3(silu(conv1x1(x)))) (fused-BN
    inference form of the C3 Bottleneck, models/layers.py)."""
    z = _silu(jnp.einsum("bhwc,cd->bhwd", x.astype(jnp.float32),
                         w1.astype(jnp.float32)) + b1).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        z, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return x.astype(jnp.float32) + _silu(y + b2)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, zpad_ref, *,
            H: int, W: int, C: int, Rt: int):
    """One image per grid step. x arrives WIDTH-padded (H, W+2, C) from XLA
    (zero cols at 0 and W+1). zpad scratch is the flattened zero-padded 1x1
    activation ((H+3)*(W+2), C); every store is a CONTIGUOUS row-block
    (Mosaic-friendly — partial 3D stores hang the Mosaic pipeline on this
    toolchain, measured round 3) and every 3x3 tap is a pure row-slice
    matmul'd against its (dy,dx) weight plane."""
    Wp = W + 2
    x = x_ref[0]                                   # (H, Wp, C), width-padded
    dt = x.dtype

    # 1x1 + SiLU over the padded image: one (H*Wp, C) @ (C, C) matmul;
    # pad columns recomputed to zero via an iota mask (silu(b1) != 0 there)
    z = jnp.dot(x.reshape(H * Wp, C), w1_ref[...],
                preferred_element_type=jnp.float32) + b1_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (H * Wp, C), 0) % Wp
    z = jnp.where((col >= 1) & (col <= W), _silu(z), 0.0).astype(dt)

    zpad_ref[0:Wp, :] = jnp.zeros((Wp, C), dt)            # top pad row
    zpad_ref[Wp:(H + 1) * Wp, :] = z
    zpad_ref[(H + 1) * Wp:(H + 3) * Wp, :] = jnp.zeros((2 * Wp, C), dt)

    b2 = b2_ref[0]
    for r0 in range(0, H, Rt):                     # static row chunks
        acc = jnp.zeros((Rt * Wp, C), jnp.float32) + b2
        for t in range(9):
            dy, dx = t // 3, t % 3
            off = (r0 + dy) * Wp + dx              # static row slice
            acc += jnp.dot(zpad_ref[off:off + Rt * Wp, :], w2_ref[t],
                           preferred_element_type=jnp.float32)
        # cols 0..W-1 of acc are outputs for padded cols 1..W shifted by
        # -1 (off includes dx only): acc col j corresponds to output col j,
        # garbage in the last 2 wrap columns — discarded by the slice
        y = _silu(acc).reshape(Rt, Wp, C)[:, :W, :]
        res = x_ref[0, r0:r0 + Rt, 1:W + 1, :].astype(jnp.float32)
        out_ref[0, r0:r0 + Rt] = (res + y).astype(dt)


@functools.partial(jax.jit, static_argnames=("row_chunk", "interpret"))
def bottleneck_pallas(x, w1, b1, w2, b2, row_chunk: int = 40,
                      interpret: bool = False):
    B, H, W, C = x.shape
    w2r = w2.reshape(9, C, C)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))  # width pad (XLA)
    kern = functools.partial(_kernel, H=H, W=W, C=C, Rt=row_chunk)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W + 2, C), lambda b: (b, 0, 0, 0)),
            pl.BlockSpec((C, C), lambda b: (0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
            pl.BlockSpec((9, C, C), lambda b: (0, 0, 0)),
            pl.BlockSpec((1, C), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, H, W, C), lambda b: (b, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        scratch_shapes=[pltpu.VMEM(((H + 3) * (W + 2), C), x.dtype)],
        interpret=interpret,
    )(xp, w1, b1.reshape(1, C), w2r, b2.reshape(1, C))


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
