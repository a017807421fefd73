"""Pallas TPU kernel: fused C3 bottleneck (cv1 1x1 + SiLU + cv2 3x3 + SiLU
+ residual) with VMEM-resident activations.

The backbone C3 bottlenecks (reference common.py:99: Bottleneck inside C3,
common.py:131) are two chained convs whose intermediate under XLA
round-trips through HBM and whose 3x3 at small channel counts runs at ~26%
MXU (PERF.md per-op profile). This kernel:

- computes the 1x1 as ONE (H*Wp, C) x (C, C) matmul over the width-padded
  image;
- stores the zero-padded activation as a flattened ((H+3)*(W+2), C) VMEM
  scratch using only CONTIGUOUS row-block stores (partial 3D stores
  compile to a pathological scalar path on this Mosaic toolchain —
  measured round 3, tools/exp_pallas_c3.py history);
- computes the 3x3 as 9 shifted ROW-SLICES of that scratch, each matmul'd
  against its (dy, dx) weight plane — no im2col materialization, no
  relayout (the slice offset (r+dy)*(W+2)+dx linearizes the 2D shift);
- applies SiLU + the residual in-register before one contiguous store.

Inference-only (the training path keeps XLA's fused conv+BN backward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    return x * jax.nn.sigmoid(x)


def bottleneck_ref(x, w1, b1, w2, b2):
    """jnp reference: y = x + silu(conv3x3(silu(conv1x1(x)))) — the
    fused-BN inference form of the C3 Bottleneck (models/layers.py)."""
    z = _silu(jnp.einsum("bhwc,cd->bhwd", x.astype(jnp.float32),
                         w1.astype(jnp.float32)) + b1).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        z, w2, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (x.astype(jnp.float32) + _silu(y + b2)).astype(x.dtype)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref, zpad_ref, *,
            H: int, W: int, C: int, Rt: int):
    Wp = W + 2
    dt = x_ref.dtype

    zpad_ref[0:Wp, :] = jnp.zeros((Wp, C), dt)            # top pad row
    zpad_ref[(H + 1) * Wp:(H + 3) * Wp, :] = jnp.zeros((2 * Wp, C), dt)
    # 1x1 per row chunk: keeps the fp32 dot output and the column-mask
    # iota slab-sized (full-image fp32 temporaries blew the 16 MB scoped
    # VMEM limit inside the flagship program — measured round 3)
    for r0 in range(0, H, Rt):
        x = x_ref[0, r0:r0 + Rt]                   # (Rt, Wp, C), width-padded
        z = jnp.dot(x.reshape(Rt * Wp, C), w1_ref[...],
                    preferred_element_type=jnp.float32) + b1_ref[0]
        # pad columns recomputed to zero (silu(b1) != 0 there)
        col = jax.lax.broadcasted_iota(jnp.int32, (Rt * Wp, C), 0) % Wp
        z = jnp.where((col >= 1) & (col <= W), _silu(z), 0.0).astype(dt)
        zpad_ref[(r0 + 1) * Wp:(r0 + 1 + Rt) * Wp, :] = z

    b2 = b2_ref[0]
    for r0 in range(0, H, Rt):                     # static row chunks
        acc = jnp.zeros((Rt * Wp, C), jnp.float32) + b2
        for t in range(9):
            dy, dx = t // 3, t % 3
            off = (r0 + dy) * Wp + dx              # static row slice
            acc += jnp.dot(zpad_ref[off:off + Rt * Wp, :], w2_ref[t],
                           preferred_element_type=jnp.float32)
        # acc col j is output col j; the last 2 wrap columns are garbage
        y = _silu(acc).reshape(Rt, Wp, C)[:, :W, :]
        res = x_ref[0, r0:r0 + Rt, 1:W + 1, :].astype(jnp.float32)
        out_ref[0, r0:r0 + Rt] = (res + y).astype(dt)


def _pick_row_chunk(H: int) -> int:
    for rt in (40, 32, 20, 16, 10, 8, 5, 4, 2):
        if H % rt == 0 and rt <= H:
            return rt
    return H


@functools.partial(jax.jit, static_argnames=("row_chunk", "interpret"))
def bottleneck_pallas(x, w1, b1, w2, b2, row_chunk: int = 0,
                      interpret: bool = False):
    """y = x + silu(conv3x3(silu(conv1x1(x) + b1)) + b2), NHWC.

    x (B,H,W,C); w1 (C,C); w2 (3,3,C,C) HWIO; b1/b2 (C,) fp32."""
    B, H, W, C = x.shape
    rt = row_chunk or _pick_row_chunk(H)
    w2r = w2.reshape(9, C, C)
    xp = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)))  # width pad (XLA)
    kern = functools.partial(_kernel, H=H, W=W, C=C, Rt=rt)
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
        # image-sized double-buffered IO blocks + scratch exceed the 16 MB
        # default scoped-vmem cap at the flagship's P2 shape (19.6 MB
        # measured); v5e has 128 MB VMEM — raise the cap for this kernel
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(xp, w1, b1.reshape(1, C), w2r, b2.reshape(1, C))
