"""Pallas TPU kernel: the full 8-layer CFT token transformer in ONE kernel.

The CFT fusion stage runs 8 pre-LN transformer layers over (B, 128, C)
tokens (models/fusion.py). Under XLA each matmul round-trips activations
through HBM; here the token activations stay resident in VMEM across ALL
layers while per-layer weights stream in via the pallas grid pipeline
(grid=(L,), weight BlockSpecs indexed by layer -> automatic double-buffered
DMA overlap).

Numerics match FusionBlock (inference mode): LN statistics in fp32, QK^T
logits accumulated in fp32, bf16/fp32 matmuls per the input dtype.
Attention is computed per (image, head) with static loops — N=128 tokens
and D=C/8 head width map directly onto MXU tiles.

Use `fused_cft_stack_reference` for the pure-jnp equivalent; tests compare
the two in interpret mode on CPU and the TPU path validates at runtime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| < 1.5e-7 — below bf16
    resolution); Mosaic has no erf/erfc primitive."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
                + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact(x):
    """Exact-form GELU via the polynomial erf (matches torch GELU to ~1e-7)."""
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + _erf(xf / jnp.sqrt(jnp.float32(2.0))))).astype(x.dtype)


def _ln(x32, scale, bias, eps=1e-5):  # torch LayerNorm default eps
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _kernel(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, w1_ref, b1_ref,
            w2_ref, b2_ref, ln1_ref, ln2_ref, out_ref, xs_ref, o_ref, *,
            num_heads: int, batch: int, n_tok: int, n_layers: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        xs_ref[:] = x_ref[:].astype(jnp.float32)

    C = xs_ref.shape[-1]
    D = C // num_heads
    x = xs_ref[:]  # (B*N, C) fp32 resident

    # --- attention sublayer ---
    h = _ln(x, ln1_ref[0, 0, :], ln1_ref[0, 1, :]).astype(x_ref.dtype)
    qkv = jnp.dot(h, wqkv_ref[0], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[0, 0, :].astype(jnp.float32)).astype(x_ref.dtype)

    # per-(image, head) attention; results stored into a VMEM scratch via
    # static slices (Mosaic has no scatter primitive)
    for b in range(batch):
        rows = slice(b * n_tok, (b + 1) * n_tok)
        for hh in range(num_heads):
            q = qkv[rows, hh * D:(hh + 1) * D]
            k = qkv[rows, C + hh * D:C + (hh + 1) * D]
            v = qkv[rows, 2 * C + hh * D:2 * C + (hh + 1) * D]
            logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
            logits = logits / jnp.sqrt(jnp.float32(D))
            att = jax.nn.softmax(logits, axis=-1).astype(x_ref.dtype)
            o_ref[rows, hh * D:(hh + 1) * D] = jnp.dot(
                att, v, preferred_element_type=jnp.float32).astype(x_ref.dtype)
    proj = jnp.dot(o_ref[:], wp_ref[0],
                   preferred_element_type=jnp.float32)
    x = x + proj + bp_ref[0, 0, :].astype(jnp.float32)

    # --- MLP sublayer ---
    h2 = _ln(x, ln2_ref[0, 0, :], ln2_ref[0, 1, :]).astype(x_ref.dtype)
    t = jnp.dot(h2, w1_ref[0], preferred_element_type=jnp.float32)
    t = _gelu_exact(t + b1_ref[0, 0, :].astype(jnp.float32)).astype(x_ref.dtype)
    t2 = jnp.dot(t, w2_ref[0], preferred_element_type=jnp.float32)
    x = x + t2 + b2_ref[0, 0, :].astype(jnp.float32)

    xs_ref[:] = x

    @pl.when(i == n_layers - 1)
    def _():
        out_ref[:] = x.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_cft_stack(x, wqkv, bqkv, wp, bp, w1, b1, w2, b2, ln1, ln2, *,
                    num_heads: int = 8, interpret: bool = False):
    """x (B, N, C); stacked per-layer weights with leading L axis.

    wqkv (L, C, 3C), bqkv (L, 3C), wp (L, C, C), bp (L, C),
    w1 (L, C, 4C), b1 (L, 4C), w2 (L, 4C, C), b2 (L, C),
    ln1/ln2 (L, 2, C) [scale, bias]. Returns (B, N, C).
    """
    B, N, C = x.shape
    L = wqkv.shape[0]
    x2 = x.reshape(B * N, C)
    # biases as (L, 1, n): Pallas TPU blocks need the 2nd-to-last dim of a
    # block to divide 8 or equal the array dim — (1, n) blocks of (L, n) fail
    bqkv = bqkv.reshape(L, 1, -1)
    bp = bp.reshape(L, 1, -1)
    b1 = b1.reshape(L, 1, -1)
    b2 = b2.reshape(L, 1, -1)

    def spec(shape3):
        return pl.BlockSpec((1,) + shape3, lambda i: (i,) + (0,) * len(shape3),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=num_heads, batch=B, n_tok=N,
                          n_layers=L),
        grid=(L,),
        in_specs=[
            pl.BlockSpec((B * N, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # x
            spec((C, 3 * C)), spec((1, 3 * C)),             # wqkv, bqkv
            spec((C, C)), spec((1, C)),                     # wp, bp
            spec((C, 4 * C)), spec((1, 4 * C)),             # w1, b1
            spec((4 * C, C)), spec((1, C)),                 # w2, b2
            spec((2, C)), spec((2, C)),                     # ln1, ln2
        ],
        out_specs=pl.BlockSpec((B * N, C), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * N, C), x.dtype),
        scratch_shapes=[pltpu.VMEM((B * N, C), jnp.float32),
                        pltpu.VMEM((B * N, C), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(x2, wqkv, bqkv, wp, bp, w1, b1, w2, b2, ln1, ln2)
    return out.reshape(B, N, C)


def fused_cft_stack_reference(x, wqkv, bqkv, wp, bp, w1, b1, w2, b2, ln1,
                              ln2, *, num_heads: int = 8):
    """Pure-jnp twin of the kernel (same layer math as FusionBlock eval)."""
    B, N, C = x.shape
    D = C // num_heads
    xf = x.reshape(B * N, C).astype(jnp.float32)
    L = wqkv.shape[0]
    for i in range(L):
        h = _ln(xf, ln1[i, 0], ln1[i, 1]).astype(x.dtype)
        qkv = (jnp.dot(h, wqkv[i], preferred_element_type=jnp.float32)
               + bqkv[i]).astype(x.dtype)
        qkv4 = qkv.reshape(B, N, 3, num_heads, D)
        q, k, v = qkv4[:, :, 0], qkv4[:, :, 1], qkv4[:, :, 2]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        att = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(D)),
                             axis=-1).astype(x.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", att, v,
                       preferred_element_type=jnp.float32)
        o = o.reshape(B * N, C).astype(x.dtype)
        xf = xf + jnp.dot(o, wp[i], preferred_element_type=jnp.float32) + bp[i]
        h2 = _ln(xf, ln2[i, 0], ln2[i, 1]).astype(x.dtype)
        t = jax.nn.gelu(
            jnp.dot(h2, w1[i], preferred_element_type=jnp.float32) + b1[i],
            approximate=False).astype(x.dtype)
        xf = xf + jnp.dot(t, w2[i], preferred_element_type=jnp.float32) + b2[i]
    return xf.reshape(B, N, C).astype(x.dtype)
