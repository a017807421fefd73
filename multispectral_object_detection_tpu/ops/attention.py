"""Attention compute paths for the CFT fusion transformer.

The fusion attention runs on (B, 128, C) tokens (2 x 8x8 pooled modality
grids; reference models/common.py:549-639). Sequence length is fixed and
tiny, so the hot work is the projections (MXU matmuls) and the softmax; we
provide a reference jnp path (XLA fuses it well) and keep the interface
kernel-shaped so a fused Pallas implementation can slot in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def multi_head_attention(q, k, v, num_heads: int, *, dropout_rate: float = 0.0,
                         dropout_rng=None, dtype=jnp.float32):
    """Scaled dot-product attention over (B, N, C) projected tensors.

    Matches the reference SelfAttention math (models/common.py:475-513):
    softmax(QK^T / sqrt(d_k)) V with d_k = C / num_heads; optional attention
    dropout. Softmax accumulates in fp32.
    """
    b, n, c = q.shape
    d = c // num_heads
    qh = q.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, num_heads, d).transpose(0, 2, 1, 3)

    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(d))
    attn = jax.nn.softmax(logits, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    attn = attn.astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh,
                     preferred_element_type=jnp.float32).astype(dtype)
    return out.transpose(0, 2, 1, 3).reshape(b, n, c)


@functools.lru_cache(maxsize=64)
def _adaptive_avg_matrix(in_size: int, out_size: int):
    """(out, in) row-stochastic numpy matrix reproducing torch
    AdaptiveAvgPool1d. Window for output i spans
    [floor(i*In/Out), ceil((i+1)*In/Out)); matmul against this static matrix
    is the MXU-native form of adaptive pooling.

    Cached as NUMPY (never jnp): caching a traced jnp constant would leak
    tracers across jit/eval_shape scopes.
    """
    import numpy as np

    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -(-((i + 1) * in_size) // out_size)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(in_size: int, out_size: int):
    """(out, in) numpy interpolation matrix reproducing torch F.interpolate
    (mode='bilinear', align_corners=False) along one axis. Cached as numpy —
    see _adaptive_avg_matrix."""
    import numpy as np

    m = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), in_size - 1.0)
        lo = int(np.floor(src))
        hi = min(lo + 1, in_size - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


def adaptive_avg_pool_2d(x, out_hw):
    """NHWC adaptive average pool via two static matmuls (exact torch parity)."""
    h, w = x.shape[1], x.shape[2]
    av = jnp.asarray(_adaptive_avg_matrix(h, out_hw[0])).astype(x.dtype)
    ah = jnp.asarray(_adaptive_avg_matrix(w, out_hw[1])).astype(x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", av, x)
    return jnp.einsum("ow,bhwc->bhoc", ah, x)


def bilinear_resize_2d(x, out_hw):
    """NHWC bilinear resize via two static matmuls (align_corners=False)."""
    h, w = x.shape[1], x.shape[2]
    av = jnp.asarray(_bilinear_matrix(h, out_hw[0])).astype(x.dtype)
    ah = jnp.asarray(_bilinear_matrix(w, out_hw[1])).astype(x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", av, x)
    return jnp.einsum("ow,bhwc->bhoc", ah, x)
