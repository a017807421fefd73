"""Cross-Modality Fusion Transformer (CFT) — the core of the paper.

Reference behavior (models/common.py:549-639 `GPT`): both modality feature
maps are adaptively average-pooled to an 8x8 grid, flattened and concatenated
into 128 tokens of width C, run through 8 pre-LN transformer blocks with a
learnable positional embedding, layer-normed, split back into two 8x8xC maps
and bilinearly upsampled to the input resolution.

TPU-first design choices:
- NHWC throughout; pooling and upsampling are *static matmuls* against
  precomputed (out,in) weight matrices — exact torch parity, runs on the MXU,
  no gather/scatter (ops/attention.py).
- Attention + MLP widths stay multiples of 128 for all configs used by the
  paper (C in {256, 512, 1024} after width scaling), mapping cleanly to MXU
  tiles; softmax accumulates in fp32.
- Dropout (embd/attn/resid 0.1) only when train=True, via flax rng streams.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

import jax

from ..ops.attention import adaptive_avg_pool_2d, bilinear_resize_2d

_INIT = nn.initializers.normal(stddev=0.02)


class FusionBlock(nn.Module):
    """Pre-LN transformer block: x + SA(LN(x)); x + MLP(LN(x))
    (reference myTransformerBlock, models/common.py:516)."""

    d_model: int
    num_heads: int
    block_exp: int = 4
    attn_drop: float = 0.1
    resid_drop: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        nh = self.num_heads
        d = c // nh
        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                         name="ln_in")(x.astype(jnp.float32)).astype(self.dtype)
        # fused QKV projection; head split via reshape, attention via
        # batched einsum (no explicit transposes — MXU-friendlier than the
        # torch permute dance, measured on v5e)
        qkv = nn.Dense(3 * self.d_model, kernel_init=_INIT, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(h)
        qkv = qkv.reshape(b, n, 3, nh, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.sqrt(jnp.float32(d))
        attn = jax.nn.softmax(logits, axis=-1)
        if train and self.attn_drop > 0:
            drop_rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(drop_rng, 1.0 - self.attn_drop,
                                        attn.shape)
            attn = jnp.where(keep, attn / (1.0 - self.attn_drop), 0.0)
        attn = attn.astype(self.dtype)
        a = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        a = nn.Dense(self.d_model, kernel_init=_INIT, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj")(a)
        a = nn.Dropout(self.resid_drop)(a, deterministic=not train)
        x = x + a

        h = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                         name="ln_out")(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(self.block_exp * self.d_model, kernel_init=_INIT,
                     dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.d_model, kernel_init=_INIT, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc2")(h)
        h = nn.Dropout(self.resid_drop)(h, deterministic=not train)
        return x + h


class CrossModalFusion(nn.Module):
    """The CFT `GPT` fusion stage (models/common.py:549).

    Input: (rgb, ir) NHWC maps of equal shape (B, H, W, C).
    Output: (rgb_out, ir_out) maps of the same shape.
    """

    d_model: int
    num_heads: int = 8
    block_exp: int = 4
    n_layer: int = 8
    vert_anchors: int = 8
    horz_anchors: int = 8
    embd_drop: float = 0.1
    attn_drop: float = 0.1
    resid_drop: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        rgb, ir = xs[0], xs[1]
        b, h, w, c = rgb.shape
        gv, gh = self.vert_anchors, self.horz_anchors
        n_tok = 2 * gv * gh

        rgb_p = adaptive_avg_pool_2d(rgb, (gv, gh))  # (B, gv, gh, C)
        ir_p = adaptive_avg_pool_2d(ir, (gv, gh))
        tokens = jnp.concatenate(
            [rgb_p.reshape(b, gv * gh, c), ir_p.reshape(b, gv * gh, c)], axis=1
        )  # (B, 2*gv*gh, C)

        pos = self.param("pos_emb", nn.initializers.zeros, (1, n_tok, c), jnp.float32)
        x = tokens + pos.astype(tokens.dtype)
        x = nn.Dropout(self.embd_drop)(x, deterministic=not train)

        for i in range(self.n_layer):
            x = FusionBlock(self.d_model, self.num_heads, self.block_exp,
                            self.attn_drop, self.resid_drop, dtype=self.dtype,
                            name=f"block{i}")(x, train=train)

        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                         name="ln_f")(x.astype(jnp.float32)).astype(self.dtype)

        rgb_t = x[:, : gv * gh, :].reshape(b, gv, gh, c)
        ir_t = x[:, gv * gh :, :].reshape(b, gv, gh, c)
        rgb_out = bilinear_resize_2d(rgb_t, (h, w))
        ir_out = bilinear_resize_2d(ir_t, (h, w))
        return rgb_out, ir_out
