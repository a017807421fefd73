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
- Per-layer weights are STACKED (leading L axis): training runs the block
  stack as one `lax.scan` (single trace, fast compiles); inference can run
  the whole stack as ONE Pallas kernel with VMEM-resident activations
  (ops/pallas_fusion.py) via `use_pallas=True`.
- fused QKV projection + batched-einsum heads (no permute dance); softmax
  and LayerNorm statistics in fp32.
- Dropout (embd/attn/resid 0.1) only when train=True, via flax rng streams.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.attention import adaptive_avg_pool_2d, bilinear_resize_2d

_INIT = nn.initializers.normal(stddev=0.02)


def _ln(x, scale, bias, eps: float = 1e-5):  # torch LayerNorm default eps
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias)


class FusionBlock(nn.Module):
    """Single pre-LN transformer block — retained as the per-layer reference
    implementation (reference myTransformerBlock, models/common.py:516);
    the production path is the stacked scan/Pallas stack below."""

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
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="ln_in")(x.astype(jnp.float32)).astype(self.dtype)
        qkv = nn.Dense(3 * self.d_model, kernel_init=_INIT, dtype=self.dtype,
                       param_dtype=jnp.float32, name="qkv")(h)
        qkv = qkv.reshape(b, n, 3, nh, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(d)), axis=-1)
        if train and self.attn_drop > 0:
            keep = jax.random.bernoulli(self.make_rng("dropout"),
                                        1.0 - self.attn_drop, attn.shape)
            attn = jnp.where(keep, attn / (1.0 - self.attn_drop), 0.0)
        a = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(self.dtype),
                       v).reshape(b, n, c)
        a = nn.Dense(self.d_model, kernel_init=_INIT, dtype=self.dtype,
                     param_dtype=jnp.float32, name="proj")(a)
        a = nn.Dropout(self.resid_drop)(a, deterministic=not train)
        x = x + a
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
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
    use_pallas: bool = False  # fused whole-stack kernel (inference only)

    @nn.compact
    def __call__(self, xs, train: bool = False):
        rgb, ir = xs[0], xs[1]
        b, h, w, c = rgb.shape
        gv, gh = self.vert_anchors, self.horz_anchors
        n_tok = 2 * gv * gh
        L = self.n_layer
        e = self.block_exp

        rgb_p = adaptive_avg_pool_2d(rgb, (gv, gh))  # (B, gv, gh, C)
        ir_p = adaptive_avg_pool_2d(ir, (gv, gh))
        tokens = jnp.concatenate(
            [rgb_p.reshape(b, gv * gh, c), ir_p.reshape(b, gv * gh, c)], axis=1)

        pos = self.param("pos_emb", nn.initializers.zeros, (1, n_tok, c),
                         jnp.float32)
        x = tokens + pos.astype(tokens.dtype)
        x = nn.Dropout(self.embd_drop)(x, deterministic=not train)

        # stacked per-layer parameters (leading L axis)
        ln1 = self.param("ln1", _ln_init, (L, 2, c))
        qkv_w = self.param("qkv_w", _INIT, (L, c, 3 * c), jnp.float32)
        qkv_b = self.param("qkv_b", nn.initializers.zeros, (L, 3 * c),
                           jnp.float32)
        proj_w = self.param("proj_w", _INIT, (L, c, c), jnp.float32)
        proj_b = self.param("proj_b", nn.initializers.zeros, (L, c),
                            jnp.float32)
        ln2 = self.param("ln2", _ln_init, (L, 2, c))
        fc1_w = self.param("fc1_w", _INIT, (L, c, e * c), jnp.float32)
        fc1_b = self.param("fc1_b", nn.initializers.zeros, (L, e * c),
                           jnp.float32)
        fc2_w = self.param("fc2_w", _INIT, (L, e * c, c), jnp.float32)
        fc2_b = self.param("fc2_b", nn.initializers.zeros, (L, c),
                           jnp.float32)

        if self.use_pallas and not train:
            from ..ops.pallas_fusion import fused_cft_stack

            x = fused_cft_stack(
                x, qkv_w.astype(self.dtype), qkv_b.astype(self.dtype),
                proj_w.astype(self.dtype), proj_b.astype(self.dtype),
                fc1_w.astype(self.dtype), fc1_b.astype(self.dtype),
                fc2_w.astype(self.dtype), fc2_b.astype(self.dtype),
                ln1, ln2, num_heads=self.num_heads,
                interpret=jax.default_backend() != "tpu")
        else:
            x = self._scan_stack(x, ln1, qkv_w, qkv_b, proj_w, proj_b, ln2,
                                 fc1_w, fc1_b, fc2_w, fc2_b, train)

        lnf = self.param("ln_f", _ln_init, (2, c))
        x = _ln(x, lnf[0], lnf[1]).astype(self.dtype)

        rgb_t = x[:, : gv * gh, :].reshape(b, gv, gh, c)
        ir_t = x[:, gv * gh :, :].reshape(b, gv, gh, c)
        return (bilinear_resize_2d(rgb_t, (h, w)),
                bilinear_resize_2d(ir_t, (h, w)))

    def _scan_stack(self, x, ln1, qkv_w, qkv_b, proj_w, proj_b, ln2,
                    fc1_w, fc1_b, fc2_w, fc2_b, train: bool):
        b, n, c = x.shape
        nh = self.num_heads
        d = c // nh
        dt = self.dtype
        L = self.n_layer
        use_drop = train and (self.attn_drop > 0 or self.resid_drop > 0)
        base_rng = self.make_rng("dropout") if use_drop else None

        def drop(y, rate, li, slot):
            key = jax.random.fold_in(base_rng, li * 3 + slot)
            keep = jax.random.bernoulli(key, 1.0 - rate, y.shape)
            return jnp.where(keep, y / (1.0 - rate), jnp.zeros_like(y))

        def body(carry, wl):
            (l1, qw, qb, pw, pb, l2, f1w, f1b, f2w, f2b, li) = wl
            x = carry
            hdn = _ln(x, l1[0], l1[1]).astype(dt)
            qkv = (hdn @ qw.astype(dt) + qb.astype(dt)).reshape(b, n, 3, nh, d)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            logits = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                                preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(d)), axis=-1)
            if use_drop:
                attn = drop(attn, self.attn_drop, li, 0)
            a = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(dt), v)
            a = a.reshape(b, n, c) @ pw.astype(dt) + pb.astype(dt)
            if use_drop:
                a = drop(a, self.resid_drop, li, 1)
            x = x + a
            hdn = _ln(x, l2[0], l2[1]).astype(dt)
            t = jax.nn.gelu(hdn @ f1w.astype(dt) + f1b.astype(dt),
                            approximate=False)
            t = t @ f2w.astype(dt) + f2b.astype(dt)
            if use_drop:
                t = drop(t, self.resid_drop, li, 2)
            return x + t, None

        x, _ = jax.lax.scan(body, x, (ln1, qkv_w, qkv_b, proj_w, proj_b, ln2,
                                      fc1_w, fc1_b, fc2_w, fc2_b,
                                      jnp.arange(L)))
        return x


def _ln_init(key, shape, dtype=jnp.float32):
    """(., 2, C): [scale=1, bias=0]."""
    import numpy as np

    out = np.zeros(shape, dtype=np.float32)
    out[..., 0, :] = 1.0
    return jnp.asarray(out, dtype)
