"""Post-training weights-only int8 quantization for the inference build.

The reference's low-precision inference path is cuDNN fp16 (`model.half()`,
test.py:66-68). On TPU the equivalent baseline is bf16 weight storage
(model.cast_inference_params); this module goes one step further: conv and
dense kernels are stored as int8 with a per-output-channel fp32 scale,
halving the weight bytes again (flagship: 206 MB instead of 412 MB in HBM
and over the host tunnel). Dequantization happens on device inside the jit
(one convert+multiply fusion per kernel); biases, BN/LN parameters and
statistics stay fp32/bf16 untouched.

Symmetric per-output-channel quantization: for a kernel K with output
channels on the LAST axis (flax convention: conv HWIO, dense (in, out)),
    scale[c] = max|K[..., c]| / 127
    q[..., c] = round(K[..., c] / scale[c])  in [-127, 127]
so dequant(q, scale) = q * scale reproduces K within 0.4% per-channel
relative step. YOLO-family weight distributions are well-behaved (no
outlier channels), so weight-only int8 costs ~0 mAP (measured in
tests/test_quantize.py and PERF.md round 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# flax param-tree leaf names that hold matmul/conv right-hand sides
_KERNEL_NAMES = ("kernel",)


def _is_kernel_path(path) -> bool:
    name = getattr(path[-1], "key", "")
    return isinstance(name, str) and name in _KERNEL_NAMES


def quantize_int8(params):
    """float param tree -> int8 param tree.

    Every `kernel` leaf with ndim >= 2 becomes a dict
    ``{"q": int8 array, "s": fp32 per-output-channel scale}``; all other
    leaves pass through unchanged. Structure is otherwise preserved so
    `dequantize_int8` restores a tree `model.apply` accepts.
    """

    def quant(path, x):
        if not (_is_kernel_path(path) and hasattr(x, "ndim") and x.ndim >= 2
                and jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)):
            return x
        w = jnp.asarray(x, jnp.float32)
        amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)),
                       keepdims=True)
        scale = jnp.where(amax > 0, amax / 127.0, 1.0)
        q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
        return {"q": q, "s": scale}

    return jax.tree_util.tree_map_with_path(
        quant, params, is_leaf=lambda x: not isinstance(x, dict))


def dequantize_int8(qparams, dtype=jnp.bfloat16):
    """int8 param tree -> compute-dtype tree (call INSIDE the jit so the
    convert+scale fuses on device and params live in HBM as int8)."""

    def is_q(x):
        return (isinstance(x, dict) and set(x.keys()) == {"q", "s"}
                and not isinstance(x["q"], dict))

    def dequant(x):
        if is_q(x):
            return (x["q"].astype(dtype) * x["s"].astype(dtype))
        return x

    return jax.tree_util.tree_map(dequant, qparams, is_leaf=is_q)


def quantized_bytes(qparams) -> int:
    """Total parameter bytes of a quantized tree (for reporting)."""
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(qparams)
               if hasattr(x, "dtype"))
