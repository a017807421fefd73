"""Weights-only int8 quantization (models/quantize.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from multispectral_object_detection_tpu.models import build_model
from multispectral_object_detection_tpu.models.configs import get_config
from multispectral_object_detection_tpu.models.model import (
    cast_inference_params, fuse_conv_bn)
from multispectral_object_detection_tpu.models.quantize import (
    dequantize_int8, quantize_int8, quantized_bytes)


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    tree = {
        "conv": {"kernel": jnp.asarray(rng.normal(size=(3, 3, 16, 32)),
                                       jnp.float32),
                 "bias": jnp.asarray(rng.normal(size=(32,)), jnp.float32)},
        "bn": {"scale": jnp.ones((32,)), "bias": jnp.zeros((32,))},
        "dense": {"kernel": jnp.asarray(rng.normal(size=(64, 128)),
                                        jnp.float32)},
    }
    q = quantize_int8(tree)
    # kernels became {"q", "s"}; everything else untouched
    assert set(q["conv"]["kernel"].keys()) == {"q", "s"}
    assert q["conv"]["kernel"]["q"].dtype == jnp.int8
    assert q["dense"]["kernel"]["q"].dtype == jnp.int8
    np.testing.assert_array_equal(q["conv"]["bias"], tree["conv"]["bias"])
    np.testing.assert_array_equal(q["bn"]["scale"], tree["bn"]["scale"])

    d = dequantize_int8(q, jnp.float32)
    for key in ("conv", "dense"):
        w = np.asarray(tree[key]["kernel"], np.float32)
        w2 = np.asarray(d[key]["kernel"], np.float32)
        # symmetric round-to-nearest: |err| <= scale/2 per element
        amax = np.abs(w).max(axis=tuple(range(w.ndim - 1)), keepdims=True)
        assert np.abs(w2 - w).max() <= (amax / 127.0 / 2 + 1e-7).max()
    # int8 bytes ~= 1/4 the fp32 kernel bytes
    n_kernel = tree["conv"]["kernel"].size + tree["dense"]["kernel"].size
    n_other = tree["conv"]["bias"].size + 2 * 32
    assert quantized_bytes(q) < n_kernel * 1.3 + n_other * 4


def test_zero_channel_safe():
    tree = {"conv": {"kernel": jnp.zeros((1, 1, 4, 8), jnp.float32)}}
    d = dequantize_int8(quantize_int8(tree), jnp.float32)
    np.testing.assert_array_equal(np.asarray(d["conv"]["kernel"]), 0.0)


def test_model_forward_close():
    """Quantized fused inference stays close to the bf16-cast baseline on a
    real two-stream graph (the --int8 path of test_cli/bench)."""
    model = build_model(get_config("yolov5n_fusion_add", nc=2),
                        dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    v = jax.jit(lambda r, a, b: model.init(r, a, b, train=False))(rng, x, x)

    fmodel = build_model(model.spec, dtype=jnp.float32, fused=True)
    params, stats = fuse_conv_bn(v["params"], v.get("batch_stats", {}))
    params = cast_inference_params(params, jnp.float32)

    def fwd(p):
        feats = fmodel.apply({"params": p, "batch_stats": stats},
                             x, x, train=False)
        return fmodel.decode(feats)

    base = np.asarray(jax.jit(fwd)(params))
    qp = quantize_int8(params)
    deq = jax.jit(lambda p: fwd(dequantize_int8(p, jnp.float32)))(qp)
    deq = np.asarray(deq)
    assert np.isfinite(deq).all()
    # raw decoded maps: xywh in pixels (<=64), scores in [0,1]
    err = np.abs(deq - base).max()
    assert err < 1.5, f"int8 forward drifted: max abs err {err}"
    # scores shift by < 0.02 on average
    ds = np.abs(deq[..., 4:] - base[..., 4:]).mean()
    assert ds < 0.02, f"mean score drift {ds}"
