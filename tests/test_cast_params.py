"""cast_inference_params: bf16 weight storage must be a pure perf lever.

With a bf16 compute dtype every non-normalization param is cast to bf16
inside the jit anyway (flax promotes to the module dtype), so pre-casting
the stored tree must leave the fused-path outputs bitwise identical while
halving the HBM weight traffic. Normalization leaves (bn*/ln*/norm*) stay
fp32 because those modules compute in fp32 on purpose (layers.py Conv,
fusion LayerNorms).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multispectral_object_detection_tpu.models import build_model
from multispectral_object_detection_tpu.models.configs import (
    get_config, yolov5_two_stream)
from multispectral_object_detection_tpu.models.model import (
    cast_inference_params, fuse_conv_bn_params)


@pytest.fixture(scope="module")
def fused_setup():
    model = build_model(yolov5_two_stream("n", nc=3, fusion="transformerx3"),
                        dtype=jnp.bfloat16, fused=True)
    x = jnp.zeros((1, 64, 64, 3))
    ref = build_model(model.spec, dtype=jnp.bfloat16)
    v = jax.jit(lambda r, a, b: ref.init(r, a, b, train=False))(
        jax.random.PRNGKey(3), x, x)
    params = fuse_conv_bn_params(v["params"], v.get("batch_stats", {}))
    return model, params


def test_cast_bitwise_identical_fused_bf16(fused_setup):
    model, params = fused_setup
    cast = cast_inference_params(params, jnp.bfloat16)
    rgb = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                      jnp.float32)
    ir = jnp.asarray(np.random.default_rng(1).random((2, 64, 64, 3)),
                     jnp.float32)

    @jax.jit
    def fwd(p):
        feats = model.apply({"params": p, "batch_stats": {}}, rgb, ir,
                            train=False)
        return model.decode(feats)

    a = np.asarray(fwd(params))
    b = np.asarray(fwd(cast))
    np.testing.assert_array_equal(a, b)


def test_norm_leaves_stay_fp32(fused_setup):
    _, params = fused_setup
    cast = cast_inference_params(params, jnp.bfloat16)
    flat = jax.tree_util.tree_flatten_with_path(cast)[0]
    n_bf16 = n_norm_fp32 = 0
    for path, leaf in flat:
        names = [getattr(k, "key", "") for k in path]
        is_norm = any(isinstance(n, str)
                      and (n.startswith("bn") or n.startswith("ln")
                           or "norm" in n) for n in names)
        if is_norm:
            assert leaf.dtype == jnp.float32, names
            n_norm_fp32 += 1
        elif leaf.dtype == jnp.bfloat16:
            n_bf16 += 1
    assert n_bf16 > 100          # the conv trunk was cast
    assert n_norm_fp32 > 0       # CFT LayerNorms present and preserved


def test_fp32_compute_is_noop():
    cfg = get_config("yolov5n", nc=2)
    model = build_model(cfg, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r, a: model.init(r, a, train=False))(
        jax.random.PRNGKey(0), x)
    out = cast_inference_params(v["params"], jnp.float32)
    assert out is v["params"]
