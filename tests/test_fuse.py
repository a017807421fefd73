"""BN-folding (inference fuse) parity test."""

import jax
import jax.numpy as jnp
import numpy as np

from multispectral_object_detection_tpu.models import build_model
from multispectral_object_detection_tpu.models.configs import yolov5
from multispectral_object_detection_tpu.models.model import (
    fuse_conv_bn, fuse_conv_bn_params)


def test_fused_model_matches_unfused():
    model = build_model(yolov5("n", nc=2))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(1), x)

    # make BN stats non-trivial (fresh init has mean 0 / var 1)
    stats = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(2), a.shape)
        if a.ndim else a, v["batch_stats"])
    ref = model.apply({"params": v["params"], "batch_stats": stats}, x)

    fused_model = build_model(model.spec, fused=True)
    fused_params = fuse_conv_bn_params(v["params"], stats)
    out = fused_model.apply({"params": fused_params, "batch_stats": {}}, x)

    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_model_with_live_bn():
    """Configs whose BN is NOT conv-adjacent (BottleneckCSP holds a bare
    nn.BatchNorm) must keep those stats live after fusing — the residual
    stats returned by fuse_conv_bn (ADVICE round-1: `stats = {}` crashed
    these configs)."""
    cfg = {
        "nc": 2, "depth_multiple": 1.0, "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23],
                    [30, 61, 62, 45, 59, 119],
                    [116, 90, 156, 198, 373, 326]],
        "backbone": [
            [-1, 1, "Focus", [16, 3]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "BottleneckCSP", [32]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [
            [[2, 3, 4], 1, "Detect", ["nc", "anchors"]],
        ],
    }
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(1), x)
    stats = jax.tree.map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(2), a.shape)
        if a.ndim else a, v["batch_stats"])
    ref = model.apply({"params": v["params"], "batch_stats": stats}, x)

    fused_model = build_model(model.spec, fused=True)
    fused_params, residual = fuse_conv_bn(v["params"], stats)
    # the bare BN of BottleneckCSP survives in the residual stats
    leaves = jax.tree_util.tree_flatten_with_path(residual)[0]
    assert leaves, "residual stats must keep the BottleneckCSP BN"
    out = fused_model.apply(
        {"params": fused_params, "batch_stats": residual}, x)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_fused_param_structure():
    model = build_model(yolov5("n", nc=2))
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    fp = fuse_conv_bn_params(v["params"], v["batch_stats"])
    flat = jax.tree_util.tree_flatten_with_path(fp)[0]
    names = ["/".join(str(getattr(k, "key", k)) for k in path)
             for path, _ in flat]
    assert not any("bn" in n for n in names), [n for n in names if "bn" in n][:4]
    assert any(n.endswith("conv/bias") for n in names)
