"""Per-block rematerialization (--remat blocks) is a pure memory/compute
trade: forward, loss and gradients must be bitwise-insensitive to it."""

import jax
import jax.numpy as jnp
import numpy as np

from multispectral_object_detection_tpu.models import build_model
from multispectral_object_detection_tpu.models.configs import get_config
from multispectral_object_detection_tpu.models.detect import anchor_arrays
from multispectral_object_detection_tpu.train.loss import DetectionLoss


def _loss_and_grads(model, variables, rgb, ir, targets, tmask):
    loss_fn = DetectionLoss(nc=2, anchors_px=anchor_arrays(model.spec.anchors),
                            strides=model.spec.strides)

    def loss_of(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables.get("batch_stats", {})},
            rgb, ir, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        total, _ = loss_fn(out, targets, tmask)
        return total

    return jax.jit(jax.value_and_grad(loss_of))(variables["params"])


def test_remat_blocks_matches_baseline():
    cfg = get_config("yolov5n_fusion_add", nc=2)
    base = build_model(cfg, dtype=jnp.float32)
    remat = build_model(cfg, dtype=jnp.float32, remat_blocks=True)

    rng = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    ir = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    variables = jax.jit(lambda: base.init(rng, rgb, ir, train=False))()

    targets = jnp.tile(jnp.asarray([[0, 0, 0.5, 0.5, 0.25, 0.25]],
                                   jnp.float32), (2, 1))
    targets = targets.at[:, 0].set(jnp.arange(2, dtype=jnp.float32))
    tmask = jnp.ones((2,), jnp.float32)

    # param trees are interchangeable: remat is a lifted transform, not a
    # structural change
    lb, gb = _loss_and_grads(base, variables, rgb, ir, targets, tmask)
    lr_, gr_ = _loss_and_grads(remat, variables, rgb, ir, targets, tmask)

    assert np.isfinite(float(lb))
    np.testing.assert_allclose(float(lb), float(lr_), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gb), jax.tree.leaves(gr_)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_blocks_inference_identical():
    cfg = get_config("yolov5n", nc=2)  # single-stream path too
    base = build_model(cfg, dtype=jnp.float32)
    remat = build_model(cfg, dtype=jnp.float32, remat_blocks=True)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    v = jax.jit(lambda: base.init(jax.random.PRNGKey(0), x, train=False))()
    fb = jax.jit(lambda p: base.apply(
        {"params": p, "batch_stats": v.get("batch_stats", {})}, x,
        train=False))(v["params"])
    fr = jax.jit(lambda p: remat.apply(
        {"params": p, "batch_stats": v.get("batch_stats", {})}, x,
        train=False))(v["params"])
    for a, b in zip(jax.tree.leaves(fb), jax.tree.leaves(fr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
