"""StableHLO export + TTA inference tests (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multispectral_object_detection_tpu.models import build_model
from multispectral_object_detection_tpu.models.configs import (
    yolov5, yolov5_two_stream)


def test_stablehlo_export_roundtrip(tmp_path):
    from jax import export as jexport

    model = build_model(yolov5("n", nc=2))
    x = jnp.zeros((1, 64, 64, 3), jnp.uint8)
    v = model.init(jax.random.PRNGKey(0), x.astype(jnp.float32))

    def fn(rgb):
        feats = model.apply(v, rgb.astype(jnp.float32) / 255.0)
        return model.decode(feats)

    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.uint8))
    blob = exported.serialize()
    assert len(blob) > 1000

    reloaded = jexport.deserialize(blob)
    out1 = np.asarray(fn(x))
    out2 = np.asarray(reloaded.call(x))
    np.testing.assert_allclose(out1, out2, rtol=1e-5, atol=1e-5)


def test_tta_forward_shapes_and_flip_consistency():
    from multispectral_object_detection_tpu.train.tta import tta_forward

    model = build_model(yolov5_two_stream("n", nc=1, fusion="add"))
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(1), x, x)

    d = tta_forward(model, v["params"], v["batch_stats"], x, x)
    base = model.decode(model.apply(v, x, x))
    n_base = base.shape[1]
    assert d.shape[0] == 1 and d.shape[2] == 6
    assert d.shape[1] > n_base  # three scales concatenated

    # scale-1.0 slice must exactly equal the plain forward
    np.testing.assert_allclose(np.asarray(d[:, :n_base]), np.asarray(base),
                               rtol=1e-5, atol=1e-5)

    # the flipped pass maps x back into the same canvas range
    xs = np.asarray(d[..., 0])
    assert xs.min() > -70 and xs.max() < 140
