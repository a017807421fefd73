"""Grad-CAM (utils/gradcam.py) + the model tap hook it rides.

The reference ships utils/gradcam.py (a channel-sum activation CAM,
imported nowhere); ours adds true Grad-CAM via a differentiable tap on any
graph node. CPU, nano scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multispectral_object_detection_tpu.models import build_model
from multispectral_object_detection_tpu.models.configs import yolov5_two_stream
from multispectral_object_detection_tpu.utils.gradcam import (
    compute_cam, overlay_cam)


@pytest.fixture(scope="module")
def nano():
    model = build_model(yolov5_two_stream("n", nc=2, fusion="add"))
    rgb = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    ir = jnp.asarray(np.random.RandomState(1).rand(1, 64, 64, 3), jnp.float32)
    var = jax.jit(model.init)(jax.random.PRNGKey(0), rgb, ir)
    return model, var["params"], var["batch_stats"], rgb, ir


def test_tap_zero_is_noop_and_returns_activation(nano):
    model, params, stats, rgb, ir = nano
    v = {"params": params, "batch_stats": stats}
    plain = model.apply(v, rgb, ir, train=False)
    act0 = model.apply(v, rgb, ir, train=False, tap_index=4)[1]
    out, act = model.apply(v, rgb, ir, train=False, tap_index=4,
                           tap=jnp.zeros_like(act0))
    for a, b in zip(plain, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert act.ndim == 4 and act.shape[0] == 1


def test_tap_perturbation_propagates(nano):
    model, params, stats, rgb, ir = nano
    v = {"params": params, "batch_stats": stats}
    plain = model.apply(v, rgb, ir, train=False)
    out, act = model.apply(v, rgb, ir, train=False, tap_index=4,
                           tap=jnp.full(
                               model.apply(v, rgb, ir, train=False,
                                           tap_index=4)[1].shape, 0.5))
    assert not np.allclose(np.asarray(plain[0]), np.asarray(out[0]))
    assert np.asarray(act).max() != 0


def test_tap_bad_index_raises(nano):
    model, params, stats, rgb, ir = nano
    with pytest.raises(ValueError, match="not a node"):
        model.apply({"params": params, "batch_stats": stats}, rgb, ir,
                    train=False, tap_index=999)


@pytest.mark.parametrize("mode", ["grad", "sum"])
def test_compute_cam_contract(nano, mode):
    model, params, stats, rgb, ir = nano
    cam = np.asarray(compute_cam(model, params, stats, rgb, ir, layer=4,
                                 mode=mode))
    assert cam.ndim == 3 and cam.shape[0] == 1
    assert np.isfinite(cam).all()
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


def test_grad_mode_uses_gradients(nano):
    """grad and sum CAMs must differ — grad weights channels by d(score)/dA."""
    model, params, stats, rgb, ir = nano
    g = np.asarray(compute_cam(model, params, stats, rgb, ir, layer=4))
    s = np.asarray(compute_cam(model, params, stats, rgb, ir, layer=4,
                               mode="sum"))
    assert g.shape == s.shape
    assert not np.allclose(g, s)


def test_class_conditional_cam(nano):
    model, params, stats, rgb, ir = nano
    c0 = np.asarray(compute_cam(model, params, stats, rgb, ir, layer=6,
                                class_id=0))
    c1 = np.asarray(compute_cam(model, params, stats, rgb, ir, layer=6,
                                class_id=1))
    assert np.isfinite(c0).all() and np.isfinite(c1).all()
    assert not np.allclose(c0, c1)


def test_overlay_cam_shapes():
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    img = np.random.RandomState(0).randint(0, 255, (96, 128, 3), np.uint8)
    cam = np.random.RandomState(1).rand(8, 8).astype(np.float32)
    out = overlay_cam(img, cam)
    assert out.shape == img.shape and out.dtype == np.uint8
