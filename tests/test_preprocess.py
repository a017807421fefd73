"""Device-side preprocessing vs host letterbox / HSV reference."""

import jax
import numpy as np

from multispectral_object_detection_tpu.data.augment import letterbox
from multispectral_object_detection_tpu.ops.preprocess import (
    hsv_jitter_batch, letterbox_batch, letterbox_params)


def test_letterbox_batch_matches_host():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 480, 640, 3), dtype=np.uint8)
    out = np.asarray(letterbox_batch(imgs, src_hw=(480, 640), img_size=640,
                                     normalize=False))
    ref0, ratio, pad = letterbox(imgs[0], (640, 640), auto=False)
    assert out.shape == (2, 640, 640, 3)
    diff = np.abs(out[0] - ref0.astype(np.float32))
    assert np.mean(diff) < 1.0  # bilinear rounding only
    # pad rows exactly gray
    assert (out[0][:80] == 114.0).all()

    # geometry helper agrees with host letterbox
    (nh, nw), r, (dw, dh) = letterbox_params((480, 640), 640)
    assert (nh, nw) == (480, 640) and r[0] == 1.0 and dh == 80.0


def test_letterbox_batch_upscale_and_normalize():
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (1, 100, 50, 3), dtype=np.uint8)
    out = np.asarray(letterbox_batch(imgs, src_hw=(100, 50), img_size=128))
    assert out.shape == (1, 128, 128, 3)
    assert out.max() <= 1.0 and out.min() >= 0.0


def test_hsv_jitter_batch_sane():
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
    out = np.asarray(hsv_jitter_batch(imgs, np.array([0.015, 0.7, 0.4]),
                                      jax.random.PRNGKey(0)))
    assert out.shape == imgs.shape and out.dtype == np.uint8
    # zero gains -> identity (up to float rounding)
    out0 = np.asarray(hsv_jitter_batch(imgs, np.zeros(3),
                                       jax.random.PRNGKey(0)))
    assert np.mean(np.abs(out0.astype(int) - imgs.astype(int))) < 1.0
