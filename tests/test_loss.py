"""Golden parity test of the detection loss vs the reference ComputeLoss.

The golden numbers were generated once by running the reference
utils/loss.py:88 ComputeLoss under torch-cpu on the exact inputs
reconstructed below (same seed/shapes/targets): nc=3, na=3,
anchors = COCO anchors / stride, hyp = scratch defaults, gr=1.0,
feats ~ N(0,1) with seed 42, 7 targets over batch 2.

    total   = 11.45723724
    box     = 0.13493280
    obj     = 4.30005693
    cls     = 1.29362893
"""

import jax.numpy as jnp
import numpy as np

from multispectral_object_detection_tpu.train.loss import DetectionLoss, LossHyp

ANCHORS = np.array(
    [[10, 13, 16, 30, 33, 23],
     [30, 61, 62, 45, 59, 119],
     [116, 90, 156, 198, 373, 326]], dtype=np.float32).reshape(3, 3, 2)

TARGETS = np.array([
    [0, 0, 0.50, 0.50, 0.20, 0.30],
    [0, 1, 0.25, 0.75, 0.10, 0.10],
    [0, 2, 0.06, 0.06, 0.12, 0.12],
    [1, 0, 0.90, 0.10, 0.40, 0.20],
    [1, 1, 0.52, 0.48, 0.80, 0.60],
    [1, 2, 0.50, 0.03, 0.05, 0.05],
    [1, 0, 0.97, 0.97, 0.06, 0.09],
], dtype=np.float32)


def _make_feats():
    rng = np.random.default_rng(42)
    B, na, no = 2, 3, 8
    return [jnp.asarray(rng.normal(size=(B, ny, nx, na, no)).astype(np.float32))
            for ny, nx in [(8, 8), (4, 4), (2, 2)]]


def test_loss_matches_reference_golden():
    feats = _make_feats()
    loss_fn = DetectionLoss(nc=3, anchors_px=ANCHORS, strides=(8, 16, 32))
    total, comps = loss_fn(feats, jnp.asarray(TARGETS),
                           jnp.ones((TARGETS.shape[0],)))
    assert abs(float(comps["box"]) - 0.13493280) < 2e-5
    assert abs(float(comps["obj"]) - 4.30005693) < 2e-5
    assert abs(float(comps["cls"]) - 1.29362893) < 2e-5
    assert abs(float(total) - 11.45723724) < 1e-4


def test_loss_padding_invariance():
    """Adding masked-out padding rows must not change the loss."""
    feats = _make_feats()
    loss_fn = DetectionLoss(nc=3, anchors_px=ANCHORS, strides=(8, 16, 32))
    t1 = jnp.asarray(TARGETS)
    m1 = jnp.ones((t1.shape[0],))
    pad = jnp.zeros((5, 6))
    t2 = jnp.concatenate([t1, pad], axis=0)
    m2 = jnp.concatenate([m1, jnp.zeros((5,))], axis=0)
    tot1, _ = loss_fn(feats, t1, m1)
    tot2, _ = loss_fn(feats, t2, m2)
    assert abs(float(tot1) - float(tot2)) < 1e-5


def test_loss_no_targets():
    """Zero valid targets: box/cls are 0, obj trains toward background."""
    feats = _make_feats()
    loss_fn = DetectionLoss(nc=3, anchors_px=ANCHORS, strides=(8, 16, 32))
    t = jnp.zeros((4, 6))
    m = jnp.zeros((4,))
    total, comps = loss_fn(feats, t, m)
    assert float(comps["box"]) == 0.0
    assert float(comps["cls"]) == 0.0
    assert float(comps["obj"]) > 0.0
    assert np.isfinite(float(total))


def test_loss_differentiable():
    import jax

    feats = _make_feats()
    loss_fn = DetectionLoss(nc=3, anchors_px=ANCHORS, strides=(8, 16, 32))

    def f(scale):
        scaled = [x * scale for x in feats]
        total, _ = loss_fn(scaled, jnp.asarray(TARGETS),
                           jnp.ones((TARGETS.shape[0],)))
        return total

    g = jax.grad(f)(1.0)
    assert np.isfinite(float(g)) and abs(float(g)) > 0.0


def test_single_class_skips_cls_loss():
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(size=(1, ny, nx, 3, 6)).astype(np.float32))
             for ny, nx in [(8, 8), (4, 4), (2, 2)]]
    loss_fn = DetectionLoss(nc=1, anchors_px=ANCHORS, strides=(8, 16, 32))
    t = jnp.asarray([[0, 0, 0.5, 0.5, 0.2, 0.2]], dtype=jnp.float32)
    total, comps = loss_fn(feats, t, jnp.ones((1,)))
    assert float(comps["cls"]) == 0.0
    assert float(comps["box"]) > 0.0


def test_scale_gains_matches_reference_formula():
    """Reference train.py:661-663: gains are rescaled to layers / classes /
    image size before ComputeLoss is built. Round-3 regression: training
    without this over-weights obj by (640/imgsz)^2 and cls by 80/nc."""
    from multispectral_object_detection_tpu.train.loss import (LossHyp,
                                                               scale_gains)

    h = scale_gains(LossHyp(), nc=2, img_size=160, nl=3)
    assert abs(h.box - 0.05) < 1e-9            # 0.05 * 3/3
    assert abs(h.cls - 0.0125) < 1e-9          # 0.5 * 2/80 * 3/3
    assert abs(h.obj - 0.0625) < 1e-9          # 1.0 * (160/640)^2 * 3/3
    # P6-style 4-layer head at 1280px, nc=80
    h = scale_gains(LossHyp(), nc=80, img_size=1280, nl=4)
    assert abs(h.box - 0.05 * 0.75) < 1e-9
    assert abs(h.cls - 0.5 * 0.75) < 1e-9
    assert abs(h.obj - 1.0 * 4.0 * 0.75) < 1e-9
    # non-gain fields untouched
    assert h.anchor_t == 4.0 and h.gr == 1.0
