"""Golden tests for box geometry vs hand-computed values and round-trips."""

import jax.numpy as jnp
import numpy as np
import pytest

from multispectral_object_detection_tpu.ops import boxes as B


def test_xywh_xyxy_roundtrip():
    rng = np.random.default_rng(0)
    xywh = np.abs(rng.normal(size=(7, 4))) + 0.1
    out = B.xyxy_to_xywh(B.xywh_to_xyxy(jnp.asarray(xywh)))
    np.testing.assert_allclose(np.asarray(out), xywh, rtol=1e-6, atol=1e-6)


def test_xywhn_to_xyxy_golden():
    b = jnp.asarray([[0.5, 0.5, 0.5, 0.25]])
    out = np.asarray(B.xywhn_to_xyxy(b, w=640, h=480, padw=10, padh=20))
    np.testing.assert_allclose(out, [[170.0, 200.0, 490.0, 320.0]], atol=1e-4)


def test_iou_golden_values():
    a = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    b = jnp.asarray([5.0, 5.0, 15.0, 15.0])
    # inter 25, union 175
    assert abs(float(B.iou(a, b)) - 25.0 / 175.0) < 1e-4
    # identical boxes
    assert abs(float(B.iou(a, a)) - 1.0) < 1e-4
    # disjoint
    c = jnp.asarray([20.0, 20.0, 30.0, 30.0])
    assert abs(float(B.iou(a, c))) < 1e-6


def test_giou_leq_iou_and_golden():
    a = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    c = jnp.asarray([20.0, 0.0, 30.0, 10.0])
    # disjoint horizontally: convex hull 30x10=300, union 200 -> giou = 0 - 100/300
    g = float(B.iou(a, c, kind="giou"))
    assert abs(g + 1.0 / 3.0) < 1e-3


def test_diou_ciou_penalties():
    a = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    b = jnp.asarray([5.0, 5.0, 15.0, 15.0])
    i = float(B.iou(a, b))
    d = float(B.iou(a, b, kind="diou"))
    c = float(B.iou(a, b, kind="ciou"))
    # rho2 = 50, c2 = 450 -> diou = iou - 1/9; same aspect ratio -> v=0 -> ciou == diou
    assert abs(d - (i - 50.0 / 450.0)) < 1e-3
    assert abs(c - d) < 1e-5


def test_ciou_aspect_penalty_sign():
    a = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    sq = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    wide = jnp.asarray([0.0, 2.5, 10.0, 7.5])  # same center, 2:1 aspect
    assert float(B.iou(a, wide, kind="ciou")) < float(B.iou(a, sq, kind="ciou"))


def test_iou_xywh_input_matches_xyxy():
    a_xyxy = jnp.asarray([2.0, 3.0, 8.0, 11.0])
    b_xyxy = jnp.asarray([4.0, 5.0, 12.0, 9.0])
    a_xywh = B.xyxy_to_xywh(a_xyxy)
    b_xywh = B.xyxy_to_xywh(b_xyxy)
    for kind in ["iou", "giou", "diou", "ciou"]:
        v1 = float(B.iou(a_xyxy, b_xyxy, kind=kind))
        v2 = float(B.iou(a_xywh, b_xywh, xyxy=False, kind=kind))
        assert abs(v1 - v2) < 1e-5, kind


def test_pairwise_iou_shape_and_values():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 5.0, 5.0]])
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [100.0, 100.0, 110.0, 110.0]])
    m = np.asarray(B.pairwise_iou(a, b))
    assert m.shape == (2, 3)
    np.testing.assert_allclose(m[0], [1.0, 25.0 / 175.0, 0.0], atol=1e-4)
    np.testing.assert_allclose(m[1, 0], 0.25, atol=1e-4)


def test_pairwise_iou_batched():
    rng = np.random.default_rng(1)
    x = rng.uniform(0, 50, size=(3, 4, 2))
    a = np.concatenate([x, x + rng.uniform(1, 20, size=(3, 4, 2))], axis=-1)
    m = B.pairwise_iou(jnp.asarray(a), jnp.asarray(a))
    diag = np.asarray(jnp.diagonal(m, axis1=-2, axis2=-1))
    np.testing.assert_allclose(diag, 1.0, atol=1e-4)


def test_wh_iou():
    wh1 = jnp.asarray([[10.0, 10.0]])
    wh2 = jnp.asarray([[10.0, 10.0], [5.0, 20.0]])
    m = np.asarray(B.pairwise_wh_iou(wh1, wh2))
    np.testing.assert_allclose(m[0], [1.0, 50.0 / 150.0], atol=1e-4)


def test_rescale_coords_roundtrip():
    # 640x640 letterboxed canvas from a 480x640 (h,w) image: gain 1.0, padh 80
    coords = jnp.asarray([[100.0, 180.0, 200.0, 280.0]])
    out = np.asarray(B.rescale_coords(coords, (640, 640), (480, 640)))
    np.testing.assert_allclose(out, [[100.0, 100.0, 200.0, 200.0]], atol=1e-4)


def test_clip():
    b = jnp.asarray([[-5.0, -5.0, 700.0, 500.0]])
    out = np.asarray(B.clip_xyxy(b, 480, 640))
    np.testing.assert_allclose(out, [[0.0, 0.0, 640.0, 480.0]], atol=1e-6)
