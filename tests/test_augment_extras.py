"""Aux augmentation utilities + merge-NMS + BCEBlur (round-2 capability
fills: reference datasets.py:1388-1968, general.py:530-536, loss.py:15-30)."""

import random

import jax.numpy as jnp
import numpy as np

from multispectral_object_detection_tpu.data.augment import (
    cutout, hist_equalize, mosaic9_pair, replicate)
from multispectral_object_detection_tpu.ops.nms import batched_nms
from multispectral_object_detection_tpu.train.loss import bce_blur_with_logits


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(
        0, 255, (h, w, 3), dtype=np.uint8)


def test_mosaic9_pair_shapes_and_labels():
    rng = random.Random(3)
    s = 64

    def load(i):
        img = _img(48, 56, seed=i)
        lab = np.asarray([[i % 2, 0.5, 0.5, 0.4, 0.4]], np.float32)
        return img, img // 2, lab

    rgb, ir, labels = mosaic9_pair(load, list(range(9)), s,
                                   {"translate": 0.1, "scale": 0.5}, rng)
    assert rgb.shape == (s, s, 3) and ir.shape == (s, s, 3)
    assert labels.ndim == 2 and labels.shape[1] == 5
    if len(labels):
        assert labels[:, 1:].min() >= 0 and labels[:, 1:].max() <= s
    # modalities share geometry: IR was RGB // 2 tile-for-tile
    nz = rgb > 0
    assert np.array_equal(ir[nz[:, :, 0]] > 0, (rgb // 2)[nz[:, :, 0]] > 0)


def test_cutout_drops_obscured():
    rng = random.Random(0)
    im = _img(64, 64)
    labels = np.asarray([[0, 5, 5, 60, 60]], np.float32)
    out = cutout(im, labels.copy(), rng)
    assert out.shape[1] == 5 and len(out) <= 1
    # a label fully covered by a mask is dropped over enough trials
    dropped = False
    for seed in range(30):
        lab = np.asarray([[0, 10, 10, 14, 14]], np.float32)
        if len(cutout(_img(64, 64), lab, random.Random(seed))) == 0:
            dropped = True
            break
    assert dropped


def test_replicate_adds_boxes():
    rng = random.Random(1)
    im = _img(64, 64)
    labels = np.asarray([[0, 2, 2, 10, 10], [1, 20, 20, 50, 50]], np.float32)
    im2, out = replicate(im, labels.copy(), rng)
    assert len(out) == 3  # smallest half (1 of 2) replicated
    assert im2.shape == (64, 64, 3)


def test_hist_equalize_shapes():
    im = _img(32, 48)
    for clahe in (True, False):
        out = hist_equalize(im, clahe=clahe)
        assert out.shape == im.shape and out.dtype == np.uint8


def test_bce_blur_matches_reference_formula():
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 7)).astype(np.float32)
    targets = (rng.random((4, 7)) > 0.5).astype(np.float32)
    got = float(bce_blur_with_logits(jnp.asarray(logits),
                                     jnp.asarray(targets)))
    # replicate utils/loss.py:23-29 in numpy
    p = 1.0 / (1.0 + np.exp(-logits))
    bce = -(targets * np.log(p + 1e-12)
            + (1 - targets) * np.log(1 - p + 1e-12))
    dx = p - targets
    want = float(np.mean(bce * (1 - np.exp((dx - 1) / (0.05 + 1e-4)))))
    assert abs(got - want) < 1e-4


def test_merge_nms_weighted_boxes():
    """Two near-duplicate candidates merge into a score-weighted box;
    an isolated box is dropped when redundant=True (general.py:530-536)."""
    nc = 1
    # rows: [x, y, w, h, obj, cls0]
    pred = np.zeros((1, 4, 5 + nc), np.float32)
    pred[0, 0] = [50, 50, 20, 20, 0.9, 1.0]
    pred[0, 1] = [52, 50, 20, 20, 0.6, 1.0]   # overlaps row 0
    pred[0, 2] = [150, 150, 10, 10, 0.8, 1.0]  # isolated
    det = batched_nms(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45,
                      merge=True, redundant=True, max_det=10)
    v = np.asarray(det.valid[0])
    boxes = np.asarray(det.boxes[0])[v]
    assert v.sum() == 1  # isolated box dropped by redundancy check
    # weighted mean of x-centers: (0.9*50 + 0.6*52) / 1.5 = 50.8
    cx = (boxes[0, 0] + boxes[0, 2]) / 2
    assert abs(cx - 50.8) < 1e-3

    det2 = batched_nms(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45,
                       merge=True, redundant=False, max_det=10)
    assert np.asarray(det2.valid[0]).sum() == 2  # isolated box kept

    det3 = batched_nms(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45,
                       max_det=10)
    assert np.asarray(det3.valid[0]).sum() == 2  # plain NMS unaffected


def test_merge_nms_single_candidate_kept():
    """The reference gates merging on 1 < n < 3000 (general.py:530): a lone
    candidate is returned untouched even with redundant=True, and zero-score
    padded slots never count as supporters (ADVICE round-2)."""
    nc = 1
    pred = np.zeros((1, 6, 5 + nc), np.float32)
    pred[0, 0] = [50, 50, 20, 20, 0.9, 1.0]
    # rows 1..5 stay zero: padded/below-conf slots whose boxes are (0,0,0,0)
    det = batched_nms(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.45,
                      merge=True, redundant=True, max_det=10)
    v = np.asarray(det.valid[0])
    assert v.sum() == 1  # kept, not dropped by a phantom redundancy check
    b = np.asarray(det.boxes[0])[v][0]
    np.testing.assert_allclose(b, [40, 40, 60, 60], atol=1e-3)  # unmerged
