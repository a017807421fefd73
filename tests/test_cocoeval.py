"""Internal COCO-protocol bbox evaluator (utils/cocoeval.py)."""

import numpy as np

from multispectral_object_detection_tpu.utils.cocoeval import (
    _iou_xywh, coco_eval_bbox)


def test_iou_xywh():
    a = np.asarray([[0.0, 0, 10, 10]])
    b = np.asarray([[5.0, 0, 10, 10], [0.0, 0, 10, 10], [20.0, 20, 5, 5]])
    iou = _iou_xywh(a, b)[0]
    np.testing.assert_allclose(iou, [50 / 150, 1.0, 0.0], atol=1e-9)


def test_perfect_detection():
    gt = [{"image_id": 1, "category_id": 0, "bbox": [10, 10, 20, 20]}]
    det = [{"image_id": 1, "category_id": 0, "bbox": [10, 10, 20, 20],
            "score": 0.9}]
    r = coco_eval_bbox(gt, det)
    assert r["AP50"] == 1.0 and r["AP75"] == 1.0 and r["AP"] == 1.0


def test_iou_cutoff_counts_thresholds():
    # det overlaps gt at IoU exactly 2/3: TP at thrs 0.50-0.65, FP above
    gt = [{"image_id": 1, "category_id": 0, "bbox": [0, 0, 10, 30]}]
    det = [{"image_id": 1, "category_id": 0, "bbox": [0, 0, 10, 20],
            "score": 0.9}]
    r = coco_eval_bbox(gt, det)
    assert r["AP50"] == 1.0
    assert r["AP75"] == 0.0
    np.testing.assert_allclose(r["AP"], 4 / 10, atol=1e-9)


def test_false_positive_ordering():
    """A higher-scored FP before the TP halves interpolated precision."""
    gt = [{"image_id": 1, "category_id": 0, "bbox": [0, 0, 10, 10]}]
    det = [
        {"image_id": 1, "category_id": 0, "bbox": [50, 50, 10, 10],
         "score": 0.95},  # FP
        {"image_id": 1, "category_id": 0, "bbox": [0, 0, 10, 10],
         "score": 0.60},  # TP
    ]
    r = coco_eval_bbox(gt, det)
    # precision at full recall = 1/2, envelope makes all 101 points 0.5
    np.testing.assert_allclose(r["AP50"], 0.5, atol=1e-9)


def test_unseen_category_excluded():
    gt = [{"image_id": 1, "category_id": 0, "bbox": [0, 0, 10, 10]},
          {"image_id": 1, "category_id": 3, "bbox": [30, 30, 5, 5]}]
    det = [{"image_id": 1, "category_id": 0, "bbox": [0, 0, 10, 10],
            "score": 0.9}]
    r = coco_eval_bbox(gt, det)
    # cat 0 perfect, cat 3 has GT but no dets -> AP 0; mean = 0.5
    np.testing.assert_allclose(r["AP50"], 0.5, atol=1e-9)


def test_each_gt_matched_once():
    gt = [{"image_id": 1, "category_id": 0, "bbox": [0, 0, 10, 10]}]
    det = [{"image_id": 1, "category_id": 0, "bbox": [0, 0, 10, 10],
            "score": 0.9},
           {"image_id": 1, "category_id": 0, "bbox": [1, 0, 10, 10],
            "score": 0.8}]  # overlaps same GT -> FP
    r = coco_eval_bbox(gt, det)
    # envelope: pr=[1.0, 0.5] rc=[1.0, 1.0]; at every recall point the
    # first index with rc >= t is the TP -> precision 1.0
    np.testing.assert_allclose(r["AP50"], 1.0, atol=1e-9)
