"""NMS correctness vs a plain numpy greedy reference; metrics golden parity."""

import jax.numpy as jnp
import numpy as np

from multispectral_object_detection_tpu.ops.nms import batched_nms
from multispectral_object_detection_tpu.utils.metrics import (
    ap_per_class, compute_ap, fitness, match_predictions, summarize_stats)


def _np_greedy_nms(boxes_xyxy, scores, iou_thres):
    """Plain O(n^2) greedy NMS, torchvision-semantics (desc score, ties by idx)."""
    order = np.lexsort((np.arange(len(scores)), -scores))
    keep = []
    sup = np.zeros(len(scores), dtype=bool)
    for i in order:
        if sup[i]:
            continue
        keep.append(i)
        a = boxes_xyxy[i]
        for j in order:
            if j == i or sup[j]:
                continue
            b = boxes_xyxy[j]
            iw = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
            ih = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
            inter = iw * ih
            ua = ((a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter)
            if ua > 0 and inter / ua > iou_thres:
                sup[j] = True
    return keep


def _make_preds(rng, n, nc):
    """Decoded (n, 5+nc) predictions in xywh + obj + cls probs."""
    cx = rng.uniform(50, 590, n)
    cy = rng.uniform(50, 590, n)
    w = rng.uniform(10, 120, n)
    h = rng.uniform(10, 120, n)
    obj = rng.uniform(0, 1, n)
    cls = rng.dirichlet(np.ones(nc), n)
    return np.concatenate([np.stack([cx, cy, w, h, obj], 1), cls], 1).astype(np.float32)


def test_nms_matches_numpy_reference_single_class():
    rng = np.random.default_rng(3)
    pred = _make_preds(rng, 200, 1)
    det = batched_nms(jnp.asarray(pred[None]), conf_thres=0.1, iou_thres=0.5,
                      multi_label=False, max_det=200, top_k=256)
    got_boxes = np.asarray(det.boxes[0])[np.asarray(det.valid[0])]
    got_scores = np.asarray(det.scores[0])[np.asarray(det.valid[0])]

    conf = pred[:, 4] * pred[:, 5]
    keep_in = conf > 0.1
    boxes = np.stack([pred[:, 0] - pred[:, 2] / 2, pred[:, 1] - pred[:, 3] / 2,
                      pred[:, 0] + pred[:, 2] / 2, pred[:, 1] + pred[:, 3] / 2], 1)
    idx = np.nonzero(keep_in)[0]
    kept = _np_greedy_nms(boxes[idx], conf[idx], 0.5)
    want_boxes = boxes[idx][kept]
    want_scores = conf[idx][kept]

    assert got_boxes.shape[0] == len(kept)
    np.testing.assert_allclose(got_scores, want_scores, rtol=1e-5)
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-4, atol=1e-3)


def test_nms_classes_do_not_suppress_each_other():
    # two identical boxes, different argmax class -> both survive
    pred = np.zeros((1, 2, 7), dtype=np.float32)
    pred[0, :, :4] = [100, 100, 50, 50]
    pred[0, 0, 4] = 0.9
    pred[0, 1, 4] = 0.8
    pred[0, 0, 5:] = [0.9, 0.1]
    pred[0, 1, 5:] = [0.1, 0.9]
    det = batched_nms(jnp.asarray(pred), conf_thres=0.05, iou_thres=0.5,
                      multi_label=False, max_det=10, top_k=16)
    assert int(np.sum(np.asarray(det.valid))) == 2
    # agnostic mode: only one survives
    det2 = batched_nms(jnp.asarray(pred), conf_thres=0.05, iou_thres=0.5,
                       multi_label=False, agnostic=True, max_det=10, top_k=16)
    assert int(np.sum(np.asarray(det2.valid))) == 1


def test_nms_multilabel_expansion():
    # one box confidently two classes -> two detections in multi_label mode
    pred = np.zeros((1, 1, 7), dtype=np.float32)
    pred[0, 0, :4] = [100, 100, 50, 50]
    pred[0, 0, 4] = 0.9
    pred[0, 0, 5:] = [0.8, 0.7]
    det = batched_nms(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.5,
                      multi_label=True, max_det=10, top_k=16)
    assert int(np.sum(np.asarray(det.valid))) == 2
    det1 = batched_nms(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.5,
                       multi_label=False, max_det=10, top_k=16)
    assert int(np.sum(np.asarray(det1.valid))) == 1


def test_nms_scores_sorted_and_padded():
    rng = np.random.default_rng(5)
    pred = _make_preds(rng, 64, 3)
    det = batched_nms(jnp.asarray(pred[None]), conf_thres=0.3, iou_thres=0.45,
                      multi_label=True, max_det=20, top_k=128)
    s = np.asarray(det.scores[0])
    v = np.asarray(det.valid[0])
    assert np.all(np.diff(s[v]) <= 1e-6)
    assert np.all(s[~v] == 0.0)


# ---------------------------------------------------------------------------
# metrics: golden values generated once from the reference utils/metrics.py
# on the inputs reconstructed below (seed 7, 60 preds, 3 classes, 30 labels
# per class).
# ---------------------------------------------------------------------------


def _metrics_inputs():
    rng = np.random.default_rng(7)
    n = 60
    tp = (rng.uniform(size=(n, 10)) > np.linspace(0.3, 0.8, 10)).astype(float)
    tp = np.sort(tp, axis=1)[:, ::-1]
    conf = rng.uniform(0.05, 0.99, size=n)
    pred_cls = rng.integers(0, 3, size=n).astype(float)
    target_cls = np.concatenate([np.zeros(30), np.ones(30), 2 * np.ones(30)])
    return tp.astype(bool), conf, pred_cls, target_cls


def test_ap_per_class_matches_reference_golden():
    tp, conf, pred_cls, target_cls = _metrics_inputs()
    p, r, ap, f1, cls = ap_per_class(tp, conf, pred_cls, target_cls)
    np.testing.assert_allclose(p, [1.0, 1.0, 1.0], atol=1e-8)
    np.testing.assert_allclose(r, [0.56666667, 0.73333333, 0.7], atol=1e-6)
    np.testing.assert_allclose(ap[:, 0], [0.57166667, 0.73833333, 0.705], atol=1e-6)
    np.testing.assert_allclose(ap.mean(1), [0.26775936, 0.30564802, 0.31324113], atol=1e-6)
    np.testing.assert_allclose(f1, [0.72340426, 0.84615385, 0.82352941], atol=1e-6)


def test_compute_ap_perfect_detector():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert abs(compute_ap(rec, prec) - 1.0) < 1e-3


def test_match_predictions_greedy():
    # two preds chase one target; only the first (higher conf) claims it
    tb = np.array([[0.0, 0.0, 10.0, 10.0]])
    tc = np.array([0.0])
    pb = np.array([[0.0, 0.0, 10.0, 10.0], [1.0, 1.0, 11.0, 11.0]])
    pc = np.array([0.0, 0.0])
    correct = match_predictions(pb, pc, tb, tc)
    assert correct[0, 0] and correct[0, -1]   # exact match: TP at all IoUs
    assert not correct[1].any()               # target already claimed
    # wrong class never matches
    correct2 = match_predictions(pb, np.array([1.0, 1.0]), tb, tc)
    assert not correct2.any()


def test_summarize_stats_and_fitness():
    tp, conf, pred_cls, target_cls = _metrics_inputs()
    stats = [(tp, conf, pred_cls, list(target_cls))]
    out = summarize_stats(stats, nc=3)
    assert abs(out["map50"] - np.mean([0.57166667, 0.73833333, 0.705])) < 1e-6
    assert out["nt"].tolist() == [30, 30, 30]
    f = fitness(out["mp"], out["mr"], out["map50"], out["map"])
    assert 0.0 < f < 1.0


def test_nms_hybrid_labels_injected():
    """save_hybrid: GT labels enter as unit-confidence candidates."""
    pred = np.zeros((1, 4, 7), dtype=np.float32)  # all below conf
    labels = np.zeros((1, 2, 5), dtype=np.float32)
    labels[0, 0] = [1, 100, 100, 40, 40]
    labels[0, 1] = [0, 300, 300, 60, 60]
    lm = np.array([[1.0, 1.0]], dtype=np.float32)
    det = batched_nms(jnp.asarray(pred), conf_thres=0.25, iou_thres=0.5,
                      multi_label=False, max_det=10, top_k=16,
                      labels=jnp.asarray(labels), labels_mask=jnp.asarray(lm))
    v = np.asarray(det.valid[0])
    assert int(v.sum()) == 2
    assert set(np.asarray(det.classes[0])[v].tolist()) == {0, 1}
    np.testing.assert_allclose(np.asarray(det.scores[0])[v], 1.0, atol=1e-6)
