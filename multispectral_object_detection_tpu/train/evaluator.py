"""Evaluator: mAP@{.5,.75,.5:.95} + P/R over a validation loader.

The reference `test.test()` (test.py:21-295) protocol: conf 0.001,
NMS IoU 0.6, multi-label NMS, predictions rescaled to native image space,
greedy TP matching against 10 IoU thresholds, ap_per_class summary.
Decode + NMS run on device (one jitted program per batch shape); matching
and PR accumulation are cheap host numpy.
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import batched_nms
from ..utils.metrics import (IOU_THRESHOLDS, match_predictions,
                             summarize_stats)


def _rescale_to_native(boxes: np.ndarray, canvas_hw, native_hw, ratio_pad):
    """scale_coords (general.py:353) on host numpy."""
    if ratio_pad is None:
        gain = min(canvas_hw[0] / native_hw[0], canvas_hw[1] / native_hw[1])
        padw = (canvas_hw[1] - native_hw[1] * gain) / 2
        padh = (canvas_hw[0] - native_hw[0] * gain) / 2
    else:
        gain = ratio_pad[0][0]
        padw, padh = ratio_pad[1]
    out = boxes.copy()
    out[:, [0, 2]] = (out[:, [0, 2]] - padw) / gain
    out[:, [1, 3]] = (out[:, [1, 3]] - padh) / gain
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, native_hw[1])
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, native_hw[0])
    return out


def evaluate(forward: Callable, params, batch_stats, loader, nc: int, *,
             conf_thres: float = 0.001, iou_thres: float = 0.6,
             single_cls: bool = False, max_det: int = 300,
             top_k: int = 30000, loss_fn=None, hybrid: bool = False,
             per_image: Callable = None, confusion=None,
             curves: bool = False,
             verbose: bool = False) -> Dict[str, object]:
    """Run the full eval protocol; returns the summarize_stats dict plus
    speed counters (+val loss components when loss_fn given).

    hybrid: inject ground-truth labels as unit-confidence NMS candidates
        (the reference's --save-hybrid autolabelling, test.py:117).
    per_image(idx, native_boxes, scores, classes, native_hw): callback per
        image with NMS output rescaled to native space (drives --save-txt).
    confusion: a metrics.ConfusionMatrix accumulated over all images
        (test.py:217).
    curves: include plottable PR/P/R/F1 curves in the result (test.py:
        253-257 via ap_per_class(plot=True))."""
    stats = []
    t_infer = t_nms = 0.0
    seen = 0
    loss_acc = np.zeros(3)
    nb = 0
    jitted_loss = None
    if loss_fn is not None:
        # DetectionLoss.__call__ is hundreds of small jnp ops; unjitted it
        # dispatches op-by-op (minutes over the axon tunnel). One cached jit
        # per loss_fn instance: full batches share a program, the final
        # partial batch compiles once more.
        jitted_loss = getattr(loss_fn, "_jitted", None)
        if jitted_loss is None:
            jitted_loss = jax.jit(loss_fn.__call__)
            loss_fn._jitted = jitted_loss

    for batch in loader:
        rgb = batch["rgb"]
        ir = batch.get("ir", rgb)
        t0 = time.perf_counter()
        dets_flat, feats = forward(params, batch_stats, rgb, ir)
        dets_flat = jax.block_until_ready(dets_flat)
        t1 = time.perf_counter()
        # full reference-width candidate pool: up to 30k pre-NMS boxes at
        # conf 0.001 (general.py:521-522)
        nms_labels = nms_lmask = None
        if hybrid:
            # fold GT labels in as unit-confidence candidates: the collate
            # layout is per-image contiguous blocks of max_labels rows
            B = rgb.shape[0]
            H, W = rgb.shape[1], rgb.shape[2]
            tg = np.asarray(batch["targets"]).reshape(B, -1, 6)
            nms_lmask = np.asarray(batch["tmask"]).reshape(B, -1)
            xywh_px = tg[..., 2:6] * np.array([W, H, W, H], np.float32)
            nms_labels = jnp.asarray(
                np.concatenate([tg[..., 1:2], xywh_px], -1))
            nms_lmask = jnp.asarray(nms_lmask)
        det = batched_nms(dets_flat, conf_thres=conf_thres,
                          iou_thres=iou_thres, multi_label=not single_cls,
                          agnostic=single_cls, max_det=max_det, top_k=top_k,
                          labels=nms_labels, labels_mask=nms_lmask)
        det = jax.block_until_ready(det)
        t2 = time.perf_counter()
        t_infer += t1 - t0
        t_nms += t2 - t1

        if jitted_loss is not None:
            _, comps = jitted_loss(feats, jnp.asarray(batch["targets"]),
                                   jnp.asarray(batch["tmask"]))
            loss_acc += np.array([float(comps["box"]), float(comps["obj"]),
                                  float(comps["cls"])])
            nb += 1

        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        classes = np.asarray(det.classes)
        valid = np.asarray(det.valid)
        targets = np.asarray(batch["targets"])
        tmask = np.asarray(batch["tmask"])
        B, H, W = rgb.shape[0], rgb.shape[1], rgb.shape[2]

        for si in range(B):
            seen += 1
            v = valid[si]
            pb, ps, pc = boxes[si][v], scores[si][v], classes[si][v]
            if single_cls:
                pc = np.zeros_like(pc)
            sel = (targets[:, 0] == si) & (tmask > 0)
            tcls = targets[sel, 1]
            txywh = targets[sel, 2:6] * np.array([W, H, W, H])
            tb = np.stack([txywh[:, 0] - txywh[:, 2] / 2,
                           txywh[:, 1] - txywh[:, 3] / 2,
                           txywh[:, 0] + txywh[:, 2] / 2,
                           txywh[:, 1] + txywh[:, 3] / 2], 1) if len(txywh) else \
                np.zeros((0, 4))
            native_hw, ratio_pad = batch["shapes"][si]
            pb_n = _rescale_to_native(pb, (H, W), native_hw, ratio_pad) \
                if len(pb) else pb
            tb_n = _rescale_to_native(tb, (H, W), native_hw, ratio_pad) \
                if len(tb) else tb
            correct = match_predictions(pb_n, pc.astype(float), tb_n,
                                        tcls.astype(float), IOU_THRESHOLDS)
            stats.append((correct, ps, pc.astype(float), list(tcls)))
            if confusion is not None:
                confusion.process_batch(pb_n, ps, pc.astype(float), tb_n,
                                        tcls.astype(float))
            if per_image is not None:
                per_image(seen - 1, pb_n, ps, pc, native_hw)

    out = summarize_stats(stats, nc, curves=curves)
    if nc == 1 and stats:
        # pedestrian-benchmark log-average miss rate (reference README table)
        from ..utils.metrics import log_average_miss_rate

        tp50 = np.concatenate([s[0][:, 0] for s in stats])
        conf = np.concatenate([s[1] for s in stats])
        n_gt = sum(len(s[3]) for s in stats)
        out["lamr"] = log_average_miss_rate(tp50, conf, seen, n_gt)
    out["seen"] = seen
    out["t_infer_ms"] = 1000.0 * t_infer / max(seen, 1)
    out["t_nms_ms"] = 1000.0 * t_nms / max(seen, 1)
    if loss_fn is not None and nb:
        out["val_loss"] = (loss_acc / nb).tolist()
    return out
