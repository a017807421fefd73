"""On-device batched non-maximum suppression with static shapes.

Re-designs the reference NMS pipeline (utils/general.py:455-543), which is a
host-side per-image Python loop over `torchvision.ops.nms`, as one jittable,
vmapped program so detection never round-trips to the host:

- candidate building: conf = obj * cls, confidence gating, optional
  multi-label expansion (general.py:496-507), class filtering;
- class-offset trick (boxes + cls * 4096) for per-class NMS in a single
  suppression pass (general.py:525-526);
- greedy suppression as a fori_loop of max_det argmax-and-suppress steps
  (score ties break toward the lower index, matching torchvision's
  stable-sorted behavior);
- fixed-size outputs (max_det rows + validity mask) instead of ragged lists.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .boxes import pairwise_iou, xywh_to_xyxy

_MAX_WH = 4096.0  # class-offset stride (general.py:467)
_NEG = -1e9


class Detections(NamedTuple):
    """Fixed-size per-image detections."""

    boxes: jnp.ndarray   # (..., max_det, 4) xyxy, inference-canvas pixels
    scores: jnp.ndarray  # (..., max_det)
    classes: jnp.ndarray # (..., max_det) int32
    valid: jnp.ndarray   # (..., max_det) bool


def _suppress(boxes, scores, iou_thres: float, max_det: int):
    """Greedy NMS over (K, 4)/(K,) -> indices (max_det,), validity (max_det,).

    A while_loop with early exit: real scenes rarely fill max_det, so the
    sequential argmax-and-suppress chain stops as soon as no candidate
    remains (under vmap the loop runs until every image in the batch is
    done — still far fewer than max_det iterations in practice).
    """

    def cond(carry):
        work, idxs, vals, n, it = carry
        return jnp.logical_and(it < max_det, jnp.max(work) > _NEG / 2)

    def body(carry):
        work, idxs, vals, n, it = carry
        i = jnp.argmax(work)  # first max wins ties, like a stable sort
        v = work[i]
        keep = v > _NEG / 2
        iou = pairwise_iou(boxes[i][None, :], boxes)[0]  # (K,)
        work = jnp.where(iou > iou_thres, _NEG, work)
        work = work.at[i].set(_NEG)
        idxs = idxs.at[n].set(jnp.where(keep, i, 0))
        vals = vals.at[n].set(keep)
        return work, idxs, vals, n + jnp.int32(keep), it + 1

    idxs0 = jnp.zeros((max_det,), dtype=jnp.int32)
    vals0 = jnp.zeros((max_det,), dtype=bool)
    _, idxs, vals, _, _ = jax.lax.while_loop(
        cond, body, (scores, idxs0, vals0, jnp.int32(0), jnp.int32(0)))
    return idxs, vals


def _nms_single(pred, conf_thres: float, iou_thres: float, nc: int,
                multi_label: bool, agnostic: bool, max_det: int, top_k: int,
                class_mask: Optional[jnp.ndarray],
                labels: Optional[jnp.ndarray] = None,
                labels_mask: Optional[jnp.ndarray] = None,
                merge: bool = False, redundant: bool = True):
    """One image: pred (N, 5+nc) decoded [xywh, obj, cls...] -> Detections.

    labels: optional (M, 5) [cls, x, y, w, h] prior labels injected as
    unit-confidence candidates (the `save_hybrid` autolabelling path,
    general.py:483-489)."""
    if labels is not None:
        m = labels.shape[0]
        lab_rows = jnp.zeros((m, pred.shape[1]), pred.dtype)
        lab_rows = lab_rows.at[:, :4].set(labels[:, 1:5])
        lab_rows = lab_rows.at[:, 4].set(jnp.where(labels_mask > 0, 1.0, 0.0))
        cls_onehot = jax.nn.one_hot(labels[:, 0].astype(jnp.int32), nc,
                                    dtype=pred.dtype)
        lab_rows = lab_rows.at[:, 5:].set(cls_onehot)
        pred = jnp.concatenate([pred, lab_rows], axis=0)
    obj = pred[:, 4]
    boxes_xyxy = xywh_to_xyxy(pred[:, :4])

    if nc > 1 and multi_label:
        # all (box, class) pairs above threshold (general.py:502-504)
        conf = obj[:, None] * pred[:, 5:]                    # (N, nc)
        ok = (conf > conf_thres) & (obj > conf_thres)[:, None]
        if class_mask is not None:
            ok = ok & class_mask[None, :]
        flat = jnp.where(ok, conf, 0.0).reshape(-1)          # (N*nc,)
        cls_of = jnp.tile(jnp.arange(nc, dtype=jnp.int32), pred.shape[0])
        box_of = jnp.repeat(jnp.arange(pred.shape[0], dtype=jnp.int32), nc)
    else:
        # best class only (general.py:506-507)
        if nc > 1:
            conf_c = obj[:, None] * pred[:, 5:]
            if class_mask is not None:
                conf_c = jnp.where(class_mask[None, :], conf_c, 0.0)
            cls_of = jnp.argmax(conf_c, axis=1).astype(jnp.int32)
            flat = jnp.max(conf_c, axis=1)
        else:
            flat = obj * pred[:, 5]
            cls_of = jnp.zeros((pred.shape[0],), dtype=jnp.int32)
        flat = jnp.where((flat > conf_thres) & (obj > conf_thres), flat, 0.0)
        box_of = jnp.arange(pred.shape[0], dtype=jnp.int32)

    k = min(top_k, flat.shape[0])
    scores, sel = jax.lax.top_k(flat, k)                     # sorted desc
    cls = cls_of[sel]
    bxs = boxes_xyxy[box_of[sel]]
    scores = jnp.where(scores > 0.0, scores, _NEG)

    offset = jnp.where(agnostic, 0.0, cls.astype(jnp.float32) * _MAX_WH)
    shifted = bxs + offset[:, None]
    idxs, vals = _suppress(shifted, scores, iou_thres, max_det)

    out_boxes = bxs[idxs]
    if merge:
        # weighted box merging (general.py:530-536): each kept box becomes
        # the score-weighted mean of ALL candidates overlapping it above
        # iou_thres (in class-offset space); `redundant` drops kept boxes
        # with no supporting neighbor. Zero-score slots (below-conf /
        # padding) are NOT candidates — they must neither weigh into the
        # mean nor count as supporters. The reference runs this block only
        # for 1 < n < 3000 candidates (general.py:530): a lone box is kept
        # unmerged, and huge scenes skip merging entirely.
        cand_w = jnp.where(scores > 0.0, scores, 0.0)          # (K,)
        n_cand = (cand_w > 0.0).sum()
        iou_km = pairwise_iou(shifted[idxs], shifted)           # (max_det, K)
        sup = (iou_km > iou_thres) & (cand_w > 0.0)[None, :]
        w = sup.astype(jnp.float32) * cand_w[None, :]           # (max_det, K)
        denom = jnp.maximum(w.sum(axis=1, keepdims=True), 1e-9)
        do_merge = (n_cand > 1) & (n_cand < 3000)
        out_boxes = jnp.where(do_merge, (w @ bxs) / denom, out_boxes)
        if redundant:
            vals = vals & jnp.where(do_merge, sup.sum(axis=1) > 1, True)

    return Detections(
        boxes=jnp.where(vals[:, None], out_boxes, 0.0),
        scores=jnp.where(vals, scores[idxs], 0.0),
        classes=jnp.where(vals, cls[idxs], 0),
        valid=vals,
    )


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "nc", "multi_label",
                     "agnostic", "max_det", "top_k", "merge", "redundant"),
)
def batched_nms(pred, *, conf_thres: float = 0.25, iou_thres: float = 0.45,
                nc: Optional[int] = None, multi_label: bool = False,
                agnostic: bool = False, max_det: int = 300,
                top_k: int = 4096, class_mask=None, labels=None,
                labels_mask=None, merge: bool = False,
                redundant: bool = True) -> Detections:
    """Batched NMS on decoded predictions (B, N, 5+nc).

    class_mask: optional (nc,) bool array — keep only these classes (the
    reference's `classes` filter, general.py:510-511).
    labels/labels_mask: optional (B, M, 5)/(B, M) prior labels for the
    autolabelling (`save_hybrid`) path.
    merge: weighted box merging, general.py:530-536 (`redundant` drops
    merged boxes without a supporting neighbor, like the reference).
    """
    if nc is None:
        nc = pred.shape[-1] - 5
    fn = functools.partial(_nms_single, conf_thres=conf_thres,
                           iou_thres=iou_thres, nc=nc, multi_label=multi_label,
                           agnostic=agnostic, max_det=max_det, top_k=top_k,
                           class_mask=class_mask, merge=merge,
                           redundant=redundant)
    if labels is not None:
        return jax.vmap(fn)(pred.astype(jnp.float32),
                            labels=labels.astype(jnp.float32),
                            labels_mask=labels_mask)
    return jax.vmap(fn)(pred.astype(jnp.float32))
