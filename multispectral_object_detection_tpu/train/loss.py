"""Detection training objective: CIoU box + objectness BCE + class BCE.

Re-implements the reference `ComputeLoss` (utils/loss.py:88-161) with
fixed-shape masked math (see assigner.py):

- box: mean(1 - CIoU) over valid candidates, per-scale, summed  (loss.py:132-133)
- obj: BCE over every cell; positives carry the (detached, clamped) CIoU as
  target value since gr = 1.0 (train.py:680 sets model.gr=1.0; loss.py:136)
  with per-scale balance [4.0, 1.0, 0.4]  (loss.py:108)
- cls: BCE with optional label smoothing; only when nc > 1  (loss.py:139-142)
- gains: hyp box/obj/cls; total loss scaled by batch size  (loss.py:155-161)

Deviations (documented):
- scatter-max instead of last-write-wins for duplicate objectness targets;
- under data parallelism the reference multiplies loss by world_size
  (train.py:759-760) to undo DDP's gradient averaging; we use the
  mathematically clean global-batch mean (psum of per-device sums).
- optional focal loss (fl_gamma > 0) follows utils/loss.py:32-59.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.boxes import iou as box_iou_elementwise
from .assigner import assign_targets


@dataclasses.dataclass(frozen=True)
class LossHyp:
    """The loss-relevant keys of hyp.scratch.yaml (reference data/hyp.scratch.yaml)."""

    box: float = 0.05
    obj: float = 1.0
    cls: float = 0.5
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    fl_gamma: float = 0.0
    qfl: bool = False  # quality focal (loss.py:62) instead of focal
    label_smoothing: float = 0.0
    gr: float = 1.0  # iou-ratio for objectness targets (train.py:680)


def scale_gains(hyp: LossHyp, nc: int, img_size: int, nl: int) -> LossHyp:
    """Rescale the raw hyp gains to the model/task, reference train.py:661-663:

        box *= 3/nl; cls *= nc/80 * 3/nl; obj *= (imgsz/640)^2 * 3/nl

    The reference applies this once before building ComputeLoss; omitting it
    over-weights obj/cls relative to box by up to 16x/40x at small nc/imgsz
    (measured: the round-3 CFT parity A/B trained without it lost 8 pts
    mAP(0.5:0.95) to delayed box-regression learning)."""
    return dataclasses.replace(
        hyp,
        box=hyp.box * 3.0 / nl,
        cls=hyp.cls * nc / 80.0 * 3.0 / nl,
        obj=hyp.obj * (img_size / 640.0) ** 2 * 3.0 / nl)


def _bce_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise binary cross-entropy with logits, torch-compatible:
    loss = -[pw * t * log sigmoid(x) + (1 - t) * log sigmoid(-x)]."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def bce_blur_with_logits(logits, targets, alpha: float = 0.05):
    """BCEBlurWithLogitsLoss (utils/loss.py:15-30): BCE downweighted where
    the prediction overshoots the target (reduces missing-label effects).
    Returns the mean, like the reference's reduction."""
    loss = _bce_logits(logits, targets)
    dx = jax.nn.sigmoid(logits) - targets
    alpha_factor = 1.0 - jnp.exp((dx - 1.0) / (alpha + 1e-4))
    return jnp.mean(loss * alpha_factor)


def _focal_scale(logits, targets, gamma: float, alpha: float = 0.25):
    """TF-style focal modulation (utils/loss.py:42-52)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1.0 - targets) * (1.0 - p)
    alpha_factor = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    return alpha_factor * (1.0 - p_t) ** gamma


def _qfocal_scale(logits, targets, gamma: float, alpha: float = 0.25):
    """Quality focal modulation (utils/loss.py:62-85)."""
    p = jax.nn.sigmoid(logits)
    alpha_factor = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    return alpha_factor * jnp.abs(targets - p) ** gamma


def _masked_mean(x, mask, axis=None):
    return jnp.sum(x * mask, axis=axis) / jnp.maximum(jnp.sum(mask, axis=axis), 1.0)


class DetectionLoss:
    """Stateless loss callable: (feats, targets, tmask) -> (loss, components).

    `feats`: tuple of per-scale raw logits (B, ny, nx, na, 5+nc).
    `targets`: (T, 6) padded [img, cls, x, y, w, h] normalized; `tmask`: (T,).
    """

    BALANCE3 = (4.0, 1.0, 0.4)          # P3-P5 (loss.py:108)
    BALANCE5 = (4.0, 1.0, 0.25, 0.06, 0.02)

    def __init__(self, nc: int, anchors_px: np.ndarray, strides: Sequence[int],
                 hyp: LossHyp = LossHyp(), loss_mult: float = 1.0):
        # loss_mult: 4.0 under --quad (train.py:317) — the canvas batch is
        # 4x smaller than the nominal batch, and total scales by batch
        self.loss_mult = loss_mult
        self.nc = nc
        self.strides = tuple(strides)
        self.anchors_grid = np.asarray(anchors_px, dtype=np.float32) / np.asarray(
            strides, dtype=np.float32).reshape(-1, 1, 1)
        self.hyp = hyp
        self.balance = self.BALANCE3 if len(strides) == 3 else self.BALANCE5
        eps = hyp.label_smoothing
        self.cp, self.cn = 1.0 - 0.5 * eps, 0.5 * eps  # smooth_BCE (loss.py:10)

    def __call__(self, feats, targets, tmask):
        h = self.hyp
        B = feats[0].shape[0]
        feat_shapes = [(f.shape[1], f.shape[2]) for f in feats]
        assigns = assign_targets(targets, tmask, feat_shapes,
                                 self.anchors_grid, h.anchor_t)

        lbox = jnp.float32(0.0)
        lobj = jnp.float32(0.0)
        lcls = jnp.float32(0.0)

        for i, (f, asg) in enumerate(zip(feats, assigns)):
            f = f.astype(jnp.float32)
            b, gj, gi, a = asg.b, asg.gj, asg.gi, asg.a
            ps = f[b, gj, gi, a]  # (K, 5+nc) gathered predictions

            # --- box regression (CIoU in grid units) ---
            pxy = jax.nn.sigmoid(ps[:, 0:2]) * 2.0 - 0.5
            anc = jnp.asarray(self.anchors_grid[i])[a]  # (K, 2)
            pwh = (jax.nn.sigmoid(ps[:, 2:4]) * 2.0) ** 2 * anc
            pbox = jnp.concatenate([pxy, pwh], axis=-1)
            tbox = jnp.concatenate([asg.txy, asg.twh], axis=-1)
            ciou = box_iou_elementwise(pbox, tbox, xyxy=False, kind="ciou")
            lbox = lbox + _masked_mean(1.0 - ciou, asg.mask)

            # --- objectness: scatter detached iou into the target map ---
            iou_t = jnp.clip(jax.lax.stop_gradient(ciou), 0.0)
            val = ((1.0 - h.gr) + h.gr * iou_t) * asg.mask
            tobj = jnp.zeros(f.shape[:4], dtype=jnp.float32)
            tobj = tobj.at[b, gj, gi, a].max(val)
            obj_losses = _bce_logits(f[..., 4], tobj, h.obj_pw)
            if h.fl_gamma > 0:
                scale = _qfocal_scale if h.qfl else _focal_scale
                obj_losses = obj_losses * scale(f[..., 4], tobj, h.fl_gamma)
            lobj = lobj + jnp.mean(obj_losses) * self.balance[i]

            # --- classification ---
            if self.nc > 1:
                t_cls = self.cn + (self.cp - self.cn) * jax.nn.one_hot(
                    asg.cls, self.nc, dtype=jnp.float32)
                cls_losses = _bce_logits(ps[:, 5:], t_cls, h.cls_pw)
                if h.fl_gamma > 0:
                    scale = _qfocal_scale if h.qfl else _focal_scale
                    cls_losses = cls_losses * scale(ps[:, 5:], t_cls, h.fl_gamma)
                lcls = lcls + _masked_mean(
                    jnp.mean(cls_losses, axis=-1), asg.mask)

        lbox = lbox * h.box
        lobj = lobj * h.obj
        lcls = lcls * h.cls
        # reference scales by batch (loss.py:161); x4 under --quad
        total = (lbox + lobj + lcls) * B * self.loss_mult
        return total, {"box": lbox, "obj": lobj, "cls": lcls, "total": total}
