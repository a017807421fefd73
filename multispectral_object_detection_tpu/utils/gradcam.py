"""Grad-CAM / activation-CAM heatmaps over any graph node.

The working version of reference utils/gradcam.py (80 LoC, imported nowhere
upstream): that script sums a feature map's channels, ReLUs, normalizes and
JET-overlays it onto the image — a gradient-free activation CAM despite the
name (utils/gradcam.py:43-79). Here:

- ``mode="grad"`` (default) is true Grad-CAM (Selvaraju et al.): channel
  weights are the spatial mean of d(score)/d(activation), CAM =
  ReLU(sum_c w_c * A_c). The gradient w.r.t. the INTERMEDIATE activation is
  taken through the model's tap hook (models/model.py DetectionModel.__call__
  ``tap_index``/``tap``): a zero perturbation is injected at the node and the
  score is differentiated w.r.t. it — no graph re-implementation, one jitted
  program, works for any node of any config including the CFT fusion stages
  (so you can visualize what the cross-modality attention attends to).
- ``mode="sum"`` reproduces the reference's channel-sum behavior.

Score choices: ``obj`` (sum of objectness over all anchors) or ``cls``
(objectness-weighted probability of ``class_id``), both from the decoded
(B, N, 5+nc) detections.

CLI: ``python -m multispectral_object_detection_tpu.utils.gradcam --cfg ...
--weights ... --source1 ... [--source2 ...] --layers 4 9 14`` writes
``cam_<stem>_l<layer>.jpg`` overlays like the reference's
``cam<epoch>_<layer>.jpg`` (utils/gradcam.py:40).
"""

from __future__ import annotations

import argparse
import logging
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@partial(jax.jit, static_argnames=("model", "layer", "mode", "class_id"))
def compute_cam(model, params, stats, rgb, ir=None, *, layer: int,
                mode: str = "grad", class_id=None):
    """CAM for graph node ``layer``. Inputs are float images in [0,1], NHWC.

    Returns (B, ny, nx) float32 in [0, 1], ny/nx the node's spatial dims.
    """
    def score_fn(tap):
        inputs = (rgb,) if ir is None else (rgb, ir)
        feats, act = model.apply({"params": params, "batch_stats": stats},
                                 *inputs, train=False, tap_index=layer,
                                 tap=tap)
        dets = model.decode(feats)  # (B, N, 5+nc), sigmoided
        obj = dets[..., 4]
        if class_id is None:
            score = obj.sum()
        else:
            score = (obj * dets[..., 5 + class_id]).sum()
        return score, act.astype(jnp.float32)

    act_shape = jax.eval_shape(
        lambda p, s: model.apply(
            {"params": p, "batch_stats": s}, rgb,
            *(() if ir is None else (ir,)), train=False,
            tap_index=layer)[1],
        params, stats)
    zeros = jnp.zeros(act_shape.shape, act_shape.dtype)

    if mode == "sum":
        _, act = score_fn(zeros)
        cam = jnp.maximum(act.sum(axis=-1), 0.0)
    elif mode == "grad":
        grads, act = jax.grad(score_fn, has_aux=True)(zeros)
        w = grads.astype(jnp.float32).mean(axis=(1, 2), keepdims=True)
        cam = jnp.maximum((act * w).sum(axis=-1), 0.0)
    else:
        raise ValueError(f"mode must be 'grad' or 'sum', got {mode!r}")

    lo = cam.min(axis=(1, 2), keepdims=True)
    rng = cam.max(axis=(1, 2), keepdims=True) - lo
    return (cam - lo) / jnp.maximum(rng, 1e-12)


def overlay_cam(img_u8: np.ndarray, cam: np.ndarray) -> np.ndarray:
    """JET-colormap overlay, reference show_cam_on_image (gradcam.py:34-41).

    ``img_u8`` (H, W, 3) RGB uint8; ``cam`` (ny, nx) in [0,1]. Returns
    (H, W, 3) RGB uint8: heatmap + img/255, renormalized by the max.
    """
    import cv2

    h, w = img_u8.shape[:2]
    cam_hw = cv2.resize(np.asarray(cam, dtype=np.float32), (w, h))
    heat_bgr = cv2.applyColorMap(np.uint8(255 * cam_hw), cv2.COLORMAP_JET)
    heat = np.float32(heat_bgr[..., ::-1]) / 255.0
    out = heat + np.float32(img_u8) / 255.0
    return np.uint8(255 * out / out.max())


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        "gradcam", description="Grad-CAM heatmaps for any graph node")
    p.add_argument("--cfg", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--source1", required=True, help="RGB image or directory")
    p.add_argument("--source2", default=None, help="IR image or directory")
    p.add_argument("--layers", type=int, nargs="+", required=True,
                   help="graph node indices to visualize")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--nc", type=int, default=80)
    p.add_argument("--mode", choices=["grad", "sum"], default="grad")
    p.add_argument("--class-id", type=int, default=None,
                   help="score = obj * P(class); default sums objectness")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--project", default="runs/gradcam")
    p.add_argument("--name", default="exp")
    p.add_argument("--exist-ok", action="store_true")
    return p.parse_args(argv)


def run(args) -> list:
    import cv2

    from ..data.augment import letterbox
    from ..data.datasets import list_images
    from ..models import build_model
    from ..models.configs import get_config
    from ..utils.checkpoint import load_inference_params
    from ..utils.general import (check_img_size, enable_compilation_cache,
                                 increment_path, set_logging)

    set_logging()
    enable_compilation_cache()
    s = check_img_size(args.img_size, 32)
    save_dir = increment_path(Path(args.project) / args.name,
                              exist_ok=args.exist_ok)
    save_dir.mkdir(parents=True, exist_ok=True)

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    cfg = args.cfg if args.cfg.endswith((".yaml", ".yml")) else \
        get_config(args.cfg, nc=args.nc)
    model = build_model(cfg, nc=args.nc, dtype=dtype)
    params, stats = load_inference_params(args.weights)
    params, stats = jax.device_put(params), jax.device_put(stats)
    two_stream = model.spec.two_stream
    if two_stream and not args.source2:
        raise SystemExit("two-stream model needs --source2")

    def load(path):
        im = cv2.imread(str(path))[..., ::-1]  # BGR -> RGB
        lb = letterbox(im, (s, s), auto=False)[0]
        return im, jnp.asarray(lb[None], jnp.float32) / 255.0

    rgbs = list_images(args.source1)
    irs = list_images(args.source2) if two_stream else [None] * len(rgbs)
    written = []
    for p1, p2 in zip(rgbs, irs):
        im0, x1 = load(p1)
        x2 = load(p2)[1] if two_stream else None
        for layer in args.layers:
            cam = compute_cam(model, params, stats, x1, x2, layer=layer,
                              mode=args.mode, class_id=args.class_id)
            out = overlay_cam(im0, np.asarray(cam[0]))
            f = save_dir / f"cam_{Path(p1).stem}_l{layer}.jpg"
            cv2.imwrite(str(f), out[..., ::-1])
            written.append(f)
            logger.info("%s: layer %d -> %s", Path(p1).name, layer, f)
    logger.info("%d heatmaps -> %s", len(written), save_dir)
    return written


def main(argv=None):
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
