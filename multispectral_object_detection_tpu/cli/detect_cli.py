"""Paired-folder inference CLI — the reference `detect_twostream.py`.

Walks two aligned image folders (RGB + IR), letterboxes on host, runs the
jitted forward + on-device decode + NMS, rescales boxes to native space, and
writes annotated images / YOLO-format txt files. FPS accounting matches
detect_twostream.py:156-159,194.
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path

import numpy as np
import yaml

logger = logging.getLogger(__name__)

PALETTE = [(255, 56, 56), (56, 168, 255), (56, 255, 106), (255, 200, 56),
           (186, 56, 255), (255, 112, 31), (56, 255, 255), (255, 56, 170)]


def parse_args(argv=None):
    ap = argparse.ArgumentParser("detect")
    ap.add_argument("--cfg", type=str, default="yolov5l_fusion_transformerx3")
    ap.add_argument("--weights", type=str, required=True, nargs="+",
                    help="checkpoint dir(s); several = ensemble "
                         "(reference attempt_load, same --cfg members)")
    ap.add_argument("--ensemble-mode", type=str, default="cat",
                    choices=["cat", "mean", "max", "ds", "ds-li", "ds-sun"],
                    help="ensemble combination before NMS (cat = reference "
                         "torch.cat; ds* = ops/ds_fusion.py)")
    ap.add_argument("--source1", type=str, required=True, help="RGB folder")
    ap.add_argument("--source2", type=str, default="", help="IR folder")
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--conf-thres", type=float, default=0.4)
    ap.add_argument("--iou-thres", type=float, default=0.45)
    ap.add_argument("--max-det", type=int, default=300)
    ap.add_argument("--nc", type=int, default=1)
    ap.add_argument("--names", type=str, default="")
    ap.add_argument("--classes", type=int, nargs="*", default=None)
    ap.add_argument("--agnostic-nms", action="store_true")
    ap.add_argument("--merge-nms", action="store_true",
                    help="weighted box merging (general.py:530-536)")
    ap.add_argument("--augment", action="store_true",
                    help="test-time augmentation: 3 scales + lr flip "
                         "(detect_twostream.py:213 -> :83; upstream's "
                         "two-stream TTA is broken, ours runs both "
                         "modalities — train/tta.py)")
    ap.add_argument("--project", type=str, default="runs/detect")
    ap.add_argument("--name", type=str, default="exp")
    ap.add_argument("--exist-ok", action="store_true")
    ap.add_argument("--save-txt", action="store_true")
    ap.add_argument("--save-conf", action="store_true")
    ap.add_argument("--save-crop", action="store_true",
                    help="save detection crops (save_one_box, "
                         "general.py:628)")
    ap.add_argument("--nosave", action="store_true")
    ap.add_argument("--batch-size", type=int, default=1,
                    help="pairs per device dispatch (folder/video sources; "
                         "amortizes dispatch + runs the model at its "
                         "efficient batch point)")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--no-fuse", action="store_true",
                    help="keep live BatchNorm instead of conv-folded inference")
    ap.add_argument("--line-thickness", type=int, default=2,
                    help="bounding-box line width (detect_twostream.py:215)")
    ap.add_argument("--hide-labels", action="store_true",
                    help="draw boxes without class labels")
    ap.add_argument("--hide-conf", action="store_true",
                    help="labels without confidences")
    ap.add_argument("--int8", action="store_true",
                    help="weights-only int8: conv/dense kernels stored "
                         "int8 + per-channel scale in HBM, dequantized to "
                         "the compute dtype inside the jit "
                         "(models/quantize.py; 2.4x smaller resident "
                         "weights for multi-model serving)")
    # ---- reference-compat flags (detect_twostream.py:200-218) ----
    ap.add_argument("--device", type=str, default="",
                    help="'cpu' forces the CPU platform; CUDA-style "
                         "indices are a no-op on TPU")
    ap.add_argument("--update", action="store_true",
                    help="strip the checkpoint to inference-only after "
                         "the run (detect_twostream.py:230-232 "
                         "strip_optimizer -> utils/checkpoint."
                         "strip_checkpoint)")
    ap.add_argument("--view-img", action="store_true",
                    help="accepted for compatibility (detect_twostream"
                         ".py:205); this build is headless — results are "
                         "written to the run dir instead of a display "
                         "window")
    return ap.parse_args(argv)


class _ShapeOnly:
    """Stand-in for a decoded image when only its dimensions are needed
    (the headless fast path never materializes full-res pixels)."""

    def __init__(self, h: int, w: int):
        self.shape = (h, w, 3)


def run(args) -> dict:
    import cv2
    import jax
    import jax.numpy as jnp

    from ..data.augment import letterbox
    from ..data.datasets import list_images
    from ..models import build_model
    from ..models.configs import get_config
    from ..ops.nms import batched_nms
    from ..utils.checkpoint import load_inference_params
    from ..utils.general import (apply_device_arg, check_img_size,
                                 enable_compilation_cache, increment_path,
                                 set_logging)

    set_logging()
    apply_device_arg(getattr(args, "device", ""))
    enable_compilation_cache()
    if getattr(args, "view_img", False):
        logger.info(
            "--view-img: headless build, writing annotated frames to the "
            "run dir instead of a display window")
    s = check_img_size(args.img_size, 32)
    save_dir = increment_path(Path(args.project) / args.name,
                              exist_ok=args.exist_ok)
    (save_dir / "labels" if args.save_txt else save_dir).mkdir(
        parents=True, exist_ok=True)

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    cfg = args.cfg if args.cfg.endswith((".yaml", ".yml")) else \
        get_config(args.cfg, nc=args.nc)
    weights = args.weights if isinstance(args.weights, list) else \
        [args.weights]
    n_members = len(weights)
    if n_members > 1 and (args.augment or args.int8):
        raise SystemExit("--augment/--int8 are single-checkpoint; drop "
                         "them or pass one --weights")
    members = [load_inference_params(w) for w in weights]
    if args.no_fuse:
        model = build_model(cfg, nc=args.nc, dtype=dtype)
    else:
        from ..models.model import fuse_conv_bn

        model = build_model(cfg, nc=args.nc, dtype=dtype, fused=True)
        # keep the residual (non-conv-adjacent) BN stats live:
        # BottleneckCSP/MixConv2d/CrossConv configs still need them
        members = [fuse_conv_bn(p, s) for p, s in members]
    from ..models.model import cast_inference_params
    members = [(cast_inference_params(p, dtype), s) for p, s in members]
    if n_members == 1:
        params, stats = members[0]
    else:
        from ..utils.checkpoint import stack_param_trees

        params = stack_param_trees([p for p, _ in members])
        stats = stack_param_trees([s for _, s in members])
        logger.info(f"ensemble of {n_members} checkpoints "
                    f"(mode={args.ensemble_mode})")
    # commit to device ONCE — params loaded from a checkpoint are host
    # numpy trees, and passing those to a jitted fn re-uploads the full
    # model every call
    params = jax.device_put(params)
    stats = jax.device_put(stats)
    if args.int8:
        from ..models.quantize import quantize_int8

        params = jax.jit(quantize_int8)(params)
    two_stream = model.spec.two_stream
    names = (args.names.split(",") if args.names
             else [str(i) for i in range(args.nc)])

    class_mask = None
    if args.classes is not None:
        class_mask = np.zeros(args.nc, dtype=bool)
        class_mask[list(args.classes)] = True
        class_mask = jnp.asarray(class_mask)

    # params/stats are jit ARGUMENTS, not closure captures — captured trees
    # are baked into the program as constants, which bloats the compiled
    # executable by the full model size (and overflows the axon
    # remote-compile request for the 206M flagship)
    @jax.jit
    def _infer(params, stats, rgb_u8, ir_u8):
        if args.int8:
            from ..models.quantize import dequantize_int8

            params = dequantize_int8(params, dtype)
        x = rgb_u8.astype(jnp.float32) / 255.0
        if args.augment:
            from ..train.tta import tta_forward

            x2 = ir_u8.astype(jnp.float32) / 255.0 if two_stream else None
            dets = tta_forward(model, params, stats, x, x2)
        elif n_members > 1:
            # reference attempt_load ensemble: members under one vmap,
            # combined per --ensemble-mode before NMS
            x2 = ir_u8.astype(jnp.float32) / 255.0 if two_stream else None

            def one(p, s):
                inputs = (x,) if not two_stream else (x, x2)
                feats = model.apply({"params": p, "batch_stats": s},
                                    *inputs, train=False)
                return model.decode(feats)

            mdets = jax.vmap(one)(params, stats)  # (E, B, N, 5+nc)
            if args.ensemble_mode == "cat":
                e, b, n, no = mdets.shape
                dets = jnp.moveaxis(mdets, 0, 1).reshape(b, e * n, no)
            elif args.ensemble_mode == "mean":
                dets = mdets.mean(axis=0)
            elif args.ensemble_mode == "max":
                dets = mdets.max(axis=0)
            else:
                from ..ops.ds_fusion import fuse_detections

                dets = fuse_detections(
                    mdets, method={"ds": "plain", "ds-li": "li",
                                   "ds-sun": "sun"}[args.ensemble_mode])
        else:
            inputs = (x,) if not two_stream else \
                (x, ir_u8.astype(jnp.float32) / 255.0)
            feats = model.apply({"params": params, "batch_stats": stats},
                                *inputs, train=False)
            dets = model.decode(feats)
        return batched_nms(dets, conf_thres=args.conf_thres,
                           iou_thres=args.iou_thres, multi_label=False,
                           agnostic=args.agnostic_nms, max_det=args.max_det,
                           top_k=1024, class_mask=class_mask,
                           merge=args.merge_nms)

    def infer(rgb_u8, ir_u8):
        return _infer(params, stats, rgb_u8, ir_u8)

    from ..data.sources import VID_EXTS, MediaSource

    is_video = Path(args.source1).suffix.lower() in VID_EXTS or \
        str(args.source1).isnumeric() or \
        str(args.source1).lower().startswith(("rtsp://", "rtmp://", "http"))
    if is_video:
        # paired (or single) video / webcam / stream inference
        src1 = iter(MediaSource(args.source1))
        src2 = iter(MediaSource(args.source2)) if args.source2 else None
        frames = zip(src1, src2) if src2 else ((a, a) for a in src1)
        pairs = (((n1, f1[:, :, ::-1].copy()), (n2, f2[:, :, ::-1].copy()))
                 for (n1, f1, _), (n2, f2, _) in frames)
    else:
        files1 = list_images(args.source1)
        files2 = list_images(args.source2) if args.source2 else files1
        assert len(files1) == len(files2), "paired sources must align"
        pairs = (((p1, cv2.imread(p1)), (p2, cv2.imread(p2)))
                 for p1, p2 in zip(files1, files2))

    # ---- overlapped serving pipeline (VERDICT r1 item 5) ------------------
    # Three stages run concurrently: (1) a producer thread decodes +
    # letterboxes + stages host->device transfers, (2) the device computes
    # (JAX dispatch is async — the next frame is dispatched BEFORE the
    # previous frame's results are fetched), (3) the main thread
    # postprocesses/saves the previous frame while the device works on the
    # current one. The reference hot loop is fully serial
    # (detect_twostream.py:66-87).
    import queue as _queue
    import threading

    B = max(args.batch_size, 1)
    # headless fast path: decode straight to network scale (native C++
    # decoder when MSOD_NATIVE=1) and never materialize the full-res image
    # — the 1-core host decode is the end-to-end serving bottleneck
    headless = (args.nosave and not args.save_crop and not is_video)

    from ..data.augment import load_scaled

    def _producer(q):
        try:
            if headless:
                for p1, p2 in zip(files1, files2):
                    im, (h0, w0) = load_scaled(p1, s)
                    irs, _ = load_scaled(p2, s)
                    h1, w1 = im.shape[:2]
                    rgb, (r, _), pad = letterbox(im, (s, s), auto=False)
                    ir, _, _ = letterbox(irs, (s, s), auto=False)
                    # fold the decode-time prescale into the ratio so
                    # boxes rescale to the ORIGINAL (h0, w0) space
                    ratio = (r * w1 / w0, r * h1 / h0)
                    shp = _ShapeOnly(h0, w0)
                    q.put(((p1, shp, p2, shp, ratio, pad), rgb, ir))
                return
            for (p1, im0), (p2, ir0) in pairs:
                rgb, ratio, pad = letterbox(im0[:, :, ::-1], (s, s),
                                            auto=False)
                ir, _, _ = letterbox(ir0[:, :, ::-1], (s, s), auto=False)
                q.put(((p1, im0, p2, ir0, ratio, pad), rgb, ir))
        finally:
            q.put(None)

    q: "_queue.Queue" = _queue.Queue(maxsize=3 * B)
    threading.Thread(target=_producer, args=(q,), daemon=True).start()

    n_det_total = 0
    n_frames = 0
    writer = None
    t_wall0 = time.perf_counter()

    def _emit(meta, det, i=0):
        nonlocal n_det_total, n_frames, writer
        p1, im0, p2, ir0, ratio, pad = meta
        n_frames += 1
        boxes = np.asarray(det.boxes[i])
        scores = np.asarray(det.scores[i])
        classes = np.asarray(det.classes[i])
        valid = np.asarray(det.valid[i])

        boxes = boxes[valid]
        scores = scores[valid]
        classes = classes[valid]
        # rescale to native space
        boxes[:, [0, 2]] = (boxes[:, [0, 2]] - pad[0]) / ratio[0]
        boxes[:, [1, 3]] = (boxes[:, [1, 3]] - pad[1]) / ratio[1]
        boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, im0.shape[1])
        boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, im0.shape[0])
        n_det_total += len(boxes)

        stem = Path(p1).stem if not is_video else f"frame{n_frames:06d}"
        if args.save_txt:
            h0, w0 = im0.shape[:2]
            lines = []
            for b, sc, c in zip(boxes, scores, classes):
                cx, cy = (b[0] + b[2]) / 2 / w0, (b[1] + b[3]) / 2 / h0
                bw, bh = (b[2] - b[0]) / w0, (b[3] - b[1]) / h0
                row = (int(c), cx, cy, bw, bh) + ((float(sc),) if args.save_conf else ())
                lines.append(" ".join(f"{v:.6g}" if isinstance(v, float) else str(v)
                                      for v in row))
            (save_dir / "labels" / f"{stem}.txt").write_text("\n".join(lines))
        if args.save_crop:
            # crops come from the clean image, before box drawing
            # (detect_twostream.py:94: imc = im0.copy())
            from ..utils.general import save_one_box

            for k, (b, c) in enumerate(zip(boxes, classes)):
                save_one_box(
                    b, im0[:, :, ::-1],
                    file=save_dir / "crops" / names[int(c)]
                    / f"{stem}_{k}.jpg")
        if not args.nosave:
            lt = args.line_thickness
            for b, sc, c in zip(boxes, scores, classes):
                color = PALETTE[int(c) % len(PALETTE)]
                # label text per --hide-labels/--hide-conf
                # (detect_twostream.py:101-103)
                txt = None if args.hide_labels else (
                    names[int(c)] if args.hide_conf
                    else f"{names[int(c)]} {sc:.2f}")
                for img in (im0, ir0):
                    cv2.rectangle(img, (int(b[0]), int(b[1])),
                                  (int(b[2]), int(b[3])), color, lt)
                    if txt:
                        cv2.putText(img, txt, (int(b[0]), int(b[1]) - 4),
                                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, lt)
            if is_video:
                if writer is None:
                    writer = cv2.VideoWriter(
                        str(save_dir / "output.mp4"),
                        cv2.VideoWriter_fourcc(*"mp4v"), 25,
                        (im0.shape[1], im0.shape[0]))
                writer.write(im0)
            else:
                cv2.imwrite(str(save_dir / f"{stem}_rgb.jpg"), im0)
                cv2.imwrite(str(save_dir / f"{stem}_ir.jpg"), ir0)

    def _collect(q):
        """Group queue items into batches of B (last one may be short)."""
        buf = []
        while True:
            item = q.get()
            if item is None:
                if buf:
                    yield buf
                return
            buf.append(item)
            if len(buf) == B:
                yield buf
                buf = []

    pending = None  # one batch in flight on the device
    t_steady0 = None  # set after the first batch (jit compile) completes
    n_at_steady = 0
    stream = _collect(q)
    done = False
    while not done:
        buf = next(stream, None)
        nxt = None
        if buf is not None:
            metas = [m for m, _, _ in buf]
            rgb_b = np.stack([r for _, r, _ in buf])
            ir_b = np.stack([r for _, _, r in buf])
            if len(buf) < B:  # pad short final batch: one compiled shape
                padn = [(0, B - len(buf))] + [(0, 0)] * 3
                rgb_b = np.pad(rgb_b, padn)
                ir_b = np.pad(ir_b, padn)
            nxt = (metas, infer(jnp.asarray(rgb_b), jnp.asarray(ir_b)))
        if pending is not None:
            p_metas, p_det = pending
            # ONE host fetch per dispatched batch (not per frame) — each
            # device->host fetch is a round trip
            p_det = jax.tree.map(np.asarray, p_det)
            for i, m in enumerate(p_metas):
                _emit(m, p_det, i)  # host postprocess overlaps device work
            if t_steady0 is None:
                t_steady0 = time.perf_counter()
                n_at_steady = n_frames
        pending = nxt
        done = nxt is None

    if writer is not None:
        writer.release()
    t_wall = time.perf_counter() - t_wall0
    fps = n_frames / t_wall if t_wall > 0 else 0.0
    # steady-state excludes the first batch's jit compile + cache warmup
    t_steady = (time.perf_counter() - t_steady0) if t_steady0 else 0.0
    fps_steady = ((n_frames - n_at_steady) / t_steady
                  if t_steady > 0 and n_frames > n_at_steady else fps)
    logger.info(f"{n_frames} pairs, {n_det_total} detections, "
                f"{fps:.1f} FPS end-to-end "
                f"({fps_steady:.1f} steady-state) -> {save_dir}")
    if getattr(args, "update", False):
        # detect_twostream.py:230-232: finalize the weights for inference
        # after a successful run (their strip_optimizer; halves the size)
        from ..utils.checkpoint import strip_checkpoint
        for w in (args.weights if isinstance(args.weights, list)
                  else [args.weights]):
            strip_checkpoint(w)
        logger.info(f"--update: stripped {args.weights} to inference-only "
                    "(model.msgpack)")

    return {"n_images": n_frames, "n_det": n_det_total, "fps": fps,
            "fps_steady": fps_steady}


def main(argv=None):
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
