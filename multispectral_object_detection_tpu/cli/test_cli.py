"""Standalone evaluator CLI — the reference `test.py` (test.py:21-371).

Tasks: val (mAP on the val split), speed (inference+NMS latency at
conf 0.25 / iou 0.45), study (mAP vs image-size sweep).
"""

from __future__ import annotations

import argparse
import json
import logging
import time
from pathlib import Path

import numpy as np
import yaml

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    ap = argparse.ArgumentParser("test")
    ap.add_argument("--cfg", type=str, default="yolov5l_fusion_transformerx3")
    ap.add_argument("--data", type=str, required=True)
    ap.add_argument("--weights", type=str, required=True, nargs="+",
                    help="checkpoint dir(s); several = ensemble "
                         "(reference attempt_load, same --cfg members)")
    ap.add_argument("--ensemble-mode", type=str, default="cat",
                    choices=["cat", "mean", "max", "ds", "ds-li", "ds-sun"],
                    help="how ensemble members combine before NMS: cat "
                         "(reference torch.cat default), mean/max "
                         "(experimental.py:107-108), ds* = Dempster-Shafer "
                         "evidence fusion (ops/ds_fusion.py)")
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--conf-thres", type=float, default=0.001)
    ap.add_argument("--iou-thres", type=float, default=0.6)
    ap.add_argument("--task", type=str, default="val",
                    choices=["val", "test", "speed", "study"])
    ap.add_argument("--augment", action="store_true",
                    help="test-time augmentation: 3 scales + lr flip "
                         "(test.py:309 -> test.py:118; the reference's "
                         "two-stream TTA branch is broken upstream, "
                         "yolo_test.py:222 — ours runs both modalities)")
    ap.add_argument("--single-cls", action="store_true")
    ap.add_argument("--max-labels", type=int, default=300)
    ap.add_argument("--save-json", type=str, default="")
    ap.add_argument("--save-coco", type=str, default="",
                    help="write COCO-format detection JSON (test.py:172-182)")
    ap.add_argument("--verbose", action="store_true")
    ap.add_argument("--wandb", action="store_true",
                    help="log metrics + bbox-debug panels of the first 16 "
                         "val images to W&B (test.py:160-170; no-op if "
                         "wandb is not installed)")
    ap.add_argument("--entity", type=str, default=None,
                    help="W&B entity")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--save-txt", action="store_true",
                    help="write per-image label txt files "
                         "(labels/<stem>.txt: cls xywh-normalized, native "
                         "space; test.py:296-303)")
    ap.add_argument("--save-hybrid", action="store_true",
                    help="inject ground-truth labels into NMS as "
                         "unit-confidence candidates and save hybrid "
                         "label+prediction txts (test.py:117, 301)")
    ap.add_argument("--save-conf", action="store_true",
                    help="append confidence to --save-txt lines")
    ap.add_argument("--plots", action="store_true",
                    help="emit confusion_matrix.png + PR/F1/P/R curve pngs "
                         "into the run dir (test.py:253-257)")
    ap.add_argument("--project", type=str, default="runs/test")
    ap.add_argument("--name", type=str, default="exp")
    ap.add_argument("--exist-ok", action="store_true")
    ap.add_argument("--no-rect", action="store_true",
                    help="square letterbox instead of rect batches (pad 0.5)")
    ap.add_argument("--compute-loss", action="store_true",
                    help="also report box/obj/cls val loss (test.py:122)")
    ap.add_argument("--no-fuse", action="store_true",
                    help="keep live BatchNorm instead of conv-folded "
                         "inference (reference fuses by default)")
    ap.add_argument("--int8", action="store_true",
                    help="weights-only int8 inference: conv/dense kernels "
                         "stored int8 + per-channel scale, dequantized "
                         "on device (models/quantize.py; the TPU "
                         "counterpart of the reference's fp16 inference, "
                         "test.py:66-68)")
    ap.add_argument("--device", type=str, default="",
                    help="'cpu' forces the CPU platform; CUDA-style indices "
                         "are a no-op on TPU (test.py:303 compat)")
    ap.add_argument("--data-parallel", type=int, default=0,
                    help="shard eval batches over N devices of a "
                         "jax.sharding.Mesh (0 = single device). The "
                         "reference has no distributed eval.")
    return ap.parse_args(argv)


def _build(args, img_size):
    import jax.numpy as jnp

    from ..models import build_model
    from ..models.configs import get_config
    from ..models.model import fuse_conv_bn
    from ..utils.checkpoint import load_inference_params

    with open(args.data) as f:
        data = yaml.safe_load(f)
    nc = 1 if args.single_cls else int(data["nc"])
    two_stream = "val_ir" in data
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    cfg = args.cfg if args.cfg.endswith((".yaml", ".yml")) else \
        get_config(args.cfg, nc=nc)
    weights = args.weights if isinstance(args.weights, list) else \
        [args.weights]
    members = [load_inference_params(w) for w in weights]
    if args.no_fuse:
        model = build_model(cfg, nc=nc, dtype=dtype)
    else:
        # BN folded into convs, like the reference attempt_load -> .fuse()
        model = build_model(cfg, nc=nc, dtype=dtype, fused=True)
        # residual stats stay live for non-conv-adjacent BNs
        # (BottleneckCSP/MixConv2d/CrossConv)
        members = [fuse_conv_bn(p, s) for p, s in members]
    from ..models.model import cast_inference_params
    members = [(cast_inference_params(p, dtype), s) for p, s in members]
    if len(members) == 1:
        params, stats = members[0]
    else:
        from ..utils.checkpoint import stack_param_trees

        params = stack_param_trees([p for p, _ in members])
        stats = stack_param_trees([s for _, s in members])
        logger.info(f"ensemble of {len(members)} checkpoints "
                    f"(mode={args.ensemble_mode})")
    # commit to device once — checkpoint loads give host numpy trees, and
    # feeding those to a jitted forward re-uploads the model every batch
    import jax

    params = jax.device_put(params)
    stats = jax.device_put(stats)
    if args.int8:
        from ..models.quantize import quantize_int8

        params = jax.jit(quantize_int8)(params)
    return model, params, stats, data, nc, two_stream


def run(args) -> dict:
    from ..data.datasets import BatchLoader, PairedDetectionDataset
    from ..train.evaluator import evaluate
    from ..train.trainer import make_eval_forward
    from ..utils.general import (apply_device_arg, check_img_size,
                                 enable_compilation_cache, set_logging)

    set_logging()
    apply_device_arg(getattr(args, "device", ""))
    enable_compilation_cache()
    img_size = check_img_size(args.img_size, 32)
    model, params, stats, data, nc, two_stream = _build(args, img_size)

    split = "test" if args.task == "test" and "test_rgb" in data else "val"
    ds = PairedDetectionDataset.from_sources(
        data[f"{split}_rgb"] if two_stream else data[split],
        data.get(f"{split}_ir"), img_size=img_size, augment=False,
        nc=None if args.single_cls else nc,
        rect=not args.no_rect, pad=0.5)  # reference protocol (test.py:93)
    if args.single_cls:
        for l in ds.labels:
            if len(l):
                l[:, 0] = 0
    loader = BatchLoader(ds, args.batch_size, shuffle=False,
                         max_labels=args.max_labels, drop_last=False)
    if args.augment and args.compute_loss:
        raise SystemExit("--augment cannot compute val loss (TTA feature "
                         "pyramids differ per scale); drop --compute-loss")
    if args.augment and args.data_parallel > 1:
        raise SystemExit("--augment is single-device; drop --data-parallel")
    n_members = len(args.weights) if isinstance(args.weights, list) else 1
    if n_members > 1:
        # reference ensemble: forward returns (dets, None), no val loss
        # (Ensemble.forward train_out=None, experimental.py:111)
        for flag, msg in [(args.compute_loss, "--compute-loss"),
                          (args.augment, "--augment"),
                          (args.data_parallel > 1, "--data-parallel"),
                          (args.int8, "--int8")]:
            if flag:
                raise SystemExit(f"{msg} is single-checkpoint; drop it or "
                                 f"pass one --weights")
        from ..train.trainer import make_eval_forward_ensemble

        fwd = make_eval_forward_ensemble(model, two_stream=two_stream,
                                         mode=args.ensemble_mode)
    elif args.augment:
        from ..train.trainer import make_eval_forward_tta

        fwd = make_eval_forward_tta(model, two_stream=two_stream)
    elif args.data_parallel > 1:
        import jax

        from ..parallel.mesh import make_mesh, make_parallel_eval_forward

        n = args.data_parallel
        if len(jax.devices()) < n:
            raise SystemExit(
                f"--data-parallel {n} needs {n} devices, "
                f"found {len(jax.devices())}")
        if args.batch_size % n:
            raise SystemExit(
                f"--batch-size {args.batch_size} must be divisible by "
                f"--data-parallel {n}")
        mesh = make_mesh(n_data=n, n_model=1, devices=jax.devices()[:n])
        fwd = make_parallel_eval_forward(model, two_stream=two_stream,
                                         mesh=mesh,
                                         batch_size=args.batch_size)
        params = fwd.place_params(params)
        logger.info(f"data-parallel eval over {n} devices")
    else:
        fwd = make_eval_forward(model, two_stream=two_stream)
    if args.int8:
        if args.data_parallel > 1:
            raise SystemExit("--int8 is single-device; drop --data-parallel")
        import jax
        import jax.numpy as jnp

        from ..models.quantize import dequantize_int8

        inner = fwd
        dq = jnp.float32 if args.fp32 else jnp.bfloat16
        fwd = jax.jit(lambda p, s, a, b: inner(dequantize_int8(p, dq),
                                               s, a, b))

    if args.task == "speed":
        return speed_task(fwd, params, stats, loader, args)

    if args.task == "study":
        # mAP-vs-image-size sweep (test.py:360-371); rows are appended to
        # study_<cfg>.txt and plotted like plot_study_txt (plots.py:253)
        results = {}
        rows = []
        for sz in [256, 320, 384, 448, 512, 640]:
            sub_args = argparse.Namespace(**vars(args))
            sub_args.img_size = sz
            sub_args.task = "val"
            sub_args.plots = sub_args.save_txt = sub_args.save_hybrid = False
            r = run(sub_args)
            results[sz] = {"map50": r["map50"], "map": r["map"]}
            rows.append([sz, r["mp"], r["mr"], r["map50"], r["map"],
                         r["t_infer_ms"], r["t_nms_ms"]])
            logger.info(f"study @{sz}: mAP50 {r['map50']:.3f}")
        from ..utils.general import increment_path
        from ..utils.plots import plot_study

        save_dir = increment_path(Path(args.project) / args.name,
                                  exist_ok=args.exist_ok)
        save_dir.mkdir(parents=True, exist_ok=True)
        stem = Path(str(args.cfg)).stem
        sf = save_dir / f"study_{stem}.txt"
        np.savetxt(sf, np.asarray(rows), fmt="%.5g")
        plot_study([str(sf)], str(save_dir / "study.png"))
        logger.info(f"study results -> {sf}")
        return results

    coco = None
    if args.save_coco:
        coco = _save_coco_json(fwd, params, stats, loader, ds, args)

    loss_fn = None
    if args.compute_loss:
        from ..models.detect import anchor_arrays
        from ..train.loss import DetectionLoss, LossHyp, scale_gains

        # same gain rescaling the trainer applies (reference train.py:661-663)
        # so reported val losses are on the training scale
        loss_fn = DetectionLoss(nc=nc,
                                anchors_px=anchor_arrays(model.spec.anchors),
                                strides=model.spec.strides,
                                hyp=scale_gains(LossHyp(), nc=nc,
                                                img_size=args.img_size,
                                                nl=len(model.spec.strides)))

    # report surface (test.py:253-257, 296-303): run dir is created only
    # when an artifact was requested
    names = data.get("names", [str(i) for i in range(nc)])
    save_dir = None
    per_image = confusion = None
    if args.save_txt or args.save_hybrid or args.plots:
        from ..utils.general import increment_path

        save_dir = increment_path(Path(args.project) / args.name,
                                  exist_ok=args.exist_ok)
        save_dir.mkdir(parents=True, exist_ok=True)
    if args.plots:
        from ..utils.metrics import ConfusionMatrix

        confusion = ConfusionMatrix(nc=nc)
    if args.save_txt or args.save_hybrid:
        (save_dir / "labels").mkdir(exist_ok=True)

        def per_image(idx, boxes, scores, classes, native_hw):
            # native xyxy -> normalized xywh lines (test.py:296-303)
            h0, w0 = native_hw
            stem = Path(ds.rgb_files[idx]).stem
            lines = []
            for b, s, c in zip(boxes, scores, classes):
                xc = (b[0] + b[2]) / 2 / w0
                yc = (b[1] + b[3]) / 2 / h0
                w = (b[2] - b[0]) / w0
                h = (b[3] - b[1]) / h0
                row = [int(c), xc, yc, w, h] + (
                    [s] if args.save_conf else [])
                lines.append(" ".join(f"{v:.6g}" if not isinstance(v, int)
                                      else str(v) for v in row))
            (save_dir / "labels" / f"{stem}.txt").write_text(
                "\n".join(lines) + ("\n" if lines else ""))

    # W&B bbox-debug panels of the first 16 val images (test.py:160-170)
    xlog = panels = None
    if args.wandb:
        from ..utils.loggers import ExperimentLogger

        xlog = ExperimentLogger(
            str(save_dir or Path(args.project) / args.name),
            enable_tb=False, enable_wandb=True, run_name=args.name,
            entity=args.entity)
        if xlog.wandb_run is not None:
            panels = []
            base_pi = per_image

            def per_image(idx, boxes, scores, classes, native_hw,
                          _base=base_pi):
                if _base is not None:
                    _base(idx, boxes, scores, classes, native_hw)
                if len(panels) < 16 and idx < len(ds.rgb_files):
                    import cv2 as _cv2

                    im = _cv2.imread(ds.rgb_files[idx])
                    if im is not None:
                        panels.append((im[:, :, ::-1],
                                       (boxes, scores, classes)))

    res = evaluate(fwd, params, stats, loader, nc=nc,
                   conf_thres=args.conf_thres, iou_thres=args.iou_thres,
                   single_cls=args.single_cls, loss_fn=loss_fn,
                   hybrid=args.save_hybrid, per_image=per_image,
                   confusion=confusion, curves=args.plots)
    if panels:
        xlog.log_bbox_debug_images([p[0] for p in panels],
                                   [p[1] for p in panels], names)
    if xlog is not None:
        xlog.log_scalars({"metrics/precision": res["mp"],
                          "metrics/recall": res["mr"],
                          "metrics/mAP_0.5": res["map50"],
                          "metrics/mAP_0.75": res["map75"],
                          "metrics/mAP_0.5:0.95": res["map"]}, 0)
        xlog.close()

    if args.plots:
        from ..utils.plots import (plot_confusion_matrix, plot_mc_curve,
                                   plot_pr_curve)

        plot_confusion_matrix(confusion.matrix, names,
                              str(save_dir / "confusion_matrix.png"))
        cv = res.get("curves")
        if cv is not None:
            cls_names = [names[int(c)] if int(c) < len(names) else str(c)
                         for c in cv["cls_ids"]]
            plot_pr_curve(cv["pr_px"], cv["pr_py"], cv["ap"],
                          str(save_dir / "PR_curve.png"), cls_names)
            for key, fname in (("f1", "F1_curve.png"), ("p", "P_curve.png"),
                               ("r", "R_curve.png")):
                plot_mc_curve(cv["px"], cv[key],
                              str(save_dir / fname), cls_names,
                              ylabel=key.upper())
        logger.info(f"plots -> {save_dir}")
    if coco is not None:
        res["coco"] = coco
    if "val_loss" in res:
        vb, vo, vc = res["val_loss"]
        logger.info(f"val loss: box {vb:.4f} obj {vo:.4f} cls {vc:.4f}")
    if "lamr" in res:
        logger.info(f"log-average miss rate: {res['lamr']:.4f}")
    logger.info(f"{'class':>12} {'P':>8} {'R':>8} {'mAP50':>8} "
                f"{'mAP75':>8} {'mAP':>8}")
    logger.info(f"{'all':>12} {res['mp']:8.3f} {res['mr']:8.3f} "
                f"{res['map50']:8.3f} {res['map75']:8.3f} {res['map']:8.3f}")
    if args.verbose:
        for c, d in res.get("per_class", {}).items():
            nm = names[c] if c < len(names) else str(c)
            logger.info(f"{nm:>12} {d['p']:8.3f} {d['r']:8.3f} "
                        f"{d['ap50']:8.3f} {d['ap75']:8.3f} {d['ap']:8.3f}")
    logger.info(f"speed: {res['t_infer_ms']:.2f} ms infer, "
                f"{res['t_nms_ms']:.2f} ms NMS per image")
    if args.save_json:
        Path(args.save_json).write_text(json.dumps(
            {k: v for k, v in res.items()
             if k != "curves" and isinstance(v, (int, float, dict))},
            indent=1, default=float))
    return res


def _save_coco_json(fwd, params, stats, loader, ds, args):
    """COCO detection records [{image_id, category_id, bbox, score}, ...]
    (test.py:172-182); bbox is xywh top-left, native space."""
    from ..ops.nms import batched_nms
    from ..train.evaluator import _rescale_to_native
    from ..utils.general import coco80_to_coco91_class

    is_coco = "coco" in str(args.data).lower()
    c91 = coco80_to_coco91_class()
    jdict = []
    gt_records = []
    img_i = 0
    for batch in loader:
        rgb = batch["rgb"]
        ir = batch.get("ir", rgb)
        dets_flat, _ = fwd(params, stats, rgb, ir)
        det = batched_nms(dets_flat, conf_thres=args.conf_thres,
                          iou_thres=args.iou_thres,
                          multi_label=not args.single_cls,
                          agnostic=args.single_cls)
        S = rgb.shape[1]
        for si in range(rgb.shape[0]):
            stem = Path(ds.rgb_files[img_i]).stem
            image_id = int(stem) if stem.isnumeric() else stem
            v = np.asarray(det.valid[si])
            boxes = np.asarray(det.boxes[si])[v]
            native_hw, ratio_pad = batch["shapes"][si]
            if len(boxes):
                boxes = _rescale_to_native(boxes, (S, S), native_hw, ratio_pad)
            for b, s, c in zip(boxes, np.asarray(det.scores[si])[v],
                               np.asarray(det.classes[si])[v]):
                jdict.append({
                    "image_id": image_id,
                    "category_id": c91[int(c)] if is_coco else int(c),
                    "bbox": [round(float(b[0]), 3), round(float(b[1]), 3),
                             round(float(b[2] - b[0]), 3),
                             round(float(b[3] - b[1]), 3)],
                    "score": round(float(s), 5),
                })
            # ground truth in the same native xywh space, for the internal
            # COCO-protocol cross-check (test.py:262-285 runs pycocotools
            # here; we evaluate the protocol internally)
            lab = ds.labels[img_i]
            h0, w0 = native_hw
            for row in np.asarray(lab, np.float32).reshape(-1, 5):
                cls_i = int(row[0])
                gt_records.append({
                    "image_id": image_id,
                    "category_id": c91[cls_i] if is_coco else cls_i,
                    "bbox": [float((row[1] - row[3] / 2) * w0),
                             float((row[2] - row[4] / 2) * h0),
                             float(row[3] * w0), float(row[4] * h0)],
                })
            img_i += 1
    Path(args.save_coco).write_text(json.dumps(jdict))
    logger.info(f"wrote {len(jdict)} COCO records -> {args.save_coco}")

    from ..utils.cocoeval import coco_eval_bbox

    coco = coco_eval_bbox(gt_records, jdict)
    logger.info(f"COCO-protocol bbox eval (internal pycocotools-equivalent): "
                f"AP {coco['AP']:.4f}  AP50 {coco['AP50']:.4f}  "
                f"AP75 {coco['AP75']:.4f}")
    return coco


def speed_task(fwd, params, stats, loader, args) -> dict:
    """--task speed (test.py:354-358): latency at conf 0.25 / iou 0.45."""
    batch = next(iter(loader))
    rgb, ir = batch["rgb"], batch.get("ir", batch["rgb"])
    for _ in range(3):
        out, _ = fwd(params, stats, rgb, ir)
        np.asarray(out)
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        out, _ = fwd(params, stats, rgb, ir)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / n / rgb.shape[0] * 1000
    logger.info(f"forward+decode: {dt:.2f} ms/image @ bs{rgb.shape[0]}")
    return {"ms_per_image": dt}


def main(argv=None):
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
