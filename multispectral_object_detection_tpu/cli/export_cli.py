"""Model export — the TPU-native equivalent of models/export.py.

The reference exports TorchScript / ONNX / CoreML (export.py:66-124). The
XLA-native deployment artifact is a serialized **StableHLO** program
(jax.export): portable across JAX versions and loadable from C++ (PJRT) or
Python without the model-building code. We also emit the msgpack weights and
a JSON manifest (input shapes/dtypes, class names, stride/anchor metadata).

Interchange for non-JAX consumers (the reference's ONNX/CoreML role):
`--saved-model` emits a TensorFlow SavedModel via jax2tf and `--tflite` a
TFLite flatbuffer — both serve the reference's deployment targets
(TF Serving / mobile). Direct ONNX emission is CLOSED in this environment:
no `onnx`/`tf2onnx` package ships here (measured, round 3) — the SavedModel
is the documented bridge (tf2onnx converts it offline where available).
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

logger = logging.getLogger(__name__)


def parse_args(argv=None):
    ap = argparse.ArgumentParser("export")
    ap.add_argument("--cfg", type=str, default="yolov5l_fusion_transformerx3")
    ap.add_argument("--weights", type=str, required=True)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--nc", type=int, default=1)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--with-nms", action="store_true")
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--saved-model", action="store_true",
                    help="also export a TF SavedModel via jax2tf (the "
                         "interchange path for non-JAX consumers; convert "
                         "to ONNX offline with tf2onnx)")
    ap.add_argument("--tflite", action="store_true",
                    help="also export a TFLite flatbuffer (the reference's "
                         "CoreML mobile role, export.py:113-124)")
    # ---- reference-compat flags (models/export.py:29-35) ----
    ap.add_argument("--grid", action="store_true",
                    help="accepted for compatibility (export.py:32): the "
                         "exported program always runs Detect's grid "
                         "decode (model.decode); add --with-nms to also "
                         "bake in NMS")
    ap.add_argument("--device", type=str, default="",
                    help="'cpu' forces the CPU platform for the export "
                         "trace; StableHLO itself is device-portable")
    ap.add_argument("--dynamic", action="store_true",
                    help="dynamic batch/size axes (export.py:33) — "
                         "rejected by design: XLA/TPU programs are "
                         "static-shape; export one artifact per shape "
                         "instead (this flag logs that and proceeds "
                         "static)")
    ap.add_argument("--simplify", action="store_true",
                    help="accepted for compatibility (export.py:34, "
                         "onnx-simplifier): XLA already canonicalizes/"
                         "fuses during lowering; no-op here")
    return ap.parse_args(argv)


def run(args) -> str:
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..models import build_model
    from ..models.configs import get_config
    from ..ops.nms import batched_nms
    from ..utils.checkpoint import load_inference_params
    from ..utils.general import apply_device_arg, enable_compilation_cache

    apply_device_arg(getattr(args, "device", ""))
    enable_compilation_cache()
    if getattr(args, "dynamic", False):
        logger.info("--dynamic: XLA programs are static-shape by design; "
                    "exporting the requested fixed shape (run once per "
                    "deployment shape instead)")

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    cfg = args.cfg if args.cfg.endswith((".yaml", ".yml")) else \
        get_config(args.cfg, nc=args.nc)
    model = build_model(cfg, nc=args.nc, dtype=dtype)
    params, stats = load_inference_params(args.weights)
    two = model.spec.two_stream
    b, s = args.batch_size, args.img_size

    def fn(rgb, ir):
        x = rgb.astype(jnp.float32) / 255.0
        ins = (x,) if not two else (x, ir.astype(jnp.float32) / 255.0)
        feats = model.apply({"params": params, "batch_stats": stats},
                            *ins, train=False)
        dets = model.decode(feats)
        if args.with_nms:
            d = batched_nms(dets, conf_thres=0.25, iou_thres=0.45,
                            multi_label=False, max_det=300, top_k=1024)
            return d.boxes, d.scores, d.classes, d.valid
        return dets

    shape = jax.ShapeDtypeStruct((b, s, s, 3), jnp.uint8)
    exported = jexport.export(jax.jit(fn))(shape, shape)

    out = Path(args.out or (Path(args.weights) / "export"))
    out.mkdir(parents=True, exist_ok=True)
    (out / "model.stablehlo").write_bytes(exported.serialize())
    manifest = {
        "cfg": args.cfg, "nc": args.nc, "two_stream": two,
        "input": {"shape": [b, s, s, 3], "dtype": "uint8",
                  "order": ["rgb", "ir"] if two else ["rgb"]},
        "strides": list(model.spec.strides),
        "anchors": [list(a) for a in model.spec.anchors],
        "with_nms": args.with_nms,
        "platforms": list(exported.platforms),
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=1))
    logger.info(f"exported StableHLO -> {out}")

    if args.saved_model or args.tflite:
        # jax2tf bridge: bf16 params confuse the TFLite converter and some
        # TF kernels on CPU — export the fp32 build for interchange
        import tensorflow as tf
        from jax.experimental import jax2tf

        tf_fn = jax2tf.convert(fn, with_gradient=False)
        spec = tf.TensorSpec((b, s, s, 3), tf.uint8)
        tff = tf.function(tf_fn, input_signature=[spec, spec],
                          autograph=False)
        if args.saved_model:
            module = tf.Module()
            module.f = tff
            sm_dir = out / "saved_model"
            tf.saved_model.save(
                module, str(sm_dir),
                signatures=tff.get_concrete_function(spec, spec))
            logger.info(f"exported TF SavedModel -> {sm_dir}")
        if args.tflite:
            conv = tf.lite.TFLiteConverter.from_concrete_functions(
                [tff.get_concrete_function(spec, spec)])
            conv.target_spec.supported_ops = [
                tf.lite.OpsSet.TFLITE_BUILTINS,
                tf.lite.OpsSet.SELECT_TF_OPS,  # jax2tf emits a few TF ops
            ]
            (out / "model.tflite").write_bytes(conv.convert())
            logger.info(f"exported TFLite -> {out / 'model.tflite'}")
    return str(out)


def main(argv=None):
    logging.basicConfig(level=logging.INFO, format="%(message)s")
    return run(parse_args(argv))


if __name__ == "__main__":
    main()
