"""Flask REST inference service (reference utils/flask_rest_api/restapi.py).

POST /v1/object-detection/<model>  with multipart field "image" (and
optionally "image_ir" for two-stream models) -> JSON records
[{xmin, ymin, xmax, ymax, confidence, class, name}, ...].

Run: python -m multispectral_object_detection_tpu.serve.rest_api \
         --model yolov5s --port 5000 [--weights CKPT_DIR]
"""

from __future__ import annotations

import argparse
import io
import logging

import numpy as np

logger = logging.getLogger(__name__)


def build_app(detector, model_name: str):
    from flask import Flask, request

    app = Flask(__name__)

    @app.route(f"/v1/object-detection/{model_name}", methods=["POST"])
    def predict():  # noqa: ANN001
        if "image" not in request.files:
            return {"error": "multipart field 'image' required"}, 400
        from PIL import Image

        rgb = np.asarray(Image.open(io.BytesIO(
            request.files["image"].read())).convert("RGB"))
        ir = None
        if "image_ir" in request.files:
            ir = np.asarray(Image.open(io.BytesIO(
                request.files["image_ir"].read())).convert("RGB"))
        if detector.two_stream and ir is None:
            return {"error": "two-stream model needs 'image_ir'"}, 400
        res = detector([rgb], [ir] if ir is not None else None)
        return res.pandas()[0].to_json(orient="records")

    @app.route("/healthz")
    def health():  # noqa: ANN001
        return {"status": "ok", "model": model_name}

    return app


def main(argv=None):
    ap = argparse.ArgumentParser("rest_api")
    ap.add_argument("--model", type=str, default="yolov5s")
    ap.add_argument("--nc", type=int, default=None)
    ap.add_argument("--weights", type=str, default=None)
    ap.add_argument("--img-size", type=int, default=640)
    ap.add_argument("--conf", type=float, default=0.25)
    ap.add_argument("--port", type=int, default=5000)
    ap.add_argument("--int8", action="store_true",
                    help="weights-only int8 storage (2.4x smaller resident "
                         "weights; serve more models per chip)")
    args = ap.parse_args(argv)

    from ..hub import Detector

    det = Detector(args.model, nc=args.nc, weights=args.weights,
                   img_size=args.img_size, conf=args.conf, int8=args.int8)
    app = build_app(det, args.model)
    app.run(host="0.0.0.0", port=args.port)


if __name__ == "__main__":
    main()
