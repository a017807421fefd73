"""Hub-style constructors (reference hubconf.py:21-122).

Usage:
    from hubconf import yolov5s, cft
    det = yolov5s(nc=80)                         # random init
    det = cft(weights="runs/train/exp/best")     # flagship from checkpoint
    results = det([rgb_array], [ir_array])
"""

from multispectral_object_detection_tpu.hub import Detector, create  # noqa: F401


def _make(name):
    def ctor(nc=None, weights=None, img_size=640, **kw):
        return Detector(name, nc=nc, weights=weights, img_size=img_size, **kw)

    ctor.__name__ = name
    return ctor


yolov5n = _make("yolov5n")
yolov5s = _make("yolov5s")
yolov5m = _make("yolov5m")
yolov5l = _make("yolov5l")
yolov5x = _make("yolov5x")
# P6 (4-scale, 1280px) family — reference hubconf.py:105-122
yolov5s6 = _make("yolov5s6")
yolov5m6 = _make("yolov5m6")
yolov5l6 = _make("yolov5l6")
yolov5x6 = _make("yolov5x6")
cft = _make("yolov5l_fusion_transformerx3")
cft_s = _make("yolov5s_fusion_transformerx3")
fusion_add = _make("yolov5l_fusion_add")


def custom(cfg_or_name, nc=None, weights=None, **kw):
    return Detector(cfg_or_name, nc=nc, weights=weights, **kw)
