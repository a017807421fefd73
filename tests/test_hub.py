"""Hub factory + Detector wrapper tests."""

import numpy as np
import pytest


def test_detector_single_stream_on_arrays():
    from multispectral_object_detection_tpu.hub import Detector

    det = Detector("yolov5n", nc=2, img_size=64, conf=0.001)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (48, 80, 3), dtype=np.uint8),
            rng.integers(0, 255, (100, 64, 3), dtype=np.uint8)]
    res = det(imgs)
    assert len(res) == 2
    dfs = res.pandas()
    assert list(dfs[0].columns) == ["xmin", "ymin", "xmax", "ymax",
                                    "confidence", "class", "name"]
    # boxes live in native space
    for i, df in enumerate(dfs):
        if len(df):
            assert df["xmax"].max() <= imgs[i].shape[1] + 1e-3
            assert df["ymax"].max() <= imgs[i].shape[0] + 1e-3
    rendered = res.render()
    assert rendered[0].shape == imgs[0].shape


def test_detector_two_stream():
    from multispectral_object_detection_tpu.hub import Detector

    det = Detector("yolov5n_fusion_add", nc=1, img_size=64, conf=0.001)
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    ir = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    res = det([rgb], [ir])
    assert len(res) == 1


def test_detector_int8():
    """int8=True quantizes resident weights (models/quantize.py) and still
    detects; the pipeline matches the fp Detector on the same inputs to
    within quantization jitter (numerics pinned in tests/test_quantize.py)."""
    from multispectral_object_detection_tpu.hub import Detector

    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    ir = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    det_q = Detector("yolov5n_fusion_add", nc=1, img_size=64, conf=1e-5,
                     int8=True)
    res_q = det_q([rgb], [ir])
    assert len(res_q) == 1
    # resident tree really is quantized (int8 'q' leaves present)
    import jax

    kinds = {getattr(x, "dtype", None) for x in
             jax.tree_util.tree_leaves(det_q.params)}
    assert any(str(k) == "int8" for k in kinds)


def test_hubconf_constructors():
    import hubconf

    det = hubconf.yolov5n(nc=3, img_size=64)
    assert det.model.spec.nc == 3
    assert not det.two_stream
    det2 = hubconf.cft_s(nc=1, img_size=64)
    assert det2.two_stream
    det3 = hubconf.yolov5s6(nc=2, img_size=64)  # P6 family (hubconf.py:105)
    assert det3.model.spec.nl == 4  # 4 detect scales P3-P6


def test_rest_api_build():
    pytest.importorskip("flask")
    from multispectral_object_detection_tpu.hub import Detector
    from multispectral_object_detection_tpu.serve.rest_api import build_app

    det = Detector("yolov5n", nc=1, img_size=64)
    app = build_app(det, "yolov5n")
    client = app.test_client()
    assert client.get("/healthz").status_code == 200
