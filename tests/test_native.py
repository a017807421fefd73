"""Native C++ image runtime vs the cv2 reference implementations."""

import numpy as np
import pytest

from multispectral_object_detection_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def test_jpeg_decode_roundtrip(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 96, 3), dtype=np.uint8)
    p = tmp_path / "x.jpg"
    cv2.imwrite(str(p), img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
    ours = native.decode_jpeg(p.read_bytes())
    ref = cv2.imread(str(p))[:, :, ::-1]
    assert ours.shape == ref.shape
    # decoders may differ by small IDCT rounding
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 2.0


def test_resize_bilinear_matches_cv2():
    import cv2

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)
    ours = native.resize(img, 100, 140)
    ref = cv2.resize(img, (140, 100), interpolation=cv2.INTER_LINEAR)
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.0


def test_resize_area_matches_cv2():
    import cv2

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    ours = native.resize(img, 64, 48)
    ref = cv2.resize(img, (48, 64), interpolation=cv2.INTER_AREA)
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 1.0


def test_pad_center_matches_letterbox():
    from multispectral_object_detection_tpu.data.augment import letterbox

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (480, 640, 3), dtype=np.uint8)
    ref, ratio, (dw, dh) = letterbox(img, (640, 640), auto=False)
    top = int(round(dh - 0.1))
    left = int(round(dw - 0.1))
    ours = native.pad_center(img, 640, 640, top, left, 114)
    np.testing.assert_array_equal(ours, ref)


def test_warp_affine_matches_cv2():
    import cv2

    rng = np.random.default_rng(4)
    img = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
    M = np.array([[0.9, 0.1, 5.0], [-0.08, 1.05, -3.0]], dtype=np.float64)
    ours = native.warp_affine(img, M, 96, 96, 114)
    ref = cv2.warpAffine(img, M, (96, 96), borderValue=(114, 114, 114))
    diff = np.abs(ours.astype(int) - ref.astype(int))
    assert np.mean(diff) < 2.0
    assert np.quantile(diff, 0.99) <= 30  # interpolation rounding at edges


def test_hsv_jitter_reasonable():
    import cv2

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    r = [1.01, 1.2, 0.9]
    ours = native.hsv_jitter(img.copy(), *r)

    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    x = np.arange(0, 256, dtype=np.int16)
    lut_h = ((x * r[0]) % 180).astype(np.uint8)
    lut_s = np.clip(x * r[1], 0, 255).astype(np.uint8)
    lut_v = np.clip(x * r[2], 0, 255).astype(np.uint8)
    ref = cv2.cvtColor(cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s),
                                  cv2.LUT(val, lut_v))), cv2.COLOR_HSV2RGB)
    assert np.mean(np.abs(ours.astype(int) - ref.astype(int))) < 3.0


def test_native_backend_load_scaled(tmp_path, monkeypatch):
    """MSOD_NATIVE=1 path produces the same geometry as the cv2 path."""
    import cv2

    from multispectral_object_detection_tpu.data import augment

    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
    p = tmp_path / "x.jpg"
    cv2.imwrite(str(p), img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])

    ref, hw_ref = augment.load_scaled(str(p), 64)
    monkeypatch.setattr(augment, "_USE_NATIVE", True)
    out, hw = augment.load_scaled(str(p), 64)
    assert hw == hw_ref and out.shape == ref.shape
    assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 4.0
