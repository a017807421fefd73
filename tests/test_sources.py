"""Inference media sources coverage."""

import numpy as np
import pytest


def test_media_source_images_and_video(tmp_path):
    import cv2

    from multispectral_object_detection_tpu.data.sources import MediaSource

    rng = np.random.default_rng(0)
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        cv2.imwrite(str(d / f"{i}.jpg"),
                    rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    vid = d / "v.mp4"
    w = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 5, (32, 32))
    for _ in range(4):
        w.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    w.release()

    frames = list(MediaSource(str(d)))
    # 3 images + 4 video frames, all RGB HWC
    assert len(frames) == 7
    for name, img, cap in frames:
        assert img.shape == (32, 32, 3)

    only_video = list(MediaSource(str(vid)))
    assert len(only_video) == 4
    assert only_video[0][2] is not None  # capture handle exposed


def test_media_source_single_image(tmp_path):
    import cv2

    from multispectral_object_detection_tpu.data.sources import MediaSource

    p = tmp_path / "x.png"
    cv2.imwrite(str(p), np.zeros((16, 16, 3), np.uint8))
    out = list(MediaSource(str(p)))
    assert len(out) == 1 and out[0][2] is None
