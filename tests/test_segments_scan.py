"""Segment-format labels + corrupt-tolerant dataset scan (VERDICT r4 #2/#3).

Golden values in tests/data/golden_segments.npz were computed by running the
reference's xyn2xy/segments2boxes/resample_segments/segment2box
(utils/general.py:318-354) under numpy (torchvision stubbed via
tools/parity_harness._stub_torchvision). Regenerate with the snippet in the
round-5 git history if the reference functions ever change.
"""

import logging
import random as pyrandom
from pathlib import Path

import numpy as np
import pytest
import yaml

from multispectral_object_detection_tpu.data.datasets import (
    PairedDetectionDataset, list_images, read_label_file, scan_dataset)
from multispectral_object_detection_tpu.data.synthetic import (
    make_paired_dataset)

DATA = Path(__file__).parent / "data"


def _golden():
    z = np.load(DATA / "golden_segments.npz")
    lens = z["seg_lens"]
    offs = np.concatenate([[0], np.cumsum(lens * 2)])

    def split(flat):
        return [flat[offs[i]:offs[i + 1]].reshape(-1, 2)
                for i in range(len(lens))]

    return z, split


def test_segment_converts_golden():
    """xyn2xy / segments2boxes / resample_segments / segment2box match the
    reference bit-for-bit on recorded inputs (general.py:318-354)."""
    from multispectral_object_detection_tpu.ops.boxes import (
        resample_segments, segment2box, segments2boxes, xyn2xy)

    z, split = _golden()
    segs_n = split(z["segs_n"])
    px_ref = split(z["px"])
    px = [xyn2xy(s, 320.0, 240.0, 7.0, 3.0) for s in segs_n]
    for a, b in zip(px, px_ref):
        np.testing.assert_allclose(a, b, rtol=1e-6)

    np.testing.assert_allclose(segments2boxes(px), z["boxes_xywh"], rtol=1e-6)

    res = resample_segments([p.copy() for p in px], n=50)
    np.testing.assert_allclose(np.stack(res), z["res50"], rtol=1e-6)

    px_shift = split(z["px_shift"])
    s2b = np.stack([segment2box(p, 320, 240) for p in px_shift])
    np.testing.assert_allclose(s2b, z["s2b"], rtol=1e-6)


def test_read_label_file_segment_format(tmp_path):
    """A polygon row (>8 cols) is reduced to its bounding box — previously
    it was silently truncated to the first 5 values (garbage boxes)."""
    lb = tmp_path / "seg.txt"
    # cls 1, pentagon inside [0.2, 0.6] x [0.1, 0.5]
    lb.write_text("1 0.2 0.1 0.6 0.1 0.6 0.5 0.2 0.5 0.4 0.3\n"
                  "0 0.05 0.05 0.15 0.05 0.15 0.15 0.05 0.15\n")
    lab, segs = read_label_file(str(lb), nc=2, with_segments=True)
    assert lab.shape == (2, 5)
    np.testing.assert_allclose(lab[0], [1, 0.4, 0.3, 0.4, 0.4], atol=1e-6)
    np.testing.assert_allclose(lab[1], [0, 0.1, 0.1, 0.1, 0.1], atol=1e-6)
    assert len(segs) == 2 and segs[0].shape == (5, 2)

    # box-format files return no segments and reject ragged rows
    (tmp_path / "box.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    lab2, segs2 = read_label_file(str(tmp_path / "box.txt"), 2,
                                  with_segments=True)
    assert lab2.shape == (1, 5) and segs2 == []
    (tmp_path / "bad.txt").write_text("0 0.5 0.5 0.2 0.2 0.9\n")
    with pytest.raises(AssertionError):
        read_label_file(str(tmp_path / "bad.txt"))
    (tmp_path / "dup.txt").write_text("0 0.5 0.5 0.2 0.2\n0 0.5 0.5 0.2 0.2\n")
    with pytest.raises(AssertionError, match="duplicate"):
        read_label_file(str(tmp_path / "dup.txt"))


def _segmentize_labels(rgb_dir: str):
    """Rewrite a box-format synthetic dataset's labels as 5-point polygons
    whose extent equals the original box (so targets are unchanged)."""
    n = 0
    for lb in sorted(Path(rgb_dir).parent.glob("labels/*.txt")):
        rows = []
        for ln in lb.read_text().splitlines():
            c, x, y, w, h = map(float, ln.split())
            x1, y1 = max(x - w / 2, 0.0), max(y - h / 2, 0.0)
            x2, y2 = min(x + w / 2, 1.0), min(y + h / 2, 1.0)
            rows.append(f"{int(c)} {x1} {y1} {x2} {y1} {x2} {y2} "
                        f"{x1} {y2} {(x1 + x2) / 2} {y1}")
        lb.write_text("\n".join(rows) + "\n")
        n += 1
    assert n > 0
    return n


def test_segment_dataset_mosaic_and_training(tmp_path):
    """A segment-format dataset loads, mosaics (point-wise warp path), and
    trains end-to-end through the CLI."""
    rgb_dir, ir_dir = make_paired_dataset(str(tmp_path / "d"), n_images=8,
                                          img_size=96, nc=2, seed=9)
    _segmentize_labels(rgb_dir)

    ds = PairedDetectionDataset.from_sources(rgb_dir, ir_dir, img_size=96,
                                             augment=True,
                                             hyp=dict(mosaic=1.0), nc=2)
    assert any(len(s) for s in ds.segments)
    assert all(len(s) == len(l) for s, l in zip(ds.segments, ds.labels))
    rgb, ir, lab, _ = ds.get(0, pyrandom.Random(0))
    assert rgb.shape == (96, 96, 3)
    if len(lab):
        assert (lab[:, 1:] >= 0).all() and (lab[:, 1:] <= 1).all()

    data_yaml = tmp_path / "seg.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "train_rgb": rgb_dir, "train_ir": ir_dir,
        "val_rgb": rgb_dir, "val_ir": ir_dir,
        "nc": 2, "names": ["red", "blue"]}))
    from multispectral_object_detection_tpu.cli.train_cli import main

    res = main([
        "--cfg", "yolov5n_fusion_add", "--data", str(data_yaml),
        "--epochs", "1", "--batch-size", "4", "--img-size", "96",
        "--project", str(tmp_path / "runs"), "--name", "seg", "--fp32",
        "--max-labels", "30", "--noautoanchor"])
    assert np.isfinite(res["map50"])


def test_scan_corrupt_tolerant(tmp_path, caplog):
    """One truncated JPEG + one malformed label: the scan warns, skips both
    pairs, reports correct counters, and training-path loading proceeds
    (reference datasets.py:1090-1131; we previously crashed on first error)."""
    rgb_dir, ir_dir = make_paired_dataset(str(tmp_path / "d"), n_images=8,
                                          img_size=96, nc=2, seed=3)
    rgb_files = list_images(rgb_dir)
    # truncate an image mid-file
    bad_img = Path(rgb_files[2])
    bad_img.write_bytes(bad_img.read_bytes()[:120])
    # malform a label (out-of-range coordinate)
    bad_lab = Path(rgb_files[5]).parent.parent / "labels"
    bad_lab = bad_lab / (Path(rgb_files[5]).stem + ".txt")
    bad_lab.write_text("0 1.5 0.5 0.2 0.2\n")

    res = scan_dataset(rgb_files, nc=2)
    assert res["counters"]["corrupt"] == 2
    assert res["counters"]["found"] == 7  # label files present for survivors
    assert res["keep"].sum() == 6

    with caplog.at_level(logging.WARNING):
        ds = PairedDetectionDataset.from_sources(rgb_dir, ir_dir, img_size=96,
                                                 augment=False, nc=2)
    assert len(ds) == 6
    assert ds.scan_counters["corrupt"] == 2
    assert any("corrupt" in r.message for r in caplog.records)
    # every surviving pair loads
    for i in range(len(ds)):
        rgb, ir, lab, _ = ds.get(i)
        assert rgb.shape == (96, 96, 3)


def test_scan_cache_roundtrip(tmp_path):
    """scan_pair_cached: second call reads the npz and returns identical
    labels/segments/keep (the reference's .cache round-trip)."""
    from multispectral_object_detection_tpu.data.datasets import (
        scan_pair_cached)

    rgb_dir, ir_dir = make_paired_dataset(str(tmp_path / "d"), n_images=4,
                                          img_size=96, nc=2, seed=7)
    _segmentize_labels(rgb_dir)
    rgb_files, ir_files = list_images(rgb_dir), list_images(ir_dir)
    a = scan_pair_cached(rgb_files, ir_files, str(tmp_path / "c"), nc=2)
    b = scan_pair_cached(rgb_files, ir_files, str(tmp_path / "c"), nc=2)
    np.testing.assert_array_equal(a["keep"], b["keep"])
    assert a["counters"] == b["counters"]
    for la, lb_ in zip(a["labels"], b["labels"]):
        np.testing.assert_array_equal(la, lb_)
    for sa, sb in zip(a["segments"], b["segments"]):
        assert len(sa) == len(sb)
        for x, y in zip(sa, sb):
            np.testing.assert_array_equal(x, y)
