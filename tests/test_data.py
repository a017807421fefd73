"""Data pipeline tests: geometry golden checks + end-to-end batch assembly."""

import numpy as np
import pytest

from multispectral_object_detection_tpu.data.augment import (
    augment_hsv, letterbox, mosaic4_pair, random_affine_pair)
from multispectral_object_detection_tpu.data.datasets import (
    BatchLoader, PairedDetectionDataset, collate_batch, image_to_label_path,
    list_images, read_label_file)
from multispectral_object_detection_tpu.data.synthetic import make_paired_dataset


@pytest.fixture(scope="module")
def paired_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    rgb_dir, ir_dir = make_paired_dataset(str(root), n_images=8, img_size=160,
                                          nc=2, seed=3)
    return rgb_dir, ir_dir


def test_letterbox_geometry():
    im = np.zeros((480, 640, 3), dtype=np.uint8)
    out, ratio, (dw, dh) = letterbox(im, (640, 640), auto=False)
    assert out.shape == (640, 640, 3)
    assert ratio == (1.0, 1.0)
    assert (dw, dh) == (0.0, 80.0)
    # pad rows are gray 114
    assert (out[:80] == 114).all() and (out[-80:] == 114).all()

    out2, r2, _ = letterbox(np.zeros((100, 50, 3), np.uint8), (640, 640),
                            auto=False)
    assert out2.shape == (640, 640, 3)
    assert abs(r2[0] - 6.4) < 1e-6

    # no-scaleup mode keeps small images unscaled (eval protocol)
    out3, r3, _ = letterbox(np.zeros((100, 50, 3), np.uint8), (640, 640),
                            auto=False, scaleup=False)
    assert r3 == (1.0, 1.0)


def test_letterbox_auto_stride_pad():
    im = np.zeros((500, 640, 3), dtype=np.uint8)
    out, _, _ = letterbox(im, (640, 640), auto=True, stride=32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape[0] <= 640


def test_hsv_preserves_shape_dtype_and_is_bounded():
    rng = np.random.default_rng(0)
    im = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
    out = augment_hsv(im.copy(), 0.015, 0.7, 0.4)
    assert out.shape == im.shape and out.dtype == np.uint8


def test_affine_identity_keeps_labels():
    import random as pyrandom

    im = np.full((128, 128, 3), 50, np.uint8)
    labels = np.array([[0, 20.0, 30.0, 60.0, 90.0]], dtype=np.float32)
    rgb, ir, lab = random_affine_pair(im.copy(), im.copy(), labels.copy(),
                                      degrees=0, translate=0.0, scale=0.0,
                                      shear=0, rng=pyrandom.Random(0))
    np.testing.assert_allclose(lab[:, 1:], labels[:, 1:], atol=1.0)


def test_affine_same_matrix_both_modalities():
    import random as pyrandom

    rng = np.random.default_rng(1)
    im = rng.integers(0, 255, size=(128, 128, 3), dtype=np.uint8)
    labels = np.array([[0, 30.0, 30.0, 90.0, 90.0]], dtype=np.float32)
    rgb, ir, _ = random_affine_pair(im.copy(), im.copy(), labels,
                                    degrees=10, translate=0.1, scale=0.5,
                                    shear=2, rng=pyrandom.Random(7))
    np.testing.assert_array_equal(rgb, ir)  # identical warp on identical input


def test_label_path_mapping():
    assert image_to_label_path("/d/images/x/1.jpg") == "/d/labels/x/1.txt"


def test_dataset_eval_batch(paired_root):
    rgb_dir, ir_dir = paired_root
    ds = PairedDetectionDataset.from_sources(rgb_dir, ir_dir, img_size=128,
                                             augment=False, nc=2)
    assert len(ds) == 8
    rgb, ir, labels, shape_info = ds.get(0)
    assert rgb.shape == (128, 128, 3) and ir.shape == (128, 128, 3)
    assert rgb.dtype == np.uint8
    assert labels.shape[1] == 5
    assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1).all()
    # IR really is a different modality
    assert float(np.mean(rgb.astype(int) - ir.astype(int))) != 0.0


def test_dataset_train_batch_and_loader(paired_root):
    rgb_dir, ir_dir = paired_root
    hyp = dict(mosaic=1.0, fliplr=0.5, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
               translate=0.1, scale=0.5)
    ds = PairedDetectionDataset.from_sources(rgb_dir, ir_dir, img_size=128,
                                             augment=True, hyp=hyp, nc=2)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, seed=0, max_labels=40)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["rgb"].shape == (4, 128, 128, 3)
    assert b["ir"].shape == (4, 128, 128, 3)
    assert b["targets"].shape == (160, 6)
    assert b["tmask"].shape == (160,)
    n_valid = int(b["tmask"].sum())
    assert n_valid > 0
    t = b["targets"][b["tmask"] > 0]
    assert (t[:, 2:] >= 0).all() and (t[:, 2:] <= 1).all()
    assert set(np.unique(t[:, 0])).issubset({0.0, 1.0, 2.0, 3.0})

    # deterministic reshuffle: same seed/epoch -> same order
    l2 = BatchLoader(ds, batch_size=4, shuffle=True, seed=0, max_labels=40,
                     prefetch=False)
    b2 = next(iter(l2))
    np.testing.assert_array_equal(b["rgb"], b2["rgb"])


def test_collate_quad(paired_root):
    """--quad collate (reference collate_fn4, datasets.py:783-817): both
    branches give the same static 2S shapes, and stitched labels land in
    the right quadrant."""
    import random as pyrandom

    from multispectral_object_detection_tpu.data.datasets import collate_quad

    rgb_dir, ir_dir = paired_root
    ds = PairedDetectionDataset.from_sources(rgb_dir, ir_dir, img_size=128,
                                             augment=False, nc=2)
    samples = [ds.get(i) for i in range(8)]
    for seed in (0, 1, 2, 3):  # hits both the stitch and upsample branches
        b = collate_quad(samples, max_labels=40, rng=pyrandom.Random(seed))
        assert b["rgb"].shape == (2, 256, 256, 3)
        assert b["ir"].shape == (2, 256, 256, 3)
        assert b["targets"].shape == (2 * 160, 6)
        assert b["tmask"].shape == (2 * 160,)
        t = b["targets"][b["tmask"] > 0]
        assert len(t) > 0
        assert (t[:, 2:] >= 0).all() and (t[:, 2:] <= 1).all()
        assert set(np.unique(t[:, 0])).issubset({0.0, 1.0})

    # force the stitch branch (random() < 0.5 upsamples; seed scan below
    # finds one that stitches both groups) and check quadrant remap
    class _Stitch:
        def random(self):
            return 0.9
    b = collate_quad(samples, max_labels=40, rng=_Stitch())
    # tile 2 of group 0 is samples[2] -> top-right quadrant: x in [.5,1],
    # y in [0,.5]
    s2 = samples[2][2]  # (n,5) cls,x,y,w,h of the top-right tile
    t0 = b["targets"][(b["tmask"] > 0) & (b["targets"][:, 0] == 0)]
    for lab in s2:
        want = np.array([(lab[1] + 1.0) * 0.5, lab[2] * 0.5,
                         lab[3] * 0.5, lab[4] * 0.5])
        d = np.abs(t0[:, 2:6] - want).sum(1)
        assert d.min() < 1e-5, (want, t0[:, 2:6])
    # stitched canvas really contains the tile pixels
    np.testing.assert_array_equal(b["rgb"][0, :128, 128:], samples[2][0])
    np.testing.assert_array_equal(b["ir"][0, 128:, :128], samples[1][1])


def test_mosaic_output_shape(paired_root):
    import random as pyrandom

    rgb_dir, ir_dir = paired_root
    ds = PairedDetectionDataset.from_sources(rgb_dir, ir_dir, img_size=128,
                                             augment=True,
                                             hyp=dict(mosaic=1.0), nc=2)
    rgb, ir, lab = mosaic4_pair(lambda j: ds._load_pair(j)[:3], [0, 1, 2, 3],
                                128, dict(translate=0.1, scale=0.5),
                                pyrandom.Random(0))
    assert rgb.shape == (128, 128, 3) and ir.shape == (128, 128, 3)
    if len(lab):
        assert (lab[:, 1:5] >= 0).all()
        assert (lab[:, 1:5] <= 128).all()


def test_label_cache_roundtrip(tmp_path, paired_root):
    rgb_dir, _ = paired_root
    files = list_images(rgb_dir)
    from multispectral_object_detection_tpu.data.datasets import load_labels_cached

    l1 = load_labels_cached(files, str(tmp_path))
    l2 = load_labels_cached(files, str(tmp_path))  # from cache
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(a, b)


def test_cache_images(paired_root):
    rgb_dir, ir_dir = paired_root
    ds = PairedDetectionDataset.from_sources(rgb_dir, ir_dir, img_size=128,
                                             augment=False, nc=2,
                                             cache_images=True)
    a = ds._load_pair(0)
    assert 0 in ds._img_cache
    b = ds._load_pair(0)
    assert a[0] is b[0]  # served from RAM
    np.testing.assert_array_equal(a[0], b[0])
