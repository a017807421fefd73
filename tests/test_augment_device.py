"""Device-side mosaic pipeline: label/image geometric consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multispectral_object_detection_tpu.ops.augment_device import (
    device_mosaic_batch)


def _tile_with_box(s, box_xywhn, val=250):
    """Square tile with one bright rectangle at the normalized box."""
    img = np.full((s, s, 3), 30, np.uint8)
    cx, cy, w, h = box_xywhn
    x1 = int((cx - w / 2) * s)
    y1 = int((cy - h / 2) * s)
    x2 = int((cx + w / 2) * s)
    y2 = int((cy + h / 2) * s)
    img[y1:y2, x1:x2] = val
    return img


def _make_batch(B, s, rng):
    tiles = np.zeros((B, 4, s, s, 3), np.uint8)
    labels = np.zeros((B, 4, 2, 5), np.float32)
    lmask = np.zeros((B, 4, 2), np.float32)
    for b in range(B):
        for t in range(4):
            box = [rng.uniform(0.3, 0.7), rng.uniform(0.3, 0.7),
                   rng.uniform(0.15, 0.3), rng.uniform(0.15, 0.3)]
            tiles[b, t] = _tile_with_box(s, box)
            labels[b, t, 0] = [0] + box
            lmask[b, t, 0] = 1.0
    return tiles, labels, lmask


def test_device_mosaic_label_image_consistency():
    s = 96
    rng = np.random.default_rng(0)
    tiles, labels, lmask = _make_batch(2, s, rng)
    rgb, ir, targets, mask = device_mosaic_batch(
        jnp.asarray(tiles), jnp.asarray(tiles), jnp.asarray(labels),
        jnp.asarray(lmask), jax.random.PRNGKey(3), img_size=s,
        scale_jit=0.3, translate=0.1, fliplr=0.0, hsv_gains=(0.0, 0.0, 0.0))
    rgb = np.asarray(rgb)
    targets = np.asarray(targets)
    mask = np.asarray(mask)

    assert rgb.shape == (2, s, s, 3)
    assert mask.sum() >= 2  # most boxes survive a mild warp

    for b in range(2):
        for t, m in zip(targets[b], mask[b]):
            if m == 0:
                continue
            cx, cy, w, h = t[1:] * s
            x1, y1 = int(cx - w / 2), int(cy - h / 2)
            x2, y2 = int(cx + w / 2), int(cy + h / 2)
            x1c, y1c = max(x1, 0), max(y1, 0)
            x2c, y2c = min(x2, s), min(y2, s)
            assert x2c > x1c and y2c > y1c
            inner = rgb[b, y1c + 2:y2c - 2, x1c + 2:x2c - 2, 0]
            if inner.size:
                # the labeled region must still be the bright object
                assert inner.mean() > 150, (b, t, inner.mean())

    # outside-union darkness check: bright pixels should be covered by boxes
    for b in range(2):
        cover = np.zeros((s, s), bool)
        for t, m in zip(targets[b], mask[b]):
            if m == 0:
                continue
            cx, cy, w, h = t[1:] * s
            x1, y1 = int(cx - w / 2) - 2, int(cy - h / 2) - 2
            x2, y2 = int(cx + w / 2) + 2, int(cy + h / 2) + 2
            cover[max(y1, 0):y2, max(x1, 0):x2] = True
        bright = rgb[b, :, :, 0] > 150
        stray = bright & ~cover
        assert stray.mean() < 0.02, stray.mean()


def test_device_mosaic_flip_consistency():
    s = 64
    rng = np.random.default_rng(1)
    tiles, labels, lmask = _make_batch(1, s, rng)
    rgb, _, targets, mask = device_mosaic_batch(
        jnp.asarray(tiles), jnp.asarray(tiles), jnp.asarray(labels),
        jnp.asarray(lmask), jax.random.PRNGKey(0), img_size=s,
        scale_jit=0.0, translate=0.0, fliplr=1.0, hsv_gains=(0.0, 0.0, 0.0))
    rgb = np.asarray(rgb)
    targets = np.asarray(targets)
    mask = np.asarray(mask)
    for t, m in zip(targets[0], mask[0]):
        if m == 0:
            continue
        cx, cy, w, h = t[1:] * s
        x1, y1 = int(cx - w / 2) + 2, int(cy - h / 2) + 2
        x2, y2 = int(cx + w / 2) - 2, int(cy + h / 2) - 2
        if x2 > x1 and y2 > y1:
            assert rgb[0, y1:y2, x1:x2, 0].mean() > 150


def test_device_mosaic_loader_batch(tmp_path):
    from multispectral_object_detection_tpu.data.datasets import (
        BatchLoader, PairedDetectionDataset)
    from multispectral_object_detection_tpu.data.synthetic import (
        make_paired_dataset)

    rgb_dir, ir_dir = make_paired_dataset(str(tmp_path), n_images=8,
                                          img_size=96, nc=2, seed=4)
    ds = PairedDetectionDataset.from_sources(rgb_dir, ir_dir, img_size=96,
                                             augment=True, nc=2)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, device_aug=True,
                         max_labels_per_tile=10, prefetch=False)
    b = next(iter(loader))
    assert b["tiles_rgb"].shape == (4, 4, 96, 96, 3)
    assert b["tile_labels"].shape == (4, 4, 10, 5)
    rgb, ir, targets, mask = device_mosaic_batch(
        jnp.asarray(b["tiles_rgb"]), jnp.asarray(b["tiles_ir"]),
        jnp.asarray(b["tile_labels"]), jnp.asarray(b["tile_lmask"]),
        jax.random.PRNGKey(1), img_size=96)
    assert rgb.shape == (4, 96, 96, 3) and rgb.dtype == jnp.uint8
    assert float(np.asarray(mask).sum()) > 0
    t = np.asarray(targets)[np.asarray(mask) > 0]
    assert (t[:, 1:] >= 0).all() and (t[:, 1:] <= 1).all()
