#!/usr/bin/env python
"""Dataset utilities (reference utils/datasets.py:1971-2042):
autosplit, extract_boxes, flatten_recursive.

Usage:
    python tools/dataset_tools.py autosplit  --path DIR [--weights 0.9 0.1 0.0]
    python tools/dataset_tools.py extract-boxes --path DIR
    python tools/dataset_tools.py flatten   --path DIR
"""

from __future__ import annotations

import argparse
import random
import shutil
from pathlib import Path

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


def autosplit(path: str, weights=(0.9, 0.1, 0.0), seed: int = 0):
    """Write autosplit_{train,val,test}.txt listing files by random split."""
    p = Path(path)
    files = sorted(f for f in p.rglob("*") if f.suffix.lower() in IMG_EXTS)
    rng = random.Random(seed)
    names = ["autosplit_train.txt", "autosplit_val.txt", "autosplit_test.txt"]
    for n in names:
        (p.parent / n).unlink(missing_ok=True)
    for f in files:
        r = rng.random()
        i = 0 if r < weights[0] else (1 if r < weights[0] + weights[1] else 2)
        with open(p.parent / names[i], "a") as fh:
            fh.write(str(f) + "\n")
    print(f"split {len(files)} images -> {names}")


def extract_boxes(path: str):
    """Crop labeled boxes into a classification dataset layout."""
    import cv2
    import numpy as np

    from multispectral_object_detection_tpu.data.datasets import (
        image_to_label_path, read_label_file)

    p = Path(path)
    out = p.parent / "classifier"
    n = 0
    for f in sorted(p.rglob("*")):
        if f.suffix.lower() not in IMG_EXTS:
            continue
        lab = read_label_file(image_to_label_path(str(f)))
        if not len(lab):
            continue
        im = cv2.imread(str(f))
        h, w = im.shape[:2]
        for j, row in enumerate(lab):
            c = int(row[0])
            b = row[1:] * [w, h, w, h]
            x1 = int(max(b[0] - b[2] / 2, 0))
            y1 = int(max(b[1] - b[3] / 2, 0))
            x2 = int(min(b[0] + b[2] / 2, w))
            y2 = int(min(b[1] + b[3] / 2, h))
            d = out / str(c)
            d.mkdir(parents=True, exist_ok=True)
            cv2.imwrite(str(d / f"{f.stem}_{j}.jpg"), im[y1:y2, x1:x2])
            n += 1
    print(f"extracted {n} crops -> {out}")


def flatten_recursive(path: str):
    """Copy every file in a tree into a single flat directory."""
    p = Path(path)
    out = Path(str(p) + "_flat")
    out.mkdir(exist_ok=True)
    n = 0
    for f in p.rglob("*"):
        if f.is_file():
            shutil.copy(f, out / f.name)
            n += 1
    print(f"flattened {n} files -> {out}")


def main():
    ap = argparse.ArgumentParser("dataset_tools")
    ap.add_argument("cmd", choices=["autosplit", "extract-boxes", "flatten"])
    ap.add_argument("--path", required=True)
    ap.add_argument("--weights", type=float, nargs=3, default=(0.9, 0.1, 0.0))
    args = ap.parse_args()
    if args.cmd == "autosplit":
        autosplit(args.path, tuple(args.weights))
    elif args.cmd == "extract-boxes":
        extract_boxes(args.path)
    else:
        flatten_recursive(args.path)


if __name__ == "__main__":
    main()
