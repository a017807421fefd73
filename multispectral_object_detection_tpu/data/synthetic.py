"""Synthetic paired RGB/IR detection dataset generator.

No real multispectral data ships with this repo, so tests and the e2e smoke
train loop use generated scenes: colored rectangles on textured backgrounds.
The IR modality renders the same geometry with inverted intensity (objects
"hot"), so a fusion model genuinely benefits from both streams.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Tuple

import cv2
import numpy as np


def make_paired_dataset(root: str, n_images: int = 16, img_size: int = 256,
                        nc: int = 2, max_objects: int = 5, seed: int = 0
                        ) -> Tuple[str, str]:
    """Write images/labels trees; returns (rgb_dir, ir_dir).

    Layout (reference-compatible image->label path mapping):
        root/rgb/images/*.jpg  root/rgb/labels/*.txt
        root/ir/images/*.jpg   (labels come from the RGB side)
    """
    # distinct fill color per class so nc>2 classes stay separable; the
    # first two entries preserve the historic nc=2 data byte-for-byte
    palette = [(220, 60, 60), (60, 60, 220), (60, 200, 60), (230, 200, 40),
               (200, 60, 200), (40, 220, 220), (240, 140, 40), (140, 90, 40)]
    rng = np.random.default_rng(seed)
    rgb_img = Path(root) / "rgb" / "images"
    rgb_lab = Path(root) / "rgb" / "labels"
    ir_img = Path(root) / "ir" / "images"
    for d in (rgb_img, rgb_lab, ir_img):
        d.mkdir(parents=True, exist_ok=True)

    for k in range(n_images):
        h = w = img_size
        rgb = (rng.uniform(20, 60, size=(h, w, 3))).astype(np.uint8)
        ir = (rng.uniform(180, 220, size=(h, w, 3))).astype(np.uint8)
        n_obj = int(rng.integers(1, max_objects + 1))
        lines = []
        for _ in range(n_obj):
            cls = int(rng.integers(0, nc))
            bw = int(rng.integers(img_size // 8, img_size // 3))
            bh = int(rng.integers(img_size // 8, img_size // 3))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            color_rgb = palette[cls % len(palette)]
            cv2.rectangle(rgb, (x1, y1), (x1 + bw, y1 + bh), color_rgb, -1)
            cv2.rectangle(ir, (x1, y1), (x1 + bw, y1 + bh), (30, 30, 30), -1)
            cx, cy = (x1 + bw / 2) / w, (y1 + bh / 2) / h
            lines.append(f"{cls} {cx:.6f} {cy:.6f} {bw / w:.6f} {bh / h:.6f}")
        name = f"{k:06d}"
        cv2.imwrite(str(rgb_img / f"{name}.jpg"), rgb[:, :, ::-1])
        cv2.imwrite(str(ir_img / f"{name}.jpg"), ir[:, :, ::-1])
        (rgb_lab / f"{name}.txt").write_text("\n".join(lines) + "\n")

    return str(rgb_img), str(ir_img)
