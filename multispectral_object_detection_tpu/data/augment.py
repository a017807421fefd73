"""Host-side image augmentation for the paired RGB/IR pipeline.

Fresh numpy/cv2 implementation of the reference augmentation semantics
(utils/datasets.py:1320-1968):

- `load_scaled`: decode + longest-side resize (AREA down / LINEAR up,
  datasets.py:1320-1334); the paired variant applies the RGB geometry to both.
- `letterbox`: aspect-preserving resize + gray-114 pad to a stride multiple
  (datasets.py:1698-1728).
- `mosaic4_pair`: 4-tile mosaic on a 2s canvas with identical placement for
  both modalities (datasets.py:1464-1603).
- `random_affine_pair`: composed center/rotate/scale/shear/translate matrix,
  ONE matrix applied to both modalities (datasets.py:1819-1914), with the
  reference's box-candidates filter (datasets.py:1917).
- `augment_hsv`: HSV LUT jitter, drawn independently per modality
  (datasets.py:1374-1385).

Everything operates on HWC uint8 numpy arrays and label arrays of
[cls, x1, y1, x2, y2] (pixel xyxy) unless noted.
"""

from __future__ import annotations

import math
import random
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

PAD_COLOR = (114, 114, 114)


import os as _os

_USE_NATIVE = _os.environ.get("MSOD_NATIVE", "0") == "1"


def _native_mod():
    from . import native

    return native if native.available() else None


def load_scaled(path: str, img_size: int) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Decode and resize so the longest side equals img_size.

    Returns (image RGB uint8, original (h, w)). With MSOD_NATIVE=1 the
    in-repo C++ runtime (native/image_ops.cpp) does the JPEG decode and
    AREA/LINEAR resize instead of cv2.
    """
    if _USE_NATIVE and path.lower().endswith((".jpg", ".jpeg")):
        nat = _native_mod()
        if nat is not None:
            rgb = nat.decode_jpeg(open(path, "rb").read())
            if rgb is not None:
                h0, w0 = rgb.shape[:2]
                r = img_size / max(h0, w0)
                if r != 1:
                    rgb = nat.resize(rgb, int(h0 * r), int(w0 * r))
                return rgb, (h0, w0)
    im = cv2.imread(path)  # BGR
    if im is None:
        raise FileNotFoundError(f"image not found: {path}")
    h0, w0 = im.shape[:2]
    r = img_size / max(h0, w0)
    if r != 1:
        interp = cv2.INTER_AREA if r < 1 else cv2.INTER_LINEAR
        im = cv2.resize(im, (int(w0 * r), int(h0 * r)), interpolation=interp)
    return im[:, :, ::-1], (h0, w0)  # BGR -> RGB


def load_scaled_pair(path_rgb: str, path_ir: str, img_size: int):
    """Paired decode; the IR frame is resized with the RGB ratio
    (datasets.py:1337-1370)."""
    rgb, (h0, w0) = load_scaled(path_rgb, img_size)
    ir = cv2.imread(path_ir)
    if ir is None:
        raise FileNotFoundError(f"image not found: {path_ir}")
    r = img_size / max(h0, w0)
    if r != 1:
        interp = cv2.INTER_AREA if r < 1 else cv2.INTER_LINEAR
        ir = cv2.resize(ir, (int(ir.shape[1] * r), int(ir.shape[0] * r)),
                        interpolation=interp)
    return rgb, ir[:, :, ::-1], (h0, w0)


def letterbox(im: np.ndarray, new_shape: Tuple[int, int], *, auto: bool = False,
              scale_fill: bool = False, scaleup: bool = True,
              stride: int = 32):
    """Aspect-preserving resize + centered gray pad (datasets.py:1698).

    Returns (image, (rw, rh) gain, (dw, dh) one-side pads).
    """
    shape = im.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    ratio = (r, r)
    new_unpad = (int(round(shape[1] * r)), int(round(shape[0] * r)))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0, 0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = (new_shape[1] / shape[1], new_shape[0] / shape[0])
    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    im = cv2.copyMakeBorder(im, top, bottom, left, right,
                            cv2.BORDER_CONSTANT, value=PAD_COLOR)
    return im, ratio, (dw, dh)


def augment_hsv(im: np.ndarray, hgain: float = 0.5, sgain: float = 0.5,
                vgain: float = 0.5, rng: Optional[random.Random] = None) -> np.ndarray:
    """HSV LUT jitter (datasets.py:1374). RGB in, RGB out."""
    rng = rng or random
    r = np.array([rng.uniform(-1, 1) for _ in range(3)]) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(im, cv2.COLOR_RGB2HSV))
    x = np.arange(0, 256, dtype=np.int16)
    lut_h = ((x * r[0]) % 180).astype(im.dtype)
    lut_s = np.clip(x * r[1], 0, 255).astype(im.dtype)
    lut_v = np.clip(x * r[2], 0, 255).astype(im.dtype)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s),
                        cv2.LUT(val, lut_v))).astype(im.dtype)
    return cv2.cvtColor(im_hsv, cv2.COLOR_HSV2RGB)


def _box_candidates(box1: np.ndarray, box2: np.ndarray, wh_thr: float = 2.0,
                    ar_thr: float = 20.0, area_thr: float = 0.1) -> np.ndarray:
    """Keep boxes that survived the warp (datasets.py:1917)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    return ((w2 > wh_thr) & (h2 > wh_thr)
            & (w2 * h2 / (w1 * h1 + 1e-16) > area_thr) & (ar < ar_thr))


def build_affine_matrix(width: int, height: int, *, degrees: float = 0.0,
                        translate: float = 0.1, scale: float = 0.5,
                        shear: float = 0.0, perspective: float = 0.0,
                        border: Tuple[int, int] = (0, 0),
                        rng: Optional[random.Random] = None):
    """Compose the C*P*R*S*T warp of datasets.py:1731-1817. Returns (M, s)."""
    rng = rng or random
    C = np.eye(3)
    C[0, 2] = -width / 2
    C[1, 2] = -height / 2

    P = np.eye(3)
    P[2, 0] = rng.uniform(-perspective, perspective)
    P[2, 1] = rng.uniform(-perspective, perspective)

    R = np.eye(3)
    a = rng.uniform(-degrees, degrees)
    s = rng.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(rng.uniform(-shear, shear) * math.pi / 180)

    out_w = width + border[1] * 2
    out_h = height + border[0] * 2
    T = np.eye(3)
    T[0, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * out_w
    T[1, 2] = rng.uniform(0.5 - translate, 0.5 + translate) * out_h

    M = T @ S @ R @ P @ C
    return M, s, (out_w, out_h)


def warp_labels(labels: np.ndarray, M: np.ndarray, s: float,
                out_wh: Tuple[int, int], perspective: float = 0.0,
                segments: Sequence[np.ndarray] = ()) -> np.ndarray:
    """Apply the warp to [cls, xyxy] labels + candidates filter
    (datasets.py:1875-1914).

    With per-row pixel `segments` (one (k, 2) polygon per label row), boxes
    are re-derived by warping the resampled polygon points and taking the
    inside-image extent (datasets.py:1786-1796) — tighter than warping box
    corners — with the reference's looser area_thr 0.01. Segments are used
    only when row-aligned (len == n) and non-empty; the reference silently
    zeroes trailing boxes when formats are mixed within one mosaic."""
    from ..ops.boxes import resample_segments, segment2box

    n = len(labels)
    if n == 0:
        return labels
    use_segments = len(segments) == n and any(len(sg) for sg in segments)
    if use_segments:
        new = np.zeros((n, 4), dtype=np.float32)
        for i, seg in enumerate(resample_segments(list(segments))):
            xy = np.ones((len(seg), 3))
            xy[:, :2] = seg
            xy = xy @ M.T
            xy = xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]
            new[i] = segment2box(xy, out_wh[0], out_wh[1])
    else:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = labels[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)  # corners
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new = np.stack([x.min(1), y.min(1), x.max(1), y.max(1)], axis=1)
        new[:, [0, 2]] = new[:, [0, 2]].clip(0, out_wh[0])
        new[:, [1, 3]] = new[:, [1, 3]].clip(0, out_wh[1])
    keep = _box_candidates(labels[:, 1:5].T * s, new.T,
                           area_thr=0.01 if use_segments else 0.10)
    out = labels[keep].copy()
    out[:, 1:5] = new[keep]
    return out


def random_affine_pair(im_rgb: np.ndarray, im_ir: np.ndarray,
                       labels: np.ndarray, *, degrees: float = 0.0,
                       translate: float = 0.1, scale: float = 0.5,
                       shear: float = 0.0, perspective: float = 0.0,
                       border: Tuple[int, int] = (0, 0),
                       segments: Sequence[np.ndarray] = (),
                       rng: Optional[random.Random] = None):
    """One sampled warp applied to BOTH modalities (datasets.py:1860-1869)."""
    height, width = im_rgb.shape[0], im_rgb.shape[1]
    M, s, (out_w, out_h) = build_affine_matrix(
        width, height, degrees=degrees, translate=translate, scale=scale,
        shear=shear, perspective=perspective, border=border, rng=rng)
    out_w, out_h = width + border[1] * 2, height + border[0] * 2
    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            im_rgb = cv2.warpPerspective(im_rgb, M, dsize=(out_w, out_h),
                                         borderValue=PAD_COLOR)
            im_ir = cv2.warpPerspective(im_ir, M, dsize=(out_w, out_h),
                                        borderValue=PAD_COLOR)
        else:
            im_rgb = cv2.warpAffine(im_rgb, M[:2], dsize=(out_w, out_h),
                                    borderValue=PAD_COLOR)
            im_ir = cv2.warpAffine(im_ir, M[:2], dsize=(out_w, out_h),
                                   borderValue=PAD_COLOR)
    labels = warp_labels(labels, M, s, (out_w, out_h), perspective,
                         segments=segments)
    return im_rgb, im_ir, labels


def mosaic4_pair(load_fn, indices: Sequence[int], img_size: int,
                 hyp: dict, rng: Optional[random.Random] = None):
    """Paired 4-tile mosaic (datasets.py:1464-1603).

    load_fn(i) -> (rgb, ir, labels_xywhn[, segments]) where labels are
    [cls,x,y,w,h] normalized to the loaded image and segments (optional) a
    per-row list of normalized (k, 2) polygons (datasets.py:1536-1546).
    Returns (rgb, ir, labels_xyxy) at img_size x img_size after the shared
    affine crop; segment rows are warped point-wise (see warp_labels).
    """
    from ..ops.boxes import xyn2xy

    rng = rng or random
    s = img_size
    yc = int(rng.uniform(s // 2, 2 * s - s // 2))
    xc = int(rng.uniform(s // 2, 2 * s - s // 2))
    canvas_rgb = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    canvas_ir = np.full((s * 2, s * 2, 3), 114, dtype=np.uint8)
    all_labels: List[np.ndarray] = []
    all_segments: List[np.ndarray] = []

    for i, idx in enumerate(indices):
        loaded = load_fn(idx)
        rgb, ir, labels = loaded[:3]
        segs = loaded[3] if len(loaded) > 3 else []
        h, w = rgb.shape[:2]
        if i == 0:  # top-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
        elif i == 1:  # top-right
            x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, s * 2), yc
            x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
        elif i == 2:  # bottom-left
            x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
        else:  # bottom-right
            x1a, y1a, x2a, y2a = xc, yc, min(xc + w, s * 2), min(s * 2, yc + h)
            x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
        canvas_rgb[y1a:y2a, x1a:x2a] = rgb[y1b:y2b, x1b:x2b]
        canvas_ir[y1a:y2a, x1a:x2a] = ir[y1b:y2b, x1b:x2b]
        padw, padh = x1a - x1b, y1a - y1b
        if labels.size:
            lab = labels.copy()
            # xywhn -> xyxy with tile offset
            lab_xyxy = np.empty_like(lab)
            lab_xyxy[:, 0] = lab[:, 0]
            lab_xyxy[:, 1] = w * (lab[:, 1] - lab[:, 3] / 2) + padw
            lab_xyxy[:, 2] = h * (lab[:, 2] - lab[:, 4] / 2) + padh
            lab_xyxy[:, 3] = w * (lab[:, 1] + lab[:, 3] / 2) + padw
            lab_xyxy[:, 4] = h * (lab[:, 2] + lab[:, 4] / 2) + padh
            all_labels.append(lab_xyxy)
            # normalized polygons -> canvas pixels with the same tile
            # offset (datasets.py:1441-1445)
            all_segments.extend(xyn2xy(sg, w, h, padw, padh) for sg in segs)

    labels = (np.concatenate(all_labels, 0) if all_labels
              else np.zeros((0, 5), dtype=np.float32))
    labels[:, 1:5] = labels[:, 1:5].clip(0, 2 * s)
    for sg in all_segments:
        np.clip(sg, 0, 2 * s, out=sg)  # datasets.py:1449-1452

    return random_affine_pair(
        canvas_rgb, canvas_ir, labels,
        degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
        scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
        perspective=hyp.get("perspective", 0.0),
        border=(-s // 2, -s // 2), segments=all_segments, rng=rng)


def mosaic9_pair(load_fn, indices: Sequence[int], img_size: int,
                 hyp: dict, rng: Optional[random.Random] = None):
    """Paired 9-tile mosaic (datasets.py:1607-1678, generalized to RGB+IR
    like mosaic4_pair; pass the same image twice for single-modality).

    Tiles are laid out clockwise around a center image on a 3s x 3s canvas,
    each anchored to the previous tile's extent, then a random 2s x 2s crop
    is taken and the shared affine applied.
    """
    from ..ops.boxes import xyn2xy

    rng = rng or random
    s = img_size
    canvas_rgb = canvas_ir = None
    all_labels: List[np.ndarray] = []
    all_segments: List[np.ndarray] = []
    h0 = w0 = hp = wp = 0

    for i, idx in enumerate(indices):
        loaded = load_fn(idx)
        rgb, ir, labels = loaded[:3]
        segs = loaded[3] if len(loaded) > 3 else []
        h, w = rgb.shape[:2]
        if i == 0:    # center
            canvas_rgb = np.full((s * 3, s * 3, 3), 114, dtype=np.uint8)
            canvas_ir = np.full((s * 3, s * 3, 3), 114, dtype=np.uint8)
            h0, w0 = h, w
            c = s, s, s + w, s + h
        elif i == 1:  # top
            c = s, s - h, s + w, s
        elif i == 2:  # top right
            c = s + wp, s - h, s + wp + w, s
        elif i == 3:  # right
            c = s + w0, s, s + w0 + w, s + h
        elif i == 4:  # bottom right
            c = s + w0, s + hp, s + w0 + w, s + hp + h
        elif i == 5:  # bottom
            c = s + w0 - w, s + h0, s + w0, s + h0 + h
        elif i == 6:  # bottom left
            c = s + w0 - wp - w, s + h0, s + w0 - wp, s + h0 + h
        elif i == 7:  # left
            c = s - w, s + h0 - h, s, s + h0
        else:         # top left
            c = s - w, s + h0 - hp - h, s, s + h0 - hp

        padx, pady = c[:2]
        x1, y1, x2, y2 = (max(v, 0) for v in c)
        canvas_rgb[y1:y2, x1:x2] = rgb[y1 - pady:, x1 - padx:][:y2 - y1, :x2 - x1]
        canvas_ir[y1:y2, x1:x2] = ir[y1 - pady:, x1 - padx:][:y2 - y1, :x2 - x1]
        if labels.size:
            lab = labels.copy()
            out = np.empty_like(lab)
            out[:, 0] = lab[:, 0]
            out[:, 1] = w * (lab[:, 1] - lab[:, 3] / 2) + padx
            out[:, 2] = h * (lab[:, 2] - lab[:, 4] / 2) + pady
            out[:, 3] = w * (lab[:, 1] + lab[:, 3] / 2) + padx
            out[:, 4] = h * (lab[:, 2] + lab[:, 4] / 2) + pady
            all_labels.append(out)
            all_segments.extend(xyn2xy(sg, w, h, padx, pady) for sg in segs)
        hp, wp = h, w

    yc = int(rng.uniform(0, s))
    xc = int(rng.uniform(0, s))
    canvas_rgb = canvas_rgb[yc:yc + 2 * s, xc:xc + 2 * s]
    canvas_ir = canvas_ir[yc:yc + 2 * s, xc:xc + 2 * s]
    labels = (np.concatenate(all_labels, 0) if all_labels
              else np.zeros((0, 5), dtype=np.float32))
    if labels.size:
        labels[:, [1, 3]] -= xc
        labels[:, [2, 4]] -= yc
    labels[:, 1:5] = labels[:, 1:5].clip(0, 2 * s)
    for sg in all_segments:
        sg[:, 0] -= xc  # crop offset (datasets.py:1663-1667)
        sg[:, 1] -= yc
        np.clip(sg, 0, 2 * s, out=sg)

    return random_affine_pair(
        canvas_rgb, canvas_ir, labels,
        degrees=hyp.get("degrees", 0.0), translate=hyp.get("translate", 0.1),
        scale=hyp.get("scale", 0.5), shear=hyp.get("shear", 0.0),
        perspective=hyp.get("perspective", 0.0),
        border=(-s // 2, -s // 2), segments=all_segments, rng=rng)


def hist_equalize(im: np.ndarray, clahe: bool = True) -> np.ndarray:
    """Histogram equalization of an RGB uint8 image's luma channel
    (datasets.py:1388-1396)."""
    import cv2

    yuv = cv2.cvtColor(im, cv2.COLOR_RGB2YUV)
    if clahe:
        yuv[:, :, 0] = cv2.createCLAHE(
            clipLimit=2.0, tileGridSize=(8, 8)).apply(yuv[:, :, 0])
    else:
        yuv[:, :, 0] = cv2.equalizeHist(yuv[:, :, 0])
    return cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB)


def _ioa(box: np.ndarray, boxes: np.ndarray) -> np.ndarray:
    """Intersection of `box` (4,) over each of `boxes` (N, 4)'s own area."""
    ix = (np.minimum(box[2], boxes[:, 2])
          - np.maximum(box[0], boxes[:, 0])).clip(0)
    iy = (np.minimum(box[3], boxes[:, 3])
          - np.maximum(box[1], boxes[:, 1])).clip(0)
    area = ((boxes[:, 2] - boxes[:, 0])
            * (boxes[:, 3] - boxes[:, 1]) + 1e-16)
    return ix * iy / area


def cutout(im: np.ndarray, labels: np.ndarray,
           rng: Optional[random.Random] = None) -> np.ndarray:
    """Cutout augmentation (datasets.py:1917-1968): paint random gray
    patches in-place at halving scales; drop labels >60% obscured.
    labels: (N, 5) [cls, x1, y1, x2, y2] pixels. Returns surviving labels.
    """
    rng = rng or random
    h, w = im.shape[:2]
    scales = [0.5] + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8 + [0.03125] * 16
    for s in scales:
        mh = rng.randint(1, max(int(h * s), 1))
        mw = rng.randint(1, max(int(w * s), 1))
        x1 = max(0, rng.randint(0, w) - mw // 2)
        y1 = max(0, rng.randint(0, h) - mh // 2)
        x2, y2 = min(w, x1 + mw), min(h, y1 + mh)
        im[y1:y2, x1:x2] = [rng.randint(64, 191) for _ in range(3)]
        if len(labels) and s > 0.03:
            box = np.asarray([x1, y1, x2, y2], np.float32)
            labels = labels[_ioa(box, labels[:, 1:5]) < 0.60]
    return labels


def replicate(im: np.ndarray, labels: np.ndarray,
              rng: Optional[random.Random] = None):
    """Duplicate the smaller half of the boxes at random free positions
    (datasets.py:1681-1695). labels: (N, 5) [cls, x1, y1, x2, y2] pixels.
    Mutates `im`; returns (im, labels_with_replicas)."""
    rng = rng or random
    h, w = im.shape[:2]
    boxes = labels[:, 1:5].astype(int)
    side = ((boxes[:, 2] - boxes[:, 0]) + (boxes[:, 3] - boxes[:, 1])) / 2
    for i in side.argsort()[:round(side.size * 0.5)]:
        x1b, y1b, x2b, y2b = boxes[i]
        bh, bw = y2b - y1b, x2b - x1b
        if bh <= 0 or bw <= 0 or bh >= h or bw >= w:
            continue
        yc, xc = int(rng.uniform(0, h - bh)), int(rng.uniform(0, w - bw))
        im[yc:yc + bh, xc:xc + bw] = im[y1b:y2b, x1b:x2b]
        labels = np.append(
            labels, [[labels[i, 0], xc, yc, xc + bw, yc + bh]], axis=0)
    return im, labels
