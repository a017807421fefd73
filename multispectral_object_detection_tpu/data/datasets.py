"""Datasets and batch pipeline for single-stream and paired RGB+IR detection.

Capability parity with utils/datasets.py (LoadImagesAndLabels:524,
LoadMultiModalImagesAndLabels:820, create_dataloader_rgb_ir:223), re-designed
for an XLA consumer:

- every batch has a STATIC shape: images (B, S, S, 3[+3]) uint8 and a padded
  flat target tensor (B*max_labels, 6) [img, cls, x, y, w, h] + validity
  mask — no ragged collation, no per-batch recompiles;
- paired mosaic / one-matrix affine / independent HSV / shared flip exactly
  as the reference applies them (datasets.py:1155-1281);
- labels are read from the RGB annotations only (datasets.py:1211-1216);
- label caching: a .npz sidecar keyed by a hash of file sizes
  (datasets.py:84-101, 632-685);
- a background-thread double-buffered prefetcher replaces the torch
  DataLoader worker pool (the host here has few cores; heavy lifting is
  device-side).
"""

from __future__ import annotations

import hashlib
import logging
import os
import random
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .augment import (augment_hsv, letterbox, load_scaled, load_scaled_pair,
                      mosaic4_pair, random_affine_pair)

IMG_EXTS = {".bmp", ".jpg", ".jpeg", ".png", ".tif", ".tiff", ".webp"}


def list_images(source: str) -> List[str]:
    """Expand a directory, glob, or listing file into image paths
    (datasets.py:536-556 semantics)."""
    p = Path(source)
    if p.is_dir():
        files = sorted(str(f) for f in p.rglob("*") if f.suffix.lower() in IMG_EXTS)
    elif p.is_file() and p.suffix == ".txt":
        base = p.parent
        files = []
        for line in p.read_text().splitlines():
            line = line.strip()
            if not line:
                continue
            q = Path(line)
            files.append(str(q if q.is_absolute() else base / q))
    elif p.is_file():
        files = [str(p)]
    else:
        raise FileNotFoundError(f"dataset source not found: {source}")
    if not files:
        raise FileNotFoundError(f"no images under {source}")
    return files


def image_to_label_path(img_path: str) -> str:
    """images/ -> labels/, .ext -> .txt (datasets.py:518-521)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    parts = img_path.rsplit(sa, 1)
    stem = (sb.join(parts) if len(parts) == 2 else img_path)
    return os.path.splitext(stem)[0] + ".txt"


def read_label_file(path: str, nc: Optional[int] = None,
                    with_segments: bool = False):
    """YOLO txt -> (n, 5) [cls, x, y, w, h] normalized (+ segment list).

    Box rows have exactly 5 columns. Polygon-segment rows (cls followed by
    >=4 xy pairs, i.e. >8 columns) switch the whole file to segment format:
    each row's points are reduced to a bounding box via segments2boxes,
    exactly like the reference cache scan (datasets.py:1111-1115).
    Validation mirrors datasets.py:1116-1120 incl. the duplicate-row check;
    failures raise — the corrupt-tolerant `scan_dataset` downgrades them to
    warn-and-skip. With with_segments=True returns (labels, segments) where
    segments is a per-row list of (k, 2) normalized xy arrays (empty for
    box-format files).
    """
    from ..ops.boxes import segments2boxes

    empty = np.zeros((0, 5), dtype=np.float32)
    if not os.path.isfile(path):
        return (empty, []) if with_segments else empty
    rows = [ln.split() for ln in Path(path).read_text().strip().splitlines()
            if ln.strip()]
    segments: List[np.ndarray] = []
    if not rows:
        lab = empty
    elif any(len(r) > 8 for r in rows):  # segment format (datasets.py:1112)
        classes = np.array([r[0] for r in rows], dtype=np.float32)
        segments = [np.array(r[1:], dtype=np.float32).reshape(-1, 2)
                    for r in rows]
        lab = np.concatenate(
            (classes.reshape(-1, 1), segments2boxes(segments)), 1)
    else:
        assert all(len(r) == 5 for r in rows), \
            f"labels require 5 columns each: {path}"
        lab = np.asarray(rows, dtype=np.float32)
    if len(lab):
        assert (lab >= 0).all(), f"negative label values in {path}"
        assert (lab[:, 1:] <= 1).all(), f"non-normalized coordinates in {path}"
        assert np.unique(lab, axis=0).shape[0] == lab.shape[0], \
            f"duplicate labels in {path}"
        if nc is not None:
            assert (lab[:, 0] < nc).all(), \
                f"label class exceeds nc={nc} in {path}"
    return (lab, segments) if with_segments else lab


IMG_FORMATS = {"bmp", "jpg", "jpeg", "png", "tif", "tiff", "dng", "webp",
               "mpo"}  # reference datasets.py:33
_EXIF_ORIENTATION = 274


def exif_size(im) -> Tuple[int, int]:
    """EXIF-rotation-corrected PIL (w, h) (reference datasets.py:89-101)."""
    s = im.size
    try:
        rot = dict(im._getexif().items()).get(_EXIF_ORIENTATION)
        if rot in (6, 8):  # 270 / 90 degrees
            s = (s[1], s[0])
    except Exception:
        pass
    return s


def scan_dataset(img_files: Sequence[str],
                 label_files: Optional[Sequence[str]] = None,
                 nc: Optional[int] = None, *, with_labels: bool = True,
                 prefix: str = ""):
    """Corrupt-tolerant dataset scan (reference datasets.py:1090-1131).

    Verifies every image (PIL-decodable, EXIF-corrected size >= 10 px,
    format whitelist) and parses/validates its label file, WARNING and
    SKIPPING corrupt entries instead of raising — one truncated JPEG in a
    100k-image dataset must not kill the run. Returns a dict:
        keep      (n,) bool — entries that survived
        labels    list over ALL entries of (k, 5) float32 (empty if dropped)
        segments  list over ALL entries of per-row normalized (m, 2) arrays
        shapes    (n, 2) float64 original (h, w); zeros for dropped entries
        counters  {found, missing, empty, corrupt}
    """
    from PIL import Image

    logger = logging.getLogger(__name__)
    if with_labels and label_files is None:
        label_files = [image_to_label_path(p) for p in img_files]
    n = len(img_files)
    keep = np.zeros(n, dtype=bool)
    labels: List[np.ndarray] = []
    segments: List[List[np.ndarray]] = []
    shapes = np.zeros((n, 2), dtype=np.float64)
    nf = nm = ne = ncorr = 0
    for i, im_file in enumerate(img_files):
        lab, segs = np.zeros((0, 5), dtype=np.float32), []
        try:
            with Image.open(im_file) as im:
                im.verify()  # PIL integrity check
                w, h = exif_size(im)
                fmt = (im.format or "").lower()
            assert w > 9 and h > 9, f"image size {(w, h)} <10 pixels"
            assert fmt in IMG_FORMATS, f"invalid image format {fmt}"
            if with_labels:
                if os.path.isfile(label_files[i]):
                    nf += 1
                    lab, segs = read_label_file(label_files[i], nc,
                                                with_segments=True)
                    if not len(lab):
                        ne += 1
                else:
                    nm += 1
            keep[i] = True
            shapes[i] = (h, w)
        except Exception as e:
            ncorr += 1
            lab, segs = np.zeros((0, 5), dtype=np.float32), []
            logger.warning(
                f"{prefix}ignoring corrupt image and/or label {im_file}: {e}")
        labels.append(lab)
        segments.append(segs)
    counters = {"found": nf, "missing": nm, "empty": ne, "corrupt": ncorr}
    return {"keep": keep, "labels": labels, "segments": segments,
            "shapes": shapes, "counters": counters}


def scan_pair_cached(rgb_files: Sequence[str],
                     ir_files: Optional[Sequence[str]] = None,
                     cache_dir: Optional[str] = None,
                     nc: Optional[int] = None):
    """scan_dataset over an RGB(+IR) pair list with an .npz cache.

    Labels come from the RGB annotations (datasets.py:1211-1216); IR images
    are integrity-verified too, and a pair is dropped if EITHER side is
    corrupt (the reference scans each modality's cache independently, which
    can silently desync the pairing — here alignment is preserved by
    construction). Cache key: md5 over paths + file sizes, like the label
    cache (datasets.py:84-101).
    """
    import json as _json

    logger = logging.getLogger(__name__)
    label_files = [image_to_label_path(p) for p in rgb_files]
    key = _files_hash(list(rgb_files) + label_files + list(ir_files or []))
    cache_path = None
    if cache_dir:
        cache_path = Path(cache_dir) / f"scan_{key[:16]}.npz"
        if cache_path.is_file():
            z = np.load(cache_path, allow_pickle=True)
            if str(z.get("hash")) == key:
                res = {"keep": z["keep"],
                       "labels": list(z["labels"]),
                       "segments": [list(s) for s in z["segments"]],
                       "shapes": z["shapes"],
                       "counters": _json.loads(str(z["counters"]))}
                _log_scan(res["counters"], len(rgb_files), logger,
                          cached=True)
                return res
    res = scan_dataset(rgb_files, label_files, nc)
    if ir_files is not None:
        ir_scan = scan_dataset(ir_files, with_labels=False)
        res["keep"] &= ir_scan["keep"]
        res["counters"]["corrupt"] += int(ir_scan["counters"]["corrupt"])
    _log_scan(res["counters"], len(rgb_files), logger, cached=False)
    if cache_path is not None:
        cache_path.parent.mkdir(parents=True, exist_ok=True)
        lab_arr = np.empty(len(res["labels"]), dtype=object)
        seg_arr = np.empty(len(res["segments"]), dtype=object)
        for i in range(len(res["labels"])):
            lab_arr[i] = res["labels"][i]
            seg_arr[i] = res["segments"][i]
        np.savez(cache_path, hash=key, keep=res["keep"], labels=lab_arr,
                 segments=seg_arr, shapes=res["shapes"],
                 counters=_json.dumps(res["counters"]))
    return res


def _log_scan(c: dict, total: int, logger, cached: bool):
    msg = (f"dataset scan{' (cached)' if cached else ''}: "
           f"{c['found']} found, {c['missing']} missing, {c['empty']} empty, "
           f"{c['corrupt']} corrupt of {total} images")
    (logger.warning if c["corrupt"] else logger.info)(msg)


def _files_hash(paths: Sequence[str]) -> str:
    h = hashlib.md5()
    for p in paths:
        h.update(p.encode())
        try:
            h.update(str(os.path.getsize(p)).encode())
        except OSError:
            pass
    return h.hexdigest()


def load_labels_cached(img_files: Sequence[str], cache_dir: Optional[str] = None,
                       nc: Optional[int] = None) -> List[np.ndarray]:
    """Load all label files with an .npz cache keyed by file sizes."""
    label_files = [image_to_label_path(p) for p in img_files]
    key = _files_hash(list(img_files) + label_files)
    cache_path = None
    if cache_dir:
        cache_path = Path(cache_dir) / f"labels_{key[:16]}.npz"
        if cache_path.is_file():
            z = np.load(cache_path, allow_pickle=True)
            if str(z.get("hash")) == key:
                return list(z["labels"])
    labels = [read_label_file(p, nc) for p in label_files]
    if cache_path is not None:
        cache_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez(cache_path, hash=key,
                 labels=np.asarray(labels, dtype=object))
    return labels


class PairedDetectionDataset:
    """Paired RGB+IR (or single-modality when ir_files is None) dataset.

    __getitem__-style `get(i, rng)` returns:
        rgb  (S, S, 3) uint8
        ir   (S, S, 3) uint8 or None
        labels (n, 5) [cls, x, y, w, h] normalized to the output canvas
        shape_info (h0, w0, ratio, pad) for eval coordinate rescaling
    """

    def __init__(self, rgb_files: Sequence[str],
                 ir_files: Optional[Sequence[str]] = None, *,
                 img_size: int = 640, augment: bool = False,
                 hyp: Optional[dict] = None, nc: Optional[int] = None,
                 cache_dir: Optional[str] = None, pad: float = 0.0,
                 scaleup_eval: bool = False, rect: bool = False,
                 stride: int = 32, cache_images: bool = False):
        self.rgb_files = list(rgb_files)
        self.ir_files = list(ir_files) if ir_files is not None else None
        if self.ir_files is not None:
            assert len(self.ir_files) == len(self.rgb_files), \
                "RGB/IR list length mismatch"
        self.img_size = img_size
        self.augment = augment
        self.hyp = dict(hyp or {})
        # corrupt-tolerant scan (reference datasets.py:1090-1131): verify
        # images, parse labels (+polygon segments), warn-and-skip bad pairs
        scan = scan_pair_cached(self.rgb_files, self.ir_files, cache_dir, nc)
        keep = scan["keep"]
        if not keep.all():
            kept = [i for i in range(len(self.rgb_files)) if keep[i]]
            assert kept, "dataset scan dropped every image as corrupt"
            self.rgb_files = [self.rgb_files[i] for i in kept]
            if self.ir_files is not None:
                self.ir_files = [self.ir_files[i] for i in kept]
        else:
            kept = list(range(len(self.rgb_files)))
        self.labels = [scan["labels"][i] for i in kept]
        self.segments = [scan["segments"][i] for i in kept]
        self.shapes = scan["shapes"][kept]
        self.scan_counters = scan["counters"]
        self.pad = pad
        self.scaleup_eval = scaleup_eval
        # rect training disables mosaic, not augmentation (reference:
        # `self.mosaic = self.augment and not self.rect`, datasets.py:858)
        self.rect = bool(rect)
        self.stride = stride
        # RAM cache of decoded+scaled pairs (reference --cache-images,
        # datasets.py:619-630); keyed by index, filled lazily
        self.cache_images = cache_images
        self._img_cache: Dict[int, tuple] = {}
        self.rect_order = None      # sorted index order (aspect ratio)
        self.rect_shape = None      # per-ORIGINAL-index (h, w) canvas
        if self.rect:
            self._setup_rect()

    def _setup_rect(self, batch_size: int = 32):
        """Aspect-ratio bucketing (reference datasets.py:596-617): images are
        sorted by h/w; each batch's canvas is the minimal stride-multiple
        rectangle (with `pad` slack) covering its aspect range. Shapes are
        quantized to the stride so XLA compiles only a handful of programs."""
        s = np.asarray(self.shapes, dtype=np.float64)  # scan (h, w)
        ar = s[:, 0] / s[:, 1]  # h / w
        order = np.argsort(ar)
        n = len(order)
        nb = -(-n // batch_size)
        shapes = np.ones((nb, 2))
        for b in range(nb):
            ari = ar[order[b * batch_size:(b + 1) * batch_size]]
            mini, maxi = ari.min(), ari.max()
            if maxi < 1:
                shapes[b] = [maxi, 1.0]
            elif mini > 1:
                shapes[b] = [1.0, 1.0 / mini]
        canvas = np.ceil(
            shapes * self.img_size / self.stride + self.pad).astype(int) \
            * self.stride
        self.rect_order = order
        self.rect_shape = {}
        for b in range(nb):
            for i in order[b * batch_size:(b + 1) * batch_size]:
                self.rect_shape[int(i)] = (int(canvas[b, 0]), int(canvas[b, 1]))

    def __len__(self):
        return len(self.rgb_files)

    @classmethod
    def from_sources(cls, rgb_source: str, ir_source: Optional[str] = None,
                     **kw) -> "PairedDetectionDataset":
        rgb = list_images(rgb_source)
        ir = list_images(ir_source) if ir_source else None
        if ir is not None:
            assert len(ir) == len(rgb), (
                f"paired datasets must align: {len(rgb)} RGB vs {len(ir)} IR")
        return cls(rgb, ir, **kw)

    # -- raw tile loader for mosaic ------------------------------------------
    def _load_pair(self, i: int):
        if self.cache_images and i in self._img_cache:
            rgb, ir, hw0 = self._img_cache[i]
            return rgb, ir, self.labels[i], self.segments[i], hw0
        if self.ir_files is None:
            rgb, hw0 = load_scaled(self.rgb_files[i], self.img_size)
            ir = rgb
        else:
            rgb, ir, hw0 = load_scaled_pair(self.rgb_files[i],
                                            self.ir_files[i], self.img_size)
        if self.cache_images:
            self._img_cache[i] = (rgb, ir, hw0)
        return rgb, ir, self.labels[i], self.segments[i], hw0

    # -- main sample assembly -------------------------------------------------
    def get_tile(self, i: int):
        """Minimal host work for the DEVICE-side augmentation path
        (ops/augment_device.py): decode + letterbox to a square s x s tile,
        labels renormalized to the tile canvas. No host-side randomness."""
        s = self.img_size
        rgb0, ir0, lab, _segs, _ = self._load_pair(i)
        h, w = rgb0.shape[:2]
        rgb, ratio, padwh = letterbox(rgb0, (s, s), auto=False, scaleup=True)
        ir, _, _ = letterbox(ir0, (s, s), auto=False, scaleup=True)
        out = np.zeros_like(lab)
        if len(lab):
            out[:, 0] = lab[:, 0]
            out[:, 1] = (ratio[0] * w * lab[:, 1] + padwh[0]) / s
            out[:, 2] = (ratio[1] * h * lab[:, 2] + padwh[1]) / s
            out[:, 3] = ratio[0] * w * lab[:, 3] / s
            out[:, 4] = ratio[1] * h * lab[:, 4] / s
        return np.ascontiguousarray(rgb), np.ascontiguousarray(ir), out

    def get(self, i: int, rng: Optional[random.Random] = None):
        rng = rng or random
        hyp = self.hyp
        s = self.img_size
        use_mosaic = (self.augment and not self.rect
                      and rng.random() < hyp.get("mosaic", 1.0))

        if use_mosaic:
            idxs = [i] + [rng.randint(0, len(self) - 1) for _ in range(3)]
            rgb, ir, lab_xyxy = mosaic4_pair(
                lambda j: self._load_pair(j)[:4], idxs, s, hyp, rng)
            # mixup: single-modality only, like the reference (multimodal
            # mixup is disabled at datasets.py:1179-1185)
            if (self.ir_files is None
                    and rng.random() < hyp.get("mixup", 0.0)):
                idxs2 = [rng.randint(0, len(self) - 1) for _ in range(4)]
                rgb2, _, lab2 = mosaic4_pair(
                    lambda j: self._load_pair(j)[:4], idxs2, s, hyp, rng)
                # deterministic under the per-epoch seeded rng (the global
                # np.random would break the loader's reproducibility contract)
                r = rng.betavariate(32.0, 32.0)
                rgb = (rgb.astype(np.float32) * r
                       + rgb2.astype(np.float32) * (1 - r)).astype(np.uint8)
                ir = rgb
                lab_xyxy = np.concatenate([lab_xyxy, lab2], 0)
            shape_info = ((s, s), ((1.0, 1.0), (0.0, 0.0)))
        else:
            # segments are mosaic-only, like the reference (the non-mosaic
            # random_perspective call passes none, datasets.py:739-745)
            rgb0, ir0, lab, _segs, hw0 = self._load_pair(i)
            h, w = rgb0.shape[:2]
            canvas = (self.rect_shape[int(i)] if self.rect
                      else (s, s))  # rect: per-bucket rectangle (pad 0.5)
            rgb, ratio, padwh = letterbox(
                rgb0, canvas, auto=False,
                scaleup=self.augment or self.scaleup_eval)
            ir, _, _ = letterbox(ir0, canvas, auto=False,
                                 scaleup=self.augment or self.scaleup_eval)
            lab_xyxy = lab.copy()
            if lab.size:
                lab_xyxy[:, 1] = ratio[0] * w * (lab[:, 1] - lab[:, 3] / 2) + padwh[0]
                lab_xyxy[:, 2] = ratio[1] * h * (lab[:, 2] - lab[:, 4] / 2) + padwh[1]
                lab_xyxy[:, 3] = ratio[0] * w * (lab[:, 1] + lab[:, 3] / 2) + padwh[0]
                lab_xyxy[:, 4] = ratio[1] * h * (lab[:, 2] + lab[:, 4] / 2) + padwh[1]
            if self.augment:
                rgb, ir, lab_xyxy = random_affine_pair(
                    rgb, ir, lab_xyxy,
                    degrees=hyp.get("degrees", 0.0),
                    translate=hyp.get("translate", 0.1),
                    scale=hyp.get("scale", 0.5),
                    shear=hyp.get("shear", 0.0),
                    perspective=hyp.get("perspective", 0.0), rng=rng)
            shape_info = (hw0, (ratio, padwh))

        if self.augment:
            # independent HSV per modality (datasets.py:1230-1231)
            rgb = augment_hsv(rgb, hyp.get("hsv_h", 0.015),
                              hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4), rng)
            if self.ir_files is not None:
                ir = augment_hsv(ir, hyp.get("hsv_h", 0.015),
                                 hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4), rng)

        # xyxy -> normalized xywh on the output canvas
        hh, ww = rgb.shape[:2]
        labels = np.zeros((len(lab_xyxy), 5), dtype=np.float32)
        if len(lab_xyxy):
            labels[:, 0] = lab_xyxy[:, 0]
            labels[:, 1] = ((lab_xyxy[:, 1] + lab_xyxy[:, 3]) / 2) / ww
            labels[:, 2] = ((lab_xyxy[:, 2] + lab_xyxy[:, 4]) / 2) / hh
            labels[:, 3] = (lab_xyxy[:, 3] - lab_xyxy[:, 1]) / ww
            labels[:, 4] = (lab_xyxy[:, 4] - lab_xyxy[:, 2]) / hh

        if self.augment:
            # shared flips (datasets.py:1250-1264)
            if rng.random() < hyp.get("flipud", 0.0):
                rgb = np.flipud(rgb)
                ir = np.flipud(ir)
                if len(labels):
                    labels[:, 2] = 1.0 - labels[:, 2]
            if rng.random() < hyp.get("fliplr", 0.5):
                rgb = np.fliplr(rgb)
                ir = np.fliplr(ir)
                if len(labels):
                    labels[:, 1] = 1.0 - labels[:, 1]

        rgb = np.ascontiguousarray(rgb)
        ir = np.ascontiguousarray(ir) if self.ir_files is not None else None
        return rgb, ir, labels, shape_info


def collate_batch(samples, max_labels: int = 120):
    """Stack samples into static-shape arrays.

    Returns dict with:
        rgb (B,S,S,3) uint8 | ir (B,S,S,3) uint8 or absent
        targets (B*max_labels, 6) [img, cls, x, y, w, h]
        tmask (B*max_labels,) float32
        shapes: python list of shape_info (host-side, for eval rescale)
    """
    rgbs, irs, tlist, shapes = [], [], [], []
    for bi, (rgb, ir, labels, shape_info) in enumerate(samples):
        rgbs.append(rgb)
        if ir is not None:
            irs.append(ir)
        t = np.zeros((max_labels, 6), dtype=np.float32)
        n = min(len(labels), max_labels)
        if n:
            t[:n, 0] = bi
            t[:n, 1:] = labels[:n]
        m = np.zeros((max_labels,), dtype=np.float32)
        m[:n] = 1.0
        tlist.append((t, m))
        shapes.append(shape_info)
    out = {
        "rgb": np.stack(rgbs),
        "targets": np.concatenate([t for t, _ in tlist], 0),
        "tmask": np.concatenate([m for _, m in tlist], 0),
        "shapes": shapes,
    }
    if irs:
        out["ir"] = np.stack(irs)
    return out


def collate_quad(samples, max_labels: int = 120, rng: random.Random = None):
    """Working equivalent of the reference --quad collate_fn4
    (datasets.py:783-817, train.py:945): each group of 4 samples becomes
    ONE training image on a 2S canvas — the 4 tiles stitched 2x2, or
    (p=0.5 per group) the first tile bilinearly upsampled 2x. Both
    branches give the same static output shapes, (B/4, 2S, 2S, 3) images
    and (B/4 * 4*max_labels, 6) padded targets, so XLA compiles once.
    The caller scales the loss x4 (train.py:317: `if opt.quad: loss *= 4`
    — our loss, like the reference's, multiplies by the canvas batch,
    which under quad is 4x smaller). Upstream this collate crashes on a
    leftover debug print (`img.shape` on a tuple, datasets.py:788);
    rebuilt rather than transliterated.

    Tile layout matches the reference exactly: sample i top-left, i+1
    bottom-left (label y+1), i+2 top-right (x+1), i+3 bottom-right
    (x+1, y+1), all coords then halved.
    """
    assert len(samples) % 4 == 0, "--quad needs batch divisible by 4"
    from .native import resize as _resize

    rng = rng or random.Random(0)
    s = samples[0][0].shape[0]
    two = samples[0][1] is not None
    ml4 = 4 * max_labels
    rgbs, irs, tlist, shapes = [], [], [], []
    offs = ((0.0, 0.0), (0.0, 1.0), (1.0, 0.0), (1.0, 1.0))  # (x_off, y_off)
    for g in range(len(samples) // 4):
        group = samples[g * 4:(g + 1) * 4]
        labs = []
        if rng.random() < 0.5:
            rgb = _resize(group[0][0], 2 * s, 2 * s)
            ir = _resize(group[0][1], 2 * s, 2 * s) if two else None
            l0 = group[0][2]
            if len(l0):
                labs.append(l0)  # normalized xywh is scale-invariant
        else:
            rgb = np.zeros((2 * s, 2 * s, 3), np.uint8)
            ir = np.zeros((2 * s, 2 * s, 3), np.uint8) if two else None
            for (xo, yo), (r, q, lab, _si) in zip(offs, group):
                y0, x0 = int(yo * s), int(xo * s)
                rgb[y0:y0 + s, x0:x0 + s] = r
                if two:
                    ir[y0:y0 + s, x0:x0 + s] = q
                if len(lab):
                    l = lab.copy()
                    l[:, 1] = (l[:, 1] + xo) * 0.5
                    l[:, 2] = (l[:, 2] + yo) * 0.5
                    l[:, 3:5] *= 0.5
                    labs.append(l)
        labels = np.concatenate(labs, 0) if labs else np.zeros((0, 5),
                                                               np.float32)
        t = np.zeros((ml4, 6), dtype=np.float32)
        m = np.zeros((ml4,), dtype=np.float32)
        n = min(len(labels), ml4)
        if n:
            t[:n, 0] = g
            t[:n, 1:] = labels[:n]
            m[:n] = 1.0
        rgbs.append(rgb)
        if two:
            irs.append(ir)
        tlist.append((t, m))
        shapes.append(group[0][3])  # train-only path; eval never quads
    out = {
        "rgb": np.stack(rgbs),
        "targets": np.concatenate([t for t, _ in tlist], 0),
        "tmask": np.concatenate([m for _, m in tlist], 0),
        "shapes": shapes,
    }
    if irs:
        out["ir"] = np.stack(irs)
    return out


def collate_tiles(ds: PairedDetectionDataset, batch_idx, rng: random.Random,
                  max_labels_per_tile: int = 40):
    """Assemble a device-augmentation batch: 4 letterboxed tiles per sample
    (the anchor image + 3 random partners, like load_mosaic_RGB_IR)."""
    B = len(batch_idx)
    s = ds.img_size
    M = max_labels_per_tile
    rgb = np.zeros((B, 4, s, s, 3), np.uint8)
    ir = np.zeros((B, 4, s, s, 3), np.uint8)
    labels = np.zeros((B, 4, M, 5), np.float32)
    lmask = np.zeros((B, 4, M), np.float32)
    for bi, i in enumerate(batch_idx):
        idxs = [int(i)] + [rng.randint(0, len(ds) - 1) for _ in range(3)]
        for ti, j in enumerate(idxs):
            r, q, lab = ds.get_tile(j)
            rgb[bi, ti] = r
            ir[bi, ti] = q
            n = min(len(lab), M)
            labels[bi, ti, :n] = lab[:n]
            lmask[bi, ti, :n] = 1.0
    return {"tiles_rgb": rgb, "tiles_ir": ir, "tile_labels": labels,
            "tile_lmask": lmask}


class BatchLoader:
    """Epoch iterator with deterministic shuffling + background prefetch.

    Replaces create_dataloader_rgb_ir (datasets.py:223) / InfiniteDataLoader:
    single-threaded assembly with a 2-deep pipeline thread (this host is
    CPU-poor; the device does the heavy math). With device_aug=True the
    loader emits 4-tile batches for ops/augment_device.device_mosaic_batch
    instead of host-augmented samples.
    """

    def __init__(self, dataset: PairedDetectionDataset, batch_size: int, *,
                 shuffle: bool = False, seed: int = 0, max_labels: int = 120,
                 drop_last: bool = True, prefetch: bool = True,
                 image_weights: bool = False, class_weights=None,
                 device_aug: bool = False, max_labels_per_tile: int = 40,
                 quad: bool = False):
        self.ds = dataset
        self.bs = batch_size
        self.device_aug = device_aug
        self.quad = quad
        if quad:
            assert batch_size % 4 == 0, "--quad needs batch divisible by 4"
            assert not device_aug, "--quad and --device-aug are exclusive"
        self.max_labels_per_tile = max_labels_per_tile
        if getattr(dataset, "rect", False):
            dataset._setup_rect(batch_size)  # align buckets with batch size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = 0
        self.max_labels = max_labels
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.image_weights = image_weights
        self.class_weights = class_weights

    def __len__(self):
        n = len(self.ds)
        return n // self.bs if self.drop_last else -(-n // self.bs)

    def _indices(self):
        rng = np.random.default_rng(self.seed + self.epoch)
        if getattr(self.ds, "rect", False):
            if (self.ds.rect_order is None
                    or len(self.ds.rect_shape) != len(self.ds)):
                self.ds._setup_rect(self.bs)
            return np.asarray(self.ds.rect_order)
        if self.image_weights:
            # class-frequency-weighted resampling (train.py:690-699)
            from ..utils.general import (labels_to_class_weights,
                                         labels_to_image_weights)

            nc = int(max((l[:, 0].max() for l in self.ds.labels if len(l)),
                         default=0)) + 1
            cw = (self.class_weights if self.class_weights is not None
                  else labels_to_class_weights(self.ds.labels, nc))
            iw = labels_to_image_weights(self.ds.labels, nc, cw)
            p = iw / iw.sum() if iw.sum() > 0 else None
            return rng.choice(len(self.ds), size=len(self.ds), p=p)
        idx = np.arange(len(self.ds))
        if self.shuffle:
            rng.shuffle(idx)
        return idx

    def _assemble(self, batch_idx, rng):
        if self.device_aug:
            return collate_tiles(self.ds, batch_idx, rng,
                                 self.max_labels_per_tile)
        samples = [self.ds.get(int(i), rng) for i in batch_idx]
        if self.quad:
            return collate_quad(samples, self.max_labels, rng)
        return collate_batch(samples, self.max_labels)

    def __iter__(self):
        idx = self._indices()
        rng = random.Random(self.seed * 1000003 + self.epoch)
        nb = len(self)
        batches = [idx[k * self.bs:(k + 1) * self.bs] for k in range(nb)]
        if not self.prefetch:
            for b in batches:
                yield self._assemble(b, rng)
        else:
            import queue
            import threading

            q: "queue.Queue" = queue.Queue(maxsize=2)

            def worker():
                for b in batches:
                    q.put(self._assemble(b, rng))
                q.put(None)

            t = threading.Thread(target=worker, daemon=True)
            t.start()
            while True:
                item = q.get()
                if item is None:
                    break
                yield item
        self.epoch += 1
