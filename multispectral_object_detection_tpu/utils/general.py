"""Run management and misc utilities (reference utils/general.py surface)."""

from __future__ import annotations

import glob
import logging
import os
import random
import re
from pathlib import Path

import numpy as np


def set_logging(rank: int = 0, verbose: bool = True):
    logging.basicConfig(
        format="%(message)s",
        level=logging.INFO if (verbose and rank in (-1, 0)) else logging.WARNING)


def init_seeds(seed: int = 0):
    """Seed python/numpy; JAX keys are threaded explicitly (general.py:41)."""
    random.seed(seed)
    np.random.seed(seed)


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent last.ckpt for --resume (general.py:48)."""
    paths = glob.glob(f"{search_dir}/**/last.ckpt*", recursive=True) + \
        glob.glob(f"{search_dir}/**/last", recursive=True)
    return max(paths, key=os.path.getctime) if paths else ""

def enable_compilation_cache(cache_dir: str = ""):
    """Persistent XLA compilation cache across processes.

    Over the axon tunnel the flagship train-step compile costs minutes of
    wall per process start (remote compile); caching the serialized
    executable on disk makes restarts/resumes/bench re-runs near-instant.
    Safe everywhere: if the backend doesn't support executable
    serialization JAX logs a warning and compiles uncached. Opt out with
    MT_NO_COMPILATION_CACHE=1.
    """
    if os.environ.get("MT_NO_COMPILATION_CACHE"):
        return
    try:
        import jax
        path = cache_dir or os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.expanduser("~/.cache/mt_jax_cache"))
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache anything non-trivial; the tunnel makes even mid-size
        # compiles expensive
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        # bound the cache: serialized flagship executables are large and the
        # 1-core VM's disk is shared with checkpoints; LRU-evict past 4 GiB
        jax.config.update("jax_compilation_cache_max_size", 4 * 2 ** 30)
    except Exception as e:  # pragma: no cover - version-dependent knobs
        # WARNING via the module logger: bench/CLIs call this before any
        # logging config, and a silently-disabled cache costs minutes per
        # process start over the tunnel — make the failure visible
        logging.getLogger(__name__).warning(
            f"persistent compilation cache unavailable: {e}")


def apply_device_arg(device: str):
    """Reference `--device` compat (torch_utils.select_device, train.py:934):
    'cpu' forces the CPU platform; a CUDA-style index ('0', '0,1') is a
    no-op here — on TPU, device placement is owned by the single-program
    mesh (parallel/mesh.py), not a per-process visible-devices mask."""
    if not device:
        return
    if str(device).lower() == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        logging.info(f"--device {device}: ignored on TPU "
                     "(the sharding mesh owns device placement)")


def check_img_size(img_size: int, stride: int = 32) -> int:
    """Round image size up to a stride multiple (general.py:130)."""
    new = int(np.ceil(img_size / stride) * stride)
    if new != img_size:
        logging.warning(
            f"--img-size {img_size} must be a multiple of {stride}; using {new}")
    return new


def increment_path(path, exist_ok: bool = False, sep: str = "") -> Path:
    """runs/train/exp -> exp{2,3,...} (general.py:641)."""
    path = Path(path)
    if path.exists() and exist_ok:
        return path
    if not path.exists():
        return path
    dirs = glob.glob(f"{path}{sep}*")
    matches = [re.search(rf"%s{sep}(\d+)" % re.escape(path.stem), d) for d in dirs]
    idx = [int(m.groups()[0]) for m in matches if m]
    n = max(idx) + 1 if idx else 2
    return Path(f"{path}{sep}{n}")


def colorstr(*inputs):
    """ANSI-colored string (general.py:225)."""
    *args, string = inputs if len(inputs) > 1 else ("blue", "bold", inputs[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
        "yellow": "\033[33m", "blue": "\033[34m", "magenta": "\033[35m",
        "cyan": "\033[36m", "white": "\033[37m", "bright_red": "\033[91m",
        "bright_green": "\033[92m", "bright_yellow": "\033[93m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def labels_to_class_weights(labels, nc: int) -> np.ndarray:
    """Inverse-frequency class weights (general.py:250)."""
    if not len(labels):
        return np.ones(nc)
    cls = np.concatenate([l[:, 0] for l in labels if len(l)], 0).astype(int) \
        if any(len(l) for l in labels) else np.zeros(0, int)
    weights = np.bincount(cls, minlength=nc).astype(float)
    weights[weights == 0] = 1.0
    weights = 1.0 / weights
    return weights / weights.sum()


def labels_to_image_weights(labels, nc: int, class_weights=None) -> np.ndarray:
    """Per-image sampling weights from class weights (general.py:269)."""
    cw = class_weights if class_weights is not None else np.ones(nc)
    counts = np.array([np.bincount(l[:, 0].astype(int), minlength=nc)
                       if len(l) else np.zeros(nc) for l in labels])
    return (counts * cw.reshape(1, nc)).sum(1)


def coco80_to_coco91_class():
    """80-index -> 91-index COCO category map (general.py:277)."""
    return [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20,
            21, 22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40,
            41, 42, 43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
            59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79,
            80, 81, 82, 84, 85, 86, 87, 88, 89, 90]


def save_one_box(xyxy, im, file="image.jpg", gain: float = 1.02,
                 pad: int = 10, square: bool = False, bgr: bool = False,
                 save: bool = True) -> np.ndarray:
    """Crop a detection from `im` (HWC RGB) with the reference's margin rule
    (general.py:628-640): box wh * gain + pad px, optional square. Returns
    the crop; writes a .jpg when `save`.
    """
    import cv2

    x1, y1, x2, y2 = [float(v) for v in xyxy]
    cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
    w, h = x2 - x1, y2 - y1
    if square:
        w = h = max(w, h)
    w, h = w * gain + pad, h * gain + pad
    x1, x2 = int(cx - w / 2), int(cx + w / 2)
    y1, y2 = int(cy - h / 2), int(cy + h / 2)
    x1, x2 = max(x1, 0), min(x2, im.shape[1])
    y1, y2 = max(y1, 0), min(y2, im.shape[0])
    crop = im[y1:y2, x1:x2]
    if save and crop.size:
        p = Path(file).with_suffix(".jpg")
        p.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(p), crop if bgr else crop[..., ::-1])
    return crop


def apply_classifier(boxes, classes, im0, classify_fn, size: int = 224):
    """Second-stage classifier filter (general.py:593-626).

    boxes: (N, 4) xyxy in `im0` (HWC RGB) native space; classes: (N,) int.
    classify_fn: callable (N, size, size, 3) float32 RGB in [0,1] -> (N,)
    predicted class ids (argmax already taken) or (N, nc) logits.
    Returns a bool keep-mask: detections whose classifier prediction agrees
    with the detected class, after the reference's square 1.3x + 30 px
    cutout rule.
    """
    import cv2

    n = len(boxes)
    if n == 0:
        return np.zeros((0,), dtype=bool)
    ims = np.zeros((n, size, size, 3), np.float32)
    for j, b in enumerate(np.asarray(boxes, np.float32)):
        cx, cy = (b[0] + b[2]) / 2, (b[1] + b[3]) / 2
        s = max(b[2] - b[0], b[3] - b[1]) * 1.3 + 30  # square + pad
        x1 = int(max(cx - s / 2, 0)); y1 = int(max(cy - s / 2, 0))
        x2 = int(min(cx + s / 2, im0.shape[1]))
        y2 = int(min(cy + s / 2, im0.shape[0]))
        cut = im0[y1:y2, x1:x2]
        if cut.size:
            ims[j] = cv2.resize(cut, (size, size)).astype(np.float32) / 255.0
    pred = np.asarray(classify_fn(ims))
    if pred.ndim == 2:
        pred = pred.argmax(axis=1)
    return pred.astype(int) == np.asarray(classes).astype(int)


def check_file(file: str) -> str:
    """Return `file` if it exists, else search for it recursively
    (general.py:152-161)."""
    if file == "" or Path(file).is_file():
        return file
    files = glob.glob("./**/" + str(file), recursive=True)
    assert len(files), f"File Not Found: {file}"
    assert len(files) == 1, \
        f"Multiple files match '{file}', specify exact path: {files}"
    return files[0]


def check_dataset(data: dict, autodownload: bool = True):
    """Verify the dataset's val paths exist; attempt the YAML's `download`
    recipe if not (general.py:163-183). Handles both the single-stream
    (`val`) and two-stream (`val_rgb`/`val_ir`) key planes.

    NOTE: in a zero-egress environment downloads will fail — the error
    surface (which paths are missing, what the recipe was) is the point.
    """
    import subprocess

    vals = []
    for key in ("val", "val_rgb", "val_ir"):
        v = data.get(key)
        if v:
            vals += v if isinstance(v, list) else [v]
    if not vals:
        return
    missing = [str(Path(x).resolve()) for x in vals
               if not Path(x).exists()]
    if not missing:
        return
    logging.warning(f"Dataset not found, nonexistent paths: {missing}")
    s = data.get("download")
    if not (s and autodownload):
        raise FileNotFoundError(f"Dataset not found: {missing}")
    if str(s).startswith("http") and str(s).endswith(".zip"):
        import urllib.request

        f = Path(str(s)).name
        logging.info(f"Downloading {s} ...")
        urllib.request.urlretrieve(str(s), f)
        r = subprocess.run(["unzip", "-q", f, "-d", ".."]).returncode
        Path(f).unlink(missing_ok=True)
    elif str(s).startswith("bash "):
        logging.info(f"Running {s} ...")
        r = subprocess.run(str(s), shell=True).returncode
    else:
        exec(str(s))
        r = 0
    if r != 0:
        raise RuntimeError(f"dataset autodownload failed (rc={r})")
    still = [x for x in missing if not Path(x).exists()]
    if still:
        raise FileNotFoundError(f"Dataset still missing after download: "
                                f"{still}")


def check_requirements(requirements=("jax", "flax", "optax", "numpy",
                                     "yaml", "cv2"), exclude=()):
    """Verify importability of the runtime deps (general.py:101-127).

    The reference auto-pip-installs missing packages; this environment is
    zero-egress, so missing deps are reported, never installed.
    """
    import importlib

    missing = []
    for r in requirements:
        if r in exclude:
            continue
        try:
            importlib.import_module(r)
        except ImportError:
            missing.append(r)
    if missing:
        logging.warning(f"check_requirements: missing packages {missing} "
                        f"(no auto-install in this environment)")
    return missing


def check_git_status(repo_dir: str = "."):
    """Warn if the local git checkout is behind its remote
    (general.py:79-98). Network-free degradation: reports local status
    only when the remote is unreachable."""
    import subprocess

    try:
        out = subprocess.run(["git", "-C", str(repo_dir), "status",
                              "--porcelain", "-b"], capture_output=True,
                             text=True, timeout=10)
        head = out.stdout.splitlines()[0] if out.stdout else ""
        if "behind" in head:
            logging.warning(f"check_git_status: {head} — "
                            f"`git pull` to update")
        return head
    except Exception as e:  # no git / not a repo
        logging.info(f"check_git_status skipped: {e}")
        return ""
