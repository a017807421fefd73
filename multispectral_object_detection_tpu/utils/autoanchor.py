"""Anchor auditing and re-clustering (reference utils/autoanchor.py).

- `check_anchor_order`: lives in models/detect.py (parse-time).
- `check_anchors`: best-possible-recall audit; re-clusters when BPR < 0.98
  (autoanchor.py:23-59).
- `kmean_anchors`: k-means on wh (whitened, like scipy.cluster.vq.kmeans)
  + 1000-generation genetic refinement under the anchor_t fitness
  (autoanchor.py:103-201). Pure numpy — this is offline tooling.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def _metric(wh: np.ndarray, anchors: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-target best anchor ratio metric (autoanchor.py:27-33)."""
    r = wh[:, None] / anchors[None]
    x = np.minimum(r, 1.0 / r).min(2)   # ratio metric
    best = x.max(1)
    return x, best


def anchor_fitness(anchors: np.ndarray, wh: np.ndarray,
                   thr: float = 4.0) -> float:
    """Mean best-ratio over targets passing 1/thr (autoanchor.py:150-154)."""
    _, best = _metric(wh, anchors)
    mask = best > 1.0 / thr
    return float((best * mask).mean())


def best_possible_recall(anchors: np.ndarray, wh: np.ndarray,
                         thr: float = 4.0) -> tuple[float, float]:
    """(BPR, anchors-above-threshold per target) (autoanchor.py:29-33)."""
    x, best = _metric(wh, anchors)
    aat = float((x > 1.0 / thr).sum(1).mean())
    bpr = float((best > 1.0 / thr).mean())
    return bpr, aat


def dataset_wh(labels: Sequence[np.ndarray], img_size: int,
               shapes: Optional[np.ndarray] = None,
               augment_scale: bool = True,
               rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Collect pixel wh from normalized labels, jittered like autoanchor.py:36-38."""
    rng = rng or np.random.default_rng(0)
    whs = []
    for i, l in enumerate(labels):
        if not len(l):
            continue
        s = shapes[i] if shapes is not None else np.array([img_size, img_size])
        wh = l[:, 3:5] * s[::-1] if s.ndim else l[:, 3:5] * img_size
        if augment_scale:
            wh = wh * rng.uniform(0.9, 1.1, size=(len(wh), 1))
        whs.append(wh)
    return np.concatenate(whs, 0) if whs else np.zeros((0, 2))


def kmean_anchors(wh: np.ndarray, n: int = 9, thr: float = 4.0,
                  gen: int = 1000, seed: int = 0) -> np.ndarray:
    """k-means + genetic evolution of anchors; returns (n, 2) sorted by area."""
    rng = np.random.default_rng(seed)
    wh = wh[(wh >= 2.0).any(1)]  # filter tiny (autoanchor.py:141 uses >2px)
    assert len(wh) >= n, f"need >= {n} labels to cluster, got {len(wh)}"

    # whitened k-means (scipy semantics: unit variance per column)
    std = wh.std(0)
    x = wh / std
    centers = x[rng.choice(len(x), n, replace=False)]
    for _ in range(30):
        d = ((x[:, None] - centers[None]) ** 2).sum(-1)
        assign = d.argmin(1)
        for j in range(n):
            pts = x[assign == j]
            if len(pts):
                centers[j] = pts.mean(0)
    k = centers * std

    # genetic evolution under anchor fitness (autoanchor.py:180-199)
    f = anchor_fitness(k, wh, thr)
    sh = k.shape
    mp, sigma = 0.9, 0.1
    for _ in range(gen):
        v = np.ones(sh)
        while (v == 1).all():
            v = ((rng.random(sh) < mp) * rng.random() *
                 rng.normal(size=sh) * sigma + 1).clip(0.3, 3.0)
        kg = (k * v).clip(min=2.0)
        fg = anchor_fitness(kg, wh, thr)
        if fg > f:
            f, k = fg, kg.copy()
    return k[np.argsort(k.prod(1))]


def check_anchors(labels: Sequence[np.ndarray], anchors_px: np.ndarray,
                  img_size: int, thr: float = 4.0,
                  seed: int = 0) -> np.ndarray:
    """BPR audit; re-cluster if < 0.98 (autoanchor.py:23-59).

    Returns possibly-updated (nl, na, 2) pixel anchors.
    """
    wh = dataset_wh(labels, img_size, rng=np.random.default_rng(seed))
    if not len(wh):
        return anchors_px
    flat = anchors_px.reshape(-1, 2)
    bpr, aat = best_possible_recall(flat, wh, thr)
    logger.info(f"autoanchor: BPR {bpr:.4f}, {aat:.2f} anchors/target")
    if bpr >= 0.98:
        return anchors_px
    logger.info("autoanchor: BPR < 0.98, re-clustering...")
    try:
        new = kmean_anchors(wh, n=flat.shape[0], thr=thr, seed=seed)
    except AssertionError as e:
        logger.warning(f"autoanchor failed: {e}")
        return anchors_px
    if anchor_fitness(new, wh, thr) > anchor_fitness(flat, wh, thr):
        return new.reshape(anchors_px.shape)
    return anchors_px
