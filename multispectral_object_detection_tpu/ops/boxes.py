"""Box geometry kernels: pure jnp, shape-polymorphic over leading axes.

Capability parity with the reference box math (utils/general.py:289-452),
re-designed for XLA: every function is vectorized over arbitrary leading
batch axes, operates on a trailing axis of size 4, allocates nothing
data-dependent, and is differentiable where the reference's is.

Layout conventions
------------------
- ``xyxy``: [x1, y1, x2, y2] corners.
- ``xywh``: [cx, cy, w, h] centers + sizes (pixel or grid units).
- ``xywhn``: normalized ``xywh`` in [0, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-7


# ---------------------------------------------------------------------------
# Format conversions (reference: utils/general.py:289-316)
# ---------------------------------------------------------------------------


def xyxy_to_xywh(b):
    """[..., 4] corners -> centers+sizes."""
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1)


def xywh_to_xyxy(b):
    """[..., 4] centers+sizes -> corners."""
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    hw, hh = w * 0.5, h * 0.5
    return jnp.stack([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xywhn_to_xyxy(b, w: float, h: float, padw: float = 0.0, padh: float = 0.0):
    """Normalized centers+sizes -> pixel corners on a (h, w) canvas with offset."""
    scale = jnp.asarray([w, h, w, h], dtype=jnp.result_type(b, jnp.float32))
    pad = jnp.asarray([padw, padh, padw, padh], dtype=scale.dtype)
    return xywh_to_xyxy(b) * scale + pad


def xyxy_to_xywhn(b, w: float, h: float):
    """Pixel corners -> normalized centers+sizes."""
    inv = jnp.asarray([1.0 / w, 1.0 / h, 1.0 / w, 1.0 / h],
                      dtype=jnp.result_type(b, jnp.float32))
    return xyxy_to_xywh(b) * inv


def clip_xyxy(b, height: float, width: float):
    """Clamp corners into a (height, width) image (utils/general.py:369)."""
    lim = jnp.asarray([width, height, width, height],
                      dtype=jnp.result_type(b, jnp.float32))
    return jnp.clip(b, 0.0, lim)


def rescale_coords(coords, src_hw, dst_hw, ratio_pad=None):
    """Map xyxy coords from a letterboxed ``src_hw`` canvas back to ``dst_hw``.

    Mirrors utils/general.py:353 ``scale_coords``: undo the centered pad,
    divide by the letterbox gain, clip to the destination image.
    """
    if ratio_pad is None:
        gain = min(src_hw[0] / dst_hw[0], src_hw[1] / dst_hw[1])
        padw = (src_hw[1] - dst_hw[1] * gain) / 2
        padh = (src_hw[0] - dst_hw[0] * gain) / 2
    else:
        gain = ratio_pad[0][0]
        padw, padh = ratio_pad[1]
    pad = jnp.asarray([padw, padh, padw, padh],
                      dtype=jnp.result_type(coords, jnp.float32))
    out = (coords - pad) / gain
    return clip_xyxy(out, dst_hw[0], dst_hw[1])


# ---------------------------------------------------------------------------
# IoU family (reference: utils/general.py:377-452)
# ---------------------------------------------------------------------------


def _corners(b, is_xyxy: bool):
    if is_xyxy:
        return b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5


def iou(b1, b2, xyxy: bool = True, kind: str = "iou", eps: float = _EPS):
    """Elementwise IoU / GIoU / DIoU / CIoU between equally-shaped box arrays.

    Matches the exact formulation of utils/general.py:377 ``bbox_iou``
    (including the ``+eps`` placement on heights/union and the CIoU
    ``alpha = v / (v - iou + 1 + eps)`` with a stopped gradient).
    """
    ax1, ay1, ax2, ay2 = _corners(b1, xyxy)
    bx1, by1, bx2, by2 = _corners(b2, xyxy)

    iw = jnp.clip(jnp.minimum(ax2, bx2) - jnp.maximum(ax1, bx1), 0.0)
    ih = jnp.clip(jnp.minimum(ay2, by2) - jnp.maximum(ay1, by1), 0.0)
    inter = iw * ih

    w1, h1 = ax2 - ax1, ay2 - ay1 + eps
    w2, h2 = bx2 - bx1, by2 - by1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    i = inter / union
    if kind == "iou":
        return i

    cw = jnp.maximum(ax2, bx2) - jnp.minimum(ax1, bx1)
    ch = jnp.maximum(ay2, by2) - jnp.minimum(ay1, by1)
    if kind == "giou":
        c_area = cw * ch + eps
        return i - (c_area - union) / c_area

    c2 = cw * cw + ch * ch + eps
    rho2 = ((bx1 + bx2 - ax1 - ax2) ** 2 + (by1 + by2 - ay1 - ay2) ** 2) * 0.25
    if kind == "diou":
        return i - rho2 / c2
    if kind == "ciou":
        v = (4.0 / np.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - i + (1.0 + eps)))
        return i - (rho2 / c2 + v * alpha)
    raise ValueError(f"unknown IoU kind: {kind}")


def pairwise_iou(a, b, eps: float = _EPS):
    """Plain IoU matrix between xyxy sets: a [..., N, 4], b [..., M, 4] -> [..., N, M].

    Mirrors utils/general.py:422 ``box_iou``.
    """
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    inter = jnp.prod(jnp.clip(rb - lt, 0.0), axis=-1)
    area_a = jnp.prod(a[..., 2:] - a[..., :2], axis=-1)
    area_b = jnp.prod(b[..., 2:] - b[..., :2], axis=-1)
    return inter / (area_a[..., :, None] + area_b[..., None, :] - inter + eps)


def pairwise_wh_iou(wh1, wh2):
    """IoU of width/height pairs as if corner-anchored (utils/general.py:447)."""
    inter = jnp.prod(jnp.minimum(wh1[..., :, None, :], wh2[..., None, :, :]), axis=-1)
    a1 = jnp.prod(wh1, axis=-1)[..., :, None]
    a2 = jnp.prod(wh2, axis=-1)[..., None, :]
    return inter / (a1 + a2 - inter)


# ---------------------------------------------------------------------------
# Polygon-segment labels (reference: utils/general.py:318-354)
#
# Host-side numpy: segments exist only in the data pipeline (label parsing
# and mosaic warp, utils/datasets.py:1111-1115, 1441-1445, 1786-1796); the
# device never sees them — they are reduced to boxes before collation.
# ---------------------------------------------------------------------------


def xyn2xy(seg: np.ndarray, w: float, h: float,
           padw: float = 0.0, padh: float = 0.0) -> np.ndarray:
    """Normalized segment points (n, 2) -> pixel points (general.py:318-325)."""
    out = np.copy(seg).astype(np.float32)
    out[:, 0] = w * seg[:, 0] + padw
    out[:, 1] = h * seg[:, 1] + padh
    return out


def segment2box(seg: np.ndarray, width: float = 640,
                height: float = 640) -> np.ndarray:
    """One pixel segment (n, 2) -> one xyxy box over the points inside the
    image; all-outside segments give a zero box (general.py:327-332)."""
    x, y = seg.T
    inside = (x >= 0) & (y >= 0) & (x <= width) & (y <= height)
    x, y = x[inside], y[inside]
    if not x.size:
        return np.zeros(4, dtype=np.float32)
    return np.array([x.min(), y.min(), x.max(), y.max()], dtype=np.float32)


def segments2boxes(segments) -> np.ndarray:
    """Segment list [(n_i, 2) xy] -> (N, 4) xywh boxes (general.py:335-343).
    Used at label-parse time to reduce polygon rows to box targets."""
    if not len(segments):
        return np.zeros((0, 4), dtype=np.float32)
    boxes = np.array([[s[:, 0].min(), s[:, 1].min(),
                       s[:, 0].max(), s[:, 1].max()] for s in segments],
                     dtype=np.float32)
    return np.asarray(xyxy_to_xywh(boxes))


def resample_segments(segments, n: int = 1000):
    """Up-sample each (k, 2) segment to (n, 2) by per-axis linear
    interpolation over the vertex index (general.py:346-354). Returns a new
    list; inputs are not mutated (the reference mutates in place)."""
    out = []
    for s in segments:
        s = np.asarray(s, dtype=np.float32)
        x = np.linspace(0, len(s) - 1, n)
        xp = np.arange(len(s))
        out.append(np.stack([np.interp(x, xp, s[:, i])
                             for i in range(2)], axis=1).astype(np.float32))
    return out
