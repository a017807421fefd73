"""Device-side paired mosaic + scale/translate + flip augmentation.

The reference's mosaic/affine run per-sample in host worker processes
(utils/datasets.py:1464-1603, 1819-1914). On a CPU-poor host that pipeline
is the training wall-clock limiter, so this module reformulates the DEFAULT
recipe's augmentation (hyp.scratch: degrees=0, shear=0, perspective=0 — the
warp is scale+translate, which is axis-SEPARABLE) as fixed-shape XLA ops:

- 4-tile mosaic assembly via dynamic_update_slice onto a padded canvas
  (tiles are pre-letterboxed to s x s by the host loader; geometry matches
  the reference's corner-at-center placement);
- the scale+translate "affine" as two per-sample bilinear RESAMPLING MATRIX
  matmuls (out = W_y @ canvas @ W_x^T, W built from traced offsets — runs on
  the MXU, no gathers), with gray-114 out-of-range fill;
- shared horizontal flip, per-modality HSV (ops/preprocess.hsv_jitter_batch);
- label transform + the reference's box-candidates filter as masks.

Not a bit-exact reimplementation of the host path (tiles are letterboxed
squares rather than raw-aspect crops); it is the same augmentation family
with identical hyperparameter semantics, validated by label/image
consistency tests. Rotation/shear/perspective hyps still use the host path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .preprocess import hsv_jitter_batch

PAD_VAL = 114.0


def _resample_matrix(size_out: int, size_in: int, scale, shift):
    """(size_out, size_in) bilinear sampling matrix for src = (i - shift)/scale.

    Rows whose source lands outside [0, size_in-1] sum < 1; the caller adds
    (1 - rowsum) * PAD_VAL for constant-border semantics.
    """
    i = jnp.arange(size_out, dtype=jnp.float32)[:, None]     # (out, 1)
    j = jnp.arange(size_in, dtype=jnp.float32)[None, :]      # (1, in)
    src = (i - shift) / scale
    w = jnp.maximum(0.0, 1.0 - jnp.abs(src - j))             # bilinear hat
    return w


def _warp_scale_translate(img, scale, tx, ty, out_size: int):
    """img (H, W, 3) float -> (out, out, 3): out(y,x) = img((y-ty)/s, (x-tx)/s)
    with gray border."""
    h, w, _ = img.shape
    wy = _resample_matrix(out_size, h, scale, ty)            # (out, H)
    wx = _resample_matrix(out_size, w, scale, tx)            # (out, W)
    y = jnp.einsum("oh,hwc->owc", wy, img)
    y = jnp.einsum("ow,hwc->hoc", wx, y)
    # border fill: weight deficit per output pixel
    ry = wy.sum(1)                                           # (out,)
    rx = wx.sum(1)
    cover = ry[:, None] * rx[None, :]
    return y + (1.0 - cover)[..., None] * PAD_VAL


def _mosaic_canvas(tiles, yc, xc, s: int):
    """tiles (4, s, s, 3) float -> padded canvas (3s, 3s, 3).

    Tile corners meet at (yc, xc) on the 2s canvas (reference
    datasets.py:1504-1526 with s x s tiles); the padded frame keeps every
    dynamic_update_slice fully in bounds. Canvas coords = padded - s/2.
    """
    pad = s // 2
    canvas = jnp.full((3 * s, 3 * s, 3), PAD_VAL, dtype=tiles.dtype)
    yo = yc + pad
    xo = xc + pad
    canvas = jax.lax.dynamic_update_slice(canvas, tiles[0], (yo - s, xo - s, 0))
    canvas = jax.lax.dynamic_update_slice(canvas, tiles[1], (yo - s, xo, 0))
    canvas = jax.lax.dynamic_update_slice(canvas, tiles[2], (yo, xo - s, 0))
    canvas = jax.lax.dynamic_update_slice(canvas, tiles[3], (yo, xo, 0))
    return canvas


def _mosaic_labels(labels, lmask, yc, xc, s: int):
    """labels (4, M, 5) [cls, x, y, w, h] normalized per tile -> canvas-pixel
    xyxy (4M, 4) + cls + mask. Tile i's top-left on the canvas:
    TL (yc-s, xc-s), TR (yc-s, xc), BL (yc, xc-s), BR (yc, xc)."""
    offs = jnp.stack([
        jnp.stack([xc - s, yc - s]), jnp.stack([xc, yc - s]),
        jnp.stack([xc - s, yc]), jnp.stack([xc, yc]),
    ]).astype(jnp.float32)                                   # (4, 2) [x, y]
    cls = labels[..., 0].reshape(-1)
    xy = labels[..., 1:3] * s + offs[:, None, :]             # (4, M, 2)
    wh = labels[..., 3:5] * s
    x1y1 = xy - wh / 2
    x2y2 = xy + wh / 2
    boxes = jnp.concatenate([x1y1, x2y2], -1).reshape(-1, 4)
    boxes = jnp.clip(boxes, 0.0, 2.0 * s)                    # canvas clip
    return cls, boxes, lmask.reshape(-1)


def _one_sample(tiles_rgb, tiles_ir, labels, lmask, key, s: int,
                scale_jit: float, translate: float):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    yc = jax.random.randint(k1, (), s // 2, 2 * s - s // 2)
    xc = jax.random.randint(k2, (), s // 2, 2 * s - s // 2)

    canvas_rgb = _mosaic_canvas(tiles_rgb.astype(jnp.float32), yc, xc, s)
    canvas_ir = _mosaic_canvas(tiles_ir.astype(jnp.float32), yc, xc, s)
    cls, boxes, mask = _mosaic_labels(labels, lmask, yc, xc, s)

    # scale + translate (the default-hyp affine, datasets.py:1753-1818):
    # output pixel o = canvas((o - t)/r); canvas coords live at padded - s/2
    r = jax.random.uniform(k3, (), minval=1.0 - scale_jit,
                           maxval=1.0 + scale_jit)
    tshift = jax.random.uniform(k4, (2,), minval=0.5 - translate,
                                maxval=0.5 + translate) * s  # (tx, ty)
    # reference T centers the 2s canvas in the s output: x_out = x_can*r + t - s/2*? :
    # composed C (center at -s) then T: x_out = (x_can - s) * r + t
    pad = s // 2
    # padded->output: x_out = (x_pad - pad - s) * r + t  => shift = t - (pad + s) * r
    tx = tshift[0] - (pad + s) * r
    ty = tshift[1] - (pad + s) * r

    out_rgb = _warp_scale_translate(canvas_rgb, r, tx, ty, s)
    out_ir = _warp_scale_translate(canvas_ir, r, tx, ty, s)

    # label transform: canvas -> output pixels
    b = boxes * r
    shift = jnp.stack([tshift[0] - s * r, tshift[1] - s * r])
    b = b + jnp.concatenate([shift, shift])
    w_before = (boxes[:, 2] - boxes[:, 0]) * r
    h_before = (boxes[:, 3] - boxes[:, 1]) * r
    b = jnp.clip(b, 0.0, float(s))
    w_after = b[:, 2] - b[:, 0]
    h_after = b[:, 3] - b[:, 1]
    ar = jnp.maximum(w_after / (h_after + 1e-16), h_after / (w_after + 1e-16))
    keep = ((w_after > 2.0) & (h_after > 2.0) & (ar < 20.0)
            & (w_after * h_after / (w_before * h_before + 1e-16) > 0.1))
    mask = mask * keep.astype(jnp.float32)
    return out_rgb, out_ir, cls, b, mask


@functools.partial(jax.jit, static_argnames=("img_size", "scale_jit",
                                             "translate", "fliplr",
                                             "hsv_gains"))
def device_mosaic_batch(tiles_rgb, tiles_ir, labels, lmask, key, *,
                        img_size: int, scale_jit: float = 0.5,
                        translate: float = 0.1, fliplr: float = 0.5,
                        hsv_gains: Tuple[float, float, float] = (0.015, 0.7, 0.4)):
    """Batched device-side paired mosaic pipeline.

    tiles_rgb/ir: (B, 4, s, s, 3) uint8 pre-letterboxed tiles.
    labels: (B, 4, M, 5) [cls, x, y, w, h] normalized per tile; lmask (B,4,M).
    Returns rgb/ir (B, s, s, 3) uint8 and flat targets (B, 4M, 5)
    [cls, x, y, w, h] normalized + validity (B, 4M).
    """
    B = tiles_rgb.shape[0]
    s = img_size
    keys = jax.random.split(key, B + 3)
    sample_keys = keys[:B]
    out_rgb, out_ir, cls, boxes, mask = jax.vmap(
        lambda tr, ti, lb, lm, k: _one_sample(tr, ti, lb, lm, k, s,
                                              scale_jit, translate)
    )(tiles_rgb, tiles_ir, labels, lmask, sample_keys)

    # shared horizontal flip
    flip = jax.random.bernoulli(keys[B], fliplr, (B,))
    out_rgb = jnp.where(flip[:, None, None, None], out_rgb[:, :, ::-1, :],
                        out_rgb)
    out_ir = jnp.where(flip[:, None, None, None], out_ir[:, :, ::-1, :],
                       out_ir)
    x1 = jnp.where(flip[:, None], s - boxes[..., 2], boxes[..., 0])
    x2 = jnp.where(flip[:, None], s - boxes[..., 0], boxes[..., 2])
    boxes = jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], -1)

    rgb_u8 = jnp.clip(jnp.round(out_rgb), 0, 255).astype(jnp.uint8)
    ir_u8 = jnp.clip(jnp.round(out_ir), 0, 255).astype(jnp.uint8)
    # independent per-modality HSV (datasets.py:1230-1231)
    rgb_u8 = hsv_jitter_batch(rgb_u8, jnp.asarray(hsv_gains), keys[B + 1])
    ir_u8 = hsv_jitter_batch(ir_u8, jnp.asarray(hsv_gains), keys[B + 2])

    # xyxy px -> normalized xywh targets
    cx = (boxes[..., 0] + boxes[..., 2]) / 2 / s
    cy = (boxes[..., 1] + boxes[..., 3]) / 2 / s
    bw = (boxes[..., 2] - boxes[..., 0]) / s
    bh = (boxes[..., 3] - boxes[..., 1]) / s
    targets = jnp.stack([cls, cx, cy, bw, bh], -1)
    return rgb_u8, ir_u8, targets, mask
