"""Anchor-based detection head + pure functional decode.

Reference: models/yolo_test.py:25-64 `Detect`. Differences by design:
the torch head mutates its input list and switches output structure on
`self.training`; here the head is a pure map from pyramid features to raw
per-scale logits `(B, ny, nx, na, 5+nc)`, and inference decoding is a
separate jittable function (`decode_predictions`) so the same forward works
for train, eval, and serving.
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _detect_bias_init(nc: int, na: int, stride: float, img_size: float = 640.0):
    """Focal-style prior bias (reference yolo_test.py:274-282):
    obj ~ 8 objects / 640px image; cls ~ 0.6/(nc-0.99)."""

    def init(key, shape, dtype=jnp.float32):
        no = nc + 5
        b = np.zeros((na, no), dtype=np.float32)
        b[:, 4] += math.log(8.0 / (img_size / stride) ** 2)
        if nc > 1:
            b[:, 5:] += math.log(0.6 / (nc - 0.99))
        else:
            b[:, 5:] += math.log(0.6 / (nc - 0.99)) if nc > 0.99 else 0.0
        return jnp.asarray(b.reshape(-1), dtype=dtype)

    return init


class Detect(nn.Module):
    """Per-scale 1x1 conv head producing (B, ny, nx, na, 5+nc) raw logits."""

    nc: int
    anchors: Tuple[Tuple[float, ...], ...]  # per-scale flat (ax1,ay1,ax2,...) in px
    strides: Tuple[int, ...] = (8, 16, 32)
    dtype: Any = jnp.float32

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    @nn.compact
    def __call__(self, xs, train: bool = False):
        outs = []
        for i, x in enumerate(xs):
            y = nn.Conv(
                self.na * self.no,
                kernel_size=(1, 1),
                use_bias=True,
                bias_init=_detect_bias_init(self.nc, self.na, float(self.strides[i])),
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name=f"m{i}",
            )(x)
            b, ny, nx, _ = y.shape
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return tuple(outs)


def anchor_arrays(anchors: Sequence[Sequence[float]]) -> np.ndarray:
    """(nl, na, 2) pixel anchors from the YAML flat form."""
    a = np.asarray(anchors, dtype=np.float32)
    return a.reshape(len(anchors), -1, 2)


def check_anchor_order(anchors_px: np.ndarray, strides: Sequence[int]) -> np.ndarray:
    """Flip anchor scale order if inconsistent with stride order
    (reference utils/autoanchor.py:12-20)."""
    a = anchors_px.reshape(len(strides), -1, 2)
    da = a.prod(-1).mean(-1)[-1] - a.prod(-1).mean(-1)[0]
    ds = strides[-1] - strides[0]
    if np.sign(da) != np.sign(ds):
        a = a[::-1].copy()
    return a


def decode_predictions(feats, anchors_px: np.ndarray, strides: Sequence[int],
                       apply_sigmoid: bool = True):
    """Raw per-scale head outputs -> flat (B, N, 5+nc) detections.

    Box decode matches yolo_test.py:54-57:
        xy = (2*sig(txy) - 0.5 + grid) * stride
        wh = (2*sig(twh))^2 * anchor_px
    obj/cls stay as probabilities. Fully static shapes; runs under jit.
    """
    zs = []
    for i, f in enumerate(feats):
        b, ny, nx, na, no = f.shape
        y = jax.nn.sigmoid(f.astype(jnp.float32)) if apply_sigmoid else f
        gy = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 0)
        gx = jax.lax.broadcasted_iota(jnp.float32, (ny, nx), 1)
        grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None, :]  # (1,ny,nx,1,2)
        anc = jnp.asarray(anchors_px[i]).reshape(1, 1, 1, na, 2)
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * float(strides[i])
        wh = (y[..., 2:4] * 2.0) ** 2 * anc
        z = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
        zs.append(z.reshape(b, ny * nx * na, no))
    return jnp.concatenate(zs, axis=1)
