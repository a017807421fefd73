"""Device-side image preprocessing: batched letterbox + normalize under jit.

The reference letterboxes on the host with OpenCV (datasets.py:1698); for
TPU serving the host should only decode — geometry runs on device:

- bilinear resize as two static matmuls (ops/attention.py matrices): exact
  cv2.INTER_LINEAR semantics, MXU-resident, batched;
- centered constant pad to the square canvas (gray 114);
- uint8 -> normalized compute-dtype in the same fused program.

All shapes are static per (src_hw, img_size) pair — one compilation per
shape bucket, like the rest of the framework.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .attention import _bilinear_matrix


def letterbox_params(src_hw: Tuple[int, int], img_size: int,
                     scaleup: bool = True):
    """Replicates data/augment.letterbox geometry for a fixed source shape:
    returns (resized_hw, ratio, (padw, padh))."""
    h, w = src_hw
    r = min(img_size / h, img_size / w)
    if not scaleup:
        r = min(r, 1.0)
    new_unpad = (int(round(w * r)), int(round(h * r)))
    dw = (img_size - new_unpad[0]) / 2
    dh = (img_size - new_unpad[1]) / 2
    return (new_unpad[1], new_unpad[0]), (r, r), (dw, dh)


@functools.partial(jax.jit, static_argnames=("src_hw", "img_size", "scaleup",
                                             "dtype_name", "normalize"))
def letterbox_batch(imgs, *, src_hw: Tuple[int, int], img_size: int,
                    scaleup: bool = True, dtype_name: str = "float32",
                    normalize: bool = True):
    """(B, H0, W0, 3) uint8 -> (B, S, S, 3) dtype, letterboxed + /255.

    Matches host letterbox(auto=False) output to within bilinear rounding.
    """
    dtype = jnp.dtype(dtype_name)
    (nh, nw), _, (dw, dh) = letterbox_params(src_hw, img_size, scaleup)
    x = imgs.astype(jnp.float32)
    if (nh, nw) != tuple(src_hw):
        av = jnp.asarray(_bilinear_matrix(src_hw[0], nh))
        ah = jnp.asarray(_bilinear_matrix(src_hw[1], nw))
        x = jnp.einsum("oh,bhwc->bowc", av, x)
        x = jnp.einsum("ow,bhwc->bhoc", ah, x)
    top = int(round(dh - 0.1))
    left = int(round(dw - 0.1))
    x = jnp.pad(x, ((0, 0), (top, img_size - nh - top),
                    (left, img_size - nw - left), (0, 0)),
                constant_values=114.0)
    if normalize:
        x = x / 255.0
    return x.astype(dtype)


@functools.partial(jax.jit, static_argnames=("dtype_name",))
def hsv_jitter_batch(imgs, gains, key, dtype_name: str = "float32"):
    """Device-side HSV jitter for TRAIN-time augmentation of a uint8 batch.

    gains: (3,) [h, s, v] max jitter; per-image factors drawn from key.
    Returns uint8. Equivalent math to data/augment.augment_hsv but computed
    in RGB<->HSV float space on device (LUT-free).
    """
    b = imgs.shape[0]
    r = jax.random.uniform(key, (b, 3), minval=-1.0, maxval=1.0) * gains + 1.0
    x = imgs.astype(jnp.float32) / 255.0

    mx = x.max(-1)
    mn = x.min(-1)
    v = mx
    s = jnp.where(mx > 0, (mx - mn) / jnp.maximum(mx, 1e-9), 0.0)
    rc, gc, bc = x[..., 0], x[..., 1], x[..., 2]
    df = jnp.maximum(mx - mn, 1e-9)
    h = jnp.where(mx == rc, (gc - bc) / df,
                  jnp.where(mx == gc, 2.0 + (bc - rc) / df,
                            4.0 + (rc - gc) / df))
    h = (h / 6.0) % 1.0

    h = (h * r[:, None, None, 0]) % 1.0
    s = jnp.clip(s * r[:, None, None, 1], 0.0, 1.0)
    v = jnp.clip(v * r[:, None, None, 2], 0.0, 1.0)

    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    rgb = jnp.stack([
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q),
    ], axis=-1)
    return jnp.clip(jnp.round(rgb * 255.0), 0, 255).astype(jnp.uint8)
