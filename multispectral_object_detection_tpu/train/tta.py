"""Test-time augmentation inference.

The reference TTA (yolo_test.py:214-230) runs three scales [1, .83, .67]
with flips [none, lr, none] and de-scales the decoded boxes — but its
two-stream path is BROKEN upstream (forward_once called without the IR
input, yolo_test.py:222; SURVEY.md §2.2). This is the working equivalent:
both modalities are scaled/flipped together.

Static shapes: each scale is its own jitted program (3 compilations, cached).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.attention import bilinear_resize_2d

SCALES = (1.0, 0.83, 0.67)
FLIPS = (None, "lr", None)


def _scale_img(x, scale: float, gs: int = 32):
    """Resize by `scale` and pad to a gs multiple with gray 0.447
    (torch_utils.py:244 scale_img)."""
    b, h, w, c = x.shape
    nh, nw = int(h * scale), int(w * scale)
    y = bilinear_resize_2d(x, (nh, nw))
    ph, pw = (gs - nh % gs) % gs, (gs - nw % gs) % gs
    if ph or pw:
        y = jnp.pad(y, ((0, 0), (0, ph), (0, pw), (0, 0)),
                    constant_values=0.447)
    return y


def tta_forward(model, params, batch_stats, rgb, ir=None, gs: int = 32):
    """Augmented inference: returns concatenated decoded detections
    (B, sum_i N_i, 5+nc) in the ORIGINAL canvas coordinate frame."""
    two = ir is not None
    h, w = rgb.shape[1], rgb.shape[2]
    outs = []
    for scale, flip in zip(SCALES, FLIPS):
        r = rgb
        i2 = ir
        if flip == "lr":
            r = r[:, :, ::-1, :]
            i2 = None if i2 is None else i2[:, :, ::-1, :]
        if scale != 1.0:
            r = _scale_img(r, scale, gs)
            i2 = None if i2 is None else _scale_img(i2, scale, gs)
        ins = (r,) if not two else (r, i2)
        feats = model.apply({"params": params, "batch_stats": batch_stats},
                            *ins, train=False)
        d = model.decode(feats)  # (B, N, 5+nc), xywh in scaled pixels
        xy = d[..., :2] / scale
        wh = d[..., 2:4] / scale
        if flip == "lr":
            xy = xy.at[..., 0].set(w - xy[..., 0])
        outs.append(jnp.concatenate([xy, wh, d[..., 4:]], axis=-1))
    return jnp.concatenate(outs, axis=1)
