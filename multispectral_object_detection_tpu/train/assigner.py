"""Anchor-target assignment under XLA's static-shape regime.

Re-designs the reference `build_targets` (utils/loss.py:163-216) — which
relies on boolean indexing and data-dependent shapes — as a fixed-shape,
fully-masked computation:

- Targets arrive as a padded (T, 6) array [img, cls, x, y, w, h] (normalized)
  plus a validity mask, T static.
- For each pyramid scale we materialize ALL (offset=5) x (anchor=na) x T
  candidates with a combined validity mask instead of filtering:
    * anchor match: max(wh/anchor, anchor/wh) < anchor_t   (loss.py:185-188)
    * grid-cell neighbor expansion: center cell + up to 2 of 4 neighbors
      whose fractional center coordinate lies within g=0.5   (loss.py:191-197)
- Outputs are flat per-scale index/regression arrays of static length
  5*na*T, consumed by the loss via one vectorized gather + scatter-max.

Deviation (documented): when two valid candidates land on the same
(b, a, gj, gi) cell the reference's objectness scatter is last-write-wins
(nondeterministic under CUDA); we use a deterministic scatter-max.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

_OFFSETS = np.array(
    [[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], dtype=np.float32
) * 0.5  # center, right, down, left, up (loss.py:172-175)


class ScaleAssignment(NamedTuple):
    """Flat candidate set for one pyramid scale; all arrays length K=5*na*T."""

    b: jnp.ndarray      # image index (int32)
    a: jnp.ndarray      # anchor index (int32)
    gj: jnp.ndarray     # grid row (int32)
    gi: jnp.ndarray     # grid col (int32)
    txy: jnp.ndarray    # (K, 2) target xy offset within cell (gxy - gij)
    twh: jnp.ndarray    # (K, 2) target wh in grid units
    cls: jnp.ndarray    # (K,) class id (int32)
    mask: jnp.ndarray   # (K,) validity (float32 0/1)


def assign_targets(
    targets: jnp.ndarray,        # (T, 6) [img, cls, x, y, w, h] normalized
    tmask: jnp.ndarray,          # (T,) bool/float validity
    feat_shapes: Sequence[Tuple[int, int]],  # per-scale (ny, nx), static
    anchors_grid: np.ndarray,    # (nl, na, 2) anchors in grid units
    anchor_t: float = 4.0,
) -> Tuple[ScaleAssignment, ...]:
    """Vectorized, fixed-shape equivalent of loss.py:163 build_targets."""
    t6 = targets.astype(jnp.float32)
    tmask = tmask.astype(jnp.float32)
    T = t6.shape[0]
    na = anchors_grid.shape[1]
    off = jnp.asarray(_OFFSETS)  # (5, 2)
    g = 0.5

    out = []
    for si, (ny, nx) in enumerate(feat_shapes):
        gain = jnp.asarray([1.0, 1.0, nx, ny, nx, ny], dtype=jnp.float32)
        t = t6 * gain  # (T, 6) in grid units

        anc = jnp.asarray(anchors_grid[si], dtype=jnp.float32)  # (na, 2)
        r = t[None, :, 4:6] / anc[:, None, :]                    # (na, T, 2)
        ratio_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < anchor_t  # (na, T)

        gxy = t[:, 2:4]                                          # (T, 2)
        gxi = jnp.asarray([nx, ny], dtype=jnp.float32) - gxy
        jk = (jnp.mod(gxy, 1.0) < g) & (gxy > 1.0)               # (T, 2) right/down
        lm = (jnp.mod(gxi, 1.0) < g) & (gxi > 1.0)               # (T, 2) left/up
        offset_ok = jnp.stack(
            [jnp.ones((T,), dtype=bool), jk[:, 0], jk[:, 1], lm[:, 0], lm[:, 1]],
            axis=0,
        )  # (5, T)

        # combined candidate mask (5, na, T)
        cand = offset_ok[:, None, :] & ratio_ok[None, :, :] & (tmask > 0)[None, None, :]

        gij = jnp.floor(gxy[None, :, :] - off[:, None, :])       # (5, T, 2)
        gi = jnp.clip(gij[..., 0], 0, nx - 1).astype(jnp.int32)  # (5, T)
        gj = jnp.clip(gij[..., 1], 0, ny - 1).astype(jnp.int32)

        # the reference clamps gj/gi in-place BEFORE building tbox
        # (loss.py:211-212), so the regression offset uses clamped cells too
        gij_clamped = jnp.stack(
            [gi.astype(jnp.float32), gj.astype(jnp.float32)], axis=-1)
        txy = gxy[None, :, :] - gij_clamped                      # (5, T, 2)
        twh = t[:, 4:6]                                          # (T, 2)
        bidx = t[:, 0].astype(jnp.int32)                         # (T,)
        cidx = t[:, 1].astype(jnp.int32)

        K = 5 * na * T
        bc = jnp.broadcast_to(bidx[None, None, :], (5, na, T)).reshape(K)
        ac = jnp.broadcast_to(
            jnp.arange(na, dtype=jnp.int32)[None, :, None], (5, na, T)).reshape(K)
        gjc = jnp.broadcast_to(gj[:, None, :], (5, na, T)).reshape(K)
        gic = jnp.broadcast_to(gi[:, None, :], (5, na, T)).reshape(K)
        txyc = jnp.broadcast_to(txy[:, None, :, :], (5, na, T, 2)).reshape(K, 2)
        twhc = jnp.broadcast_to(twh[None, None, :, :], (5, na, T, 2)).reshape(K, 2)
        clsc = jnp.broadcast_to(cidx[None, None, :], (5, na, T)).reshape(K)
        mc = cand.reshape(K).astype(jnp.float32)

        # null out indices of invalid candidates so gathers stay in-bounds
        zero = jnp.int32(0)
        valid = mc > 0
        out.append(ScaleAssignment(
            b=jnp.where(valid, bc, zero),
            a=jnp.where(valid, ac, zero),
            gj=jnp.where(valid, gjc, zero),
            gi=jnp.where(valid, gic, zero),
            txy=txyc,
            twh=twhc,
            cls=jnp.where(valid, clsc, zero),
            mask=mc,
        ))
    return tuple(out)
