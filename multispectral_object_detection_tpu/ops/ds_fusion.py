"""Dempster-Shafer evidence fusion — the working version of reference
utils/ds_fusion.py (178 LoC, dead upstream: it imports a nonexistent
`full_arrange` module at ds_fusion.py:4 and is imported nowhere).

The reference script combines E "evidences" (mass functions over K
singleton hypotheses plus the uncertain event Θ) with Dempster's rule,
optionally pre-weighting the masses by inter-evidence compatibility (Li's
method, ds_fusion.py:7-46) or redistributing conflict by evidence
credibility (Sun's method, ds_fusion.py:49-152). Its combination rule
enumerates every K^E focal-element combination and hard-fails for E > 3
("can not do", ds_fusion.py:85).

For the singleton+Θ frames this task uses, Dempster's rule has a closed
form — no enumeration:

    m(i) ∝ prod_e(m_e(i) + m_e(Θ)) − prod_e m_e(Θ)
    m(Θ) ∝ prod_e m_e(Θ)

(the only way an intersection of focal elements equals singleton {i} is
every evidence contributing {i} or Θ, minus the all-Θ term). That is
O(E·K), vectorizes over arbitrary batch dimensions, and jits — so it runs
per-anchor over a whole detection grid on the MXU-fed VPU instead of a
Python triple loop.

Detection hook: `fuse_detections` treats each ensemble member's decoded
(B, N, 5+nc) output as an evidence per anchor — mass(class i) =
objectness · P(class i), mass(Θ) = 1 − objectness — and returns one
(B, N, 5+nc) tensor (fused objectness = 1 − m(Θ), confidence-weighted box
average). `hub.Ensemble(mode="ds")` rides this.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def dempster_combine(masses, return_conflict: bool = False):
    """Combine mass functions by Dempster's rule (closed form).

    masses: (E, ..., K+1) — E evidences over K singletons; the LAST slot of
    the final axis is m(Θ). Returns the normalized fused (..., K+1) mass
    (and the conflict mass k ∈ [0, 1) if ``return_conflict``).

    Matches reference DS_fusion_method (ds_fusion.py:81-134) on its
    supported inputs, without the E ≤ 3 cap or the K^E enumeration.
    """
    masses = jnp.asarray(masses)
    theta = masses[..., -1:]                        # (E, ..., 1)
    sing = jnp.prod(masses[..., :-1] + theta, axis=0) - jnp.prod(theta, axis=0)
    th = jnp.prod(theta, axis=0)                    # (..., 1)
    unnorm = jnp.concatenate([sing, th], axis=-1)
    total = jnp.sum(unnorm, axis=-1, keepdims=True)  # = 1 - conflict
    fused = unnorm / jnp.maximum(total, _EPS)
    if return_conflict:
        return fused, 1.0 - total[..., 0]
    return fused


def discount_li(masses):
    """Li's compatibility pre-weighting (reference IIM_of_Li, ds_fusion.py:7-46).

    masses: (E, ..., K) singleton masses (no Θ column). Per hypothesis k the
    pairwise compatibility is R_ij = 2·m_i·m_j / (m_i² + m_j²) (0 where both
    vanish); evidence e's weight is the mean compatibility with the others,
    W_e = (Σ_j R_ej − 1)/(E − 1). Returns (E, ..., K+1) with the discounted
    mass moved into Θ, ready for :func:`dempster_combine`.
    """
    m = jnp.asarray(masses)
    e = m.shape[0]
    prod = m[:, None] * m[None, :]                   # (E, E, ..., K)
    sq = jnp.square(m)[:, None] + jnp.square(m)[None, :]
    r = jnp.where(sq > _EPS, 2.0 * prod / jnp.maximum(sq, _EPS), 0.0)
    w = (jnp.sum(r, axis=1) - 1.0) / max(e - 1, 1)   # (E, ..., K)
    new = m * w
    theta = 1.0 - jnp.sum(new, axis=-1, keepdims=True)
    return jnp.concatenate([new, theta], axis=-1)


def combine_sun(masses):
    """Sun's credibility-discounted combination (reference IIM_of_sun +
    use_DS_method_of_sun, ds_fusion.py:49-152).

    masses: (E, ..., K) singleton masses. The mean pairwise conflict
    ε = mean_{i<j} Σ_k m_i(k)·(Σ m_j − m_j(k)) discounts Dempster's
    normalized result back toward the evidence average q: fused(i) =
    (1−k)·DS(i) + k·ε·q(i), fused(Θ) = k·(1−ε), k the conflict mass.
    Returns the fused (..., K+1) mass.
    """
    m = jnp.asarray(masses)
    e = m.shape[0]
    tot = jnp.sum(m, axis=-1, keepdims=True)         # (E, ..., 1)
    km = jnp.sum(m[:, None] * (tot[None, :] - m[None, :]), axis=-1)  # (E, E, ...)
    iu = jnp.triu(jnp.ones((e, e), bool), k=1)
    npairs = max(e * (e - 1) // 2, 1)
    eps = jnp.sum(jnp.where(iu.reshape((e, e) + (1,) * (km.ndim - 2)),
                            km, 0.0), axis=(0, 1)) / npairs
    q = jnp.mean(m, axis=0)                          # (..., K)
    with_theta = jnp.concatenate([m, jnp.zeros_like(m[..., :1])], axis=-1)
    ds, conflict = dempster_combine(with_theta, return_conflict=True)
    k = conflict[..., None]
    fused = (1.0 - k) * ds[..., :-1] + k * eps[..., None] * q
    theta = k * (1.0 - eps[..., None])
    return jnp.concatenate([fused, theta], axis=-1)


def fuse_detections(dets, method: str = "plain"):
    """Fuse aligned ensemble detections by DS evidence combination.

    dets: (E, B, N, 5+nc) decoded outputs (xywh, objectness, class probs —
    models/model.py decode layout) from E same-config members, so anchor n
    is the same grid cell in every member. Evidence e at anchor n:
    mass(class i) = obj_e · P_e(i) (renormalized if the member's class
    probs exceed 1), mass(Θ) = 1 − obj_e. method: "plain" (Dempster),
    "li" (compatibility pre-weighting), "sun" (conflict redistribution).

    Returns (B, N, 5+nc): box = objectness-weighted member average,
    objectness = 1 − fused m(Θ), class probs = fused singleton masses
    renormalized over the non-Θ mass.
    """
    dets = jnp.asarray(dets)
    obj = dets[..., 4:5]                             # (E, B, N, 1)
    cls = dets[..., 5:]
    cls = cls / jnp.maximum(jnp.sum(cls, axis=-1, keepdims=True), 1.0)
    sing = obj * cls                                 # (E, B, N, nc)
    if method == "plain":
        masses = jnp.concatenate([sing, 1.0 - obj], axis=-1)
        fused = dempster_combine(masses)
    elif method == "li":
        fused = dempster_combine(discount_li(sing))
    elif method == "sun":
        fused = combine_sun(sing)
    else:
        raise ValueError(f"method must be plain|li|sun, got {method!r}")
    new_obj = 1.0 - fused[..., -1:]
    new_cls = fused[..., :-1] / jnp.maximum(new_obj, _EPS)
    w = obj / jnp.maximum(jnp.sum(obj, axis=0, keepdims=True), _EPS)
    box = jnp.sum(w * dets[..., :4], axis=0)
    return jnp.concatenate([box, new_obj, new_cls], axis=-1)


fuse_detections_jit = jax.jit(fuse_detections, static_argnames=("method",))
