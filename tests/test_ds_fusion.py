"""Dempster-Shafer evidence fusion (ops/ds_fusion.py).

The reference's utils/ds_fusion.py is dead (imports a nonexistent
`full_arrange`, imported nowhere) and enumerates K^E combinations with a
hard E<=3 cap; ours is a closed-form vectorized redesign. The oracle here
is an independent brute-force Dempster enumeration over focal-element
combinations (itertools.product — the working version of the reference's
full_arrange sweep, ds_fusion.py:88-134), so semantics are pinned without
running (or copying) the broken script.
"""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from multispectral_object_detection_tpu.ops.ds_fusion import (
    combine_sun, dempster_combine, discount_li, fuse_detections)


def brute_force_dempster(masses):
    """Enumerate all focal-element combinations (last index = Theta).

    A combination's intersection is singleton {i} if every pick is i or
    Theta (and not all Theta); all-Theta -> Theta; anything else conflicts.
    """
    masses = np.asarray(masses, np.float64)
    e, kk = masses.shape
    theta = kk - 1
    unnorm = np.zeros(kk)
    for combo in itertools.product(range(kk), repeat=e):
        p = np.prod([masses[i, c] for i, c in enumerate(combo)])
        picks = set(combo) - {theta}
        if not picks:
            unnorm[theta] += p
        elif len(picks) == 1:
            unnorm[picks.pop()] += p
    return unnorm / unnorm.sum()


@pytest.mark.parametrize("e,k,seed", [(2, 2, 0), (3, 4, 1), (5, 3, 2)])
def test_closed_form_matches_brute_force(e, k, seed):
    rng = np.random.RandomState(seed)
    m = rng.rand(e, k + 1)
    m /= m.sum(axis=1, keepdims=True)
    ours = np.asarray(dempster_combine(jnp.asarray(m)), np.float64)
    np.testing.assert_allclose(ours, brute_force_dempster(m), atol=1e-6)


def test_reference_main_example_li():
    """The reference __main__ example (ds_fusion.py:156-178): evidences
    [0.9, 0.1] and [0.8, 0.2] through Li's IIM. Discounted masses are
    hand-computable: R = 2ab/(a^2+b^2) per hypothesis -> W = R (E=2)."""
    data = jnp.asarray([[0.9, 0.1], [0.8, 0.2]])
    d = np.asarray(discount_li(data), np.float64)
    w0 = 2 * 0.9 * 0.8 / (0.81 + 0.64)  # hypothesis 0 compatibility
    w1 = 2 * 0.1 * 0.2 / (0.01 + 0.04)
    exp = np.array([[0.9 * w0, 0.1 * w1], [0.8 * w0, 0.2 * w1]])
    np.testing.assert_allclose(d[:, :2], exp, atol=1e-6)
    np.testing.assert_allclose(d.sum(axis=1), 1.0, atol=1e-6)  # Theta fills
    fused = np.asarray(dempster_combine(jnp.asarray(d)), np.float64)
    np.testing.assert_allclose(fused, brute_force_dempster(d), atol=1e-6)


def test_reference_main_example_sun():
    """Sun's method on the same example — every quantity closed-form:
    k_m = 0.26 each way, eps = 0.26, q = [0.85, 0.15], conflict = 0.26."""
    data = jnp.asarray([[0.9, 0.1], [0.8, 0.2]])
    f = np.asarray(combine_sun(data), np.float64)
    conflict = 1 - (0.9 * 0.8 + 0.1 * 0.2)
    exp0 = 0.9 * 0.8 + conflict * 0.26 * 0.85
    exp1 = 0.1 * 0.2 + conflict * 0.26 * 0.15
    np.testing.assert_allclose(f, [exp0, exp1, conflict * (1 - 0.26)],
                               atol=1e-6)
    np.testing.assert_allclose(f.sum(), 1.0, atol=1e-6)


def test_batched_combine_matches_loop():
    rng = np.random.RandomState(3)
    m = rng.rand(3, 4, 7, 5)
    m /= m.sum(axis=-1, keepdims=True)
    batched = np.asarray(dempster_combine(jnp.asarray(m)))
    for b in range(4):
        for n in range(7):
            np.testing.assert_allclose(
                batched[b, n], brute_force_dempster(m[:, b, n]), atol=1e-6)


def test_total_conflict_does_not_nan():
    m = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])  # disjoint certainty
    fused, k = dempster_combine(m, return_conflict=True)
    assert np.isfinite(np.asarray(fused)).all()
    np.testing.assert_allclose(np.asarray(k), 1.0, atol=1e-9)


@pytest.mark.parametrize("method", ["plain", "li", "sun"])
def test_fuse_detections_contract(method):
    rng = np.random.RandomState(4)
    dets = rng.rand(3, 2, 8, 5 + 4).astype(np.float32)
    out = np.asarray(fuse_detections(jnp.asarray(dets), method=method))
    assert out.shape == (2, 8, 9)
    assert np.isfinite(out).all()
    assert (out[..., 4] >= -1e-6).all() and (out[..., 4] <= 1 + 1e-6).all()


def test_fuse_detections_agreement_boosts_confidence():
    """Two members both 80% sure of class 0 -> fused objectness > 0.8;
    that's the point of evidence fusion vs averaging."""
    det = np.zeros((1, 1, 1, 7), np.float32)  # nc=2
    det[..., :4] = [10, 10, 4, 4]
    det[..., 4] = 0.8
    det[..., 5] = 1.0
    dets = np.concatenate([det, det], axis=0)
    out = np.asarray(fuse_detections(jnp.asarray(dets)))
    # m(Theta) = 0.2*0.2 = 0.04 -> fused objectness 0.96 (vs mean's 0.8)
    np.testing.assert_allclose(out[0, 0, 4], 0.96, atol=1e-5)
    np.testing.assert_allclose(out[0, 0, :4], [10, 10, 4, 4], atol=1e-5)


def test_ensemble_modes():
    """hub.Ensemble aligned modes on two nano members: aligned shapes out
    (N, not 2N like the default cat mode) and finite detections."""
    from multispectral_object_detection_tpu import hub

    rgb = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                      jnp.float32)
    cat_n = None
    for mode in ["cat", "mean", "max", "ds"]:
        ens = hub.Ensemble([("yolov5n", None), ("yolov5n", None)], nc=2,
                           mode=mode)
        out = ens.decode_all(rgb)
        assert out.ndim == 3 and out.shape[0] == 1
        assert np.isfinite(np.asarray(out)).all()
        if mode == "cat":
            cat_n = out.shape[1]
        else:
            assert out.shape[1] * 2 == cat_n
    with pytest.raises(ValueError, match="unknown ensemble mode"):
        hub.Ensemble([("yolov5n", None)], nc=2, mode="bogus")
