"""Pallas fused CFT stack vs pure-jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multispectral_object_detection_tpu.ops.pallas_fusion import (
    fused_cft_stack, fused_cft_stack_reference)


def _inputs(B=2, N=128, C=256, L=3, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 12)
    f = lambda k, s: jax.random.normal(k, s, jnp.float32) * 0.05
    x = f(ks[0], (B, N, C))
    args = [f(ks[1], (L, C, 3 * C)), f(ks[2], (L, 3 * C)),
            f(ks[3], (L, C, C)), f(ks[4], (L, C)),
            f(ks[5], (L, C, 4 * C)), f(ks[6], (L, 4 * C)),
            f(ks[7], (L, 4 * C, C)), f(ks[8], (L, C)),
            jnp.stack([1 + 0.1 * f(ks[9], (L, C)), 0.1 * f(ks[10], (L, C))], 1),
            jnp.stack([1 + 0.1 * f(ks[11], (L, C)), jnp.zeros((L, C))], 1)]
    return x, args


def test_pallas_matches_reference_interpret():
    x, args = _inputs()
    ref = fused_cft_stack_reference(x, *args, num_heads=8)
    out = fused_cft_stack(x, *args, num_heads=8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_reference_matches_fusion_module():
    """The jnp reference reproduces CrossModalFusion's block stack (eval)."""
    from multispectral_object_detection_tpu.models.fusion import FusionBlock

    B, N, C, L = 2, 128, 64, 2
    x, args = _inputs(B=B, N=N, C=C, L=L, seed=3)
    (wqkv, bqkv, wp, bp, w1, b1, w2, b2, ln1, ln2) = args

    y = x
    for i in range(L):
        blk = FusionBlock(d_model=C, num_heads=8, attn_drop=0.0,
                          resid_drop=0.0)
        params = {"params": {
            "ln_in": {"scale": ln1[i, 0], "bias": ln1[i, 1]},
            "qkv": {"kernel": wqkv[i], "bias": bqkv[i]},
            "proj": {"kernel": wp[i], "bias": bp[i]},
            "ln_out": {"scale": ln2[i, 0], "bias": ln2[i, 1]},
            "fc1": {"kernel": w1[i], "bias": b1[i]},
            "fc2": {"kernel": w2[i], "bias": b2[i]},
        }}
        y = blk.apply(params, y, train=False)

    ref = fused_cft_stack_reference(x, *args, num_heads=8)
    # LN epsilons differ (flax 1e-6 default vs kernel 1e-6) — must agree
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_pallas_c3_bottleneck_interpret():
    """tools/exp_pallas_c3 kernel == jnp reference (interpret mode): the
    9-tap shifted-matmul C3 bottleneck candidate (PERF.md round-3 lever)."""
    import numpy as np
    import jax.numpy as jnp

    from multispectral_object_detection_tpu.ops.pallas_c3 import (
        bottleneck_pallas, bottleneck_ref)

    rng = np.random.default_rng(7)
    C = 64
    x = jnp.asarray(rng.normal(size=(2, 16, 16, C)), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(C, C)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
    got = np.asarray(bottleneck_pallas(x, w1, b1, w2, b2, row_chunk=8,
                                       interpret=True))
    ref = np.asarray(bottleneck_ref(x, w1, b1, w2, b2))
    np.testing.assert_allclose(got, ref, rtol=2e-5, atol=2e-5)


def test_c3_use_pallas_matches_xla_path():
    """C3(use_pallas=True) must consume the SAME param tree as the plain
    fused C3 and produce the same output (interpret mode on CPU)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from multispectral_object_detection_tpu.models import layers as L

    mod_a = L.C3(128, 128, n=2, dtype=jnp.float32, fused=True)
    mod_b = L.C3(128, 128, n=2, dtype=jnp.float32, fused=True,
                 use_pallas=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 128))
    v = mod_a.init(jax.random.PRNGKey(1), x)
    v2 = mod_b.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    ya = np.asarray(mod_a.apply(v, x))
    yb = np.asarray(mod_b.apply(v, x))
    np.testing.assert_allclose(ya, yb, rtol=2e-5, atol=2e-5)
