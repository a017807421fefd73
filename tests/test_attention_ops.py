"""Parity tests for pooling / resize / attention vs torch CPU reference math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multispectral_object_detection_tpu.ops.attention import (
    adaptive_avg_pool_2d, bilinear_resize_2d, multi_head_attention)

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("hw", [(16, 16), (40, 40), (13, 17)])
def test_adaptive_avg_pool_matches_torch(hw):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, hw[0], hw[1], 5)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool_2d(jnp.asarray(x), (8, 8)))
    ref = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), (8, 8)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hw", [(16, 16), (40, 40), (80, 80)])
def test_bilinear_resize_matches_torch(hw):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 5)).astype(np.float32)
    ours = np.asarray(bilinear_resize_2d(jnp.asarray(x), hw))
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=hw,
        mode="bilinear").numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_multi_head_attention_matches_torch():
    rng = np.random.default_rng(2)
    b, n, c, h = 2, 128, 64, 8
    q = rng.normal(size=(b, n, c)).astype(np.float32)
    k = rng.normal(size=(b, n, c)).astype(np.float32)
    v = rng.normal(size=(b, n, c)).astype(np.float32)
    ours = np.asarray(multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=h))

    d = c // h
    qt = torch.from_numpy(q).view(b, n, h, d).permute(0, 2, 1, 3)
    kt = torch.from_numpy(k).view(b, n, h, d).permute(0, 2, 3, 1)
    vt = torch.from_numpy(v).view(b, n, h, d).permute(0, 2, 1, 3)
    att = torch.softmax(torch.matmul(qt, kt) / np.sqrt(d), dim=-1)
    ref = torch.matmul(att, vt).permute(0, 2, 1, 3).reshape(b, n, c).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pool_resize_no_tracer_leak_across_eval_shape():
    """Regression: constant matrices must not cache tracers from eval_shape."""
    def f(x):
        return bilinear_resize_2d(adaptive_avg_pool_2d(x, (8, 8)), (32, 32))

    jax.eval_shape(f, jax.ShapeDtypeStruct((1, 32, 32, 4), jnp.float32))
    out = f(jnp.ones((1, 32, 32, 4)))  # must not raise UnexpectedTracerError
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)
