"""Alternative activation functions (reference utils/activations.py:9-98).

Provided for module-zoo parity; the default everywhere is SiLU. All are
plain jnp functions plus flax modules for the parameterized ones.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def silu(x):
    return jax.nn.silu(x)


def hardswish(x):
    """x * relu6(x + 3) / 6 (activations.py:19)."""
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def mish(x):
    """x * tanh(softplus(x)) (activations.py:25)."""
    return x * jnp.tanh(jax.nn.softplus(x))


class FReLU(nn.Module):
    """Funnel activation: max(x, DWConv+BN(x)) (activations.py:48)."""

    c1: int
    k: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.c1, (self.k, self.k), feature_group_count=self.c1,
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         name="bn")(y.astype(jnp.float32)).astype(x.dtype)
        return jnp.maximum(x, y)


class AconC(nn.Module):
    """ACON-C: (p1*x - p2*x) * sigmoid(beta * (p1*x - p2*x)) + p2*x
    (activations.py:57-71); per-channel learnable p1/p2/beta."""

    c1: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        shape = (1, 1, 1, self.c1)
        p1 = self.param("p1", nn.initializers.normal(1.0), shape)
        p2 = self.param("p2", nn.initializers.normal(1.0), shape)
        beta = self.param("beta", nn.initializers.ones, shape)
        dpx = (p1 - p2) * x
        return dpx * jax.nn.sigmoid(beta * dpx) + p2 * x


class MetaAconC(nn.Module):
    """ACON-C with a channel-attention generated beta (activations.py:74-98)."""

    c1: int
    k: int = 1
    s: int = 1
    r: int = 16

    @nn.compact
    def __call__(self, x, train: bool = False):
        c2 = max(self.r, self.c1 // self.r)
        shape = (1, 1, 1, self.c1)
        p1 = self.param("p1", nn.initializers.normal(1.0), shape)
        p2 = self.param("p2", nn.initializers.normal(1.0), shape)
        y = x.mean(axis=(1, 2), keepdims=True)
        y = nn.Conv(c2, (self.k, self.k), strides=self.s, use_bias=True,
                    name="fc1")(y)
        y = nn.Conv(self.c1, (self.k, self.k), strides=self.s, use_bias=True,
                    name="fc2")(y)
        beta = jax.nn.sigmoid(y)
        dpx = (p1 - p2) * x
        return dpx * jax.nn.sigmoid(beta * dpx) + p2 * x
