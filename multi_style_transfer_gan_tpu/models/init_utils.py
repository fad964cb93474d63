"""Weight initializers matching the reference's init recipe.

The reference initializes convs with Kaiming-normal (mode='fan_out',
nonlinearity='relu') and zero biases (enhanced_generator.py:152-161);
linear layers use PyTorch's default uniform init.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def kaiming_conv(key, shape_hwio, *, mode="fan_out", dtype=jnp.float32):
    """He-normal conv init. shape is (kh, kw, I, O)."""
    kh, kw, cin, cout = shape_hwio
    fan = (cout if mode == "fan_out" else cin) * kh * kw
    std = math.sqrt(2.0 / fan)
    w = jax.random.normal(key, shape_hwio, dtype) * std
    b = jnp.zeros((cout,), dtype)
    return w, b


def torch_default_conv(key, shape_hwio, dtype=jnp.float32):
    """PyTorch's default Conv2d init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kh, kw, cin, cout = shape_hwio
    bound = 1.0 / math.sqrt(cin * kh * kw)
    k1, k2 = jax.random.split(key)
    w = jax.random.uniform(k1, shape_hwio, dtype, -bound, bound)
    b = jax.random.uniform(k2, (cout,), dtype, -bound, bound)
    return w, b


def torch_default_linear(key, out_features, in_features, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(in_features)
    k1, k2 = jax.random.split(key)
    w = jax.random.uniform(k1, (out_features, in_features), dtype, -bound, bound)
    b = jax.random.uniform(k2, (out_features,), dtype, -bound, bound)
    return w, b


def zeros(n, dtype=jnp.float32):
    return jnp.zeros((n,), dtype)


def ones(n, dtype=jnp.float32):
    return jnp.ones((n,), dtype)
