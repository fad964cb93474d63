"""Activation functions (thin jnp wrappers; XLA fuses these into neighbors)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def leaky_relu(x, negative_slope=0.01):
    return jnp.where(x >= 0, x, x * negative_slope)


def relu(x):
    return jnp.maximum(x, 0)


def tanh(x):
    return jnp.tanh(x)


def gelu(x):
    return jax.nn.gelu(x, approximate=False)
