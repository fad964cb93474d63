"""Windowed channel attention, natural-layout variant.

Unlike ``window_attention.fused_window_channel_attention`` (which relies on
an XLA window-major relayout whose (N, C) HBM buffers lane-pad 8x for
C=16), this kernel reads the activation tensor in its natural (B, H, W, C)
layout — the grid walks (batch, window-row, window-column-tile) and each
step loads a (ws, TW*ws, C) strip, does the window partition as in-VMEM
sublane reshapes/transposes, runs the same qkv -> normalize -> CxC
cross-covariance -> proj math, and writes the strip back. No HBM
intermediates at all.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref,
            *, TW: int, ws: int, C: int, eps: float):
    P = ws * ws
    x = x_ref[0]  # (ws, TW*ws, C)
    # window partition: (ws, TW, ws, C) -> (TW, ws, ws, C) -> (TW*P, C)
    t = x.reshape(ws, TW, ws, C).transpose(1, 0, 2, 3).reshape(TW * P, C)

    qkv = jnp.dot(t, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:]).reshape(TW, P, 3 * C)
    q = qkv[:, :, :C]
    k = qkv[:, :, C:2 * C]
    v = qkv[:, :, 2 * C:]

    def _norm(u):
        ss = jnp.sum(jnp.square(u), axis=-1, keepdims=True)
        zero = ss == 0
        n = jnp.sqrt(jnp.where(zero, 1.0, ss))
        n = jnp.where(zero, 0.0, n)
        return u / jnp.maximum(n, eps)

    qn, kn = _norm(q), _norm(k)
    attn = jax.lax.dot_general(
        qn, kn, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (TW, C, P)
    out = out.transpose(0, 2, 1).reshape(TW * P, C)
    proj = jnp.dot(out, wproj_ref[:], preferred_element_type=jnp.float32)
    proj = (proj + bproj_ref[:]).astype(o_ref.dtype)
    # un-window back to the strip layout
    strip = proj.reshape(TW, ws, ws, C).transpose(1, 0, 2, 3)
    o_ref[0] = strip.reshape(ws, TW * ws, C)


def window_channel_attention_inplace(x, wqkv, bqkv, wproj, bproj,
                                     *, window_size: int = 4,
                                     tile_windows: int = 32,
                                     eps: float = 1e-12):
    """Same math as LocalAttention; natural-layout I/O (no relayout)."""
    B, H, W, C = x.shape
    ws = window_size
    nh, nw = H // ws, W // ws
    TW = min(tile_windows, nw)
    while nw % TW:
        TW //= 2
    TW = max(TW, 1)
    grid = (B, nh, nw // TW)

    wqkv2 = wqkv.reshape(wqkv.shape[-2], wqkv.shape[-1])
    wproj2 = wproj.reshape(wproj.shape[-2], wproj.shape[-1])

    return pl.pallas_call(
        partial(_kernel, TW=TW, ws=ws, C=C, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, TW * ws, C), lambda b, i, j: (b, i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda b, i, j: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b, i, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, TW * ws, C),
                               lambda b, i, j: (b, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, wqkv2, bqkv, wproj2, bproj)
