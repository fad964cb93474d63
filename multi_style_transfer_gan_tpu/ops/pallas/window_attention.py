"""Fused windowed channel attention — Pallas TPU kernel.

The EnhancedGenerator's LocalAttention (enhanced_generator.py:6-47) is the
model's hottest op (ablation: ~42% of forward time at 512^2) and is badly
served by stock XLA: per 4x4 window it computes a (C x ws^2) x (ws^2 x C)
cross-covariance — thousands of tiny batched matmuls with ws^2=16
contraction depth, each padded up to MXU tiles, with HBM round-trips
between qkv projection, normalization, attention, and output projection.

This kernel processes a tile of T windows per grid step entirely in VMEM:

    x_tile (T*16, C)  --MXU-->  qkv (T*16, 3C)
    L2-normalize q, k over C (VPU)
    attn[w] = softmax(qn[w]^T kn[w])      (T batched (C,16)x(16,C) dots)
    out[w]  = attn[w] @ v[w]^T            (T batched (C,C)x(C,16) dots)
    out (T*16, C)     --MXU-->  proj      (T*16, C)

so the only HBM traffic is one read of x and one write of the result (plus
the window-major relayout done by the XLA caller, which fuses with the
surrounding ops). Numerics match models.enhanced_generator.local_attention_apply
exactly (same zero-safe normalize, fp32 softmax).

The caller (``fused_window_channel_attention``) takes NHWC input, does the
window-major relayout, invokes the kernel over a 1-D grid of window tiles,
and restores the layout.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref,
            *, T: int, P: int, C: int, eps: float, mx):
    # I/O is (T*P, C) row-major over windows. Notes on Mosaic constraints:
    # - splitting the LANE dim in-kernel ((T, P*C) -> (T*P, C)) is
    #   unsupported ("infer-vector-layout: unsupported shape"); the
    #   window-major relayout therefore happens in XLA, at the cost of lane
    #   padding of the (N, C) HBM buffers for C < 128;
    # - batched dot_general over T windows unrolls per window, which caps T
    #   at ~64 before the compiler blows up and leaves the grid dominated by
    #   per-step overhead. The ws^2=16-deep contractions are instead
    #   unrolled over the window POSITION axis as P broadcasted VPU
    #   multiply-accumulates on (T, C, C) tiles — T can then be thousands.
    x = x_ref[:]
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:]
    qkv = qkv.reshape(T, P, 3 * C)
    q = qkv[:, :, :C]
    k = qkv[:, :, C:2 * C]
    v = qkv[:, :, 2 * C:]

    def _norm(u):
        ss = jnp.sum(jnp.square(u), axis=-1, keepdims=True)
        zero = ss == 0
        n = jnp.sqrt(jnp.where(zero, 1.0, ss))
        n = jnp.where(zero, 0.0, n)
        return u / jnp.maximum(n, eps)

    # MXU operands at `mx` (bf16 for bf16 inputs; fp32 accumulation via
    # preferred_element_type; normalize/softmax stay fp32) — an fp32 MXU
    # pass costs several bf16 ones.
    qn = _norm(q).astype(mx)
    kn = _norm(k).astype(mx)
    # (T, C, C) batched cross-covariance. A P-unrolled VPU outer-product
    # formulation (to allow much larger T) was tried and crashes the Mosaic
    # compiler at useful tile sizes; the batched dots below compile
    # reliably with T<=64.
    attn = jax.lax.dot_general(
        qn, kn, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jax.lax.dot_general(
        attn.astype(mx), v.astype(mx),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (T, C, P)
    out = out.transpose(0, 2, 1).reshape(T * P, C)
    proj = jnp.dot(out.astype(x.dtype), wproj_ref[:],
                   preferred_element_type=jnp.float32)
    o_ref[:] = (proj + bproj_ref[:]).astype(o_ref.dtype)


def fused_window_channel_attention(x, wqkv, bqkv, wproj, bproj,
                                   *, window_size: int = 4,
                                   tile_windows: int | None = None,
                                   eps: float = 1e-12,
                                   internal_dtype=None):
    """Drop-in replacement for local_attention_apply's math.

    Args:
      x: (B, H, W, C), H and W divisible by window_size.
      wqkv: (1, 1, C, 3C) or (C, 3C); wproj likewise.
    """
    B, H, W, C = x.shape
    ws = window_size
    P = ws * ws
    nh, nw = H // ws, W // ws
    n_windows = B * nh * nw
    wqkv2 = wqkv.reshape(wqkv.shape[-2], wqkv.shape[-1])
    wproj2 = wproj.reshape(wproj.shape[-2], wproj.shape[-1])

    # window-major relayout (see kernel docstring for the layout tradeoff)
    t = x.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
    t = t.reshape(n_windows * P, C)

    if tile_windows is None:
        tile_windows = 64  # batched in-kernel dots cap out around here
    T = min(tile_windows, n_windows)
    while n_windows % T:
        T //= 2
    T = max(T, 1)
    grid = (n_windows // T,)

    from .window_attention_grouped import _mxu_dtype
    mx = _mxu_dtype(x.dtype, internal_dtype)

    out = pl.pallas_call(
        partial(_kernel, T=T, P=P, C=C, eps=eps, mx=mx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T * P, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T * P, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_windows * P, C), x.dtype),
    )(t, wqkv2, bqkv, wproj2, bproj)

    out = out.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, C)
