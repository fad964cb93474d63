"""Windowed channel attention, v4 — chunk-looped per-window kernel.

Diagnosis behind this kernel (docs/PERFORMANCE.md "Next" #2): the v1
per-window kernel's batched (C,P)x(P,C) dots cap at ~64 windows per grid
step (batched dot_general unrolls per window and the Mosaic compiler blows
up past that), so at 256^2 C=32 x96 the launch runs ~6k grid steps and
per-step overhead — not FLOPs, not HBM — dominates its 51 ms.

v4 keeps v1's proven 64-window body but wraps it in an in-kernel
``lax.fori_loop`` over chunks: the body compiles ONCE, dynamic
sublane-offset loads/stores walk the VMEM tile, and one grid step handles
``chunk_windows x num_chunks`` windows. Step count drops ~8-16x at the same
unroll size.

Same math as local_attention_apply (enhanced_generator.py:6-47 in the
reference: per-window C x C Gram of zero-safe L2-normalized q/k, softmax
over c2, applied to v, then the 1x1 output projection): fp32
normalize/softmax/accumulation; NHWC entry (window-major relayout in XLA,
fuses with neighbours).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, o_ref,
            *, Tc: int, num_chunks: int, P: int, C: int, eps: float):
    rows = Tc * P

    def body(i, carry):
        xc = x_ref[pl.dslice(i * rows, rows), :]
        qkv = jnp.dot(xc, wqkv_ref[:], preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[:]).reshape(Tc, P, 3 * C)
        q = qkv[:, :, :C]
        k = qkv[:, :, C:2 * C]
        v = qkv[:, :, 2 * C:]

        def _norm(u):  # zero-safe unit L2 over channels per position
            ss = jnp.sum(jnp.square(u), axis=-1, keepdims=True)
            zero = ss == 0
            n = jnp.sqrt(jnp.where(zero, 1.0, ss))
            n = jnp.where(zero, 0.0, n)
            return u / jnp.maximum(n, eps)

        qn = _norm(q)
        kn = _norm(k)
        attn = jax.lax.dot_general(
            qn, kn, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)               # (Tc, C, C)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jax.lax.dot_general(
            attn, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)               # (Tc, C, P)
        out = out.transpose(0, 2, 1).reshape(rows, C)
        proj = jnp.dot(out.astype(x_ref.dtype), wproj_ref[:],
                       preferred_element_type=jnp.float32)
        o_ref[pl.dslice(i * rows, rows), :] = (
            proj + bproj_ref[:]).astype(o_ref.dtype)
        return carry

    jax.lax.fori_loop(0, num_chunks, body, 0)


def window_attention_v4(x, wqkv, bqkv, wproj, bproj, *,
                        window_size: int = 4,
                        chunk_windows: int = 64,
                        num_chunks: int = 8,
                        eps: float = 1e-12,
                        interpret: bool = False):
    """Drop-in for local_attention_apply's math; NHWC in/out.

    x: (B, H, W, C), H and W divisible by window_size. One grid step
    processes ``chunk_windows * num_chunks`` windows; the total window count
    must divide evenly after clamping (handled below by shrinking the step).
    """
    B, H, W, C = x.shape
    ws = window_size
    P = ws * ws
    nh, nw = H // ws, W // ws
    n_windows = B * nh * nw
    wqkv2 = wqkv.reshape(wqkv.shape[-2], wqkv.shape[-1]).astype(x.dtype)
    wproj2 = wproj.reshape(wproj.shape[-2], wproj.shape[-1]).astype(x.dtype)

    t = x.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
    t = t.reshape(n_windows * P, C)

    Tc = min(chunk_windows, n_windows)
    while n_windows % Tc:
        Tc //= 2
    nc = num_chunks
    while (n_windows // Tc) % nc:
        nc //= 2
    step_rows = Tc * nc * P

    out = pl.pallas_call(
        partial(_kernel, Tc=Tc, num_chunks=nc, P=P, C=C, eps=eps),
        grid=(n_windows * P // step_rows,),
        in_specs=[
            pl.BlockSpec((step_rows, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda i: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((step_rows, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_windows * P, C), x.dtype),
        interpret=interpret,
    )(t, wqkv2, jnp.asarray(bqkv, jnp.float32), wproj2,
      jnp.asarray(bproj, jnp.float32))

    out = out.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, C)
