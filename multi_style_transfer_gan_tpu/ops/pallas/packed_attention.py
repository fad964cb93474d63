"""Fused windowed channel attention on PACKED (s2d) layout — Pallas kernel.

Companion to ops/packed.py: with packing factor f == window_size == 4, one
packed pixel (a row of P*C = 16*C lanes) holds exactly one LocalAttention
window (enhanced_generator.py:6-47). This kernel computes the whole attention
block — qkv projection, zero-safe L2 normalize, C x C channel attention,
softmax, value application, output projection — for a tile of rows entirely
in VMEM, reading and writing only the lane-dense packed tensor. No window
relayout, no lane-padded intermediates (the XLA einsum formulation loses ~8x
HBM bandwidth to (..., C<128) intermediates).

Layout contract (matches ops.packed): row lanes are (phase, channel)-major,
phase = 4*pi + pj over the 4x4 window, so lane p*C + c is window position p,
channel c.

TPU mapping:
- qkv / proj run as single block-diagonal matmuls (kron(I_P, W)) — MXU work
  on >=256-wide operands instead of thousands of (16, C) slivers.
- the per-window C x C attention is pure VPU: static lane slices per phase
  and per query channel (P*C multiply-accumulates + C softmaxes per tile),
  batched over T rows in the sublane dimension.

Numerics match models.enhanced_generator.local_attention_apply: fp32
normalize/softmax/accumulation, zero-safe normalization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, gsum_ref,
            brep_ref, o_ref, *, P: int, C: int, eps: float):
    # Vectorized over query channels: the (C, C) per-window attention matrix
    # lives FLATTENED in the lane dim as C*C lanes (c1-major). Broadcasts
    # between (T, C) and (T, C*C) are pltpu.repeat (c1-major) / concat
    # (c2-minor); grouped softmax sums use a 0/1 (C*C, C) matmul. Everything
    # is a full-width VPU op or an MXU matmul — ~5 ops per phase instead of
    # the O(C*P) scalar-slice unrolling that blows up Mosaic compile time.
    x = x_ref[:]  # (T, P*C)
    qkv = jnp.dot(x, wqkv_ref[:].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:].astype(jnp.float32)  # (T, P*3C), phase-major

    def _norm(u):  # zero-safe unit L2 over the C lanes (fp32)
        ss = jnp.sum(u * u, axis=-1, keepdims=True)
        zero = ss == 0
        n = jnp.sqrt(jnp.where(zero, 1.0, ss))
        n = jnp.where(zero, 0.0, n)
        return u / jnp.maximum(n, eps)

    def _rep(u):   # (T, C) -> (T, C*C), value at lane c1*C+c2 = u[:, c1]
        # element repeat along lanes = one matmul with the 0/1 brep matrix
        # (pltpu.repeat has tile semantics, not np.repeat's)
        return jnp.dot(u, brep_ref[:], preferred_element_type=jnp.float32)

    def _tile(u):  # (T, C) -> (T, C*C), value at lane c1*C+c2 = u[:, c2]
        return pltpu.repeat(u, C, axis=1)

    qn, kn, vs = [], [], []
    for p in range(P):
        base = p * 3 * C
        qn.append(_norm(qkv[:, base:base + C]))
        kn.append(_norm(qkv[:, base + C:base + 2 * C]))
        vs.append(qkv[:, base + 2 * C:base + 3 * C])

    # logits[w, c1*C+c2] = sum_p qn[p][w, c1] * kn[p][w, c2]; |logits| <= P
    # (unit vectors), so exp() is fp32-safe without max subtraction.
    logits = _rep(qn[0]) * _tile(kn[0])
    for p in range(1, P):
        logits = logits + _rep(qn[p]) * _tile(kn[p])
    e = jnp.exp(logits)  # (T, C*C)
    den = jnp.dot(e, gsum_ref[:], preferred_element_type=jnp.float32)  # (T, C)
    attn = e / _rep(den)

    # out[w, p*C+c1] = sum_c2 attn[w, c1*C+c2] * v_p[w, c2]
    outs = [jnp.dot(attn * _tile(vs[p]), gsum_ref[:],
                    preferred_element_type=jnp.float32) for p in range(P)]
    out = jnp.concatenate(outs, axis=-1)  # (T, P*C)
    proj = jnp.dot(out.astype(x.dtype), wproj_ref[:].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    o_ref[:] = (proj + bproj_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def pack_attention_weights(wqkv, bqkv, wproj, bproj, *, P: int = 16):
    """Build block-diagonal (kron(I_P, W)) weights for the packed kernel.

    wqkv: (C, 3C) or (1, 1, C, 3C); wproj: (C, C) likewise. The qkv blocks
    are laid out phase-major: lanes p*3C..(p+1)*3C hold phase p's (q, k, v).
    """
    wqkv = wqkv.reshape(wqkv.shape[-2], wqkv.shape[-1])
    wproj = wproj.reshape(wproj.shape[-2], wproj.shape[-1])
    C = wqkv.shape[0]
    eyeP = jnp.eye(P, dtype=wqkv.dtype)
    wqkv_blk = jnp.einsum("pq,cd->pcqd", eyeP, wqkv).reshape(P * C, P * 3 * C)
    bqkv_blk = jnp.tile(bqkv, P)
    wproj_blk = jnp.einsum("pq,cd->pcqd", eyeP, wproj).reshape(P * C, P * C)
    bproj_blk = jnp.tile(bproj, P)
    return wqkv_blk, bqkv_blk, wproj_blk, bproj_blk


def packed_window_attention_pallas(x, wqkv_blk, bqkv_blk, wproj_blk,
                                   bproj_blk, *, C: int,
                                   tile_rows: int | None = None,
                                   eps: float = 1e-12):
    """Fused LocalAttention on a packed tensor.

    x: (B, Hp, Wp, P*C) with P = 16 (f = ws = 4); weights from
    :func:`pack_attention_weights`.
    """
    B, Hp, Wp, Cp = x.shape
    P = Cp // C
    R = B * Hp * Wp
    t = x.reshape(R, Cp)

    if tile_rows is None:
        tile_rows = 512 if C <= 32 else 64  # VMEM: logits tile is (T, C*C) f32
    T = min(tile_rows, R)
    while R % T:
        T //= 2
    T = max(T, 1)

    # grouped-sum matrix: gsum[c1*C+c2, c1] = 1 (softmax denominators and
    # per-query-channel value reduction run as one MXU matmul each);
    # brep = gsum^T broadcasts a (T, C) row back to c1-major (T, C*C) lanes
    gsum = jnp.repeat(jnp.eye(C, dtype=jnp.float32), C, axis=0)
    brep = gsum.T

    out = pl.pallas_call(
        partial(_kernel, P=P, C=C, eps=eps),
        grid=(R // T,),
        in_specs=[
            pl.BlockSpec((T, Cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, 3 * Cp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * Cp,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp, Cp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Cp,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C * C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, Cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, Cp), x.dtype),
    )(t, wqkv_blk, bqkv_blk, wproj_blk, bproj_blk, gsum, brep)
    return out.reshape(B, Hp, Wp, Cp)
