"""Fused windowed channel attention on PACKED (s2d) layout — Pallas kernel.

Companion to ops/packed.py: with packing factor f == window_size == 4, one
packed pixel (a row of P*C = 16*C lanes) holds exactly one LocalAttention
window (enhanced_generator.py:6-47). This kernel computes the whole attention
block — qkv projection, zero-safe L2 normalize, C x C channel attention,
softmax, value application, output projection — for a tile of rows entirely
in VMEM, reading and writing only the lane-dense packed tensor. No window
relayout, no lane-padded intermediates.

Status: numerically verified (tests/test_pallas.py) and compiled for the
deployed C in {16, 32, 64}; on the current shared-tunnel v5e chip the
many-small-matmul structure measures slower than the XLA einsum formulation
(ops/packed.packed_window_channel_attention), so the packed forward defaults
to fast_attention=False. Measurement on this deployment is noisy (the chip is
time-shared; throughput swings ~6x between runs), so revisit with stable
hardware before trusting either direction.

Layout contract (matches ops.packed): row lanes are (phase, channel)-major,
phase = 4*pi + pj over the 4x4 window, so lane p*C + c is window position p,
channel c.

TPU mapping:
- qkv / proj are P small per-phase matmuls on lane slices — the weights stay
  the original (C, 3C)/(C, C) matrices (tens of KB resident in VMEM; an
  earlier block-diagonal kron(I_P, W) variant re-DMA'd MBs of weights every
  grid step and was ~10x slower than the einsum path).
- the per-window C x C attention is vectorized over query channels: the
  attention matrix lives FLATTENED in the lane dim as C*C lanes (c1-major).
  Broadcasts between (T, C) and (T, C*C) are 0/1 (C, C*C) matmuls (c2-minor
  tile and c1-major element repeat — pltpu.repeat on sub-128-lane blocks
  miscompiles on real Mosaic, interpret mode is fine); the grouped softmax
  denominator and the value reduction are one (T, C*C) x (C*C, C) MXU matmul
  each. ~6 vector/matrix ops per phase — no O(P*C) scalar-slice unrolling
  (which blows up Mosaic compile time).

Numerics match models.enhanced_generator.local_attention_apply: fp32
normalize/softmax/accumulation, zero-safe normalization. exp() runs without
max subtraction — logits are sums of P unit-vector dots, so |logit| <= 16
and fp32 exp is exact-safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, gsum_ref,
            brep_ref, btile_ref, o_ref, *, P: int, C: int, eps: float):
    x = x_ref[:]  # (T, P*C)
    wqkv = wqkv_ref[:].astype(x.dtype)
    bqkv = bqkv_ref[:].astype(jnp.float32)

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
        # 0/1 matmul, NOT pltpu.repeat: repeat on a (T, C) block with C < 128
        # (sub-lane-tile) miscompiles on real Mosaic (interpret mode is fine).
        return jnp.dot(u, btile_ref[:], preferred_element_type=jnp.float32)

    qn, kn, vs = [], [], []
    for p in range(P):
        qkv_p = jnp.dot(x[:, p * C:(p + 1) * C], wqkv,
                        preferred_element_type=jnp.float32) + bqkv  # (T, 3C)
        qn.append(_norm(qkv_p[:, :C]))
        kn.append(_norm(qkv_p[:, C:2 * C]))
        vs.append(qkv_p[:, 2 * C:])

    # logits[w, c1*C+c2] = sum_p qn[p][w, c1] * kn[p][w, c2]
    logits = _rep(qn[0]) * _tile(kn[0])
    for p in range(1, P):
        logits = logits + _rep(qn[p]) * _tile(kn[p])
    e = jnp.exp(logits)  # (T, C*C)
    den = jnp.dot(e, gsum_ref[:], preferred_element_type=jnp.float32)
    attn = e / _rep(den)

    # out[w, p*C+c1] = sum_c2 attn[w, c1*C+c2] * v_p[w, c2], then proj
    wproj = wproj_ref[:].astype(x.dtype)
    bproj = bproj_ref[:].astype(jnp.float32)
    outs = []
    for p in range(P):
        o_p = jnp.dot(attn * _tile(vs[p]), gsum_ref[:],
                      preferred_element_type=jnp.float32)  # (T, C)
        outs.append(jnp.dot(o_p.astype(x.dtype), wproj,
                            preferred_element_type=jnp.float32) + bproj)
    o_ref[:] = jnp.concatenate(outs, axis=-1).astype(o_ref.dtype)


def packed_window_attention_pallas(x, wqkv, bqkv, wproj, bproj, *,
                                   tile_rows: int | None = None,
                                   eps: float = 1e-12,
                                   C: int | None = None):
    """Fused LocalAttention on a packed tensor.

    x: (B, Hp, Wp, P*C) with P = 16 (f = ws = 4); wqkv: (C, 3C) or
    (1, 1, C, 3C); wproj: (C, C) likewise — the ORIGINAL (unpacked) weights.
    """
    wqkv = wqkv.reshape(wqkv.shape[-2], wqkv.shape[-1])
    wproj = wproj.reshape(wproj.shape[-2], wproj.shape[-1])
    if C is None:
        C = wqkv.shape[0]
    B, Hp, Wp, Cp = x.shape
    P = Cp // C
    R = B * Hp * Wp
    t = x.reshape(R, Cp)

    if tile_rows is None:
        # VMEM: the logits tile is (T, C*C) fp32; Mosaic also rejects larger
        # tiles at C=32 (remote-compile failure), hence conservative sizes.
        tile_rows = {16: 512, 32: 128}.get(C, 64) if C <= 64 else 32
    T = min(tile_rows, R)
    while R % T:
        T //= 2
    T = max(T, 1)

    # grouped-sum matrix: gsum[c1*C+c2, c1] = 1 (softmax denominators and
    # per-query-channel value reduction run as one MXU matmul each);
    # brep = gsum^T broadcasts a (T, C) row back to c1-major (T, C*C) lanes
    gsum = jnp.repeat(jnp.eye(C, dtype=jnp.float32), C, axis=0)
    brep = gsum.T
    btile = jnp.tile(jnp.eye(C, dtype=jnp.float32), (1, C))  # (C, C*C)

    out = pl.pallas_call(
        partial(_kernel, P=P, C=C, eps=eps),
        grid=(R // T,),
        in_specs=[
            pl.BlockSpec((T, Cp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 3 * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C * C, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C * C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, Cp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, Cp), x.dtype),
    )(t, wqkv, bqkv, wproj, bproj, gsum, brep, btile)
    return out.reshape(B, Hp, Wp, Cp)
