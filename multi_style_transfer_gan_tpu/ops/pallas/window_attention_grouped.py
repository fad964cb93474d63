"""Grouped windowed channel attention — Pallas TPU kernel (the "v5" try).

LocalAttention (reference enhanced_generator.py:6-47) computes a C x C
channel Gram per 4x4 window. All prior formulations are bound by MXU issue
rate on tiny matmuls: v1 issues one (C,P)x(P,C) dot per window (K=P=16,
M=N=C<=64 — a 128x128 MXU pass at <=1/8 utilization in every dimension),
and v4 proved the cost is the dots themselves, not grid/step overhead
(docs/PERFORMANCE.md).

This kernel changes the MATH LAYOUT instead: stack g = 128//C windows'
channel blocks ALONG LANES — tiles of shape (groups, P, g*C) whose minor
dim is exactly 128 — and compute ONE dense (gC, P)-contraction MXU pass
per GROUP: dot_general((G,P,gC),(G,P,gC)) contracting P gives a
(gC, gC) = (128, 128) tile whose diagonal C x C blocks are the g wanted
per-window Grams. The g^2 - g cross-window blocks are free (the MXU pass
produces a 128x128 tile regardless) and a multiplicative 0/1 block mask
zeroes them after exp, so the second dense pass — values x attn,
(P, gC) x (gC, gC) — applies each window's softmaxed Gram to its own
values and nothing else. Net: g x fewer MXU issues (8x at C=16, 4x at
C=32, 2x at C=64) for g x redundant qkv/proj FLOPs (block-diagonal
expanded weights, the v3 trick) — a good trade where lane sparsity, not
FLOPs, binds.

Why lanes and not sublanes: the sublane-stacked formulation needs a
(T, P*C) -> (T*P, C) lane-shrinking reshape that Mosaic rejects
("infer-vector-layout: unsupported shape cast", measured on real v5e).
In THIS layout every in-kernel reshape only folds/unfolds leading
(sublane) dims with the 128-lane minor dim untouched — all supported.
The (G, P, g*C) relayout itself happens in XLA outside the kernel
(one transpose pass each way), and the buffer is HBM-dense: minor dim
128, no lane padding at any C (a materialized (R*P, C) row buffer gets
lane-padded C->128 by XLA — measured 24 GB OOM at 512^2 x96).

Numerics match models.enhanced_generator._attention_math: same zero-safe
L2 normalize over channels, fp32 logits/exp/accumulation. Raw exp is safe
here exactly as in v3: logits are sums of P unit-vector dots, |logit| <= 16
(cross-window garbage included), and the reference softmax denominator is
recovered because masked rows sum only their own block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            mblk_ref, mblk_t_ref, o_ref,
            *, Gt: int, P: int, C: int, g: int, eps: float, mx):
    gC = g * C
    # (Gt, P, gC) -> (Gt*P, gC): leading-dim fold, 128-lane minor untouched.
    x = x_ref[:].reshape(Gt * P, gC)
    qkv = jnp.dot(x, wqkv_ref[:].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:]                       # (Gt*P, 3*gC) fp32
    q = qkv[:, :gC]
    k = qkv[:, gC:2 * gC]
    v = qkv[:, 2 * gC:]

    def _norm(u):  # zero-safe unit L2 over each window-block's C lanes
        ss = jnp.dot(u * u, mblk_ref[:],
                     preferred_element_type=jnp.float32)       # (Gt*P, g)
        inv = jnp.where(ss == 0, 0.0,
                        1.0 / jnp.maximum(jnp.sqrt(jnp.where(ss == 0, 1.0,
                                                             ss)), eps))
        return u * jnp.dot(inv, mblk_t_ref[:],
                           preferred_element_type=jnp.float32)

    # sublane unfolds (lane dim unchanged) back to (Gt, P, gC). The MXU
    # operands run at `mx` (bf16 for bf16 inputs: an fp32 MXU pass costs
    # several bf16 ones; accumulation stays fp32 via preferred_element_type,
    # and normalize/softmax math above/below stays fp32).
    qn = _norm(q).astype(mx).reshape(Gt, P, gC)
    kn = _norm(k).astype(mx).reshape(Gt, P, gC)
    v3 = v.astype(mx).reshape(Gt, P, gC)

    # ONE dense 128x128 MXU pass per group: contract over P. Diagonal
    # C x C blocks are the g per-window Grams; off-blocks are masked.
    logits = jax.lax.dot_general(
        qn, kn, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)       # (Gt, gC, gC)
    row_blk = jax.lax.broadcasted_iota(jnp.int32, (gC, gC), 0) // C
    col_blk = jax.lax.broadcasted_iota(jnp.int32, (gC, gC), 1) // C
    mask = (row_blk == col_blk).astype(jnp.float32)
    e = jnp.exp(logits) * mask[None]              # exact zeros off-block
    attn = e / jnp.sum(e, axis=-1, keepdims=True)  # per-window softmax

    # values x block-diagonal attn: out[i,p,j] = sum_j' v[i,p,j'] attn[i,j,j']
    out = jax.lax.dot_general(
        v3, attn.astype(mx), dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)       # (Gt, P, gC)
    proj = jnp.dot(out.reshape(Gt * P, gC).astype(mx),
                   wproj_ref[:].astype(mx),
                   preferred_element_type=jnp.float32)
    proj = (proj + bproj_ref[:]).astype(o_ref.dtype)
    o_ref[:] = proj.reshape(Gt, P, gC)


def _expand_weights(wqkv, bqkv, wproj, bproj, g: int, C: int):
    """Block-diagonal-by-window expansions + the block-reduce matrices."""
    wqkv = wqkv.reshape(C, 3 * C).astype(jnp.float32)
    wproj = wproj.reshape(C, C).astype(jnp.float32)
    eye_g = jnp.eye(g, dtype=jnp.float32)
    # (gC, 3gC): per-window (C,3C) blocks, output lanes regrouped (s, j, c)
    # so stream slices [:, s*gC:(s+1)*gC] keep the input's (j, c) lane order.
    big = jnp.einsum("jk,cd->jckd", eye_g, wqkv).reshape(g * C, g, 3, C)
    wqkv_big = big.transpose(0, 2, 1, 3).reshape(g * C, 3 * g * C)
    bqkv_big = jnp.concatenate(
        [jnp.tile(bqkv.astype(jnp.float32)[s * C:(s + 1) * C], g)
         for s in range(3)])
    wproj_big = jnp.einsum("jk,cd->jckd", eye_g, wproj).reshape(g * C, g * C)
    bproj_big = jnp.tile(bproj.astype(jnp.float32), g)
    mblk = jnp.repeat(jnp.eye(g, dtype=jnp.float32), C, axis=0)  # (gC, g)
    return wqkv_big, bqkv_big, wproj_big, bproj_big, mblk, mblk.T


def _mxu_dtype(x_dtype, internal_dtype):
    """MXU operand dtype for the gram/apply/proj passes: follow the input
    (bf16 inputs get bf16 passes with fp32 accumulation — the production
    pipeline's own precision; fp32 inputs keep exact fp32 passes, which is
    what the parity tests run)."""
    if internal_dtype is not None:
        return jnp.dtype(internal_dtype)
    return jnp.bfloat16 if x_dtype == jnp.bfloat16 else jnp.float32


def _run_grouped(s, expanded, *, P: int, C: int, g: int, eps: float,
                 tile_groups: int | None, interpret: bool,
                 internal_dtype=None):
    """Kernel launch on lane-stacked groups s: (G, P, g*C) -> same shape."""
    G = s.shape[0]
    mx = _mxu_dtype(s.dtype, internal_dtype)
    if tile_groups is None:
        # fp32 (Gt,128,128) logits + e dominate VMEM: 2 MB each at Gt=32,
        # comfortably inside the 16 MiB scoped limit with qkv + weights.
        tile_groups = 32
    Gt = min(tile_groups, G)
    while G % Gt:
        Gt -= 1
    grid = (G // Gt,)

    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel, Gt=Gt, P=P, C=C, g=g, eps=eps, mx=mx),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Gt, P, g * C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((g * C, 3 * g * C)),
            const((3 * g * C,)),
            const((g * C, g * C)),
            const((g * C,)),
            const((g * C, g)),
            const((g, g * C)),
        ],
        out_specs=pl.BlockSpec((Gt, P, g * C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, P, g * C), s.dtype),
        interpret=interpret,
    )(s, *expanded)


def packed_grouped_window_attention(x, wqkv, bqkv, wproj, bproj, *,
                                    C: int | None = None,
                                    tile_groups: int | None = None,
                                    eps: float = 1e-12,
                                    interpret: bool = False,
                                    internal_dtype=None):
    """Grouped-Gram kernel on an ALREADY-PACKED tensor (ops/packed.py layout).

    x: (B, Hp, Wp, P*C) with lane order (position, channel) — one packed
    pixel per LocalAttention window (P = ws^2 = 16). Unlike
    packed_window_attention_v3 this pays one XLA transpose each way to
    reach the lane-stacked (G, P, g*C) group layout; the chip A/B decides
    whether the g x fewer MXU issues buy that back.
    """
    wqkv = wqkv.reshape(wqkv.shape[-2], wqkv.shape[-1])
    wproj = wproj.reshape(wproj.shape[-2], wproj.shape[-1])
    if C is None:
        C = wqkv.shape[0]
    B, Hp, Wp, Cp = x.shape
    P = Cp // C
    g = 128 // C
    if g < 2 or 128 % C:
        raise ValueError(f"grouped kernel needs 128 % C == 0 and C <= 64, "
                         f"got C={C}")
    expanded = _expand_weights(wqkv, bqkv, wproj, bproj, g, C)

    if Wp % g == 0:  # g horizontally adjacent windows per group
        G = B * Hp * (Wp // g)
        s = x.reshape(B, Hp, Wp // g, g, P, C)
        s = s.transpose(0, 1, 2, 4, 3, 5).reshape(G, P, g * C)
        out = _run_grouped(s, expanded, P=P, C=C, g=g, eps=eps,
                           tile_groups=tile_groups, interpret=interpret,
                           internal_dtype=internal_dtype)
        out = out.reshape(B, Hp, Wp // g, P, g, C)
        out = out.transpose(0, 1, 2, 4, 3, 5)
        return out.reshape(B, Hp, Wp, Cp)

    R = B * Hp * Wp
    if R % g:
        raise ValueError(f"window count {R} not divisible by group size {g}")
    G = R // g
    s = x.reshape(G, g, P, C).transpose(0, 2, 1, 3).reshape(G, P, g * C)
    out = _run_grouped(s, expanded, P=P, C=C, g=g, eps=eps,
                       tile_groups=tile_groups, interpret=interpret,
                       internal_dtype=internal_dtype)
    out = out.reshape(G, P, g, C).transpose(0, 2, 1, 3)
    return out.reshape(B, Hp, Wp, Cp)


def grouped_window_channel_attention(x, wqkv, bqkv, wproj, bproj,
                                     *, window_size: int = 4,
                                     tile_groups: int | None = None,
                                     eps: float = 1e-12,
                                     interpret: bool = False,
                                     internal_dtype=None):
    """Drop-in replacement for local_attention_apply's math (C <= 64).

    Args:
      x: (B, H, W, C), H and W divisible by window_size, 128 % C == 0 and
         the total window count divisible by g = 128 // C.
      wqkv: (1, 1, C, 3C) or (C, 3C); wproj likewise.
    """
    B, H, W, C = x.shape
    ws = window_size
    P = ws * ws
    g = 128 // C
    if g < 2 or 128 % C:
        raise ValueError(f"grouped kernel needs 128 % C == 0 and C <= 64, "
                         f"got C={C}")
    nh, nw = H // ws, W // ws
    R = B * nh * nw
    if R % g:
        raise ValueError(f"window count {R} not divisible by group size {g}")
    G = R // g
    wqkv2 = wqkv.reshape(wqkv.shape[-2], wqkv.shape[-1])
    wproj2 = wproj.reshape(wproj.shape[-2], wproj.shape[-1])
    expanded = _expand_weights(wqkv2, bqkv, wproj2, bproj, g, C)

    # XLA relayout to lane-stacked groups: (G, P, g*C), minor dim 128 —
    # HBM-dense at every C (no lane padding). When g horizontally adjacent
    # windows form a group (nw % g == 0, true at every pipeline stage) the
    # relayout is ONE transpose pass — two chained transposes materialize
    # a second full-size intermediate (measured HBM OOM at 512^2 x96 fp32).
    if nw % g == 0:
        s = x.reshape(B, nh, ws, nw // g, g, ws, C)
        s = s.transpose(0, 1, 3, 2, 5, 4, 6).reshape(G, P, g * C)
        fold = ("adj", None)
    else:
        t = x.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
        s = t.reshape(G, g, P, C).transpose(0, 2, 1, 3).reshape(G, P, g * C)
        fold = ("raster", t.shape)

    out = _run_grouped(s, expanded, P=P, C=C, g=g, eps=eps,
                       tile_groups=tile_groups, interpret=interpret,
                       internal_dtype=internal_dtype)

    # inverse relayout back to NHWC
    if fold[0] == "adj":
        # (G, P, gC) dims = (b, wh, wg | i, j | jw, c) -> x order
        # (b, wh, i, wg, jw, j, c)
        out = out.reshape(B, nh, nw // g, ws, ws, g, C)
        out = out.transpose(0, 1, 3, 2, 5, 4, 6)
    else:
        out = out.reshape(G, P, g, C).transpose(0, 2, 1, 3)
        out = out.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, C)
