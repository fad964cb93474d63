"""Windowed channel attention, v3 — packed-row Pallas kernel (the 512^2 fix).

LocalAttention (reference: enhanced_generator.py:6-47) at the generator's
full-resolution stages runs at tiny channel width (C=16 at 512^2, C=32 at
256^2). The v1 kernel (window_attention.py) lays windows out as (T*16, C)
rows and batches (C,16)x(16,C) dots over T<=64 windows per grid step — at
512^2 that is ~24.6k grid steps of lane-sparse (C/128) work, measured at
~140 ms for a 96-image batch, 36% of the whole forward.

v3 instead uses the space-to-depth packed layout (ops/packed.py): one row of
P*C lanes per window (P = ws^2 = 16, position-major), so a (T, P*C) tile is
lane-dense for C >= 8 and T can be hundreds. The per-window math becomes:

  qkv   : ONE dense (T, P*C) x (P*C, 3*P*C) MXU matmul against a
          block-diagonal-by-position expansion of the (C, 3C) weight.
          16x redundant FLOPs vs the minimal math, but the MXU runs dense
          instead of at C/128 utilization — bandwidth, not FLOPs, is the
          binding constraint at these shapes.
  norm  : grouped sum-of-squares over each position's C lanes via a 0/1
          (P*C, P) matmul, zero-safe rsqrt, broadcast back via its
          transpose (matches the reference's zero-safe F.normalize).
  logits: attention matrix FLATTENED to C*C lanes (c1-major):
          logits += rep(qn_p) * tile(kn_p) per position — P VPU
          multiply-adds on (T, C*C); rep and tile are 0/1 matmuls
          (see the in-kernel note for why the cheaper-looking
          alternatives don't work on real Mosaic).
  smax  : exp (safe: logits are sums of P unit dots, |logit| <= P), group
          denominator via a 0/1 (C*C, C) matmul, divide.
  out   : o_p = (attn * tile(v_p)) @ (Msum @ Wproj) per position, concat —
          the output projection rides the group-reduction matmul for free.

The only HBM traffic is one read of x and one write of the result; all the
0/1 matrices and expanded weights have constant index maps so Mosaic keeps
them VMEM-resident across grid steps. For C=16 the expanded weights total
<1 MB bf16.

Two entry points: `window_attention_v3` takes NHWC input and does the
s2d/d2s relayout in XLA (fuses with neighbors); `packed_window_attention_v3`
takes an already-packed tensor (ops/packed.py layout — the packed inference
engine calls this, no relayout at all). Numerics match
`local_attention_apply` (fp32 normalize/softmax/accumulation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, bproj_ref,
            mpos_ref, mpos_t_ref, brep_ref, btile_ref, msum_ref,
            msumproj_ref, o_ref, *, P: int, C: int, eps: float, mx):
    x = x_ref[:]  # (T, P*C) packed rows, position-major lanes
    qkv = jnp.dot(x, wqkv_ref[:].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    qkv = qkv + bqkv_ref[:]                      # (T, 3*P*C) fp32
    PC = P * C
    q = qkv[:, :PC]
    k = qkv[:, PC:2 * PC]
    v = qkv[:, 2 * PC:].astype(mx)

    def _norm(u):  # zero-safe unit L2 over each position's C lanes
        ss = jnp.dot(u * u, mpos_ref[:],
                     preferred_element_type=jnp.float32)      # (T, P)
        inv = jnp.where(ss == 0, 0.0,
                        1.0 / jnp.maximum(jnp.sqrt(jnp.where(ss == 0, 1.0,
                                                             ss)), eps))
        return u * jnp.dot(inv, mpos_t_ref[:],
                           preferred_element_type=jnp.float32)

    # MXU operands run at `mx` (bf16 for bf16 inputs — an fp32 MXU pass
    # costs several bf16 ones and ~60 of the matmuls below were fp32);
    # accumulation stays fp32 via preferred_element_type, and the
    # normalize/exp/denominator math stays fp32.
    qn = _norm(q).astype(mx)
    kn = _norm(k).astype(mx)
    brep = brep_ref[:].astype(mx)    # 0/1 matrices: exact at any dtype
    btile = btile_ref[:].astype(mx)
    msumproj = msumproj_ref[:].astype(mx)

    # Lane broadcasts between (T, C) and (T, C*C), c1-major — 0/1 matmuls.
    # Implementation notes from real-hardware A/Bs (interpret mode passes
    # all three candidates, only this one is also correct AND compiles):
    # - pltpu.repeat on sub-128-lane blocks MISCOMPILES on Mosaic (whole-
    #   model output off by ~1e0) — never use it here;
    # - broadcast-to-3D + reshape fails to compile ("infer-vector-layout:
    #   unsupported shape cast" on (T, C, C) -> (T, C*C));
    # - these K=C contractions are MXU-starved (~13 ms/forward at C=16),
    #   and fusing positions doesn't help: padding K with zeros costs
    #   exactly the utilization it buys. This bounds v3 to C <= 16 wins.
    def _rep(u):   # (T, C) -> (T, C*C): lane c1*C+c2 = u[:, c1]
        return jnp.dot(u.astype(mx), brep,
                       preferred_element_type=jnp.float32)

    def _tile(u):  # (T, C) -> (T, C*C): lane c1*C+c2 = u[:, c2]
        return jnp.dot(u.astype(mx), btile,
                       preferred_element_type=jnp.float32)

    logits = _rep(qn[:, :C]) * _tile(kn[:, :C])
    for p in range(1, P):
        logits += _rep(qn[:, p * C:(p + 1) * C]) * _tile(kn[:, p * C:
                                                            (p + 1) * C])
    e = jnp.exp(logits)                                       # (T, C*C)
    den = jnp.dot(e, msum_ref[:], preferred_element_type=jnp.float32)
    attn = e * _rep(1.0 / den)

    # the per-window output projection is FOLDED into the group reduction:
    # proj(o)_[p,c] = sum_c1 o_p[c1] Wproj[c1,c] and o_p = (attn*tile(v_p))
    # @ msum, so one matmul against msumproj = msum @ Wproj does both — this
    # deletes the 16x-redundant (T, P*C) x (P*C, P*C) block-diagonal proj
    # matmul entirely. Bias is added per position in fp32 and each piece is
    # cast before the concat: concatenating P fp32 (T, C) pieces measured
    # ~25% slower than bf16 pieces (register/relayout pressure).
    outs = []
    for p in range(P):
        o_p = jnp.dot((attn * _tile(v[:, p * C:(p + 1) * C])).astype(mx),
                      msumproj,
                      preferred_element_type=jnp.float32)     # (T, C)
        outs.append((o_p + bproj_ref[p * C:(p + 1) * C]).astype(o_ref.dtype))
    o_ref[:] = jnp.concatenate(outs, axis=-1)                 # (T, P*C)


def _expand_weights(wqkv, bqkv, wproj, bproj, P: int, C: int):
    """Block-diagonal-by-position expansions + the 0/1 helper matrices."""
    wqkv = wqkv.reshape(C, 3 * C).astype(jnp.float32)
    wproj = wproj.reshape(C, C).astype(jnp.float32)
    eye_p = jnp.eye(P, dtype=jnp.float32)
    # (P*C, P*3C) with per-position blocks, then regroup lanes so the three
    # (q, k, v) streams are contiguous: lane order (s, p, c).
    big = jnp.einsum("pq,cd->pcqd", eye_p, wqkv).reshape(P * C, P, 3, C)
    wqkv_big = big.transpose(0, 2, 1, 3).reshape(P * C, 3 * P * C)
    bqkv_big = jnp.concatenate(
        [jnp.tile(bqkv.astype(jnp.float32)[s * C:(s + 1) * C], P)
         for s in range(3)])
    bproj_big = jnp.tile(bproj.astype(jnp.float32), P)

    mpos = jnp.repeat(jnp.eye(P, dtype=jnp.float32), C, axis=0)  # (P*C, P)
    mpos_t = mpos.T                                              # (P, P*C)
    brep = jnp.repeat(jnp.eye(C, dtype=jnp.float32), C, axis=1)  # (C, C*C)
    btile = jnp.tile(jnp.eye(C, dtype=jnp.float32), (1, C))      # (C, C*C)
    msum = jnp.repeat(jnp.eye(C, dtype=jnp.float32), C, axis=0)  # (C*C, C)
    msumproj = jnp.dot(msum, wproj)                              # (C*C, C)
    return (wqkv_big, bqkv_big, bproj_big,
            mpos, mpos_t, brep, btile, msum, msumproj)


def _run_packed_rows(t, wqkv, bqkv, wproj, bproj, *, P: int, C: int,
                     tile_rows: int | None, eps: float, interpret: bool,
                     internal_dtype=None):
    """Kernel launch on (R, P*C) packed rows; returns (R, P*C)."""
    from .window_attention_grouped import _mxu_dtype

    R = t.shape[0]
    mx = _mxu_dtype(t.dtype, internal_dtype)
    expanded = _expand_weights(wqkv, bqkv, wproj, bproj, P, C)

    if tile_rows is None:
        # T=512 fastest at C=16 (62.2 vs 63.5 ms at T=256); C=32 tiles are
        # 4x bigger per row and T=256 exceeds VMEM (Mosaic rejects the
        # compile) — T=128 is the largest that builds.
        tile_rows = 512 if C <= 16 else 128
    T = min(tile_rows, R)
    while R % T:
        T //= 2
    T = max(T, 1)

    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, P=P, C=C, eps=eps, mx=mx),
        grid=(R // T,),
        in_specs=[
            pl.BlockSpec((T, P * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const((P * C, 3 * P * C)),
            const((3 * P * C,)),
            const((P * C,)),
            const((P * C, P)),
            const((P, P * C)),
            const((C, C * C)),
            const((C, C * C)),
            const((C * C, C)),
            const((C * C, C)),
        ],
        out_specs=pl.BlockSpec((T, P * C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, P * C), t.dtype),
        interpret=interpret,
    )(t, *expanded)
    return out


def window_attention_v3(x, wqkv, bqkv, wproj, bproj, *,
                        window_size: int = 4,
                        tile_rows: int | None = None,
                        eps: float = 1e-12,
                        interpret: bool = False,
                        internal_dtype=None):
    """Drop-in for local_attention_apply's math; NHWC in/out.

    x: (B, H, W, C) with H, W divisible by window_size. Designed for the
    small-C full-resolution stages (C <= 16, where v1's lane sparsity is
    worst); for larger C the flattened C*C lane dim grows quadratically
    and v1 wins (TPU A/B at batch 96: C=16 512^2 62 ms vs v1's 143 ms;
    C=32 256^2 57 ms vs v1's 51 ms).
    """
    B, H, W, C = x.shape
    ws = window_size
    P = ws * ws
    nh, nw = H // ws, W // ws
    R = B * nh * nw

    # space-to-depth: one packed row per window, position-major lanes
    t = x.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
    t = t.reshape(R, P * C)
    out = _run_packed_rows(t, wqkv, bqkv, wproj, bproj, P=P, C=C,
                           tile_rows=tile_rows, eps=eps, interpret=interpret,
                           internal_dtype=internal_dtype)
    out = out.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, C)


def packed_window_attention_v3(x, wqkv, bqkv, wproj, bproj, *,
                               tile_rows: int | None = None,
                               eps: float = 1e-12,
                               C: int | None = None,
                               interpret: bool = False,
                               internal_dtype=None):
    """v3 kernel on an ALREADY-PACKED tensor (ops/packed.py layout).

    x: (B, Hp, Wp, P*C) with lane order (position, channel) — exactly
    space_to_depth's (phase_i, phase_j, c) order with P = ws^2 = 16, so one
    packed pixel is one LocalAttention window and no relayout is needed.
    wqkv/wproj are the ORIGINAL (C, 3C)/(C, C) matrices (1x1-conv shapes
    accepted). TPU A/B at batch 96 (shared v5e): 512^2 C=16 62 ms vs 143 ms
    for the per-window kernel; at C = 32 the NHWC v1 kernel edges it out
    (51 vs 57 ms) and for C >= 64 the expanded block-diagonal weights
    outgrow VMEM. Dispatch: the NHWC fast path uses this for C <= 16 only;
    the packed engine uses it through C = 32, where leaving the packed
    layout for v1 would cost the relayout this kernel exists to avoid.
    """
    wqkv = wqkv.reshape(wqkv.shape[-2], wqkv.shape[-1])
    wproj = wproj.reshape(wproj.shape[-2], wproj.shape[-1])
    if C is None:
        C = wqkv.shape[0]
    B, Hp, Wp, Cp = x.shape
    P = Cp // C
    R = B * Hp * Wp
    out = _run_packed_rows(x.reshape(R, Cp), wqkv, bqkv, wproj, bproj,
                           P=P, C=C, tile_rows=tile_rows, eps=eps,
                           interpret=interpret, internal_dtype=internal_dtype)
    return out.reshape(B, Hp, Wp, Cp)
