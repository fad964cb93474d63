"""Windowed channel attention with HAND-WRITTEN Pallas backward kernels.

Round-1 measured the fused-forward + XLA-vjp-backward training path at
0.89-0.95x the pure-XLA step: the custom backward recomputed the XLA
forward, so the fast forward was strictly added work (docs/PERFORMANCE.md).
This module gives the training path a real kernel gradient.

Design: the differentiable surface is the windowed MID only —

    normalize -> per-window C x C Gram -> softmax -> apply-to-values

computed in the grouped lane-stacked layout of window_attention_grouped.py
(g = 128 // C windows per dense 128-wide MXU pass, block-diagonal mask).
The 1x1 qkv/proj convs and the group relayouts stay OUTSIDE the
custom_vjp, in XLA, so their gradients (dx, dW, db) come from autodiff —
the hand-written part is exactly the part XLA does badly (tiny per-window
Grams), forward AND backward.

Backward math per window (derived from the reference ordering,
enhanced_generator.py:13-47; all dense per group here):

    dS    = dO^T v                      (one (P,gC)x(P,gC) pass)
    dLgt  = S (.) (dS - rowsum(S (.) dS))    (masked softmax backward)
    dqn   = kn dLgt^T ;  dkn = qn dLgt       (two dense passes)
    dv    = dO S                              (one dense pass)
    dq    = (dqn - qn <qn, dqn>_block) / max(||q||, eps)   (and dk alike)

The L2-norm backward matches jax's gradient of core.norm.l2_normalize
exactly, including the eps clamp and the zero-vector guard.

Numerics: fp32 logits/softmax/accumulation in both kernels; on bf16
inputs the MXU OPERANDS run bf16 (fp32 accumulation — round 3: the fp32
operand passes cost several bf16 MXU passes each and bound the kernels),
matching the bf16 compute precision of training itself. fp32 inputs keep
exact fp32 passes; gradient parity vs the XLA formulation is pinned by
tests/test_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core import conv2d


# ---------------------------------------------------------------------------
# group relayout (shared by fwd/bwd; same scheme as window_attention_grouped)
# ---------------------------------------------------------------------------

def _group_geometry(B, H, W, C, ws):
    P = ws * ws
    if 128 % C or C > 64:
        return None
    g = 128 // C
    nh, nw = H // ws, W // ws
    R = B * nh * nw
    if R % g:
        return None
    return P, g, nh, nw, R // g


def _to_groups(t, ws, g):
    """(B, H, W, C) -> (G, P, g*C); one transpose when nw % g == 0."""
    B, H, W, C = t.shape
    nh, nw = H // ws, W // ws
    G = B * nh * nw // g
    if nw % g == 0:
        s = t.reshape(B, nh, ws, nw // g, g, ws, C)
        return s.transpose(0, 1, 3, 2, 5, 4, 6).reshape(G, ws * ws, g * C)
    s = t.reshape(B, nh, ws, nw, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return s.reshape(G, g, ws * ws, C).transpose(0, 2, 1, 3).reshape(
        G, ws * ws, g * C)


def _from_groups(s, B, H, W, C, ws, g):
    nh, nw = H // ws, W // ws
    if nw % g == 0:
        out = s.reshape(B, nh, nw // g, ws, ws, g, C)
        out = out.transpose(0, 1, 3, 2, 5, 4, 6)
        return out.reshape(B, H, W, C)
    G = s.shape[0]
    out = s.reshape(G, ws * ws, g, C).transpose(0, 2, 1, 3)
    out = out.reshape(B, nh, nw, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _norm_fwd(u, mblk, mblk_t, eps):
    """Returns (qn, inv, sel): unit vectors, the 1/max(n,eps) divisor and
    the projection selector — all needed again in the backward."""
    ss = jnp.dot(u * u, mblk, preferred_element_type=jnp.float32)
    nz = ss > 0
    n = jnp.sqrt(jnp.where(nz, ss, 1.0))
    m = jnp.where(nz, jnp.maximum(n, eps), eps)
    inv = 1.0 / m
    sel = (nz & (n > eps)).astype(jnp.float32)
    bcast = lambda a: jnp.dot(a, mblk_t, preferred_element_type=jnp.float32)
    return u * bcast(inv), bcast(inv), bcast(sel)


def _block_mask(gC, C):
    row = jax.lax.broadcasted_iota(jnp.int32, (gC, gC), 0) // C
    col = jax.lax.broadcasted_iota(jnp.int32, (gC, gC), 1) // C
    return (row == col).astype(jnp.float32)


def _mid_fwd_kernel(q_ref, k_ref, v_ref, mblk_ref, mblk_t_ref, o_ref,
                    *, Gt: int, P: int, C: int, g: int, eps: float, mx):
    gC = g * C
    q = q_ref[:].astype(jnp.float32).reshape(Gt * P, gC)
    k = k_ref[:].astype(jnp.float32).reshape(Gt * P, gC)
    # MXU operands at `mx` (bf16 for bf16 inputs, fp32 accumulation via
    # preferred_element_type; normalize/softmax stay fp32 — same scheme as
    # window_attention_grouped, where an fp32 MXU pass costs several bf16
    # ones). fp32 inputs keep exact fp32 passes.
    v = v_ref[:].astype(mx).reshape(Gt, P, gC)
    qn, _, _ = _norm_fwd(q, mblk_ref[:], mblk_t_ref[:], eps)
    kn, _, _ = _norm_fwd(k, mblk_ref[:], mblk_t_ref[:], eps)
    qn = qn.astype(mx).reshape(Gt, P, gC)
    kn = kn.astype(mx).reshape(Gt, P, gC)
    logits = jax.lax.dot_general(
        qn, kn, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # (Gt, gC, gC)
    e = jnp.exp(logits) * _block_mask(gC, C)[None]
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        v, attn.astype(mx), dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # (Gt, P, gC)
    o_ref[:] = out.astype(o_ref.dtype)


def _mid_bwd_kernel(q_ref, k_ref, v_ref, do_ref, mblk_ref, mblk_t_ref,
                    dq_ref, dk_ref, dv_ref,
                    *, Gt: int, P: int, C: int, g: int, eps: float, mx):
    gC = g * C
    mblk, mblk_t = mblk_ref[:], mblk_t_ref[:]
    q = q_ref[:].astype(jnp.float32).reshape(Gt * P, gC)
    k = k_ref[:].astype(jnp.float32).reshape(Gt * P, gC)
    v = v_ref[:].astype(mx).reshape(Gt, P, gC)
    do = do_ref[:].astype(mx).reshape(Gt, P, gC)

    qn2, inv_q, sel_q = _norm_fwd(q, mblk, mblk_t, eps)
    kn2, inv_k, sel_k = _norm_fwd(k, mblk, mblk_t, eps)
    qn = qn2.astype(mx).reshape(Gt, P, gC)
    kn = kn2.astype(mx).reshape(Gt, P, gC)

    # forward recompute of the masked softmax (VMEM-local, never saved)
    logits = jax.lax.dot_general(
        qn, kn, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    e = jnp.exp(logits) * _block_mask(gC, C)[None]
    attn = e / jnp.sum(e, axis=-1, keepdims=True)     # S (Gt, gC, gC)
    attn_mx = attn.astype(mx)

    # dS[j, j'] = sum_p dO[p, j] v[p, j']
    dS = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # softmax backward (rows are per-window; S is 0 off-block so the
    # rowsum only ever counts in-block entries)
    dL = (attn * (dS - jnp.sum(attn * dS, axis=-1,
                               keepdims=True))).astype(mx)

    # dv[p, j'] = sum_j S[j, j'] dO[p, j]
    dv = jax.lax.dot_general(
        do, attn_mx, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # dqn[p, j] = sum_j' dL[j, j'] kn[p, j']
    dqn = jax.lax.dot_general(
        kn, dL, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # dkn[p, j'] = sum_j dL[j, j'] qn[p, j]
    dkn = jax.lax.dot_general(
        qn, dL, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)

    def _norm_bwd(dun, un2, inv, sel):
        dun2 = dun.reshape(Gt * P, gC)
        proj = jnp.dot(un2 * dun2, mblk, preferred_element_type=jnp.float32)
        proj_b = jnp.dot(proj, mblk_t, preferred_element_type=jnp.float32)
        return (dun2 - un2 * proj_b * sel) * inv

    dq = _norm_bwd(dqn, qn2, inv_q, sel_q).reshape(Gt, P, gC)
    dk = _norm_bwd(dkn, kn2, inv_k, sel_k).reshape(Gt, P, gC)
    dq_ref[:] = dq.astype(dq_ref.dtype)
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _tile_depth(G, tile_groups):
    Gt = min(tile_groups, G)
    while G % Gt:
        Gt -= 1
    return Gt


def _launch(kernel_factory, n_in, n_out, args, G, P, gC, dtypes, tile_groups,
            interpret):
    Gt = _tile_depth(G, tile_groups)
    kernel = kernel_factory(Gt)
    grid = (G // Gt,)
    tile = lambda: pl.BlockSpec((Gt, P, gC), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    in_specs = [tile() for _ in range(n_in)] + [
        const(args[n_in].shape), const(args[n_in + 1].shape)]
    out_specs = tuple(tile() for _ in range(n_out))
    out_shape = tuple(jax.ShapeDtypeStruct((G, P, gC), dt) for dt in dtypes)
    if n_out == 1:
        out_specs, out_shape = out_specs[0], out_shape[0]
    return pl.pallas_call(
        kernel, grid=grid, in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret)(*args)


# ---------------------------------------------------------------------------
# custom_vjp over the grouped mid
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _grouped_mid(q_g, k_g, v_g, C, eps, tile_groups, interpret):
    from .window_attention_grouped import _mxu_dtype

    G, P, gC = q_g.shape
    g = gC // C
    mx = _mxu_dtype(q_g.dtype, None)
    mblk = jnp.repeat(jnp.eye(g, dtype=jnp.float32), C, axis=0)
    return _launch(
        lambda Gt: partial(_mid_fwd_kernel, Gt=Gt, P=P, C=C, g=g, eps=eps,
                           mx=mx),
        3, 1, (q_g, k_g, v_g, mblk, mblk.T), G, P, gC, (q_g.dtype,),
        tile_groups, interpret)


def _grouped_mid_fwd(q_g, k_g, v_g, C, eps, tile_groups, interpret):
    out = _grouped_mid(q_g, k_g, v_g, C, eps, tile_groups, interpret)
    return out, (q_g, k_g, v_g)


def _grouped_mid_bwd(C, eps, tile_groups, interpret, res, g_out):
    from .window_attention_grouped import _mxu_dtype

    q_g, k_g, v_g = res
    G, P, gC = q_g.shape
    g = gC // C
    mx = _mxu_dtype(q_g.dtype, None)
    # backward holds ~2x the live tiles; halve the tile depth
    tg = max(1, tile_groups // 2)
    mblk = jnp.repeat(jnp.eye(g, dtype=jnp.float32), C, axis=0)
    dq, dk, dv = _launch(
        lambda Gt: partial(_mid_bwd_kernel, Gt=Gt, P=P, C=C, g=g, eps=eps,
                           mx=mx),
        4, 3, (q_g, k_g, v_g, g_out, mblk, mblk.T), G, P, gC,
        (q_g.dtype,) * 3, tg, interpret)
    return dq, dk, dv


_grouped_mid.defvjp(_grouped_mid_fwd, _grouped_mid_bwd)


# ---------------------------------------------------------------------------
# public: the full training attention
# ---------------------------------------------------------------------------

def supports_train_kernel(B, H, W, C, window_size: int = 4) -> bool:
    return (window_size == 4 and H % window_size == 0
            and W % window_size == 0
            and _group_geometry(B, H, W, C, window_size) is not None)


def window_channel_attention_train(x, wqkv, bqkv, wproj, bproj, *,
                                   window_size: int = 4, eps: float = 1e-12,
                                   tile_groups: int = 32,
                                   interpret: bool = False):
    """Differentiable fast path: XLA convs/relayouts around the grouped
    Pallas mid with its hand-written backward kernel. Drop-in for
    _attention_math under jax.grad/vjp (tests pin gradient parity)."""
    B, H, W, C = x.shape
    ws = window_size
    geo = _group_geometry(B, H, W, C, ws)
    if geo is None:
        raise ValueError(f"unsupported shape for train kernel: {x.shape}")
    P, g, nh, nw, G = geo

    qkv = conv2d(x, wqkv, bqkv)                      # (B, H, W, 3C)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q_g = _to_groups(q, ws, g)
    k_g = _to_groups(k, ws, g)
    v_g = _to_groups(v, ws, g)
    mid_g = _grouped_mid(q_g, k_g, v_g, C, eps, tile_groups, interpret)
    mid = _from_groups(mid_g, B, H, W, C, ws, g)
    return conv2d(mid.astype(x.dtype), wproj, bproj)
