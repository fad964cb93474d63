"""Windowed MHSA with HAND-WRITTEN Pallas backward (transformer train path).

Round 1's ``fast="train"`` transformer path paired the fused block forward
(fused_transformer.py) with a backward that recomputed the ENTIRE XLA block
body inside its vjp — strictly added work, measured 0.89-0.95x the pure-XLA
train step (docs/PERFORMANCE.md). Like window_attention_train.py, this
module instead hand-writes the gradient of exactly the part XLA does badly
and leaves the rest to autodiff:

    differentiable surface = the windowed-MHSA MID on the (B, H, W, 3C)
    qkv grid: window partition -> per-head softmax attention -> merge.

The qkv / proj / MLP matmuls and the LayerNorms stay OUTSIDE in XLA
(structural_transformer._train_block_body): big dense matmuls XLA already
schedules well, and their gradients come from autodiff without any forward
recompute. What the kernels absorb — forward and backward — is what made
the XLA formulation bandwidth-bound: the two ~600 MB window-partition
transposes of the qkv tensor per direction and the per-window softmax
round trips (fused_transformer.py module docstring).

Backward math per window, per head (standard attention vjp; all VMEM-local,
fp32 softmax/accumulation):

    s  = q k^T * scale ;  p = softmax(s)
    dv = p^T dO
    dp = dO v^T
    ds = p (.) (dp - rowsum(p (.) dp))
    dq = ds k * scale ;  dk = ds^T q * scale

Tiling matches fused_transformer.py: one (window, W) row of the token grid
per grid step, window partition/merge as VMEM-local sublane reshapes +
leading-dim transposes (the lane dim never moves; heads are lane slices).
Gradient parity vs the XLA formulation is pinned in tests/test_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _partition(t, ws, nwin, lanes):
    """(ws, W, lanes) row tile -> (nwin, ws*ws, lanes) windows; token order
    (row-in-window, col-in-window) matches _window_attention's transpose."""
    s = t.reshape(ws, nwin, ws, lanes).transpose(1, 0, 2, 3)
    return s.reshape(nwin, ws * ws, lanes)


def _merge(t, ws, nwin, lanes):
    """Inverse of _partition: (nwin, ws*ws, lanes) -> (ws, W, lanes)."""
    s = t.reshape(nwin, ws, ws, lanes).transpose(1, 0, 2, 3)
    return s.reshape(ws, nwin * ws, lanes)


def _softmax_p(qh, kh, scale):
    """fp32 per-window softmax probabilities (nwin, P, P)."""
    s = jax.lax.dot_general(
        qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(qkv_ref, o_ref, *, W: int, C: int, window: int, heads: int):
    ws, nwin = window, W // window
    cdt = qkv_ref.dtype
    qkv = _partition(qkv_ref[0], ws, nwin, 3 * C)
    hd = C // heads
    scale = hd ** -0.5
    outs = []
    for i in range(heads):
        qh = qkv[:, :, i * hd:(i + 1) * hd]
        kh = qkv[:, :, C + i * hd:C + (i + 1) * hd]
        vh = qkv[:, :, 2 * C + i * hd:2 * C + (i + 1) * hd]
        p = _softmax_p(qh, kh, scale).astype(cdt)
        outs.append(jax.lax.dot_general(
            p, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))
    o = jnp.concatenate(outs, axis=-1)
    o_ref[0] = _merge(o, ws, nwin, C).astype(o_ref.dtype)


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref,
                *, W: int, C: int, window: int, heads: int):
    ws, nwin = window, W // window
    cdt = qkv_ref.dtype
    qkv = _partition(qkv_ref[0], ws, nwin, 3 * C)
    do = _partition(do_ref[0], ws, nwin, C)
    hd = C // heads
    scale = hd ** -0.5
    dqs, dks, dvs = [], [], []
    for i in range(heads):
        qh = qkv[:, :, i * hd:(i + 1) * hd]
        kh = qkv[:, :, C + i * hd:C + (i + 1) * hd]
        vh = qkv[:, :, 2 * C + i * hd:2 * C + (i + 1) * hd]
        doh = do[:, :, i * hd:(i + 1) * hd]
        p = _softmax_p(qh, kh, scale)                     # fp32 (nwin, P, P)
        pc = p.astype(cdt)
        # dv[s, d] = sum_t p[t, s] dO[t, d]
        dv = jax.lax.dot_general(
            pc, doh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # dp[t, s] = sum_d dO[t, d] v[s, d]
        dp = jax.lax.dot_general(
            doh, vh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(cdt)
        # dq[t, d] = scale * sum_s ds[t, s] k[s, d]
        dq = jax.lax.dot_general(
            ds, kh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        # dk[s, d] = scale * sum_t ds[t, s] q[t, d]
        dk = jax.lax.dot_general(
            ds, qh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1)      # (nwin, P, 3C)
    dqkv_ref[0] = _merge(dqkv, ws, nwin, 3 * C).astype(dqkv_ref.dtype)


def _row_call(kernel, args, out_lanes, shape, window, interpret):
    B, H, W, _ = shape
    row = lambda lanes: pl.BlockSpec((1, window, W, lanes),
                                     lambda b, r: (b, r, 0, 0),
                                     memory_space=pltpu.VMEM)
    in_lanes = [a.shape[-1] for a in args]
    return pl.pallas_call(
        kernel,
        grid=(B, H // window),
        in_specs=[row(l) for l in in_lanes],
        out_specs=row(out_lanes),
        out_shape=jax.ShapeDtypeStruct((B, H, W, out_lanes), args[0].dtype),
        interpret=interpret,
    )(*args)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def window_mhsa_train(qkv, window: int, heads: int, interpret: bool = False):
    """Windowed multi-head softmax attention over a (B, H, W, 3C) qkv grid
    (H, W divisible by ``window``, C divisible by ``heads``) with a
    hand-written Pallas backward. Returns (B, H, W, C). Numerics match
    structural_transformer._window_attention's mid exactly (fp32 softmax,
    compute-dtype matmul operands, fp32 accumulation)."""
    B, H, W, C3 = qkv.shape
    C = C3 // 3
    return _row_call(
        partial(_fwd_kernel, W=W, C=C, window=window, heads=heads),
        (qkv,), C, (B, H, W, C), window, interpret)


def _mhsa_fwd(qkv, window, heads, interpret):
    return window_mhsa_train(qkv, window, heads, interpret), qkv


def _mhsa_bwd(window, heads, interpret, qkv, g):
    B, H, W, C3 = qkv.shape
    C = C3 // 3
    dqkv = _row_call(
        partial(_bwd_kernel, W=W, C=C, window=window, heads=heads),
        (qkv, g.astype(qkv.dtype)), 3 * C, (B, H, W, C), window, interpret)
    return (dqkv,)


window_mhsa_train.defvjp(_mhsa_fwd, _mhsa_bwd)
