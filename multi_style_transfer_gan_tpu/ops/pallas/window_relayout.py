"""Window-major relayout as Pallas block copies + a fused-IO v3 attention.

Round 3 closed the consumer side of the 512^2 C=16 attention stage: the
two XLA 6D transposes around the v3 kernel cost ~31 ms of the 70 ms stage
(19% HBM efficiency — their inner contiguous unit is one window row = 128
bytes), and v6 proved rebuilding windows from per-position 16-lane slices
inside the kernel costs more than it saves (docs/PERFORMANCE.md). This
module is the round-4 producer-side swing (VERDICT r3 item 4), built on
one observation the previous attacks missed:

With H split as (nh, ws) and W*C viewed as (nw, ws*C) — both FREE
reshapes of NHWC — the window-major relayout

    (B, nh, ws, nw, ws*C)  ->  rows[b*nh*nw + w, r*ws*C + sc]

moves whole contiguous (nw, ws*C) tiles: row-block w of the output takes
lane-block r from input sublane-plane r. That is 16 ALIGNED BLOCK COPIES
per (ws x ws)-window group — no per-position slicing, no in-register
transpose, no lane merge. The same addressing runs in reverse for d2s.

Three entry points:
- ``s2d_rows`` / ``d2s_rows``: standalone relayout kernels, drop-in for
  the XLA transposes around ``window_attention_v3`` (same HBM round-trip,
  cheaper shuffle).
- ``window_attention_v3_fused_io``: the v3 math with BOTH relayouts done
  in-VMEM inside the kernel — NHWC in, NHWC out, total stage HBM traffic
  = one read + one write of x (the transposes' 3.2 GB round-trip
  disappears entirely).

All variants are bit-identical to ``window_attention_v3`` (same math,
same fp32 accumulation); parity is pinned by tests/test_pallas.py in
interpret mode and the A/B lives in scripts/ab_relayout_kernel.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .window_attention_v3 import _expand_weights, _kernel


def _pick_group(bnh: int, rows_per_nh: int, target_rows: int) -> int:
    """How many window-rows (nh values) to process per grid step."""
    g = max(1, target_rows // max(rows_per_nh, 1))
    while bnh % g:
        g -= 1
    return max(g, 1)


def _s2d_kernel(x_ref, o_ref, *, group: int, ws: int):
    # x_ref: (group, ws, nw, ws*C); o_ref: (group*nw, ws*ws*C)
    nw = x_ref.shape[2]
    wsc = x_ref.shape[3]
    for g in range(group):
        for r in range(ws):
            o_ref[g * nw:(g + 1) * nw, r * wsc:(r + 1) * wsc] = x_ref[g, r]


def _d2s_kernel(x_ref, o_ref, *, group: int, ws: int):
    # x_ref: (group*nw, ws*ws*C); o_ref: (group, ws, nw, ws*C)
    nw = o_ref.shape[2]
    wsc = o_ref.shape[3]
    for g in range(group):
        for r in range(ws):
            o_ref[g, r] = x_ref[g * nw:(g + 1) * nw, r * wsc:(r + 1) * wsc]


def s2d_rows(x, *, window_size: int = 4, target_rows: int = 512,
             interpret: bool = False):
    """NHWC -> (B*nh*nw, ws*ws*C) window-major packed rows (v3's layout)."""
    B, H, W, C = x.shape
    ws = window_size
    nh, nw = H // ws, W // ws
    x4 = x.reshape(B * nh, ws, nw, ws * C)  # free reshape
    group = _pick_group(B * nh, nw, target_rows)
    out = pl.pallas_call(
        partial(_s2d_kernel, group=group, ws=ws),
        grid=(B * nh // group,),
        in_specs=[pl.BlockSpec((group, ws, nw, ws * C),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((group * nw, ws * ws * C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nh * nw, ws * ws * C), x.dtype),
        interpret=interpret,
    )(x4)
    return out


def d2s_rows(rows, shape, *, window_size: int = 4, target_rows: int = 512,
             interpret: bool = False):
    """Inverse of s2d_rows: packed rows -> NHWC of ``shape``."""
    B, H, W, C = shape
    ws = window_size
    nh, nw = H // ws, W // ws
    group = _pick_group(B * nh, nw, target_rows)
    out = pl.pallas_call(
        partial(_d2s_kernel, group=group, ws=ws),
        grid=(B * nh // group,),
        in_specs=[pl.BlockSpec((group * nw, ws * ws * C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((group, ws, nw, ws * C),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nh, ws, nw, ws * C), rows.dtype),
        interpret=interpret,
    )(rows)
    return out.reshape(B, H, W, C)


def _fused_kernel(x_ref, wqkv_ref, bqkv_ref, bproj_ref,
                  mpos_ref, mpos_t_ref, brep_ref, btile_ref, msum_ref,
                  msumproj_ref, o_ref, scratch_in, scratch_out, *,
                  group: int, ws: int, P: int, C: int, eps: float, mx):
    """v3 body reading/writing NHWC blocks via in-VMEM block copies."""
    nw = x_ref.shape[2]
    wsc = x_ref.shape[3]
    for g in range(group):
        for r in range(ws):
            scratch_in[g * nw:(g + 1) * nw, r * wsc:(r + 1) * wsc] = \
                x_ref[g, r]
    _kernel(scratch_in, wqkv_ref, bqkv_ref, bproj_ref, mpos_ref, mpos_t_ref,
            brep_ref, btile_ref, msum_ref, msumproj_ref, scratch_out,
            P=P, C=C, eps=eps, mx=mx)
    for g in range(group):
        for r in range(ws):
            o_ref[g, r] = scratch_out[g * nw:(g + 1) * nw,
                                      r * wsc:(r + 1) * wsc]


def window_attention_v3_fused_io(x, wqkv, bqkv, wproj, bproj, *,
                                 window_size: int = 4,
                                 target_rows: int = 512,
                                 eps: float = 1e-12,
                                 interpret: bool = False,
                                 internal_dtype=None):
    """v3 attention, NHWC in / NHWC out, relayouts fused into the kernel.

    Same math as ``window_attention_v3`` (enhanced_generator.py:6-47
    semantics); the only HBM traffic is one read and one write of x.
    C must be small enough that the expanded weights fit VMEM (the v3
    regime, C <= 16).
    """
    from .window_attention_grouped import _mxu_dtype

    B, H, W, C = x.shape
    ws = window_size
    P = ws * ws
    nh, nw = H // ws, W // ws
    mx = _mxu_dtype(x.dtype, internal_dtype)
    wqkv2 = wqkv.reshape(C, 3 * C)
    wproj2 = wproj.reshape(C, C)
    expanded = _expand_weights(wqkv2, bqkv, wproj2, bproj, P, C)

    x4 = x.reshape(B * nh, ws, nw, ws * C)
    group = _pick_group(B * nh, nw, target_rows)
    T = group * nw
    const = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_fused_kernel, group=group, ws=ws, P=P, C=C, eps=eps, mx=mx),
        grid=(B * nh // group,),
        in_specs=[
            pl.BlockSpec((group, ws, nw, ws * C), lambda i: (i, 0, 0, 0),
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
        out_specs=pl.BlockSpec((group, ws, nw, ws * C),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * nh, ws, nw, ws * C), x.dtype),
        scratch_shapes=[pltpu.VMEM((T, P * C), x.dtype),
                        pltpu.VMEM((T, P * C), x.dtype)],
        interpret=interpret,
    )(x4, *expanded)
    return out.reshape(B, H, W, C)
