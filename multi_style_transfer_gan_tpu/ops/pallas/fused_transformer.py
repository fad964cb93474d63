"""Fused StructuralTransformerBlock core — one Pallas pass per window row.

The transformer stage (models/structural_transformer.py) is bandwidth-bound,
not FLOPs-bound: at 512^2 x 96 the XLA formulation spends ~42 ms on ~1.5 ms
of matmul FLOPs, the rest being two ~600 MB window-partition transposes of
the (B, H, W, 3C) qkv tensor, fp32 LayerNorm round trips, and an ~800 MB
MLP intermediate, all through HBM (docs/PERFORMANCE.md "Next" #1).

This kernel computes the whole block body

    h   = LN1(x + struct) * (1 + gamma) + beta          (FiLM)
    x   = x + proj(window_MHSA(h))                      (window = 8)
    out = x + fc2(gelu(fc1(LN2(x))))

for one (window, W) row of the token grid per grid step, reading the grid
layout (B, H, W, C) directly: the window partition/merge becomes VMEM-local
sublane reshapes + leading-dim transposes (legal Mosaic shape ops — the
lane dim C never moves), LayerNorms/softmax run fp32 in registers, and the
MLP intermediate never exists in HBM. HBM traffic drops to one read of x
and struct and one write of the output.

Mosaic constraints honoured (learned on real hardware, see
window_attention.py:40-49 and PERFORMANCE.md "Hard-won Mosaic facts"):
  - never split/merge the LANE dim in-kernel; heads are LANE SLICES
    (hd = C/heads is 32 for every real config, 16+ for test configs);
  - batched dot_general unrolls per batch element — per tile that is
    (W/window) windows x heads x 2 dots, 64 small matmuls at the flagship
    shape (W=128, C=64), well under the ~64-batched-dot compile cliff;
  - all weight operands use constant index maps so they stay VMEM-resident
    across grid steps.

Used by the fast_attention inference path only; training takes the XLA
formulation (remat + autodiff). The reference has no transformer source at
all (enhanced_generator.py:4 imports a missing module); this fuses OUR
block design, so there is no reference numerics to match — the in-kernel
math mirrors structural_transformer_apply's ordering (fp32 norms/softmax,
bf16 matmul inputs with fp32 accumulation).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max err 1.5e-7).

    Mosaic has no erf primitive; this uses only exp/abs/select, keeping the
    kernel's gelu within fp32 noise of jax.nn.gelu(approximate=False).
    """
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x < 0, -y, y)


def _layer_norm_f32(h, w, b, eps):
    mean = jnp.mean(h, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(h - mean), axis=-1, keepdims=True)
    return (h - mean) * jax.lax.rsqrt(var + eps) * w + b


def _kernel(x_ref, st_ref, gamma_ref, beta_ref,
            nw1_ref, nb1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            nw2_ref, nb2_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
            *, W: int, C: int, window: int, heads: int, eps: float):
    ws = window
    nwin = W // ws
    P = ws * ws
    cdt = x_ref.dtype  # matmul compute dtype (bf16 in prod, f32 in tests)

    x = x_ref[0].astype(jnp.float32)           # (ws, W, C)
    h = x + st_ref[0].astype(jnp.float32)
    h = _layer_norm_f32(h, nw1_ref[:], nb1_ref[:], eps)
    h = h * (1.0 + gamma_ref[0, 0, 0]) + beta_ref[0, 0, 0]  # FiLM, (C,)

    qkv = jnp.dot(h.astype(cdt).reshape(ws * W, C), wqkv_ref[:].astype(cdt),
                  preferred_element_type=jnp.float32) + bqkv_ref[:]
    # window partition: row-of-windows tile -> (nwin, P, 3C), token order
    # (row-in-window, col-in-window) matching _window_attention's transpose.
    qkv = qkv.reshape(ws, nwin, ws, 3 * C).transpose(1, 0, 2, 3)
    qkv = qkv.reshape(nwin, P, 3 * C)
    q = qkv[:, :, :C]
    k = qkv[:, :, C:2 * C]
    v = qkv[:, :, 2 * C:]

    hd = C // heads
    scale = hd ** -0.5
    outs = []
    for i in range(heads):
        qh = q[:, :, i * hd:(i + 1) * hd].astype(cdt)
        kh = k[:, :, i * hd:(i + 1) * hd].astype(cdt)
        vh = v[:, :, i * hd:(i + 1) * hd].astype(cdt)
        a = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale      # (nwin, P, P)
        a = a - jnp.max(a, axis=-1, keepdims=True)
        e = jnp.exp(a)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(cdt)
        outs.append(jax.lax.dot_general(
            p, vh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32))             # (nwin, P, hd)
    o = jnp.concatenate(outs, axis=-1).astype(cdt)           # (nwin, P, C)

    # window merge (inverse of the partition above)
    o = o.reshape(nwin, ws, ws, C).transpose(1, 0, 2, 3).reshape(ws * W, C)
    po = jnp.dot(o, wproj_ref[:].astype(cdt),
                 preferred_element_type=jnp.float32) + bproj_ref[:]
    t1 = x.reshape(ws * W, C) + po                           # residual 1, f32

    n2 = _layer_norm_f32(t1, nw2_ref[:], nb2_ref[:], eps)
    a1 = jnp.dot(n2.astype(cdt), w1_ref[:].astype(cdt),
                 preferred_element_type=jnp.float32) + b1_ref[:]
    g = 0.5 * a1 * (1.0 + _erf(a1 * (2.0 ** -0.5)))  # exact (erf) gelu
    mo = jnp.dot(g.astype(cdt), w2_ref[:].astype(cdt),
                 preferred_element_type=jnp.float32) + b2_ref[:]
    o_ref[0] = (t1 + mo).reshape(ws, W, C).astype(o_ref.dtype)


def fused_structural_block(x, struct, gamma, beta, *,
                           norm1_w, norm1_b, qkv_w, qkv_b, proj_w, proj_b,
                           norm2_w, norm2_b, fc1_w, fc1_b, fc2_w, fc2_b,
                           window: int = 8, num_heads: int | None = None,
                           eps: float = 1e-5, interpret: bool = False):
    """Fused transformer-block body on the (B, H, W, C) token grid.

    Args:
      x: (B, H, W, C) tokens (the residual base), H and W divisible by
        ``window``.
      struct: (B, H, W, C) structure tokens (added before LN1 only).
      gamma, beta: (B, C) FiLM modulation from the style vector.
      *_w/*_b: block parameters in the torch (out, in) Linear layout used by
        models/structural_transformer.py.
    Returns (B, H, W, C) block output in x.dtype.
    """
    B, H, W, C = x.shape
    from ...models.structural_transformer import default_num_heads
    heads = num_heads or default_num_heads(C)
    f32 = jnp.float32

    def t(w):  # torch (out, in) -> matmul (in, out), fp32 resident
        return jnp.asarray(w, f32).T

    weights = (
        jnp.asarray(norm1_w, f32), jnp.asarray(norm1_b, f32),
        t(qkv_w), jnp.asarray(qkv_b, f32),
        t(proj_w), jnp.asarray(proj_b, f32),
        jnp.asarray(norm2_w, f32), jnp.asarray(norm2_b, f32),
        t(fc1_w), jnp.asarray(fc1_b, f32),
        t(fc2_w), jnp.asarray(fc2_b, f32),
    )

    const = lambda shape: pl.BlockSpec(shape, lambda b, r: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, window, W, C), lambda b, r: (b, r, 0, 0),
                            memory_space=pltpu.VMEM)
    # (B, 1, 1, C) so the block's last two dims are full array dims (the
    # Mosaic lowering requires full-or-tile-aligned trailing block dims).
    vec_spec = pl.BlockSpec((1, 1, 1, C), lambda b, r: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_kernel, W=W, C=C, window=window, heads=heads, eps=eps),
        grid=(B, H // window),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec]
        + [const(w.shape) for w in weights],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), x.dtype),
        interpret=interpret,
    )(x, struct, jnp.asarray(gamma, f32).reshape(B, 1, 1, C),
      jnp.asarray(beta, f32).reshape(B, 1, 1, C), *weights)
