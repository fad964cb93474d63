"""Convolution primitives with PyTorch-compatible semantics on NHWC data.

TPU-first design notes:
- Activations are NHWC (channels-last): XLA tiles the trailing (lane) dim onto
  the 128-wide vector lanes / MXU columns, so channels-last is the layout that
  feeds the MXU without relayout copies.
- Kernels are HWIO. PyTorch checkpoints store OIHW (Conv2d) / IOHW
  (ConvTranspose2d); `weights.torch_import` transposes once at load time.
- All convs lower to `lax.conv_general_dilated`, which XLA maps onto the MXU
  and fuses with surrounding elementwise ops (norm/activation).

Numerical parity targets (verified in tests/test_core_parity.py against
torch.nn.functional): `nn.Conv2d(k, s, p)` and `nn.ConvTranspose2d(k, s, p)`
as used in the reference models (reference: enhanced_generator.py:92-139,
pretrain.py:60-97).
"""

from __future__ import annotations


import jax.numpy as jnp
from jax import lax

# NHWC activations, HWIO kernels.
_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _accum_dtype(x, preferred_dtype):
    """Conv output/accumulator dtype. For bf16 inputs the TPU MXU accumulates
    fp32 internally regardless; requesting an fp32 OUTPUT from a bf16 conv
    breaks the kernel-gradient transpose rule (lax transpose_rhs requires
    matching operand dtypes), so under mixed precision the conv emits the
    input dtype — on TPU numerically identical to fp32-out + our astype
    below. (On backends whose narrow-dtype convs also accumulate narrowly
    this is the standard mixed-precision trade; this framework's bf16 path
    targets the TPU, and fp32 inputs are unaffected.)"""
    return preferred_dtype if x.dtype == jnp.float32 else x.dtype


def conv2d(x, w, b=None, *, stride=1, padding=0, dilation=1,
           preferred_dtype=jnp.float32):
    """2-D convolution matching ``torch.nn.functional.conv2d``.

    Args:
      x: (B, H, W, Cin) input.
      w: (kh, kw, Cin, Cout) kernel (HWIO).
      b: optional (Cout,) bias.
      stride / padding / dilation: int or (int, int), symmetric padding —
        exactly PyTorch's Conv2d semantics.
      preferred_dtype: requested output/accumulator dtype for fp32 inputs.
        For non-fp32 inputs the conv emits the input dtype instead (see
        _accum_dtype — the TPU MXU accumulates fp32 internally either way).
    """
    s, p, d = _pair(stride), _pair(padding), _pair(dilation)
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=s,
        padding=[(p[0], p[0]), (p[1], p[1])],
        rhs_dilation=d,
        dimension_numbers=_DIMNUMS,
        preferred_element_type=_accum_dtype(x, preferred_dtype),
    )
    out = out.astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose2d(x, w, b=None, *, stride=1, padding=0, output_padding=0,
                     dilation=1, preferred_dtype=jnp.float32):
    """2-D transposed convolution matching ``torch.nn.functional.conv_transpose2d``.

    PyTorch's ConvTranspose2d(k, s, p) with output size (H-1)*s - 2p + k is
    implemented the XLA way: a regular convolution over an lhs-dilated input
    with the kernel flipped spatially. For torch parity the weight passed here
    must already be in HWIO with I=Cin of *this* op's input (i.e. the torch
    IOHW weight transposed by the importer; no flipping here — we flip below).

    Args:
      x: (B, H, W, Cin).
      w: (kh, kw, Cin, Cout) — torch's (Cin, Cout, kh, kw) transposed to HWIO.
      b: optional (Cout,).
    """
    s, p, d = _pair(stride), _pair(padding), _pair(dilation)
    op = _pair(output_padding)
    kh = (w.shape[0] - 1) * d[0] + 1
    kw = (w.shape[1] - 1) * d[1] + 1
    # Flip spatially: transposed conv correlates with the reversed kernel.
    w = w[::-1, ::-1, :, :]
    pad_h = (kh - 1 - p[0], kh - 1 - p[0] + op[0])
    pad_w = (kw - 1 - p[1], kw - 1 - p[1] + op[1])
    out = lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding=[pad_h, pad_w],
        lhs_dilation=s,
        rhs_dilation=d,
        dimension_numbers=_DIMNUMS,
        preferred_element_type=_accum_dtype(x, preferred_dtype),
    )
    out = out.astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def linear(x, w, b=None, *, preferred_dtype=jnp.float32):
    """Dense layer matching ``torch.nn.functional.linear`` (w is (out, in))."""
    out = jnp.dot(x, w.T.astype(x.dtype),
                  preferred_element_type=preferred_dtype).astype(x.dtype)
    if b is not None:
        out = out + b.astype(out.dtype)
    return out
