"""Int8 post-training-quantized EnhancedGenerator — the serving engine.

Same math as ``enhanced_generator_apply`` with every convolution run as an
int8 x int8 -> int32 MXU op (v5e: 394 TOPS int8 vs 197 TFLOP/s bf16, and
half the HBM bytes on every conv input — the pipeline is HBM-bound at
~45% of peak, docs/PERFORMANCE.md roofline). Opt-in deployment mode; the
bf16/fp32 engines remain the defaults and the parity reference.

The design exploits a property of this architecture (reference
enhanced_generator.py:92-139: every backbone conv is followed by
InstanceNorm): **InstanceNorm is exactly invariant to per-channel affine
maps** — IN(s*y + b) == IN(y) for per-(channel) s>0, b, because the mean
subtraction removes b and the variance division removes s. (Exactly true
at eps=0 only: feeding the raw int32 accumulator scales variances by s^2,
so near-constant channels with var ~ eps are damped less here than on the
bf16 path. With eps=1e-5 against accumulator magnitudes of ~1e4-1e6 the
effect is negligible everywhere except pathological flat channels; if
flat-channel artifacts ever show in the SSIM A/B, scale eps by the
squared absorbed per-channel factor.) So for every
conv -> IN -> act chain the int32 accumulator feeds IN *directly*: the
per-output-channel weight scale, the per-channel input scale AND the
conv bias are all absorbed, with zero dequantization arithmetic and zero
extra error. Only the 7x7 output conv (feeding tanh) dequantizes.

The attention module (qkv/proj + window einsum or Pallas kernels), the
transformer block and the style encoder stay bf16 and run the SAME
fast-attention dispatch as the NHWC engine: an earlier all-conv-int8
variant lost 0.46x whole-pipeline because quantized qkv/proj forced the
plain einsum attention path (docs/PERFORMANCE.md round-3 int8 section).

Quantization scheme (standard TPU serving PTQ):
  - weights: symmetric per-output-channel absmax/127 int8,
  - activations: symmetric per-tensor static scales from a calibration
    run (``calibrate_enhanced_generator``), absmax over the calibration
    batch; the model input uses the fixed scale 1/127 ([-1,1] domain).

Quality is measured, not assumed: scripts/ab_int8_engine.py reports
SSIM/PSNR of int8 vs the fp32 XLA path on the same inputs, next to the
throughput A/B.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..core import linear, relu, tanh
from ..core.norm import in_relu
from .enhanced_generator import num_transformer_blocks_of
from .structural_transformer import structural_transformer_apply

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# quantization helpers
# ---------------------------------------------------------------------------

def quantize_weight(w, per_channel: bool = True):
    """Symmetric absmax int8 quantization of an HWIO kernel.

    Returns (w_q int8, scale fp32 of shape (Cout,) or ())."""
    w = jnp.asarray(w, jnp.float32)
    if per_channel:
        m = jnp.max(jnp.abs(w), axis=(0, 1, 2))
    else:
        m = jnp.max(jnp.abs(w))
    s = jnp.maximum(m, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_act(x, scale):
    """Static-scale symmetric activation quantization to int8.

    ``scale`` is a per-channel (C,) vector (broadcast over the last axis);
    the matching inverse is folded into the weight quantization, so the
    per-channel rescale is mathematically exact (only rounding remains)."""
    q = jnp.round(x.astype(jnp.float32) / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def _conv_i8(x8, w8, *, stride=1, padding=0, dilation=1):
    """int8 x int8 -> int32 convolution (NHWC/HWIO, symmetric int padding)."""
    return lax.conv_general_dilated(
        x8, w8,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32)


def _convt_i8_k4s2p1(x8, w8):
    """int8 ConvTranspose2d(k=4, s=2, p=1): lhs-dilated conv with the
    spatially flipped kernel (same lowering as core.conv.conv_transpose2d)."""
    return lax.conv_general_dilated(
        x8, w8[::-1, ::-1, :, :],
        window_strides=(1, 1),
        padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2),
        dimension_numbers=_DIMNUMS,
        preferred_element_type=jnp.int32)


# ---------------------------------------------------------------------------
# parameter quantization + calibration
# ---------------------------------------------------------------------------

# Only the output conv needs dequant (+bias); every other quantized conv
# is followed by InstanceNorm, which absorbs scale and bias exactly.
_DEQUANT_SITES = ("output",)


def _site_of(key: str) -> str | None:
    """Map a param key to its quantization site name, or None to keep fp.

    The attention convs (qkv/proj) STAY bf16: quantizing them forces the
    plain einsum attention path, and the measured cost of losing the
    tuned Pallas/einsum dispatch (whole-pipeline 0.46x at 256^2 x96)
    dwarfs the 1.05-1.1x standalone int8 conv wins. Int8 covers the
    IN-absorbed backbone convs; attention + transformer + style run the
    same bf16 fast path as the NHWC engine."""
    if key.endswith(".weight"):
        base = key[:-len(".weight")]
        if (base.startswith("style_encoder") or "transformer_blocks" in base
                or base.endswith(".qkv") or base.endswith(".proj")):
            return None
        return base
    return None


def quantize_enhanced_generator_params(params, act_scales):
    """Build the int8 param tree from fp params + calibrated act scales.

    The per-channel input scale s_in[c] is FOLDED into the weight before
    weight quantization (conv(x, w) == conv(x / s_in, w * s_in) exactly),
    so activations use the full int8 range per channel and the only
    approximation anywhere is rounding:
        acc = conv_i8(round(x / s_in), round(w * s_in / s_w))
        conv(x, w) ~= acc * s_w[o]

    Returns a dict:
      weights_q[site]    int8 HWIO kernel (input-scale-folded)
      weight_scale[site] (Cout,) fp32 — the dequant factor s_w
      bias[site]         fp32 (dequant sites only — IN absorbs the rest)
      act_scales[site]   (Cin,) fp32 per-channel input scales
      fp                 the untouched fp leaves (style encoder,
                         transformer blocks)
    """
    out = {"weights_q": {}, "weight_scale": {}, "bias": {},
           "act_scales": {k: jnp.asarray(v, jnp.float32)
                          for k, v in act_scales.items()},
           "fp": {}}
    for key, val in params.items():
        site = _site_of(key)
        if site is not None:
            s_in = jnp.asarray(act_scales[site], jnp.float32)
            w_eff = jnp.asarray(val, jnp.float32) * s_in[None, None, :, None]
            q, s = quantize_weight(w_eff, per_channel=True)
            out["weights_q"][site] = q
            out["weight_scale"][site] = s
            b = params.get(f"{site}.bias")
            if b is not None and _needs_dequant(site):
                out["bias"][site] = jnp.asarray(b, jnp.float32)
        elif key.endswith(".bias") and _site_of(key[:-5] + ".weight"):
            pass  # IN-absorbed conv bias: dropped (mean subtraction removes it)
        else:
            out["fp"][key] = val
    return out


def _needs_dequant(site: str) -> bool:
    leaf = site.rsplit(".", 1)[-1]
    return leaf in _DEQUANT_SITES or site == "output.0"


def calibrate_enhanced_generator(params, batches, *, window_size: int = 4):
    """Run the instrumented bf16 forward over calibration batches and
    return per-site activation absmax scales (site -> float, absmax/127).

    ``batches``: iterable of (B, H, W, 3) arrays in [-1, 1]."""

    @jax.jit
    def probe(p, x):
        rec = {}
        _forward(None, p, x, rec, window_size=window_size)
        return rec

    import numpy as np

    scales = {}
    for x in batches:
        rec = probe(params, jnp.asarray(x, jnp.bfloat16))
        for k, v in rec.items():
            v = np.asarray(v, np.float32)
            scales[k] = np.maximum(scales[k], v) if k in scales else v
    return {k: np.maximum(v, 1e-6) / 127.0 for k, v in scales.items()}


# ---------------------------------------------------------------------------
# the forward (one structure, two modes)
# ---------------------------------------------------------------------------

def _q_conv(qp, params, x, site, rec, *, conv_kind="conv", stride=1,
            padding=0, dilation=1):
    """One conv in either mode.

    Calibration mode (qp is None): bf16 conv with the fp weights; records
    the input absmax under ``site``. Int8 mode: static-scale quantize the
    input, int8 conv, and either hand the raw int32 accumulator back
    (IN-absorbed sites) or dequant + bias (qkv/proj/output)."""
    from ..core import conv2d, conv_transpose2d

    if qp is None:  # calibration: plain bf16 math + absmax recording
        rec[site] = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(0, 1, 2))
        w = params[f"{site}.weight"]
        b = params.get(f"{site}.bias")
        if conv_kind == "convT":
            return conv_transpose2d(x, w, b, stride=2, padding=1)
        return conv2d(x, w, b, stride=stride, padding=padding,
                      dilation=dilation)

    s_in = qp["act_scales"][site]
    x8 = quantize_act(x, s_in)
    w8 = qp["weights_q"][site]
    if conv_kind == "convT":
        acc = _convt_i8_k4s2p1(x8, w8)
    else:
        acc = _conv_i8(x8, w8, stride=stride, padding=padding,
                       dilation=dilation)
    if _needs_dequant(site):
        y = acc.astype(jnp.float32) * qp["weight_scale"][site]
        b = qp["bias"].get(site)
        if b is not None:
            y = y + b
        return y.astype(x.dtype)
    # IN-absorbed: the following InstanceNorm removes the per-channel
    # scale AND the bias exactly — feed the accumulator straight through
    # (as bf16: stats are computed in fp32 downstream; values fit bf16's
    # 8-bit mantissa to ~0.4% relative, below the int8 quant error).
    return acc.astype(jnp.bfloat16)


def _q_attention(qp, params, x, prefix, rec, *, window_size,
                 fast_attention=False):
    from .enhanced_generator import local_attention_apply

    fp = params if qp is None else qp["fp"]
    return local_attention_apply(fp, x, prefix=prefix,
                                 window_size=window_size,
                                 fast=False if qp is None else fast_attention)


_MSB_BRANCHES = (("branch1", 0, 1), ("branch2", 1, 1),
                 ("branch3", 2, 2), ("branch4", 4, 4))


def _q_msb(qp, params, x, prefix, rec):
    outs = [
        _q_conv(qp, params, x, f"{prefix}{name}.0", rec,
                padding=p, dilation=d)
        for name, p, d in _MSB_BRANCHES]
    h = in_relu(jnp.concatenate(outs, axis=-1))
    h = _q_conv(qp, params, h, f"{prefix}fusion.0", rec)
    return in_relu(h) + x


def _forward(qp, params, x, rec, *, window_size=4, fast_attention=False):
    """qp None -> calibration mode over fp ``params``; else int8 mode
    (``params`` may be None; fp leaves come from qp['fp'])."""
    fp = params if qp is None else qp["fp"]
    orig = x

    h = in_relu(_q_conv(qp, params, x, "initial.0", rec, padding=3))
    for name in ("down1", "down2"):
        h = in_relu(_q_conv(qp, params, h, f"{name}.0", rec,
                            stride=2, padding=1))
        h = _q_attention(qp, params, h, f"{name}.3.", rec,
                         window_size=window_size,
                         fast_attention=fast_attention)
        h = _q_msb(qp, params, h, f"{name}.4.", rec)

    B, H, W, C = h.shape
    style = jnp.mean(h, axis=(1, 2))
    style = relu(linear(style, fp["style_encoder.2.weight"],
                        fp["style_encoder.2.bias"]))

    tokens = h.reshape(B, H * W, C)
    for i in range(num_transformer_blocks_of(fp)):
        tokens = structural_transformer_apply(
            fp, tokens, style, orig, grid_hw=(H, W),
            prefix=f"transformer_blocks.{i}.",
            fast=False if qp is None else fast_attention)
    h = tokens.reshape(B, H, W, C)

    for name in ("up1", "up2"):
        h = in_relu(_q_conv(qp, params, h, f"{name}.0", rec,
                            conv_kind="convT"))
        h = _q_attention(qp, params, h, f"{name}.3.", rec,
                         window_size=window_size,
                         fast_attention=fast_attention)
        h = _q_msb(qp, params, h, f"{name}.4.", rec)

    h = _q_conv(qp, params, h, "output.0", rec, padding=3)
    return tanh(h)


def quantized_enhanced_generator_apply(qparams, x, *, window_size: int = 4,
                                       fast_attention: bool = False):
    """Int8 forward. x: (B, H, W, 3) in [-1, 1], any float dtype.

    fast_attention: same meaning as enhanced_generator_apply — the
    bf16 attention/transformer parts use the tuned Pallas/einsum
    dispatch (inference only)."""
    return _forward(qparams, None, x.astype(jnp.bfloat16), None,
                    window_size=window_size, fast_attention=fast_attention)


def prepare_int8_model(params, calib_batches=None, *, window_size: int = 4):
    """One-call PTQ: calibrate (on the given batches, or a deterministic
    synthetic batch if None) and quantize. Returns qparams."""
    if calib_batches is None:
        key = jax.random.PRNGKey(0)
        calib_batches = [jax.random.uniform(
            key, (2, 256, 256, 3), minval=-1.0, maxval=1.0)]
    scales = calibrate_enhanced_generator(params, calib_batches,
                                          window_size=window_size)
    # model input is [-1, 1]: pin the exact domain scale rather than the
    # calibration batch's observed max
    import numpy as np
    scales["initial.0"] = np.full(3, 1.0 / 127.0, np.float32)
    return quantize_enhanced_generator_params(params, scales)
