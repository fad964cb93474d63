"""Normalization primitives with PyTorch-default semantics on NHWC data.

Reference usage (see SURVEY.md §2.1):
- ``nn.InstanceNorm2d(C)`` everywhere in the enhanced models — PyTorch default
  is affine=False, track_running_stats=False, eps=1e-5, i.e. a *stateless*
  per-(sample, channel) normalization (enhanced_generator.py:93 etc.).
- ``nn.BatchNorm2d(C)`` in the plain CycleGAN generator (pretrain.py:69-89) —
  affine=True with running stats; inference uses running stats, training uses
  batch stats with momentum-0.1 running updates.
- ``nn.utils.spectral_norm`` on every discriminator conv
  (enhanced_generator.py:269-271) — one step of power iteration per forward.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def instance_norm(x, *, eps=1e-5, weight=None, bias=None):
    """InstanceNorm2d with PyTorch defaults (affine=False unless given).

    x: (B, H, W, C); normalizes each (sample, channel) plane over H, W.
    Uses biased variance, like PyTorch. Statistics computed in fp32 for
    bf16 stability, result cast back to x.dtype.
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def batch_norm(x, running_mean, running_var, weight, bias, *,
               training=False, momentum=0.1, eps=1e-5):
    """BatchNorm2d matching PyTorch semantics.

    x: (B, H, W, C). In eval mode normalizes with running stats. In training
    mode normalizes with biased batch stats and returns updated running stats
    (running update uses the *unbiased* variance, as PyTorch does).

    Returns:
      (out, new_running_mean, new_running_var) — running stats pass through
      unchanged in eval mode.
    """
    xf = x.astype(jnp.float32)
    if training:
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(xf - mean), axis=(0, 1, 2))
        n = x.shape[0] * x.shape[1] * x.shape[2]
        unbiased = var * (n / max(n - 1, 1))
        new_mean = (1 - momentum) * running_mean + momentum * mean
        new_var = (1 - momentum) * running_var + momentum * unbiased
    else:
        mean, var = running_mean.astype(jnp.float32), running_var.astype(jnp.float32)
        new_mean, new_var = running_mean, running_var
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype), new_mean, new_var


def spectral_normalize(w_orig, u, v=None, *, n_power_iterations=1, eps=1e-12,
                       update=True):
    """Spectral normalization of a conv kernel, PyTorch-compatible.

    PyTorch's ``nn.utils.spectral_norm`` reshapes the OIHW weight to
    (O, I*kh*kw) and runs power iteration with persistent ``u`` (O,) /
    ``v`` (I*kh*kw,) buffers; the effective weight is W / sigma.

    Here ``w_orig`` is HWIO (our layout); we reshape to (O, H*W*I) —
    the same matrix up to a column permutation, which leaves sigma (and the
    u vector) identical, so imported torch ``weight_u`` buffers stay valid.

    Args:
      w_orig: (kh, kw, I, O) unnormalized kernel.
      u: (O,) persistent left singular vector estimate.
      v: optional (I*kh*kw,)-equivalent right vector. In eval mode
        (update=False) a stored torch ``weight_v`` gives exact parity with
        ``model.eval()``, which reuses both buffers without iterating.
        NOTE: a torch ``weight_v`` is ordered for the (O, I*kh*kw) reshape of
        the OIHW weight; ours is the (O, H*W*I) reshape — permuted orders.
        The importer converts (see weights.torch_import._convert_weight_v).
      update: if False (eval), no power iteration runs.

    Returns:
      (w_normalized, new_u, new_v)
    """
    o = w_orig.shape[-1]
    mat = jnp.transpose(w_orig.reshape(-1, o)).astype(jnp.float32)  # (O, HWI)

    def _l2n(x):
        return x / (jnp.linalg.norm(x) + eps)

    uu = u.astype(jnp.float32)
    if update:
        if v is None and n_power_iterations < 1:
            v = _l2n(mat.T @ uu)  # initialize like the first iteration
        for _ in range(n_power_iterations):
            v = _l2n(mat.T @ uu)
            uu = _l2n(mat @ v)
        uu = jax.lax.stop_gradient(uu)
        v = jax.lax.stop_gradient(v)
    elif v is None:
        v = _l2n(mat.T @ uu)
    else:
        v = v.astype(jnp.float32)
    sigma = uu @ (mat @ v)
    return (w_orig / sigma).astype(w_orig.dtype), uu.astype(u.dtype), v


def l2_normalize(u, eps: float = 1e-12):
    """Zero-safe F.normalize over the last axis (fp32 result).

    A position whose vector is exactly 0 must yield 0 with FINITE
    gradients — naive x/sqrt(sum(x^2)) NaNs the backward pass there. This
    is the parity-critical normalize of the windowed channel attention
    (enhanced_generator.py:6-47 reference); the Pallas kernels re-derive
    the same guard in-kernel.
    """
    uf = u.astype(jnp.float32)
    sumsq = jnp.sum(jnp.square(uf), axis=-1, keepdims=True)
    zero = sumsq == 0
    n = jnp.sqrt(jnp.where(zero, 1.0, sumsq))
    n = jnp.where(zero, 0.0, n)
    return uf / jnp.maximum(n, eps)
