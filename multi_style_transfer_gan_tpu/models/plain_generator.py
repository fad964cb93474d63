"""Plain encoder-decoder CycleGAN generator.

Capability parity with the reference's ``Generator`` (pretrain.py:60-97; the
same module is re-declared in pretrain_resume.py, batch_process_images.py and
gan_login_gui.py — here it exists exactly once): a symmetric stack of four
stride-2 4x4 convs (BatchNorm + LeakyReLU 0.2) down to 8C channels and four
stride-2 4x4 transposed convs (BatchNorm + ReLU) back up, Tanh output, no
skip connections.

Parameter keys mirror the PyTorch state_dict:
  encoder.{0,2,5,8}.{weight,bias}           convs (HWIO here)
  encoder.{3,6,9}.{weight,bias,running_mean,running_var}   batch norms
  decoder.{0,3,6,9}.{weight,bias}           transposed convs (HWIO, I=input)
  decoder.{1,4,7}.{weight,bias,running_mean,running_var}   batch norms
(`num_batches_tracked` is accepted and ignored by the importer.)
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..core import conv2d, conv_transpose2d, batch_norm, leaky_relu, relu, tanh
from .init_utils import kaiming_conv, zeros, ones


def plain_generator_init(key, channels: int = 64, dtype=jnp.float32):
    """Random init (PyTorch nn.Conv2d default init shapes; values via He)."""
    c = channels
    enc = [(3, c), (c, 2 * c), (2 * c, 4 * c), (4 * c, 8 * c)]
    dec = [(8 * c, 4 * c), (4 * c, 2 * c), (2 * c, c), (c, 3)]
    params = {}
    keys = jax.random.split(key, 8)
    conv_idx = {0: 0, 1: 2, 2: 5, 3: 8}
    for i, (cin, cout) in enumerate(enc):
        w, b = kaiming_conv(keys[i], (4, 4, cin, cout), dtype=dtype)
        params[f"encoder.{conv_idx[i]}.weight"] = w
        params[f"encoder.{conv_idx[i]}.bias"] = b
        if i > 0:
            bn = f"encoder.{conv_idx[i] + 1}"
            params[f"{bn}.weight"] = ones(cout, dtype)
            params[f"{bn}.bias"] = zeros(cout, dtype)
            params[f"{bn}.running_mean"] = zeros(cout, jnp.float32)
            params[f"{bn}.running_var"] = ones(cout, jnp.float32)
    dconv_idx = {0: 0, 1: 3, 2: 6, 3: 9}
    for i, (cin, cout) in enumerate(dec):
        w, b = kaiming_conv(keys[4 + i], (4, 4, cin, cout), dtype=dtype)
        params[f"decoder.{dconv_idx[i]}.weight"] = w
        params[f"decoder.{dconv_idx[i]}.bias"] = b
        if i < 3:
            bn = f"decoder.{dconv_idx[i] + 1}"
            params[f"{bn}.weight"] = ones(cout, dtype)
            params[f"{bn}.bias"] = zeros(cout, dtype)
            params[f"{bn}.running_mean"] = zeros(cout, jnp.float32)
            params[f"{bn}.running_var"] = ones(cout, jnp.float32)
    return params


def plain_generator_apply(params, x, *, training: bool = False):
    """Forward pass. x: (B, H, W, 3) in [-1, 1]; H, W divisible by 16.

    Returns (out, new_params) in training mode (running BN stats updated) or
    just ``out`` in eval mode.
    """
    new = dict(params) if training else None

    def bn(h, prefix):
        out, nm, nv = batch_norm(
            h,
            params[f"{prefix}.running_mean"], params[f"{prefix}.running_var"],
            params[f"{prefix}.weight"], params[f"{prefix}.bias"],
            training=training,
        )
        if training:
            new[f"{prefix}.running_mean"] = nm
            new[f"{prefix}.running_var"] = nv
        return out

    h = conv2d(x, params["encoder.0.weight"], params["encoder.0.bias"],
               stride=2, padding=1)
    h = leaky_relu(h, 0.2)
    for idx in (2, 5, 8):
        h = conv2d(h, params[f"encoder.{idx}.weight"],
                   params[f"encoder.{idx}.bias"], stride=2, padding=1)
        h = bn(h, f"encoder.{idx + 1}")
        h = leaky_relu(h, 0.2)

    for idx in (0, 3, 6):
        h = conv_transpose2d(h, params[f"decoder.{idx}.weight"],
                             params[f"decoder.{idx}.bias"], stride=2, padding=1)
        h = bn(h, f"decoder.{idx + 1}")
        h = relu(h)
    h = conv_transpose2d(h, params["decoder.9.weight"], params["decoder.9.bias"],
                         stride=2, padding=1)
    h = tanh(h)
    if training:
        return h, new
    return h
