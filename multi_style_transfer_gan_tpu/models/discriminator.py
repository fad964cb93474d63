"""EnhancedDiscriminator — spectral-norm PatchGAN with two heads.

Capability parity with the reference's ``EnhancedDiscriminator``
(enhanced_generator.py:230-275): four stride-2 4x4 convs (InstanceNorm +
LeakyReLU 0.2) to 8C channels, then
- ``batch_head``: 4x4 conv -> 1 channel + global average pool -> per-sample
  realness scalar, and
- ``structure_head``: 3x3 conv + IN + LReLU + 4x4 conv -> spatial structure
  map (used by the structure-preservation L1 loss, enhanced_train.py:109-115).
Every conv carries spectral normalization (enhanced_generator.py:269-271).

Spectral-norm state: PyTorch stores ``weight_orig`` / ``weight_u`` /
``weight_v`` buffers per wrapped conv. We keep ``<name>.weight_orig`` in the
param dict and ``sn_state[name] = {"u": ..., "v": ...}`` separately — u/v are
updated by power iteration each training forward (buffers, not gradients),
exactly torch's split of parameter vs buffer. One deliberate deviation: torch
iterates u/v on *every* discriminator call (several per train step); we
iterate once per call site too, but the JAX train step threads the state
functionally instead of mutating it in place.

Parameter keys:
  main.{0,2,5,8}.{weight_orig,bias}   backbone convs
  batch_head.0.{weight_orig,bias}
  structure_head.{0,3}.{weight_orig,bias}
sn_state keys: same prefixes -> u vector of shape (out_channels,).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import conv2d, leaky_relu, spectral_normalize
from ..core.norm import in_leaky_relu
from .init_utils import torch_default_conv

_CONVS = (  # name, k, stride, pad, cin_mult, cout_mult (x channels; 3 = RGB in)
    ("main.0", 4, 2, 1, "rgb", 1),
    ("main.2", 4, 2, 1, 1, 2),
    ("main.5", 4, 2, 1, 2, 4),
    ("main.8", 4, 2, 1, 4, 8),
    ("batch_head.0", 4, 1, 1, 8, "one"),
    ("structure_head.0", 3, 1, 1, 8, 8),
    ("structure_head.3", 4, 1, 1, 8, "one"),
)


def discriminator_init(key, channels: int = 16, dtype=jnp.float32):
    c = channels
    params, sn_state = {}, {}
    keys = jax.random.split(key, len(_CONVS) * 2)
    for i, (name, k, _, _, cin_m, cout_m) in enumerate(_CONVS):
        cin = 3 if cin_m == "rgb" else cin_m * c
        cout = 1 if cout_m == "one" else cout_m * c
        w, b = torch_default_conv(keys[2 * i], (k, k, cin, cout), dtype)
        params[f"{name}.weight_orig"] = w
        params[f"{name}.bias"] = b
        u = jax.random.normal(keys[2 * i + 1], (cout,), jnp.float32)
        sn_state[name] = {"u": u / jnp.linalg.norm(u), "v": None}
    return params, sn_state


def discriminator_apply(params, sn_state, x, *, update_sn: bool = True):
    """Forward pass.

    Args:
      x: (B, H, W, 3) in [-1, 1].
      update_sn: run one power-iteration step (training mode). The returned
        ``new_sn_state`` must be threaded back into the train state.

    Returns:
      (scores, structure_map, new_sn_state) — scores is (B,) (the reference
      squeezes the pooled (B,1,1,1) output, enhanced_generator.py:275);
      structure_map is (B, H/16-1, W/16-1, 1).
    """
    new_sn = {}
    # stride/padding come from the _CONVS table (single source of truth)
    _spec = {name: (stride, pad) for name, _, stride, pad, _, _ in _CONVS}

    def snconv(h, name):
        st = sn_state[name]
        w, u, v = spectral_normalize(params[f"{name}.weight_orig"],
                                     st["u"], st.get("v"), update=update_sn)
        new_sn[name] = {"u": u, "v": v}
        stride, padding = _spec[name]
        return conv2d(h, w, params[f"{name}.bias"], stride=stride,
                      padding=padding)

    h = leaky_relu(snconv(x, "main.0"), 0.2)
    h = in_leaky_relu(snconv(h, "main.2"), 0.2)
    h = in_leaky_relu(snconv(h, "main.5"), 0.2)
    feats = in_leaky_relu(snconv(h, "main.8"), 0.2)

    score = snconv(feats, "batch_head.0")            # (B, h-1, w-1, 1)
    score = jnp.mean(score, axis=(1, 2, 3))          # GAP -> (B,)

    s = in_leaky_relu(snconv(feats, "structure_head.0"), 0.2)
    struct_map = snconv(s, "structure_head.3")       # (B, h-1, w-1, 1)
    return score, struct_map, new_sn
