"""VGG-feature perceptual + Gram-matrix style losses (EXTENSION).

BASELINE.json's north-star mentions "VGG-feature Gram-matrix + perceptual
losses", but the reference contains no VGG/Gram loss anywhere — its actual
training losses are LSGAN + cycle + identity + structure (SURVEY.md §2.2).
This module provides the named capability as a clearly-flagged extension:

- a functional VGG16 feature trunk (conv1_1..conv4_3) in NHWC jnp,
- an importer for torchvision-format ``vgg16`` state dicts (features.N.*)
  — pretrained weights must be supplied as a .pth by the user (this build
  environment has no network egress, so none ship here),
- Gram-matrix style loss and feature-space (perceptual) L1,
- a combined ``perceptual_gram_loss`` usable as an additional generator term
  via ``cyclegan_train_step``'s ``extra_g_loss`` hook.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..core import conv2d, relu

# torchvision vgg16.features conv layer indices and channel widths
_VGG16_CONVS = (
    (0, 3, 64), (2, 64, 64),
    (5, 64, 128), (7, 128, 128),
    (10, 128, 256), (12, 256, 256), (14, 256, 256),
    (17, 256, 512), (19, 512, 512), (21, 512, 512),
)
# after which conv indices a 2x2 maxpool sits
_POOL_AFTER = {2, 7, 14}
# default feature taps (relu1_2, relu2_2, relu3_3, relu4_3)
DEFAULT_TAPS = (2, 7, 14, 21)

_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def vgg16_from_torchvision_sd(sd) -> Dict[str, jnp.ndarray]:
    """Import ``torchvision.models.vgg16().state_dict()`` conv weights."""
    import numpy as np

    params = {}
    for idx, _, _ in _VGG16_CONVS:
        w = np.asarray(sd[f"features.{idx}.weight"])
        b = np.asarray(sd[f"features.{idx}.bias"])
        params[f"conv{idx}.weight"] = jnp.asarray(
            np.transpose(w, (2, 3, 1, 0)))
        params[f"conv{idx}.bias"] = jnp.asarray(b)
    return params


def vgg16_features(params, x, taps: Sequence[int] = DEFAULT_TAPS):
    """x: (B, H, W, 3) in [-1, 1]. Returns {conv_idx: feature map} at taps."""
    h = (x + 1.0) * 0.5  # to [0,1]
    h = (h - _IMAGENET_MEAN) / _IMAGENET_STD
    feats = {}
    for idx, _, _ in _VGG16_CONVS:
        h = relu(conv2d(h, params[f"conv{idx}.weight"],
                        params[f"conv{idx}.bias"], padding=1))
        if idx in taps:
            feats[idx] = h
            if idx == max(taps):
                break
        if idx in _POOL_AFTER:
            h = -jax.lax.reduce_window(
                -h, jnp.inf, jax.lax.min, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return feats


def gram_matrix(f):
    """(B, H, W, C) -> (B, C, C) normalized Gram."""
    B, H, W, C = f.shape
    t = f.reshape(B, H * W, C).astype(jnp.float32)
    return jnp.einsum("bnc,bnd->bcd", t, t) / (H * W * C)


def _feature_l1(fp, ft, taps):
    return sum(jnp.mean(jnp.abs(fp[i].astype(jnp.float32)
                                - ft[i].astype(jnp.float32)))
               for i in taps) / len(taps)


def _gram_mse(fp, ft, taps):
    return sum(jnp.mean(jnp.square(gram_matrix(fp[i]) - gram_matrix(ft[i])))
               for i in taps) / len(taps)


def perceptual_loss(vgg_params, pred, target,
                    taps: Sequence[int] = DEFAULT_TAPS):
    fp = vgg16_features(vgg_params, pred, taps)
    ft = vgg16_features(vgg_params, jax.lax.stop_gradient(target), taps)
    return _feature_l1(fp, ft, taps)


def gram_style_loss(vgg_params, pred, style_target,
                    taps: Sequence[int] = DEFAULT_TAPS):
    fp = vgg16_features(vgg_params, pred, taps)
    ft = vgg16_features(vgg_params, jax.lax.stop_gradient(style_target), taps)
    return _gram_mse(fp, ft, taps)


def perceptual_gram_loss(vgg_params, pred, content, style,
                         w_perceptual: float = 1.0, w_gram: float = 1.0,
                         taps: Sequence[int] = DEFAULT_TAPS):
    """Combined loss; the VGG trunk runs ONCE on ``pred`` and its taps are
    shared by both terms."""
    fp = vgg16_features(vgg_params, pred, taps)
    fc = vgg16_features(vgg_params, jax.lax.stop_gradient(content), taps)
    fs = vgg16_features(vgg_params, jax.lax.stop_gradient(style), taps)
    return (w_perceptual * _feature_l1(fp, fc, taps)
            + w_gram * _gram_mse(fp, fs, taps))


def make_extra_g_loss(vgg_params, w_perceptual: float = 1.0,
                      w_gram: float = 1.0):
    """Adapter for ``cyclegan_train_step(..., extra_g_loss=...)``: perceptual
    vs the translation source (content) + Gram vs the target domain
    (style), averaged over both directions."""
    def hook(fake_A, fake_B, real_A, real_B):
        return 0.5 * (
            perceptual_gram_loss(vgg_params, fake_B, real_A, real_B,
                                 w_perceptual, w_gram)
            + perceptual_gram_loss(vgg_params, fake_A, real_B, real_A,
                                   w_perceptual, w_gram))
    return hook
