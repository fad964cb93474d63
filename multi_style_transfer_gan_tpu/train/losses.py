"""Loss functions (the reference's exact recipe, enhanced_train.py:49-57).

The reference uses MSE for the GAN terms (LSGAN), L1 for cycle/identity/
structure, and a masked L1 for inpainting pretraining (pretrain.py:162).
The BASELINE north-star also names VGG-Gram/perceptual losses, which the
reference does not actually contain (SURVEY.md §2.2); a perceptual loss is
provided separately in ``train.perceptual`` as a clearly-flagged extension.
"""

from __future__ import annotations

import jax.numpy as jnp


def l1_loss(a, b):
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def mse_loss(a, b):
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(jnp.square(d))


def lsgan_loss(scores, target: float):
    """MSE against a constant target (criterion_gan, enhanced_train.py:49)."""
    s = scores.astype(jnp.float32)
    return jnp.mean(jnp.square(s - target))


def masked_l1(pred, target, mask):
    """L1 restricted to dropped patches: loss = L1(pred*(1-m), target*(1-m))
    — exactly pretrain.py:162, including its normalization over *all* pixels
    (the reference divides by the full tensor size, not the masked count)."""
    keep = (1.0 - mask).astype(jnp.float32)
    return l1_loss(pred * keep, target * keep)
