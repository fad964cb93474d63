"""GUI-tab blending effects (gan_login_gui.py:1334-1394, duplicated at
:2480-2540 — exists once here).

The reference GUI's local-style worker uses a different sky heuristic from
the batch pipeline: a blue-HSV-range mask ([90,30,140]..[130,255,255] in
cv2 uint8 HSV) intersected with the upper half of the frame, dilated and
blurred into a soft weight; plus a Canny edge mask blurred with a 21x21
Gaussian as a detail-preservation weight; and a low-strength ramp
(strength/0.3 for strength<0.3, gan_login_gui.py:1404-1408).
"""

from __future__ import annotations

import jax.numpy as jnp

from .color import rgb_to_hsv, rgb_to_gray
from .filters import canny, dilate, gaussian_blur


def blue_sky_mask(img_u8f):
    """(..., H, W, 3) -> soft sky weight in [0,1]: blue HSV range in the
    upper half, dilated 5x5 and Gaussian-smoothed."""
    hsv = rgb_to_hsv(img_u8f)
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    in_range = ((h >= 90) & (h <= 130) & (s >= 30) & (v >= 140))
    H = img_u8f.shape[-3]
    rows = jnp.arange(H)[:, None] < (H // 2)
    mask = (in_range & rows).astype(jnp.float32)
    mask = dilate(mask, 5)
    return jnp.clip(gaussian_blur(mask, 21), 0.0, 1.0)


def edge_weight_mask(img_u8f):
    """Canny(50,150) edges blurred 21x21 -> [0,1] detail weight."""
    gray = rgb_to_gray(img_u8f)
    edges = (canny(gray, 50.0, 150.0) > 0).astype(jnp.float32)
    return jnp.clip(gaussian_blur(edges, 21), 0.0, 1.0)


def gui_local_style_blend(canvas_u8f, styled_u8f, strength: float,
                          detail: float, *, sky_handling: bool = True):
    """The GUI local-style 'enhanced' blend: per-pixel weight =
    strength (+0.2 soft in sky) reduced on edges by detail; low-strength
    ramp strength/0.3 below 0.3."""
    eff = strength / 0.3 * strength if strength < 0.3 else strength
    weight = jnp.full(canvas_u8f.shape[:-1], eff, jnp.float32)
    if sky_handling:
        sky = blue_sky_mask(canvas_u8f)
        weight = weight + sky * jnp.minimum(0.2, 1.0 - weight)
    edges = edge_weight_mask(canvas_u8f)
    weight = weight * (1.0 - detail * edges)
    weight = jnp.clip(weight, 0.0, 1.0)[..., None]
    return jnp.clip(canvas_u8f * (1 - weight) + styled_u8f * weight, 0, 255)
