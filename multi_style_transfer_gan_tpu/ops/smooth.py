"""Color-block artifact repair toolbox (improved_smooth.py parity).

- ``detect_color_blocks``: flat-color artifact detector — LAB a/b Sobel
  gradient magnitude, threshold 30, dilated 11x11 (improved_smooth.py:53-95).
- ``adaptive_color_correction``: blend flagged pixels 50% toward their
  neighborhood mean color (radius 50). The reference does this with an
  O(H*W*r^2) *python* loop per pixel (:10-51); here it's one box-filter
  pass on device — identical math (uniform neighborhood mean), ~10^6x less
  host work.
- ``edge_preserving_smoothing``: cv2.bilateralFilter(d=0 -> from sigma_s)
  wrapper (:97-112).
- ``detail_enhancing_blend``: Gaussian high-pass detail of the original
  added to the stylized blend (:114-135).
- ``fix_color_blocks``: the full chain (:137-173).

Plus the ``smooth_output`` capability the reference's GUI imports but never
ships (gan_login_gui.py:12 — the module is missing from the repo;
SURVEY.md §1): ``apply_guided_filter``, ``smooth_segmentation_edges``,
``blend_with_original`` with the call signatures the GUI expects.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .color import rgb_to_lab
from .filters import (
    sobel, dilate, box_filter, bilateral_filter, gaussian_filter,
    gaussian_blur, guided_filter,
)


def detect_color_blocks(img_u8f, grad_threshold: float = 30.0,
                        dilate_size: int = 11):
    """(…, H, W, 3) uint8-scale -> bool mask of flat-color block regions.

    LAB a/b channels -> Sobel magnitude -> LOW gradient areas flagged
    (flat color), dilated (improved_smooth.py:53-95).
    """
    lab = rgb_to_lab(img_u8f)
    mag = jnp.zeros(img_u8f.shape[:-1], jnp.float32)
    for c in (1, 2):  # a, b channels
        gx = sobel(lab[..., c], 0)
        gy = sobel(lab[..., c], 1)
        mag = mag + jnp.sqrt(gx * gx + gy * gy)
    flat = (mag < grad_threshold).astype(jnp.float32)
    return dilate(flat, dilate_size) > 0


def adaptive_color_correction(img_u8f, mask, radius: int = 50,
                              blend: float = 0.5):
    """Blend flagged pixels toward the neighborhood mean color
    (improved_smooth.py:10-51 math, vectorized as a box filter)."""
    k = 2 * radius + 1
    neighborhood_mean = box_filter(img_u8f, k)
    corrected = img_u8f * (1 - blend) + neighborhood_mean * blend
    return jnp.where(mask[..., None], corrected, img_u8f)


def edge_preserving_smoothing(img_u8f, sigma_s: float = 10.0,
                              sigma_r: float = 0.15):
    """cv2.bilateralFilter(img, 0, sigma_r*255, sigma_s) wrapper (:97-112);
    cv2 derives the window radius from sigma_space when d<=0."""
    d = max(int(round(sigma_s * 1.5)) * 2 + 1, 3)
    return bilateral_filter(img_u8f, d, sigma_r * 255.0, sigma_s)


def detail_enhancing_blend(img_u8f, orig_u8f, alpha: float = 0.3,
                           beta: float = 0.5):
    """img*(1-a) + orig*a + highpass(orig)*b (:114-135)."""
    blurred = gaussian_blur(orig_u8f, 5)
    detail = orig_u8f - blurred
    out = img_u8f * (1 - alpha) + orig_u8f * alpha + detail * beta
    return jnp.clip(out, 0, 255)


def fix_color_blocks(img_u8f, orig_u8f):
    """Full repair chain (improved_smooth.py:137-173)."""
    mask = detect_color_blocks(img_u8f)
    out = adaptive_color_correction(img_u8f, mask)
    out = edge_preserving_smoothing(out)
    return detail_enhancing_blend(out, orig_u8f)


# ---------------------------------------------------------------------------
# smooth_output (the GUI's missing import — designed here)
# ---------------------------------------------------------------------------

def apply_guided_filter(img_u8f, guide_u8f=None, radius: int = 4,
                        eps: float = 0.01):
    """Edge-aware smoothing via the guided filter; self-guided by default."""
    guide = img_u8f if guide_u8f is None else guide_u8f
    return jnp.clip(guided_filter(guide, img_u8f, radius,
                                  eps * 255.0 * 255.0), 0, 255)


def smooth_segmentation_edges(mask, sigma: float = 2.0):
    """Soften a hard region mask into a smooth blend weight in [0, 1]."""
    return jnp.clip(gaussian_filter(mask.astype(jnp.float32), sigma), 0.0, 1.0)


def blend_with_original(stylized_u8f, original_u8f, weight):
    """Per-pixel weighted blend; ``weight`` scalar or (H, W) map."""
    w = jnp.asarray(weight, jnp.float32)
    if w.ndim == stylized_u8f.ndim - 1:
        w = w[..., None]
    return jnp.clip(stylized_u8f * w + original_u8f * (1.0 - w), 0, 255)
