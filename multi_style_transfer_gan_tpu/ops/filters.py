"""Classical-CV filters as batched, jittable jnp ops.

Device-side equivalents of the cv2/scipy calls on the reference's batch hot
path (SURVEY.md §2.5): Gaussian blur, scipy-style gaussian_filter, Sobel,
a Canny-compatible edge detector, morphological dilate/erode, box/median/
bilateral/guided filters, histogram equalization and convertScaleAbs.

Conventions: images are (..., H, W) or (..., H, W, C) float arrays in uint8
scale (0..255) unless noted; borders follow the cv2 default (reflect-101)
so outputs can be compared against OpenCV pixel-for-pixel in tests.
"""

from __future__ import annotations

import math
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# separable convolution helper (reflect-101 borders, like cv2 default)
# ---------------------------------------------------------------------------

def _sep_filter(img, ky: np.ndarray, kx: np.ndarray, mode="REFLECT_101"):
    """Separable 2-D filter on (..., H, W[, C]) with configurable borders:
    REFLECT_101 (cv2 default), REPLICATE (cv2), or SYMMETRIC (scipy
    'reflect' — edge sample duplicated)."""
    x = img.astype(jnp.float32)
    chan = x.ndim >= 3 and x.shape[-1] <= 8  # heuristic: trailing C axis
    if not chan:
        x = x[..., None]
    batch = x.ndim == 4
    if not batch:
        x = x[None]
    B, H, W, C = x.shape
    ry, rx = len(ky) // 2, len(kx) // 2
    pad_mode = {"REFLECT_101": "reflect", "REPLICATE": "edge",
                "SYMMETRIC": "symmetric"}[mode]
    x = jnp.pad(x, ((0, 0), (ry, ry), (rx, rx), (0, 0)), mode=pad_mode)
    ky_k = jnp.asarray(ky, jnp.float32).reshape(-1, 1, 1, 1)
    kx_k = jnp.asarray(kx, jnp.float32).reshape(1, -1, 1, 1)
    dn = ("NHWC", "HWIO", "NHWC")
    x = lax.conv_general_dilated(
        x, jnp.tile(ky_k, (1, 1, 1, C)), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=dn, feature_group_count=C)
    x = lax.conv_general_dilated(
        x, jnp.tile(kx_k, (1, 1, 1, C)), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=dn, feature_group_count=C)
    if not batch:
        x = x[0]
    if not chan:
        x = x[..., 0]
    return x.astype(img.dtype) if jnp.issubdtype(img.dtype, jnp.floating) else x


_CV2_SMALL_GAUSS = {  # cv2's hardcoded small_gaussian_tab (sigma<=0, k<=7)
    1: np.asarray([1.0]),
    3: np.asarray([0.25, 0.5, 0.25]),
    5: np.asarray([0.0625, 0.25, 0.375, 0.25, 0.0625]),
    7: np.asarray([0.03125, 0.109375, 0.21875, 0.28125,
                   0.21875, 0.109375, 0.03125]),
}


def _cv2_gaussian_kernel(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel, including the fixed small-kernel table cv2
    substitutes when sigma<=0 and ksize<=7."""
    if sigma <= 0 and ksize in _CV2_SMALL_GAUSS:
        return _CV2_SMALL_GAUSS[ksize]
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize) - (ksize - 1) / 2.0
    k = np.exp(-(xs ** 2) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_blur(img, ksize: int, sigma: float = 0.0):
    """cv2.GaussianBlur((k,k), sigma) with default border."""
    k = _cv2_gaussian_kernel(ksize, sigma)
    return _sep_filter(img, k, k)


def gaussian_filter(img, sigma: float, truncate: float = 4.0):
    """scipy.ndimage.gaussian_filter (2-D over H,W; reflect border).

    Used by the reference for the detail mask (batch_process_images.py:327).
    scipy 'reflect' duplicates the edge sample — SYMMETRIC pad.
    """
    r = int(truncate * sigma + 0.5)
    xs = np.arange(-r, r + 1)
    k = np.exp(-0.5 * (xs / sigma) ** 2)
    k = k / k.sum()
    return _sep_filter(img.astype(jnp.float32), k, k, mode="SYMMETRIC")


def box_filter(img, ksize: int):
    k = np.ones(ksize) / ksize
    return _sep_filter(img, k, k)


def sobel(gray, axis: int):
    """cv2.Sobel ksize=3: axis=0 -> d/dx (horizontal deriv), 1 -> d/dy."""
    smooth = np.asarray([1.0, 2.0, 1.0])
    deriv = np.asarray([-1.0, 0.0, 1.0])
    if axis == 0:
        return _sep_filter(gray, smooth, deriv)
    return _sep_filter(gray, deriv, smooth)


def dilate(mask, ksize: int = 5, iterations: int = 1):
    """cv2.dilate with a ones (k,k) kernel on a float/bool mask."""
    x = mask.astype(jnp.float32)
    chan = x.ndim >= 3 and x.shape[-1] <= 8
    if not chan:
        x = x[..., None]
    batch = x.ndim == 4
    if not batch:
        x = x[None]
    pad = ksize // 2
    for _ in range(iterations):
        x = lax.reduce_window(x, -jnp.inf, lax.max,
                              (1, ksize, ksize, 1), (1, 1, 1, 1),
                              [(0, 0), (pad, pad), (pad, pad), (0, 0)])
    if not batch:
        x = x[0]
    if not chan:
        x = x[..., 0]
    return x


def erode(mask, ksize: int = 5, iterations: int = 1):
    x = mask.astype(jnp.float32)
    return -dilate(-x, ksize, iterations)


def median_blur3(img):
    """cv2.medianBlur(img, 3) — 3x3 median via sort over the 9 taps."""
    x = img.astype(jnp.float32)
    chan = x.ndim >= 3 and x.shape[-1] <= 8
    if not chan:
        x = x[..., None]
    batch = x.ndim == 4
    if not batch:
        x = x[None]
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    taps = [p[:, dy:dy + x.shape[1], dx:dx + x.shape[2], :]
            for dy in range(3) for dx in range(3)]
    stack = jnp.stack(taps, axis=0)
    med = jnp.sort(stack, axis=0)[4]
    if not batch:
        med = med[0]
    if not chan:
        med = med[..., 0]
    return med


def filter2d(img, kernel: np.ndarray):
    """cv2.filter2D with a small dense kernel (correlation, reflect-101)."""
    x = img.astype(jnp.float32)
    chan = x.ndim >= 3 and x.shape[-1] <= 8
    if not chan:
        x = x[..., None]
    batch = x.ndim == 4
    if not batch:
        x = x[None]
    C = x.shape[-1]
    kh, kw = kernel.shape
    p = jnp.pad(x, ((0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)),
                mode="reflect")
    k = jnp.asarray(kernel, jnp.float32).reshape(kh, kw, 1, 1)
    out = lax.conv_general_dilated(
        p, jnp.tile(k, (1, 1, 1, C)), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    if not batch:
        out = out[0]
    if not chan:
        out = out[..., 0]
    return out


def convert_scale_abs(img, alpha: float = 1.0, beta: float = 0.0):
    """cv2.convertScaleAbs: saturate_cast<uint8>(round(|img*alpha + beta|))."""
    v = jnp.abs(img.astype(jnp.float32) * alpha + beta)
    return jnp.clip(jnp.round(v), 0, 255)


def equalize_hist(gray_u8):
    """cv2.equalizeHist on a uint8-scale single-channel image (...,H,W).

    Jittable: 256-bin histogram via one-hot sum, cdf mapping with cv2's
    (cdf - cdf_min) / (N - cdf_min) * 255 rounding.
    """
    x = jnp.clip(jnp.round(gray_u8.astype(jnp.float32)), 0, 255)
    flat = x.reshape(*x.shape[:-2], -1).astype(jnp.int32)
    hist = jax.vmap(lambda f: jnp.bincount(f, length=256))(
        flat.reshape(-1, flat.shape[-1]))
    hist = hist.reshape(*x.shape[:-2], 256)
    cdf = jnp.cumsum(hist, axis=-1)
    n = x.shape[-1] * x.shape[-2]
    # cv2: exclude zeros -> first nonzero cdf value
    cdf_min = jnp.min(jnp.where(hist > 0, cdf, n + 1), axis=-1, keepdims=True)
    denom = jnp.maximum(n - cdf_min, 1)
    lut = jnp.clip(jnp.round((cdf - cdf_min) * 255.0 / denom), 0, 255)
    # cv2 special case: a single-valued image (some hist[i] == N) is
    # returned unchanged, not mapped to 0
    constant = jnp.any(hist == n, axis=-1, keepdims=True)
    lut = jnp.where(constant, jnp.arange(256, dtype=lut.dtype), lut)
    idx = flat.reshape(*x.shape)
    lut_b = jnp.broadcast_to(lut.reshape(*x.shape[:-2], 1, 1, 256),
                             (*x.shape, 256))
    return jnp.take_along_axis(lut_b, idx[..., None],
                               axis=-1)[..., 0].astype(jnp.float32)


def bilateral_filter(img, d: int = 9, sigma_color: float = 75.0,
                     sigma_space: float = 75.0):
    """cv2.bilateralFilter-style edge-preserving smoother (windowed).

    Exact windowed implementation (no grid approximations): each output
    pixel is the spatially- and range-weighted mean over a (d x d) window.
    cv2 with d>0 uses radius d//2 and no spatial cutoff beyond the window.
    """
    x = img.astype(jnp.float32)
    chan = x.ndim >= 3 and x.shape[-1] <= 8
    if not chan:
        x = x[..., None]
    batch = x.ndim == 4
    if not batch:
        x = x[None]
    r = d // 2
    p = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="reflect")
    H, W = x.shape[1], x.shape[2]
    num = jnp.zeros_like(x)
    den = jnp.zeros(x.shape[:-1] + (1,), jnp.float32)
    inv2sc = -0.5 / (sigma_color * sigma_color)
    inv2ss = -0.5 / (sigma_space * sigma_space)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dy * dy + dx * dx > r * r:
                continue  # cv2 uses a circular window of radius d//2
            shifted = lax.dynamic_slice(
                p, (0, dy + r, dx + r, 0), x.shape)
            # cv2 range weight uses the L1 across channels
            cd = jnp.sum(jnp.abs(shifted - x), axis=-1, keepdims=True)
            w = jnp.exp(cd * cd * inv2sc + (dy * dy + dx * dx) * inv2ss)
            num = num + w * shifted
            den = den + w
    out = num / den
    if not batch:
        out = out[0]
    if not chan:
        out = out[..., 0]
    return out


def guided_filter(guide, src, radius: int = 4, eps: float = 1e-4):
    """cv2.ximgproc.guidedFilter (gray guide fast path; color src ok).

    Box-filter formulation (He et al.): a = cov/(var+eps), b = mean_s - a*mean_g,
    out = mean_a * g + mean_b. For a color guide cv2 uses the full 3x3
    covariance; the reference calls it with guide == src (self-guided,
    batch_process_images.py:396), for which the per-channel formulation is
    equivalent, so we filter each channel guided by itself.
    """
    g = guide.astype(jnp.float32)
    s = src.astype(jnp.float32)
    k = 2 * radius + 1
    mean_g = box_filter(g, k)
    mean_s = box_filter(s, k)
    corr_gs = box_filter(g * s, k)
    corr_gg = box_filter(g * g, k)
    var_g = corr_gg - mean_g * mean_g
    cov_gs = corr_gs - mean_g * mean_s
    a = cov_gs / (var_g + eps)
    b = mean_s - a * mean_g
    return box_filter(a, k) * g + box_filter(b, k)


# ---------------------------------------------------------------------------
# Canny-compatible edge detection
# ---------------------------------------------------------------------------

def canny(gray_u8, low: float = 50.0, high: float = 150.0,
          hysteresis_iters: int = 10):
    """cv2.Canny-compatible edges on (..., H, W) uint8-scale gray.

    Sobel-3 gradients (L1 magnitude like cv2's default), 4-direction
    non-maximum suppression, double threshold, and hysteresis by iterated
    dilation of strong edges constrained to weak candidates (a fixed-point
    approximation of BFS connectivity — ``hysteresis_iters`` dilations reach
    any weak pixel within that many steps of a strong edge; 10 covers the
    masks the reference derives from it).
    """
    gx = sobel(gray_u8, 0)
    gy = sobel(gray_u8, 1)
    mag = jnp.abs(gx) + jnp.abs(gy)  # cv2 L2gradient=False default

    ang = jnp.arctan2(gy, gx)
    deg = jnp.mod(jnp.degrees(ang), 180.0)
    # quantize to 0/45/90/135
    d0 = (deg < 22.5) | (deg >= 157.5)
    d45 = (deg >= 22.5) & (deg < 67.5)
    d90 = (deg >= 67.5) & (deg < 112.5)

    def shift(m, dy, dx):
        return jnp.roll(jnp.roll(m, dy, axis=-2), dx, axis=-1)

    # neighbors in image (y-down) coordinates: a 45-degree gradient points
    # along +y+x on screen, so its NMS comparisons are (+1,+1)/(-1,-1)
    n1 = jnp.where(d0, shift(mag, 0, 1),
                   jnp.where(d45, shift(mag, 1, 1),
                             jnp.where(d90, shift(mag, 1, 0),
                                       shift(mag, -1, 1))))
    n2 = jnp.where(d0, shift(mag, 0, -1),
                   jnp.where(d45, shift(mag, -1, -1),
                             jnp.where(d90, shift(mag, -1, 0),
                                       shift(mag, 1, -1))))
    keep = (mag >= n1) & (mag >= n2)
    mag_nms = jnp.where(keep, mag, 0.0)

    strong = mag_nms > high
    weak = mag_nms > low
    edges = strong.astype(jnp.float32)
    for _ in range(hysteresis_iters):
        grown = dilate(edges, 3) > 0
        edges = (grown & weak).astype(jnp.float32)
    return edges * 255.0
