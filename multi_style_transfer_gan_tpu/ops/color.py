"""Color-space conversions, cv2-compatible, batched jnp.

The reference thresholds against OpenCV's uint8 conventions (e.g. sky
detection with V>150 & S<100, batch_process_images.py:137-144), so these
functions reproduce cv2's scaling exactly: inputs/outputs are float arrays
carrying uint8-scaled values (0..255), H in 0..180 like cv2, YUV/LAB per
cv2's BT.601 / D65 formulas.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_gray(rgb):
    """cv2.COLOR_RGB2GRAY: Y = 0.299 R + 0.587 G + 0.114 B (same scale)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def rgb_to_hsv(rgb):
    """cv2.COLOR_RGB2HSV for uint8-scaled floats: H in 0..180, S,V 0..255."""
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    h = jnp.where(
        mx == r, 60.0 * (g - b) / safe,
        jnp.where(mx == g, 120.0 + 60.0 * (b - r) / safe,
                  240.0 + 60.0 * (r - g) / safe))
    h = jnp.where(diff == 0, 0.0, h)
    h = jnp.where(h < 0, h + 360.0, h) / 2.0  # cv2 packs H/2 for uint8
    s = jnp.where(mx == 0, 0.0, 255.0 * diff / jnp.where(mx == 0, 1.0, mx))
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(hsv):
    """Inverse of rgb_to_hsv (cv2 uint8 conventions)."""
    x = hsv.astype(jnp.float32)
    h = x[..., 0] * 2.0  # back to degrees
    s = x[..., 1] / 255.0
    v = x[..., 2]
    c = v * s
    hp = h / 60.0
    xm = c * (1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0))
    z = jnp.zeros_like(c)
    idx = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [c, xm, z, z, xm, c])
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [xm, c, c, xm, z, z])
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [z, z, xm, c, c, xm])
    m = v - c
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def rgb_to_yuv(rgb):
    """cv2.COLOR_RGB2YUV (BT.601, uint8 offsets: U,V centered at 128)."""
    x = rgb.astype(jnp.float32)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.14713 * r - 0.28886 * g + 0.436 * b + 128.0
    v = 0.615 * r - 0.51499 * g - 0.10001 * b + 128.0
    return jnp.stack([y, u, v], axis=-1)


def yuv_to_rgb(yuv):
    x = yuv.astype(jnp.float32)
    y, u, v = x[..., 0], x[..., 1] - 128.0, x[..., 2] - 128.0
    r = y + 1.13983 * v
    g = y - 0.39465 * u - 0.58060 * v
    b = y + 2.03211 * u
    return jnp.stack([r, g, b], axis=-1)


def _srgb_to_linear01(c01):
    return jnp.where(c01 > 0.04045, ((c01 + 0.055) / 1.055) ** 2.4,
                     c01 / 12.92)


def rgb_to_lab(rgb):
    """cv2.COLOR_RGB2LAB for uint8-scaled floats: L 0..255, a/b offset 128
    (cv2 scales L*255/100 for uint8)."""
    x = rgb.astype(jnp.float32) / 255.0
    lin = _srgb_to_linear01(x)
    r, g, b = lin[..., 0], lin[..., 1], lin[..., 2]
    # D65 sRGB matrix
    X = (0.412453 * r + 0.357580 * g + 0.180423 * b) / 0.950456
    Y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    Z = (0.019334 * r + 0.119193 * g + 0.950227 * b) / 1.088754

    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(X), f(Y), f(Z)
    L = jnp.where(Y > 0.008856, 116.0 * jnp.cbrt(Y) - 16.0, 903.3 * Y)
    a = 500.0 * (fx - fy) + 128.0
    bb = 200.0 * (fy - fz) + 128.0
    return jnp.stack([L * 255.0 / 100.0, a, bb], axis=-1)
