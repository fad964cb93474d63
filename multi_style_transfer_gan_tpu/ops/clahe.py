"""CLAHE — contrast-limited adaptive histogram equalization, cv2-compatible.

Used by the reference's contrast variant (advanced_transform.py:149-150,
clipLimit=2.0, tileGridSize=(8,8), applied to the LAB L channel) and the
GUI's local-style chain (enhanced_local_style.py:246-248, on HSV V).

Algorithm per cv2: per-tile 256-bin histogram, clip at
``clipLimit * tile_pixels / 256`` (>=1), redistribute the clipped excess
uniformly, build per-tile LUTs from the cdf, then bilinearly interpolate
between the four surrounding tile LUTs at every pixel. Fully vectorized
jnp (vmapped bincount histogram + gather), jittable, batched.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def clahe(gray_u8, clip_limit: float = 2.0, grid: int = 8):
    """gray_u8: (..., H, W) uint8-scale floats. H, W divisible by ``grid``
    (cv2 pads otherwise; the reference only uses 256x256 inputs)."""
    x = jnp.clip(jnp.round(gray_u8.astype(jnp.float32)), 0, 255)
    batched = x.ndim == 3
    if not batched:
        x = x[None]
    B, H, W = x.shape
    th, tw = H // grid, W // grid
    npx = th * tw

    tiles = x.reshape(B, grid, th, grid, tw).transpose(0, 1, 3, 2, 4)
    tiles = tiles.reshape(B, grid * grid, npx).astype(jnp.int32)

    # per-tile 256-bin counts via vmapped bincount — O(B*T*256) memory
    # (a one-hot formulation here costs (B,T,npx,256) floats: ~67 MB per
    # 256² image)
    hist = jax.vmap(lambda f: jnp.bincount(f, length=256))(
        tiles.reshape(-1, npx)).reshape(B, grid * grid, 256)
    hist = hist.astype(jnp.float32)

    # cv2: clipLimit = max(int(clip * npx / 256), 1); integer redistribution
    # of the clipped excess — redistBatch to every bin, then +1 to bins at
    # stride max(256//residual, 1) until the residual is spent.
    limit = float(max(int(clip_limit * npx / 256.0), 1))
    clipped = jnp.minimum(hist, limit)
    excess = jnp.sum(hist - clipped, axis=-1, keepdims=True)  # (B,T,1)
    redist = jnp.floor(excess / 256.0)
    residual = excess - redist * 256.0
    step = jnp.maximum(jnp.floor(256.0 / jnp.maximum(residual, 1.0)), 1.0)
    i = jnp.arange(256, dtype=jnp.float32)[None, None, :]
    bump = ((jnp.mod(i, step) == 0)
            & (jnp.floor(i / step) < residual)).astype(jnp.float32)
    hist = clipped + redist + bump

    cdf = jnp.cumsum(hist, axis=-1)
    scale = 255.0 / npx
    luts = jnp.clip(jnp.round(cdf * scale), 0, 255)  # (B, T, 256)

    # bilinear interpolation between tile LUTs (cv2: txf = x/tw - 0.5 with
    # integer pixel coords; weights taken before clamping tile indices)
    ty = jnp.arange(H, dtype=jnp.float32) / th - 0.5
    tx = jnp.arange(W, dtype=jnp.float32) / tw - 0.5
    y0f = jnp.floor(ty)
    x0f = jnp.floor(tx)
    wy = (ty - y0f)[:, None]                           # (H,1)
    wx = (tx - x0f)[None, :]                           # (1,W)
    y0 = jnp.clip(y0f, 0, grid - 1).astype(jnp.int32)
    x0 = jnp.clip(x0f, 0, grid - 1).astype(jnp.int32)
    y1 = jnp.clip(y0f + 1, 0, grid - 1).astype(jnp.int32)
    x1 = jnp.clip(x0f + 1, 0, grid - 1).astype(jnp.int32)

    pix = x.astype(jnp.int32)                           # (B,H,W)
    luts_g = luts.reshape(B, grid, grid, 256)

    def lut_at(yi, xi):
        # gather LUT value for each pixel from tile (yi[y], xi[x])
        l = luts_g[:, yi, :, :][:, :, xi, :]            # (B,H,W,256)
        return jnp.take_along_axis(l, pix[..., None], axis=-1)[..., 0]

    v00 = lut_at(y0, x0)
    v01 = lut_at(y0, x1)
    v10 = lut_at(y1, x0)
    v11 = lut_at(y1, x1)
    out = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
           + wy * ((1 - wx) * v10 + wx * v11))
    out = jnp.clip(jnp.round(out), 0, 255)
    return out if batched else out[0]
