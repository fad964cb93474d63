"""Batched, static-shape image frontend (decode-side) ops.

Replaces the reference's per-image PIL pipeline — aspect-preserving LANCZOS
resize onto a centered white 256x256 canvas (batch_process_images.py:186-200,
process_local_style:260-281), Resize+CenterCrop training transform
(pretrain.py:32-37), and the [-1,1] normalization used everywhere — with
jittable jnp ops whose output shapes are static regardless of source size, so
one compiled program serves every image in a folder.

Core trick: ``jax.image.scale_and_translate`` resizes *and* positions in one
XLA op with traced (data-dependent) scale/translation, which makes
"aspect-preserving resize + paste at integer offset" a single static-shape
kernel. Out-of-source taps contribute zero, so we renormalize by a resampled
ones-mask to avoid edge darkening, then hard-composite onto the fill color at
the exact integer paste bounds like PIL's ``paste``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def to_model_range(x):
    """uint8/[0,1] float image -> [-1, 1] (Normalize(0.5, 0.5))."""
    if x.dtype == jnp.uint8:
        x = x.astype(jnp.float32) / 255.0
    return x * 2.0 - 1.0


def from_model_range(x):
    """[-1, 1] -> [0, 1] with clamp ((x+1)/2, clamp — direct_transform.py:66-67)."""
    return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)


# kept under their spec names too
normalize_to_unit = to_model_range
denormalize_from_unit = from_model_range


def resize(img, size_hw, method: str = "lanczos3", antialias: bool = True):
    """Batched resize. img: (B, H, W, C) or (H, W, C)."""
    if img.ndim == 3:
        out_shape = (*size_hw, img.shape[-1])
    else:
        out_shape = (img.shape[0], *size_hw, img.shape[-1])
    return jax.image.resize(img.astype(jnp.float32), out_shape, method=method,
                            antialias=antialias)


def _paste_geometry(src_h, src_w, canvas: int):
    """Integer new-size + offsets exactly as the reference computes them
    (batch_process_images.py:187-199): longer side -> canvas, centered."""
    src_h = jnp.asarray(src_h, jnp.float32)
    src_w = jnp.asarray(src_w, jnp.float32)
    wide = src_w > src_h
    new_w = jnp.where(wide, canvas, jnp.floor(src_w * (canvas / src_h)))
    new_h = jnp.where(wide, jnp.floor(src_h * (canvas / src_w)), canvas)
    off_x = jnp.floor((canvas - new_w) / 2.0)
    off_y = jnp.floor((canvas - new_h) / 2.0)
    return new_h, new_w, off_y, off_x


def canvas_paste(img, canvas: int = 256, fill: float = 1.0,
                 src_hw=None, method: str = "lanczos3"):
    """Aspect-preserving resize + centered paste on a fill-colored canvas.

    Args:
      img: (H, W, C) single image or (B, H, W, C) batch of *same-shape*
        sources (use vmap or per-shape jit buckets for mixed folders; the
        batch pipeline pads/buckets on the host).
      canvas: output side length (256 for the reference pipelines).
      fill: background in [0,1] (1.0 = white canvas; enhanced_local_style
        uses black, pass 0.0).
      src_hw: optional traced (h, w) of the valid region inside ``img`` (for
        host-padded batches where ``img`` is edge-padded to a common shape);
        defaults to the array shape.

    Returns (out, valid_mask): out is (..., canvas, canvas, C) float32 in the
    same value range as the input; valid_mask is (..., canvas, canvas, 1)
    bool marking the pasted region (needed by aspect-crop restore and the
    local-style blends).
    """
    single = img.ndim == 3
    if single:
        img = img[None]
    B, H, W, C = img.shape
    if src_hw is None:
        src_h = jnp.full((B,), H, jnp.float32)
        src_w = jnp.full((B,), W, jnp.float32)
    else:
        src_h = jnp.broadcast_to(jnp.asarray(src_hw[0], jnp.float32), (B,))
        src_w = jnp.broadcast_to(jnp.asarray(src_hw[1], jnp.float32), (B,))

    new_h, new_w, off_y, off_x = _paste_geometry(src_h, src_w, canvas)
    scale_y = new_h / src_h
    scale_x = new_w / src_w

    def one(im, sy, sx, ty, tx, nh, nw):
        imf = im.astype(jnp.float32)
        out = jax.image.scale_and_translate(
            imf, (canvas, canvas, C), (0, 1),
            jnp.stack([sy, sx]), jnp.stack([ty, tx]),
            method=method, antialias=True)
        ones = jax.image.scale_and_translate(
            jnp.ones(im.shape[:2] + (1,), jnp.float32), (canvas, canvas, 1),
            (0, 1), jnp.stack([sy, sx]), jnp.stack([ty, tx]),
            method=method, antialias=True)
        out = out / jnp.maximum(jnp.abs(ones), 1e-3) * jnp.sign(ones)
        yy = jax.lax.broadcasted_iota(jnp.float32, (canvas, canvas, 1), 0)
        xx = jax.lax.broadcasted_iota(jnp.float32, (canvas, canvas, 1), 1)
        mask = ((yy >= ty) & (yy < ty + nh) & (xx >= tx) & (xx < tx + nw))
        return jnp.where(mask, out, fill), mask

    out, mask = jax.vmap(one)(img, scale_y, scale_x, off_y, off_x, new_h, new_w)
    if single:
        return out[0], mask[0]
    return out, mask


def resize_center_crop(img, size: int = 256, method: str = "lanczos3"):
    """torchvision Resize(size) + CenterCrop(size): shorter side -> ``size``,
    center-cropped square (the training transform, pretrain.py:32-37)."""
    single = img.ndim == 3
    if single:
        img = img[None]
    B, H, W, C = img.shape
    h = jnp.full((B,), H, jnp.float32)
    w = jnp.full((B,), W, jnp.float32)
    # torchvision integer geometry: short side -> size, long side ->
    # int(size * long / short) — TRUNCATED, not rounded
    # (torchvision._compute_resized_output_size) — then crop at integer
    # offsets ((nw - size)//2); fractional offsets would shift content
    # half a pixel vs the reference.
    new_h = jnp.where(h <= w, float(size), jnp.floor(size * h / w))
    new_w = jnp.where(w <= h, float(size), jnp.floor(size * w / h))
    ty = -jnp.floor((new_h - size) / 2.0)
    tx = -jnp.floor((new_w - size) / 2.0)

    def one(im, sy, sx, t_y, t_x):
        out = jax.image.scale_and_translate(
            im.astype(jnp.float32), (size, size, C), (0, 1),
            jnp.stack([sy, sx]), jnp.stack([t_y, t_x]),
            method=method, antialias=True)
        return out

    out = jax.vmap(one)(img, new_h / h, new_w / w, ty, tx)
    return out[0] if single else out


def aspect_crop_bounds(orig_w: int, orig_h: int, canvas: int = 256):
    """Static helper: the crop box that undoes ``canvas_paste`` for one image
    (batch_process_images.py:219-234). Host-side (python ints), since the
    final save path is per-image anyway."""
    if orig_w == orig_h:
        return 0, 0, canvas, canvas
    ar = orig_w / orig_h
    if ar > 1:
        cw, ch = canvas, int(canvas / ar)
    else:
        cw, ch = int(canvas * ar), canvas
    left = (canvas - cw) // 2
    top = (canvas - ch) // 2
    return left, top, left + cw, top + ch


def restore_aspect(out_u8, orig_wh, canvas: int = 256):
    """The shared restore tail of every save path (batch, GUI, serving):
    aspect-crop the canvas output back to the source's aspect ratio, and
    resize to the original size when it is <=1MP
    (batch_process_images.py:412-438). Takes a HWC uint8 array (or
    anything PIL accepts via fromarray), returns a PIL image."""
    import numpy as np
    from PIL import Image

    w, h = orig_wh
    img = Image.fromarray(np.asarray(out_u8))
    l, t, r, b = aspect_crop_bounds(w, h, canvas)
    if (l, t, r, b) != (0, 0, canvas, canvas):
        img = img.crop((l, t, r, b))
    if w * h <= 1024 * 1024:
        img = img.resize((w, h), Image.LANCZOS)
    return img
