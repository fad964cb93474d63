"""ctypes bindings for the native C++ runtime (native/mstgan_native.cpp).

Provides the host-side hot paths as native code with transparent Python
fallbacks (PIL / numpy) when the shared library is unavailable:

- ``decode_canvas_batch(paths, canvas, fill)`` — threaded JPEG/PNG decode +
  PIL-compatible Lanczos-3 resize + centered canvas paste straight into one
  uint8 batch array (the input side of pipelines.batch).
- ``felzenszwalb_native`` — the segmentation union-find loop
  (ops/segmentation.py's inner loop, ~20x faster).

The library auto-builds with g++ on first use (make -C native).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LIB = None
_LOCK = threading.Lock()
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libmstgan_native.so")


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def load_library():
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB or None
        if not os.path.exists(_SO_PATH) and not _build():
            _LIB = False
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _LIB = False
            return None
        lib.mstgan_decode_canvas_batch.restype = ctypes.c_int
        lib.mstgan_decode_canvas_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_uint8, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
        ]
        lib.mstgan_felzenszwalb.restype = ctypes.c_int
        lib.mstgan_felzenszwalb.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.mstgan_resize.restype = ctypes.c_int
        lib.mstgan_resize.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.mstgan_save_canvas_batch.restype = ctypes.c_int
        lib.mstgan_save_canvas_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        _LIB = lib
        return lib


def available() -> bool:
    return load_library() is not None


def decode_canvas_batch(paths, canvas: int = 256, fill: int = 255,
                        num_threads: int = 8):
    """Decode many images into one (N, canvas, canvas, 3) uint8 batch.

    Returns (batch, sizes, ok): sizes is a list of (w, h); ok a bool array.
    Files the native decoder cannot handle (e.g. BMP) fall back to PIL.
    """
    lib = load_library()
    n = len(paths)
    out = np.empty((n, canvas, canvas, 3), np.uint8)
    whs = np.zeros((n, 2), np.int32)
    ok = np.zeros((n,), np.uint8)
    if lib is not None and n:
        arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
        lib.mstgan_decode_canvas_batch(
            arr, n, canvas, fill,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            whs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            num_threads)
    # PIL fallback for formats the native decoder doesn't handle (BMP,...);
    # genuinely unreadable files stay ok=False — callers skip them like the
    # reference's per-image try/except (batch_process_images.py:251-253).
    for i in range(n):
        if not ok[i]:
            from ..pipelines.batch import _decode_canvas

            try:
                arr_i, (w, h) = _decode_canvas(paths[i], canvas, fill)
            except Exception as e:
                print(f"error processing image {paths[i]}: {e}")
                out[i] = fill
                continue
            out[i] = arr_i
            whs[i] = (w, h)
            ok[i] = 1
    sizes = [(int(w), int(h)) for w, h in whs]
    return out, sizes, ok.astype(bool)


def save_canvas_batch(batch: np.ndarray, sizes, paths, quality: int = 95,
                      num_threads: int = 4):
    """Save many stylized canvases: aspect-crop + resize back to original
    size when <=1MP + JPEG/PNG encode (restore_aspect semantics —
    batch_process_images.py:412-438), all native. Returns a bool ok array;
    False entries (exotic extensions, unwritable paths) should fall back to
    the PIL save path. None if the library is unavailable.
    """
    lib = load_library()
    if lib is None:
        return None
    n = len(paths)
    batch = np.ascontiguousarray(batch, np.uint8)
    assert batch.shape[0] == n and batch.shape[3] == 3
    canvas = batch.shape[1]
    whs = np.ascontiguousarray(np.asarray(sizes, np.int32).reshape(n, 2))
    ok = np.zeros((n,), np.uint8)
    arr = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    lib.mstgan_save_canvas_batch(
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, canvas,
        whs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), arr, quality,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
    return ok.astype(bool)


def felzenszwalb_native(img_smoothed01: np.ndarray, scale: float = 100.0,
                        min_size: int = 50):
    """Native union-find segmentation over a pre-smoothed [0,1] RGB image.
    Returns int32 labels or None if the library is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    h, w = img_smoothed01.shape[:2]
    img = np.ascontiguousarray(img_smoothed01, np.float32)
    labels = np.empty((h, w), np.int32)
    lib.mstgan_felzenszwalb(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
        ctypes.c_float(scale), min_size,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return labels


def lanczos_resize(img: np.ndarray, size_hw):
    """PIL-compatible Lanczos-3 resize of an HWC uint8 image via the native
    library ("the plain resize for the save path"); None when the library
    is unavailable."""
    lib = load_library()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    nh, nw = size_hw
    dst = np.empty((nh, nw, 3), np.uint8)
    lib.mstgan_resize(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), nh, nw)
    return dst
