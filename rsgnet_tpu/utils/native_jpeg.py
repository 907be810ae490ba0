"""ctypes bindings for the native JPEG decoder (csrc/jpeg_loader.cpp).

Native-IO path for the host input pipeline (SURVEY.md §3.1 hot loop — the
reference leans on OpenCV's C++ ``imdecode``): libjpeg-turbo decompression
straight into a caller-provided row-strided uint8 buffer, so ``load_sample``
decodes JPEG bytes directly into the padded device canvas with zero
intermediate copies. Built on demand with ``make -C csrc`` (same protocol as
:mod:`rsgnet_tpu.ops.nms_native`); every entry point degrades to ``None`` so
callers fall back to the PIL path when no compiler/libjpeg exists.
"""
from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

from rsgnet_tpu.utils.native_build import load_native_lib

_LOCK = threading.Lock()
_LIB = None

# debugging escape hatch: force the PIL path everywhere
_DISABLED = os.environ.get("RSGNET_DISABLE_NATIVE_JPEG", "") not in ("", "0")

JL_OK = 0
JL_ERR_DECODE = 1
JL_ERR_TOO_BIG = 2


def get_lib():
    """The loaded library, or None if unavailable (no compiler/libjpeg)."""
    global _LIB
    if _DISABLED:
        return None
    with _LOCK:
        if _LIB is not None:
            return _LIB or None
        lib = load_native_lib("libjpeg_loader.so", "jpeg_loader.cpp",
                              extra_link=("-ljpeg",))
        if lib is None:
            _LIB = False
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i32 = ctypes.POINTER(ctypes.c_int)
        lib.jpeg_header_dims.restype = ctypes.c_int
        lib.jpeg_header_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong, i32, i32]
        lib.jpeg_decode_rgb_into.restype = ctypes.c_int
        lib.jpeg_decode_rgb_into.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong, u8p, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, i32, i32]
        _LIB = lib
        return lib


def available() -> bool:
    return get_lib() is not None


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[:2] == b"\xff\xd8"


#: sentinel for "could not parse the marker stream" — distinct from None
#: ("well-formed walk, no orientation tag") so callers FAIL CLOSED: a JPEG
#: whose headers we can't read might still carry an orientation tag, and
#: decoding it natively (unrotated) would silently break the geometry.
PARSE_FAILED = object()


def exif_orientation(data: bytes):
    """The EXIF orientation tag (1-8), None when a well-formed marker walk
    finds no orientation, or ``PARSE_FAILED`` on any parse anomaly.

    libjpeg ignores EXIF entirely, but the decode path this replaces
    (cv2.imdecode) APPLIES the orientation tag — so the native path must
    decline oriented JPEGs and let cv2 keep the established geometry
    (annotations are authored against the oriented pixels). Header-only
    scan: walks JPEG markers to APP1/Exif and reads IFD0 tag 0x0112."""
    i, n = 2, len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            return PARSE_FAILED
        marker = data[i + 1]
        if marker == 0xFF:                  # legal fill byte; marker follows
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:   # standalone markers
            i += 2
            continue
        if marker == 0xDA:                  # start of scan: EXIF precedes it
            return None
        seglen = int.from_bytes(data[i + 2:i + 4], "big")
        if seglen < 2 or i + 2 + seglen > n:
            return PARSE_FAILED
        if marker == 0xE1 and data[i + 4:i + 10] == b"Exif\x00\x00":
            tiff = data[i + 10:i + 2 + seglen]
            if len(tiff) < 8:
                return PARSE_FAILED
            bo = {b"II": "little", b"MM": "big"}.get(tiff[:2])
            if bo is None:
                return PARSE_FAILED
            off = int.from_bytes(tiff[4:8], bo)
            if off + 2 > len(tiff):
                return PARSE_FAILED
            cnt = int.from_bytes(tiff[off:off + 2], bo)
            for t in range(cnt):
                e = off + 2 + 12 * t
                if e + 12 > len(tiff):
                    return PARSE_FAILED
                if int.from_bytes(tiff[e:e + 2], bo) == 0x0112:
                    return int.from_bytes(tiff[e + 8:e + 10], bo)
            return None                     # well-formed EXIF, no 0x0112
        i += 2 + seglen
    return PARSE_FAILED                     # truncated header (no SOS seen)


def decode_into(data: bytes, canvas: np.ndarray):
    """Decode JPEG ``data`` into the top-left of ``canvas`` (H, W, 3 uint8,
    C-contiguous). Returns (h, w) on success; None when the native path
    cannot handle this input (not JPEG / no lib / exotic colorspace) and the
    caller must fall back to PIL; raises ValueError when the image does not
    fit the canvas (caller handles the window/downscale path).
    """
    if not is_jpeg(data):
        return None
    if exif_orientation(data) not in (None, 1):
        return None                    # cv2 fallback applies the rotation
    lib = get_lib()
    if lib is None:
        return None
    assert canvas.dtype == np.uint8 and canvas.ndim == 3 \
        and canvas.shape[2] == 3 and canvas.flags.c_contiguous
    max_h, max_w = canvas.shape[:2]
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.jpeg_decode_rgb_into(
        data, len(data), canvas, canvas.strides[0], max_h, max_w,
        ctypes.byref(h), ctypes.byref(w))
    if rc == JL_OK:
        return h.value, w.value
    if rc == JL_ERR_TOO_BIG:
        raise ValueError(f"image ({h.value}x{w.value}) exceeds canvas "
                         f"({max_h}x{max_w})")
    return None  # JL_ERR_DECODE -> PIL fallback


def decode(data: bytes):
    """Full decode to a freshly-allocated (h, w, 3) uint8 RGB array, or None
    when the native path cannot handle this input."""
    if not is_jpeg(data):
        return None
    if exif_orientation(data) not in (None, 1):
        return None                    # cv2 fallback applies the rotation
    lib = get_lib()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.jpeg_header_dims(data, len(data),
                            ctypes.byref(h), ctypes.byref(w)) != JL_OK:
        return None
    if h.value <= 0 or w.value <= 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.jpeg_decode_rgb_into(
        data, len(data), out, out.strides[0], h.value, w.value,
        ctypes.byref(h), ctypes.byref(w))
    return out if rc == JL_OK else None
