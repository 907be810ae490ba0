"""Image reading, including zip-archive paths (reference ``lib/utils/
zipreader.py``, SURVEY.md §2.21).

Paths of the form ``/path/archive.zip@/member/inside.jpg`` are read from the
zip archive without extraction (archive handles cached per process). Plain
paths are read directly. Output is HWC uint8, RGB by default (the reference
converts BGR->RGB when DATASET.COLOR_RGB, which all shipped configs set).
"""
from __future__ import annotations

import io
import threading
import zipfile

import numpy as np

_ZIP_CACHE: dict = {}
_LOCK = threading.Lock()


def _zip_handle(zip_path: str) -> zipfile.ZipFile:
    with _LOCK:
        zf = _ZIP_CACHE.get(zip_path)
        if zf is None:
            zf = zipfile.ZipFile(zip_path, "r")
            _ZIP_CACHE[zip_path] = zf
        return zf


def read_bytes(path: str) -> bytes:
    if ".zip@" in path:
        zip_path, member = path.split(".zip@", 1)
        zip_path += ".zip"
        member = member.lstrip("/")
        zf = _zip_handle(zip_path)
        with _LOCK:
            return zf.read(member)
    with open(path, "rb") as f:
        return f.read()


def decode_image(data: bytes, color_rgb: bool = True) -> np.ndarray:
    """bytes -> HWC uint8 (RGB unless color_rgb=False -> BGR).

    JPEG bytes take the native libjpeg path (csrc/jpeg_loader.cpp — bit-exact
    vs PIL, tests/test_native_jpeg.py) when the library is available; anything
    it declines (PNG, CMYK, no compiler, RSGNET_DISABLE_NATIVE_JPEG=1) falls
    through to cv2/PIL.
    """
    if color_rgb:
        from rsgnet_tpu.utils import native_jpeg
        arr = native_jpeg.decode(data)
        if arr is not None:
            return arr
    try:
        import cv2
        arr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if arr is None:
            raise ValueError("cv2.imdecode failed")
        if color_rgb:
            arr = cv2.cvtColor(arr, cv2.COLOR_BGR2RGB)
        return arr
    except ImportError:
        from PIL import Image
        arr = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        return arr if color_rgb else arr[:, :, ::-1]


def read_image(path: str, color_rgb: bool = True) -> np.ndarray:
    return decode_image(read_bytes(path), color_rgb=color_rgb)
