"""Native (C++) runtime components, loaded via ctypes.

frame_codec: GIL-free float->JPEG frame encoding (libjpeg-turbo). Falls back
to PIL transparently when the toolchain/library is unavailable.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "frame_codec.cpp")
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libframecodec.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _LIB_PATH, "-ljpeg"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.jpeg_encode_rgb.restype = ctypes.c_long
        lib.jpeg_encode_rgb.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_long,
        ]
        lib.jpeg_encode_planar_float.restype = ctypes.c_long
        lib.jpeg_encode_planar_float.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_void_p, ctypes.c_long,
        ]
        return lib
    except Exception as e:  # noqa: BLE001
        log.warning("native frame codec unavailable (%s); using PIL", e)
        _build_failed = True
        return None


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lib_lock:
            if _lib is None:
                _lib = _build()
    return _lib


def encode_jpeg_planar(
    frame: np.ndarray, quality: int = 90, scale: float = 1.0, offset: float = 0.0
) -> Optional[bytes]:
    """[3, H, W] float32 -> JPEG bytes via the native codec (pixel value =
    v*scale + offset in [0,1]); None if unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    frame = np.ascontiguousarray(frame, np.float32)
    _, h, w = frame.shape
    cap = h * w * 3 + 65536
    out = np.empty(cap, np.uint8)
    n = lib.jpeg_encode_planar_float(
        frame.ctypes.data_as(ctypes.c_void_p), h, w, quality,
        ctypes.c_float(scale), ctypes.c_float(offset),
        out.ctypes.data_as(ctypes.c_void_p), cap,
    )
    if n <= 0:
        return None
    return out[:n].tobytes()
