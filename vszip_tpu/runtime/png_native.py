"""ctypes binding for the native PNG scanline unfilter.

Builds runtime/native/png_unfilter.cpp with g++ on first use (cached next
to the source, same scheme as the Deband RNG library).  Falls back to the
pure-Python reconstruction in io/png.py when no compiler is available.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent / "native"
_SRC = _NATIVE_DIR / "png_unfilter.cpp"
_LIB = _NATIVE_DIR / "libvszip_png_unfilter.so"

_lib = None
_failed = False


def available() -> bool:
    return _load() is not None


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    try:
        if not _LIB.is_file() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", "-o", str(_LIB), str(_SRC)],
                check=True,
            )
        lib = ctypes.CDLL(str(_LIB))
        fn = lib.vszip_png_unfilter
        fn.restype = ctypes.c_int32
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception:
        _failed = True
    return _lib


def unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray | None:
    """Reconstruct h x stride scanline bytes, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(raw, np.uint8, h * (1 + stride))
    out = np.empty((h, stride), np.uint8)
    rc = lib.vszip_png_unfilter(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        np.int32(h), np.int32(stride), np.int32(bpp),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"bad PNG filter type {rc}")
    return out
