"""ctypes binding for the native error-diffusion demote (zimg
`dither_type="error_diffusion"` semantics; see native/dither.cpp).

A pure-NumPy sequential fallback is provided for environments without g++;
it is bit-identical but orders of magnitude slower, so the native library is
strongly preferred on hot paths (Deband's <16-bit round trip).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent / "native"
_SRC = _NATIVE_DIR / "dither.cpp"
_LIB = _NATIVE_DIR / "libvszip_dither.so"

_lib = None
_lib_failed = False


def _load():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not _LIB.is_file() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        try:
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", "-o", str(_LIB), str(_SRC)],
                check=True,
            )
        except (FileNotFoundError, subprocess.CalledProcessError):
            if not _LIB.is_file():
                _lib_failed = True
                return None
    lib = ctypes.CDLL(str(_LIB))
    fn = lib.vszip_error_diffusion_u16
    fn.restype = None
    fn.argtypes = [
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_float, ctypes.c_int32,
    ]
    _lib = lib
    return lib


def _error_diffusion_py(plane: np.ndarray, scale: float, peak: int) -> np.ndarray:
    f32 = np.float32
    h, w = plane.shape
    out = np.empty((h, w), np.uint16)
    err_top = np.zeros(w + 2, f32)
    err_cur = np.zeros(w + 2, f32)
    c7, c5, c3, c1 = (f32(7 / 16), f32(5 / 16), f32(3 / 16), f32(1 / 16))
    xs_all = plane.astype(f32) * f32(scale)
    for i in range(h):
        xs = xs_all[i]
        err_left = f32(0.0)
        for j in range(w):
            je = j + 1
            err = f32(err_left * c7)
            err = f32(err + f32(err_top[je + 1] * c3))
            err = f32(err + f32(err_top[je] * c5))
            err = f32(err + f32(err_top[je - 1] * c1))
            x = f32(xs[j] + err)
            q = min(max(int(np.rint(x)), 0), peak)
            e = f32(x - f32(q))
            err_left = e
            err_cur[je] = e
            out[i, j] = q
        err_top, err_cur = err_cur, err_top
    return out


def error_diffusion_demote(plane: np.ndarray, scale: float, peak: int) -> np.ndarray:
    """Demote one (H, W) uint16 plane with FS error diffusion (u16 out)."""
    plane = np.ascontiguousarray(plane, np.uint16)
    lib = _load()
    if lib is None:
        return _error_diffusion_py(plane, scale, peak)
    h, w = plane.shape
    out = np.empty((h, w), np.uint16)
    lib.vszip_error_diffusion_u16(
        plane.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        w, h, ctypes.c_float(scale), peak,
    )
    return out
