"""ctypes bindings for the native Deband RNG precompute.

Builds runtime/native/deband_rng.cpp with g++ on first use (cached as a
shared library next to the source).  A pure-Python reference implementation
lives in tests/oracle/deband_rng_ref.py and is cross-checked against this
library in the test suite.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent / "native"
_SRC = _NATIVE_DIR / "deband_rng.cpp"
_LIB = _NATIVE_DIR / "libvszip_deband_rng.so"

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.is_file() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        try:
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", "-o", str(_LIB), str(_SRC)],
                check=True,
            )
        except (FileNotFoundError, subprocess.CalledProcessError) as e:
            if not _LIB.is_file():
                raise RuntimeError(
                    "Deband needs the native RNG precompute library "
                    f"({_LIB.name}): no prebuilt copy was found and building "
                    "it requires g++.  Install a C++ toolchain or use a "
                    "wheel that ships the prebuilt library."
                ) from e
            # a prebuilt library is present (e.g. from a wheel); a stale
            # mtime alone is not worth failing over when we cannot rebuild
    lib = ctypes.CDLL(str(_LIB))
    fn = lib.vszip_deband_precompute
    fn.restype = None
    i32 = ctypes.c_int32
    fn.argtypes = (
        [i32] * 10
        + [ctypes.c_double] * 2
        + [i32] * 6
        + [ctypes.c_float] * 2
        + [ctypes.POINTER(ctypes.c_int32)] * 8
        + [ctypes.POINTER(ctypes.c_int16)] * 2
        + [ctypes.POINTER(ctypes.c_float)] * 2
        + [ctypes.POINTER(ctypes.c_uint32)]
    )
    _lib = lib
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def deband_precompute(w: int, h: int, num_frames: int, seed: int,
                      sample_mode: int, range_: int, ssw: int, ssh: int,
                      algo_ref: int, algo_grain: int, param_ref: float,
                      param_grain: float, is_float: bool, dynamic: bool,
                      add_grain_y: bool, add_grain_c: bool,
                      grain_y, grain_c) -> dict:
    """Returns ref (dy, dx) planes, grain buffers, and grain offsets."""
    lib = _load()
    cw, ch = w >> ssw, h >> ssh
    r = {
        "ref1_dy": np.zeros(h * w, np.int32),
        "ref1_dx": np.zeros(h * w, np.int32),
        "ref2_dy": np.zeros(h * w, np.int32),
        "ref2_dx": np.zeros(h * w, np.int32),
        "c_ref1_dy": np.zeros(ch * cw, np.int32),
        "c_ref1_dx": np.zeros(ch * cw, np.int32),
        "c_ref2_dy": np.zeros(ch * cw, np.int32),
        "c_ref2_dx": np.zeros(ch * cw, np.int32),
    }
    item_count = ((w + 255) & ~127) * h
    total = item_count * (3 if dynamic else 1)
    gyi = np.zeros(total if (add_grain_y and not is_float) else 1, np.int16)
    gci = np.zeros(total if (add_grain_c and not is_float) else 1, np.int16)
    gyf = np.zeros(total if (add_grain_y and is_float) else 1, np.float32)
    gcf = np.zeros(total if (add_grain_c and is_float) else 1, np.float32)
    offs = np.zeros(max(num_frames, 1), np.uint32)

    lib.vszip_deband_precompute(
        w, h, num_frames, np.int32(np.uint32(seed & 0xFFFFFFFF)).item()
        if seed < 0 or seed > 2**31 - 1 else seed,
        sample_mode, range_, ssw, ssh, algo_ref, algo_grain,
        float(param_ref), float(param_grain), int(is_float), int(dynamic),
        int(add_grain_y), int(add_grain_c),
        int(grain_y) if not is_float else 0,
        int(grain_c) if not is_float else 0,
        float(grain_y) if is_float else 0.0,
        float(grain_c) if is_float else 0.0,
        _ptr(r["ref1_dy"], ctypes.c_int32), _ptr(r["ref1_dx"], ctypes.c_int32),
        _ptr(r["ref2_dy"], ctypes.c_int32), _ptr(r["ref2_dx"], ctypes.c_int32),
        _ptr(r["c_ref1_dy"], ctypes.c_int32), _ptr(r["c_ref1_dx"], ctypes.c_int32),
        _ptr(r["c_ref2_dy"], ctypes.c_int32), _ptr(r["c_ref2_dx"], ctypes.c_int32),
        _ptr(gyi, ctypes.c_int16), _ptr(gci, ctypes.c_int16),
        _ptr(gyf, ctypes.c_float), _ptr(gcf, ctypes.c_float),
        _ptr(offs, ctypes.c_uint32),
    )
    for k in ("ref1_dy", "ref1_dx", "ref2_dy", "ref2_dx"):
        r[k] = r[k].reshape(h, w)
    for k in ("c_ref1_dy", "c_ref1_dx", "c_ref2_dy", "c_ref2_dx"):
        r[k] = r[k].reshape(ch, cw)
    r["grain_y"] = gyf if is_float else gyi
    r["grain_c"] = gcf if is_float else gci
    r["grain_offsets"] = offs
    r["item_count"] = item_count
    return r
