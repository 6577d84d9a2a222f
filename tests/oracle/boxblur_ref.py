"""Sequential NumPy oracle for BoxBlur, written directly from the reference
algorithm description (reference src/filters/boxblur_runtime.zig and
src/filters/boxblur_comptime.zig): literal running-sum loops, no
vectorization.  The production op must match this bit-exactly for integer
formats and within float tolerance otherwise.
"""

from __future__ import annotations

import numpy as np


def _blur_int_1d(src: np.ndarray, radius: int) -> np.ndarray:
    """blurInt (src/filters/boxblur_runtime.zig:10-41): running fixed point."""
    n = len(src)
    ksize = 2 * radius + 1
    inv = ((1 << 32) + radius) // ksize
    inv2 = inv >> 16
    s = int(src[radius])
    for x in range(radius):
        s += int(src[x]) << 1
    s = (s * inv + (1 << 31)) >> 16
    dst = np.zeros(n, dtype=src.dtype)
    for x in range(n):
        if x <= radius:
            a, b = int(src[radius + x]), int(src[radius - x])
        elif x < n - radius:
            a, b = int(src[radius + x]), int(src[x - radius - 1])
        else:
            a, b = int(src[2 * n - radius - x - 1]), int(src[x - radius - 1])
        s += a * inv2
        s -= b * inv2
        dst[x] = s >> 16
    return dst


def _blur_float_1d(src: np.ndarray, radius: int) -> np.ndarray:
    """blurFloat (src/filters/boxblur_runtime.zig:43-79): f32 running mean."""
    n = len(src)
    div = np.float32(1.0) / np.float32(2 * radius + 1)
    s = np.float32(src[radius])
    for x in range(radius):
        s += np.float32(src[x]) * np.float32(2)
    s = s * div
    dst = np.zeros(n, dtype=src.dtype)
    for x in range(n):
        if x <= radius:
            a, b = np.float32(src[radius + x]), np.float32(src[radius - x])
        elif x < n - radius:
            a, b = np.float32(src[radius + x]), np.float32(src[x - radius - 1])
        else:
            a, b = np.float32(src[2 * n - radius - x - 1]), np.float32(src[x - radius - 1])
        s = s + (a - b) * div
        dst[x] = s if src.dtype == np.float32 else src.dtype.type(s)
    return dst


def rt_blur_plane(img: np.ndarray, hradius: int, hpasses: int, vradius: int,
                  vpasses: int) -> np.ndarray:
    """Runtime path: H passes then V passes (each axis independently)."""
    is_int = np.issubdtype(img.dtype, np.integer)
    blur = _blur_int_1d if is_int else _blur_float_1d
    out = img.copy()
    if hradius > 0:
        for _ in range(max(hpasses, 0)):
            for y in range(out.shape[0]):
                out[y] = blur(out[y], hradius)
    if vradius > 0:
        for _ in range(max(vpasses, 0)):
            for x in range(out.shape[1]):
                out[:, x] = blur(out[:, x], vradius)
    return out


def _mirror_rows_idx(i: int, h: int, radius: int) -> list[int]:
    """mirrorRows (src/filters/boxblur_comptime.zig:50-70)."""
    ksize = 2 * radius + 1
    dist = h - 1 - i
    rows = []
    for k in range(radius):
        rows.append(min(radius - k - i, h - 1) if i < radius - k else i - radius + k)
    for k in range(radius, ksize):
        if dist < k - radius:
            rows.append(i - min(k - radius - dist, i))
        else:
            rows.append(i - radius + k)
    return rows


def ct_blur_plane(img: np.ndarray, radius: int) -> np.ndarray:
    """Comptime path (src/filters/boxblur_comptime.zig:10-46): V raw column
    sums quantized at >>32, then the H running fixed-point pass (int); direct
    FIR in both axes with f32 tap ladder (float)."""
    h, w = img.shape
    ksize = 2 * radius + 1
    out = np.zeros_like(img)
    if np.issubdtype(img.dtype, np.integer):
        inv = ((1 << 32) + radius) // ksize
        for i in range(h):
            rows = _mirror_rows_idx(i, h, radius)
            col = np.zeros(w, dtype=np.int64)
            for r in rows:
                col += img[r].astype(np.int64)
            tmp = ((col * inv + (1 << 31)) >> 32).astype(img.dtype)
            out[i] = _blur_int_1d(tmp, radius)
    else:
        div = np.float32(1.0 / ksize)
        for i in range(h):
            rows = _mirror_rows_idx(i, h, radius)
            acc = np.zeros(w, dtype=np.float32)
            for r in rows:
                acc = acc + div * img[r].astype(np.float32)
            tmp = acc.astype(img.dtype)
            out[i] = _h_blur_float_ct(tmp, radius)
    return out


def _h_blur_float_ct(src: np.ndarray, radius: int) -> np.ndarray:
    """hBlurFloat (src/filters/boxblur_comptime.zig:192-263): direct FIR with
    the hybrid edge mirror."""
    w = len(src)
    ksize = 2 * radius + 1
    div = np.float32(1.0 / ksize)
    dst = np.zeros_like(src)
    for j in range(w):
        dist = w - 1 - j
        acc = np.float32(0.0)
        for k in range(ksize):
            if k < radius:
                idx = min(radius - k - j, w - 1) if j < radius - k else j - radius + k
            else:
                if dist < k - radius:
                    idx = j - min(k - radius - dist, j)
                else:
                    idx = j - radius + k
            acc = acc + div * np.float32(src[idx])
        dst[j] = acc if src.dtype == np.float32 else src.dtype.type(acc)
    return dst


def boxblur_ref(img: np.ndarray, hradius=1, hpasses=1, vradius=1, vpasses=1):
    """Full dispatch (reference src/vapoursynth/boxblur.zig:188-209)."""
    use_rt = (hradius != vradius) or (hradius > 22) or (hpasses > 1) or (vpasses > 1)
    if use_rt:
        return rt_blur_plane(img, hradius, hpasses, vradius, vpasses)
    return ct_blur_plane(img, hradius)
