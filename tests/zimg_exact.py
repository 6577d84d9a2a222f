"""Bit-faithful NumPy reimplementation of the zimg conversions the reference
test fixtures use (reference tests/conftest.py:80-167: `resize.Bilinear(
format=..., matrix=1)` / `resize.Point(format=..., matrix=1)`).

The reference goldens (/root/reference/tests/goldens/*.json) were produced by
feeding zimg-converted inputs to the filters, so importing those goldens
requires reproducing zimg's conversion pipeline exactly:

  u8 -> f32        x * float32(1/255)            (reciprocal multiply, not /)
  3x3 matrix       f32 FMA chain fma(c2,b, fma(c1,g, c0*r))  (BT.709, matrix=1,
                   coefficients computed in double, narrowed to f32)
  chroma resize    weights computed in double (zimg compute_filter semantics:
                   pos = (i+0.5)/scale + shift, mirror folding at the edges,
                   normalization by the in-window filter sum), applied in f32
                   with FMA; V pass before H pass for downscales per zimg's
                   resize_h_first cost rule
  f32 -> int       clamp(rint(fma(x, scale, offset)), 0, 2^bits-1)
                   (round-half-even; limited-range scale/offset for YUV/GRAY,
                   full-range for RGB)
  f32 -> f16       round-nearest-even cast

Every stage was validated against reference golden values that pin the
converted input directly (tests/test_zimg_convert.py): the YUV444P16
pass-through stats match bit-exactly (incl. integer min/max), the YUV420PS
chroma extrema match bit-exactly, and the 4:2:0/4:2:2 integer planes match to
within a handful of round-to-nearest-even tie flips across ~50k pixels
(avg delta < 3e-9, two orders of magnitude inside the goldens' rel=1e-6).

FMA is emulated in f64 (the f32 product is exact in f64; only one extra
rounding remains, which differs from hardware FMA with probability ~2^-28 per
operation -- unobservable at this suite's scale).
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np

f32 = np.float32
f64 = np.float64

# BT.709 (matrix=1) coefficients, computed in double exactly as zimg's
# ncl matrix builder does, then narrowed to f32 at application time.
_KR, _KB = 0.2126, 0.0722
_KG = 1.0 - _KR - _KB
_US = 1.0 / (2.0 - 2.0 * _KB)
_VS = 1.0 / (2.0 - 2.0 * _KR)
MATRIX_709 = (
    (_KR, _KG, _KB),
    (-_KR * _US, -_KG * _US, 0.5),
    (0.5, -_KG * _VS, -_KB * _VS),
)


def fma(a, b, c):
    """f32 fused multiply-add a*b + c, emulated exactly-enough in f64."""
    return (np.asarray(a).astype(f64) * f64(b) + np.asarray(c).astype(f64)).astype(f32)


def u8_to_f32(plane: np.ndarray) -> np.ndarray:
    """zimg full-range 8-bit -> f32: multiply by the f32 reciprocal."""
    return plane.astype(f32) * f32(1.0 / 255.0)


def apply_matrix_row(row, r, g, b) -> np.ndarray:
    """One output plane of the 3x3 matrix, zimg AVX2 kernel order:
    out = fma(c2, b, fma(c1, g, c0 * r))."""
    c0, c1, c2 = (f32(x) for x in row)
    return fma(b, c2, fma(g, c1, (r * c0).astype(f32)))


def rgb_to_yuv_f32(r, g, b):
    return tuple(apply_matrix_row(row, r, g, b) for row in MATRIX_709)


# ---------------------------------------------------------------------------
# resize weights (zimg resize/filter.cpp compute_filter semantics)
# ---------------------------------------------------------------------------


def _round_half_away(x: float) -> float:
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def _triangle(x: float) -> float:
    return max(1.0 - abs(x), 0.0)


def _bicubic(x: float, b: float = 0.0, c: float = 0.5) -> float:
    """zimg BicubicFilter polynomial (VS resize.Bicubic default b=0 c=0.5)."""
    x = abs(x)
    if x < 1.0:
        return ((12.0 - 9.0 * b - 6.0 * c) / 6.0 * x * x * x
                + (-18.0 + 12.0 * b + 6.0 * c) / 6.0 * x * x
                + (6.0 - 2.0 * b) / 6.0)
    if x < 2.0:
        return ((-b - 6.0 * c) / 6.0 * x * x * x
                + (6.0 * b + 30.0 * c) / 6.0 * x * x
                + (-12.0 * b - 48.0 * c) / 6.0 * x
                + (8.0 * b + 24.0 * c) / 6.0)
    return 0.0


_FILTERS = {
    "bilinear": (_triangle, 1.0),
    "bicubic": (_bicubic, 2.0),
    "point": (lambda x: 1.0, 0.0),
}


@lru_cache(maxsize=None)
def compute_filter(src_dim: int, dst_dim: int, shift: float, filt: str = "bilinear"):
    """(left[dst], weights[dst, filter_size] f32) per zimg compute_filter:
    weights in double, mirror-folded at the edges, normalized by the window
    sum, narrowed to f32 for the float pixel path."""
    left, w64 = compute_filter_f64(src_dim, dst_dim, shift, filt)
    return left, w64.astype(f32)


@lru_cache(maxsize=None)
def compute_filter_f64(src_dim: int, dst_dim: int, shift: float,
                       filt: str = "bilinear"):
    """(left[dst], weights[dst, filter_size] f64) — the double-precision
    weight matrix zimg computes before narrowing (f32 pixel path) or
    quantizing (i16 Q14 integer pixel path)."""
    fn, support = _FILTERS[filt]
    scale = dst_dim / src_dim
    step = min(scale, 1.0)
    filter_size = max(int(math.ceil(support / step)) * 2, 1)

    left = np.empty(dst_dim, np.int64)
    weights = np.zeros((dst_dim, filter_size), f64)
    for i in range(dst_dim):
        pos = (i + 0.5) / scale + shift
        begin_pos = _round_half_away(pos - filter_size / 2.0) + 0.5
        total = sum(fn((begin_pos + j - pos) * step) for j in range(filter_size))
        acc: dict[int, float] = {}
        for j in range(filter_size):
            xpos = begin_pos + j
            if xpos < 0.0:
                real_pos = -xpos
            elif xpos >= src_dim:
                real_pos = min(2.0 * src_dim - xpos, src_dim - 0.5)
            else:
                real_pos = xpos
            idx = int(math.floor(real_pos))
            acc[idx] = acc.get(idx, 0.0) + fn((xpos - pos) * step) / total
        lo = min(acc)
        lo = min(lo, src_dim - filter_size) if src_dim >= filter_size else 0
        lo = max(lo, 0)
        left[i] = lo
        for idx, w in acc.items():
            weights[i, idx - lo] += w
    return left, weights


# ---------------------------------------------------------------------------
# integer (u16) resize path: zimg resizes WORD formats in fixed point —
# i16 Q14 coefficients (error-diffusion quantized so each row sums to
# exactly 1<<14), pixels offset by INT16_MIN into signed range, i32
# accumulate, round-shift by 14, offset back, clamp to the depth's
# pixel_max.  Intermediate between the H and V passes is a packed u16
# plane (each pass rounds + clamps independently).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def compute_filter_i16(src_dim: int, dst_dim: int, shift: float,
                       filt: str = "bilinear", rnd: str = "even"):
    """(left[dst], weights[dst, filter_size] i16 Q14) — error-diffusion
    quantization of the f64 weight matrix: each coefficient is rounded with
    the running error carried into the next tap, so the row sum stays
    exactly 1<<14 and no DC shift is introduced.  rnd: 'even' (lrint,
    round-half-even) or 'away' (round-half-away)."""
    left, w64 = compute_filter_f64(src_dim, dst_dim, shift, filt)
    if rnd.endswith("f32"):
        w64 = w64.astype(f32).astype(f64)
        rnd = rnd[:-3]
    q = np.zeros(w64.shape, np.int32)
    err = 0.0  # for rnd="carry": diffusion error carried ACROSS rows
    for i in range(w64.shape[0]):
        if rnd in ("even", "away", "carry"):
            if rnd != "carry":
                err = 0.0
            for j in range(w64.shape[1]):
                val = w64[i, j] * 16384.0 + err
                qi = int(np.rint(val)) if rnd in ("even", "carry") \
                    else int(_round_half_away(val))
                err = val - qi
                q[i, j] = qi
        elif rnd == "revdiff":
            e = 0.0
            for j in range(w64.shape[1] - 1, -1, -1):
                val = w64[i, j] * 16384.0 + e
                qi = int(np.rint(val))
                e = val - qi
                q[i, j] = qi
        elif rnd == "indep":
            for j in range(w64.shape[1]):
                q[i, j] = int(np.rint(w64[i, j] * 16384.0))
        elif rnd == "sumfix":
            for j in range(w64.shape[1]):
                q[i, j] = int(np.rint(w64[i, j] * 16384.0))
            k = int(np.argmax(np.abs(w64[i])))
            q[i, k] += 16384 - int(q[i].sum())
        else:
            raise ValueError(rnd)
    return left, q.astype(np.int16)


def _apply_taps_u16(p: np.ndarray, left, q: np.ndarray, axis: int,
                    pixel_max: int) -> np.ndarray:
    """One integer resize pass: i32 accumulate of i16 coeff * (pixel +
    INT16_MIN), +(1<<13), arithmetic >>14, -INT16_MIN, clamp [0, pixel_max]
    (zimg resize_impl.cpp unpack_pixel_u16 / pack_pixel_u16 semantics;
    integer adds are associative so SIMD pairing does not matter)."""
    src = p.shape[axis]
    x = p.astype(np.int64) - 32768
    shape = [1] * p.ndim
    shape[axis] = q.shape[0]
    acc = np.zeros([q.shape[0] if d == axis else p.shape[d]
                    for d in range(p.ndim)], np.int64)
    for t in range(q.shape[1]):
        idx = np.clip(left + t, 0, src - 1)
        acc += np.take(x, idx, axis=axis) * q[:, t].astype(np.int64).reshape(shape)
    out = ((acc + (1 << 13)) >> 14) + 32768
    return np.clip(out, 0, pixel_max).astype(np.uint16)


def resize_plane_u16(
    p: np.ndarray,
    dst_w: int,
    dst_h: int,
    shift_w: float = 0.0,
    shift_h: float = 0.0,
    filt: str = "bilinear",
    pixel_max: int = 65535,
    rnd: str = "even",
    order: str = "auto",
) -> np.ndarray:
    """zimg-faithful separable integer resize of (..., H, W) u16 planes
    holding depth-limited values (clamped to pixel_max each pass).
    order: 'auto' (cost rule) | 'h' | 'v' first."""
    src_h, src_w = p.shape[-2], p.shape[-1]
    need_h = dst_w != src_w or shift_w != 0.0
    need_v = dst_h != src_h or shift_h != 0.0
    if not need_h and not need_v:
        return p

    def do_h(x):
        if not need_h:
            return x
        left, q = compute_filter_i16(src_w, dst_w, shift_w, filt, rnd)
        return _apply_taps_u16(x, left, q, x.ndim - 1, pixel_max)

    def do_v(x):
        if not need_v:
            return x
        left, q = compute_filter_i16(src_h, dst_h, shift_h, filt, rnd)
        return _apply_taps_u16(x, left, q, x.ndim - 2, pixel_max)

    if need_h and need_v:
        h_first = resize_h_first(dst_w / src_w, dst_h / src_h) \
            if order == "auto" else (order == "h")
        if h_first:
            return do_v(do_h(p))
        return do_h(do_v(p))
    return do_h(p) if need_h else do_v(p)


def resize_h_first(xscale: float, yscale: float) -> bool:
    """zimg resize.cpp cost rule (horizontal taps cost 2x)."""
    h_first_cost = max(xscale, 1.0) * 2.0 + xscale * max(yscale, 1.0)
    v_first_cost = max(yscale, 1.0) + yscale * max(xscale, 1.0) * 2.0
    return h_first_cost < v_first_cost


def _apply_taps(p: np.ndarray, left, w, axis: int) -> np.ndarray:
    """Apply a resize weight matrix along `axis` with the zimg AVX2 kernels'
    f32 accumulation pattern: two interleaved FMA accumulators (even taps in
    one chain, odd taps in the other, summed at the end).  Validated
    bit-exactly: with this pattern the 4:2:0 chroma planes match the
    reference's converted planes to 0 LSB at 8- AND 16-bit (vs a handful of
    round-to-nearest tie flips for single-chain ascending/descending)."""
    src = p.shape[axis]
    taps = w.shape[1]
    shape = [1] * p.ndim
    shape[axis] = len(left)

    def chain(ts):
        acc = None
        for t in ts:
            idx = np.clip(left + t, 0, src - 1)
            tap = np.take(p, idx, axis=axis).astype(f64)
            wt = w[:, t].astype(f64).reshape(shape)
            acc = (tap * wt).astype(f32) if acc is None else \
                (tap * wt + acc.astype(f64)).astype(f32)
        return acc

    acc0 = chain(range(0, taps, 2))
    acc1 = chain(range(1, taps, 2))
    return acc0 if acc1 is None else (acc0 + acc1).astype(f32)


def resize_plane(
    p: np.ndarray,
    dst_w: int,
    dst_h: int,
    shift_w: float = 0.0,
    shift_h: float = 0.0,
    filt: str = "bilinear",
) -> np.ndarray:
    """zimg-faithful separable resize of (..., H, W) f32 planes."""
    src_h, src_w = p.shape[-2], p.shape[-1]
    need_h = dst_w != src_w or shift_w != 0.0
    need_v = dst_h != src_h or shift_h != 0.0
    if not need_h and not need_v:
        return p

    def do_h(x):
        if not need_h:
            return x
        left, w = compute_filter(src_w, dst_w, shift_w, filt)
        return _apply_taps(x, left, w, axis=x.ndim - 1)

    def do_v(x):
        if not need_v:
            return x
        left, w = compute_filter(src_h, dst_h, shift_h, filt)
        return _apply_taps(x, left, w, axis=x.ndim - 2)

    if need_h and need_v:
        if resize_h_first(dst_w / src_w, dst_h / src_h):
            return do_v(do_h(p))
        return do_h(do_v(p))
    return do_h(p) if need_h else do_v(p)


# ---------------------------------------------------------------------------
# depth conversion
# ---------------------------------------------------------------------------


def f32_to_int(x: np.ndarray, scale: float, offset: float, peak: int, dtype) -> np.ndarray:
    q = np.rint(fma(x, f32(scale), np.full(x.shape, f32(offset), f32)).astype(f64))
    return np.clip(q, 0, peak).astype(dtype)


def quantize_plane(x: np.ndarray, bits: int, kind: str, dtype) -> np.ndarray:
    """kind: 'luma' | 'chroma' (limited range) | 'full' (RGB)."""
    if kind == "full":
        peak = (1 << bits) - 1
        return f32_to_int(x, float(peak), 0.0, peak, dtype)
    sh = 1 << (bits - 8)
    peak = (1 << bits) - 1
    if kind == "luma":
        return f32_to_int(x, 219.0 * sh, 16.0 * sh, peak, dtype)
    return f32_to_int(x, 224.0 * sh, 128.0 * sh, peak, dtype)


# ---------------------------------------------------------------------------
# top-level conversions (RGB24 source, like the reference fixtures)
# ---------------------------------------------------------------------------


def convert_rgb24(
    rgb_planes,
    fmt,
    filt: str = "bilinear",
    dst_w: int | None = None,
    dst_h: int | None = None,
):
    """Convert (N,H,W) u8 R,G,B planes to the target Format, reproducing
    `rgb.resize.<Bilinear|Point>(format=fmt, matrix=1[, width=, height=])`.

    Returns a list of NumPy plane arrays in the format's storage dtype.
    `fmt` is a vszip_tpu Format (duck-typed: color_family/bits_per_sample/
    sample_type/subsampling_w/subsampling_h/storage_dtype attributes).
    """
    from vszip_tpu.core.format import ColorFamily, SampleType

    r8, g8, b8 = rgb_planes
    src_h, src_w = r8.shape[-2], r8.shape[-1]
    dst_w = src_w if dst_w is None else dst_w
    dst_h = src_h if dst_h is None else dst_h
    rf, gf, bf = (u8_to_f32(p) for p in (r8, g8, b8))

    bits = fmt.bits_per_sample
    is_float = fmt.sample_type is SampleType.FLOAT

    def pack(x, kind):
        if is_float:
            if bits == 16:
                return x.astype(np.float16)
            return x
        return quantize_plane(x, bits, kind, fmt.storage_dtype)

    if fmt.color_family is ColorFamily.RGB:
        out = []
        for p in (rf, gf, bf):
            p = resize_plane(p, dst_w, dst_h, 0.0, 0.0, filt)
            out.append(pack(p, "full"))
        return out

    y, cb, cr = rgb_to_yuv_f32(rf, gf, bf)
    # Per-plane depth/resize staging (round-5 forensic,
    # benchmarks/forensic_xpsnr10.py): zimg places the integer depth
    # conversion to MINIMIZE per-plane work — a plane that GROWS is
    # depth-converted at the source resolution and resized in the integer
    # Q14 pixel path; a plane that shrinks is resized in float and
    # depth-converted at the destination.  BYTE (8-bit) targets have no
    # integer resize path, so they stay float regardless.  Validated
    # against the reference's XPSNR ext goldens: the 10-bit 1880x1040 ->
    # 2560x1440 upscale matches at 1e-15 (luma, integer) / 3e-8 (chroma,
    # float) only under this split; every all-float or all-integer staging
    # deviates by >= 1e-5.
    int_resize_ok = not is_float and bits > 8

    def resize_or_int(x, kind, rw, rh, sw_, sh_=0.0):
        if int_resize_ok and rw * rh > x.shape[-1] * x.shape[-2]:
            xi = quantize_plane(x, bits, kind, fmt.storage_dtype)
            return resize_plane_u16(xi, rw, rh, sw_, sh_, filt,
                                    (1 << bits) - 1)
        return pack(resize_plane(x, rw, rh, sw_, sh_, filt), kind)

    if fmt.color_family is ColorFamily.GRAY:
        return [resize_or_int(y, "luma", dst_w, dst_h, 0.0)]

    sw, sh = fmt.subsampling_w, fmt.subsampling_h
    cw, ch = dst_w >> sw, dst_h >> sh
    # zimg stages sized format conversions so the colorspace step runs at the
    # SMALLER resolution, which changes where the chroma subsample happens
    # (validated against the reference's XPSNR ext goldens at 1280x720 /
    # 2560x1440 — the wrong staging misses U/V by ~0.5-1 dB, the right one
    # matches at rel 1e-6):
    #   * downscale: spatial resize at 4:4:4 to the destination luma dims
    #     FIRST, then a separate chroma-subsample resize (siting shift -0.5);
    #   * upscale / same size: one fused resize per chroma plane straight to
    #     (cw, ch) with the siting shift scaled to source units,
    #     -0.5 * (src_w / dst_w).
    # Chroma siting is left (VS default chromaloc) per the zimg
    # pos = (i+0.5)/scale + shift convention; vertically centered (shift 0).
    downscale = (dst_w * dst_h < src_w * src_h)
    out = [resize_or_int(y, "luma", dst_w, dst_h, 0.0)]
    for c in (cb, cr):
        if downscale:
            c = resize_plane(c, dst_w, dst_h, 0.0, 0.0, filt)
            out.append(resize_or_int(c, "chroma", cw, ch,
                                     -0.5 if sw else 0.0))
        else:
            out.append(resize_or_int(c, "chroma", cw, ch,
                                     -0.5 * (src_w / dst_w) if sw else 0.0))
    return out
