"""Format conversion utilities (the rebuild's analogue of the reference's
Resize-plugin invocations: ``toRGBS`` in src/helper.zig:225-243 and
``sRGBtoLinearRGB`` in src/vapoursynth/ssimulacra2.zig:132-162).

``to_rgbs`` reproduces the reference's `resize.Bicubic(format=RGBS,
matrix_in=1|6)` semantics: zimg-convention Catmull-Rom (b=0, c=0.5) chroma
upsampling with left-sited horizontal siting and double-precision weights,
limited-range depth conversion by f32 reciprocal multiply, and the ncl
YUV->RGB matrix derived in double and applied in f32.  Residual deviation vs
zimg is <=1 u16 LSB per pixel (zimg resizes integer formats in fixed point;
here the resize runs in f32 on the MXU), far inside the SSIMULACRA2 golden
tolerance (rel 1e-3).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .clip import Clip
from .format import ColorFamily, SampleType, get_format
from .params import VSZipError

# matrix coefficients: (Kr, Kb)
_MATRICES = {1: (0.2126, 0.0722), 6: (0.299, 0.114)}  # 709, 601


def _plane_to_float(x, fmt, chroma: bool):
    """zimg integer->float depth conversion: (x - lo) * f32(1/range)
    (reciprocal multiply, matching zimg's AVX2 depth kernels)."""
    if fmt.sample_type is SampleType.FLOAT:
        return x.astype(jnp.float32)
    bits = fmt.bits_per_sample
    sh = bits - 8
    if chroma:
        lo, rng = 128 << sh, 224 << sh
    else:
        lo, rng = 16 << sh, 219 << sh
    return (x.astype(jnp.float32) - jnp.float32(lo)) * jnp.float32(1.0 / rng)


def _bicubic(x: float, b: float = 0.0, c: float = 0.5) -> float:
    """zimg's BicubicFilter polynomial (VS resize.Bicubic default b=0 c=0.5)."""
    x = abs(x)
    if x < 1.0:
        p0 = (6.0 - 2.0 * b) / 6.0
        p2 = (-18.0 + 12.0 * b + 6.0 * c) / 6.0
        p3 = (12.0 - 9.0 * b - 6.0 * c) / 6.0
        return p0 + p2 * x * x + p3 * x * x * x
    if x < 2.0:
        q0 = (8.0 * b + 24.0 * c) / 6.0
        q1 = (-12.0 * b - 48.0 * c) / 6.0
        q2 = (6.0 * b + 30.0 * c) / 6.0
        q3 = (-b - 6.0 * c) / 6.0
        return q0 + q1 * x + q2 * x * x + q3 * x * x * x
    return 0.0


def _kernel_fn(kind: str, b: float, c: float):
    """(pointwise kernel fn, support) for a zimg resample filter."""
    if kind == "point":
        return (lambda x: 1.0), 0.0
    if kind == "bilinear":
        return (lambda x: max(1.0 - abs(x), 0.0)), 1.0
    if kind == "bicubic":
        return (lambda x: _bicubic(x, b, c)), 2.0
    raise VSZipError(f"resize: unknown kernel '{kind}'.")


@lru_cache(maxsize=64)
def _zimg_weight_matrix(src_dim: int, dst_dim: int, shift: float,
                        kind: str = "bicubic", b: float = 0.0,
                        c: float = 0.5) -> np.ndarray:
    """(dst, src) f32 resize matrix, zimg compute_filter semantics:
    pos = (i+0.5)/scale + shift, double-precision weights, mirror folding
    at the edges, normalization by the in-window sum."""
    fn, support = _kernel_fn(kind, b, c)
    scale = dst_dim / src_dim
    step = min(scale, 1.0)
    filter_size = max(int(math.ceil(support / step)) * 2, 1)
    m = np.zeros((dst_dim, src_dim), np.float64)
    for i in range(dst_dim):
        pos = (i + 0.5) / scale + shift
        begin_pos = (math.floor(pos - filter_size / 2.0 + 0.5)
                     if pos - filter_size / 2.0 >= 0
                     else math.ceil(pos - filter_size / 2.0 - 0.5)) + 0.5
        total = sum(fn((begin_pos + j - pos) * step)
                    for j in range(filter_size))
        for j in range(filter_size):
            xpos = begin_pos + j
            if xpos < 0.0:
                real_pos = -xpos
            elif xpos >= src_dim:
                real_pos = min(2.0 * src_dim - xpos, src_dim - 0.5)
            else:
                real_pos = xpos
            m[i, int(math.floor(real_pos))] += fn((xpos - pos) * step) / total
    return m.astype(np.float32)


@lru_cache(maxsize=64)
def _zimg_filter_taps(src_dim: int, dst_dim: int, shift: float,
                      kind: str = "bicubic", b: float = 0.0, c: float = 0.5):
    """(left int64[dst], w float64[dst, filter_size]) — the taps form of
    _zimg_weight_matrix (zimg FilterContext layout: per output pixel a
    window start and filter_size coefficients, edge weights mirror-folded
    into in-window entries)."""
    fn, support = _kernel_fn(kind, b, c)
    scale = dst_dim / src_dim
    step = min(scale, 1.0)
    filter_size = min(max(int(math.ceil(support / step)) * 2, 1), src_dim)
    left = np.empty(dst_dim, np.int64)
    weights = np.zeros((dst_dim, filter_size), np.float64)
    for i in range(dst_dim):
        pos = (i + 0.5) / scale + shift
        fs = max(int(math.ceil(support / step)) * 2, 1)
        begin_pos = (math.floor(pos - fs / 2.0 + 0.5)
                     if pos - fs / 2.0 >= 0
                     else math.ceil(pos - fs / 2.0 - 0.5)) + 0.5
        total = sum(fn((begin_pos + j - pos) * step) for j in range(fs))
        acc: dict[int, float] = {}
        for j in range(fs):
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
        for idx, wv in acc.items():
            weights[i, idx - lo] += wv
    return left, weights


@lru_cache(maxsize=64)
def _zimg_filter_q14(src_dim: int, dst_dim: int, shift: float,
                     kind: str = "bicubic", b: float = 0.0, c: float = 0.5):
    """(left int64[dst], q int32[dst, taps]): the Q14 fixed-point
    quantization zimg applies for integer pixel resizing — per-row error
    feedback, round-half-even (lrint), coefficients * 2^14.  Each row sums
    to exactly 16384, so the unsigned accumulate below is bit-identical to
    zimg's INT16_MIN-biased SIMD form."""
    left, w = _zimg_filter_taps(src_dim, dst_dim, shift, kind, b, c)
    q = np.zeros(w.shape, np.int32)
    for i in range(w.shape[0]):
        err = 0.0
        for k in range(w.shape[1]):
            f = w[i, k] * 16384.0 + err
            qv = int(np.rint(f))
            err = f - qv
            q[i, k] = qv
    return left, q


def _resize_axis_q14(x, src_dim: int, dst_dim: int, shift: float, axis: int,
                     pixel_max: int, kind: str = "bicubic", b: float = 0.0,
                     c: float = 0.5):
    """One integer resize pass, zimg WORD semantics: i32 accumulate of Q14
    taps, pack ``clamp((acc + 2^13) >> 14, 0, pixel_max)``."""
    if dst_dim == src_dim and shift == 0.0:
        return x
    left, q = _zimg_filter_q14(src_dim, dst_dim, shift, kind, b, c)
    taps = q.shape[1]
    shape = [1] * x.ndim
    shape[axis] = dst_dim
    xi = x.astype(jnp.int32)
    acc = None
    for k in range(taps):
        idx = np.clip(left + k, 0, src_dim - 1)
        tap = jnp.take(xi, jnp.asarray(idx), axis=axis)
        term = tap * jnp.asarray(q[:, k].reshape(shape))
        acc = term if acc is None else acc + term
    out = (acc + np.int32(1 << 13)) >> np.int32(14)
    return jnp.clip(out, 0, pixel_max)


def _resize_h_first(xscale: float, yscale: float) -> bool:
    """zimg resize.cpp pass-order cost rule (horizontal taps cost 2x)."""
    h_first_cost = max(xscale, 1.0) * 2.0 + xscale * max(yscale, 1.0)
    v_first_cost = max(yscale, 1.0) + yscale * max(xscale, 1.0) * 2.0
    return h_first_cost < v_first_cost


def _upsample_chroma_int(c, ssw: int, ssh: int, w: int, h: int, bits: int):
    """Integer chroma upsample at storage depth (zimg resizes integer
    pixels in Q14 fixed point BEFORE the float depth conversion; the f32
    path below deviates by ~1 LSB which the SSIMULACRA2 blur goldens
    resolve at rel=1e-3)."""
    ch, cw = c.shape[1], c.shape[2]
    pixel_max = (1 << bits) - 1
    hshift = (1.0 - 1.0 / (1 << ssw)) / 2.0 if ssw else 0.0

    def do_h(x):
        return _resize_axis_q14(x, cw, w, hshift, x.ndim - 1, pixel_max)

    def do_v(x):
        return _resize_axis_q14(x, ch, h, 0.0, x.ndim - 2, pixel_max)

    if _resize_h_first(w / cw, h / ch):
        return do_v(do_h(c))
    return do_h(do_v(c))


def _resize_axis_f32_seq(x, src_dim: int, dst_dim: int, shift: float,
                         axis: int, kind: str = "bicubic", b: float = 0.0,
                         c: float = 0.5):
    """One float resize pass in zimg's FLOAT-pixel kernel order: f32
    coefficients (derived in double, rounded once), sequential per-tap
    accumulate ``acc = w_k * x_k + acc`` left to right (zimg's AVX2 float
    resize ladders are fmadd chains in tap order; XLA rounds the mul and
    add separately, a <=1-ulp-per-tap deviation)."""
    if dst_dim == src_dim and shift == 0.0:
        return x
    left, wts = _zimg_filter_taps(src_dim, dst_dim, shift, kind, b, c)
    w32 = wts.astype(np.float32)
    taps = w32.shape[1]
    shape = [1] * x.ndim
    shape[axis] = dst_dim
    acc = None
    for k in range(taps):
        idx = np.clip(left + k, 0, src_dim - 1)
        tap = jnp.take(x, jnp.asarray(idx), axis=axis)
        term = tap * jnp.asarray(w32[:, k].reshape(shape))
        acc = term if acc is None else acc + term
    return acc


def _upsample_chroma(c, ssw: int, ssh: int, w: int, h: int):
    """zimg-convention chroma upsample to luma dims: Catmull-Rom, left-sited
    horizontally (VS default chromaloc: chroma sample k is co-sited with luma
    column k*2^ssw, i.e. shift +0.25 in chroma units for 2x), centered
    vertically.  Float-pixel path: zimg's sequential per-tap f32 ladders
    (``_resize_axis_f32_seq``), zimg pass order."""
    if ssw == 0 and ssh == 0:
        return c
    ch, cw = c.shape[1], c.shape[2]
    hshift = (1.0 - 1.0 / (1 << ssw)) / 2.0 if ssw else 0.0

    def do_h(x):
        if not ssw:
            return x
        return _resize_axis_f32_seq(x, cw, w, hshift, x.ndim - 1)

    def do_v(x):
        if not ssh:
            return x
        return _resize_axis_f32_seq(x, ch, h, 0.0, x.ndim - 2)

    if _resize_h_first(w / cw, h / ch):
        return do_v(do_h(c))
    return do_h(do_v(c))


def pick_matrix(clip: Clip) -> int:
    """The matrix zimg actually uses for toRGBS: the reference passes
    ``matrix_in = height > 650 ? 709 : 601`` (src/helper.zig:231), but VS
    resize treats ``matrix_in`` as a FALLBACK -- the frame's ``_Matrix``
    prop takes precedence when present and specified.  The reference test
    fixtures convert with ``matrix=1``, which stamps ``_Matrix=1``, so the
    reference goldens were all produced with BT.709 regardless of the
    height rule."""
    m = clip.props.get("_Matrix")
    if isinstance(m, (int, np.integer)):
        m = int(m)
        if m in (5, 6):  # bt470bg / smpte170m: both BT.601 coefficients
            return 6
        if m in _MATRICES:
            return m
    return 1 if clip.height > 650 else 6


def to_rgbs(clip: Clip, matrix: int | None = None) -> Clip:
    """YUV/Gray/RGB -> RGBS (reference toRGBS, src/helper.zig:225-243:
    resize.Bicubic(format=RGBS), matrix from the _Matrix frame prop with
    the height>650 ? 709 : 601 rule as fallback, limited-range YUV
    assumed).  ``matrix`` overrides prop-based selection (used by callers
    that jit with props stripped)."""
    fmt = clip.format
    if fmt.color_family is ColorFamily.RGB:
        if fmt.sample_type is SampleType.FLOAT and fmt.bits_per_sample == 32:
            return clip
        peak = (1 << fmt.bits_per_sample) - 1
        planes = tuple(
            p.astype(jnp.float32) * jnp.float32(1.0 / peak) for p in clip.planes
        )
        return Clip(planes, get_format("RGBS"), dict(clip.props))

    if matrix is None:
        matrix = pick_matrix(clip)
    kr, kb = _MATRICES[matrix]
    kg = 1.0 - kr - kb
    w, h = clip.width, clip.height
    y = _plane_to_float(clip.planes[0], fmt, False)
    if fmt.color_family is ColorFamily.GRAY:
        planes = (y, y, y)
    else:
        ssw, ssh = fmt.subsampling_w, fmt.subsampling_h
        if fmt.sample_type is SampleType.INTEGER and (ssw or ssh):
            # zimg resizes integer pixels at storage depth (Q14 fixed
            # point), then depth-converts to float for the matrix.
            bits = fmt.bits_per_sample
            cb = _plane_to_float(
                _upsample_chroma_int(clip.planes[1], ssw, ssh, w, h, bits),
                fmt, True)
            cr = _plane_to_float(
                _upsample_chroma_int(clip.planes[2], ssw, ssh, w, h, bits),
                fmt, True)
        else:
            cb = _upsample_chroma(
                _plane_to_float(clip.planes[1], fmt, True), ssw, ssh, w, h)
            cr = _upsample_chroma(
                _plane_to_float(clip.planes[2], fmt, True), ssw, ssh, w, h)
        # ncl inverse matrix coefficients, derived in double, applied in f32
        cr_r = jnp.float32(2.0 * (1.0 - kr))
        cb_b = jnp.float32(2.0 * (1.0 - kb))
        cb_g = jnp.float32(-2.0 * (1.0 - kb) * kb / kg)
        cr_g = jnp.float32(-2.0 * (1.0 - kr) * kr / kg)
        r = y + cr_r * cr
        g = y + cb_g * cb + cr_g * cr
        b = y + cb_b * cb
        planes = (r, g, b)
    planes = tuple(p.astype(jnp.float32) for p in planes)
    return Clip(planes, get_format("RGBS"), dict(clip.props))


# Bayer 8x8 ordered-dither matrix (index dither; the rebuild's documented
# stand-in for zimg error diffusion, which is inherently sequential and
# hostile to TPU dataflow).
_BAYER8 = np.array(
    [
        [0, 48, 12, 60, 3, 51, 15, 63],
        [32, 16, 44, 28, 35, 19, 47, 31],
        [8, 56, 4, 52, 11, 59, 7, 55],
        [40, 24, 36, 20, 43, 27, 39, 23],
        [2, 50, 14, 62, 1, 49, 13, 61],
        [34, 18, 46, 30, 33, 17, 45, 29],
        [10, 58, 6, 54, 9, 57, 5, 53],
        [42, 26, 38, 22, 41, 25, 37, 21],
    ],
    np.int32,
)


def _ordered_bias(h: int, w: int, shift: int):
    """Per-pixel rounding bias for a >>shift demote: (bayer+0.5)/64 * 2^shift."""
    by = _BAYER8[np.arange(h)[:, None] & 7, np.arange(w)[None, :] & 7]
    return jnp.asarray(np.round((by + 0.5) / 64.0 * (1 << shift)).astype(np.int32))


def _int_dtype(bits: int):
    return jnp.uint8 if bits <= 8 else (jnp.uint16 if bits <= 16 else jnp.uint32)


def bit_depth(clip: Clip, bits: int, sample_type: SampleType | None = None,
              dither: str = "ordered") -> Clip:
    """Depth conversion (the rebuild's analogue of the reference's
    ``bitDepth`` Resize.Point invoke, src/helper.zig:470-494, used by Deband's
    <16-bit promote/demote and XPSNR's depth matching).

    Integer<->integer conversions are bit shifts (neo-f3kdb's internal
    convention, which the reference filters rely on); integer demotes apply an
    ordered Bayer dither, zimg-exact Floyd-Steinberg with
    ``dither="error_diffusion"`` (native C++, runtime/dither.py — what the
    reference's Deband round trip uses), or round-half-up with
    ``dither="none"``.  Integer<->float converts through full-range
    normalization.
    """
    fmt = clip.format
    st = sample_type or (SampleType.FLOAT if bits == 32 and
                         fmt.sample_type is SampleType.FLOAT else
                         SampleType.INTEGER if bits <= 16 else fmt.sample_type)
    if dither not in ("ordered", "none", "error_diffusion"):
        raise VSZipError(f"bit_depth: unknown dither '{dither}'.")
    if (dither == "error_diffusion" and fmt.sample_type is SampleType.INTEGER
            and st is SampleType.INTEGER and bits < fmt.bits_per_sample):
        from ..runtime.dither import error_diffusion_demote

        shift = fmt.bits_per_sample - bits
        peak = (1 << bits) - 1
        dt = _int_dtype(bits)
        out = []
        for p in clip.planes:
            arr = np.asarray(p).astype(np.uint16)
            frames = [
                error_diffusion_demote(arr[i], 1.0 / (1 << shift), peak)
                for i in range(arr.shape[0])
            ]
            out.append(jnp.asarray(np.stack(frames).astype(dt)))
        return Clip(
            tuple(out),
            fmt.replace(bits_per_sample=bits, sample_type=st),
            dict(clip.props),
        )
    if st is fmt.sample_type and bits == fmt.bits_per_sample:
        return clip

    out = []
    for p in clip.planes:
        if fmt.sample_type is SampleType.INTEGER and st is SampleType.INTEGER:
            if bits >= fmt.bits_per_sample:
                y = p.astype(_int_dtype(bits)) << (bits - fmt.bits_per_sample)
            else:
                shift = fmt.bits_per_sample - bits
                v = p.astype(jnp.int32)
                if dither == "ordered":
                    v = v + _ordered_bias(p.shape[1], p.shape[2], shift)
                else:
                    v = v + (1 << (shift - 1))
                y = jnp.clip(v >> shift, 0, (1 << bits) - 1).astype(
                    _int_dtype(bits))
        elif fmt.sample_type is SampleType.INTEGER:  # int -> float
            peak = (1 << fmt.bits_per_sample) - 1
            y = (p.astype(jnp.float32) / peak).astype(
                jnp.float16 if bits == 16 else jnp.float32)
        elif st is SampleType.INTEGER:  # float -> int
            peak = (1 << bits) - 1
            y = jnp.clip(
                jnp.round(p.astype(jnp.float32) * peak), 0, peak
            ).astype(_int_dtype(bits))
        else:  # float -> float
            y = p.astype(jnp.float16 if bits == 16 else jnp.float32)
        out.append(y)
    return Clip(
        tuple(out),
        fmt.replace(bits_per_sample=bits, sample_type=st),
        dict(clip.props),
    )


# ---------------------------------------------------------------------------
# spatial resize
# ---------------------------------------------------------------------------
#
# The reference delegates spatial resizing to the host runtime's zimg
# resamplers (e.g. the SSIMULACRA2 test's Bicubic 2x distortion recipe,
# reference tests/test_ssimulacra2.py:20-21).  `resize` reproduces zimg's
# semantics: Q14 fixed point for integer pixels (bit-exact), f32 weight
# matmuls on the MXU for float pixels, left-sited chroma siting shifts,
# zimg's h-first/v-first pass-order cost rule.


def _resize_plane_q14(x, dst_h: int, dst_w: int, shift_w: float,
                      shift_h: float, pixel_max: int, kind: str, b: float,
                      c: float):
    """Integer plane resize, zimg WORD pipeline (one Q14 pass per axis)."""
    src_h, src_w = x.shape[-2], x.shape[-1]

    def do_h(v):
        return _resize_axis_q14(v, src_w, dst_w, shift_w, v.ndim - 1,
                                pixel_max, kind, b, c)

    def do_v(v):
        return _resize_axis_q14(v, src_h, dst_h, shift_h, v.ndim - 2,
                                pixel_max, kind, b, c)

    if _resize_h_first(dst_w / src_w, dst_h / src_h):
        return do_v(do_h(x))
    return do_h(do_v(x))


def _resize_plane_f32(x, dst_h: int, dst_w: int, shift_w: float,
                      shift_h: float, kind: str, b: float, c: float):
    """Float plane resize as two MXU matmuls with zimg compute_filter
    weight matrices (f64-built, f32-applied)."""
    src_h, src_w = x.shape[-2], x.shape[-1]

    def do_h(v):
        if dst_w == src_w and shift_w == 0.0:
            return v
        m = jnp.asarray(_zimg_weight_matrix(src_w, dst_w, shift_w, kind, b, c))
        return jnp.einsum("wk,nhk->nhw", m, v,
                          precision=jax.lax.Precision.HIGHEST)

    def do_v(v):
        if dst_h == src_h and shift_h == 0.0:
            return v
        m = jnp.asarray(_zimg_weight_matrix(src_h, dst_h, shift_h, kind, b, c))
        return jnp.einsum("hk,nkw->nhw", m, v,
                          precision=jax.lax.Precision.HIGHEST)

    if _resize_h_first(dst_w / src_w, dst_h / src_h):
        return do_v(do_h(x.astype(jnp.float32)))
    return do_h(do_v(x.astype(jnp.float32)))


def resize(clip: Clip, width: int, height: int, kernel: str = "bicubic",
           b: float = 0.0, c: float = 0.5) -> Clip:
    """Spatial resize of every plane with zimg/VS Resize semantics (the
    reference test suites build distortions with ``clip.resize.Bicubic(w, h)``,
    reference tests/test_ssimulacra2.py:20-21 / conftest.py).  Integer
    formats run the Q14 fixed-point pipeline (bit-exact vs zimg); float
    formats run f32 weight matmuls.  Chroma planes take the left-sited
    (MPEG2, VS default) horizontal siting shift 0.25*(1 - src_c/dst_c);
    vertical siting is centered.  Defaults to Catmull-Rom bicubic
    (b=0, c=0.5), the VS Resize.Bicubic default."""
    fmt = clip.format
    if width % (1 << fmt.subsampling_w) or height % (1 << fmt.subsampling_h):
        raise VSZipError(
            "resize: dimensions must respect the format's subsampling.")
    out = []
    for i, p in enumerate(clip.planes):
        ssw = fmt.subsampling_w if i else 0
        ssh = fmt.subsampling_h if i else 0
        dst_w, dst_h = width >> ssw, height >> ssh
        src_w = p.shape[-1]
        shift_w = 0.25 * (1.0 - src_w / dst_w) if ssw else 0.0
        if fmt.sample_type is SampleType.INTEGER:
            peak = (1 << fmt.bits_per_sample) - 1
            y = _resize_plane_q14(p, dst_h, dst_w, shift_w, 0.0, peak,
                                  kernel, b, c).astype(p.dtype)
        else:
            y = _resize_plane_f32(p, dst_h, dst_w, shift_w, 0.0,
                                  kernel, b, c).astype(p.dtype)
        out.append(y)
    return Clip(tuple(out), fmt, dict(clip.props))


def srgb_to_linear(clip: Clip) -> Clip:
    """sRGB EOTF on an RGBS clip (skipped when the clip already carries
    _Transfer=LINEAR, like the reference's prop check).  The reference
    linearizes via zimg (`resize.Bicubic(transfer=LINEAR)`,
    src/vapoursynth/ssimulacra2.zig:132-162), so this uses zimg gamma.cpp's
    exact-continuity constants (ALPHA=1.055010718947587,
    BETA=0.0030412825601275209), not the canonical 1.055/0.04045 pair."""
    if clip.props.get("_Transfer") == 8:  # LINEAR
        return clip

    alpha = 1.055010718947587
    beta = 0.0030412825601275209

    def lin(v):
        v = v.astype(jnp.float32)
        return jnp.where(
            v < jnp.float32(12.92 * beta),
            v / jnp.float32(12.92),
            jnp.power((v + jnp.float32(alpha - 1.0)) / jnp.float32(alpha),
                      jnp.float32(2.4)),
        )

    planes = tuple(lin(p) for p in clip.planes)
    return Clip(planes, clip.format, {**clip.props, "_Transfer": 8})
