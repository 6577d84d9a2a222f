"""8/10/16-bit integer bit-depth parity tests.

For every filter that accepts more than one integer bit depth, run it on the
same content at each depth, normalize the output to [0,1] by the format
peak, and assert the results match within the precision of the lower depth.
This surfaces bit-depth-specific bugs (a hard-coded 255 peak, overflow at
16-bit, scaling that only holds at one depth, ...).  Mirrors the reference
suite's coverage and documented exclusions
(reference tests/test_int_parity.py).

Content note: the fixture pipeline quantizes EACH depth independently
(zimg-exact conversion, tests/zimg_exact.py), so 10/16-bit fixtures are NOT
bit-shifts of the 8-bit one — they differ by sub-LSB rounding.  Smooth ops
absorb that inside the parity tolerance; threshold-discontinuous ops
(Deband's banding detection, LimitFilter's ramp, MosquitoNR's wavelet
thresholding) legitimately flip branches on it, so those tests build ONE
8-bit base clip and expand it to each depth by exact bit-shift
(`_shifted_family`), exactly the reference's Point-upscale trick
(reference tests/test_int_parity.py:203-217).

Not covered (same rationale as the reference):
* single-int-depth filters — Checkmate, CombMask, CombMaskMT, ColorMap,
  AdaptiveBinarize, Compress (all u8-only);
* PackRGB — output is a depth-specific bit packing, values incomparable;
* CLAHE — histogram equalisation with 2^depth bins is depth-resolution
  dependent by design (reference tests/test_int_parity.py:231-242);
* EEDI3 — float-only.
"""

import numpy as np
import pytest

from vszip_tpu.ops.bilateral import bilateral
from vszip_tpu.ops.bilateral_dither import bilateral_dither
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.deband import deband
from vszip_tpu.ops.limit_filter import limit_filter
from vszip_tpu.ops.limiter import limiter
from vszip_tpu.ops.mosquito_nr import mosquito_nr
from vszip_tpu.ops.planeaverage import plane_average
from vszip_tpu.ops.planeminmax import plane_minmax
from vszip_tpu.ops.ssimulacra2 import ssimulacra2
from vszip_tpu.ops.xpsnr import xpsnr


def peak(bits: int) -> int:
    return (1 << bits) - 1


# (bits, format) sets per colour family; filters use the subset they accept.
GRAY = [(8, "GRAY8"), (10, "GRAY10"), (16, "GRAY16")]
YUV420 = [(8, "YUV420P8"), (10, "YUV420P10"), (16, "YUV420P16")]
YUV444 = [(8, "YUV444P8"), (10, "YUV444P10"), (16, "YUV444P16")]
RGB = [(8, "RGB24"), (10, "RGB30"), (16, "RGB48")]

FAMILIES = {"gray": GRAY, "yuv420": YUV420, "yuv444": YUV444, "rgb": RGB}


def _shifted_family(make_clip, family):
    """[(bits, clip)] with shift-consistent content: the family's 8-bit
    fixture expanded to each depth by exact bit shift (the reference's
    `base.resize.Point(format=fmt)` — zimg's limited/full int promote is a
    left shift, reference tests/test_int_parity.py:203-217)."""
    from vszip_tpu import bit_depth

    fams = FAMILIES[family]
    _, base_fmt = min(fams, key=lambda bf: bf[0])
    base = make_clip(base_fmt)
    return [
        (bits, base if bits == 8 else bit_depth(base, bits))
        for bits, fmt in fams
    ]


def _norm_planes(clip):
    pk = peak(clip.format.bits_per_sample)
    return [np.asarray(p).astype(np.float64) / pk for p in clip.planes]


def assert_pixel_parity(results, *, lsb: float = 4.0) -> None:
    """results: list of (bits, clip).  Compare every lower-depth result to
    the highest-depth one on the normalized scale; tolerance is `lsb` LSBs
    of the lower depth (its inherent quantization)."""
    results = sorted(results, key=lambda r: -r[0])
    hi_bits, hi_clip = results[0]
    ref = _norm_planes(hi_clip)
    for bits, clip in results[1:]:
        cur = _norm_planes(clip)
        tol = lsb / peak(bits)
        for p, (a, b) in enumerate(zip(ref, cur)):
            d = float(np.abs(a - b).max())
            assert d <= tol, (
                f"{bits}-bit vs {hi_bits}-bit, plane {p}: "
                f"max|dnorm| = {d} > {tol} ({lsb} LSB)"
            )


def _prop_list(clip, key, n=0):
    v = np.asarray(clip.props[key])
    return [float(x) for x in np.atleast_1d(v[n] if v.ndim else v)]


def assert_prop_parity(results, keys, *, tol: float, n: int = 0) -> None:
    results = sorted(results, key=lambda r: -r[0])
    hi_bits, hi_clip = results[0]
    for bits, clip in results[1:]:
        for k in keys:
            ref = _prop_list(hi_clip, k, n)
            cur = _prop_list(clip, k, n)
            for i, (a, b) in enumerate(zip(ref, cur)):
                assert abs(a - b) <= tol, (
                    f"{k}[{i}]: {bits}-bit={b} {hi_bits}-bit={a} (tol {tol})"
                )


# --- Bilateral ---------------------------------------------------------------
# sigmaS is in pixels and sigmaR a 0..1 fraction (range LUT normalizes by the
# per-depth peak, reference src/filters/bilateral.zig LUT builders), so the
# same args are valid at every depth.
@pytest.mark.parametrize("family", ["gray", "yuv420", "rgb"])
@pytest.mark.parametrize(
    "args", [dict(sigmaS=2, sigmaR=2), dict(sigmaS=2, sigmaR=0.02)],
    ids=["smooth", "sharp_range"],
)
def test_int_parity_bilateral(make_clip, family, args):
    results = [
        (bits, bilateral(make_clip(fmt), **args))
        for bits, fmt in FAMILIES[family]
    ]
    assert_pixel_parity(results)


# --- BoxBlur -----------------------------------------------------------------
# Two arg sets hit both dispatch paths: comptime (hr==vr<=22, 1 pass) and
# runtime (asymmetric + multi-pass); the fixed-point reciprocal depends only
# on ksize, never depth (reference src/filters/boxblur_comptime.zig:10-159).
_BOXBLUR_ARGS = {
    "comptime": dict(hradius=3, vradius=3),
    "runtime": dict(hradius=6, vradius=3, hpasses=2, vpasses=2),
}


@pytest.mark.parametrize("family", ["gray", "yuv420", "rgb"])
@pytest.mark.parametrize("path", list(_BOXBLUR_ARGS))
def test_int_parity_boxblur(make_clip, family, path):
    results = [
        (bits, boxblur(make_clip(fmt), **_BOXBLUR_ARGS[path]))
        for bits, fmt in FAMILIES[family]
    ]
    assert_pixel_parity(results)


# --- Limiter -----------------------------------------------------------------
@pytest.mark.parametrize("family", ["gray", "yuv420", "rgb"])
def test_int_parity_limiter_minmax(make_clip, family):
    # Explicit min/max are RAW pixel values; scale them per depth so the SAME
    # normalized band [0.1, 0.8] is clamped everywhere.
    results = []
    for bits, fmt in FAMILIES[family]:
        clip = make_clip(fmt)
        np_ = clip.format.num_planes
        band = dict(min=[round(0.1 * peak(bits))] * np_,
                    max=[round(0.8 * peak(bits))] * np_)
        results.append((bits, limiter(clip, **band)))
    assert_pixel_parity(results)


@pytest.mark.parametrize("family", ["gray", "yuv420", "rgb"])
def test_int_parity_limiter_tv_range_default(make_clip, family):
    # tv_range=True selects per-depth comptime range tables
    # ([16<<(b-8), 235<<(b-8)] etc., reference src/filters/limiter.zig:66-91).
    results = [
        (bits, limiter(make_clip(fmt), tv_range=True))
        for bits, fmt in FAMILIES[family]
    ]
    assert_pixel_parity(results)


# --- LimitFilter -------------------------------------------------------------
# dark_thr/bright_thr are 8-bit-scale values scaled per depth internally
# (reference src/vapoursynth/limit_filter.zig:106-110).
def _lf_results(make_clip, family, *, ref=False, **args):
    results = []
    for bits, src in _shifted_family(make_clip, family):
        flt = boxblur(src, hradius=2, vradius=2)
        r = boxblur(src, hradius=4, vradius=4) if ref else None
        results.append((bits, limit_filter(flt, src, r, **args)))
    return results


@pytest.mark.parametrize("family", ["gray", "yuv420"])
@pytest.mark.parametrize(
    "dark,bright,elast", [(4, 4, 2), (16, 2, 4), (8, 16, 1.5)]
)
def test_int_parity_limitfilter(make_clip, family, dark, bright, elast):
    results = _lf_results(
        make_clip, family, dark_thr=dark, bright_thr=bright, elast=elast
    )
    assert_pixel_parity(results)


def test_int_parity_limitfilter_per_plane(make_clip):
    results = _lf_results(
        make_clip, "yuv420",
        dark_thr=[16, 4], bright_thr=[16, 4], elast=[4, 2],
    )
    assert_pixel_parity(results)


@pytest.mark.parametrize("family", ["gray", "yuv420"])
def test_int_parity_limitfilter_ref(make_clip, family):
    # The soft-limit amplifies per-depth BoxBlur rounding in both flt and ref
    # near the transition; larger inherent divergence, hence the looser bound
    # (the reference uses lsb=14 for the same reason).
    results = _lf_results(
        make_clip, family, ref=True, dark_thr=8, bright_thr=8, elast=3
    )
    assert_pixel_parity(results, lsb=14.0)


# --- Deband ------------------------------------------------------------------
# thr is on the 8-bit scale (scaled to the u16 internal range per depth);
# grain=0 + fixed seed -> deterministic.  Lower depths differ only by the
# dither-back quantization of the 16-bit internal result.
@pytest.mark.parametrize("family", ["gray", "yuv420"])
@pytest.mark.parametrize(
    ("sample_mode", "blur_first"),
    [(1, True), (2, True), (2, False), (5, True), (7, True)],
)
def test_int_parity_deband(make_clip, family, sample_mode, blur_first):
    results = [
        (bits, deband(clip, thr=48, grain=0, seed=7,
                      sample_mode=sample_mode, blur_first=blur_first))
        for bits, clip in _shifted_family(make_clip, family)
    ]
    assert_pixel_parity(results, lsb=4.0)


# --- BilateralDither (not in the reference suite; same invariant applies) ----
@pytest.mark.parametrize("family", ["gray", "yuv420"])
def test_int_parity_bilateral_dither(make_clip, family):
    results = [
        (bits, bilateral_dither(make_clip(fmt), radius=8))
        for bits, fmt in FAMILIES[family]
    ]
    assert_pixel_parity(results)


# --- MosquitoNR (not in the reference suite; same invariant applies) ---------
@pytest.mark.parametrize("family", ["gray", "yuv420"])
def test_int_parity_mosquito(make_clip, family):
    results = [
        (bits, mosquito_nr(clip))
        for bits, clip in _shifted_family(make_clip, family)
    ]
    assert_pixel_parity(results)


# --- PlaneAverage ------------------------------------------------------------
# psmAvg/psmDiff are normalized to [0,1] per depth; exclude is a RAW pixel
# value, scaled per depth to exclude the same fractional intensities.
_PA_PLANES = {"gray": [0], "yuv420": [0, 1, 2], "rgb": [0, 1, 2]}
_PA_LSB = 2.0


def _pa_exclude(bits, fracs):
    return [round(fr * peak(bits)) for fr in fracs]


@pytest.mark.parametrize("family", ["gray", "yuv420", "rgb"])
def test_int_parity_planeaverage_avg(make_clip, family):
    results = [
        (bits, plane_average(make_clip(fmt),
                             exclude=_pa_exclude(bits, [0.5, 0.7]),
                             planes=_PA_PLANES[family]))
        for bits, fmt in FAMILIES[family]
    ]
    lo_bits = min(b for b, _ in results)
    assert_prop_parity(results, ["psmAvg"], tol=_PA_LSB / peak(lo_bits))


@pytest.mark.parametrize("family", ["gray", "yuv420", "rgb"])
def test_int_parity_planeaverage_diff(make_clip, family):
    results = []
    for bits, fmt in FAMILIES[family]:
        src = make_clip(fmt)
        dist = boxblur(src, hradius=2, vradius=2)
        results.append(
            (bits, plane_average(src, exclude=[-1], clipb=dist,
                                 planes=_PA_PLANES[family]))
        )
    lo_bits = min(b for b, _ in results)
    tol = _PA_LSB / peak(lo_bits)
    assert_prop_parity(results, ["psmAvg", "psmDiff"], tol=tol)


# --- PlaneMinMax -------------------------------------------------------------
# psmMin/psmMax are RAW per depth for int -> normalize by peak(bits) by hand;
# psmDiff is stored normalized (scale-free).
@pytest.mark.parametrize("family", ["gray", "yuv420", "rgb"])
def test_int_parity_planeminmax_minmax(make_clip, family):
    norm = []
    for bits, fmt in FAMILIES[family]:
        out = plane_minmax(make_clip(fmt), minthr=0.1, maxthr=0.1,
                           planes=_PA_PLANES[family])
        mn = [v / peak(bits) for v in _prop_list(out, "psmMin")]
        mx = [v / peak(bits) for v in _prop_list(out, "psmMax")]
        norm.append((bits, mn, mx))
    norm.sort(key=lambda r: -r[0])
    hi_bits, hi_min, hi_max = norm[0]
    for bits, nmin, nmax in norm[1:]:
        tol = 4.0 / peak(bits)
        for pi, (a, b) in enumerate(zip(hi_min, nmin)):
            assert abs(a - b) <= tol, f"Min plane {pi}: {bits}b={b} vs {a}"
        for pi, (a, b) in enumerate(zip(hi_max, nmax)):
            assert abs(a - b) <= tol, f"Max plane {pi}: {bits}b={b} vs {a}"


@pytest.mark.parametrize("family", ["gray", "yuv420", "rgb"])
def test_int_parity_planeminmax_diff(make_clip, family):
    results = []
    for bits, fmt in FAMILIES[family]:
        src = make_clip(fmt)
        ref = boxblur(src, hradius=1, vradius=1)
        results.append(
            (bits, plane_minmax(src, minthr=0.1, maxthr=0.1, clipb=ref,
                                planes=_PA_PLANES[family]))
        )
    assert_prop_parity(results, ["psmDiff"], tol=2e-3)


# --- SSIMULACRA2 -------------------------------------------------------------
# Score is depth-independent by construction (internal toRGBS normalizes by
# the per-depth peak); tol=0.5 absolute passes legitimate quantization but a
# wrong-peak bug shifts the score by tens of points.
@pytest.mark.parametrize("family", ["yuv420", "yuv444"])
@pytest.mark.parametrize("r", [1, 3], ids=["blur1", "blur3"])
def test_int_parity_ssimulacra2(make_clip, family, r):
    results = []
    for bits, fmt in FAMILIES[family]:
        ref = make_clip(fmt)
        results.append((bits, ssimulacra2(ref, boxblur(ref, hradius=r, vradius=r))))
    assert_prop_parity(results, ["SSIMULACRA2"], tol=0.5)


# --- XPSNR -------------------------------------------------------------------
# YUV 8/10-bit only; the dB score is peak-normalized by construction.  A
# wrong peak shifts ~12 dB, far beyond the 0.15 dB tolerance.
_XPSNR_FAMILIES = {
    "420": [(8, "YUV420P8"), (10, "YUV420P10")],
    "422": [(8, "YUV422P8"), (10, "YUV422P10")],
    "444": [(8, "YUV444P8"), (10, "YUV444P10")],
}


@pytest.mark.parametrize("temporal", [True, False], ids=["temporal", "spatial"])
@pytest.mark.parametrize("family", list(_XPSNR_FAMILIES))
def test_int_parity_xpsnr(make_temporal_clip, family, temporal):
    results = []
    for bits, fmt in _XPSNR_FAMILIES[family]:
        ref = make_temporal_clip(fmt)
        dist = boxblur(ref, hradius=2, vradius=2)
        results.append((bits, xpsnr(ref, dist, temporal=temporal)))
    keys = ["XPSNR_Y", "XPSNR_U", "XPSNR_V"]
    for n in range(3):
        assert_prop_parity(results, keys, tol=0.15, n=n)
