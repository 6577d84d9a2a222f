"""f16 <-> f32 parity tests.

For every filter that accepts half-float input, run it on f16 input and on
the *byte-identical* f32 input (the f16 data widened to f32), then assert
the outputs match within f16 output precision.  Identical data in both
containers isolates the filter's f16 code path from input quantization.
Mirrors the reference suite (reference tests/test_f16_parity.py).

Filters that reject f16 outright (Checkmate, CombMask(MT), CLAHE, ColorMap,
Deband, PackRGB, AdaptiveBinarize, XPSNR, SSIMULACRA2, EEDI3, MosquitoNR
int path, ...) are covered by their own validation tests.
"""

import numpy as np
import pytest

from vszip_tpu import Clip, get_format
from vszip_tpu.ops.bilateral import bilateral
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.limit_filter import limit_filter
from vszip_tpu.ops.limiter import limiter
from vszip_tpu.ops.planeaverage import plane_average
from vszip_tpu.ops.planeminmax import plane_minmax

# f16 format -> its matching f32 format
F16_TO_F32 = {
    "GRAYH": "GRAYS",
    "YUV420PH": "YUV420PS",
    "YUV422PH": "YUV422PS",
    "YUV444PH": "YUV444PS",
    "RGBH": "RGBS",
}

F16_FMTS = ["GRAYH", "YUV420PH", "RGBH"]


def widen(clip: Clip) -> Clip:
    """Exact f16 -> f32 container change (no resampling, byte-identical)."""
    f32 = get_format(F16_TO_F32[clip.format.name])
    return Clip.from_planes(
        tuple(np.asarray(p).astype(np.float32) for p in clip.planes), f32
    )


def pair(make_clip, f16_name: str):
    f16 = make_clip(f16_name)
    return f16, widen(f16)


def assert_pixel_parity(out16: Clip, out32: Clip, *, tol: float) -> None:
    for p, (a, b) in enumerate(zip(out16.planes, out32.planes)):
        d = float(
            np.abs(np.asarray(a).astype(np.float32) - np.asarray(b)).max()
        )
        assert d <= tol, f"plane {p}: max|f16-f32| = {d} > {tol}"


def _prop_list(clip, key, n=0):
    v = np.asarray(clip.props[key])
    return [float(x) for x in np.atleast_1d(v[n] if v.ndim else v)]


def assert_prop_parity(out16, out32, keys, *, tol: float) -> None:
    for k in keys:
        for i, (a, b) in enumerate(
            zip(_prop_list(out16, k), _prop_list(out32, k))
        ):
            assert abs(a - b) <= tol, f"{k}[{i}]: f16={a} f32={b} (tol {tol})"


# --- Bilateral ---------------------------------------------------------------
@pytest.mark.parametrize("fmt", F16_FMTS)
@pytest.mark.parametrize(
    "args", [dict(sigmaS=2, sigmaR=2), dict(sigmaS=2, sigmaR=0.02)],
    ids=["smooth", "small_sigmar"],
)
def test_f16_parity_bilateral(make_clip, fmt, args):
    src16, src32 = pair(make_clip, fmt)
    # tol ~ 2 ULP of f16 near 1.0 on the 0..1 float scale.
    assert_pixel_parity(bilateral(src16, **args), bilateral(src32, **args),
                        tol=1e-3)


@pytest.mark.parametrize("fmt", F16_FMTS)
def test_f16_parity_bilateral_ref(make_clip, fmt):
    # Joint (cross) bilateral: ref built in f16 and widened so both inputs
    # are byte-identical across the two runs.
    src16, src32 = pair(make_clip, fmt)
    ref16 = boxblur(src16, hradius=5, vradius=5)
    ref32 = widen(ref16)
    out16 = bilateral(src16, ref=ref16, sigmaS=2, sigmaR=0.05)
    out32 = bilateral(src32, ref=ref32, sigmaS=2, sigmaR=0.05)
    assert_pixel_parity(out16, out32, tol=1e-3)


# --- BoxBlur -----------------------------------------------------------------
_BOXBLUR_ARGS = {
    "comptime": dict(hradius=3, vradius=3),
    "runtime": dict(hradius=6, vradius=3, hpasses=2, vpasses=2),
    "large_radius": dict(hradius=30, vradius=30),
}


@pytest.mark.parametrize("fmt", F16_FMTS)
@pytest.mark.parametrize("path", list(_BOXBLUR_ARGS))
def test_f16_parity_boxblur(make_clip, fmt, path):
    f16, f32 = pair(make_clip, fmt)
    args = _BOXBLUR_ARGS[path]
    assert_pixel_parity(boxblur(f16, **args), boxblur(f32, **args), tol=1e-3)


# --- Limiter -----------------------------------------------------------------
@pytest.mark.parametrize("fmt", F16_FMTS)
def test_f16_parity_limiter_minmax(make_clip, fmt):
    f16, f32 = pair(make_clip, fmt)
    n = f16.format.num_planes
    args = dict(min=[0.1] * n, max=[0.8] * n)
    assert_pixel_parity(limiter(f16, **args), limiter(f32, **args), tol=1e-3)


def test_f16_parity_limiter_default_full_range(make_clip):
    f16, f32 = pair(make_clip, "YUV420PH")
    assert_pixel_parity(limiter(f16), limiter(f32), tol=1e-3)


def test_f16_parity_limiter_mask(make_clip):
    # mask=True forces the rgbf (0..1) range on every plane of a float YUV
    # clip (distinct comptime branch in the reference's dispatch table).
    f16, f32 = pair(make_clip, "YUV420PH")
    assert_pixel_parity(limiter(f16, mask=True), limiter(f32, mask=True),
                        tol=1e-3)


# --- LimitFilter -------------------------------------------------------------
@pytest.mark.parametrize("fmt", F16_FMTS)
def test_f16_parity_limitfilter(make_clip, fmt):
    src16, src32 = pair(make_clip, fmt)
    flt16 = boxblur(src16, hradius=2, vradius=2)
    flt32 = widen(flt16)
    out16 = limit_filter(flt16, src16, dark_thr=8, bright_thr=8, elast=3)
    out32 = limit_filter(flt32, src32, dark_thr=8, bright_thr=8, elast=3)
    assert_pixel_parity(out16, out32, tol=1e-3)


@pytest.mark.parametrize("fmt", F16_FMTS)
def test_f16_parity_limitfilter_ref(make_clip, fmt):
    src16, src32 = pair(make_clip, fmt)
    flt16 = boxblur(src16, hradius=2, vradius=2)
    ref16 = boxblur(src16, hradius=4, vradius=4)
    out16 = limit_filter(flt16, src16, ref16, dark_thr=8, bright_thr=8, elast=3)
    out32 = limit_filter(widen(flt16), src32, widen(ref16),
                         dark_thr=8, bright_thr=8, elast=3)
    assert_pixel_parity(out16, out32, tol=1e-3)


# --- PlaneMinMax -------------------------------------------------------------
@pytest.mark.parametrize("fmt", F16_FMTS)
def test_f16_parity_planeminmax_nothr(make_clip, fmt):
    # No-thr path reads min/max directly off the samples: byte-identical
    # inputs must give EXACTLY equal values.
    f16, f32 = pair(make_clip, fmt)
    out16 = plane_minmax(f16, planes=[0])
    out32 = plane_minmax(f32, planes=[0])
    assert_prop_parity(out16, out32, ["psmMin", "psmMax"], tol=0.0)


@pytest.mark.parametrize("fmt", F16_FMTS)
def test_f16_parity_planeminmax_thr(make_clip, fmt):
    # Threshold path bins by v*65535+0.5 — must be computed in f32 (65535
    # rounds to f16 infinity; the reference documents this trap).
    f16, f32 = pair(make_clip, fmt)
    out16 = plane_minmax(f16, minthr=0.1, maxthr=0.1, planes=[0])
    out32 = plane_minmax(f32, minthr=0.1, maxthr=0.1, planes=[0])
    assert_prop_parity(out16, out32, ["psmMin", "psmMax"], tol=1e-3)


@pytest.mark.parametrize("fmt", F16_FMTS)
def test_f16_parity_planeminmax_diff(make_clip, fmt):
    f16, f32 = pair(make_clip, fmt)
    blur16 = boxblur(f16, hradius=1, vradius=1, planes=[0])
    out16 = plane_minmax(f16, clipb=blur16, planes=[0])
    out32 = plane_minmax(f32, clipb=widen(blur16), planes=[0])
    assert_prop_parity(out16, out32, ["psmDiff"], tol=1e-3)


# --- PlaneAverage ------------------------------------------------------------
@pytest.mark.parametrize("fmt", F16_FMTS)
def test_f16_parity_planeaverage(make_clip, fmt):
    # exclude=[1] excludes peak-white pixels; the int 1 widens to 1.0 in both
    # paths, so a divergent exclude comparison would shift the average.
    f16, f32 = pair(make_clip, fmt)
    out16 = plane_average(f16, exclude=[1])
    out32 = plane_average(f32, exclude=[1])
    assert_prop_parity(out16, out32, ["psmAvg"], tol=1e-3)


@pytest.mark.parametrize("fmt", ["YUV420PH", "RGBH"])
def test_f16_parity_planeaverage_multiplane(make_clip, fmt):
    f16, f32 = pair(make_clip, fmt)
    out16 = plane_average(f16, exclude=[1], planes=[0, 1, 2])
    out32 = plane_average(f32, exclude=[1], planes=[0, 1, 2])
    assert_prop_parity(out16, out32, ["psmAvg"], tol=1e-3)


@pytest.mark.parametrize("fmt", ["GRAYH", "RGBH"])
def test_f16_parity_planeaverage_diff(make_clip, fmt):
    f16, f32 = pair(make_clip, fmt)
    blur16 = boxblur(f16, hradius=3, vradius=3)
    out16 = plane_average(f16, exclude=[1], clipb=blur16)
    out32 = plane_average(f32, exclude=[1], clipb=widen(blur16))
    assert_prop_parity(out16, out32, ["psmAvg", "psmDiff"], tol=1e-3)
