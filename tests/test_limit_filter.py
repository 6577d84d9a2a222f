"""LimitFilter tests."""

import numpy as np
import pytest

from fixtures import crop_abs
from golden import Case, sweep
from oracle.pointwise_ref import limit_filter_ref
from vszip_tpu import VSZipError
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.limit_filter import limit_filter

CASES = sweep(
    base_fmt="YUV420P16",
    base_args={"thr": 2},
    formats=("GRAY8", "GRAY16", "GRAYS", "YUV420P8", "YUV420P16", "YUV422P8",
             "RGB24", "YUV444PS"),
    args=(
        {"thr": 1},
        {"thr": 4, "elast": 4},
        {"dark_thr": 1, "bright_thr": 6},
        {"planes": [0]},
    ),
    geometries=("odd",),
) + [
    # tiny YUV420 chroma is too small for the radius-2 helper blur
    Case("GRAY8", "tiny", {"thr": 2}),
]


def _flt_src(clip):
    flt = boxblur(clip, hradius=2, vradius=2)
    return flt, clip


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    args = dict(case.args)
    thr = args.pop("thr", None)
    if thr is not None:
        args.setdefault("dark_thr", thr)
        args.setdefault("bright_thr", thr)
    clip = make_clip(case.fmt, case.geometry)
    flt, src = _flt_src(clip)
    out = limit_filter(flt, src, **args)
    golden.check("limitfilter", case, out)


@pytest.mark.parametrize("fmt", ["GRAY8", "GRAY16", "GRAYS"])
def test_matches_literal_oracle(make_clip, fmt):
    clip = crop_abs(make_clip(fmt), width=48, height=40, left=100, top=60)
    flt, src = _flt_src(clip)
    out = limit_filter(flt, src, dark_thr=2, bright_thr=3, elast=3)
    from vszip_tpu.core.params import scale_value

    dt = scale_value(2.0, flt)
    bt = scale_value(3.0, flt)
    ref = limit_filter_ref(
        np.asarray(flt.planes[0][0]), np.asarray(src.planes[0][0]),
        np.asarray(src.planes[0][0]), dt, bt, 3.0,
    )
    got = np.asarray(out.planes[0][0])
    if np.issubdtype(got.dtype, np.integer):
        np.testing.assert_array_equal(got, ref)
    else:
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_thr_zero_returns_src(make_clip):
    """thr=0: every diff >= thr2=0 -> output == src."""
    clip = make_clip("GRAY16")
    flt, src = _flt_src(clip)
    out = limit_filter(flt, src, dark_thr=0, bright_thr=0)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), np.asarray(src.planes[0]))


def test_huge_thr_returns_flt(make_clip):
    clip = make_clip("GRAY8")
    flt, src = _flt_src(clip)
    out = limit_filter(flt, src, dark_thr=255, bright_thr=255)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), np.asarray(flt.planes[0]))


def test_ref_clip_equals_src_default(make_clip):
    clip = make_clip("GRAY16")
    flt, src = _flt_src(clip)
    a = limit_filter(flt, src)
    b = limit_filter(flt, src, ref=src)
    np.testing.assert_array_equal(np.asarray(a.planes[0]), np.asarray(b.planes[0]))


def test_unprocessed_planes_from_flt(make_clip):
    clip = make_clip("YUV420P16")
    flt, src = _flt_src(clip)
    out = limit_filter(flt, src, planes=[0])
    np.testing.assert_array_equal(np.asarray(out.planes[1]), np.asarray(flt.planes[1]))


def test_errors(make_clip):
    clip = make_clip("YUV420P16")
    flt, src = _flt_src(clip)
    with pytest.raises(VSZipError, match="same width and height"):
        limit_filter(flt, crop_abs(src, 64, 64))
    with pytest.raises(VSZipError, match="out of range"):
        limit_filter(flt, src, dark_thr=300)
    with pytest.raises(VSZipError, match="not supported Int format"):
        limit_filter(make_clip("GRAY32"), make_clip("GRAY32"))
