"""AdaptiveBinarize tests (reference tests/test_adaptive_binarize.py case
list; companion clip2 is the reference's std.BoxBlur via tests/vsstd.py)."""

import numpy as np
import pytest

import vsstd
from golden import Case, grid, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.adaptive_binarize import adaptive_binarize
from vszip_tpu.ops.boxblur import boxblur


def _clip2(src, variant: str = ""):
    r = 12 if variant == "wide" else 5
    return vsstd.boxblur(src, hradius=r, vradius=r)


CASES = (
    sweep(
        base_fmt="GRAY8",
        base_args={"c": 3},
        formats=("GRAY8", "YUV420P8"),
        args=grid(c=[0, 3, 6, 12]) + [{"c": -5}],
        geometries=("odd", "tiny"),
    )
    + [
        Case("GRAY8", args={"c": 3}, variant="wide"),
        Case("YUV420P8", args={"c": 6}, variant="wide"),
        Case("YUV420P8", args={"c": 0}),
        Case("YUV420P8", args={"c": 12}),
        Case("YUV420P8", geometry="odd", args={"c": 6}),
        Case("YUV420P8", geometry="tiny", args={"c": 6}),
        Case("GRAY8", geometry="odd", args={"c": 12}),
        Case("GRAY8", geometry="tiny", args={"c": 12}),
        Case("RGB24", args={"c": 3}),
        Case("RGB24", args={"c": 6}),
        Case("RGB24", args={"c": 3}, variant="wide"),
        Case("RGB24", geometry="odd", args={"c": 3}),
        Case("RGB24", geometry="tiny", args={"c": 3}),
    ]
)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    clip = make_clip(case.fmt, case.geometry)
    out = adaptive_binarize(clip, _clip2(clip, case.variant), **case.args)
    golden.check("adaptive_binarize", case, out)


def test_reference_literal_average(make_clip):
    """reference tests/test_adaptive_binarize.py:59-63."""
    from golden import plane_stats

    src = make_clip("GRAY8")
    out = adaptive_binarize(src, _clip2(src))
    assert plane_stats(out)["avg"] == pytest.approx(0.45087890625, rel=1e-6)


def test_semantics(make_clip):
    clip = make_clip("GRAY8")
    blurred = boxblur(clip, hradius=3, vradius=3)
    out = np.asarray(adaptive_binarize(clip, blurred, c=3).planes[0])
    s1 = np.asarray(clip.planes[0]).astype(np.int16)
    s2 = np.asarray(blurred.planes[0]).astype(np.int16)
    ref = np.where(s2 - s1 >= 3, 255, 0).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)
    assert set(np.unique(out)) <= {0, 255}


def test_color_range_prop(make_clip):
    clip = make_clip("GRAY8")
    out = adaptive_binarize(clip, clip)
    assert out.props["_ColorRange"] == 0


def test_c_extremes(make_clip):
    clip = make_clip("GRAY8")
    # c very negative -> always true -> all 255
    out = np.asarray(adaptive_binarize(clip, clip, c=-256).planes[0])
    assert (out == 255).all()
    # src2==src1, c=1 -> all 0
    out0 = np.asarray(adaptive_binarize(clip, clip, c=1).planes[0])
    assert (out0 == 0).all()


def test_errors(make_clip):
    with pytest.raises(VSZipError, match="only 8 bit int format supported"):
        adaptive_binarize(make_clip("GRAY16"), make_clip("GRAY16"))
    with pytest.raises(VSZipError, match="same width and height"):
        from fixtures import crop_abs

        c = make_clip("GRAY8")
        adaptive_binarize(c, crop_abs(c, 64, 64))
