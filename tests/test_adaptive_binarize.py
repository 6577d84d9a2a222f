"""AdaptiveBinarize tests."""

import numpy as np
import pytest

from golden import Case, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.adaptive_binarize import adaptive_binarize
from vszip_tpu.ops.boxblur import boxblur

CASES = sweep(
    base_fmt="GRAY8",
    base_args={},
    formats=("GRAY8", "YUV420P8"),
    args=({"c": 0}, {"c": -10}, {"c": 10}, {"c": 255}),
    geometries=("odd", "tiny"),
)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    clip = make_clip(case.fmt, case.geometry)
    blurred = boxblur(clip, hradius=3, vradius=3)
    out = adaptive_binarize(clip, blurred, **case.args)
    golden.check("adaptive_binarize", case, out)


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
