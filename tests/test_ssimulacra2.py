"""SSIMULACRA2 tests (golden scores + behavioral contracts mirroring the
reference's test_ssimulacra2.py strategy)."""

import numpy as np
import pytest

from golden import Case
from vszip_tpu import VSZipError
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.ssimulacra2 import ssimulacra2

CASES = [
    Case("YUV420P16", "full", {"dist": "blur2"}),
    Case("YUV420P8", "full", {"dist": "blur2"}),
    Case("YUV444PS", "full", {"dist": "blur2"}),
    Case("RGB24", "full", {"dist": "blur2"}),
    Case("RGBS", "full", {"dist": "blur2"}),
    Case("GRAY16", "full", {"dist": "blur2"}),
    Case("YUV420P16", "odd", {"dist": "blur2"}),
    Case("YUV420P16", "full", {"dist": "blur5"}),
]


def _distort(clip, kind):
    r = {"blur2": 2, "blur5": 5}[kind]
    return boxblur(clip, hradius=r, vradius=r)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    clip = make_clip(case.fmt, case.geometry)
    out = ssimulacra2(clip, _distort(clip, case.args["dist"]))
    golden.check_value(
        "ssimulacra2", case, float(np.asarray(out.props["SSIMULACRA2"])[0]),
        rel=1e-3,
    )


def test_identical_high(make_clip):
    clip = make_clip("YUV420P16")
    s = float(np.asarray(ssimulacra2(clip, clip).props["SSIMULACRA2"])[0])
    assert s > 99.0


def test_monotonic_with_distortion(make_clip):
    clip = make_clip("YUV420P16")
    s1 = float(np.asarray(ssimulacra2(clip, _distort(clip, "blur2")).props["SSIMULACRA2"])[0])
    s2 = float(np.asarray(ssimulacra2(clip, _distort(clip, "blur5")).props["SSIMULACRA2"])[0])
    assert s2 < s1 < 99.0


def test_symmetry_not_required_but_sane(make_clip):
    clip = make_clip("YUV420P16")
    d = _distort(clip, "blur2")
    ab = float(np.asarray(ssimulacra2(clip, d).props["SSIMULACRA2"])[0])
    ba = float(np.asarray(ssimulacra2(d, clip).props["SSIMULACRA2"])[0])
    assert abs(ab - ba) < 20  # asymmetric metric, same ballpark


def test_output_carries_reference_planes(make_clip):
    clip = make_clip("YUV420P16")
    out = ssimulacra2(clip, _distort(clip, "blur2"))
    np.testing.assert_array_equal(np.asarray(out.planes[0]), np.asarray(clip.planes[0]))


def test_errors(make_clip):
    from fixtures import crop_abs

    clip = make_clip("YUV420P16")
    with pytest.raises(VSZipError, match="same dimensions"):
        ssimulacra2(clip, crop_abs(clip, 64, 64))
    with pytest.raises(VSZipError, match="half precision"):
        ssimulacra2(make_clip("YUV444PH"), make_clip("YUV444PH"))
