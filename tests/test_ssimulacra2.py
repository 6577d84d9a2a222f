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


@pytest.mark.parametrize("crop", [(96, 64), (13, 7)], ids=["small", "tiny"])
def test_matches_literal_oracle(make_clip, crop):
    """Metric math pinned independently of the op's own goldens: sequential
    NumPy transcription of reference src/filters/ssimulacra2.zig:46-663
    (tests/oracle/ssimulacra2_ref.py) vs the op on linear RGB input
    (_Transfer=8 skips the sRGB EOTF on both sides)."""
    from oracle.ssimulacra2_ref import ssimulacra2_frame_ref
    from vszip_tpu import Clip, get_format

    cw, ch = crop
    src = make_clip("RGBS")
    p1 = [np.asarray(p)[:, 100 : 100 + ch, 200 : 200 + cw] for p in src.planes]
    p2 = [np.asarray(p) for p in
          boxblur(Clip.from_planes(tuple(p1), get_format("RGBS")),
                  hradius=2, vradius=2).planes]
    lin = {"_Transfer": 8}
    c1 = Clip.from_planes(tuple(p1), get_format("RGBS"), lin)
    c2 = Clip.from_planes(tuple(p2), get_format("RGBS"), lin)
    got = float(np.asarray(ssimulacra2(c1, c2).props["SSIMULACRA2"])[0])
    want = ssimulacra2_frame_ref([p[0] for p in p1], [p[0] for p in p2])
    assert got == pytest.approx(want, rel=1e-3, abs=0.05)


def test_reference_anchor(make_clip):
    """The reference's golden recipe — bicubic 2x up then back down on the
    640x320 YUV420P16 crop of image.png — scores 68.62493918303275 there
    (reference tests/test_ssimulacra2.py:74-76).  Fixtures now decode the
    same photo, so the same recipe must land close here; the residual is the
    documented resampler deviations (box-chroma RGB->YUV fixture conversion
    vs zimg bicubic, bilinear chroma upsampling inside to_rgbs)."""
    from vszip_tpu import resize

    clip = make_clip("YUV420P16")
    dist = resize(resize(clip, 1280, 640), 640, 320)
    s = float(np.asarray(ssimulacra2(clip, dist).props["SSIMULACRA2"])[0])
    assert abs(s - 68.62493918303275) < 2.0


def test_identical_constant_clip():
    """Reference contract: identical constant clips score exactly 100
    (reference tests/test_ssimulacra2.py:66-68)."""
    from vszip_tpu import Clip, get_format

    planes = (
        np.full((1, 64, 64), 30000, np.uint16),
        np.full((1, 32, 32), 20000, np.uint16),
        np.full((1, 32, 32), 40000, np.uint16),
    )
    clip = Clip.from_planes(planes, get_format("YUV420P16"))
    s = float(np.asarray(ssimulacra2(clip, clip).props["SSIMULACRA2"])[0])
    assert s == 100.0


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
