"""Limiter tests (mirrors reference tests/test_limiter.py strategy)."""

import numpy as np
import pytest

from golden import Case, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.limiter import limiter

CASES = sweep(
    base_fmt="YUV420P16",
    base_args={},
    formats=("GRAY8", "GRAY16", "GRAY32", "GRAYS", "YUV420P8", "YUV420P16",
             "YUV444PS", "YUV440P16", "RGB24", "RGB48", "RGBS"),
    args=(
        {"tv_range": True},
        {"tv_range": True, "mask": True},
        {"min": [4096, 8192, 8192], "max": [60000, 60000, 60000]},
        {"planes": [0]},
    ),
    geometries=("odd", "tiny"),
) + [
    Case("RGB24", "full", {"tv_range": True}),
    Case("YUV444PS", "full", {"tv_range": True}),
    Case("GRAY8", "full", {"min": [16], "max": [100]}),
]


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    clip = make_clip(case.fmt, case.geometry)
    out = limiter(clip, **case.args)
    golden.check("limiter", case, out)


def test_explicit_clamp_values(make_clip):
    clip = make_clip("GRAY16")
    out = np.asarray(limiter(clip, min=[1000], max=[50000]).planes[0])
    assert out.min() >= 1000 and out.max() <= 50000
    src = np.asarray(clip.planes[0])
    np.testing.assert_array_equal(out, np.clip(src, 1000, 50000))


def test_tv_range_tables(make_clip):
    out = limiter(make_clip("YUV420P8"), tv_range=True)
    y = np.asarray(out.planes[0])
    u = np.asarray(out.planes[1])
    assert y.min() >= 16 and y.max() <= 235
    assert u.min() >= 16 and u.max() <= 240
    # mask=True treats YUV like RGB: chroma limited to 235 too
    outm = limiter(make_clip("YUV420P8"), tv_range=True, mask=True)
    assert np.asarray(outm.planes[1]).max() <= 235


def test_float_ranges(make_clip):
    out = limiter(make_clip("YUV444PS"))
    assert np.asarray(out.planes[0]).min() >= 0.0
    assert np.asarray(out.planes[1]).min() >= -0.5
    assert np.asarray(out.planes[1]).max() <= 0.5


def test_full_range_noop_u8(make_clip):
    clip = make_clip("GRAY8")
    out = limiter(clip)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), np.asarray(clip.planes[0]))


def test_errors(make_clip):
    clip = make_clip("YUV420P8")
    with pytest.raises(VSZipError, match="min array is set but max"):
        limiter(clip, min=[0, 0, 0])
    with pytest.raises(VSZipError, match="max array is set but min"):
        limiter(clip, max=[255, 255, 255])
    with pytest.raises(VSZipError, match="same number of elements"):
        limiter(clip, min=[0], max=[255, 255, 255])
    with pytest.raises(VSZipError, match="less than or equal to max"):
        limiter(clip, min=[200, 0, 0], max=[100, 255, 255])
    with pytest.raises(VSZipError, match="less than or equal to peak"):
        limiter(clip, min=[0, 0, 0], max=[300, 255, 255])
