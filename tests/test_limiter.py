"""Limiter tests (mirrors reference tests/test_limiter.py strategy)."""

import numpy as np
import pytest

from golden import Case, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.limiter import limiter

# The reference's exact case list (reference tests/test_limiter.py:12-71),
# so ids resolve against the reference's own goldens/limiter.json.
CASES = (
    sweep(
        base_fmt="GRAY16",
        base_args={"min": [10000], "max": [50000]},
        args=(
            {"min": [20000], "max": [40000]},
            {"min": [0], "max": [30000]},
            {"min": [30000], "max": [65535]},
        ),
        geometries=("odd", "tiny"),
    )
    + [
        Case("GRAY16", args={"min": [10000], "max": [50000]}),
        Case("GRAY8", args={"min": [50], "max": [200]}),
        Case("GRAYH", args={"min": [0.2], "max": [0.8]}),
        Case("GRAYS", args={"min": [0.2], "max": [0.8]}),
        Case("GRAY9", args={"min": [100], "max": [400]}),
        Case("YUV420P9", args={"min": [100, 300, 100], "max": [400, 450, 380]}),
        Case("GRAY12", args={"min": [800], "max": [3000]}),
        Case("YUV444P12", args={"min": [800, 2300, 600], "max": [3000, 3600, 3000]}),
        Case("GRAY14", args={"min": [3000], "max": [12000]}),
        Case("YUV422P14", args={"min": [3000, 9000, 2000], "max": [12000, 14500, 12000]}),
        Case("YUV420P8", args={"min": [40, 20, 30], "max": [200, 220, 190]}),
        Case("YUV420P10", args={"min": [200, 100, 100], "max": [800, 900, 850]}),
        Case("YUV444P16", args={"min": [10000, 20000, 10000], "max": [50000, 55000, 45000]}),
        Case("YUV420PS", args={"min": [0.1, -0.4, -0.4], "max": [0.9, 0.4, 0.4]}),
        Case("RGB24", args={"min": [20, 20, 100], "max": [180, 200, 250]}),
        Case("RGBS", args={"min": [0.1, 0.1, 0.1], "max": [0.7, 0.7, 0.99]}),
        Case("RGBH", args={"min": [0.1, 0.1, 0.1], "max": [0.7, 0.7, 0.99]}),
        Case("YUV444P16", args={"min": [8143, 0, 0], "max": [56803, 65535, 65535]}),
        Case("YUV444P16", args={"min": [10000, 20000, 10000],
                                "max": [50000, 55000, 45000], "planes": [0]}),
        Case("YUV444P16", args={"min": [10000, 20000, 10000],
                                "max": [50000, 55000, 45000], "planes": [1, 2]}),
        Case("RGB24", args={"min": [20, 20, 100], "max": [180, 200, 250],
                            "planes": [0, 2]}),
        Case("RGB24", args={"tv_range": True}),
        Case("RGB27", args={"tv_range": True}),
        Case("RGB36", args={"tv_range": True}),
        Case("RGB48", args={"tv_range": True}),
        Case("YUV420PS", args={"mask": True}),
        Case("YUV420PH", args={"mask": True}),
    ]
    # extra self-pinned coverage beyond the reference list
    + [
        Case("YUV444PS", args={"tv_range": True}),
        Case("YUV440P16", args={"min": [4096, 8192, 8192],
                                "max": [60000, 60000, 60000]}),
    ]
)


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
