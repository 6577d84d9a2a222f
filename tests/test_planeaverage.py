"""PlaneAverage tests."""

import numpy as np
import pytest

from golden import Case, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.planeaverage import plane_average

CASES = sweep(
    base_fmt="YUV420P16",
    base_args={},
    formats=("GRAY8", "GRAY16", "GRAY32", "GRAYH", "GRAYS",
             "YUV420P8", "YUV420P16", "YUV444PS", "RGB24", "RGBS"),
    args=(
        {"planes": [0, 1, 2]},
        {"exclude": [0, 65535]},
        {"with_b": 1},
        {"with_b": 1, "planes": [0, 1, 2]},
    ),
    geometries=("odd", "tiny"),
) + [
    # planes subsets (reference tests/test_planeaverage.py:45-52)
    Case("YUV420P8", "full", {"planes": [1]}),
    Case("YUV420P8", "full", {"planes": [0, 2]}),
    Case("RGB24", "full", {"planes": [0, 1, 2]}),
    Case("RGBS", "full", {"planes": [0, 1, 2]}),
    # active exclude on multi-plane
    Case("YUV420P8", "full", {"exclude": [128], "planes": [0, 1, 2]}),
    # prop rename with an active exclude
    Case("GRAY8", "full", {"exclude": [128], "prop": "myavg"}),
    # float clipb diff branch (diffacc/total, no peak division)
    Case("GRAYS", "full", {"with_b": 1}),
]


def _run(make_clip, case):
    args = dict(case.args)
    with_b = args.pop("with_b", 0)
    clip = make_clip(case.fmt, case.geometry)
    clipb = boxblur(clip, hradius=2, vradius=2, planes=[0]) if with_b else None
    return plane_average(clip, clipb=clipb, **args)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    if case.geometry == "tiny" and "with_b" in case.args and case.fmt.startswith("YUV"):
        pytest.skip("tiny chroma too small for helper blur")
    out = _run(make_clip, case)
    vals = {k: np.asarray(v)[0].tolist() for k, v in out.props.items()}
    golden.check_value("planeaverage", case, vals)


def test_avg_matches_numpy(make_clip):
    clip = make_clip("GRAY16")
    out = plane_average(clip)
    got = float(np.asarray(out.props["psmAvg"])[0, 0])
    want = np.asarray(clip.planes[0][0]).astype(np.float64).mean() / 65535.0
    assert got == pytest.approx(want, rel=1e-12)


def test_exclude(make_clip):
    from vszip_tpu import Clip, get_format

    arr = np.array([[[10, 20], [30, 0]]], np.uint8)
    clip = Clip.from_planes((arr,), get_format("GRAY8"))
    got = float(np.asarray(plane_average(clip, exclude=[0]).props["psmAvg"])[0, 0])
    assert got == pytest.approx((10 + 20 + 30) / 3 / 255.0, rel=1e-12)
    # everything excluded -> 0
    allex = plane_average(clip, exclude=[0, 10, 20, 30])
    assert float(np.asarray(allex.props["psmAvg"])[0, 0]) == 0.0


def test_diff(make_clip):
    clip = make_clip("GRAY8")
    blurred = boxblur(clip, hradius=2, vradius=2)
    out = plane_average(clip, clipb=blurred)
    got = float(np.asarray(out.props["psmDiff"])[0, 0])
    a = np.asarray(clip.planes[0][0]).astype(np.float64)
    b = np.asarray(blurred.planes[0][0]).astype(np.float64)
    want = np.abs(a - b).mean() / 255.0
    assert got == pytest.approx(want, rel=1e-9)


def test_prop_name(make_clip):
    out = plane_average(make_clip("GRAY8"), prop="foo")
    assert "fooAvg" in out.props


def test_default_planes_luma_only(make_clip):
    out = plane_average(make_clip("YUV420P8"))
    assert np.asarray(out.props["psmAvg"]).shape == (1, 1)


def test_errors(make_clip):
    with pytest.raises(VSZipError, match="exclude is not supported for 32-bit"):
        plane_average(make_clip("GRAY32"), exclude=[0])
