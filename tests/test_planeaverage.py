"""PlaneAverage tests (reference tests/test_planeaverage.py case list, so the
golden ids resolve against the reference's own goldens/planeaverage.json)."""

import numpy as np
import pytest

import vsstd
from golden import Case, grid, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.planeaverage import plane_average

_FORMATS = ("GRAY8", "GRAY16", "GRAYH", "GRAYS", "YUV420P8", "YUV420P16",
            "YUV444PS", "RGB24", "RGBS")

CASES = (
    sweep(
        base_fmt="GRAY8",
        base_args={"exclude": [-1]},
        formats=_FORMATS,
        args=grid(exclude=[[-1], [128], [100, 150, 200]])
        + [{"exclude": [128], "prop": "myavg"}],
        geometries=("odd", "tiny"),
    )
    + [
        Case("YUV420P8", args={"exclude": [-1], "planes": [0, 1, 2]}),
        Case("YUV420P8", args={"exclude": [-1], "planes": [1]}),
        Case("YUV420P8", args={"exclude": [-1], "planes": [0, 2]}),
        Case("YUV420P16", args={"exclude": [-1], "planes": [0, 1, 2]}),
        Case("RGB24", args={"exclude": [-1], "planes": [0, 1, 2]}),
        Case("RGBS", args={"exclude": [-1], "planes": [0, 1, 2]}),
        Case("YUV420P8", args={"exclude": [128], "planes": [0, 1, 2]}),
        # clipb diff mode (std.BoxBlur companions, reference :71-73)
        Case("GRAY16", args={"exclude": [-1]}, variant="ref1"),
        Case("GRAY16", args={"exclude": [-1]}, variant="ref3"),
        Case("YUV420P8", args={"exclude": [-1], "planes": [0, 1, 2]}, variant="ref3"),
        Case("GRAYS", args={"exclude": [-1]}, variant="ref3"),
        Case("RGBS", args={"exclude": [-1], "planes": [0, 1, 2]}, variant="ref3"),
        Case("GRAY16", args={"exclude": [5000], "prop": "myavg"}, variant="ref3"),
    ]
)


def _ref_clip(src, variant: str):
    radius = {"ref1": 1, "ref3": 3}[variant]
    return vsstd.boxblur(src, hradius=radius, vradius=radius)


def _prop_value(out, case) -> dict:
    """Reference value shape: {"avg": float-or-list[, "diff": ...]}; a float
    for one processed plane, a list for several
    (reference tests/test_planeaverage.py:85-93)."""
    name = case.args.get("prop", "psm")

    def get(key):
        v = np.asarray(out.props[key]).reshape(-1).tolist()
        return v[0] if len(v) == 1 else v

    vals = {"avg": get(f"{name}Avg")}
    if case.variant.startswith("ref"):
        vals["diff"] = get(f"{name}Diff")
    return vals


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    clip = make_clip(case.fmt, case.geometry)
    kwargs = dict(case.args)
    if case.variant.startswith("ref"):
        kwargs["clipb"] = _ref_clip(clip, case.variant)
    out = plane_average(clip, **kwargs)
    is_f16 = case.fmt.endswith("H")
    rel = 1e-3 if is_f16 else 1e-6
    golden.check_value("planeaverage", case.id, _prop_value(out, case), rel=rel)


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
    from vszip_tpu.ops.boxblur import boxblur

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
