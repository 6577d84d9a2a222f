"""ColorMap tests (reference tests/test_colormap.py case list, resolving
against the reference's goldens/colormap.json)."""

import numpy as np
import pytest

from fixtures import convert
from golden import Case, plane_stats, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.colormap import colormap

CASES = (
    sweep(
        base_fmt="GRAY8",
        base_args={},
        args=tuple({"color": c} for c in range(22)),
        geometries=("odd", "tiny"),
    )
    + [
        Case("GRAY8", geometry="odd", args={"color": 0}),
        Case("GRAY8", geometry="tiny", args={"color": 13}),
    ]
)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    src = make_clip(case.fmt, case.geometry)
    golden.check("colormap", case, colormap(src, **case.args))


# Reference-pinned averages of the colormapped output converted back to GRAY8
# (reference tests/test_colormap.py:34-63; conversion = resize.Bilinear
# matrix=1, reproduced by the zimg-exact fixture pipeline).
REF_AVGS = [
    0.5453371821384804, 0.4657149969362745, 0.6759822495404412,
    0.4097088694852941, 0.6413369715073529, 0.2589842026654412,
    0.6345918734681373, 0.5770620021446078, 0.5281143918504903,
    0.548726619944853, 0.6384453699448529, 0.4189677351409314,
    0.5736758003982844, 0.36308752680759804, 0.3589300130208333,
    0.3995364200367647, 0.46880407475490193, 0.47296392463235293,
    0.29686014093137253, 0.6083539560355392, 0.6932635952818628,
    0.38608273973651963,
]


@pytest.mark.parametrize("color", range(22))
def test_reference_literal_averages(make_clip, color):
    out = colormap(make_clip("GRAY8"), color=color)
    gray = convert(out, "GRAY8")
    assert plane_stats(gray)["avg"] == pytest.approx(REF_AVGS[color], rel=1e-6)


def test_output_format(make_clip):
    src = make_clip("GRAY8")
    out = colormap(src)
    assert out.format.name == "RGB24"
    assert (out.width, out.height) == (src.width, src.height)


def test_semantics(make_clip):
    out = colormap(make_clip("GRAY8"), color=0)  # autumn: r=255, b=0
    assert (np.asarray(out.planes[0]) == 255).all()
    assert (np.asarray(out.planes[2]) == 0).all()
    assert out.props["_ColorRange"] == 0


def test_errors(make_clip):
    with pytest.raises(VSZipError, match="only Gray8"):
        colormap(make_clip("GRAY16"))
    with pytest.raises(VSZipError, match="between 0 and 21"):
        colormap(make_clip("GRAY8"), color=22)
