"""CLAHE tests."""

import numpy as np
import pytest

from fixtures import crop_abs
from golden import Case, sweep
from oracle.clahe_ref import clahe_ref
from vszip_tpu import VSZipError
from vszip_tpu.ops.clahe import clahe

CASES = sweep(
    base_fmt="GRAY16",
    base_args={},
    formats=("GRAY8", "GRAY16", "YUV420P8"),
    args=(
        {"limit": 0},
        {"limit": 2},
        {"limit": 40},
        {"tiles": [8, 8]},
        {"tiles": [1, 1]},
        {"tiles": [5]},
    ),
    geometries=("odd", "tiny"),
)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    clip = make_clip(case.fmt, case.geometry)
    out = clahe(clip, **case.args)
    golden.check("clahe", case, out)


@pytest.mark.parametrize(
    "fmt,args",
    [
        ("GRAY8", {}),
        ("GRAY8", {"limit": 2, "tiles": [4, 2]}),
        ("GRAY8", {"limit": 100}),
        ("GRAY16", {"tiles": [3, 3]}),
        ("GRAY8", {"tiles": [1, 1]}),
    ],
    ids=str,
)
def test_matches_literal_oracle(make_clip, fmt, args):
    clip = crop_abs(make_clip(fmt), width=64, height=48, left=100, top=60)
    out = np.asarray(clahe(clip, **args).planes[0][0])
    full = dict(limit=7, tiles=[3, 3])
    full.update(args)
    tiles = full["tiles"] if isinstance(full["tiles"], list) else [full["tiles"]]
    tx = tiles[0]
    ty = tiles[1] if len(tiles) == 2 else tx
    ref = clahe_ref(np.asarray(clip.planes[0][0]), full["limit"], tx, ty)
    np.testing.assert_array_equal(out, ref)


def test_color_range_prop(make_clip):
    out = clahe(make_clip("GRAY8"))
    assert out.props["_ColorRange"] == 0


def test_errors(make_clip):
    with pytest.raises(VSZipError, match="only 8 or 16 bit int formats"):
        clahe(make_clip("GRAYS"))
    with pytest.raises(VSZipError, match="only 8 or 16 bit int formats"):
        clahe(make_clip("GRAY10"))
    with pytest.raises(VSZipError, match="more than 2 values"):
        clahe(make_clip("GRAY8"), tiles=[2, 2, 2])
    with pytest.raises(VSZipError, match="must be >= 1"):
        clahe(make_clip("GRAY8"), tiles=[0])
    with pytest.raises(VSZipError, match="must not exceed"):
        clahe(make_clip("YUV420P8"), tiles=[500, 3])
