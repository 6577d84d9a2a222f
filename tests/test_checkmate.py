"""Checkmate tests (temporal fixture)."""

import numpy as np
import pytest

from fixtures import crop_abs
from golden import Case, sweep
from oracle.pointwise_ref import checkmate_ref
from vszip_tpu import VSZipError
from vszip_tpu.ops.checkmate import checkmate

CASES = sweep(
    base_fmt="YUV420P8",
    base_args={},
    formats=("GRAY8", "YUV420P8"),
    args=(
        {"thr": 0},
        {"thr": 64, "tmax": 32},
        {"tmax": 1},
        {"tthr2": 8},
        {"tthr2": 255},
    ),
    geometries=("odd",),
) + [
    # tiny YUV420 chroma planes are below the 3x5 minimum, so tiny runs GRAY
    Case("GRAY8", "tiny", {}),
]


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_temporal_clip, case):
    clip = make_temporal_clip(case.fmt, case.geometry)
    out = checkmate(clip, **case.args)
    golden.check("checkmate", case, out, n=1)


@pytest.mark.parametrize(
    "args", [{}, {"tthr2": 10}, {"thr": 40, "tmax": 3}, {"tmax": 255}], ids=str
)
def test_matches_literal_oracle(make_temporal_clip, args):
    clip = crop_abs(make_temporal_clip("GRAY8"), width=32, height=24, left=90, top=40)
    out = checkmate(clip, **args)
    full = dict(thr=12, tmax=12, tthr2=0)
    full.update(args)
    frames = np.asarray(clip.planes[0])
    for n in range(clip.num_frames):
        ref = checkmate_ref(frames, n, full["thr"], full["tmax"], full["tthr2"])
        np.testing.assert_array_equal(
            np.asarray(out.planes[0][n]), ref, err_msg=f"frame {n}"
        )


def test_edge_rows_passthrough(make_temporal_clip):
    clip = make_temporal_clip("GRAY8")
    out = checkmate(clip)
    src = np.asarray(clip.planes[0])
    got = np.asarray(out.planes[0])
    np.testing.assert_array_equal(got[:, :2], src[:, :2])
    np.testing.assert_array_equal(got[:, -2:], src[:, -2:])


def test_errors(make_clip):
    clip = make_clip("GRAY8")
    with pytest.raises(VSZipError, match="tmax value should be in range"):
        checkmate(clip, tmax=0)
    with pytest.raises(VSZipError, match="tthr2 should be non-negative"):
        checkmate(clip, tthr2=-1)
    with pytest.raises(VSZipError, match="thr value should be in range"):
        checkmate(clip, thr=256)
    with pytest.raises(VSZipError, match="only 8 bit int"):
        checkmate(make_clip("GRAY16"))
