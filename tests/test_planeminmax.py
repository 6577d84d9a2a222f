"""PlaneMinMax tests, incl. a literal histogram-walk oracle."""

import numpy as np
import pytest

from golden import Case, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.planeminmax import plane_minmax

CASES = sweep(
    base_fmt="YUV420P16",
    base_args={"minthr": 0.02, "maxthr": 0.02},
    formats=("GRAY8", "GRAY16", "GRAYS", "YUV420P8", "YUV422P8", "RGB24"),
    args=(
        {"minthr": 0, "maxthr": 0},
        {"minthr": 0.5, "maxthr": 0.5},
        {"minthr": 1.0, "maxthr": 1.0},
        {"planes": [0, 1, 2]},
        {"with_b": 1},
    ),
    geometries=("odd", "tiny"),
)


def _run(make_clip, case):
    args = dict(case.args)
    with_b = args.pop("with_b", 0)
    clip = make_clip(case.fmt, case.geometry)
    clipb = boxblur(clip, hradius=2, vradius=2, planes=[0]) if with_b else None
    return plane_minmax(clip, clipb=clipb, **args)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    out = _run(make_clip, case)
    vals = {k: np.asarray(v)[0].tolist() for k, v in out.props.items()}
    golden.check_value("planeminmax", case, vals)


def _walk_oracle(arr, minthr, maxthr, hist_size, is_int):
    """Literal reference walk (src/filters/planeminmax.zig:40-56)."""
    if is_int:
        bins = arr.astype(np.int64)
    else:
        v = arr.astype(np.float32) * np.float32(65535.0) + np.float32(0.5)
        bins = np.clip(v, 0, 65535).astype(np.int64)
    hist = np.bincount(bins.ravel(), minlength=hist_size)
    total = arr.size
    totalmin = np.trunc(total * np.float64(np.float32(minthr)))
    totalmax = np.trunc(total * np.float64(np.float32(maxthr)))
    count = 0
    retmin = hist_size - 1
    for u in range(hist_size):
        count += hist[u]
        if count > totalmin:
            retmin = u
            break
    count = 0
    retmax = 0
    for u in range(hist_size - 1, -1, -1):
        count += hist[u]
        if count > totalmax:
            retmax = u
            break
    return retmin, retmax


@pytest.mark.parametrize("fmt", ["GRAY8", "GRAY16", "GRAYS"])
@pytest.mark.parametrize("thr", [(0.01, 0.02), (0.3, 0.3), (1.0, 1.0), (0.0, 0.5)])
def test_thresholded_matches_walk_oracle(make_clip, fmt, thr):
    clip = make_clip(fmt)
    minthr, maxthr = thr
    out = plane_minmax(clip, minthr=minthr, maxthr=maxthr)
    arr = np.asarray(clip.planes[0][0])
    is_int = np.issubdtype(arr.dtype, np.integer)
    hist_size = 65536 if not is_int else (1 << (8 * arr.itemsize))
    retmin, retmax = _walk_oracle(arr, minthr, maxthr, hist_size, is_int)
    got_min = np.asarray(out.props["psmMin"])[0, 0]
    got_max = np.asarray(out.props["psmMax"])[0, 0]
    if is_int:
        assert int(got_min) == retmin and int(got_max) == retmax
    else:
        assert got_min == pytest.approx(retmin / 65535.0, abs=1e-7)
        assert got_max == pytest.approx(retmax / 65535.0, abs=1e-7)


def test_no_thr_plain_minmax(make_clip):
    clip = make_clip("GRAY16")
    out = plane_minmax(clip)
    arr = np.asarray(clip.planes[0][0])
    assert int(np.asarray(out.props["psmMin"])[0, 0]) == arr.min()
    assert int(np.asarray(out.props["psmMax"])[0, 0]) == arr.max()


def test_errors(make_clip):
    with pytest.raises(VSZipError, match="should be a float between"):
        plane_minmax(make_clip("GRAY8"), minthr=1.5)
    with pytest.raises(VSZipError, match="float chroma"):
        plane_minmax(make_clip("YUV444PS"), minthr=0.1, planes=[0, 1, 2])
    with pytest.raises(VSZipError, match="not supported Int format"):
        plane_minmax(make_clip("GRAY32"))
