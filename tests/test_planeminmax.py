"""PlaneMinMax tests, incl. a literal histogram-walk oracle."""

import numpy as np
import pytest

from golden import Case, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.planeminmax import plane_minmax

# The reference's exact case list (reference tests/test_planeminmax.py:11-50);
# the clipb companion is the reference's own vszip.BoxBlur(1).
from golden import grid  # noqa: E402

CASES = (
    sweep(
        base_fmt="GRAY16",
        base_args={"minthr": 0.1, "maxthr": 0.1},
        formats=("GRAY8", "GRAY16", "GRAYH", "GRAYS", "YUV420P8", "YUV420P16",
                 "YUV444P16", "RGB24", "RGB48", "RGBH", "RGBS"),
        args=grid(minthr=[0, 0.1, 0.4], maxthr=[0, 0.1, 0.4])
        + [
            {"minthr": 0.1, "maxthr": 0.1, "prop": "mm"},
            {"minthr": 0.1, "maxthr": 0.1, "variant_clipb": True},
        ],
        geometries=("odd", "tiny"),
    )
    + [
        Case("YUV420P16", args={"minthr": 0.1, "maxthr": 0.1, "planes": [0, 1, 2]}),
        Case("YUV420P16", args={"minthr": 0.1, "maxthr": 0.1, "planes": [1, 2]}),
        Case("YUV444P16", args={"minthr": 0.4, "maxthr": 0.1, "planes": [0, 2]}),
        Case("YUV420PS", args={"minthr": 0.2, "planes": [0]}),
        Case("YUV420PS", args={"planes": [0, 1, 2]}),
        Case("RGBS", args={"minthr": 0.2, "maxthr": 0.3, "planes": [0, 1, 2]}),
        Case("YUV420P16", args={"minthr": 0.2, "maxthr": 0.3, "planes": [0, 1, 2]},
             variant="ref"),
        Case("RGB24", args={"minthr": 0.1, "maxthr": 0.1, "planes": [0, 1, 2]},
             variant="ref"),
    ]
)


def _pmm_props(out, prop: str = "psm") -> dict:
    """Reference value shape (reference tests/test_planeminmax.py:53-64)."""
    vals = {}
    for short in ("Min", "Max", "Diff"):
        key = prop + short
        if key in out.props:
            v = np.asarray(out.props[key]).reshape(-1).tolist()
            vals[short] = v if len(v) > 1 else v[0]
    return vals


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    kwargs = dict(case.args)
    clip = make_clip(case.fmt, case.geometry)
    use_clipb = kwargs.pop("variant_clipb", False) or case.variant == "ref"
    if use_clipb:
        kwargs["clipb"] = boxblur(clip, hradius=1, vradius=1)
    out = plane_minmax(clip, **kwargs)
    prop = kwargs.get("prop", "psm")
    is_f16 = case.fmt.endswith("H")
    rel = 1e-3 if is_f16 else 1e-6
    golden.check_value("planeminmax", case.id, _pmm_props(out, prop), rel=rel)


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
