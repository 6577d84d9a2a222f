"""XPSNR tests: literal oracle cross-check + goldens."""

import numpy as np
import pytest

from golden import Case, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.xpsnr import xpsnr

CASES = sweep(
    base_fmt="YUV420P8",
    base_args={"fps": 24},
    formats=("YUV420P8", "YUV444P8", "YUV420P10"),
    args=(
        {"fps": 60},
        {"fps": 0},
        {"temporal": False},
    ),
    geometries=("odd",),
)


def _pair(make_temporal_clip, fmt, geometry="full"):
    ref = make_temporal_clip(fmt, geometry)
    dist = boxblur(ref, hradius=1, vradius=1)
    return ref, dist


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_temporal_clip, case):
    ref, dist = _pair(make_temporal_clip, case.fmt, case.geometry)
    out = xpsnr(ref, dist, **case.args)
    vals = {
        k: np.asarray(v).ravel().tolist()
        for k, v in out.props.items()
        if k.startswith("XPSNR")
    }
    golden.check_value("xpsnr", case, vals, rel=1e-9)


@pytest.mark.parametrize("fps", [24, 60])
@pytest.mark.parametrize("temporal", [True, False])
def test_matches_literal_oracle(make_temporal_clip, fps, temporal):
    from oracle.xpsnr_ref import wsse_frame_ref
    from vszip_tpu.ops.xpsnr import _xpsnr_frame_stats

    ref, dist = _pair(make_temporal_clip, "YUV420P8")
    widths = tuple(ref.plane_dims(p)[0] for p in range(3))
    heights = tuple(ref.plane_dims(p)[1] for p in range(3))
    got = np.asarray(
        _xpsnr_frame_stats(tuple(ref.planes), tuple(dist.planes), 8, fps,
                           temporal, (widths, heights))
    )
    orgs = [np.asarray(p) for p in ref.planes]
    recs = [np.asarray(p) for p in dist.planes]
    for n in range(ref.num_frames):
        p1 = orgs[0][n - 1] if n >= 1 else None
        p2 = orgs[0][n - 2] if n >= 2 else None
        want = wsse_frame_ref(
            [o[n] for o in orgs], [r[n] for r in recs], p1, p2,
            widths, heights, 8, fps, temporal,
        )
        np.testing.assert_allclose(got[n], want, rtol=0, atol=1,
                                   err_msg=f"frame {n} fps={fps} t={temporal}")


def test_identical_clips_inf(make_temporal_clip):
    ref = make_temporal_clip("YUV420P8")
    out = xpsnr(ref, ref, fps=24)
    assert np.isinf(np.asarray(out.props["XPSNR_Y"])).all()


def test_more_distortion_lower_score(make_temporal_clip):
    ref = make_temporal_clip("YUV420P8")
    d1 = boxblur(ref, hradius=1, vradius=1)
    d2 = boxblur(ref, hradius=3, vradius=3)
    a = np.asarray(xpsnr(ref, d1, fps=24).props["XPSNR_Y"])
    b = np.asarray(xpsnr(ref, d2, fps=24).props["XPSNR_Y"])
    assert (b < a).all()


def test_mixed_depth_promotes(make_temporal_clip):
    ref8 = make_temporal_clip("YUV420P8")
    ref10 = make_temporal_clip("YUV420P10")
    out = xpsnr(ref8, ref10, fps=24)
    assert "XPSNR_Y" in out.props


def test_errors(make_clip, make_temporal_clip):
    with pytest.raises(VSZipError, match="only supports YUV"):
        xpsnr(make_clip("GRAY8"), make_clip("GRAY8"))
    with pytest.raises(VSZipError, match="8 or 10 bit"):
        xpsnr(make_clip("YUV420P16"), make_clip("YUV420P16"))
