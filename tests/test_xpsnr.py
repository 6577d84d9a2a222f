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


@pytest.mark.parametrize("fps,temporal", [(24, True), (60, True), (24, False)],
                         ids=["order1", "order2", "spatial"])
def test_matches_literal_oracle_above_hd(fps, temporal):
    """>HD regime (w*h > 2048*1152, b_val==2): the op's _highds_map /
    _cell2_sums paths vs the literal oracle.  The reference only covers this
    regime via its opt-in FFmpeg oracle (reference tests/test_xpsnr_ffmpeg.py).
    2290x1296 makes the last block column 10 px wide (w_act=8 <= 12), also
    exercising the narrow-block highds skip."""
    from oracle.xpsnr_ref import wsse_frame_ref
    from vszip_tpu.ops.xpsnr import _xpsnr_frame_stats

    rng = np.random.default_rng(5)
    w, h, n = 2290, 1296, 3
    widths, heights = (w, w // 2, w // 2), (h, h // 2, h // 2)
    orgs = [rng.integers(0, 256, (n, hh, ww), dtype=np.uint8)
            for ww, hh in zip(widths, heights)]
    recs = [np.clip(p.astype(np.int16) + rng.integers(-3, 4, p.shape),
                    0, 255).astype(np.uint8) for p in orgs]
    got = np.asarray(
        _xpsnr_frame_stats(tuple(orgs), tuple(recs), 8, fps, temporal,
                           (widths, heights))
    )
    for fn in range(n):
        p1 = orgs[0][fn - 1] if fn >= 1 else None
        p2 = orgs[0][fn - 2] if fn >= 2 else None
        want = wsse_frame_ref(
            [o[fn] for o in orgs], [r[fn] for r in recs], p1, p2,
            widths, heights, 8, fps, temporal,
        )
        np.testing.assert_allclose(got[fn], want, rtol=0, atol=1,
                                   err_msg=f"frame {fn} fps={fps} t={temporal}")


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
