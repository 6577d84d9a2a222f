"""Bilateral tests: golden sweeps + literal oracle cross-checks for both
algorithms and the create-time parameter derivation."""

import numpy as np
import pytest

from fixtures import crop_abs
from golden import Case, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.bilateral import bilateral

# The reference's exact case list (reference tests/test_bilateral.py:13-35);
# the "ref" variant's joint clip is the reference's std.BoxBlur(5)
# reproduced by tests/vsstd.py.
import vsstd  # noqa: E402
from golden import grid  # noqa: E402

CASES = (
    sweep(
        base_fmt="GRAY16",
        base_args={"sigmaS": 2, "sigmaR": 2},
        formats=("GRAY8", "GRAY16", "GRAYH", "GRAYS", "YUV420P8", "YUV420P16",
                 "YUV444P16", "RGB24", "RGBS"),
        args=grid(sigmaS=[0.8, 2, 5], sigmaR=[0.02, 2])
        + [
            {"sigmaS": 3, "sigmaR": 0.02, "algorithm": 2},
            {"sigmaS": 3, "sigmaR": 0.1, "algorithm": 1, "PBFICnum": 4},
            {"sigmaS": 3, "sigmaR": 0.1, "algorithm": 1, "PBFICnum": 32},
        ],
        geometries=("odd", "tiny"),
    )
    + [
        Case("YUV420P16", args={"sigmaS": [3, 1.5], "sigmaR": [0.02, 0.05]}),
        Case("YUV420P16", args={"sigmaS": 2, "sigmaR": 2, "planes": [0]}),
        Case("GRAY16", args={"sigmaS": 2, "sigmaR": 0.05}, variant="ref"),
        Case("YUV420P8", args={"sigmaS": 2, "sigmaR": 0.05}, variant="ref"),
    ]
    # extra self-pinned coverage
    + [
        Case("YUV422P16", "odd", {"sigmaS": 2, "sigmaR": 2}),
        Case("YUV440P8", args={"sigmaS": 2, "sigmaR": 2}),
    ]
)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    clip = make_clip(case.fmt, case.geometry)
    kwargs = dict(case.args)
    if case.variant == "ref":
        kwargs["ref"] = vsstd.boxblur(clip, hradius=5, vradius=5)
    out = bilateral(clip, **kwargs)
    golden.check("bilateral", case, out, rel=2e-6)


# Reference-pinned literal averages (reference tests/test_bilateral.py:47-68).
REF_AVGS = [
    ("GRAYS", False, 0.4959264570310188),
    ("GRAYS", True, 0.4959947573716272),
    ("GRAY16", False, 0.4867585293312972),
    ("GRAY16", True, 0.4867979883572471),
    ("GRAY8", False, 0.48851139322916665),
]


@pytest.mark.parametrize(("fmt", "use_ref", "expected"), REF_AVGS,
                         ids=lambda v: str(v)[:24])
def test_reference_literal_averages(make_clip, fmt, use_ref, expected):
    from golden import plane_stats

    src = make_clip(fmt)
    if use_ref:
        out = bilateral(src, ref=vsstd.boxblur(src, hradius=5, vradius=5))
    else:
        out = bilateral(src, sigmaS=2, sigmaR=2)
    assert plane_stats(out)["avg"] == pytest.approx(expected, rel=2e-6)


def test_reference_literal_algorithm2(make_clip):
    from golden import plane_stats

    out = bilateral(make_clip("GRAY16"), sigmaS=3, sigmaR=0.02, algorithm=2)
    assert plane_stats(out)["avg"] == pytest.approx(0.4867884865613317, rel=2e-6)


def _derive(sigma_s):
    """create-time radius/step derivation (reference :164-190)."""
    orad = max(int(sigma_s * 2 + 0.5), 1)
    step = 1 if orad < 4 else (2 if orad < 8 else 3)
    samples, radius = 1, 1
    while orad * 2 > radius * 3:
        samples += 1
        radius = 1 + (samples - 1) * step
        if radius >= orad and samples > 2:
            samples -= 1
            radius = 1 + (samples - 1) * step
            break
    return radius, step


@pytest.mark.parametrize("fmt", ["GRAY8", "GRAY16", "GRAYS"])
@pytest.mark.parametrize("params", [(2.0, 2.0), (1.0, 0.05), (3.0, 0.02)])
def test_truncated_matches_oracle(make_clip, fmt, params):
    from oracle.bilateral_ref import gr_lut, gs_lut, truncated_ref

    sigma_s, sigma_r = params
    clip = crop_abs(make_clip(fmt), width=40, height=32, left=120, top=80)
    out = bilateral(clip, sigmaS=sigma_s, sigmaR=sigma_r, algorithm=2)
    arr = np.asarray(clip.planes[0][0])
    is_int = np.issubdtype(arr.dtype, np.integer)
    hist_len = (1 << (8 * arr.itemsize)) if is_int else 65536
    radius, step = _derive(sigma_s)
    ref = truncated_ref(
        arr, arr, gs_lut(radius, sigma_s), gr_lut(hist_len, sigma_r),
        radius, step, float(hist_len - 1),
    )
    got = np.asarray(out.planes[0][0])
    if is_int:
        diff = np.abs(got.astype(np.int64) - ref.astype(np.int64))
        assert diff.max() <= 1, f"max diff {diff.max()}"
        # f32 accumulation-order differences and the on-device f32 exp (the
        # oracle bakes f64-exp LUT weights; see ops/bilateral._gr_direct)
        # flip the +-0.5 rounding boundary on a small fraction of pixels
        assert (diff > 0).mean() < 0.01
    else:
        np.testing.assert_allclose(
            got.astype(np.float32), ref.astype(np.float32), rtol=1e-5, atol=1e-6
        )


@pytest.mark.parametrize("fmt", ["GRAY8", "GRAYS"])
def test_pbfic_matches_oracle(make_clip, fmt):
    from oracle.bilateral_ref import gr_lut, pbfic_ref

    clip = crop_abs(make_clip(fmt), width=40, height=32, left=120, top=80)
    sigma_s, sigma_r = 2.0, 0.1
    out = bilateral(clip, sigmaS=sigma_s, sigmaR=sigma_r, algorithm=1)
    arr = np.asarray(clip.planes[0][0])
    is_int = np.issubdtype(arr.dtype, np.integer)
    hist_len = (1 << (8 * arr.itemsize)) if is_int else 65536
    num = 4  # sigmaR >= 0.08 -> PBFICnum 4 (gray plane)
    ref = pbfic_ref(arr, arr, num, sigma_s, gr_lut(hist_len, sigma_r),
                    float(hist_len - 1))
    got = np.asarray(out.planes[0][0])
    if is_int:
        diff = np.abs(got.astype(np.int64) - ref.astype(np.int64))
        assert diff.max() <= 1
    else:
        np.testing.assert_allclose(
            got.astype(np.float32), ref.astype(np.float32), rtol=3e-5, atol=3e-6
        )


def test_zero_sigma_passthrough(make_clip):
    clip = make_clip("GRAY16")
    out = bilateral(clip, sigmaS=0)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), np.asarray(clip.planes[0]))
    out2 = bilateral(clip, sigmaR=0)
    np.testing.assert_array_equal(np.asarray(out2.planes[0]), np.asarray(clip.planes[0]))


def test_joint_ref_changes_result(make_clip):
    from vszip_tpu.ops.boxblur import boxblur

    clip = make_clip("GRAY16")
    ref = boxblur(clip, hradius=2, vradius=2)
    a = np.asarray(bilateral(clip, sigmaS=2, sigmaR=2).planes[0])
    b = np.asarray(bilateral(clip, ref=ref, sigmaS=2, sigmaR=2).planes[0])
    assert not np.array_equal(a, b)


def test_errors(make_clip):
    clip = make_clip("GRAY8")
    with pytest.raises(VSZipError, match="sigmaS"):
        bilateral(clip, sigmaS=-1)
    with pytest.raises(VSZipError, match="PBFICnum"):
        bilateral(clip, PBFICnum=1)
    with pytest.raises(VSZipError, match="plane too small"):
        bilateral(crop_abs(clip, 13, 7, 100, 100), sigmaS=8, sigmaR=2, algorithm=2)
    with pytest.raises(VSZipError, match="not supported Int format"):
        bilateral(make_clip("GRAY32"))
