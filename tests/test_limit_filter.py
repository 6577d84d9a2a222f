"""LimitFilter tests.

The reference pins 49 golden cases in goldens/limitfilter.json but its
driving test file is absent from the snapshot, so the CASES here are
reconstructed verbatim from the reference JSON's own keys.  The companion
recipe was reverse-derived from the pinned values and cross-checked against
the reference's parity suites (reference tests/test_int_parity.py:157-166,
tests/test_f16_parity.py:211-246): flt = src.vszip.BoxBlur(hradius=2,
vradius=2), and the "ref" variant adds ref = src.vszip.BoxBlur(hradius=4,
vradius=4).  With full-range threshold scaling (see ops/limit_filter.py)
every reconstructed integer case reproduces the reference value exactly.
"""

import ast
import json
from pathlib import Path

import numpy as np
import pytest

from fixtures import crop_abs
from golden import REF_GOLDENS_DIR, Case, sweep
from oracle.pointwise_ref import limit_filter_ref
from vszip_tpu import VSZipError
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.limit_filter import limit_filter


def _parse_args(argstr: str) -> dict:
    """Inverse of golden.Case's id arg formatting (k=v, lists bracketed)."""
    if argstr == "default":
        return {}
    out, depth, cur, parts = {}, 0, "", []
    for ch in argstr:
        depth += ch == "["
        depth -= ch == "]"
        if ch == "," and depth == 0:
            parts.append(cur)
            cur = ""
        else:
            cur += ch
    parts.append(cur)
    for p in parts:
        k, v = p.split("=", 1)
        out[k] = ast.literal_eval(v)
    return out


def _ref_cases() -> list[Case]:
    keys = json.loads((REF_GOLDENS_DIR / "limitfilter.json").read_text())
    cases = []
    for key in keys:
        bits = key.split("|")
        fmt, geom, argstr = bits[0], bits[1], bits[2]
        variant = bits[3] if len(bits) > 3 else ""
        case = Case(fmt, geom, _parse_args(argstr), variant)
        assert case.id == key, (case.id, key)
        cases.append(case)
    return cases


CASES = _ref_cases() + [
    # extra self-pinned coverage beyond the reference list
    Case("YUV422P8", "odd", {"dark_thr": 1, "bright_thr": 6}),
    Case("YUV444PS", args={"dark_thr": 4, "bright_thr": 4, "elast": 4,
                           "planes": [0]}),
]


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    args = dict(case.args)
    clip = make_clip(case.fmt, case.geometry)
    flt = boxblur(clip, hradius=2, vradius=2)
    if case.variant == "ref":
        args["ref"] = boxblur(clip, hradius=4, vradius=4)
    out = limit_filter(flt, clip, **args)
    rel = 1e-3 if case.fmt.endswith("H") else 1e-6
    golden.check("limitfilter", case, out, rel=rel)


def _flt_src(clip):
    return boxblur(clip, hradius=2, vradius=2), clip


@pytest.mark.parametrize("fmt", ["GRAY8", "GRAY16", "GRAYS"])
def test_matches_literal_oracle(make_clip, fmt):
    clip = crop_abs(make_clip(fmt), width=48, height=40, left=100, top=60)
    flt, src = _flt_src(clip)
    out = limit_filter(flt, src, dark_thr=2, bright_thr=3, elast=3)
    from vszip_tpu.core.params import scale_value

    from vszip_tpu.core.format import ColorRange

    dt = scale_value(2.0, flt, color_range=ColorRange.FULL)
    bt = scale_value(3.0, flt, color_range=ColorRange.FULL)
    ref = limit_filter_ref(
        np.asarray(flt.planes[0][0]), np.asarray(src.planes[0][0]),
        np.asarray(src.planes[0][0]), dt, bt, 3.0,
    )
    got = np.asarray(out.planes[0][0])
    if np.issubdtype(got.dtype, np.integer):
        np.testing.assert_array_equal(got, ref)
    else:
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)


def test_thr_zero_returns_src(make_clip):
    """thr=0: every diff >= thr2=0 -> output == src."""
    clip = make_clip("GRAY16")
    flt, src = _flt_src(clip)
    out = limit_filter(flt, src, dark_thr=0, bright_thr=0)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), np.asarray(src.planes[0]))


def test_huge_thr_returns_flt(make_clip):
    clip = make_clip("GRAY8")
    flt, src = _flt_src(clip)
    out = limit_filter(flt, src, dark_thr=255, bright_thr=255)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), np.asarray(flt.planes[0]))


def test_ref_clip_equals_src_default(make_clip):
    clip = make_clip("GRAY16")
    flt, src = _flt_src(clip)
    a = limit_filter(flt, src)
    b = limit_filter(flt, src, ref=src)
    np.testing.assert_array_equal(np.asarray(a.planes[0]), np.asarray(b.planes[0]))


def test_unprocessed_planes_from_flt(make_clip):
    clip = make_clip("YUV420P16")
    flt, src = _flt_src(clip)
    out = limit_filter(flt, src, planes=[0])
    np.testing.assert_array_equal(np.asarray(out.planes[1]), np.asarray(flt.planes[1]))


def test_errors(make_clip):
    clip = make_clip("YUV420P16")
    flt, src = _flt_src(clip)
    with pytest.raises(VSZipError, match="same width and height"):
        limit_filter(flt, crop_abs(src, 64, 64))
    with pytest.raises(VSZipError, match="out of range"):
        limit_filter(flt, src, dark_thr=300)
    with pytest.raises(VSZipError, match="not supported Int format"):
        limit_filter(make_clip("GRAY32"), make_clip("GRAY32"))
