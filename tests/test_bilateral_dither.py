"""BilateralDither tests: literal per-pixel oracle for both paths +
goldens + point-list generator structural checks.

CASES is the reference's exact case list (reference
tests/test_bilateral_dither.py:15-46), so every id resolves against the
reference's own goldens/bilateral_dither.json."""

import numpy as np
import pytest

from fixtures import crop_abs
from golden import Case, grid, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.bilateral_dither import bilateral_dither
from vszip_tpu.ops.bilateral_dither_points import (
    NBR_POINT_LISTS, generate, rnd_row_values,
)

CASES = (
    sweep(
        base_fmt="GRAY8",
        base_args={"radius": 8, "thr": 8.0, "flat": 0.4, "subspl": 2.0},
        formats=("GRAY8", "GRAY16", "GRAYS", "YUV420P8", "YUV420P16",
                 "YUV444PS", "RGB24"),
        args=(
            grid(subspl=[0.0, 8.0])
            + grid(flat=[0.0, 1.0])
            + grid(thr=[2.5, 24.0])
            + grid(wmin=[0.5])
            + grid(radius=[4])
        ),
        geometries=("odd",),
    )
    + [
        Case("YUV420P16", args={"radius": 8, "thr": 8.0, "subspl": 0.0}),
        Case("GRAYS", args={"radius": 12, "thr": 16.0, "flat": 0.0,
                            "subspl": 16.0}),
        Case("RGBS", args={"radius": 6, "thr": 8.0, "subspl": 2.0}),
        Case("YUV444P16", args={"radius": [8, 4, 6], "thr": [8.0, 16.0, 4.0],
                                "flat": [0.0, 0.4, 1.0], "subspl": 2.0}),
        Case("YUV420P8", args={"radius": [8, 4, 4], "thr": [8.0, 12.0, 12.0],
                               "subspl": 2.0}),
        Case("YUV420P16", args={"radius": 8, "thr": 12.0, "subspl": 2.0,
                                "planes": [0]}),
        Case("YUV444PS", args={"radius": 6, "thr": 16.0, "subspl": 2.0,
                               "planes": [1, 2]}),
    ]
)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    clip = make_clip(case.fmt, case.geometry)
    out = bilateral_dither(clip, **case.args)
    golden.check("bilateral_dither", case, out, rel=2e-6)


def _oracle(src, ref, r, m, wmax, swmin, peak, is_int, pts=None, k=0):
    """literal per-pixel evaluation on the mirror-padded cache"""
    h, w = src.shape
    sc = np.pad(src.astype(np.float32), r, mode="symmetric")
    rc = np.pad(ref.astype(np.float32), r, mode="symmetric") if ref is not None else sc
    out = np.zeros_like(src)
    rows = rnd_row_values(h)
    for y in range(h):
        start = int((int(rows[y]) >> 8) % NBR_POINT_LISTS)
        for x in range(w):
            cen = np.float32(sc[y + r, x + r])
            cenr = np.float32(rc[y + r, x + r])
            s = np.float32(0.0)
            sw = np.float32(0.0)
            if pts is None:
                taps = [(dy, dx) for dy in range(1 - r, r)
                        for dx in range(1 - r, r)]
            else:
                lid = (start + (x >> 2)) % NBR_POINT_LISTS
                gx = x & ~3
                lanes = x & 3
                taps = [(int(pts[lid, j, 0]), int(pts[lid, j, 1]) + gx + lanes - x)
                        for j in range(k)]
            for dy, dx in taps:
                yy, xx = y + r + dy, x + r + dx
                v = np.float32(sc[yy, xx])
                vr = np.float32(rc[yy, xx])
                wgt = np.float32(max(min(m - abs(vr - cenr), wmax), 0.0))
                sw = np.float32(sw + wgt)
                s = np.float32(s + v * wgt - cen * wgt) if False else np.float32(s + (v - cen) * wgt)
            p = cen + s / max(sw, np.float32(swmin))
            if is_int:
                out[y, x] = np.floor(min(max(p, 0.0), peak) + 0.5)
            else:
                out[y, x] = p
    return out


@pytest.mark.parametrize("fmt", ["GRAY8", "GRAY16", "GRAYS"])
def test_dense_matches_oracle(make_clip, fmt):
    clip = crop_abs(make_clip(fmt), width=24, height=20, left=100, top=60)
    r, thr, flat = 3, 4.0, 0.4
    out = np.asarray(
        bilateral_dither(clip, radius=r, thr=thr, flat=flat, subspl=1.0).planes[0][0]
    )
    arr = np.asarray(clip.planes[0][0])
    is_int = np.issubdtype(arr.dtype, np.integer)
    bits = clip.format.bits_per_sample
    scale = float(1 << (bits - 8)) if is_int else 1 / 256.0
    unit = 1.0 if is_int else 1 / 65535.0
    m = max(np.float32(thr) * np.float32(scale), unit)
    wmax = max(np.float32(thr) * np.float32(1 - np.float32(flat)) * np.float32(scale), unit)
    swmin = max(0.0 * wmax * (2 * r - 1) ** 2, unit)
    peak = float((1 << bits) - 1) if is_int else 0.0
    ref = _oracle(arr, None, r, m, wmax, swmin, peak, is_int)
    if is_int:
        assert np.abs(out.astype(np.int64) - ref.astype(np.int64)).max() <= 1
    else:
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)


def test_subspl_matches_oracle(make_clip):
    clip = crop_abs(make_clip("GRAY16"), width=24, height=20, left=100, top=60)
    r = 4
    out = np.asarray(bilateral_dither(clip, radius=r, thr=4.0).planes[0][0])
    pts, k = generate(r, r, 0.0)
    arr = np.asarray(clip.planes[0][0])
    m = np.float32(4.0 * 256.0)
    wmax = np.float32(4.0) * np.float32(1 - np.float32(0.4)) * np.float32(256.0)
    swmin = 1.0
    ref = _oracle(arr, None, r, float(m), float(wmax), swmin, 65535.0, True,
                  pts=pts, k=k)
    assert np.abs(out.astype(np.int64) - ref.astype(np.int64)).max() <= 1


def test_point_lists_structure():
    pts, k = generate(16, 16, 0.0)   # default: area/(rh+rv)
    assert pts.shape == (NBR_POINT_LISTS, k, 2)
    assert k == min(max(round(31 * 31 / 32.0), 3), 4096)
    for lc in range(NBR_POINT_LISTS):
        # center first, all offsets unique, all within the window
        assert tuple(pts[lc, 0]) == (0, 0)
        coords = {tuple(p) for p in pts[lc]}
        assert len(coords) == k
        assert np.abs(pts[lc, :, 0]).max() <= 15
        assert np.abs(pts[lc, :, 1]).max() <= 15
    # spiral path for small k
    pts2, k2 = generate(3, 3, 1.0)
    assert k2 < 32 and tuple(pts2[0, 0]) == (0, 0)


def test_flat_input_fixed_point():
    from vszip_tpu import Clip, get_format

    clip = Clip.blank(get_format("GRAY16"), 32, 32, value=30000)
    out = bilateral_dither(clip, radius=4)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), 30000)


def test_errors(make_clip):
    with pytest.raises(VSZipError, match="16x16 min"):
        bilateral_dither(crop_abs(make_clip("GRAY8"), 13, 7, 0, 0))
    with pytest.raises(VSZipError, match="must be 8..16 bit"):
        bilateral_dither(make_clip("GRAY32"))
    with pytest.raises(VSZipError, match='greater than "radius"'):
        bilateral_dither(crop_abs(make_clip("GRAY8"), 20, 20, 0, 0), radius=30)
    with pytest.raises(VSZipError, match='"ref" must have the same'):
        bilateral_dither(make_clip("GRAY16"), ref=make_clip("GRAY8"))
