"""Core helper tests: bit_depth (the bitDepth Resize.Point analogue,
reference src/helper.zig:470-494) and basic Clip/format invariants."""

import numpy as np
import pytest

from vszip_tpu import Clip, SampleType, VSZipError, bit_depth, get_format


def _gray(bits, arr):
    name = {8: "GRAY8", 10: "GRAY10", 16: "GRAY16", 32: "GRAYS"}[bits]
    return Clip.from_planes((arr,), get_format(name))


def test_promote_is_shift():
    arr = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    out = bit_depth(_gray(8, arr), 16)
    assert out.format.bits_per_sample == 16
    np.testing.assert_array_equal(
        np.asarray(out.planes[0]), arr.astype(np.uint16) << 8
    )


def test_promote_demote_roundtrip_exact():
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, (2, 24, 32), dtype=np.uint8)
    up = bit_depth(_gray(8, arr), 16)
    down = bit_depth(up, 8)
    np.testing.assert_array_equal(np.asarray(down.planes[0]), arr)


def test_demote_dither_within_one_lsb():
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 65536, (1, 32, 48), dtype=np.uint16)
    out = bit_depth(_gray(16, arr), 8)
    got = np.asarray(out.planes[0]).astype(np.int32)
    # shift semantics: ideal value is arr/256; dither picks floor or ceil
    exact = arr.astype(np.float64) / 256.0
    lo = np.floor(exact)
    assert ((got == np.clip(lo, 0, 255)) | (got == np.clip(lo + 1, 0, 255))).all()
    # ordered dither must round both directions somewhere
    assert (got > lo).any() and (got == lo).any()
    # dither="none" is plain round-half-up of the shift
    plain = np.asarray(bit_depth(_gray(16, arr), 8, dither="none").planes[0])
    np.testing.assert_array_equal(
        plain, np.clip((arr.astype(np.int64) + 128) >> 8, 0, 255)
    )


def test_int_float_round_trip():
    arr = np.arange(256, dtype=np.uint8).reshape(1, 16, 16)
    f = bit_depth(_gray(8, arr), 32, sample_type=SampleType.FLOAT)
    assert f.format.sample_type is SampleType.FLOAT
    np.testing.assert_allclose(
        np.asarray(f.planes[0]), arr / 255.0, rtol=0, atol=1e-7
    )
    back = bit_depth(f, 8, sample_type=SampleType.INTEGER)
    np.testing.assert_array_equal(np.asarray(back.planes[0]), arr)


def test_noop_returns_same_clip():
    arr = np.zeros((1, 8, 8), np.uint8)
    clip = _gray(8, arr)
    assert bit_depth(clip, 8) is clip


def test_bad_dither_raises():
    clip = _gray(8, np.zeros((1, 8, 8), np.uint8))
    with pytest.raises(VSZipError, match="unknown dither"):
        bit_depth(clip, 16, dither="stochastic")
