"""Cross-depth parity: identical content at 8/10/16 bit must produce
near-identical normalized output (the reference suite's strongest idea,
reference tests/test_int_parity.py — reimplemented for this fixture
pipeline).  Content is built at 8 bit and shifted up, so it is identical
across depths."""

import numpy as np
import pytest

from vszip_tpu import Clip, get_format
from vszip_tpu.ops.bilateral import bilateral
from vszip_tpu.ops.bilateral_dither import bilateral_dither
from vszip_tpu.ops.boxblur import boxblur
from vszip_tpu.ops.deband import deband
from vszip_tpu.ops.limiter import limiter
from vszip_tpu.ops.mosquito_nr import mosquito_nr


def _depth_variants(make_clip, fmt8="GRAY8"):
    base = make_clip(fmt8)
    arr8 = np.asarray(base.planes[0])
    out = {}
    for bits, name in [(8, "GRAY8"), (10, "GRAY10"), (16, "GRAY16")]:
        arr = (arr8.astype(np.uint16) << (bits - 8)) if bits > 8 else arr8
        out[bits] = Clip.from_planes(
            (arr.astype(np.uint8 if bits == 8 else np.uint16),),
            get_format(name),
        )
    return out


def _norm(clip):
    peak = (1 << clip.format.bits_per_sample) - 1
    return np.asarray(clip.planes[0]).astype(np.float64) / peak


PARAMS = [
    ("boxblur", lambda c: boxblur(c, hradius=5, vradius=5), 2.0),
    ("boxblur_rt", lambda c: boxblur(c, hradius=3, vradius=7), 2.0),
    ("bilateral", lambda c: bilateral(c, sigmaS=2, sigmaR=0.04), 2.0),
    ("bilateral_dither", lambda c: bilateral_dither(c, radius=8), 2.0),
    ("mosquito", lambda c: mosquito_nr(c), 2.0),
    ("limiter", lambda c: limiter(c, tv_range=True), 1.0),
    ("deband_m2", lambda c: deband(c, seed=3), 3.0),
]


@pytest.mark.parametrize("name,fn,lsb_tol", PARAMS, ids=lambda v: str(v))
def test_depth_parity(make_clip, name, fn, lsb_tol):
    if not callable(fn):
        pytest.skip("param order")
    clips = _depth_variants(make_clip)
    ref = _norm(fn(clips[8]))
    for bits in (10, 16):
        got = _norm(fn(clips[bits]))
        # within lsb_tol LSBs of the 8-bit (lower-precision) scale
        diff = np.abs(got - ref) * 255.0
        assert diff.max() <= lsb_tol, f"{name} @{bits}bit: {diff.max():.3f} LSB8"


def test_f16_parity(make_clip):
    """f16 output within f16 ULP tolerance of the widened-f32 pipeline
    (reference tests/test_f16_parity.py idea)."""
    base = make_clip("GRAYS")
    arr32 = np.asarray(base.planes[0]).astype(np.float16)  # quantize
    c16 = Clip.from_planes((arr32,), get_format("GRAYH"))
    c32 = Clip.from_planes((arr32.astype(np.float32),), get_format("GRAYS"))
    for fn in (
        lambda c: boxblur(c, hradius=5, vradius=5),
        lambda c: boxblur(c, hradius=3, vradius=7, hpasses=2),
        lambda c: bilateral(c, sigmaS=2, sigmaR=0.04),
        lambda c: limiter(c),
    ):
        o16 = np.asarray(fn(c16).planes[0]).astype(np.float32)
        o32 = np.asarray(fn(c32).planes[0])
        np.testing.assert_allclose(o16, o32, atol=2e-3, rtol=2e-3)
