"""MosquitoNR tests."""

import numpy as np
import pytest

from fixtures import crop_abs
from golden import Case, sweep
from vszip_tpu import VSZipError
from vszip_tpu.ops.mosquito_nr import mosquito_nr

# The reference's exact case list (reference tests/test_mosquito.py:14-39).
from golden import grid  # noqa: E402

CASES = (
    sweep(
        base_fmt="GRAY8",
        base_args={"strength": 16, "restore": 128, "radius": 2},
        formats=("GRAY8", "GRAY10", "GRAY16", "GRAYS", "YUV420P8",
                 "YUV420P16", "YUV444PS"),
        args=grid(strength=[8, 32]) + grid(restore=[0, 64]) + grid(radius=[1]),
        geometries=("odd", "tiny"),
    )
    + [
        Case("YUV420P8", args={"strength": 16, "restore": 64, "radius": 1}),
        Case("YUV444P16", args={"strength": 24, "restore": 96, "radius": 2}),
        Case("GRAY12", args={"strength": 16, "restore": 128, "radius": 2}),
        Case("GRAY14", args={"strength": 32, "restore": 64, "radius": 1}),
        Case("YUV420P8", args={"strength": 16, "planes": [0, 1, 2]}),
        Case("YUV444P16", args={"strength": 16, "planes": [1, 2]}),
        Case("YUV444PS", args={"strength": 24, "planes": [0, 1, 2]}),
        Case("YUV444P16", args={"strength": [16, 8, 24], "restore": [128, 64, 96],
                                "radius": [2, 1, 2], "planes": [0, 1, 2]}),
    ]
)


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    clip = make_clip(case.fmt, case.geometry)
    out = mosquito_nr(clip, **case.args)
    golden.check("mosquito", case, out, rel=2e-6)


@pytest.mark.parametrize(
    "args",
    [
        {},
        {"radius": 1},
        {"restore": 0},
        {"restore": 50},
        {"strength": 32, "radius": 1, "restore": 128},
    ],
    ids=str,
)
@pytest.mark.parametrize("fmt", ["GRAY8", "GRAY16"])
def test_matches_literal_oracle(make_clip, fmt, args):
    from oracle.mosquito_ref import mosquito_plane_ref

    clip = crop_abs(make_clip(fmt), width=36, height=28, left=150, top=90)
    out = np.asarray(mosquito_nr(clip, **args).planes[0][0])
    full = dict(strength=16, restore=128, radius=2)
    full.update(args)
    bits = clip.format.bits_per_sample
    ref = mosquito_plane_ref(
        np.asarray(clip.planes[0][0]), full["strength"], full["restore"],
        full["radius"], bits,
    )
    np.testing.assert_array_equal(out, ref)


def test_strength_zero_passthrough(make_clip):
    clip = make_clip("GRAY16")
    out = mosquito_nr(clip, strength=0)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), np.asarray(clip.planes[0]))


def test_flat_plane_is_fixed_point():
    from vszip_tpu import Clip, get_format

    clip = Clip.blank(get_format("GRAY8"), 32, 32, value=77)
    out = mosquito_nr(clip)
    np.testing.assert_array_equal(np.asarray(out.planes[0]), 77)


def test_errors(make_clip):
    with pytest.raises(VSZipError, match="8..16 bit integer or 32 bit float"):
        mosquito_nr(make_clip("GRAY32"))
    with pytest.raises(VSZipError, match="must be YUV or Gray"):
        mosquito_nr(make_clip("RGB24"))
    with pytest.raises(VSZipError, match="too small"):
        mosquito_nr(crop_abs(make_clip("GRAY8"), 3, 3, 0, 0))
    with pytest.raises(VSZipError, match="out of range"):
        mosquito_nr(make_clip("GRAY8"), strength=33)
