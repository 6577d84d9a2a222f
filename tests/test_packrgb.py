"""PackRGB golden tests (REFERENCE-pinned, reference tests/test_packrgb.py).

PackRGB outputs a GRAY32 packed clip; the reference's goldens measure the
packed frame's raw little-endian byte stream viewed as a 4x-wide GRAY8
plane (a lossless fingerprint of every packed byte).  The exact-value
packing tests live in tests/test_rfs.py alongside the other GRAY32
consumers."""

import numpy as np
import pytest

from golden import Case, golden_stats, sweep
from vszip_tpu import Clip, get_format
from vszip_tpu.ops.packrgb import packrgb

CASES = sweep(
    base_fmt="RGB24",
    formats=("RGB24", "RGB30"),
    geometries=("odd", "tiny"),
) + [
    Case("RGB30", geometry="odd"),
    Case("RGB30", geometry="tiny"),
]


def packed_to_bytes(packed: Clip) -> Clip:
    """View the GRAY32 packed planes as their raw little-endian byte stream,
    shaped as a 4x-wide GRAY8 clip (reference tests/test_packrgb.py:16-28)."""
    arr = np.asarray(packed.planes[0])
    if arr.dtype != np.uint32:
        arr = arr.astype(np.uint32)
    le = arr.astype("<u4").view(np.uint8)  # (N, H, W*4)
    return Clip.from_planes((le,), get_format("GRAY8"))


@pytest.mark.parametrize("case", CASES, ids=str)
def test_golden(golden, make_clip, case):
    src = make_clip(case.fmt, case.geometry)
    out = packrgb(src)
    assert out.format.name == "GRAY32"
    golden.check_value("packrgb", case, golden_stats(packed_to_bytes(out)))
